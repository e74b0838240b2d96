// Test-only driver: reference full anchor_chain on a FASTA pair.
// argv: fasta 0/1(split) 0/1(fill_in) scale("auto" or number)
// prints: N rows "s1 e1 s2 e2 len count1 count2 gap_before gap_after"
#include <cstdio>
#include <fstream>
#include "centrolign/graph.hpp"
#include "centrolign/modify_graph.hpp"
#include "centrolign/match_finder.hpp"
#include "centrolign/path_merge.hpp"
#include "centrolign/anchorer.hpp"
#include "centrolign/score_function.hpp"
#include "centrolign/utility.hpp"

using namespace centrolign;
using namespace std;

int main(int argc, char** argv) {
    ifstream in(argv[1]);
    auto seqs = parse_fasta(in);
    bool do_split = atoi(argv[2]);
    bool do_fill = atoi(argv[3]);
    BaseGraph g1 = make_base_graph(seqs[0].first, seqs[0].second);
    BaseGraph g2 = make_base_graph(seqs[1].first, seqs[1].second);
    auto t1 = add_sentinels(g1, 5, 6);
    auto t2 = add_sentinels(g2, 7, 8);
    ScoreFunction sf;
    sf.length_intercept = 2250.0;
    sf.length_decay_power = 2.0;
    PathMatchFinder pmf(sf);
    pmf.max_count = 3000;
    auto matches = pmf.find_matches(g1, g2, t1, t2);
    PathMerge<> pm1(g1, t1), pm2(g2, t2);
    Anchorer anchorer(sf);
    anchorer.max_num_match_pairs = 1250000;
    anchorer.split_matches_at_branchpoints = do_split;
    anchorer.do_fill_in_anchoring = do_fill;
    double scale_val = 0.0;
    double* override_scale = nullptr;
    if (argc > 4 && string(argv[4]) != "auto") {
        scale_val = atof(argv[4]);
        override_scale = &scale_val;
    }
    auto chain = anchorer.anchor_chain(matches, g1, g2, t1, t2, pm1, pm2,
                                       false, nullptr, override_scale);
    printf("%zu\n", chain.size());
    for (auto& a : chain) {
        printf("%llu %llu %llu %llu %zu %zu %zu %lld %lld\n",
               (unsigned long long)a.walk1.front(), (unsigned long long)a.walk1.back(),
               (unsigned long long)a.walk2.front(), (unsigned long long)a.walk2.back(),
               a.walk1.size(), a.count1, a.count2,
               (long long)a.gap_before, (long long)a.gap_after);
    }
    return 0;
}
