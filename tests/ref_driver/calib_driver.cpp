// Test-only driver: reference-side calibration chain dump for one sequence.
// argv: fasta_path seq_index; prints scale then the chain as rows
// "start1 end1 start2 end2 count1 count2 len" per anchor.
#include <iostream>
#include <fstream>
#include "centrolign/graph.hpp"
#include "centrolign/modify_graph.hpp"
#include "centrolign/match_finder.hpp"
#include "centrolign/chain_merge.hpp"
#include "centrolign/anchorer.hpp"
#include "centrolign/score_function.hpp"
#include "centrolign/utility.hpp"

using namespace centrolign;
using namespace std;

int main(int argc, char** argv) {
    ifstream in(argv[1]);
    auto seqs = parse_fasta(in);
    int idx = atoi(argv[2]);
    auto& seq = seqs[idx].second;
    BaseGraph graph = make_base_graph(seqs[idx].first, seq);
    auto tableau = add_sentinels(graph, 5, 6);
    SentinelTableau dummy = tableau;
    dummy.src_sentinel = 7;
    dummy.snk_sentinel = 8;
    ScoreFunction score_function;
    score_function.length_intercept = 2250.0;
    score_function.length_decay_power = 2.0;
    PathMatchFinder pmf(score_function);
    pmf.max_count = 3000;
    Anchorer anchorer_defaults(score_function);
    anchorer_defaults.max_num_match_pairs = 1250000;
    auto matches = pmf.find_matches(graph, graph, tableau, dummy);
    vector<match_set_t> diag;
    for (auto& ms : matches) {
        for (auto& walk : ms.walks1) {
            diag.emplace_back();
            auto& m = diag.back();
            m.walks1.emplace_back(walk);
            m.walks2.emplace_back(walk);
            m.count1 = ms.count1;
            m.count2 = ms.count2;
            m.full_length = ms.full_length;
        }
    }
    ChainMerge cm(graph, tableau);
    Anchorer& anchorer = anchorer_defaults;
    vector<anchor_t> chain;
    double scale = anchorer.estimate_score_scale(diag, graph, graph, tableau, dummy,
                                                 cm, cm, false, &chain);
    printf("%.17g\n%zu\n", scale, chain.size());
    for (auto& a : chain) {
        printf("%llu %llu %llu %llu %zu %zu %zu\n",
               (unsigned long long)a.walk1.front(), (unsigned long long)a.walk1.back(),
               (unsigned long long)a.walk2.front(), (unsigned long long)a.walk2.back(),
               a.count1, a.count2, a.walk1.size());
    }
    return 0;
}
