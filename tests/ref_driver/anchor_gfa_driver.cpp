// Test-only driver: reference anchor_chain (and optionally the full align
// stage) between a FASTA sequence (arg1, index arg2) and a GFA graph (arg3),
// mirroring Core::do_execution's inputs for one subproblem.
// argv: fasta seq_idx gfa out_mode(chain|cigar) scale(auto)
#include <cstdio>
#include <fstream>
#include "centrolign/graph.hpp"
#include "centrolign/modify_graph.hpp"
#include "centrolign/match_finder.hpp"
#include "centrolign/path_merge.hpp"
#include "centrolign/anchorer.hpp"
#include "centrolign/partitioner.hpp"
#include "centrolign/stitcher.hpp"
#include "centrolign/score_function.hpp"
#include "centrolign/gfa.hpp"
#include "centrolign/utility.hpp"

using namespace centrolign;
using namespace std;

int main(int argc, char** argv) {
    ifstream in(argv[1]);
    auto seqs = parse_fasta(in);
    int idx = atoi(argv[2]);
    BaseGraph g1 = make_base_graph(seqs[idx].first, seqs[idx].second);
    auto t1 = add_sentinels(g1, 5, 6);
    ifstream gfa_in(argv[3]);
    BaseGraph g2 = read_gfa(gfa_in);
    auto t2 = add_sentinels(g2, 7, 8);
    string mode = argv[4];

    ScoreFunction sf;
    sf.length_intercept = 2250.0;
    sf.length_decay_power = 2.0;
    PathMatchFinder pmf(sf);
    pmf.max_count = 3000;
    auto matches = pmf.find_matches(g1, g2, t1, t2);
    PathMerge<> pm1(g1, t1), pm2(g2, t2);
    Anchorer anchorer(sf);
    anchorer.max_num_match_pairs = 1250000;
    auto chain = anchorer.anchor_chain(matches, g1, g2, t1, t2, pm1, pm2, false);
    if (mode == "chain") {
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
    // continue to partition + stitch
    Partitioner partitioner(sf);
    auto segments = partitioner.partition_anchors(chain, g1, g2, t1, t2, pm1, pm2, false);
    Stitcher stitcher;
    for (auto& seg : segments) stitcher.despecify_indel_breakpoints(seg);
    auto aln = stitcher.stitch(segments, g1, g2, t1, t2, pm1, pm2);
    printf("%zu\n", aln.size());
    for (auto& p : aln)
        printf("%lld %lld\n", (long long)(int64_t)p.node_id1, (long long)(int64_t)p.node_id2);
    return 0;
}
