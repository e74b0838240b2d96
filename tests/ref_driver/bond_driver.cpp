// Test-only driver: reference cyclization bond detection for one sequence
// (mirrors src/core.cpp:196-297). argv: fasta seq_idx min_length
// prints: scale, then per round: bond intervals (path offsets), then per
// bond the internal_stitch alignment rows.
#include <cstdio>
#include <fstream>
#include <cmath>
#include "centrolign/graph.hpp"
#include "centrolign/modify_graph.hpp"
#include "centrolign/match_finder.hpp"
#include "centrolign/chain_merge.hpp"
#include "centrolign/path_merge.hpp"
#include "centrolign/anchorer.hpp"
#include "centrolign/bonder.hpp"
#include "centrolign/stitcher.hpp"
#include "centrolign/score_function.hpp"
#include "centrolign/step_index.hpp"
#include "centrolign/utility.hpp"

using namespace centrolign;
using namespace std;

int main(int argc, char** argv) {
    ifstream in(argv[1]);
    auto seqs = parse_fasta(in);
    int idx = atoi(argv[2]);
    double min_len = atof(argv[3]);
    BaseGraph g = make_base_graph(seqs[idx].first, seqs[idx].second);
    auto tab = add_sentinels(g, 5, 6);
    SentinelTableau dummy = tab;
    dummy.src_sentinel = 7;
    dummy.snk_sentinel = 8;
    ScoreFunction sf;
    sf.length_intercept = 2250.0;
    sf.length_decay_power = 2.0;
    PathMatchFinder pmf(sf);
    pmf.max_count = 3000;
    auto matches = pmf.find_matches(g, g, tab, dummy);
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
    ChainMerge cm(g, tab);
    Anchorer anchorer(sf);
    anchorer.max_num_match_pairs = 1250000;
    vector<anchor_t> chain;
    double scale = anchorer.estimate_score_scale(diag, g, g, tab, dummy, cm, cm, false, &chain);
    printf("scale %.17g chain %zu\n", scale, chain.size());

    Bonder bonder;
    bonder.min_length = min_len;
    Stitcher stitcher;
    PathMerge<> pm(g, tab);

    // diagonal mask
    std::unordered_set<std::tuple<size_t, size_t, size_t>> mask;
    for (size_t i = 0; i < matches.size(); ++i) {
        const auto& ms = matches[i];
        std::unordered_map<uint64_t, size_t> start_to_idx;
        for (size_t j = 0; j < ms.walks1.size(); ++j)
            start_to_idx[ms.walks1[j].front()] = j;
        for (size_t k = 0; k < ms.walks2.size(); ++k) {
            auto it = start_to_idx.find(ms.walks2[k].front());
            if (it != start_to_idx.end()) mask.emplace(i, it->second, k);
        }
    }
    printf("mask %zu\n", mask.size());

    for (int round = 0; round < 3; ++round) {
        auto secondary = anchorer.anchor_chain(matches, g, g, tab, dummy, pm, pm,
                                               false, &mask, &scale);
        auto bonds = bonder.identify_bonds(g, g, tab, dummy, pm, pm, chain, secondary);
        bonder.deduplicate_self_bonds(bonds);
        printf("round %d secondary %zu bonds %zu\n", round, secondary.size(), bonds.size());
        for (size_t b = 0; b < bonds.size(); ++b) {
            printf("bond %zu elements %zu\n", b, bonds[b].size());
            for (auto& be : bonds[b]) {
                printf("  %s %s %zu %zu %zu %.17g\n", be.path1.c_str(), be.path2.c_str(),
                       be.offset1, be.offset2, be.length, be.score);
            }
        }
        // stitch each bond and print the alignment
        for (size_t b = 0; b < bonds.size(); ++b) {
            std::vector<anchor_t> bond_chain(bonds[b].size());
            for (size_t i = 0; i < bonds[b].size(); ++i) {
                const auto& be = bonds[b][i];
                auto& a = bond_chain[i];
                auto pid1 = g.path_id(be.path1);
                auto pid2 = g.path_id(be.path2);
                for (size_t j = 0; j < be.length; ++j) {
                    a.walk1.push_back(g.path(pid1)[be.offset1 + j]);
                    a.walk2.push_back(g.path(pid2)[be.offset2 + j]);
                }
                a.score = be.score;
            }
            auto aln = stitcher.internal_stitch(bond_chain, g, pm);
            printf("stitched %zu rows %zu\n", b, aln.size());
            for (auto& p : aln)
                printf("%lld %lld\n", (long long)(int64_t)p.node_id1,
                       (long long)(int64_t)p.node_id2);
        }
        if (bonds.empty()) break;
        // mask update
        std::unordered_map<uint64_t, uint64_t> paired;
        for (const auto& a : secondary) {
            for (size_t i = 0; i < a.walk1.size(); ++i) {
                paired[a.walk1[i]] = a.walk2[i];
                paired[a.walk2[i]] = a.walk1[i];
            }
        }
        for (size_t i = 0; i < matches.size(); ++i) {
            const auto& ms = matches[i];
            std::vector<std::unordered_map<uint64_t, std::vector<size_t>>> w2n(ms.walks1.front().size());
            for (size_t k = 0; k < ms.walks2.size(); ++k)
                for (size_t l = 0; l < ms.walks2[k].size(); ++l)
                    w2n[l][ms.walks2[k][l]].push_back(k);
            for (size_t j = 0; j < ms.walks1.size(); ++j) {
                for (size_t l = 0; l < ms.walks1[j].size(); ++l) {
                    auto it = paired.find(ms.walks1[j][l]);
                    if (it != paired.end()) {
                        auto it2 = w2n[l].find(it->second);
                        if (it2 != w2n[l].end())
                            for (auto k : it2->second) mask.emplace(i, j, k);
                    }
                }
            }
        }
        printf("updated mask %zu\n", mask.size());
    }
    return 0;
}
