// Test-only driver: reference SuperbubbleTree + SuperbubbleDistances on a
// graph read from stdin (V E \n labels \n edges... \n src snk).
#include <cstdio>
#include <iostream>
#include "centrolign/graph.hpp"
#include "centrolign/superbubbles.hpp"
#include "centrolign/structure_distances.hpp"
using namespace centrolign;
using namespace std;
int main() {
    size_t V, E;
    cin >> V >> E;
    BaseGraph g;
    for (size_t i = 0; i < V; ++i) { int c; cin >> c; g.add_node((char)c); }
    for (size_t i = 0; i < E; ++i) { uint64_t a, b; cin >> a >> b; g.add_edge(a, b); }
    int64_t src, snk;
    cin >> src >> snk;
    SentinelTableau tab;
    tab.src_id = src; tab.snk_id = snk;
    SuperbubbleTree tree = (src >= 0) ? SuperbubbleTree(g, tab) : SuperbubbleTree(g);
    SuperbubbleDistances dists(tree, g);
    printf("%zu %zu\n", tree.structure_size(), tree.chain_size());
    for (uint64_t s = 0; s < tree.structure_size(); ++s) {
        auto b = tree.structure_boundaries(s);
        auto mm = dists.structure_min_max_dist(s);
        printf("%llu %llu %zu %zu %llu\n", (unsigned long long)b.first,
               (unsigned long long)b.second, mm.first, mm.second,
               (unsigned long long)tree.chain_containing(s));
    }
    for (uint64_t c = 0; c < tree.chain_size(); ++c) {
        auto mm = dists.chain_min_max_dist(c);
        printf("%zu %zu %lld\n", mm.first, mm.second,
               (long long)(int64_t)tree.structure_containing(c));
    }
    return 0;
}
