// Test-only driver: reference SnarlTree on a graph from stdin
// (V E \n labels \n edges \n src snk). Prints snarl boundaries in id order
// with chain, snarl/net acyclicity, chain contents, chain parents, and
// chains_inside order per snarl.
#include <cstdio>
#include <iostream>
#include "centrolign/graph.hpp"
#include "centrolign/snarls.hpp"
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
    SnarlTree snarls(g, tab);
    printf("%zu %zu\n", snarls.structure_size(), snarls.chain_size());
    for (uint64_t s = 0; s < snarls.structure_size(); ++s) {
        auto b = snarls.structure_boundaries(s);
        printf("%llu %llu %llu %d %d\n", (unsigned long long)b.first,
               (unsigned long long)b.second,
               (unsigned long long)snarls.chain_containing(s),
               (int)snarls.snarl_is_acyclic(s),
               (int)snarls.net_graph_is_acyclic(s));
    }
    for (uint64_t c = 0; c < snarls.chain_size(); ++c) {
        printf("chain %llu %lld:", (unsigned long long)c,
               (long long)snarls.structure_containing(c));
        for (auto s : snarls.structures_inside(c))
            printf(" %llu", (unsigned long long)s);
        printf("\n");
    }
    for (uint64_t s = 0; s < snarls.structure_size(); ++s) {
        printf("inside %llu:", (unsigned long long)s);
        for (auto c : snarls.chains_inside(s))
            printf(" %llu", (unsigned long long)c);
        printf("\n");
    }
    return 0;
}
