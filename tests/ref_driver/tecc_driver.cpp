// Test-only driver: reference three_edge_connected_components on a graph
// from stdin (V E \n edges...). Prints components in enumeration order.
#include <cstdio>
#include <iostream>
#include "centrolign/graph.hpp"
#include "centrolign/three_edge_connected_components.hpp"
using namespace centrolign;
using namespace std;
int main() {
    size_t V, E;
    cin >> V >> E;
    BaseGraph g;
    for (size_t i = 0; i < V; ++i) g.add_node('A');
    for (size_t i = 0; i < E; ++i) {
        uint64_t a, b;
        cin >> a >> b;
        g.add_edge(a, b);
    }
    auto comps = three_edge_connected_components(g);
    printf("%zu\n", comps.size());
    for (auto& c : comps) {
        for (auto v : c) printf("%llu ", (unsigned long long)v);
        printf("\n");
    }
    return 0;
}
