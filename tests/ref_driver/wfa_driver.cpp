// Test-only driver: calls the REFERENCE implementation's aligners (via its
// public headers + shared library) on a problem read from stdin, printing the
// alignment, so our native reimplementations can be checked pair-for-pair.
// Input: V1 E1 \n labels1 \n edges(from to)... \n V2 E2 ... \n
//        ns1 src1... nk1 sinks1... ns2 src2... nk2 sinks2...
//        mode prune_limit   (mode: 0 wfa, 1 pwfa, 2 deletion, 3 po_poa,
//                            4 pure_deletion(graph1), 5 greedy_partial)
#include <iostream>
#include <vector>
#include "centrolign/graph.hpp"
#include "centrolign/alignment.hpp"

using namespace centrolign;
using namespace std;

static BaseGraph read_graph() {
    size_t V, E;
    cin >> V >> E;
    BaseGraph g;
    for (size_t i = 0; i < V; ++i) {
        int c;
        cin >> c;
        g.add_node((char)c);
    }
    for (size_t i = 0; i < E; ++i) {
        uint64_t a, b;
        cin >> a >> b;
        g.add_edge(a, b);
    }
    return g;
}

static vector<uint64_t> read_ids() {
    size_t n;
    cin >> n;
    vector<uint64_t> v(n);
    for (auto& x : v) cin >> x;
    return v;
}

int main() {
    BaseGraph g1 = read_graph();
    BaseGraph g2 = read_graph();
    auto src1 = read_ids();
    auto snk1 = read_ids();
    auto src2 = read_ids();
    auto snk2 = read_ids();
    int mode;
    int64_t prune;
    cin >> mode >> prune;
    AlignmentParameters<3> params;
    params.match = 20;
    params.mismatch = 80;
    params.gap_open[0] = 60; params.gap_extend[0] = 30;
    params.gap_open[1] = 800; params.gap_extend[1] = 5;
    params.gap_open[2] = 2500; params.gap_extend[2] = 1;
    int64_t score = 0;
    Alignment aln;
    if (mode == 0) {
        aln = wfa_po_poa(g1, g2, src1, src2, snk1, snk2, params, &score);
    } else if (mode == 1) {
        aln = pwfa_po_poa(g1, g2, src1, src2, snk1, snk2, params, prune, &score);
    } else if (mode == 2) {
        aln = deletion_wfa_po_poa(g1, g2, src1, src2, snk1, snk2, params, &score);
    } else if (mode == 3) {
        aln = po_poa(g1, g2, src1, src2, snk1, snk2, params, &score);
    } else if (mode == 4) {
        aln = pure_deletion_alignment(g1, src1, snk1, params, &score);
    } else {
        aln = greedy_partial_alignment(g1, g2, src1, src2, snk1, snk2, params, &score);
    }
    cout << score << "\n" << aln.size() << "\n";
    for (auto& p : aln)
        cout << (int64_t)p.node_id1 << " " << (int64_t)p.node_id2 << "\n";
    return 0;
}
