"""General native chaining vs a brute-force DP with the same (canonical
chain) gap semantics, on real fused multi-path graphs; plus native PSD vs
the Python PostSwitchDistances."""

import numpy as np
import pytest

from centrolign_tpu.modify_graph import reassign_sentinels
from centrolign_tpu.match_finder import find_matches
from centrolign_tpu.path_merge import PathMerge, PostSwitchDistances
from centrolign_tpu.anchorer import Anchorer, _native_psd
from centrolign_tpu.alignment import fuse
from centrolign_tpu.core import Core
from centrolign_tpu.tree import Tree, in_order_newick_string
from centrolign_tpu.native import chain_dp_general, psd_build


def _mutate(rng, seq, rate=0.08):
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append("ACGT"[rng.integers(0, 4)])
        out.append(ch)
    return "".join(out)


def _fused_pair(rng, n=220):
    """Build a 2-path fused graph vs a chain graph (a level-2 subproblem)."""
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    core = Core([("a", _mutate(rng, base)), ("b", _mutate(rng, base)),
                 ("c", _mutate(rng, base))],
                Tree(in_order_newick_string(["a", "b", "c"])))
    core.skip_calibration = True
    ex = core.main_execution
    parent, sub1, sub2 = ex.next()
    reassign_sentinels(sub1.graph, sub1.tableau, 5, 6)
    reassign_sentinels(sub2.graph, sub2.tableau, 7, 8)
    matches = find_matches(sub1.graph, sub2.graph, sub1.tableau, sub2.tableau,
                           3000, core.score_function)
    xm1 = PathMerge(sub1.graph, sub1.tableau)
    xm2 = PathMerge(sub2.graph, sub2.tableau)
    aln = core.align(matches, sub1, sub2, xm1, xm2, True)
    fuse(sub1.graph, sub2.graph, sub1.tableau, sub2.tableau, aln)
    parent.graph = sub1.graph
    parent.tableau = sub1.tableau
    parent.complete = True
    parent2, g_ab, g_c = ex.next()
    reassign_sentinels(g_ab.graph, g_ab.tableau, 5, 6)
    reassign_sentinels(g_c.graph, g_c.tableau, 7, 8)
    return g_ab, g_c, core.score_function


def _flatten(matches, sf):
    starts1, ends1, starts2, ends2, weights = [], [], [], [], []
    for m in matches:
        w = sf.anchor_weight(m.count1, m.count2, m.walks1.shape[1], m.full_length)
        for a in range(len(m.walks1)):
            for b in range(len(m.walks2)):
                starts1.append(m.walks1[a][0])
                ends1.append(m.walks1[a][-1])
                starts2.append(m.walks2[b][0])
                ends2.append(m.walks2[b][-1])
                weights.append(w)
    return (np.array(starts1), np.array(ends1), np.array(starts2),
            np.array(ends2), np.array(weights, dtype=np.float64))


def test_psd_native_matches_python():
    rng = np.random.default_rng(3)
    g_ab, g_c, sf = _fused_pair(rng)
    for sub in (g_ab, g_c):
        xm = PathMerge(sub.graph, sub.tableau)
        py = PostSwitchDistances(sub.graph, xm)
        nat = _native_psd(sub.graph, xm)
        assert np.array_equal(py.distances, nat.distances)


@pytest.mark.parametrize("use_gap", [False, True])
@pytest.mark.parametrize("seed", [17, 29])
def test_general_native_vs_brute(use_gap, seed):
    rng = np.random.default_rng(seed)
    g_ab, g_c, sf = _fused_pair(rng)
    graph1, graph2 = g_ab.graph, g_c.graph
    xm1 = PathMerge(graph1, g_ab.tableau)
    xm2 = PathMerge(graph2, g_c.tableau)
    matches = find_matches(graph1, graph2, g_ab.tableau, g_c.tableau, 3000, sf)
    s1, e1, s2, e2, w = _flatten(matches, sf)
    n = len(s1)
    assert n >= 10
    if n > 500:  # keep the O(n^2) brute force fast
        keep = rng.choice(n, 500, replace=False)
        keep.sort()
        s1, e1, s2, e2, w = s1[keep], e1[keep], s2[keep], e2[keep], w[keep]
        n = 500
    scale = 0.3
    go = np.array([1.25, 50.0, 5000.0])
    ge = np.array([2.5, 0.1, 0.0015])

    # inputs for the native call
    chain1 = xm1.path_head
    chain2 = xm2.path_head
    V1, V2 = graph1.node_size, graph2.node_size
    idx1 = xm1.index_on[np.where(chain1 == -1, 0, chain1), np.arange(V1)]
    idx2 = xm2.index_on[np.where(chain2 == -1, 0, chain2), np.arange(V2)]
    topo1 = graph1.topological_order()
    offs, nodes = [0], []
    for p in range(graph1.path_size):
        nodes.append(graph1.path(p))
        offs.append(offs[-1] + len(nodes[-1]))
    nodes.append(np.array([g_ab.tableau.src_id, g_ab.tableau.snk_id]))
    offs.append(offs[-1] + 2)
    chain1_nodes = np.concatenate(nodes)
    chain1_offsets = np.array(offs[:-1])
    p_ptr1, p_ind1 = graph1.prev_csr()
    p_ptr2, p_ind2 = graph2.prev_csr()
    D1 = psd_build(topo1, p_ptr1, p_ind1, xm1.index_on, xm1.table)
    D2 = psd_build(graph2.topological_order(), p_ptr2, p_ind2, xm2.index_on, xm2.table)

    init_w = np.zeros(n)
    fin_w = np.zeros(n)
    best, backptr, dp = chain_dp_general(
        s1, e1, s2, e2, w, init_w, fin_w, topo1, chain1, idx1, xm1.table, D1,
        chain1_nodes, chain1_offsets, chain2, idx2, xm2.table, D2,
        use_gap, go, ge, scale, 0.0)

    # brute force with identical semantics: predecessors via reachability,
    # gap via canonical end chains vs (T + D - idx) on those chains
    HUGE = np.int64(2**61)
    D1h = np.where(D1 == 0, HUGE, D1)
    D2h = np.where(D2 == 0, HUGE, D2)
    order = np.argsort([int(xm1.index_on[chain1[x], x]) if chain1[x] != -1 else 0
                        for x in s1], kind="stable")
    # order by topological position of start1 instead (always valid)
    pos = np.empty(V1, dtype=np.int64)
    pos[topo1] = np.arange(V1)
    order = np.argsort(pos[s1], kind="stable")
    bdp = np.full(n, -np.inf)
    for j in order:
        best_pred = 0.0  # init
        for i in range(n):
            if bdp[i] == -np.inf:
                continue
            if not (xm1.reachable(e1[i], s1[j]) and xm2.reachable(e2[i], s2[j])):
                continue
            cost = 0.0
            if use_gap:
                c1 = chain1[e1[i]]
                c2 = chain2[e2[i]]
                d1 = xm1.table[s1[j], c1] + D1h[c1, s1[j]] - idx1[e1[i]]
                d2 = xm2.table[s2[j], c2] + D2h[c2, s2[j]] - idx2[e2[i]]
                gap = abs(int(d1) - int(d2))
                if gap != 0:
                    cost = max(-scale * (g + x * gap) for g, x in zip(go, ge))
            best_pred = max(best_pred, bdp[i] + cost)
        bdp[j] = best_pred + w[j]
    want = max(0.0, bdp.max())
    got = max(0.0, dp[best] + fin_w[best]) if best != -1 else 0.0
    assert got == pytest.approx(want, rel=1e-9)
