"""Shared test utilities: random graph generators (in the style of the
reference's test_util, reference src/test_util.cpp) and a literal push-style
po_poa used to cross-validate the vectorized oracle."""

import numpy as np

from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.graph_algs import topological_order
from centrolign_tpu.ops.align_params import AlignmentParams, MININF


def random_dag(rng, num_nodes: int, extra_edge_prob: float = 0.15) -> BaseGraph:
    """Random connected DAG over a chain backbone with forward skip edges;
    every node lies on a source->sink walk."""
    g = BaseGraph()
    g.add_nodes(rng.integers(0, 4, size=num_nodes))
    ef, et = [], []
    for i in range(num_nodes - 1):
        ef.append(i)
        et.append(i + 1)
    for i in range(num_nodes):
        for j in range(i + 2, min(num_nodes, i + 6)):
            if rng.random() < extra_edge_prob:
                ef.append(i)
                et.append(j)
    # shuffle edge insertion order to exercise adjacency-order tie-breaking
    order = rng.permutation(len(ef))
    ef = [ef[i] for i in order]
    et = [et[i] for i in order]
    g.add_edges(ef, et)
    pid = g.add_path("p0")
    g.extend_path_array(pid, np.arange(num_nodes))
    return g


def random_chain(rng, length: int) -> BaseGraph:
    g = BaseGraph()
    ids = g.add_nodes(rng.integers(0, 4, size=length))
    if length > 1:
        g.add_edges(ids[:-1], ids[1:])
    pid = g.add_path("p0")
    g.extend_path_array(pid, ids)
    return g


def graph_sources(g):
    return np.flatnonzero(g.in_degrees() == 0)


def graph_sinks(g):
    return np.flatnonzero(g.out_degrees() == 0)


def popoa_fill_push(graph1, graph2, sources1, sources2, params: AlignmentParams):
    """Literal push-style reimplementation of the reference DP loops
    (alignment.hpp:788-938), scalar, for cross-validation only."""
    V1, V2 = graph1.node_size, graph2.node_size
    npw = params.num_pw
    lab1, lab2 = graph1.labels, graph2.labels
    go, ge = params.gap_open, params.gap_extend

    M = np.full((V1 + 1, V2 + 1), MININF, dtype=np.int64)
    I = np.full((npw, V1 + 1, V2 + 1), MININF, dtype=np.int64)
    D = np.full((npw, V1 + 1, V2 + 1), MININF, dtype=np.int64)

    def align(n1, n2):
        return params.match if lab1[n1] == lab2[n2] else -params.mismatch

    order1 = topological_order(graph1)
    order2 = topological_order(graph2)

    for s1 in sources1:
        for s2 in sources2:
            M[s1, s2] = align(s1, s2)
        for pw in range(npw):
            I[pw, s1, V2] = -go[pw] - ge[pw]
    for s2 in sources2:
        for pw in range(npw):
            D[pw, V1, s2] = -go[pw] - ge[pw]

    # DP along initial insertions (boundary column)
    for n1 in order1:
        for pw in range(npw):
            M[n1, V2] = max(M[n1, V2], I[pw, n1, V2])
        for nxt in graph1.next(n1):
            for pw in range(npw):
                I[pw, nxt, V2] = max(I[pw, nxt, V2], I[pw, n1, V2] - ge[pw])
        for s2 in sources2:
            for pw in range(npw):
                D[pw, n1, s2] = max(D[pw, n1, s2], M[n1, V2] - go[pw] - ge[pw])
        for nxt in graph1.next(n1):
            for s2 in sources2:
                M[nxt, s2] = max(M[nxt, s2], M[n1, V2] + align(nxt, s2))

    # DP along initial deletions (boundary row)
    for n2 in order2:
        for pw in range(npw):
            M[V1, n2] = max(M[V1, n2], D[pw, V1, n2])
        for nxt in graph2.next(n2):
            for pw in range(npw):
                D[pw, V1, nxt] = max(D[pw, V1, nxt], D[pw, V1, n2] - ge[pw])
        for s1 in sources1:
            for pw in range(npw):
                I[pw, s1, n2] = max(I[pw, s1, n2], M[V1, n2] - go[pw] - ge[pw])
        for nxt in graph2.next(n2):
            for s1 in sources1:
                M[s1, nxt] = max(M[s1, nxt], M[V1, n2] + align(s1, nxt))

    # interior
    for n1 in order1:
        nxt1 = graph1.next(n1)
        for n2 in order2:
            for pw in range(npw):
                M[n1, n2] = max(M[n1, n2], I[pw, n1, n2], D[pw, n1, n2])
            for v in nxt1:
                for pw in range(npw):
                    I[pw, v, n2] = max(I[pw, v, n2],
                                       M[n1, n2] - go[pw] - ge[pw],
                                       I[pw, n1, n2] - ge[pw])
            for w in graph2.next(n2):
                for pw in range(npw):
                    D[pw, n1, w] = max(D[pw, n1, w],
                                       M[n1, n2] - go[pw] - ge[pw],
                                       D[pw, n1, n2] - ge[pw])
            for v in nxt1:
                for w in graph2.next(n2):
                    M[v, w] = max(M[v, w], M[n1, n2] + align(v, w))

    return M, I, D
