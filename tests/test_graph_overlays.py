"""Overlay adapters vs brute-force oracles (reference reverse_graph.hpp,
source_sink_graph.hpp, adjacency_graph.hpp, chain_cycle_graph.hpp,
labeled_graph.hpp)."""

import numpy as np

from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.graph_algs import topological_order
from centrolign_tpu.graph_overlays import (
    AdjacencyGraph, ChainCycleGraph, LabeledGraph, ReverseGraph,
    SourceSinkGraph)


def _random_dag(rng, V=40, p=0.12):
    g = BaseGraph()
    ids = g.add_nodes(rng.integers(0, 4, size=V).astype(np.uint8))
    ef, et = [], []
    for i in range(V):
        for j in range(i + 1, V):
            if rng.random() < p:
                ef.append(ids[i])
                et.append(ids[j])
    if ef:
        g.add_edges(np.asarray(ef), np.asarray(et))
    return g


def _edge_set(graph):
    p, i = graph.next_csr()
    return {(u, int(v)) for u in range(graph.node_size)
            for v in i[p[u]:p[u + 1]]}


def test_reverse_graph(rng):
    g = _random_dag(rng)
    rg = ReverseGraph(g)
    assert rg.node_size == g.node_size
    assert _edge_set(rg) == {(v, u) for (u, v) in _edge_set(g)}
    assert np.array_equal(rg.in_degrees(), g.out_degrees())
    order = topological_order(rg)  # reversed DAG is still a DAG
    pos = np.empty(rg.node_size, dtype=np.int64)
    pos[order] = np.arange(rg.node_size)
    for (u, v) in _edge_set(rg):
        assert pos[u] < pos[v]


def test_source_sink_graph(rng):
    g = _random_dag(rng)
    ss = SourceSinkGraph(g)
    V = g.node_size
    assert ss.node_size == V + 2
    assert ss.source_id() == V and ss.sink_id() == V + 1
    indeg = ss.in_degrees()
    outdeg = ss.out_degrees()
    # the virtual source is the unique source; the virtual sink the unique sink
    assert indeg[V] == 0 and outdeg[V + 1] == 0
    assert np.count_nonzero(indeg == 0) == 1
    assert np.count_nonzero(outdeg == 0) == 1
    assert _edge_set(g) <= _edge_set(ss)
    # every original source/sink is wired to the virtual pair
    for s in np.flatnonzero(g.in_degrees() == 0):
        assert (V, int(s)) in _edge_set(ss)
    for t in np.flatnonzero(g.out_degrees() == 0):
        assert (int(t), V + 1) in _edge_set(ss)


def test_chain_cycle_graph():
    g = BaseGraph()
    ids = g.add_nodes(np.array([0, 1, 2, 3], dtype=np.uint8))
    g.add_edges(ids[:-1], ids[1:])
    cc = ChainCycleGraph(g, src_id=int(ids[0]), snk_id=int(ids[-1]))
    assert (int(ids[-1]), int(ids[0])) in _edge_set(cc)
    assert list(cc.next(int(ids[-1]))) == [int(ids[0])]
    assert list(cc.previous(int(ids[0]))) == [int(ids[-1])]
    # now cyclic: every node has in- and out-degree 1
    assert (cc.in_degrees() == 1).all() and (cc.out_degrees() == 1).all()


def _brute_adjacency_components(g):
    """Union-find over node sides: right(u) ~ left(v) for every edge u->v."""
    V = g.node_size
    parent = list(range(2 * V))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v) in _edge_set(g):
        a, b = find(2 * u), find(2 * v + 1)
        if a != b:
            parent[a] = b
    return [find(2 * v + s) for v in range(V) for s in (0, 1)]


def test_adjacency_graph(rng):
    for _ in range(10):
        g = _random_dag(rng, V=25, p=0.15)
        ag = AdjacencyGraph(g)
        V = g.node_size
        # same partition of node sides as a brute union-find
        brute = _brute_adjacency_components(g)
        seen = {}
        for v in range(V):
            for s, left in ((0, False), (1, True)):
                key = brute[2 * v + s]
                comp = ag.side_component(v, left)
                assert seen.setdefault(key, comp) == comp
        assert len(set(seen.values())) == ag.node_size
        # one edge per underlying node, labeled by it, left comp -> right comp
        labels = []
        for c in range(ag.node_size):
            for target, node in ag.next_edges(c):
                labels.append(node)
                assert ag.side_component(node, left=True) == c
                assert ag.side_component(node, left=False) == target
        assert sorted(labels) == list(range(V))


def test_labeled_graph():
    g = LabeledGraph()
    a = g.add_node("alpha")
    b = g.add_node(("tuple", 2))
    c = g.add_node("gamma")
    g.add_edge(a, b)
    g.add_edge(b, c)
    assert g.node_size == 3
    assert g.label(b) == ("tuple", 2)
    g.relabel(b, "beta")
    assert g.label(b) == "beta"
    assert list(g.next(a)) == [b] and list(g.previous(c)) == [b]
    order = topological_order(g)
    assert list(order) == [a, b, c]
