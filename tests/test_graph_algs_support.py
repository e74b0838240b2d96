"""Oracle tests for the standalone support algorithms (reference
bridges.hpp, target_reachability.hpp, integer_sort.hpp)."""

import numpy as np
import pytest

from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.graph_algs import (
    bridges, bridge_components, integer_sort, target_reachability,
    is_reachable, topological_order)

from util import random_dag


def _random_graph(rng, n, extra_edges):
    """Random undirected-ish DAG-shaped multigraph (edges low->high keeps
    BaseGraph acyclic; bridges/components view it undirected anyway)."""
    g = BaseGraph()
    ids = g.add_nodes(rng.integers(0, 4, size=n).astype(np.uint8))
    for k in range(1, n):
        if rng.random() < 0.8:  # mostly connected spine
            j = int(rng.integers(0, k))
            g.add_edges([ids[j]], [ids[k]])
    for _ in range(extra_edges):
        a, b = sorted(rng.integers(0, n, size=2))
        if a != b:
            g.add_edges([ids[a]], [ids[b]])
    return g


def _brute_bridges(g):
    """An edge is a bridge iff removing it splits its undirected
    component."""
    nptr, nind = g.next_csr()
    edges = [(v, int(nind[k]))
             for v in range(g.node_size)
             for k in range(nptr[v], nptr[v + 1])]

    def components(skip_eid):
        adj = [[] for _ in range(g.node_size)]
        for e, (a, b) in enumerate(edges):
            if e == skip_eid:
                continue
            adj[a].append(b)
            adj[b].append(a)
        comp = [-1] * g.node_size
        c = 0
        for r in range(g.node_size):
            if comp[r] != -1:
                continue
            stack = [r]
            comp[r] = c
            while stack:
                v = stack.pop()
                for u in adj[v]:
                    if comp[u] == -1:
                        comp[u] = c
                        stack.append(u)
            c += 1
        return c

    base = components(-1)
    return sorted({edges[e] for e in range(len(edges))
                   if components(e) > base})


@pytest.mark.parametrize("trial", range(8))
def test_bridges_matches_brute_force(trial):
    rng = np.random.default_rng(trial * 13 + 5)
    g = _random_graph(rng, int(rng.integers(5, 28)), int(rng.integers(0, 18)))
    got = [tuple(e) for e in bridges(g)]
    assert got == _brute_bridges(g)


@pytest.mark.parametrize("trial", range(4))
def test_bridge_components_partition(trial):
    rng = np.random.default_rng(trial * 7 + 3)
    g = _random_graph(rng, 20, 8)
    comps = bridge_components(g)
    allnodes = np.concatenate([nodes for nodes, _ in comps])
    assert sorted(allnodes.tolist()) == list(range(g.node_size))
    br = {tuple(e) for e in bridges(g)}
    nptr, nind = g.next_csr()
    n_edges = sum(len(es) for _, es in comps)
    # every non-bridge edge appears in exactly one component
    expect = sum(1 for v in range(g.node_size)
                 for k in range(nptr[v], nptr[v + 1])
                 if (v, int(nind[k])) not in br)
    assert n_edges == expect
    for nodes, es in comps:
        ns = set(nodes.tolist())
        assert all(a in ns and b in ns for a, b in es)


@pytest.mark.parametrize("trial", range(6))
def test_target_reachability_matches_pairwise(trial):
    rng = np.random.default_rng(trial * 11 + 1)
    g = random_dag(rng, 30, 1.8)
    targets = rng.integers(0, g.node_size,
                           size=int(rng.integers(1, 4))).tolist()
    got = target_reachability(g, targets)
    for v in range(g.node_size):
        expect = any(is_reachable(g, v, t) or v == t for t in targets)
        assert bool(got[v]) == expect, (v, targets)


def test_integer_sort_is_stable_counting_sort():
    rng = np.random.default_rng(2)
    idx = rng.permutation(200)
    ranks_of = rng.integers(0, 12, size=200)
    ranks = ranks_of[idx]
    got = integer_sort(idx, ranks)
    # stable: equal ranks keep their input order
    expect = [i for _, i in sorted(
        ((ranks_of[i], pos) for pos, i in enumerate(idx)),
        key=lambda t: (ranks_of[idx[t[1]]], t[1]))]
    expect = [idx[p] for p in expect]
    assert got.tolist() == expect
