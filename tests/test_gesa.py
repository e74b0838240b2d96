"""GESA stack: prefix-doubled automaton index, minimal rare matches vs a
brute-force walk oracle, determinize, Simplifier, and the GESAMatchFinder
retry loop (the reference's test_gesa / test_match_finding pattern)."""

import numpy as np
import pytest

from centrolign_tpu.gesa import GESA
from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.modify_graph import make_base_graph, add_sentinels

from util import random_dag, graph_sources, graph_sinks


def _wrap(graph, s1, s2):
    return add_sentinels(graph, s1, s2)


def brute_counts(graphs, max_len):
    """string -> per-component set of start nodes able to spell it."""
    from collections import defaultdict
    counts = defaultdict(lambda: [set() for _ in graphs])
    for ci, g in enumerate(graphs):
        for start in range(g.node_size):
            stack = [(start, (int(g.label(start)),))]
            while stack:
                v, s = stack.pop()
                counts[s][ci].add(start)
                if len(s) < max_len:
                    for w in g.next(v):
                        stack.append((int(w), s + (int(g.label(int(w))),)))
    return counts


def brute_minimal_rare(graphs, max_count, max_len=12):
    counts = brute_counts(graphs, max_len)

    def cnt(s):
        return [len(x) for x in counts.get(s, [set()] * len(graphs))]

    out = {}
    for s, sets in counts.items():
        c = [len(x) for x in sets]
        if any(v == 0 for v in c):
            continue
        total = 1
        for v in c:
            total *= v
        if total > max_count:
            continue
        if len(s) > 1:
            pre = cnt(s[:-1])
            suf = cnt(s[1:])
            if not any(c[i] < pre[i] for i in range(len(c))):
                continue
            if not any(c[i] < suf[i] for i in range(len(c))):
                continue
        out[s] = tuple(c)
    return out


def gesa_matches_as_strings(gesa, graphs, max_count):
    out = {}
    for node, length, cnts in gesa.minimal_rare_matches(max_count):
        walks = gesa.walk_matches(node, length)
        s = None
        for comp, walk in walks:
            g = graphs[comp]
            ss = tuple(int(g.label(v)) for v in walk)
            assert s is None or s == ss, "inconsistent walk strings"
            s = ss
        out[s] = tuple(cnts)
    return out


@pytest.mark.parametrize("trial", range(6))
def test_gesa_minimal_rare_matches_vs_brute(trial):
    rng = np.random.default_rng(500 + trial)
    seqs = []
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))

    def mut(s):
        return "".join("ACGT"[rng.integers(0, 4)] if rng.random() < 0.1
                       else c for c in s)
    g1 = make_base_graph("a", mut(base))
    _wrap(g1, 5, 6)
    g2 = make_base_graph("b", mut(base))
    _wrap(g2, 7, 8)
    graphs = [g1, g2]
    max_count = int(rng.integers(2, 12))
    gesa = GESA(graphs)
    got = gesa_matches_as_strings(gesa, graphs, max_count)
    exp = brute_minimal_rare(graphs, max_count)
    assert got == exp, (sorted(got.items()), sorted(exp.items()))


def test_gesa_on_dags():
    # GESA requires reverse-deterministic inputs (the reference's trie
    # expansion maintains this property); determinize the random DAGs first
    from centrolign_tpu.determinize import determinize, translate_tableau
    rng = np.random.default_rng(77)
    ran = 0
    for trial in range(6):
        g1 = random_dag(rng, int(rng.integers(6, 18)))
        g2 = random_dag(rng, int(rng.integers(6, 18)))
        _wrap(g1, 5, 6)
        _wrap(g2, 7, 8)
        g1 = determinize(g1)
        g2 = determinize(g2)
        graphs = [g1, g2]
        gesa = GESA(graphs)
        got = gesa_matches_as_strings(gesa, graphs, 8)
        exp = brute_minimal_rare(graphs, 8, max_len=14)
        assert got == exp
        ran += 1
    assert ran == 6


def test_determinize_and_rewalk():
    from centrolign_tpu.determinize import (determinize, translate_tableau,
                                            rewalk_paths)
    rng = np.random.default_rng(3)
    for trial in range(5):
        g = random_dag(rng, int(rng.integers(8, 25)))
        t = _wrap(g, 5, 6)
        # give it a couple of paths (walks source->sink)
        from centrolign_tpu.graph_algs import topological_order
        for p in range(2):
            walk = [t.src_id]
            while g.next_size(walk[-1]):
                nxt = g.next(walk[-1])
                walk.append(int(nxt[rng.integers(0, len(nxt))]))
            pid = g.add_path(f"rw{trial}_{p}")
            for v in walk[1:-1]:
                g.extend_path(pid, v)
        det = determinize(g)
        # reverse determinism: no node has two same-labeled predecessors
        for v in range(det.node_size):
            labs = [int(det.label(int(p))) for p in det.previous(v)]
            assert len(labs) == len(set(labs))
        t2 = translate_tableau(det, t)
        rewalk_paths(det, t2, g)
        assert det.path_size == g.path_size
        for pid in range(g.path_size):
            s1 = [int(g.label(int(v))) for v in g.path(pid)]
            s2 = [int(det.label(int(v))) for v in det.path(pid)]
            assert s1 == s2, pid


def test_simplifier_preserves_paths():
    from centrolign_tpu.simplifier import Simplifier
    rng = np.random.default_rng(21)
    # a bubble-rich graph from overlapping mutated paths
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    g = make_base_graph("p0", base)
    t = _wrap(g, 5, 6)
    simp = Simplifier()
    simp.max_walks = 2
    simp.min_dist_window = 16
    simp.preserve_bubble_size = 64
    out = simp.simplify(g, t)
    # every original path spells the same labels in the expanded graph
    for pid in range(g.path_size):
        name = g.path_name(pid)
        s1 = [int(g.label(int(v))) for v in g.path(pid)]
        pid2 = out.graph.path_id(name)
        s2 = [int(out.graph.label(int(v))) for v in out.graph.path(pid2)]
        assert s1 == s2
    # back translation maps to original nodes with identical labels
    for v in range(out.graph.node_size):
        assert int(out.graph.label(v)) == int(
            g.label(out.back_translation[v]))


def test_gesa_match_finder_end_to_end():
    from centrolign_tpu.match_finder import GESAMatchFinder, find_matches
    from centrolign_tpu.score_function import ScoreFunction
    rng = np.random.default_rng(8)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))

    def mut(s):
        return "".join("ACGT"[rng.integers(0, 4)] if rng.random() < 0.05
                       else c for c in s)
    g1 = make_base_graph("a", mut(base))
    t1 = _wrap(g1, 5, 6)
    g2 = make_base_graph("b", mut(base))
    t2 = _wrap(g2, 7, 8)
    sf = ScoreFunction()
    mf = GESAMatchFinder(score_function=sf, max_count=50)
    sets = mf.find_matches(g1, g2, t1, t2)
    assert len(sets) > 5
    # every walk must spell a real graph walk with consistent labels
    for ms in sets:
        for w in ms.walks1:
            for a, b in zip(w[:-1], w[1:]):
                assert int(b) in set(int(x) for x in g1.next(int(a)))
        s1 = tuple(int(g1.label(int(v))) for v in ms.walks1[0])
        s2 = tuple(int(g2.label(int(v))) for v in ms.walks2[0])
        assert s1 == s2
