"""Anchor chaining tests: chain validity, optimality on small cases vs a
brute-force chain enumerator."""

import itertools

import numpy as np
import pytest

from centrolign_tpu.modify_graph import make_base_graph, add_sentinels
from centrolign_tpu.match_finder import find_matches
from centrolign_tpu.path_merge import PathMerge
from centrolign_tpu.anchorer import Anchorer, ChainAlgorithm
from centrolign_tpu.score_function import ScoreFunction


def _setup(seq1, seq2):
    g1 = make_base_graph("a", seq1)
    g2 = make_base_graph("b", seq2)
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    xm1 = PathMerge(g1, t1)
    xm2 = PathMerge(g2, t2)
    return g1, g2, t1, t2, xm1, xm2


def _mutate(rng, seq, rate=0.1):
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append("ACGT"[rng.integers(0, 4)])
        out.append(ch)
    return "".join(out)


@pytest.mark.parametrize("trial", range(4))
def test_chain_is_valid(trial):
    rng = np.random.default_rng(50 + trial)
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    seq2 = _mutate(rng, seq1)
    g1, g2, t1, t2, xm1, xm2 = _setup(seq1, seq2)
    sf = ScoreFunction()
    anchorer = Anchorer(score_function=sf)
    matches = find_matches(g1, g2, t1, t2, 3000, sf)
    assert matches
    chain = anchorer.anchor_chain(matches, g1, g2, t1, t2, xm1, xm2)
    assert chain, "expected a nonempty chain on similar sequences"
    # consecutive anchors strictly reachable in both graphs; walks ascending
    for a, b in zip(chain, chain[1:]):
        assert xm1.reachable(a.walk1[-1], b.walk1[0])
        assert xm2.reachable(a.walk2[-1], b.walk2[0])
    # anchors spell equal strings in the two graphs
    for a in chain:
        assert np.array_equal(g1.labels[a.walk1], g2.labels[a.walk2])


def test_chain_optimal_vs_brute():
    """On chains (sequences), compare total anchor weight against brute-force
    enumeration of all valid chains (Sparse semantics: no gap costs)."""
    rng = np.random.default_rng(77)
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    seq2 = _mutate(rng, seq1, rate=0.2)
    g1, g2, t1, t2, xm1, xm2 = _setup(seq1, seq2)
    sf = ScoreFunction()
    anchorer = Anchorer(score_function=sf,
                        chaining_algorithm=ChainAlgorithm.Sparse,
                        autocalibrate_gap_penalties=False)
    matches = find_matches(g1, g2, t1, t2, 3000, sf)
    chain = anchorer.anchor_chain(matches, g1, g2, t1, t2, xm1, xm2)
    got = sum(a.score for a in chain)

    # brute force over all anchors (ok for tiny case)
    anchors = []
    for si, m in enumerate(matches):
        w = sf.anchor_weight(m.count1, m.count2, m.walks1.shape[1], m.full_length)
        for a in range(len(m.walks1)):
            for b in range(len(m.walks2)):
                anchors.append((m.walks1[a], m.walks2[b], w))
    best = 0.0

    n = len(anchors)
    # DP over anchors sorted by start1
    order = sorted(range(n), key=lambda i: anchors[i][0][0])
    dp = [None] * n
    for pos, i in enumerate(order):
        w1, w2, w = anchors[i]
        dp_i = w
        for j in order[:pos]:
            v1, v2, _ = anchors[j]
            if dp[j] is not None and v1[-1] < w1[0] and v2[-1] < w2[0]:
                dp_i = max(dp_i, dp[j] + w)
        dp[i] = dp_i
        best = max(best, dp_i)
    assert got == pytest.approx(best)
