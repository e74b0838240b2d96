"""Device event-scan chaining vs the native parity engine.

The ops/chain_scan.py event scan must produce the IDENTICAL anchor chain
(and therefore identical downstream output) as the reference-exact native
sparse engine on chain x chain workloads — including the calibration-style
self-match workload, which is the production consumer of the Sparse
algorithm (VERDICT r2 #5)."""

import numpy as np
import pytest

from centrolign_tpu.anchorer import Anchorer
from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.match_finder import find_matches
from centrolign_tpu.modify_graph import (SentinelTableau, add_sentinels)
from centrolign_tpu.path_merge import ChainMerge
from centrolign_tpu.score_function import ScoreFunction


def _chain_graph_from_seq(seq, name, src_sent, snk_sent):
    g = BaseGraph()
    prev = None
    ids = []
    for c in seq:
        nid = g.add_node("ACGT".index(c))
        ids.append(nid)
        if prev is not None:
            g.add_edge(prev, nid)
        prev = nid
    pid = g.add_path(name)
    g.extend_path_array(pid, np.array(ids, dtype=np.int64))
    tab = add_sentinels(g, src_sent, snk_sent)
    return g, tab


def _mutate(rng, seq, rate=0.05):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append("ACGT"[rng.integers(4)])
            continue
        out.append(c)
        if rng.random() < rate / 3:
            out.append("ACGT"[rng.integers(4)])
    return "".join(out)


def _workload(rng, n=400, selfmatch=False):
    base = "".join("ACGT"[rng.integers(4)] for _ in range(n))
    # tandem structure so matches repeat (the calibration regime)
    seq1 = base + _mutate(rng, base)
    seq2 = seq1 if selfmatch else (_mutate(rng, base) + base)
    g1, t1 = _chain_graph_from_seq(seq1, "a", 5, 6)
    g2, t2 = _chain_graph_from_seq(seq2, "b", 7, 8)
    return g1, t1, g2, t2


@pytest.mark.parametrize("selfmatch", [False, True])
@pytest.mark.parametrize("trial", range(3))
def test_chain_scan_matches_native(monkeypatch, trial, selfmatch):
    rng = np.random.default_rng(trial * 11 + selfmatch)
    g1, t1, g2, t2 = _workload(rng, selfmatch=selfmatch)
    sf = ScoreFunction()
    if not find_matches(g1, g2, t1, t2, 3000, sf):
        pytest.skip("no matches in this trial")
    xm1 = ChainMerge(g1, t1)
    xm2 = ChainMerge(g2, t2)

    anch = Anchorer(score_function=sf)

    def run():
        # fresh matches per run: the parity engine's memory-saving graph
        # switch swaps walk arrays in place
        matches = find_matches(g1, g2, t1, t2, 3000, sf)
        from centrolign_tpu.anchorer import ChainAlgorithm
        return anch._anchor_chain_global(
            matches, g1, g2, t1, t2, xm1, xm2,
            ChainAlgorithm.Sparse, 1.0, None)

    monkeypatch.delenv("CENTROLIGN_TPU_DEVICE_CHAIN", raising=False)
    native = run()
    monkeypatch.setenv("CENTROLIGN_TPU_DEVICE_CHAIN", "1")
    device = run()

    # output must be IDENTICAL to the native engine, including on exact
    # f32 DP ties (the scan resolves them with the native search tree's
    # visit/insert-order rules, computed by rank arithmetic)
    assert len(native) == len(device)
    for a, b in zip(native, device):
        assert np.array_equal(a.walk1, b.walk1)
        assert np.array_equal(a.walk2, b.walk2)
        assert a.count1 == b.count1 and a.count2 == b.count2


def test_chain_scan_engages_on_chain_graphs(monkeypatch):
    """The device path must actually run (not silently fall back) on a
    chain x chain workload."""
    import centrolign_tpu.ops.chain_scan as cs
    calls = []
    orig = cs.sparse_chain_scan

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(cs, "sparse_chain_scan", spy)
    monkeypatch.setenv("CENTROLIGN_TPU_DEVICE_CHAIN", "1")
    rng = np.random.default_rng(0)
    g1, t1, g2, t2 = _workload(rng)
    sf = ScoreFunction()
    matches = find_matches(g1, g2, t1, t2, 3000, sf)
    xm1 = ChainMerge(g1, t1)
    xm2 = ChainMerge(g2, t2)
    from centrolign_tpu.anchorer import ChainAlgorithm
    Anchorer(score_function=sf)._anchor_chain_global(
        matches, g1, g2, t1, t2, xm1, xm2, ChainAlgorithm.Sparse, 1.0, None)
    assert calls, "device chain scan never engaged"
