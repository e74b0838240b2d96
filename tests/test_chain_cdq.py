"""Device CDQ chaining values vs the native engine: bit-exactness.

ops/chain_cdq.py is the jnp realization of native/chain_affine_cdq.cpp
(reference sparse_affine_chain_dp, anchorer.hpp:1812-2470). On an
f64-capable backend its dp/tie/struct/stored outputs must be BIT-identical
to the native engine, and its backpointers must agree wherever the winning
channel is untied (tied steps are the host resolver's job either way).
"""

import numpy as np
import pytest

from centrolign_tpu.native import chain_affine_cdq
from centrolign_tpu.ops.chain_cdq import (chain_cdq_device,
                                          chain_cdq_device_batch)

GO = (1.25, 50.0, 5000.0)
GE = (2.5, 0.1, 0.0015)


def _random_problem(rng, n, span=5000, tie_dense=False):
    if tie_dense:
        grid = 24
        p1 = rng.integers(1, span // grid, n) * grid
        p2 = p1 + rng.choice([-4, 0, 0, 4], n)
        ln1 = np.full(n, 16)
        ln2 = np.full(n, 16)
        w = np.full(n, 16.0, dtype=np.float32)
    else:
        p1 = rng.integers(1, span, n)
        p2 = np.maximum(0, p1 + rng.integers(-40, 40, n))
        ln1 = rng.integers(4, 40, n)
        ln2 = rng.integers(4, 40, n)
        w = (rng.integers(1, 5, n) * 4.0).astype(np.float32)
    ps1, pe1 = p1, p1 + ln1
    ps2, pe2 = p2, p2 + ln2
    init = w.copy()
    # a few source-unreachable anchors
    kill = rng.random(n) < 0.05
    init[kill] = np.float32(np.finfo(np.float32).min)
    # a few query-less anchors (start at chain head)
    head = rng.random(n) < 0.05
    ps1 = ps1.copy()
    ps1[head] = 0
    scale = float(rng.uniform(0.05, 1.5))
    return (ps1.astype(np.int64), pe1.astype(np.int64),
            ps2.astype(np.int64), pe2.astype(np.int64), w, init,
            GO, GE, scale)


def _assert_same(native, device):
    dp_n, bp_n, tie_n, st_n, sv_n, qs_n = native
    dp_d, bp_d, tie_d, st_d, sv_d, qs_d = device
    assert np.array_equal(dp_n, dp_d), "dp values diverge"
    assert np.array_equal(tie_n, tie_d), "tie flags diverge"
    assert np.array_equal(st_n, st_d), "winning structures diverge"
    assert np.array_equal(sv_n, sv_d), "stored range maxima diverge"
    assert np.array_equal(qs_n, qs_d)
    untied = tie_n == 0
    assert np.array_equal(bp_n[untied], bp_d[untied]), \
        "untied backpointers diverge"


@pytest.mark.parametrize("trial", range(6))
def test_device_cdq_bit_identical_random(trial):
    rng = np.random.default_rng(31000 + trial)
    n = int(rng.integers(10, 600))
    prob = _random_problem(rng, n)
    _assert_same(chain_affine_cdq(*prob), chain_cdq_device(*prob))


@pytest.mark.parametrize("trial", range(4))
def test_device_cdq_bit_identical_tie_dense(trial):
    rng = np.random.default_rng(32000 + trial)
    n = int(rng.integers(50, 400))
    prob = _random_problem(rng, n, span=4000, tie_dense=True)
    native = chain_affine_cdq(*prob)
    device = chain_cdq_device(*prob)
    _assert_same(native, device)
    assert (native[2] != 0).any(), "tie-dense fixture produced no ties"


def test_device_cdq_empty_and_single():
    empty = (np.empty(0, np.int64),) * 4 + (
        np.empty(0, np.float32), np.empty(0, np.float32), GO, GE, 1.0)
    for a, b in zip(chain_affine_cdq(*empty), chain_cdq_device(*empty)):
        assert np.array_equal(a, b)
    one = (np.array([3]), np.array([8]), np.array([2]), np.array([7]),
           np.array([5.0], np.float32), np.array([5.0], np.float32),
           GO, GE, 0.5)
    _assert_same(chain_affine_cdq(*one), chain_cdq_device(*one))


def test_device_cdq_batch_matches_singles():
    rng = np.random.default_rng(33000)
    probs = [_random_problem(rng, int(rng.integers(5, 200)))
             for _ in range(5)]
    batched = chain_cdq_device_batch(probs)
    for prob, got in zip(probs, batched):
        _assert_same(chain_affine_cdq(*prob), got)


def test_device_cdq_through_anchorer(monkeypatch):
    """CENTROLIGN_TPU_DEVICE_CDQ=1 routes the value pass of
    Anchorer._chain_affine_cdq through the device engine; the final chain
    must equal the default (native CDQ) chain exactly."""
    from test_chain_ties import (_setup_graphs, _tie_dense_matches,
                                 _run_chain)
    rng = np.random.default_rng(606)
    graphs = _setup_graphs(rng, 260, 260)
    matches = _tie_dense_matches(rng, 256, n_pos=24, dup=3)
    want = _run_chain(monkeypatch, matches, graphs, cdq=True)
    monkeypatch.setenv("CENTROLIGN_TPU_DEVICE_CDQ", "1")
    import centrolign_tpu.anchorer as anch
    used = {"n": 0}
    orig = anch.Anchorer._cdq_values

    def spy(self, *a, **k):
        used["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(anch.Anchorer, "_cdq_values", spy)
    got = _run_chain(monkeypatch, matches, graphs, cdq=True)
    assert used["n"] > 0
    assert got == want
