"""Cross-validation of the vectorized po_poa oracle against a literal
push-style implementation of the reference loops, plus self-consistency."""

import numpy as np
import pytest

from centrolign_tpu.ops.align_params import AlignmentParams, MININF
from centrolign_tpu.ops.popoa_ref import popoa, popoa_fill, popoa_traceback
from centrolign_tpu.alignment import score_alignment, GAP

from util import (
    random_dag, random_chain, graph_sources, graph_sinks, popoa_fill_push,
)

PARAMS = [
    AlignmentParams(20, 80, (60, 800, 2500), (30, 5, 1)),
    AlignmentParams(1, 1, (1,), (1,)),
    AlignmentParams(2, 3, (4, 1), (2, 5)),
]


def _masked_equal(a, b):
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    junk_a = a <= MININF // 2
    junk_b = b <= MININF // 2
    if not np.array_equal(junk_a, junk_b):
        return False
    return np.array_equal(a[~junk_a], b[~junk_b])


@pytest.mark.parametrize("params", PARAMS)
@pytest.mark.parametrize("trial", range(4))
def test_fill_matches_push_dags(rng, params, trial):
    rng = np.random.default_rng(1000 * trial + params.num_pw)
    g1 = random_dag(rng, int(rng.integers(4, 28)))
    g2 = random_dag(rng, int(rng.integers(4, 28)))
    s1, s2 = graph_sources(g1), graph_sources(g2)
    k1, k2 = graph_sinks(g1), graph_sinks(g2)

    M, I, D = popoa_fill(g1, g2, s1, s2, params)
    Mp, Ip, Dp = popoa_fill_push(g1, g2, s1, s2, params)
    assert _masked_equal(M, Mp), "M mismatch"
    assert _masked_equal(I, Ip), "I mismatch"
    assert _masked_equal(D, Dp), "D mismatch"

    aln_a, score_a = popoa_traceback(g1, g2, s1, s2, k1, k2, params, M, I, D)
    aln_b, score_b = popoa_traceback(
        g1, g2, s1, s2, k1, k2, params,
        Mp.astype(np.int64), Ip.astype(np.int64), Dp.astype(np.int64))
    assert score_a == score_b
    assert np.array_equal(aln_a, aln_b)


@pytest.mark.parametrize("trial", range(5))
def test_chain_score_consistency(trial):
    rng = np.random.default_rng(42 + trial)
    params = AlignmentParams(20, 80, (60, 800, 2500), (30, 5, 1))
    g1 = random_chain(rng, int(rng.integers(5, 60)))
    g2 = random_chain(rng, int(rng.integers(5, 60)))
    aln, score = popoa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params)
    # alignment must be global: consumes every node of both chains in order
    used1 = aln[aln[:, 0] != GAP, 0]
    used2 = aln[aln[:, 1] != GAP, 1]
    assert np.array_equal(used1, np.arange(g1.node_size))
    assert np.array_equal(used2, np.arange(g2.node_size))
    assert score == score_alignment(g1.labels, g2.labels, aln, params)


def test_identical_chains_align_perfectly():
    rng = np.random.default_rng(7)
    params = AlignmentParams()
    g1 = random_chain(rng, 40)
    g2 = BaseGraph_copy(g1)
    aln, score = popoa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params)
    assert score == 40 * params.match
    assert (aln[:, 0] == aln[:, 1]).all()


def BaseGraph_copy(g):
    return g.copy()


def test_empty_side():
    rng = np.random.default_rng(3)
    params = AlignmentParams()
    from centrolign_tpu.graph import BaseGraph
    g1 = random_chain(rng, 6)
    g2 = BaseGraph()
    aln, score = popoa(g1, g2, graph_sources(g1), [], graph_sinks(g1), [], params)
    assert len(aln) == 6
    assert (aln[:, 1] == GAP).all()
