"""The device DAG x DAG PO-POA must reproduce the host oracle exactly —
alignment arrays and scores — across random DAGs, chains, multi-source /
multi-sink shapes, and all piecewise-affine parameter sets."""

import numpy as np
import pytest

from centrolign_tpu.ops.align_params import AlignmentParams
from centrolign_tpu.ops.popoa_ref import popoa
from centrolign_tpu.ops.popoa_dag import popoa_dag_device, DagTables

from util import random_dag, random_chain, graph_sources, graph_sinks

PARAMS = [
    AlignmentParams(20, 80, (60, 800, 2500), (30, 5, 1)),
    AlignmentParams(1, 1, (1,), (1,)),
    AlignmentParams(2, 3, (4, 1), (2, 5)),
]


def _check(g1, g2, s1, s2, k1, k2, params):
    import jax
    # pin to the virtual CPU devices: correctness here must not depend on
    # the (sometimes degraded) chip tunnel
    with jax.default_device(jax.devices("cpu")[0]):
        got = popoa_dag_device(g1, g2, s1, s2, k1, k2, params)
    if got is None:
        return False
    aln_d, score_d = got
    aln_h, score_h = popoa(g1, g2, s1, s2, k1, k2, params)
    assert score_d == score_h, (score_d, score_h)
    assert np.array_equal(aln_d, aln_h), (aln_d, aln_h)
    return True


@pytest.mark.parametrize("params", PARAMS)
def test_random_dags(params):
    rng = np.random.default_rng(7000 + params.num_pw)
    ran = 0
    for trial in range(12):
        g1 = random_dag(rng, int(rng.integers(4, 30)))
        g2 = random_dag(rng, int(rng.integers(4, 30)))
        s1, s2 = graph_sources(g1), graph_sources(g2)
        k1, k2 = graph_sinks(g1), graph_sinks(g2)
        if _check(g1, g2, s1, s2, k1, k2, params):
            ran += 1
    assert ran >= 4, f"only {ran} eligible draws"


@pytest.mark.parametrize("trial", range(3))
def test_chains(trial):
    rng = np.random.default_rng(81 + trial)
    params = PARAMS[0]
    g1 = random_chain(rng, int(rng.integers(5, 80)))
    g2 = random_chain(rng, int(rng.integers(5, 80)))
    assert _check(g1, g2, graph_sources(g1), graph_sources(g2),
                  graph_sinks(g1), graph_sinks(g2), params)


def test_subset_sources_sinks():
    # sources/sinks that are strict subsets of the graph's degree-0 nodes,
    # like stitcher extractions produce
    rng = np.random.default_rng(4242)
    params = PARAMS[0]
    ran = 0
    for trial in range(10):
        g1 = random_dag(rng, int(rng.integers(6, 25)))
        g2 = random_dag(rng, int(rng.integers(6, 25)))
        s1, s2 = graph_sources(g1), graph_sources(g2)
        k1, k2 = graph_sinks(g1), graph_sinks(g2)
        s1 = s1[: max(1, len(s1) - 1)]
        k2 = k2[: max(1, len(k2) - 1)]
        if _check(g1, g2, s1, s2, k1, k2, params):
            ran += 1
    assert ran >= 3


def test_identical_graphs_tie_heavy():
    # identical low-entropy graphs maximize score ties — the tie-rule
    # encoding must still match the oracle exactly
    rng = np.random.default_rng(99)
    params = PARAMS[0]
    for trial in range(4):
        g = random_dag(rng, 20)
        # low-entropy labels
        lab = rng.integers(0, 2, g.node_size)
        for v in range(g.node_size):
            g.relabel(v, int(lab[v]))
        s, k = graph_sources(g), graph_sinks(g)
        assert _check(g, g, s, s, k, k, params)


def test_eligibility_gate():
    # a graph with a long-span edge must be rejected, not misaligned
    from centrolign_tpu.graph import BaseGraph
    g = BaseGraph()
    g.add_nodes(np.zeros(24, dtype=np.uint8))
    for v in range(23):
        g.add_edge(v, v + 1)
    g.add_edge(0, 23)  # span 23 > S_MAX in any topo order of this graph
    t = DagTables(g, [0])
    assert not t.eligible
