"""The skewed-diagonal Gotoh kernel must reproduce the po_poa oracle exactly
(values AND traceback tie-breaking) on chain graphs."""

import numpy as np
import pytest

from centrolign_tpu.ops.align_params import AlignmentParams
from centrolign_tpu.ops.gotoh import gotoh_align
from centrolign_tpu.ops.popoa_ref import popoa

from util import random_chain, graph_sources, graph_sinks

PARAMS = [
    AlignmentParams(20, 80, (60, 800, 2500), (30, 5, 1)),
    AlignmentParams(1, 1, (2,), (1,)),
    AlignmentParams(5, 9, (6, 20), (3, 1)),
]


@pytest.mark.parametrize("params", PARAMS)
@pytest.mark.parametrize("trial", range(6))
def test_gotoh_matches_oracle(params, trial):
    rng = np.random.default_rng(trial * 31 + len(params.gap_open))
    g1 = random_chain(rng, int(rng.integers(1, 90)))
    g2 = random_chain(rng, int(rng.integers(1, 90)))
    aln_o, score_o = popoa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params)
    aln_k, score_k = gotoh_align(g1.labels, g2.labels, params)
    assert score_k == score_o
    assert np.array_equal(aln_k, aln_o), (
        f"trial {trial}: kernel traceback diverges from oracle\n"
        f"kernel:\n{aln_k[:20]}\noracle:\n{aln_o[:20]}")


def test_gotoh_low_entropy():
    rng = np.random.default_rng(5)
    params = AlignmentParams()
    unit = rng.integers(0, 4, size=15)
    s1 = np.tile(unit, 12)[: 170]
    s2 = np.tile(unit, 12)[3: 150].copy()
    s2[::17] = (s2[::17] + 1) % 4
    from centrolign_tpu.graph import BaseGraph

    def chain(seq):
        g = BaseGraph()
        ids = g.add_nodes(seq)
        if len(ids) > 1:
            g.add_edges(ids[:-1], ids[1:])
        pid = g.add_path("p")
        g.extend_path_array(pid, ids)
        return g

    g1, g2 = chain(s1), chain(s2)
    aln_o, score_o = popoa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params)
    aln_k, score_k = gotoh_align(s1, s2, params)
    assert score_k == score_o
    assert np.array_equal(aln_k, aln_o)
