"""Cross-validation of independent seq-seq aligners (the reference's
test_alignment.cpp strategy): the NW oracle, the PO-POA graph oracle, the
anti-diagonal Gotoh kernel, and the native WFA must all agree on the
optimal score, and every returned alignment must rescore to that optimum
(reference cross-checks align_nw vs wfa vs O(ND) the same way)."""

import numpy as np
import pytest

from centrolign_tpu.alignment import align_nw, score_alignment
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
@pytest.mark.parametrize("trial", range(5))
def test_align_nw_cross_validates(params, trial):
    rng = np.random.default_rng(trial * 17 + len(params.gap_open))
    g1 = random_chain(rng, int(rng.integers(1, 70)))
    g2 = random_chain(rng, int(rng.integers(1, 70)))
    s1, s2 = g1.labels, g2.labels

    aln_nw, score_nw = align_nw(s1, s2, params)
    aln_po, score_po = popoa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params)
    aln_k, score_k = gotoh_align(s1, s2, params)

    assert score_nw == score_po == score_k
    # every alignment attains the shared optimum under an independent scorer
    assert score_alignment(s1, s2, aln_nw, params) == score_nw
    assert score_alignment(s1, s2, aln_k, params) == score_nw


def test_align_nw_vs_native_wfa():
    from centrolign_tpu.native import wfa_po_poa

    params = AlignmentParams(20, 80, (60, 800, 2500), (30, 5, 1))
    rng = np.random.default_rng(99)
    base = rng.integers(0, 4, size=120)
    s2 = base.copy()
    s2[::13] = (s2[::13] + 2) % 4
    g1 = random_chain(rng, 1)
    g2 = random_chain(rng, 1)
    g1, g2 = _chain_of(base), _chain_of(s2)
    aln_nw, score_nw = align_nw(base, s2, params)
    aln_w, score_w = wfa_po_poa(
        g1, g2, graph_sources(g1), graph_sources(g2),
        graph_sinks(g1), graph_sinks(g2), params, prune_limit=0)
    assert score_alignment(base, s2, aln_w, params) == score_nw


def _chain_of(seq):
    from centrolign_tpu.graph import BaseGraph
    g = BaseGraph()
    ids = g.add_nodes(np.asarray(seq, dtype=np.uint8))
    if len(ids) > 1:
        g.add_edges(ids[:-1], ids[1:])
    pid = g.add_path("p0")
    g.extend_path_array(pid, ids)
    return g
