"""CDQ backpointer tie resolution vs the tree engine on tie-dense inputs.

The CDQ affine chaining engine (native/chain_affine_cdq.cpp) is default-on
for unmasked chain x chain subproblems; when a traceback step's range max is
attained by several predecessors, chain_ties.AffineTieResolver must pick the
SAME predecessor the reference's search trees would (MaxSearchTree /
OrthogonalMaxSearchTree visit order, reference max_search_tree.hpp:361-445,
orthogonal_max_search_tree.hpp:343-545; reference test pattern
src/test/test_anchoring.cpp:432-457). These tests build anchor sets where
every anchor has byte-identical duplicates — so every traceback step is a
guaranteed f32 tie — and require the CDQ chain to equal the tree-engine
chain exactly. A perturbed resolver (any OTHER tied-but-valid predecessor)
must produce a different chain, proving the comparison has teeth.
"""

import numpy as np
import pytest

from centrolign_tpu.anchorer import Anchorer, ChainAlgorithm
from centrolign_tpu.match_finder import MatchSet
from centrolign_tpu.modify_graph import make_base_graph, add_sentinels
from centrolign_tpu.path_merge import PathMerge
from centrolign_tpu.score_function import ScoreFunction
from centrolign_tpu import chain_ties


def _setup_graphs(rng, n1, n2):
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, n1))
    seq2 = "".join("ACGT"[i] for i in rng.integers(0, 4, n2))
    g1 = make_base_graph("a", seq1)
    g2 = make_base_graph("b", seq2)
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    xm1 = PathMerge(g1, t1)
    xm2 = PathMerge(g2, t2)
    return g1, g2, t1, t2, xm1, xm2


def _tie_dense_matches(rng, seq_len, n_pos, dup, L=16, grid=24):
    """Anchor sets with equal weights, grid-quantized near-diagonal
    positions, and `dup` byte-identical copies of every anchor: every
    range-max query over them is a massive f32 tie (identical dp values on
    identical keys). Same-shift steps exercise the gap-free channel
    (struct 0); the +-4 shifts exercise the ortho channels (the small gap
    costs ~11 < anchor weight ~16, so shifted steps stay profitable)."""
    matches = []
    # margin for the overlap twin (+L//2) and the +4 shift
    hi = (seq_len - 2 * L - grid - 8) // grid

    def emit(p1, p2, k):
        w1 = np.arange(p1, p1 + L, dtype=np.int64)[None, :]
        w2 = np.arange(p2, p2 + L, dtype=np.int64)[None, :]
        for _ in range(k):
            matches.append(MatchSet(walks1=w1.copy(), walks2=w2.copy(),
                                    count1=1, count2=1, full_length=L))

    for _ in range(n_pos):
        p1 = int(rng.integers(1, hi + 1)) * grid
        p2 = p1 + int(rng.choice([-4, 0, 0, 0, 4]))
        emit(p1, p2, dup)
        if rng.random() < 0.5:
            # overlapping same-shift twin: mutually unreachable with the
            # original (they overlap in both graphs), same shift, equal dp
            # — an output-VISIBLE tie: resolving to the wrong one changes
            # the emitted walks, unlike the byte-identical duplicates
            emit(p1 + L // 2, p2 + L // 2, 1)
    return matches


def _anchorer():
    return Anchorer(score_function=ScoreFunction(),
                    chaining_algorithm=ChainAlgorithm.SparseAffine,
                    autocalibrate_gap_penalties=False,
                    split_matches_at_branchpoints=False,
                    do_fill_in_anchoring=False)


def _run_chain(monkeypatch, matches, graphs, cdq):
    g1, g2, t1, t2, xm1, xm2 = graphs
    monkeypatch.setenv("CENTROLIGN_TPU_CHAIN_CDQ", "1" if cdq else "0")
    ms = [MatchSet(walks1=m.walks1.copy(), walks2=m.walks2.copy(),
                   count1=m.count1, count2=m.count2,
                   full_length=m.full_length) for m in matches]
    chain = _anchorer().anchor_chain(ms, g1, g2, t1, t2, xm1, xm2)
    return [(tuple(a.walk1.tolist()), tuple(a.walk2.tolist()),
             a.score, a.gap_before, a.gap_after,
             a.gap_score_before, a.gap_score_after) for a in chain]


def _count_resolves(monkeypatch):
    """Instrument AffineTieResolver.resolve with a call counter."""
    calls = {"n": 0}
    orig = chain_ties.AffineTieResolver.resolve

    def counted(self, anchor, struct, stored):
        calls["n"] += 1
        return orig(self, anchor, struct, stored)

    monkeypatch.setattr(chain_ties.AffineTieResolver, "resolve", counted)
    return calls


@pytest.mark.parametrize("trial", range(12))
def test_cdq_ties_match_tree_engine(monkeypatch, trial):
    rng = np.random.default_rng(9100 + trial)
    graphs = _setup_graphs(rng, 260, 260)
    matches = _tie_dense_matches(rng, 256, n_pos=24, dup=3)

    calls = _count_resolves(monkeypatch)
    got = _run_chain(monkeypatch, matches, graphs, cdq=True)
    want = _run_chain(monkeypatch, matches, graphs, cdq=False)
    assert len(want) >= 2, "fixture must produce a multi-anchor chain"
    assert got == want
    assert calls["n"] > 0, (
        "fixture failed to exercise the tie resolver — every traceback "
        "step over duplicated anchors should be a tie")


@pytest.mark.slow
@pytest.mark.parametrize("block", range(8))
def test_cdq_ties_match_tree_engine_deep(monkeypatch, block):
    """Wider adversarial sweep: varied duplication factors, grid pitches,
    and anchor counts (hundreds of trials across the blocks)."""
    for t in range(60):
        rng = np.random.default_rng(77000 + 1000 * block + t)
        graphs = _setup_graphs(rng, 300, 300)
        dup = int(rng.integers(2, 5))
        grid = int(rng.choice([4, 8, 16]))
        n_pos = int(rng.integers(8, 40))
        matches = _tie_dense_matches(rng, 296, n_pos=n_pos, dup=dup,
                                     grid=grid)
        got = _run_chain(monkeypatch, matches, graphs, cdq=True)
        want = _run_chain(monkeypatch, matches, graphs, cdq=False)
        assert got == want, f"block={block} t={t} dup={dup} grid={grid}"


def test_perturbed_resolver_changes_the_chain(monkeypatch):
    """Teeth check: replace the resolver's answer with any OTHER tied-but-
    valid predecessor; at least one trial must then diverge from the tree
    engine (otherwise the equality assertions above test nothing)."""
    orig = chain_ties.AffineTieResolver.resolve

    def perturbed(self, anchor, struct, stored):
        true = orig(self, anchor, struct, stored)
        if true is None:
            return None
        j = int(anchor)
        vmax = np.float32(stored)
        if struct == 0:
            shift = self.ps1[j] - self.ps2[j]
            ok = ((self.pe1 - self.pe2 == shift)
                  & (self.pe1 < self.ps1[j]) & (self.pe2 < self.ps2[j])
                  & (self.dp == vmax))
        else:
            pw = int(struct) - 1
            sv = self._stored_vals(pw)
            side = (self.shift < self.ps1[j] - self.ps2[j]) if pw % 2 == 1 \
                else (self.shift > self.ps1[j] - self.ps2[j])
            ok = (side & (self.pe1 < self.ps1[j])
                  & (self.pe2 < self.ps2[j]) & (sv == vmax))
        alts = np.flatnonzero(ok)
        alts = alts[alts != true]
        return int(alts[0]) if len(alts) else true

    diverged = 0
    for trial in range(12):
        rng = np.random.default_rng(9100 + trial)
        graphs = _setup_graphs(rng, 260, 260)
        matches = _tie_dense_matches(rng, 256, n_pos=24, dup=3)
        monkeypatch.setattr(chain_ties.AffineTieResolver, "resolve",
                            perturbed)
        got = _run_chain(monkeypatch, matches, graphs, cdq=True)
        monkeypatch.setattr(chain_ties.AffineTieResolver, "resolve", orig)
        want = _run_chain(monkeypatch, matches, graphs, cdq=False)
        if got != want:
            diverged += 1
    assert diverged > 0, (
        "perturbing the tie resolver never changed any chain — the "
        "tie-dense fixtures are not actually sensitive to resolution order")


def test_unresolved_tie_falls_back_to_tree_engine(monkeypatch):
    """resolve() -> None on a tied traceback step must abandon the CDQ
    result and return the tree engine's chain (anchorer fallback path)."""
    rng = np.random.default_rng(424242)
    graphs = _setup_graphs(rng, 260, 260)
    matches = _tie_dense_matches(rng, 256, n_pos=24, dup=3)

    calls = {"n": 0}

    def refuse(self, anchor, struct, stored):
        calls["n"] += 1
        return None

    monkeypatch.setattr(chain_ties.AffineTieResolver, "resolve", refuse)
    got = _run_chain(monkeypatch, matches, graphs, cdq=True)
    monkeypatch.undo()
    monkeypatch.setenv("CENTROLIGN_TPU_CHAIN_CDQ", "0")
    want = _run_chain(monkeypatch, matches, graphs, cdq=False)
    assert calls["n"] > 0, "fixture produced no tie to refuse"
    assert got == want


def test_validate_harness_smoke(monkeypatch, capfd):
    """CENTROLIGN_TPU_CHAIN_CDQ_VALIDATE=1 runs the tree engine alongside,
    reports the diff on stderr, and returns the canonical (tree) result."""
    rng = np.random.default_rng(5150)
    graphs = _setup_graphs(rng, 260, 260)
    matches = _tie_dense_matches(rng, 256, n_pos=24, dup=3)

    monkeypatch.setenv("CENTROLIGN_TPU_CHAIN_CDQ_VALIDATE", "1")
    got = _run_chain(monkeypatch, matches, graphs, cdq=True)
    err = capfd.readouterr().err
    assert "[cdq-validate]" in err
    assert "dp mismatches=0" in err
    monkeypatch.delenv("CENTROLIGN_TPU_CHAIN_CDQ_VALIDATE")
    want = _run_chain(monkeypatch, matches, graphs, cdq=False)
    assert got == want
