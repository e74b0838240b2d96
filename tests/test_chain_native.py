"""Native CDQ chaining vs brute-force DP on random anchor sets."""

import numpy as np
import pytest

from centrolign_tpu.native import chain_dp_seq


def brute(s1, e1, s2, e2, w, init_w, fin_w, use_gap, go, ge, scale, min_score):
    n = len(s1)
    dp = np.full(n, -np.inf)
    order = np.argsort(s1, kind="stable")
    for j in order:
        best = init_w[j]
        for i in range(n):
            if e1[i] < s1[j] and e2[i] < s2[j] and dp[i] > -np.inf:
                gap = abs((s1[j] - s2[j]) - (e1[i] - e2[i]))
                cost = 0.0
                if use_gap and gap != 0:
                    cost = max(-scale * (g + x * gap) for g, x in zip(go, ge))
                elif not use_gap:
                    cost = 0.0
                best = max(best, dp[i] + cost)
        dp[j] = best + w[j]
    best_score = min_score
    for i in range(n):
        if fin_w[i] > -np.inf and dp[i] + fin_w[i] > best_score:
            best_score = dp[i] + fin_w[i]
    return best_score


@pytest.mark.parametrize("use_gap", [False, True])
@pytest.mark.parametrize("trial", range(8))
def test_native_chain_matches_brute(use_gap, trial):
    rng = np.random.default_rng(trial * 7 + use_gap)
    n = int(rng.integers(5, 120))
    L1, L2 = 400, 380
    s1 = rng.integers(0, L1 - 10, n)
    lens = rng.integers(1, 8, n)
    e1 = s1 + lens
    s2 = rng.integers(0, L2 - 10, n)
    e2 = s2 + lens
    w = rng.random(n) * 10
    init_w = -rng.random(n)
    fin_w = -rng.random(n)
    go = np.array([1.25, 50.0, 5000.0])
    ge = np.array([2.5, 0.1, 0.0015])
    scale = 0.3
    min_score = 0.0
    best, backptr, dp = chain_dp_seq(
        s1, e1, s2, e2, w, init_w, fin_w, use_gap, go, ge, scale, min_score)
    want = brute(s1, e1, s2, e2, w, init_w, fin_w, use_gap, go, ge, scale, min_score)
    if best == -1:
        got = min_score
    else:
        got = dp[best] + fin_w[best]
    assert got == pytest.approx(want, rel=1e-9), f"n={n}"
    # chain validity
    v = best
    prev = None
    while v != -1:
        if prev is not None:
            assert e1[v] < s1[prev] and e2[v] < s2[prev]
        prev = v
        v = int(backptr[v])


def test_sparse_parity_multipath_graph2():
    """Regression: the sparse parity engine must handle multi-path graph2
    (XMergeView V was once passed as -1, corrupting index_on lookups)."""
    import numpy as np
    from centrolign_tpu.modify_graph import make_base_graph, add_sentinels
    from centrolign_tpu.match_finder import find_matches
    from centrolign_tpu.path_merge import PathMerge
    from centrolign_tpu.alignment import fuse
    from centrolign_tpu.anchorer import Anchorer
    from centrolign_tpu.score_function import ScoreFunction
    from conftest import random_low_entropy_sequence, mutate_sequence

    rng = np.random.default_rng(41)
    base = random_low_entropy_sequence(rng, 3000, period=171)
    s1, s2, s3 = (mutate_sequence(rng, base, 0.02, 0.01) for _ in range(3))
    g1 = make_base_graph("a", s1)
    g2 = make_base_graph("b", s2)
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    sf = ScoreFunction()
    anch = Anchorer(score_function=sf)
    m12 = find_matches(g1, g2, t1, t2, 3000, sf)
    pm1, pm2 = PathMerge(g1, t1), PathMerge(g2, t2)
    from centrolign_tpu.partitioner import Partitioner
    from centrolign_tpu.stitcher import Stitcher
    chain = anch.anchor_chain(m12, g1, g2, t1, t2, pm1, pm2)
    segs = Partitioner(score_function=sf).partition_anchors(
        chain, g1, g2, t1, t2, pm1, pm2, False)
    st = Stitcher()
    segs = [st.despecify_indel_breakpoints(s) for s in segs]
    aln = st.stitch(segs, g1, g2, t1, t2, pm1, pm2)
    fuse(g1, g2, t1, t2, aln)
    # now g1 is a 2-path DAG; chain a third sequence against it
    g3 = make_base_graph("c", s3)
    t3 = add_sentinels(g3, 5, 6)
    from centrolign_tpu.modify_graph import reassign_sentinels
    reassign_sentinels(g1, t1, 7, 8)
    m3 = find_matches(g3, g1, t3, t1, 3000, sf)
    pm3, pm1b = PathMerge(g3, t3), PathMerge(g1, t1)
    chain3 = anch.anchor_chain(m3, g3, g1, t3, t1, pm3, pm1b)
    assert len(chain3) > 0  # was 0 with the V=-1 bug
