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
