"""On-chip validation of multi-group packed Gotoh launches.

Opt-in (CENTROLIGN_TPU_DEVICE_TESTS=1 on a host with a live accelerator):
gotoh_dispatch with multi-group launches enabled must produce per-job
alignments and scores bit-identical to both the one-group-per-launch path
and the lax.scan oracle (ops.gotoh.gotoh_align). This is the suite-run
form of the round-5 enablement measurement (153 ms multi vs 376 ms per-8
on the same 80-job bag; see STATUS.md item 6).
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("CENTROLIGN_TPU_DEVICE_TESTS") != "1",
        reason="needs a live accelerator (set CENTROLIGN_TPU_DEVICE_TESTS=1)"),
]


def test_packmulti_matches_pack8_and_oracle(monkeypatch):
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no accelerator backend")
    from centrolign_tpu.ops.align_params import AlignmentParams
    from centrolign_tpu.ops.gotoh import gotoh_align
    from centrolign_tpu.ops import gotoh_pallas as gp

    rng = np.random.default_rng(3)
    params = AlignmentParams()

    def mkjob(L1, L2):
        s1 = rng.integers(0, 4, L1).astype(np.int32)
        s2 = s1[:min(L1, L2)].copy()
        if L2 > len(s2):
            s2 = np.concatenate(
                [s2, rng.integers(0, 4, L2 - len(s2)).astype(np.int32)])
        idx = rng.integers(0, L2, max(1, L2 // 20))
        s2[idx] = (s2[idx] + 1) % 4
        return (s1, s2, False, params)

    jobs = ([mkjob(int(rng.integers(90, 127)), int(rng.integers(90, 127)))
             for _ in range(40)] +
            [mkjob(int(rng.integers(140, 250)), int(rng.integers(140, 250)))
             for _ in range(12)])
    buckets = {}
    for j in jobs:
        buckets.setdefault(gp._job_bucket(j), []).append(j)

    def run(mode):
        monkeypatch.setenv("CENTROLIGN_TPU_PACKMULTI", mode)
        out = []
        handles = [gp.gotoh_dispatch(b, v) for b, v in buckets.items()]
        for h in handles:
            out.extend(gp.gotoh_fetch(h))
        return out

    multi = run("1")
    per8 = run("0")
    flat = [j for v in buckets.values() for j in v]
    for (s1, s2, swp, p), (aln_m, sc_m), (aln_8, sc_8) in zip(
            flat, multi, per8):
        aln_o, sc_o = gotoh_align(s1, s2, p, swap_pref=swp)
        assert sc_m == sc_o and np.array_equal(aln_m, aln_o), \
            "multi-group launch diverged from the lax.scan oracle"
        assert sc_8 == sc_o and np.array_equal(aln_8, aln_o), \
            "pack8 launch diverged from the lax.scan oracle"
