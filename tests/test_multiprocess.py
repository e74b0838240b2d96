"""The jax.distributed multi-process MSA (one jax process per host, GFA
payloads exchanged through collectives) must reproduce the serial run's
final GFA byte-for-byte."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fasta(path, n_seqs, length=1800, seed=19):
    rng = np.random.default_rng(seed)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, length))

    def mut(s):
        return "".join("ACGT"[rng.integers(0, 4)] if rng.random() < 0.02
                       else c for c in s)
    with open(path, "w") as f:
        for i in range(n_seqs):
            f.write(f">s{i}\n{mut(base)}\n")


@pytest.mark.slow
def test_multiprocess_matches_serial(tmp_path):
    fa = tmp_path / "in.fa"
    _make_fasta(fa, 3)
    env = dict(os.environ, CENTROLIGN_TPU_USE_DEVICE="0")
    mp_out = tmp_path / "mp.gfa"
    r = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.parallel.multiprocess",
         "2", str(fa), "", str(mp_out)],
        capture_output=True, text=True, timeout=500, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-800:]
    s = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.cli", "-v", "0", str(fa)],
        capture_output=True, text=True, timeout=500, cwd=REPO, env=env)
    assert s.returncode == 0, s.stderr[-800:]
    assert mp_out.read_text() == s.stdout, \
        "multiprocess GFA differs from serial"
