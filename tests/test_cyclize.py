"""Cyclization (-c) bond detection vs the reference (config 4 of
BASELINE.json). The bond identification, deduplication, trimming, and
internal stitching are validated byte-for-byte against reference bond CIGAR
dumps; the post-cyclization polish is a known round-1 gap."""

import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/tmp/refbuild/centrolign"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference binary unavailable")


def test_bond_cigars_match_reference(tmp_path):
    rng = np.random.default_rng(99)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 171))
    base = (unit * 80)[:13000]

    def mut(s, sub=0.01):
        return "".join("ACGT"[rng.integers(0, 4)] if rng.random() < sub
                       else ch for ch in s)

    seqs = []
    for i in range(2):
        s = mut(base)
        cut = int(rng.integers(4000, 8000))
        dup = s[cut:cut + 3000]
        s = s[:cut + 3000] + mut(dup, 0.005) + s[cut + 3000:]
        seqs.append(s)
    fa = tmp_path / "cyc.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">c{i}\n{s}\n")
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "our"
    ref_dir.mkdir()
    our_dir.mkdir()
    r1 = subprocess.run(
        [REF, "-v", "0", "-c", "-y", "2000", "--bond-prefix",
         str(ref_dir / "b"), "--force-gfa-output", str(fa)],
        capture_output=True, text=True, timeout=400)
    assert r1.returncode == 0
    r2 = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.cli", "-v", "0", "-c", "-y",
         "2000", "--bond-prefix", str(our_dir / "b"), "--force-gfa-output",
         str(fa)],
        capture_output=True, text=True, timeout=400)
    assert r2.returncode == 0, r2.stderr[-500:]
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(our_dir))
    assert len(ref_files) > 0
    for f in ref_files:
        assert (ref_dir / f).read_text() == (our_dir / f).read_text(), f
