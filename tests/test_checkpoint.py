"""-S/-R checkpoint + restart round trip (reference src/execution.cpp:223-279,
config 3 of BASELINE.json)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def _write_quad(tmp_path):
    rng = np.random.default_rng(5150)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 171))
    base = (unit * 12)[:2000]

    def mut(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.005:
                continue
            if r < 0.01:
                out.append("ACGT"[rng.integers(0, 4)])
            out.append("ACGT"[rng.integers(0, 4)] if rng.random() < 0.02 else ch)
        return "".join(out)

    fa = tmp_path / "q.fa"
    with open(fa, "w") as f:
        for i in range(4):
            f.write(f">s{i}\n{mut(base)}\n")
    nwk = tmp_path / "q.nwk"
    nwk.write_text("((s0,s1),(s2,s3));\n")
    return str(fa), str(nwk)


def _run(args):
    r = subprocess.run([sys.executable, "-m", "centrolign_tpu.cli"] + args,
                       capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-800:]
    return r.stdout


@pytest.mark.slow
def test_checkpoint_restart_round_trip(tmp_path):
    fa, nwk = _write_quad(tmp_path)
    full = _run(["-v", "0", "-T", nwk, fa])
    prefix = str(tmp_path / "ck")
    _run(["-v", "0", "-T", nwk, "-S", prefix, fa])
    files = [f for f in os.listdir(tmp_path) if f.endswith(".gfa")]
    assert len(files) == 3
    # drop the root checkpoint, restart from the partial state
    info = open(str(tmp_path / "ck_info.txt")).read().splitlines()
    assert info[0] == "filename\tsequences"
    root_file = [l.split("\t")[0] for l in info[1:]
                 if len(l.split("\t")[1].split(",")) == 4]
    os.remove(root_file[0])
    restarted = _run(["-v", "0", "-T", nwk, "-S", prefix, "-R", fa])
    assert restarted == full
