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


def _make_tandem_fasta(path, n_seqs=3, unit=220, copies=2, seed=29):
    rng = np.random.default_rng(seed)
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, unit))
    with open(path, "w") as f:
        for i in range(n_seqs):
            s = "".join(
                "".join("ACGT"[rng.integers(0, 4)]
                        if rng.random() < 0.02 else ch for ch in base)
                for _ in range(copies))
            f.write(f">t{i}\n{s}\n")


def _serial_run(fa, workdir, tag, cyclize=False, restart=False):
    """Serial leg in a subprocess (fresh jax state), full side outputs."""
    args = [sys.executable, "-m", "centrolign_tpu.cli", "-v", "0",
            "-S", os.path.join(str(workdir), f"{tag}_chk"),
            "-s", os.path.join(str(workdir), f"{tag}_sub")]
    if cyclize:
        args += ["-c", "-y", "180"]
    if restart:
        args += ["-R"]
    args.append(str(fa))
    env = dict(os.environ, CENTROLIGN_TPU_USE_DEVICE="0")
    r = subprocess.run(args, capture_output=True, text=True, timeout=900,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-1200:]
    return r.stdout


def _collect(workdir, tag):
    """Side-output files keyed by suffix; the checkpoint prefix embedded in
    chk_info.txt is normalized so runs with different prefixes compare."""
    out = {}
    prefix = os.path.join(workdir, tag).encode()
    for name in sorted(os.listdir(workdir)):
        if name.startswith(tag):
            with open(os.path.join(workdir, name), "rb") as f:
                out[name[len(tag):]] = f.read().replace(prefix, b"@PREFIX@")
    return out


@pytest.mark.slow
def test_multiprocess_cyclize_checkpoint_subaln(tmp_path, monkeypatch):
    """The jax.distributed executor must reproduce the serial run's final
    GFA AND its side-output files byte-for-byte under -c/-S/-s, and resume
    from a partial -S state (-R) to the identical final graph."""
    from centrolign_tpu.params import Parameters
    from centrolign_tpu.parallel.multiprocess import run_multiprocess_msa

    fa = tmp_path / "tandem.fa"
    _make_tandem_fasta(fa)

    serial_gfa = _serial_run(fa, tmp_path, "ser", cyclize=True)
    serial_files = _collect(str(tmp_path), "ser_")

    params = Parameters()
    params.set("cyclize_tandem_duplications", True)
    params.set("min_cyclizing_length", 180)
    params.set("subproblems_prefix", str(tmp_path / "mp_chk"))
    params.set("subalignments_filepath", str(tmp_path / "mp_sub"))
    mp_out = tmp_path / "mp.gfa"
    if "CENTROLIGN_TPU_USE_DEVICE" not in os.environ:
        monkeypatch.setenv("CENTROLIGN_TPU_USE_DEVICE", "0")
    run_multiprocess_msa(2, str(fa), None, str(mp_out), params=params)

    assert mp_out.read_text() == serial_gfa, \
        "multiprocess cyclized GFA differs from serial"
    mp_files = _collect(str(tmp_path), "mp_")
    assert set(mp_files) == set(serial_files), \
        (sorted(mp_files), sorted(serial_files))
    for k in serial_files:
        assert mp_files[k] == serial_files[k], f"side output {k} differs"

    # restart: drop the root checkpoint and resume distributed
    chks = [n for n in sorted(os.listdir(tmp_path))
            if n.startswith("mp_chk") and n.endswith(".gfa")]
    assert chks, "no checkpoints were written"
    biggest = max(chks, key=lambda n: os.path.getsize(tmp_path / n))
    os.unlink(tmp_path / biggest)
    params.set("restart", True)
    mp_out2 = tmp_path / "mp2.gfa"
    run_multiprocess_msa(2, str(fa), None, str(mp_out2), params=params)
    assert mp_out2.read_text() == serial_gfa, \
        "multiprocess restart GFA differs from the uninterrupted run"
