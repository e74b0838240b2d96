"""sim_centromere + compare_truth_aln tools: simulate from a small slice of
the bench ancestor, align the pair with the pipeline, score vs truth."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_align_ond_is_optimal():
    from centrolign_tpu.alignment import align_ond, GAP
    rng = np.random.default_rng(5)

    def edit_distance(s1, s2):
        n, m = len(s1), len(s2)
        D = np.arange(m + 1)
        for i in range(1, n + 1):
            prev = D.copy()
            D[0] = i
            for j in range(1, m + 1):
                D[j] = min(prev[j] + 1, D[j - 1] + 1,
                           prev[j - 1] + (s1[i - 1] != s2[j - 1]))
        return D[m]

    for _ in range(30):
        n, m = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        s1 = rng.integers(0, 4, n).tolist()
        s2 = rng.integers(0, 4, m).tolist()
        aln = align_ond(s1, s2)
        i = j = cost = 0
        for a, b in aln:
            if a != GAP:
                assert a == i
                i += 1
            if b != GAP:
                assert b == j
                j += 1
            cost += 1 if (a == GAP or b == GAP) else int(s1[a] != s2[b])
        assert (i, j) == (n, m)
        assert cost == edit_distance(s1, s2)


@pytest.mark.slow
def test_sim_and_score(tmp_path):
    # small ancestor: first 30 monomer intervals of the bench annotation
    bed_lines = []
    with open(os.path.join(REPO, "benchdata", "anc.bed")) as f:
        for line in f:
            bed_lines.append(line)
            if len(bed_lines) == 30:
                break
    end = int(bed_lines[-1].split()[2])
    from centrolign_tpu.io.fasta import parse_fasta
    with open(os.path.join(REPO, "benchdata", "anc.fasta")) as f:
        name, seq = parse_fasta(f)[0]
    fa = tmp_path / "anc.fa"
    with open(fa, "w") as f:
        f.write(f">{name}\n{seq[:end]}\n")
    bed = tmp_path / "anc.bed"
    with open(bed, "w") as f:
        f.writelines(bed_lines)

    env = dict(os.environ, CENTROLIGN_TPU_USE_DEVICE="0")
    prefix = tmp_path / "sim"
    r = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.tools.sim_centromere",
         "-o", str(prefix), "-g", "40", "-z", "7", str(fa), str(bed)],
        capture_output=True, text=True, timeout=400, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-600:]
    for suffix in ("_seq1.fasta", "_seq2.fasta", "_seq1_identity.txt",
                   "_seq2_identity.txt", "_seq1_seq2_cigar.txt",
                   "_info.txt"):
        assert os.path.exists(str(prefix) + suffix), suffix

    pair = tmp_path / "pair.fa"
    with open(pair, "w") as out:
        for leaf in ("seq1", "seq2"):
            with open(f"{prefix}_{leaf}.fasta") as f:
                out.write(f.read())
    r = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.cli", "-v", "0", str(pair)],
        capture_output=True, text=True, timeout=400, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-600:]
    aln_cigar = tmp_path / "aln.txt"
    aln_cigar.write_text(r.stdout)

    r = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.tools.compare_truth_aln",
         f"{prefix}_seq1_identity.txt", f"{prefix}_seq2_identity.txt",
         f"{prefix}_seq1_seq2_cigar.txt", str(aln_cigar)],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-600:]
    stats = dict(line.split(": ") for line in r.stdout.strip().splitlines())
    assert float(stats["aln match completeness"]) > 0.9
    assert float(stats["aln match accuracy"]) > 0.9
