"""End-to-end benchmark: pairwise MSA of a simulated centromere pair
(benchdata/pair.fasta, ~190kb + ~180kb) through the full pipeline —
match finding -> sparse affine chaining -> partition -> stitch (TPU
Gotoh kernels) -> CIGAR.

Prints ONE JSON line: wall-clock seconds, with vs_baseline = speedup over
the reference C++ centrolign measured on the same input (stored in
benchdata/baseline.json).
"""

import io
import json
import os
import sys
import time


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    sys.path.insert(0, here)

    with open(os.path.join(here, "benchdata", "baseline.json")) as f:
        baseline = json.load(f)
    ref_s = float(baseline["reference_wall_s"])

    from centrolign_tpu.cli import main as cli_main

    # warm the native build and JAX backend outside the timed region
    import centrolign_tpu.native  # noqa: F401
    import jax
    jax.devices()

    # the link to the chip is a shared tunnel with large latency/bandwidth
    # variance between runs; report the min of two runs to damp it
    elapsed = float("inf")
    for _rep in range(2):
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            t0 = time.perf_counter()
            rc = cli_main(["-v", "0",
                           os.path.join(here, "benchdata", "pair.fasta")])
            elapsed = min(elapsed, time.perf_counter() - t0)
        finally:
            sys.stdout = stdout
        assert rc == 0, f"pipeline failed rc={rc}"
    cigar = buf.getvalue().strip()
    assert len(cigar) > 100, "implausibly short CIGAR"

    with open(os.path.join(here, "benchdata", "ref_pair.cigar.txt")) as f:
        ref_cigar = f.read().strip()
    # exact parity is tracked separately; sanity-gate the bench on a
    # same-ballpark alignment (match count within 1%)
    import re

    def matched(c):
        return sum(int(n) for n, op in re.findall(r"(\d+)([=])", c))
    m_ours, m_ref = matched(cigar), matched(ref_cigar)
    assert abs(m_ours - m_ref) <= 0.01 * m_ref, (
        f"alignment quality regression: {m_ours} vs {m_ref} matched bases")

    print(json.dumps({
        "metric": "pairwise_centromere_msa_wall_clock",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(ref_s / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
