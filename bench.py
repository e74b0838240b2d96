"""End-to-end benchmark: pairwise MSA of a simulated centromere pair
(benchdata/pair.fasta, ~190kb + ~180kb) through the full pipeline —
match finding -> sparse affine chaining (native, one call per subproblem)
-> partition -> stitch (TPU Gotoh kernels when the chip link is healthy,
native C++ otherwise) -> CIGAR.

Each timed rep runs in a SUBPROCESS with a hard timeout: the shared chip
tunnel can die mid-run, and a jax call on a dead link blocks forever — a
hung rep is killed and the remaining reps fall back to the native path,
so the bench always produces a number (tagged with the path that ran).

Prints ONE JSON line with:
  value / vs_baseline : wall-clock seconds and speedup over the reference
                        C++ centrolign measured on the same input
                        (benchdata/baseline.json)
  path                : "device" or "native" — which engine actually ran
                        (the device is skipped when the link probe fails)
  dp_cells_per_sec    : DP cell updates/sec through the stitch aligners
  aligners            : per-aligner counters (tag -> count/cells/seconds)
"""

import json
import os
import re
import subprocess
import sys
import time

REP_TIMEOUT_S = 900


def _run_reps(n):
    """Child mode: run the pipeline `n` times IN ONE PROCESS (so rep 0
    warms the kernel compiles for the rest) and stream one JSON line per
    completed rep — the parent parses whatever completed even if a later
    rep hangs and the process is killed."""
    import io

    from centrolign_tpu.cli import main as cli_main
    from centrolign_tpu import metrics

    here = os.path.dirname(os.path.abspath(__file__))
    for _rep in range(n):
        metrics.reset()
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            t0 = time.perf_counter()
            rc = cli_main(["-v", "0",
                           os.path.join(here, "benchdata", "pair.fasta")])
            rep_s = time.perf_counter() - t0
        finally:
            sys.stdout = stdout
        cigar = buf.getvalue().strip()
        matched = sum(int(x) for x, _ in re.findall(r"(\d+)([=])", cigar))
        print(json.dumps({"rc": rc, "elapsed": rep_s, "matched": matched,
                          "cigar_len": len(cigar),
                          "metrics": metrics.summary()}), flush=True)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    sys.path.insert(0, here)

    if len(sys.argv) > 1 and sys.argv[1] == "--reps":
        _run_reps(int(sys.argv[2]))
        return

    # persistent kernel-compile cache: amortizes XLA compiles across the
    # reps (separate processes), workers, and repeated driver runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    # kick the link probe off FIRST: cold link/runtime init has been
    # measured at ~56 s on this tunnel, and it overlaps fully with the
    # native build + baseline loading below
    from centrolign_tpu.device import (device_healthy, device_kind,
                                       start_probe_async)
    start_probe_async()

    with open(os.path.join(here, "benchdata", "baseline.json")) as f:
        baseline = json.load(f)
    ref_s = float(baseline["reference_wall_s"])

    # warm the native build outside the timed region
    import centrolign_tpu.native  # noqa: F401

    note = ""
    healthy = device_healthy()
    if not healthy:
        # LOUD fallback: the whole point of this bench is the device path
        note = ("DEVICE FALLBACK: link probe failed; these are CPU-only "
                "numbers")
        print(f"# {note}", file=sys.stderr)
        os.environ["CENTROLIGN_TPU_USE_DEVICE"] = "0"
    else:
        import jax
        jax.devices()
        # the probe passed once for this process; let workers (and the
        # stitcher) skip their own probes
        os.environ["CENTROLIGN_TPU_USE_DEVICE"] = "force"

    # multi-core hosts run the two calibration leaves concurrently through
    # the layer scheduler (byte-identical output; the reference is
    # single-threaded)
    if (os.cpu_count() or 1) >= 4 and "CENTROLIGN_TPU_HOSTS" not in os.environ:
        os.environ["CENTROLIGN_TPU_HOSTS"] = "2"

    # the link to the chip is a shared tunnel and the host CPU is shared:
    # wall varies ~15% between runs. One child process runs three reps
    # (rep 0 doubles as the in-process kernel-compile warmup); report the
    # min to damp the rest. The child streams a JSON line per completed
    # rep, so if the tunnel dies mid-run the parent kills the child on
    # timeout, keeps any completed device reps, and — if none completed —
    # reruns the three reps natively instead of hanging the bench.
    def reps_child(n):
        err = ""
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--reps",
                 str(n)],
                capture_output=True, text=True,
                timeout=n * REP_TIMEOUT_S, env=dict(os.environ))
            raw, err = out.stdout, out.stderr or ""
            # child finished but crashed after completing some reps: a
            # pipeline bug, not a link problem — do not bench the survivors
            assert out.returncode == 0 or not raw.strip(), (
                f"bench child crashed rc={out.returncode}\n{err[-2000:]}")
        except subprocess.TimeoutExpired as e:
            raw = e.stdout or ""
            err = e.stderr or ""
            if isinstance(raw, bytes):
                raw = raw.decode(errors="replace")
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
        reps = []
        for line in raw.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rep = json.loads(line)
            except json.JSONDecodeError:
                continue
            # a nonzero rc is a PIPELINE failure, never a link problem —
            # fail loudly instead of quietly benching the surviving reps
            assert rep.get("rc") == 0, (
                f"pipeline failed rc={rep.get('rc')}\n{err[-2000:]}")
            reps.append(rep)
        return reps, err

    reps, err = reps_child(3)
    if not reps and os.environ.get("CENTROLIGN_TPU_USE_DEVICE") != "0":
        # no rep even reported: the child hung or died mid-run — the
        # dead-tunnel signature (a pipeline bug raises rc!=0 above)
        note = ("DEVICE ABORT mid-bench; no device rep completed — "
                "rerunning natively")
        print(f"# {note}\n# child stderr tail:\n{err[-2000:]}",
              file=sys.stderr)
        healthy = False
        os.environ["CENTROLIGN_TPU_USE_DEVICE"] = "0"
        reps, err = reps_child(3)
    assert reps, f"no rep completed; child stderr tail:\n{err[-2000:]}"
    best = min(reps, key=lambda r: r["elapsed"])
    elapsed = best["elapsed"]
    assert best["cigar_len"] > 100, "implausibly short CIGAR"

    with open(os.path.join(here, "benchdata", "ref_pair.cigar.txt")) as f:
        ref_cigar = f.read().strip()
    # byte parity is tracked in tests/; sanity-gate the bench on a
    # same-ballpark alignment (match count within 1%)
    m_ref = sum(int(n) for n, _ in re.findall(r"(\d+)([=])", ref_cigar))
    m_ours = best["matched"]
    assert abs(m_ours - m_ref) <= 0.01 * m_ref, (
        f"alignment quality regression: {m_ours} vs {m_ref} matched bases")

    best_metrics = best["metrics"]
    vs = ref_s / elapsed
    if vs < 1.0:
        print(f"# WARNING: below reference baseline ({elapsed:.2f}s vs "
              f"{ref_s:.2f}s)", file=sys.stderr)
    out = {
        "metric": "pairwise_centromere_msa_wall_clock",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "path": "device" if healthy else "native",
        "device": device_kind() if healthy else "none",
        "dp_cells_per_sec": best_metrics.get("dp_cells_per_sec", 0),
        "device_cells": best_metrics.get("device_cells", 0),
        "device_contribution_s": best_metrics.get("device_contribution_s", 0),
        "aligners": {k: v for k, v in best_metrics.items()
                     if isinstance(v, dict)},
    }
    if note:
        out["note"] = note
    print(json.dumps(out))


if __name__ == "__main__":
    main()
