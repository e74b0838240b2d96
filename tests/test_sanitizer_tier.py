"""Sanitizer tier: run the pipeline with the native runtime compiled under
ASan+UBSan (the reference's -DDEV=ON builds all 27 test binaries with
-fsanitize=address,undefined, reference CMakeLists.txt:19-25; here the
equivalent is CENTROLIGN_TPU_NATIVE_SANITIZE=1, which swaps in a sanitized
_native_san.so).

An instrumented shared object can only be dlopen'd into a process that
already has the sanitizer runtimes loaded, so the pipeline runs in a
subprocess with LD_PRELOAD=libasan.so:libubsan.so. Any out-of-bounds
access, use-after-free, or UB in the C++ engines aborts the run
(-fno-sanitize-recover=all) and fails the CIGAR-equality assertion.
"""

import os
import subprocess
import sys

import pytest

from conftest import mutate_sequence, random_low_entropy_sequence

pytestmark = pytest.mark.slow

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from centrolign_tpu.cli import main
rc = main(["-v", "0", {fasta!r}])
sys.exit(rc)
"""


def _runtime(name: str) -> str:
    out = subprocess.run(["g++", f"-print-file-name={name}"],
                         capture_output=True, text=True, check=True)
    path = out.stdout.strip()
    if path == name or not os.path.exists(path):
        pytest.skip(f"{name} not available in this toolchain")
    return path


def test_pipeline_under_asan_ubsan(rng, tmp_path):
    libasan = _runtime("libasan.so")
    libubsan = _runtime("libubsan.so")

    base = random_low_entropy_sequence(rng, 4000, period=171,
                                       mutation_rate=0.05)
    other = mutate_sequence(rng, base, sub_rate=0.05, indel_rate=0.02)
    fasta = tmp_path / "pair.fasta"
    fasta.write_text(f">a\n{base}\n>b\n{other}\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, fasta=str(fasta))

    def run(sanitize: bool):
        env = dict(os.environ)
        env["CENTROLIGN_TPU_USE_DEVICE"] = "0"
        env["JAX_PLATFORMS"] = "cpu"
        if sanitize:
            env["CENTROLIGN_TPU_NATIVE_SANITIZE"] = "1"
            env["LD_PRELOAD"] = f"{libasan}:{libubsan}"
            # CPython itself leaks (interned objects, arenas); the tier is
            # for memory errors and UB in the native engines, not leaks
            env["ASAN_OPTIONS"] = "detect_leaks=0"
        else:
            env.pop("CENTROLIGN_TPU_NATIVE_SANITIZE", None)
        out = subprocess.run([sys.executable, "-c", script],
                             capture_output=True, text=True, env=env,
                             timeout=900)
        return out

    plain = run(sanitize=False)
    assert plain.returncode == 0, plain.stderr[-2000:]

    san = run(sanitize=True)
    assert "AddressSanitizer" not in san.stderr, san.stderr[-4000:]
    assert "runtime error:" not in san.stderr, san.stderr[-4000:]
    assert san.returncode == 0, san.stderr[-2000:]
    assert san.stdout == plain.stdout, "sanitized run changed the CIGAR"
