import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (the driver separately dry-runs the multi-chip path).
# The CPU backend is forced PRIMARY even when the ambient environment selects
# an accelerator platform (e.g. JAX_PLATFORMS=axon): a dead/slow chip tunnel
# would otherwise block every jax call in the suite for minutes. Set
# CENTROLIGN_TPU_TEST_DEVICE=1 to keep the ambient platform first instead.
_plat = os.environ.get("JAX_PLATFORMS", "")
if os.environ.get("CENTROLIGN_TPU_TEST_DEVICE") == "1" and _plat:
    if "cpu" not in _plat.split(","):
        os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The interpreter's sitecustomize may import jax BEFORE this file runs, in
# which case jax has already captured the ambient JAX_PLATFORMS (e.g. the
# chip tunnel) and the os.environ writes above are silently ignored for
# this process. Push the choice through jax.config so it sticks; the env
# vars above still cover the cli/worker subprocesses the suite spawns.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import subprocess

import numpy as np
import pytest


def _ensure_refbuild() -> None:
    """Build the reference binary + library into /tmp/refbuild so the
    byte-parity half of the suite runs on a fresh machine instead of
    silently skipping. Set CENTROLIGN_TPU_NO_REFBUILD=1 to opt out."""
    if os.path.exists("/tmp/refbuild/centrolign"):
        return
    if (not os.path.isdir("/root/reference")
            or os.environ.get("CENTROLIGN_TPU_NO_REFBUILD")):
        return
    os.makedirs("/tmp/refbuild", exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "/root/reference", "-DCMAKE_BUILD_TYPE=Release",
             "-DSCRIPTS=ON", "-G", "Ninja"],
            cwd="/tmp/refbuild", check=True, capture_output=True,
            timeout=300)
        subprocess.run(["ninja"], cwd="/tmp/refbuild", check=True,
                       capture_output=True, timeout=1200)
    except (subprocess.SubprocessError, OSError) as e:
        print(f"reference bootstrap failed ({e}); parity tests will skip")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long end-to-end runs; quick tier = pytest -m 'not slow'")
    _ensure_refbuild()


@pytest.fixture
def rng():
    return np.random.default_rng(2471)


def random_sequence(rng, length: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=length))


def random_low_entropy_sequence(rng, length: int, period: int = 10,
                                mutation_rate: float = 0.05) -> str:
    unit = random_sequence(rng, period)
    seq = (unit * (length // period + 1))[:length]
    out = list(seq)
    for i in range(length):
        if rng.random() < mutation_rate:
            out[i] = "ACGT"[rng.integers(0, 4)]
    return "".join(out)


def mutate_sequence(rng, seq: str, sub_rate=0.05, indel_rate=0.02) -> str:
    out = []
    for ch in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append("ACGT"[rng.integers(0, 4)])  # insertion
        if rng.random() < sub_rate:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
    if not out:
        out = ["A"]
    return "".join(out)


@pytest.fixture
def seq_factory(rng):
    return lambda n: random_sequence(rng, n)
