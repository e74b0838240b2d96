import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (the driver separately dry-runs the multi-chip path).
_plat = os.environ.get("JAX_PLATFORMS", "")
if not _plat:
    os.environ["JAX_PLATFORMS"] = "cpu"
elif "cpu" not in _plat.split(","):
    # keep the configured platform primary, but make the 8-device virtual
    # CPU mesh available for the sharding tests
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


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
