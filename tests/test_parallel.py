"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 'mesh-simulation fixture')."""

import jax
import numpy as np
import pytest

from centrolign_tpu.ops.align_params import AlignmentParams
from centrolign_tpu.ops.gotoh import gotoh_align
from centrolign_tpu.parallel import make_alignment_mesh, sharded_gotoh_scores
from centrolign_tpu.utils.encoding import encode_seq

from conftest import random_sequence, mutate_sequence


def _cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8
    return devs


@pytest.mark.parametrize("gap_axis", [1, 2, 4])
def test_sharded_gotoh_matches_single_chip(rng, gap_axis):
    mesh = make_alignment_mesh(8, gap_axis=gap_axis, devices=_cpu_devices())
    params = AlignmentParams()
    B = 2 * gap_axis
    seqs1, seqs2, expect = [], [], []
    for k in range(B):
        s1 = random_sequence(rng, int(rng.integers(40, 300)))
        s2 = mutate_sequence(rng, s1, sub_rate=0.1, indel_rate=0.05)
        e1, e2 = encode_seq(s1), encode_seq(s2)
        seqs1.append(e1)
        seqs2.append(e2)
        _, sc = gotoh_align(e1, e2, params)
        expect.append(sc)
    got = sharded_gotoh_scores(seqs1, seqs2, params, mesh)
    assert got.tolist() == expect


def test_sharded_gotoh_empty_and_tiny(rng):
    mesh = make_alignment_mesh(8, gap_axis=2, devices=_cpu_devices())
    params = AlignmentParams()
    seqs1 = [encode_seq("ACGT"), encode_seq("A")]
    seqs2 = [encode_seq("ACGT"), encode_seq("TTTTT")]
    expect = [gotoh_align(a, b, params)[1] for a, b in zip(seqs1, seqs2)]
    got = sharded_gotoh_scores(seqs1, seqs2, params, mesh)
    assert got.tolist() == expect
