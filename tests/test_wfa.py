"""WFA-family aligners vs the REFERENCE implementation, pair-for-pair.

A tiny driver (tests/ref_driver/wfa_driver.cpp) links against the reference
shared library and prints its aligners' output; these tests are skipped when
the reference build is unavailable.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from centrolign_tpu.ops.align_params import AlignmentParams
from centrolign_tpu.native import wfa_po_poa, deletion_wfa_po_poa
from centrolign_tpu.modify_graph import make_base_graph

from util import random_dag, graph_sources, graph_sinks
from conftest import random_sequence

DRIVER = "/tmp/ref_wfa_driver"
REF_LIB = "/tmp/refbuild/libcentrolign.so"


def _ensure_driver():
    if os.path.exists(DRIVER):
        return True
    if not os.path.exists(REF_LIB) or not os.path.isdir("/root/reference"):
        return False
    src = os.path.join(os.path.dirname(__file__), "ref_driver",
                       "wfa_driver.cpp")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-I/root/reference/include", src,
         "-o", DRIVER, "-L/tmp/refbuild", "-lcentrolign",
         "-Wl,-rpath,/tmp/refbuild"], capture_output=True)
    return r.returncode == 0


pytestmark = pytest.mark.skipif(not _ensure_driver(),
                                reason="reference build unavailable")

PARAMS = AlignmentParams()


def run_ref(g1, g2, s1, k1, s2, k2, mode, prune=0):
    lines = []
    for g in (g1, g2):
        ef, et = g.edges()
        lines.append(f"{g.node_size} {len(ef)}")
        lines.append(" ".join(str(int(c)) for c in g.labels))
        for a, b in zip(ef, et):
            lines.append(f"{a} {b}")
    for ids in (s1, k1, s2, k2):
        lines.append(str(len(ids)) + " " + " ".join(str(int(x)) for x in ids))
    lines.append(f"{mode} {prune}")
    r = subprocess.run([DRIVER], input="\n".join(lines),
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[:500]
    toks = r.stdout.split()
    score = int(toks[0])
    n = int(toks[1])
    return np.array(toks[2:2 + 2 * n], dtype=np.int64).reshape(n, 2), score


@pytest.mark.parametrize("trial", range(10))
@pytest.mark.parametrize("mode,prune", [(0, 0), (1, 50)])
def test_wfa_pwfa_parity(trial, mode, prune):
    rng = np.random.default_rng(trial)
    g1 = random_dag(rng, int(rng.integers(4, 80)))
    g2 = random_dag(rng, int(rng.integers(4, 80)))
    s1, k1 = graph_sources(g1), graph_sinks(g1)
    s2, k2 = graph_sources(g2), graph_sinks(g2)
    ref_aln, ref_sc = run_ref(g1, g2, s1, k1, s2, k2, mode, prune)
    ours_aln, ours_sc = wfa_po_poa(
        g1, g2, s1, s2, k1, k2, PARAMS,
        prune_limit=None if mode == 0 else prune)
    assert ours_sc == ref_sc
    assert np.array_equal(ours_aln, ref_aln)


@pytest.mark.parametrize("trial", range(6))
def test_deletion_wfa_parity(trial):
    rng = np.random.default_rng(500 + trial)
    short_len = int(rng.integers(5, 60))
    mid_len = int(rng.integers(100, 600))
    pre = random_sequence(rng, short_len // 2 + 1)
    suf = random_sequence(rng, short_len - len(pre) + 1)
    mid = random_sequence(rng, mid_len)
    gs = make_base_graph("s", pre + suf)
    gl = make_base_graph("l", pre + mid + suf)
    s1, k1 = graph_sources(gs), graph_sinks(gs)
    s2, k2 = graph_sources(gl), graph_sinks(gl)
    ref_aln, ref_sc = run_ref(gs, gl, s1, k1, s2, k2, 2)
    ours_aln, ours_sc = deletion_wfa_po_poa(gs, gl, s1, s2, k1, k2, PARAMS)
    assert ours_sc == ref_sc
    assert np.array_equal(ours_aln, ref_aln)


@pytest.mark.parametrize("trial", range(4))
def test_deletion_wfa_parity_dag(trial):
    rng = np.random.default_rng(900 + trial)
    gs = random_dag(rng, int(rng.integers(3, 25)))
    gl = random_dag(rng, int(rng.integers(150, 400)))
    s1, k1 = graph_sources(gs), graph_sinks(gs)
    s2, k2 = graph_sources(gl), graph_sinks(gl)
    ref_aln, ref_sc = run_ref(gs, gl, s1, k1, s2, k2, 2)
    ours_aln, ours_sc = deletion_wfa_po_poa(gs, gl, s1, s2, k1, k2, PARAMS)
    assert ours_sc == ref_sc
    assert np.array_equal(ours_aln, ref_aln)
