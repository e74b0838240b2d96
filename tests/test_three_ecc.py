"""Three-edge-connected components vs the reference library (round-2 cactus
groundwork)."""

import os
import subprocess

import numpy as np
import pytest

from centrolign_tpu.native import three_edge_connected_components
from centrolign_tpu.graph import BaseGraph

DRIVER = "/tmp/ref_tecc"
REF_LIB = "/tmp/refbuild/libcentrolign.so"


def _ensure_driver():
    if os.path.exists(DRIVER):
        return True
    if not os.path.exists(REF_LIB):
        return False
    src = os.path.join(os.path.dirname(__file__), "ref_driver",
                       "tecc_driver.cpp")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-I/root/reference/include", src,
         "-o", DRIVER, "-L/tmp/refbuild", "-lcentrolign",
         "-Wl,-rpath,/tmp/refbuild"], capture_output=True)
    return r.returncode == 0


pytestmark = pytest.mark.skipif(not _ensure_driver(),
                                reason="reference build unavailable")


@pytest.mark.parametrize("trial", range(12))
def test_three_ecc_matches_reference(trial):
    rng = np.random.default_rng(1500 + trial)
    V = int(rng.integers(3, 60))
    g = BaseGraph()
    for _ in range(V):
        g.add_node(0)
    edges = [(i, (i + 1) % V) for i in range(V)]
    for _ in range(int(rng.integers(0, 3 * V))):
        a, b = rng.integers(0, V, 2)
        edges.append((int(a), int(b)))
    for a, b in edges:
        g.add_edge(a, b)
    lines = [f"{V} {len(edges)}"] + [f"{a} {b}" for a, b in edges]
    r = subprocess.run([DRIVER], input="\n".join(lines),
                       capture_output=True, text=True, timeout=60)
    toks = r.stdout.split("\n")
    ncomp_ref = int(toks[0])
    ref_comps = [list(map(int, l.split())) for l in toks[1:1 + ncomp_ref]]
    comp, n = three_edge_connected_components(g)
    assert n == ncomp_ref
    for cid, members in enumerate(ref_comps):
        for v in members:
            assert comp[v] == cid
