"""Superbubble decomposition vs the reference library (tests/ref_driver)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from centrolign_tpu.native import SuperbubbleTree
from centrolign_tpu.modify_graph import add_sentinels

from util import random_dag

DRIVER = "/tmp/ref_bubble_driver"
REF_LIB = "/tmp/refbuild/libcentrolign.so"


def _ensure_driver():
    if os.path.exists(DRIVER):
        return True
    if not os.path.exists(REF_LIB):
        return False
    src = os.path.join(os.path.dirname(__file__), "ref_driver",
                       "bubble_driver.cpp")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-I/root/reference/include", src,
         "-o", DRIVER, "-L/tmp/refbuild", "-lcentrolign",
         "-Wl,-rpath,/tmp/refbuild"], capture_output=True)
    return r.returncode == 0


pytestmark = pytest.mark.skipif(not _ensure_driver(),
                                reason="reference build unavailable")


@pytest.mark.parametrize("trial", range(8))
def test_superbubbles_match_reference(trial):
    rng = np.random.default_rng(900 + trial)
    g = random_dag(rng, int(rng.integers(5, 200)))
    tab = add_sentinels(g, 5, 6)
    ef, et = g.edges()
    lines = [f"{g.node_size} {len(ef)}",
             " ".join(str(int(c)) for c in g.labels)]
    lines += [f"{a} {b}" for a, b in zip(ef, et)]
    lines.append(f"{tab.src_id} {tab.snk_id}")
    r = subprocess.run([DRIVER], input="\n".join(lines),
                       capture_output=True, text=True, timeout=120)
    toks = r.stdout.split()
    S, C = int(toks[0]), int(toks[1])
    tree = SuperbubbleTree(g, tab)
    assert tree.structure_size == S and tree.chain_count == C
    pos = 2
    for s in range(S):
        vals = [int(toks[pos + k]) for k in range(5)]
        pos += 5
        assert tree.structure_boundaries(s) == (vals[0], vals[1])
        assert tree.structure_min_max_dist(s) == (vals[2], vals[3])
        assert tree.chain_of[s] == vals[4]
    for c in range(C):
        mn, mx, par = (int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2]))
        pos += 3
        assert tree.chain_min_max_dist(c) == (mn, mx)
        expect = -1 if par == 2**64 - 1 else par
        assert tree.chain_parent[c] == expect
