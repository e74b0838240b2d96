"""Snarl decomposition (cactus tree) + simplify_bubbles vs the reference
library (tests/ref_driver/snarl_driver.cpp).

Reference parity targets: snarls.hpp / cactus.hpp / three_edge_connected_
components.hpp (SnarlTree over cyclic graphs) and src/modify_graph.cpp:165-381
(simplify_bubbles).
"""

import os
import subprocess

import numpy as np
import pytest

from centrolign_tpu.snarls import Snarls
from centrolign_tpu.modify_graph import (add_sentinels, make_base_graph,
                                         simplify_bubbles)
from centrolign_tpu.alignment import internal_fuse

from util import random_dag

DRIVER = "/tmp/ref_snarl_driver"
REF_LIB = "/tmp/refbuild/libcentrolign.so"


def _ensure_driver():
    if os.path.exists(DRIVER):
        return True
    if not os.path.exists(REF_LIB):
        return False
    src = os.path.join(os.path.dirname(__file__), "ref_driver",
                       "snarl_driver.cpp")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-I/root/reference/include", src,
         "-o", DRIVER, "-L/tmp/refbuild", "-lcentrolign",
         "-Wl,-rpath,/tmp/refbuild"], capture_output=True)
    return r.returncode == 0


have_ref = pytest.mark.skipif(not _ensure_driver(),
                              reason="reference build unavailable")


def _compare(g, tab):
    ef, et = g.edges()
    lines = [f"{g.node_size} {len(ef)}",
             " ".join(str(int(c)) for c in g.labels)]
    lines += [f"{a} {b}" for a, b in zip(ef, et)]
    lines.append(f"{tab.src_id} {tab.snk_id}")
    r = subprocess.run([DRIVER], input="\n".join(lines),
                       capture_output=True, text=True, timeout=120)
    toks = r.stdout.splitlines()
    S, C = map(int, toks[0].split())
    tree = Snarls(g, tab)
    assert (tree.structure_size, tree.chain_size) == (S, C)
    for s in range(S):
        a, b, c, ac, nac = map(int, toks[1 + s].split())
        assert tree.structure_boundaries(s) == (a, b)
        assert tree.chain_containing(s) == c
        assert int(tree.snarl_is_acyclic(s)) == ac
        assert int(tree.net_graph_is_acyclic(s)) == nac
    for c in range(C):
        parts = toks[1 + S + c].replace(":", "").split()
        assert tree.structure_containing(c) == int(parts[2])
        assert tree.structures_inside(c) == [int(x) for x in parts[3:]]
    for s in range(S):
        parts = toks[1 + S + C + s].replace(":", "").split()
        assert tree.chains_inside(s) == [int(x) for x in parts[2:]]


def _cyclized(rng, n=400):
    """A graph with a merged tandem repeat (cycle) via internal_fuse."""
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    g = make_base_graph("s", seq)
    tab = add_sentinels(g, 5, 6)
    a0 = int(rng.integers(10, n // 4))
    b0 = a0 + int(rng.integers(50, n // 3))
    L = int(rng.integers(20, 40))
    p = g.path(0)
    aln = np.stack([p[a0:a0 + L], p[b0:b0 + L]], axis=1)
    return internal_fuse(g, [aln], tab)[:2]


@have_ref
@pytest.mark.parametrize("trial", range(6))
def test_snarls_match_reference_acyclic(trial):
    rng = np.random.default_rng(1700 + trial)
    g = random_dag(rng, int(rng.integers(5, 150)))
    tab = add_sentinels(g, 5, 6)
    _compare(g, tab)


@have_ref
@pytest.mark.parametrize("trial", range(4))
def test_snarls_match_reference_cyclic(trial):
    rng = np.random.default_rng(1800 + trial)
    g, tab = _cyclized(rng)
    _compare(g, tab)


def test_simplify_bubbles_merges_identical_alleles():
    # two paths through a bubble with identical allele sequences collapse
    g = make_base_graph("a", "ACGTA")
    # duplicate the middle G as a parallel identical allele used by path b
    gid = g.add_node(int(g.labels[2]))  # same encoded label as the 'G' node
    g.add_edge(1, gid)
    g.add_edge(gid, 3)
    pb = g.add_path("b")
    for v in [0, 1, gid, 3, 4]:
        g.extend_path(pb, v)
    tab = add_sentinels(g, 5, 6)
    simplified = simplify_bubbles(g, tab)
    # the duplicate node is purged and both paths use the same allele
    assert simplified.node_size == g.node_size - 1
    pa = simplified.path(0)
    pb_ = simplified.path(1)
    assert pa.tolist() == pb_.tolist()


def test_simplify_bubbles_keeps_distinct_alleles():
    g = make_base_graph("a", "ACGTA")
    tid = g.add_node(int(g.labels[3]))  # 'T' label: distinct allele from 'G'
    g.add_edge(1, tid)
    g.add_edge(tid, 3)
    pb = g.add_path("b")
    for v in [0, 1, tid, 3, 4]:
        g.extend_path(pb, v)
    tab = add_sentinels(g, 5, 6)
    before = g.node_size
    simplified = simplify_bubbles(g, tab)
    assert simplified.node_size == before
