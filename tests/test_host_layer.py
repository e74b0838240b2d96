"""Tests for the host layer: encoding, FASTA, graph model, graph algorithms,
tree, GFA round-trip."""

import io

import numpy as np
import pytest

from centrolign_tpu.utils.encoding import encode_seq, decode_seq, encode_base
from centrolign_tpu.io.fasta import parse_fasta
from centrolign_tpu.io.gfa import write_gfa_str, read_gfa
from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.graph_algs import (
    topological_order, topological_levels, is_reachable, minmax_distance,
)
from centrolign_tpu.modify_graph import (
    make_base_graph, add_sentinels, purge_uncovered_nodes, SentinelTableau,
)
from centrolign_tpu.tree import Tree, in_order_newick_string
from centrolign_tpu.alignment import cigar, explicit_cigar, GAP


def test_encoding_roundtrip():
    s = "ACGTNacgtn"
    codes = encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_seq(codes[:5]) == "ACGTN"
    assert encode_base("X") == 5


def test_parse_fasta():
    fa = ">seq1 description\nACGT\nACGT\nAC\n>seq2\nTTTT\n"
    recs = parse_fasta(io.StringIO(fa))
    assert recs == [("seq1", "ACGTACGTAC"), ("seq2", "TTTT")]
    with pytest.raises(ValueError):
        parse_fasta(io.StringIO("ACGT\n"))
    with pytest.raises(ValueError):
        parse_fasta(io.StringIO(">s\nAC\nACGT\n"))


def test_graph_basic():
    g = BaseGraph()
    a = g.add_node(0)
    b = g.add_node(1)
    c = g.add_node(2)
    g.add_edge(a, b)
    g.add_edge(a, c)
    g.add_edge(b, c)
    assert g.node_size == 3
    assert list(g.next(a)) == [b, c]  # insertion order preserved
    assert list(g.previous(c)) == [a, b]
    g.remove_edge(a, c)
    assert list(g.next(a)) == [b]
    assert list(g.previous(c)) == [b]
    pid = g.add_path("p")
    g.extend_path_array(pid, [a, b, c])
    assert list(g.path(pid)) == [a, b, c]
    assert g.path_id("p") == pid


def test_make_base_graph_and_sentinels():
    g = make_base_graph("s1", "ACGT")
    assert g.node_size == 4
    assert decode_seq(g.labels) == "ACGT"
    t = add_sentinels(g, 5, 6)
    assert g.node_size == 6
    assert g.label(t.src_id) == 5 and g.label(t.snk_id) == 6
    assert list(g.next(t.src_id)) == [0]
    assert list(g.previous(t.snk_id)) == [3]
    order = topological_order(g)
    pos = np.empty(len(order), dtype=np.int64)
    pos[order] = np.arange(len(order))
    ef, et = g.edges()
    assert (pos[ef] < pos[et]).all()


def test_topological_levels():
    g = BaseGraph()
    ids = g.add_nodes([0, 1, 2, 3])
    g.add_edges([0, 0, 1, 2], [1, 2, 3, 3])
    lv = topological_levels(g)
    assert list(lv) == [0, 1, 1, 2]
    assert is_reachable(g, 0, 3)
    assert not is_reachable(g, 3, 0)
    mind, maxd = minmax_distance(g)
    assert list(mind) == [0, 1, 1, 2]
    assert list(maxd) == [0, 1, 1, 2]


def test_tree_parse_and_orders():
    t = Tree('((("a":1,"b":2)ab:1,"c":3):1,"d":4);')
    assert t.node_size == 7
    assert t.has_label("a") and t.has_label("ab")
    a = t.get_id("a")
    assert t.is_leaf(a)
    assert t.distance(a) == 1.0
    post = t.postorder()
    # children visited in reverse order: d's subtree first
    assert post[0] == t.get_id("d")
    pre = t.preorder()
    assert pre[0] == t.get_root()
    # small-first postorder puts leaves (count 1) before internals
    sfp = t.small_first_postorder()
    leaf_count = sum(1 for n in range(t.node_size) if t.is_leaf(n))
    assert all(t.is_leaf(n) for n in sfp[:leaf_count])


def test_tree_binarize():
    t = Tree('("a","b","c","d")root;')
    t.binarize()
    for n in range(t.node_size):
        assert len(t.get_children(n)) in (0, 2)
    # labels of stand-ins get #suffixes
    assert t.has_label("root#0")
    # leaves survive
    for lab in "abcd":
        assert t.has_label(lab)


def test_tree_prune_compact():
    t = Tree('((("a":1,"b":2):1,"c":3):1,"d":4);')
    keep = [t.get_id("a"), t.get_id("b")]
    t.prune(keep)
    labels = {t.label(n) for n in range(t.node_size) if t.label(n)}
    assert labels == {"a", "b"}
    t.compact()
    assert t.node_size == 3


def test_in_order_newick():
    s = in_order_newick_string(["x", "y", "z"])
    assert s == '(("x","y"),"z");'
    t = Tree(s)
    assert t.node_size == 5


def test_gfa_roundtrip():
    g = make_base_graph("s1", "ACGTACGT")
    # add a bubble: node 2 alternative with label T
    alt = g.add_node(3)
    g.add_edge(1, alt)
    g.add_edge(alt, 3)
    p2 = g.add_path("s2")
    g.extend_path_array(p2, [0, 1, alt, 3, 4, 5, 6, 7])
    t = add_sentinels(g, 5, 6)
    text = write_gfa_str(g, t)
    assert text.startswith("H\tVN:Z:1.0\n")
    g2 = read_gfa(io.StringIO(text))
    # same path sequences round-trip
    for pid in range(g.path_size):
        name = g.path_name(pid)
        p_old = g.path(pid)
        p_new = g2.path(g2.path_id(name))
        assert decode_seq(g.labels[p_old]) == decode_seq(g2.labels[p_new])
    # compaction: the shared prefix ACG + A-or-T bubble + TACGT suffix
    s_lines = [l for l in text.splitlines() if l.startswith("S")]
    assert len(s_lines) == 4


def test_cigar():
    aln = np.array([[0, 0], [1, 1], [2, GAP], [3, GAP], [GAP, 2], [4, 3]])
    assert cigar(aln) == "2M2D1I1M"
    lab1 = encode_seq("ACGTT")
    lab2 = encode_seq("ACAG")
    assert explicit_cigar(aln, lab1, lab2) == "2=2D1I1X"


def test_purge_uncovered():
    g = make_base_graph("s1", "ACGT")
    extra = g.add_node(2)
    g.add_edge(1, extra)
    t = add_sentinels(g, 5, 6)
    g2 = purge_uncovered_nodes(g, t)
    assert g2.node_size == 6
    assert g2.label(t.src_id) == 5


def test_native_extract_connecting_graph_parity():
    """Native DFS extraction == Python oracle on random graphs."""
    import numpy as np
    from centrolign_tpu.extractor import (
        extract_connecting_graph, extract_connecting_graph_py)
    from centrolign_tpu.path_merge import PathMerge
    from centrolign_tpu.modify_graph import add_sentinels
    from util import random_dag

    for trial in range(10):
        rng = np.random.default_rng(300 + trial)
        g = random_dag(rng, int(rng.integers(10, 120)))
        # path cover so PathMerge has chains
        from centrolign_tpu.graph_algs import topological_order
        covered = np.zeros(g.node_size, dtype=bool)
        order = topological_order(g)
        pid_n = 0
        for v in order:
            if covered[v]:
                continue
            pid = g.add_path(f"xcov{pid_n}"); pid_n += 1
            cur = int(v)
            g.extend_path(pid, cur)
            covered[cur] = True
            while True:
                nxt = g.next(cur)
                if len(nxt) == 0:
                    break
                cur = int(nxt[0])
                g.extend_path(pid, cur)
                covered[cur] = True
        tab = add_sentinels(g, 5, 6)
        xm = PathMerge(g, tab)
        ids = rng.permutation(g.node_size)[:6]
        for a in ids:
            for b in ids:
                if a == b:
                    continue
                nat = extract_connecting_graph(g, int(a), int(b), xm)
                py = extract_connecting_graph_py(g, int(a), int(b), xm)
                assert np.array_equal(nat.subgraph.labels, py.subgraph.labels)
                assert np.array_equal(np.asarray(nat.back_translation),
                                      np.asarray(py.back_translation))
                ne, pe = nat.subgraph.edges(), py.subgraph.edges()
                assert np.array_equal(ne[0], pe[0]) and np.array_equal(ne[1], pe[1])
                assert list(nat.sources) == list(py.sources)
                assert list(nat.sinks) == list(py.sinks)


def test_generate_config_matches_reference():
    """-G output is byte-identical to the reference binary's (config format,
    help text, and default values; reference src/parameters.cpp:335-359)."""
    import os
    import subprocess
    import sys
    ref = "/tmp/refbuild/centrolign"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference binary unavailable")
    ours = subprocess.run(
        [sys.executable, "-m", "centrolign_tpu.cli", "-G", "-c", "-v", "1"],
        capture_output=True, text=True, cwd="/root/repo").stdout
    theirs = subprocess.run([ref, "-G", "-c", "-v", "1"],
                            capture_output=True, text=True).stdout
    assert ours == theirs


def test_config_round_trip():
    from centrolign_tpu.params import Parameters
    p = Parameters()
    p.set("max_count", 123)
    p.set("anchor_gap_open", (1.5, 2.5, 3.5))
    p.set("fasta_name", "x.fa")
    q = Parameters(p.generate_config())
    assert q.get("max_count") == 123
    assert q.get("anchor_gap_open") == (1.5, 2.5, 3.5)
    assert q.get("fasta_name") == "x.fa"
    assert p == q
