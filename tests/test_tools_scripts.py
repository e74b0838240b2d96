"""Byte-parity of the utility scripts vs the reference's script binaries
(reference src/scripts/: tree_pair_dist, tree_compare, remove_samples,
find_universal_bridges, make_var_mat)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.environ.get("CENTROLIGN_TPU_REFBUILD", "/tmp/refbuild")
SCRIPTS = ["tree_pair_dist", "tree_compare", "remove_samples",
           "find_universal_bridges", "make_var_mat"]


@pytest.fixture(scope="module")
def ref_bins():
    missing = [s for s in SCRIPTS
               if not os.path.exists(os.path.join(REFBUILD, s))]
    if missing:
        try:
            subprocess.run(["cmake", "/root/reference",
                            "-DCMAKE_BUILD_TYPE=Release", "-DSCRIPTS=ON"],
                           cwd=REFBUILD, check=True, capture_output=True,
                           timeout=300)
            subprocess.run(["make", "-j1", *missing], cwd=REFBUILD,
                           check=True, capture_output=True, timeout=1200)
        except Exception as e:
            pytest.skip(f"cannot build reference script binaries: {e}")
    return REFBUILD


def _ours(module, args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", f"centrolign_tpu.tools.{module}", *args],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env)


def _ref(ref_bins, binary, args, cwd):
    return subprocess.run(
        [os.path.join(ref_bins, binary), *args],
        capture_output=True, text=True, timeout=600, cwd=cwd)


@pytest.fixture(scope="module")
def msa_gfa(ref_bins, tmp_path_factory):
    """A 3-sequence graph with an internal universal bridge, from the
    reference binary itself."""
    d = tmp_path_factory.mktemp("scripts")
    rng = np.random.default_rng(77)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    fa = d / "in.fa"
    with open(fa, "w") as f:
        for i in range(3):
            pre = "".join("ACGT"[c]
                          for c in rng.integers(0, 4, 150 + 40 * i))
            suf = "".join("ACGT"[c]
                          for c in rng.integers(0, 4, 170 + 30 * i))
            f.write(f">b{i}\n{pre}{core}{suf}\n")
    gfa = d / "g.gfa"
    r = subprocess.run([os.path.join(ref_bins, "centrolign"), "-v", "0",
                        str(fa)], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    gfa.write_text(r.stdout)
    return d, gfa


def test_tree_pair_dist(ref_bins, tmp_path):
    nwk = os.path.join(REPO, "benchdata", "fifty.nwk")
    ours = _ours("tree_pair_dist", [nwk], tmp_path)
    ref = _ref(ref_bins, "tree_pair_dist", [nwk], tmp_path)
    assert ours.returncode == ref.returncode == 0
    assert ours.stdout == ref.stdout


def test_tree_compare(ref_bins, tmp_path):
    from centrolign_tpu.tree import Tree, in_order_newick_string
    nwk = os.path.join(REPO, "benchdata", "fifty.nwk")
    t = Tree(open(nwk).read())
    leaves = sorted(t.label(v) for v in range(t.node_size)
                    if t.is_leaf(v))
    alt = tmp_path / "alt.nwk"
    alt.write_text(in_order_newick_string(leaves))
    for pair in ([nwk, str(alt)], [nwk, nwk]):
        ours = _ours("tree_compare", pair, tmp_path)
        ref = _ref(ref_bins, "tree_compare", pair, tmp_path)
        assert ours.returncode == ref.returncode == 0
        assert ours.stdout == ref.stdout
    # unary internal nodes: the reference only materializes label sets at
    # degree>2 nodes, silently losing unary subtrees from ancestors'
    # bipartitions — parity means replicating that
    unary = tmp_path / "unary.nwk"
    unary.write_text('("A":1,("B":1)u:1,"C":1,"D":1);\n')
    flat = tmp_path / "flat.nwk"
    flat.write_text('("A":1,"B":1,"C":1,"D":1);\n')
    ours = _ours("tree_compare", [str(unary), str(flat)], tmp_path)
    ref = _ref(ref_bins, "tree_compare", [str(unary), str(flat)],
               tmp_path)
    assert ours.returncode == ref.returncode == 0
    assert ours.stdout == ref.stdout


def test_remove_samples(ref_bins, msa_gfa, tmp_path):
    d, gfa = msa_gfa
    nwk = tmp_path / "t.nwk"
    nwk.write_text('(("b0":1,"b1":1):1,"b2":2);\n')
    a = _ref(ref_bins, "remove_samples",
             ["-p", "refout", "-s", "b1", "-t", str(nwk), "-T",
              "ref_t.nwk", "-f", "reffa", str(gfa)], tmp_path)
    b = _ours("remove_samples",
              ["-p", "ourout", "-s", "b1", "-t", str(nwk), "-T",
               "our_t.nwk", "-f", "ourfa", str(gfa)], tmp_path)
    assert a.returncode == 0 and b.returncode == 0, (a.stderr, b.stderr)
    refs = sorted(p for p in os.listdir(tmp_path)
                  if p.startswith("refout_"))
    assert refs
    for name in refs:
        ours_name = "ourout_" + name[len("refout_"):]
        assert (tmp_path / ours_name).read_bytes() == \
            (tmp_path / name).read_bytes()
    assert (tmp_path / "our_t.nwk").read_text() == \
        (tmp_path / "ref_t.nwk").read_text()
    assert (tmp_path / "ourfa_b1.fasta").read_text() == \
        (tmp_path / "reffa_b1.fasta").read_text()


def test_find_universal_bridges(ref_bins, msa_gfa, tmp_path):
    _d, gfa = msa_gfa
    for flags in ([], ["-r"]):
        ours = _ours("find_universal_bridges", [*flags, str(gfa)],
                     tmp_path)
        ref = _ref(ref_bins, "find_universal_bridges", [*flags, str(gfa)],
                   tmp_path)
        assert ours.returncode == ref.returncode == 0
        assert ours.stdout == ref.stdout
        assert "node:" in ref.stdout, "fixture lost its bridge"


@pytest.mark.parametrize("opts", [[], ["-b"], ["-b", "-i", "-m"],
                                  ["-n", "-c", "-p", "-b", "-i"],
                                  ["-i", "-m", "-s", "-b", "-a", "-f"]])
def test_make_var_mat(ref_bins, msa_gfa, tmp_path, opts):
    _d, gfa = msa_gfa
    ours = _ours("make_var_mat",
                 [*opts, "-C", str(tmp_path / "our_ci.txt"), str(gfa)],
                 tmp_path)
    ref = _ref(ref_bins, "make_var_mat",
               [*opts, "-C", str(tmp_path / "ref_ci.txt"), str(gfa)],
               tmp_path)
    assert ours.returncode == ref.returncode == 0, (ours.stderr[-400:],
                                                    ref.stderr[-400:])
    assert ours.stdout == ref.stdout
    assert (tmp_path / "our_ci.txt").read_text() == \
        (tmp_path / "ref_ci.txt").read_text()
