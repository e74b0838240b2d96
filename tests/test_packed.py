"""Bit-packed containers + the PackedPathMerge memory tier."""

import numpy as np

from centrolign_tpu.utils.packed import (
    PackedArray, PackedVector, SignedPackedVector, PagedVector, VectorPair)


def test_packed_array_roundtrip():
    rng = np.random.default_rng(3)
    for width_scale in (3, 17, 40, 62):
        vals = rng.integers(0, 2 ** width_scale, 5000).astype(np.uint64)
        pa = PackedArray(vals)
        assert np.array_equal(pa.to_array(), vals)
        idx = rng.integers(0, len(vals), 200)
        assert np.array_equal(pa.get(idx.astype(np.uint64)), vals[idx])
        assert pa.memory_bytes() < vals.nbytes


def test_signed_and_paged():
    rng = np.random.default_rng(4)
    vals = rng.integers(-10**9, 10**9, 3000)
    sp = SignedPackedVector(vals)
    assert np.array_equal(sp.to_array(), vals)
    # locally smooth sequence packs far below 8 bytes/entry
    smooth = (np.arange(200000) // 3 + rng.integers(-5, 6, 200000))
    pv = PagedVector(smooth)
    assert np.array_equal(pv.to_array(), smooth)
    assert pv.memory_bytes() < smooth.nbytes / 3
    vp = VectorPair(vals, vals)
    assert vp[5] == (vals[5], vals[5])


def test_packed_path_merge_matches_dense(rng):
    from centrolign_tpu.path_merge import PathMerge, PackedPathMerge
    from util import random_dag
    from centrolign_tpu.modify_graph import add_sentinels
    import centrolign_tpu.graph_algs  # noqa
    for trial in range(4):
        g = random_dag(rng, int(rng.integers(10, 60)))
        # add a deterministic traversal as an extra path (both builders get
        # identical inputs; equality of outputs is what matters here)
        from centrolign_tpu.graph_algs import topological_order
        order = topological_order(g)
        pid = g.add_path(f"extra{trial}")
        g.extend_path_array(pid, order)
        t = add_sentinels(g, 5, 6)
        dense = PathMerge(g, t)
        packed = PackedPathMerge(g, t)
        assert np.array_equal(np.asarray(dense.table),
                              np.asarray(packed.table))
        assert np.array_equal(np.asarray(dense.index_on),
                              np.asarray(packed.index_on))
        assert np.array_equal(dense.path_head, packed.path_head)
        for _ in range(50):
            a = int(rng.integers(0, g.node_size))
            b = int(rng.integers(0, g.node_size))
            assert dense.reachable(a, b) == packed.reachable(a, b)
        packed.release()
        assert packed.table is not None  # rematerializes
