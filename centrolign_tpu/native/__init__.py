"""Native (C++) host runtime: compiled on demand with g++, loaded via ctypes.

Holds the serial-sweep algorithms that are host-latency-bound rather than
TPU-shaped: the sparse chaining DP (chain.cpp). The shared object is built
into this directory and rebuilt whenever a source file changes (hash check).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["chain.cpp", "chain_general.cpp", "esa.cpp", "popoa.cpp", "extract.cpp"]
_SO = os.path.join(_DIR, "_native.so")
_HASH = os.path.join(_DIR, "_native.hash")

_lib = None


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO]
    cmd += [os.path.join(_DIR, s) for s in _SOURCES]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_HASH, "w") as f:
        f.write(_source_hash())


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    want = _source_hash()
    have = None
    if os.path.exists(_HASH) and os.path.exists(_SO):
        with open(_HASH) as f:
            have = f.read().strip()
    if have != want:
        _build()
    lib = ctypes.CDLL(_SO)
    lib.chain_dp_seq.restype = ctypes.c_int64
    lib.chain_dp_seq.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    lib.psd_build.restype = None
    lib.psd_build.argtypes = [ctypes.c_int64, ctypes.c_int64] + \
        [ctypes.POINTER(ctypes.c_int64)] * 6
    lib.chain_dp_general.restype = ctypes.c_int64
    lib.chain_dp_general.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    lib.esa_build.restype = None
    lib.esa_build.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.esa_minimal_rare_matches.restype = ctypes.c_int64
    lib.esa_minimal_rare_matches.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    I64P = ctypes.POINTER(ctypes.c_int64)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I32P = ctypes.POINTER(ctypes.c_int32)
    lib.topological_order_native.restype = None
    lib.topological_order_native.argtypes = [ctypes.c_int64, I64P, I64P, I64P, I64P]
    lib.minmax_distance_native.restype = None
    lib.minmax_distance_native.argtypes = [
        ctypes.c_int64, I64P, I64P, I64P, I64P,
        ctypes.c_int64, I64P, I64P, I64P]
    lib.popoa_align_native.restype = ctypes.c_int64
    lib.popoa_align_native.argtypes = [
        ctypes.c_int64, U8P, I64P, I64P, I64P, I64P,
        ctypes.c_int64, U8P, I64P, I64P, I64P, I64P,
        ctypes.c_int64, I64P, ctypes.c_int64, I64P,
        ctypes.c_int64, I64P, ctypes.c_int64, I64P,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, I32P, I32P,
        I64P, I64P]
    lib.esa_walk_matches.restype = None
    lib.esa_walk_matches.argtypes = [
        ctypes.c_int64, I64P, I64P, I64P,
        ctypes.POINTER(ctypes.c_int8), I64P, I64P]
    lib.extract_connecting_native.restype = None
    lib.extract_connecting_native.argtypes = [
        ctypes.c_int64, I64P, I64P, U8P,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, I64P, I64P, I64P,
        I64P, I64P, ctypes.c_int64,
        U8P, I64P, I64P, I64P, I64P, I64P, I64P]
    _lib = lib
    return lib


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_f64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def chain_dp_seq(s1, e1, s2, e2, w, init_w, fin_w, use_gap: bool,
                 go, ge, scale: float, min_score: float):
    """Run the native chaining DP. Returns (best_end_index or -1, backptr,
    dp_final)."""
    lib = get_lib()
    n = len(s1)
    s1 = np.ascontiguousarray(s1, dtype=np.int64)
    e1 = np.ascontiguousarray(e1, dtype=np.int64)
    s2 = np.ascontiguousarray(s2, dtype=np.int64)
    e2 = np.ascontiguousarray(e2, dtype=np.int64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    init_w = np.ascontiguousarray(init_w, dtype=np.float64)
    fin_w = np.ascontiguousarray(fin_w, dtype=np.float64)
    go = np.ascontiguousarray(go, dtype=np.float64)
    ge = np.ascontiguousarray(ge, dtype=np.float64)
    backptr = np.empty(n, dtype=np.int64)
    dp = np.empty(n, dtype=np.float64)
    best = lib.chain_dp_seq(
        n, _ptr_i64(s1), _ptr_i64(e1), _ptr_i64(s2), _ptr_i64(e2),
        _ptr_f64(w), _ptr_f64(init_w), _ptr_f64(fin_w),
        1 if use_gap else 0, len(go), _ptr_f64(go), _ptr_f64(ge),
        float(scale), float(min_score), _ptr_i64(backptr), _ptr_f64(dp))
    return int(best), backptr, dp


def psd_build(topo_order, prev_indptr, prev_indices, index_on, table):
    """Post-switch distances (C, V), 0 = none (reference semantics)."""
    lib = get_lib()
    C, V = index_on.shape
    topo_order = np.ascontiguousarray(topo_order, dtype=np.int64)
    prev_indptr = np.ascontiguousarray(prev_indptr, dtype=np.int64)
    prev_indices = np.ascontiguousarray(prev_indices, dtype=np.int64)
    index_on = np.ascontiguousarray(index_on, dtype=np.int64)
    table = np.ascontiguousarray(table, dtype=np.int64)
    out = np.zeros((C, V), dtype=np.int64)
    lib.psd_build(V, C, _ptr_i64(topo_order), _ptr_i64(prev_indptr),
                  _ptr_i64(prev_indices), _ptr_i64(index_on), _ptr_i64(table),
                  _ptr_i64(out))
    return out


def chain_dp_general(s1, e1, s2, e2, w, init_w, fin_w,
                     topo1, chain1, idx1, T1, D1, chain1_nodes, chain1_offsets,
                     chain2, idx2, T2, D2,
                     use_gap, go, ge, scale, min_score):
    lib = get_lib()
    n = len(s1)
    V1, C1 = T1.shape
    V2, C2 = T2.shape
    arrs = {}
    def i64(x, name):
        arrs[name] = np.ascontiguousarray(x, dtype=np.int64)
        return _ptr_i64(arrs[name])
    def f64(x, name):
        arrs[name] = np.ascontiguousarray(x, dtype=np.float64)
        return _ptr_f64(arrs[name])
    backptr = np.empty(n, dtype=np.int64)
    dp = np.empty(n, dtype=np.float64)
    if D1 is None:
        D1 = np.zeros((C1, V1), dtype=np.int64)
        D2 = np.zeros((C2, V2), dtype=np.int64)
    go = np.ascontiguousarray(go, dtype=np.float64)
    ge = np.ascontiguousarray(ge, dtype=np.float64)
    best = lib.chain_dp_general(
        n, i64(s1, "s1"), i64(e1, "e1"), i64(s2, "s2"), i64(e2, "e2"),
        f64(w, "w"), f64(init_w, "iw"), f64(fin_w, "fw"),
        V1, C1, i64(topo1, "t1o"), i64(chain1, "c1"), i64(idx1, "i1"),
        i64(T1, "T1"), i64(D1, "D1"),
        i64(chain1_nodes, "cn"), i64(chain1_offsets, "co"),
        V2, C2, i64(chain2, "c2"), i64(idx2, "i2"), i64(T2, "T2"), i64(D2, "D2"),
        1 if use_gap else 0, len(go), _ptr_f64(go), _ptr_f64(ge),
        float(scale), float(min_score), _ptr_i64(backptr), _ptr_f64(dp))
    return int(best), backptr, dp


def esa_build(text):
    """SA + ISA + LCP via native SA-IS/Kasai. text int64, terminal 0 unique
    minimum."""
    lib = get_lib()
    text = np.ascontiguousarray(text, dtype=np.int64)
    n = len(text)
    K = int(text.max()) + 1 if n else 1
    sa = np.empty(n, dtype=np.int64)
    isa = np.empty(n, dtype=np.int64)
    lcp = np.zeros(n, dtype=np.int64)
    lib.esa_build(n, _ptr_i64(text), K, _ptr_i64(sa), _ptr_i64(isa),
                  _ptr_i64(lcp))
    return sa, isa, lcp


def esa_minimal_rare_matches(sa, isa, lcp, start_comp, start_id, max_count):
    """Native minimal-rare-match enumeration (2 components). Returns an
    (M, 5) int64 array of (sa_begin, sa_end, length, cnt0, cnt1) rows in
    reference traversal order."""
    lib = get_lib()
    n = len(sa)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    isa = np.ascontiguousarray(isa, dtype=np.int64)
    lcp = np.ascontiguousarray(lcp, dtype=np.int64)
    start_comp = np.ascontiguousarray(start_comp, dtype=np.int8)
    start_id = np.ascontiguousarray(start_id, dtype=np.int64)
    cap = max(1024, n // 4)
    while True:
        out = np.empty((cap, 5), dtype=np.int64)
        m = lib.esa_minimal_rare_matches(
            n, _ptr_i64(sa), _ptr_i64(isa), _ptr_i64(lcp),
            start_comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            _ptr_i64(start_id), int(max_count), cap, _ptr_i64(out))
        if m <= cap:
            return out[:m]
        cap = m


def _ptr_u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _csr64(pair):
    ptr, ind = pair
    return (np.ascontiguousarray(ptr, dtype=np.int64),
            np.ascontiguousarray(ind, dtype=np.int64))


def topological_order(graph):
    """Native Kahn topological order."""
    lib = get_lib()
    V = graph.node_size
    nptr, nind = _csr64(graph.next_csr())
    pptr, pind = _csr64(graph.prev_csr())
    out = np.empty(V, dtype=np.int64)
    lib.topological_order_native(V, _ptr_i64(nptr), _ptr_i64(nind),
                                 _ptr_i64(pptr), _ptr_i64(out))
    return out


def minmax_distance(graph, sources):
    lib = get_lib()
    V = graph.node_size
    nptr, nind = _csr64(graph.next_csr())
    pptr, pind = _csr64(graph.prev_csr())
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    mind = np.empty(V, dtype=np.int64)
    maxd = np.empty(V, dtype=np.int64)
    lib.minmax_distance_native(V, _ptr_i64(nptr), _ptr_i64(nind),
                               _ptr_i64(pptr), _ptr_i64(pind),
                               len(sources), _ptr_i64(sources),
                               _ptr_i64(mind), _ptr_i64(maxd))
    return mind, maxd


def popoa_align(graph1, graph2, sources1, sources2, sinks1, sinks2, params):
    """Native PO-POA (fill + traceback), identical to ops.popoa_ref.popoa."""
    lib = get_lib()
    V1, V2 = graph1.node_size, graph2.node_size
    lab1 = np.ascontiguousarray(graph1.labels, dtype=np.uint8)
    lab2 = np.ascontiguousarray(graph2.labels, dtype=np.uint8)
    n1ptr, n1ind = _csr64(graph1.next_csr())
    p1ptr, p1ind = _csr64(graph1.prev_csr())
    n2ptr, n2ind = _csr64(graph2.next_csr())
    p2ptr, p2ind = _csr64(graph2.prev_csr())
    s1 = np.ascontiguousarray(sources1, dtype=np.int64)
    s2 = np.ascontiguousarray(sources2, dtype=np.int64)
    k1 = np.ascontiguousarray(sinks1, dtype=np.int64)
    k2 = np.ascontiguousarray(sinks2, dtype=np.int64)
    go = np.ascontiguousarray(params.gap_open, dtype=np.int32)
    ge = np.ascontiguousarray(params.gap_extend, dtype=np.int32)
    out = np.empty((V1 + V2 + 2, 2), dtype=np.int64)
    score = np.zeros(1, dtype=np.int64)
    n = lib.popoa_align_native(
        V1, _ptr_u8(lab1), _ptr_i64(n1ptr), _ptr_i64(n1ind),
        _ptr_i64(p1ptr), _ptr_i64(p1ind),
        V2, _ptr_u8(lab2), _ptr_i64(n2ptr), _ptr_i64(n2ind),
        _ptr_i64(p2ptr), _ptr_i64(p2ind),
        len(s1), _ptr_i64(s1), len(s2), _ptr_i64(s2),
        len(k1), _ptr_i64(k1), len(k2), _ptr_i64(k2),
        int(params.match), int(params.mismatch), len(go),
        go.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ge.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _ptr_i64(out), _ptr_i64(score))
    return out[:n].copy(), int(score[0])


class ExtractionContext:
    """Reusable buffers + flattened graph/xmerge arrays for native
    extract_connecting_graph calls on one (graph, xmerge) pair."""

    def __init__(self, graph, xmerge):
        self.V = graph.node_size
        nptr, nind = graph.next_csr()
        self.nptr = np.ascontiguousarray(nptr, dtype=np.int64)
        self.nind = np.ascontiguousarray(nind, dtype=np.int64)
        self.labels = np.ascontiguousarray(graph.labels, dtype=np.uint8)
        self.table = np.ascontiguousarray(xmerge.table, dtype=np.int64)
        self.path_head = np.ascontiguousarray(xmerge.path_head, dtype=np.int64)
        self.index_on = np.ascontiguousarray(xmerge.index_on, dtype=np.int64)
        self.C = self.table.shape[1]
        V, E = self.V, len(self.nind)
        self.fwd = np.zeros(V, dtype=np.int64)
        self.epoch = np.full(V, -1, dtype=np.int64)
        self.cur = 0
        self.out_labels = np.empty(max(V, 1), dtype=np.uint8)
        self.out_back = np.empty(max(V, 1), dtype=np.int64)
        self.out_ef = np.empty(max(E, 1), dtype=np.int64)
        self.out_et = np.empty(max(E, 1), dtype=np.int64)
        self.out_src = np.empty(max(V, 1), dtype=np.int64)
        self.out_snk = np.empty(max(V, 1), dtype=np.int64)
        self.counts = np.empty(4, dtype=np.int64)

    def extract(self, from_id: int, to_id: int):
        lib = get_lib()
        self.cur += 1
        lib.extract_connecting_native(
            self.V, _ptr_i64(self.nptr), _ptr_i64(self.nind),
            _ptr_u8(self.labels), int(from_id), int(to_id),
            self.C, _ptr_i64(self.table), _ptr_i64(self.path_head),
            _ptr_i64(self.index_on),
            _ptr_i64(self.fwd), _ptr_i64(self.epoch), self.cur,
            _ptr_u8(self.out_labels), _ptr_i64(self.out_back),
            _ptr_i64(self.out_ef), _ptr_i64(self.out_et),
            _ptr_i64(self.out_src), _ptr_i64(self.out_snk),
            _ptr_i64(self.counts))
        nn, ne, ns, nk = (int(x) for x in self.counts)
        return (self.out_labels[:nn].copy(), self.out_back[:nn].copy(),
                self.out_ef[:ne].copy(), self.out_et[:ne].copy(),
                self.out_src[:ns].copy(), self.out_snk[:nk].copy())


def esa_walk_matches(rows, sa, ids, comp):
    """Walk all match rows into flat walks. Returns (walks flat int64,
    offsets per row). Row m occupies walks[offsets[m] : offsets[m] +
    (cnt0+cnt1)*L] as cnt0 comp-0 walks then cnt1 comp-1 walks."""
    lib = get_lib()
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    comp = np.ascontiguousarray(comp, dtype=np.int8)
    sizes = (rows[:, 3] + rows[:, 4]) * rows[:, 2]
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    walks = np.empty(int(offsets[-1]), dtype=np.int64)
    lib.esa_walk_matches(
        len(rows), _ptr_i64(rows), _ptr_i64(sa), _ptr_i64(ids),
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        _ptr_i64(offsets), _ptr_i64(walks))
    return walks, offsets
