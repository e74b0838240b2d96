"""Lane-sharded anti-diagonal Gotoh fill over a device mesh.

This is the multi-chip realization of the reference's po_poa inner loop
(reference alignment.hpp:897-938): the skewed DP state (one anti-diagonal of
M/I/D rows, lanes = positions on the short side) is sharded across the
``lane`` mesh axis; each diagonal step's lane-shift becomes a one-element
halo exchange to the right neighbor (``jax.lax.ppermute`` — rides ICI on real
hardware). Independent gap matrices are batched on the ``gap`` axis, which
needs no communication until the final score gather.

The recurrence is the same int32 piecewise-affine Gotoh as ops.gotoh (the
single-chip kernel), so scores agree bit-for-bit; this module is score-only
(the sharded fill streams no backpointers — it exists to size and validate
the cross-chip dataflow, and serves as the dryrun/regression vehicle for the
mesh design; the production path batches whole matrices per chip instead,
which is communication-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.align_params import MININF

# NOTE: module-level code must not build jax values: creating even a scalar
# initializes the backend client, and on a machine with an accelerator
# plugin that can mean ~a minute of link init (or a hang on a dead tunnel)
# just for importing this module. Keep _NEG a plain int; jnp.int32(...) is
# applied inside traced functions where a backend is genuinely needed.
_NEG = np.int32(MININF)


def make_alignment_mesh(n_devices: int | None = None,
                        gap_axis: int | None = None,
                        devices=None) -> Mesh:
    """A 2D ('gap', 'lane') mesh over the first n_devices devices."""
    devs = jax.devices() if devices is None else list(devices)
    n = len(devs) if n_devices is None else n_devices
    if gap_axis is None:
        gap_axis = 2 if n % 2 == 0 and n > 2 else 1
    lane_axis = n // gap_axis
    grid = np.array(devs[:gap_axis * lane_axis]).reshape(gap_axis, lane_axis)
    return Mesh(grid, ("gap", "lane"))


def _shift_right_sharded(x, axis_name, fill):
    """Lane-shift across the sharded last axis: out[..., k] = x[..., k-1]
    globally; the first lane of each shard comes from the left neighbor's
    last lane (halo exchange)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    last = x[..., -1:]
    from_left = jax.lax.ppermute(
        last, axis_name, [(i, i + 1) for i in range(n - 1)])
    shifted = jnp.concatenate([from_left, x[..., :-1]], axis=-1)
    is_lane0 = jax.lax.broadcasted_iota(jnp.int32, shifted.shape,
                                        shifted.ndim - 1) == 0
    return jnp.where(is_lane0 & (idx == 0), fill, shifted)


def _make_step(npw: int, lane_is_i: bool, emit_bp: bool = False,
               swap_pref: bool = False):
    def step(carry, d, a_lanes, b_revpad, V1, V2, match, mismatch, go, ge,
             lane_base, Wl, W_total):
        """One anti-diagonal on this shard's lane block (all per-problem
        arrays carry a leading local-batch axis)."""
        M1, M2, I1, D1 = carry
        lane = lane_base + jnp.arange(Wl, dtype=jnp.int32)
        if lane_is_i:
            i_vec, j_vec = lane, d - lane
            other_len = V2
        else:
            i_vec, j_vec = d - lane, lane
            other_len = V1

        def sr(x):
            return _shift_right_sharded(x, "lane", _NEG)

        if lane_is_i:
            M_up, I_up = sr(M1), sr(I1)
            M_left, D_left = M1, D1
            M_diag = sr(M2)
        else:
            M_up, I_up = M1, I1
            M_left, D_left = sr(M1), sr(D1)
            M_diag = sr(M2)

        # b is replicated across lanes; each shard slices its own window at
        # global offset W_total + other_len - d + lane_base (cf. ops.gotoh's
        # off = W + other_len - d). other_len is per-problem, so the offset
        # is vmapped alongside b.
        off_vec = W_total + other_len - d + lane_base

        def slice_one(b, o):
            return jax.lax.dynamic_slice(b, (o,), (Wl,))
        bvec = jax.vmap(slice_one)(b_revpad, off_vec)
        score_vec = jnp.where(a_lanes == bvec, match, -mismatch)

        in_matrix = ((i_vec >= 0) & (i_vec <= V1[:, None])
                     & (j_vec >= 0) & (j_vec <= V2[:, None]))
        i_pos = i_vec >= 1
        j_pos = j_vec >= 1
        corner = (i_vec == 0) & (j_vec == 0)

        go_ge = (go + ge)[:, None, None]
        ge_ = ge[:, None, None]
        Inew = jnp.maximum(M_up[None] - go_ge, I_up - ge_)
        Inew = jnp.where((in_matrix & i_pos)[None], Inew, _NEG)
        Dnew = jnp.maximum(M_left[None] - go_ge, D_left - ge_)
        Dnew = jnp.where((in_matrix & j_pos)[None], Dnew, _NEG)
        Mdiag = jnp.where(in_matrix & i_pos & j_pos, M_diag + score_vec, _NEG)
        Mnew = jnp.maximum(Mdiag, jnp.maximum(Inew.max(axis=0),
                                              Dnew.max(axis=0)))
        Mnew = jnp.where(corner, jnp.int32(0), Mnew)
        Mnew = jnp.where(in_matrix, Mnew, _NEG)

        # capture the opt cell's value when this diagonal contains it
        is_opt = (i_vec == V1[:, None]) & (j_vec == V2[:, None])
        opt_here = jnp.max(jnp.where(is_opt, Mnew, _NEG), axis=-1)
        if not emit_bp:
            return (Mnew, M1, Inew, Dnew), opt_here

        # packed backpointers, identical to ops.gotoh._diag_math:94-117
        code = jnp.zeros(Mnew.shape, jnp.int32)
        order = []
        for pw in range(npw):
            if swap_pref:
                order.append((Dnew[pw], 2 + 2 * pw))
                order.append((Inew[pw], 1 + 2 * pw))
            else:
                order.append((Inew[pw], 1 + 2 * pw))
                order.append((Dnew[pw], 2 + 2 * pw))
        for comp_val, comp_code in reversed(order):
            code = jnp.where(comp_val == Mnew, comp_code, code)
        code = jnp.where(corner, 0, code)
        bp = code
        for pw in range(npw):
            i_open = (Inew[pw] == M_up - go_ge[pw, 0]) & (Inew[pw] > _NEG)
            bp = bp | (i_open.astype(jnp.int32) << (3 + pw))
            d_open = (Dnew[pw] == M_left - go_ge[pw, 0]) & (Dnew[pw] > _NEG)
            bp = bp | (d_open.astype(jnp.int32) << (6 + pw))
        return (Mnew, M1, Inew, Dnew), (opt_here, bp.astype(jnp.uint16))

    return step


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_diags", "lane_is_i", "npw", "Wl_total"))
def _sharded_fill(a, b, V1, V2, match, mismatch, go, ge, *, mesh,
                  num_diags: int, lane_is_i: bool, npw: int, Wl_total: int):
    """a: (B, W) lane labels; b: (B, Lb) reversed padded other labels.
    B is sharded over 'gap', W over 'lane'. Returns (B,) scores."""
    step_fn = _make_step(npw, lane_is_i)

    def local(a_blk, b_blk, V1_blk, V2_blk):
        Bl, Wl = a_blk.shape
        lane_base = jax.lax.axis_index("lane") * Wl
        M0 = jax.lax.pcast(jnp.full((Bl, Wl), _NEG, jnp.int32),
                           ("lane", "gap"), to="varying")
        I0 = jax.lax.pcast(jnp.full((npw, Bl, Wl), _NEG, jnp.int32),
                           ("lane", "gap"), to="varying")

        def body(carry, d):
            return step_fn(carry, d, a_blk, b_blk, V1_blk, V2_blk,
                           match, mismatch, go, ge, lane_base, Wl, Wl_total)

        _, opts = jax.lax.scan(
            body, (M0, M0, I0, I0), jnp.arange(num_diags, dtype=jnp.int32))
        # each problem's opt appears on exactly one (diag, shard); others NEG
        score_local = jnp.max(opts, axis=0)
        return jax.lax.pmax(score_local, "lane")

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("gap", "lane"), P("gap", None), P("gap"), P("gap")),
        out_specs=P("gap"))
    return fn(a, b, V1, V2)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_diags", "lane_is_i", "npw", "Wl_total",
                     "swap_pref"))
def _sharded_fill_bp(a, b, V1, V2, match, mismatch, go, ge, *, mesh,
                     num_diags: int, lane_is_i: bool, npw: int,
                     Wl_total: int, swap_pref: bool):
    """Like _sharded_fill but also streams the packed backpointer matrix
    (num_diags, B, W) out of the scan — the lane-sharded fill is no longer
    score-only. Returns (scores (B,), bp (num_diags, B, W) uint16)."""
    step_fn = _make_step(npw, lane_is_i, emit_bp=True, swap_pref=swap_pref)

    def local(a_blk, b_blk, V1_blk, V2_blk):
        Bl, Wl = a_blk.shape
        lane_base = jax.lax.axis_index("lane") * Wl
        M0 = jax.lax.pcast(jnp.full((Bl, Wl), _NEG, jnp.int32),
                           ("lane", "gap"), to="varying")
        I0 = jax.lax.pcast(jnp.full((npw, Bl, Wl), _NEG, jnp.int32),
                           ("lane", "gap"), to="varying")

        def body(carry, d):
            return step_fn(carry, d, a_blk, b_blk, V1_blk, V2_blk,
                           match, mismatch, go, ge, lane_base, Wl, Wl_total)

        _, (opts, bp) = jax.lax.scan(
            body, (M0, M0, I0, I0), jnp.arange(num_diags, dtype=jnp.int32))
        score_local = jnp.max(opts, axis=0)
        return jax.lax.pmax(score_local, "lane"), bp

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("gap", "lane"), P("gap", None), P("gap"), P("gap")),
        out_specs=(P("gap"), P(None, "gap", "lane")))
    return fn(a, b, V1, V2)


def sharded_gotoh_align(seq1, seq2, params, mesh: Mesh,
                        swap_pref: bool = False):
    """One large gap matrix, lane-sharded across the mesh with per-diagonal
    halo exchange, backpointers streamed out of the scan, traceback on the
    host over the gathered matrix. Alignment and score are bit-identical to
    the single-chip ops.gotoh.gotoh_align — this is how a DP too large for
    one chip's memory is aligned across chips (SURVEY §5.7)."""
    from ..ops.gotoh import _build_skew_inputs, _bucket, _traceback_bp

    lane_n = mesh.shape["lane"] * mesh.shape["gap"]
    flat = Mesh(np.asarray(mesh.devices).reshape(1, -1), ("gap", "lane"))
    s1 = np.asarray(seq1, dtype=np.int32)
    s2 = np.asarray(seq2, dtype=np.int32)
    V1, V2 = len(s1), len(s2)
    lane_is_i = V1 <= V2
    W = _bucket((V1 if lane_is_i else V2) + 1, 128 * lane_n)
    num_diags = V1 + V2 + 1
    b_cap = num_diags + 128
    a, b = _build_skew_inputs(s1, s2, lane_is_i, W, b_cap)

    go = jnp.asarray(params.gap_open, dtype=jnp.int32)
    ge = jnp.asarray(params.gap_extend, dtype=jnp.int32)
    sh_a = NamedSharding(flat, P("gap", "lane"))
    sh_b = NamedSharding(flat, P("gap", None))
    sh_v = NamedSharding(flat, P("gap"))
    a_dev = jax.device_put(jnp.asarray(a[None]), sh_a)
    b_dev = jax.device_put(jnp.asarray(b[None]), sh_b)
    v1_dev = jax.device_put(jnp.asarray([V1], np.int32), sh_v)
    v2_dev = jax.device_put(jnp.asarray([V2], np.int32), sh_v)

    score, bp = _sharded_fill_bp(
        a_dev, b_dev, v1_dev, v2_dev,
        jnp.int32(params.match), jnp.int32(params.mismatch), go, ge,
        mesh=flat, num_diags=num_diags, lane_is_i=lane_is_i,
        npw=params.num_pw, Wl_total=W, swap_pref=swap_pref)
    bp_host = np.asarray(jax.device_get(bp))[:, 0, :]
    aln = _traceback_bp(bp_host, V1, V2, lane_is_i, params.num_pw)
    return aln, int(jax.device_get(score)[0])


def sharded_gotoh_scores(seqs1, seqs2, params, mesh: Mesh) -> np.ndarray:
    """Global alignment scores for a batch of sequence pairs, computed with
    the lane-sharded wavefront over `mesh`. Scores are bit-identical to
    ops.gotoh.gotoh_align."""
    from ..ops.gotoh import _build_skew_inputs, _bucket

    B = len(seqs1)
    gap_n = mesh.shape["gap"]
    lane_n = mesh.shape["lane"]
    assert B % gap_n == 0, "batch must divide the gap axis"

    V1s = np.array([len(s) for s in seqs1], dtype=np.int32)
    V2s = np.array([len(s) for s in seqs2], dtype=np.int32)
    lane_is_i = bool(np.max(V1s) <= np.max(V2s))
    short = V1s if lane_is_i else V2s
    W = _bucket(int(short.max()) + 1, 128 * lane_n)
    num_diags = int(np.max(V1s + V2s)) + 1
    b_cap = num_diags + 128

    a_all = np.empty((B, W), np.int32)
    b_all = np.empty((B, 2 * W + b_cap), np.int32)
    for k in range(B):
        s1 = np.asarray(seqs1[k], dtype=np.int32)
        s2 = np.asarray(seqs2[k], dtype=np.int32)
        a_all[k], b_all[k] = _build_skew_inputs(s1, s2, lane_is_i, W, b_cap)

    go = jnp.asarray(params.gap_open, dtype=jnp.int32)
    ge = jnp.asarray(params.gap_extend, dtype=jnp.int32)
    sh_a = NamedSharding(mesh, P("gap", "lane"))
    sh_b = NamedSharding(mesh, P("gap", None))
    sh_v = NamedSharding(mesh, P("gap"))
    a_dev = jax.device_put(jnp.asarray(a_all), sh_a)
    b_dev = jax.device_put(jnp.asarray(b_all), sh_b)
    v1_dev = jax.device_put(jnp.asarray(V1s), sh_v)
    v2_dev = jax.device_put(jnp.asarray(V2s), sh_v)

    scores = _sharded_fill(
        a_dev, b_dev, v1_dev, v2_dev,
        jnp.int32(params.match), jnp.int32(params.mismatch), go, ge,
        mesh=mesh, num_diags=num_diags, lane_is_i=lane_is_i,
        npw=params.num_pw, Wl_total=W)
    return np.asarray(jax.device_get(scores))
