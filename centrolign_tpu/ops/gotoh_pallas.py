"""Pallas TPU kernel for the skewed anti-diagonal Gotoh fill.

Same math as ops.gotoh._gotoh_scan (bit-identical int32 DP + packed uint16
backpointers), but as a single Pallas kernel: the grid walks chunks of
anti-diagonals, DP state lives in VMEM scratch across grid steps, and each
step runs a fori_loop over the diagonals of its chunk — so per-diagonal cost
is pure VPU work instead of XLA scan overhead.

Layout: lanes index the short side (+1); diagonals stream through a
(CHUNK, W) backpointer output block per grid step. The score of the opt cell
(V1, V2) is extracted on-device into an SMEM scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..device import configure_compile_cache

configure_compile_cache()
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align_params import MININF

_NEG = np.int32(MININF)
CHUNK = 128


def _pow2_bucket(n: int, quantum: int) -> int:
    """Round up to quantum * 2^k — one compile per scale instead of one per
    128-multiple (the fill is cheap; XLA compiles through the tunnel are not).
    """
    out = quantum
    while out < n:
        out *= 2
    return out


def _shift_lanes(x, fill=_NEG):
    """out[., k] = x[., k-1]; out[., 0] = fill. x is (R, W) int32."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _make_kernel(npw: int, lane_is_i: bool, swap_pref: bool, grid_axis: int = 0, bp_write=None, batched: bool = False):
    def kernel(scal_ref,           # SMEM: [V1, V2, match, mismatch, go..., ge...]
               a_ref,              # VMEM (1, W) int32: lane-side labels
               b_ref,              # VMEM (1, LB) int32: reversed other labels
               bp_ref,             # out VMEM (CHUNK, W) int32 backpointers
               score_ref,          # out SMEM (1, 1) int32
               M1, M2, II, DD):    # scratch VMEM (1, W), (1, W), (npw, W), (npw, W)
        c = pl.program_id(grid_axis)
        W = a_ref.shape[-1]
        a_vec = a_ref[0] if batched else a_ref[:]
        V1 = scal_ref[0]
        V2 = scal_ref[1]
        match = scal_ref[2]
        mismatch = scal_ref[3]
        other_len = V2 if lane_is_i else V1

        @pl.when(c == 0)
        def _init():
            M1[:] = jnp.full_like(M1, _NEG)
            M2[:] = jnp.full_like(M2, _NEG)
            II[:] = jnp.full_like(II, _NEG)
            DD[:] = jnp.full_like(DD, _NEG)
            score_ref[0, 0] = 0

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def body(k, _):
            d = c * CHUNK + k
            if lane_is_i:
                i_vec, j_vec = lane, d - lane
            else:
                i_vec, j_vec = d - lane, lane
            # unaligned dynamic slice of b: aligned 128-multiple load, then a
            # dynamic lane rotation to shift off the remainder
            off = jnp.maximum(W + other_len - d, 0)
            base = (off // 128) * 128
            rem = off - base
            if batched:
                chunk = b_ref[0, :, pl.ds(base, W + 128)]
            else:
                chunk = b_ref[:, pl.ds(base, W + 128)]
            rolled = pltpu.roll(chunk, shift=(W + 128) - rem, axis=1)
            bvec = rolled[:, :W]
            score_vec = jnp.where(a_vec == bvec, match, -mismatch)

            Mrow1 = M1[:]
            Mrow2 = M2[:]

            in_matrix = (i_vec >= 0) & (i_vec <= V1) & (j_vec >= 0) & (j_vec <= V2)
            i_pos = i_vec >= 1
            j_pos = j_vec >= 1
            corner = (i_vec == 0) & (j_vec == 0)

            if lane_is_i:
                M_up = _shift_lanes(Mrow1)
                M_left = Mrow1
                M_diag = _shift_lanes(Mrow2)
            else:
                M_up = Mrow1
                M_left = _shift_lanes(Mrow1)
                M_diag = _shift_lanes(Mrow2)

            Mnew = jnp.where(in_matrix & i_pos & j_pos,
                             M_diag + score_vec, _NEG)
            bp = jnp.zeros((1, W), jnp.int32)
            comps = []
            for pw in range(npw):
                go = scal_ref[4 + pw]
                ge = scal_ref[4 + npw + pw]
                Ipw = II[pl.ds(pw, 1), :]
                Dpw = DD[pl.ds(pw, 1), :]
                if lane_is_i:
                    I_prev = _shift_lanes(Ipw)
                    D_prev = Dpw
                else:
                    I_prev = Ipw
                    D_prev = _shift_lanes(Dpw)
                i_open_val = M_up - (go + ge)
                Inew = jnp.maximum(i_open_val, I_prev - ge)
                Inew = jnp.where(in_matrix & i_pos, Inew, _NEG)
                d_open_val = M_left - (go + ge)
                Dnew = jnp.maximum(d_open_val, D_prev - ge)
                Dnew = jnp.where(in_matrix & j_pos, Dnew, _NEG)
                II[pl.ds(pw, 1), :] = Inew
                DD[pl.ds(pw, 1), :] = Dnew
                Mnew = jnp.maximum(Mnew, jnp.maximum(Inew, Dnew))
                bp = bp | ((Inew == i_open_val) & (Inew > _NEG)).astype(jnp.int32) << (3 + pw)
                bp = bp | ((Dnew == d_open_val) & (Dnew > _NEG)).astype(jnp.int32) << (6 + pw)
                if swap_pref:
                    comps.append((Dnew, 2 + 2 * pw))
                    comps.append((Inew, 1 + 2 * pw))
                else:
                    comps.append((Inew, 1 + 2 * pw))
                    comps.append((Dnew, 2 + 2 * pw))

            Mnew = jnp.where(corner, jnp.int32(0), Mnew)
            Mnew = jnp.where(in_matrix, Mnew, _NEG)

            code = jnp.zeros((1, W), jnp.int32)
            for comp_val, comp_code in reversed(comps):
                code = jnp.where(comp_val == Mnew, comp_code, code)
            code = jnp.where(corner, 0, code)
            bp = bp | code

            if bp_write is None:
                bp_ref[pl.ds(k, 1), :] = bp
            else:
                bp_write(bp_ref, k, bp)
            M2[:] = Mrow1
            M1[:] = Mnew

            # extract the opt score when this is the final real diagonal
            @pl.when(d == V1 + V2)
            def _():
                last_lane = V1 if lane_is_i else V2
                sel = jnp.where(lane == last_lane, Mnew, _NEG)
                score_ref[0, 0] = jnp.max(sel)

            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_diags", "W", "lane_is_i", "npw", "swap_pref"))
def gotoh_fill_pallas(scalars, a, b, num_diags: int, W: int,
                      lane_is_i: bool, npw: int, swap_pref: bool):
    """Run the Pallas fill. scalars = [V1, V2, match, mismatch, go*, ge*]
    (int32). Returns (bp (num_diags, W) int32, score (1,1) int32)."""
    kernel = _make_kernel(npw, lane_is_i, swap_pref)
    n_chunks = num_diags // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, W), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, W), lambda c, s: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((npw, W), jnp.int32),
            pltpu.VMEM((npw, W), jnp.int32),
        ],
    )
    bp, score = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_diags, W), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(scalars, a.reshape(1, -1), b.reshape(1, -1))
    return bp, score


def gotoh_fill_device(seq1: np.ndarray, seq2: np.ndarray, params,
                      swap_pref: bool = False):
    """Device fill entry: returns (bp ndarray (num_diags, W) uint16-compatible,
    score int, lane_is_i). Uses the same skew/bucketing as ops.gotoh."""
    from .gotoh import _build_skew_inputs, _bucket

    seq1 = np.asarray(seq1, dtype=np.int32)
    seq2 = np.asarray(seq2, dtype=np.int32)
    V1, V2 = len(seq1), len(seq2)
    npw = params.num_pw
    lane_is_i = V1 <= V2
    W = _bucket((V1 if lane_is_i else V2) + 1, 128)
    num_diags = _bucket(V1 + V2 + 1, CHUNK * 2)
    a, b = _build_skew_inputs(seq1, seq2, lane_is_i, W, num_diags + 128)
    scalars = np.array(
        [V1, V2, params.match, params.mismatch,
         *params.gap_open, *params.gap_extend], dtype=np.int32)
    bp, score = gotoh_fill_pallas(
        jnp.asarray(scalars), jnp.asarray(a), jnp.asarray(b),
        num_diags, W, lane_is_i, npw, swap_pref)
    return np.asarray(jax.device_get(bp)), int(jax.device_get(score)[0, 0]), lane_is_i


def gotoh_align_pallas(seq1, seq2, params, swap_pref: bool = False):
    from .gotoh import _traceback_bp

    bp, score, lane_is_i = gotoh_fill_device(seq1, seq2, params, swap_pref)
    aln = _traceback_bp(bp, len(seq1), len(seq2), lane_is_i, params.num_pw)
    return aln, score


# ---------------------------------------------------------------------------
# On-device traceback: the D2H link is far slower than the kernel (measured
# ~30 MB/s through the tunnel), so shipping the O(N^2) backpointer matrix
# dominates wall-clock. Instead, chase the packed backpointers on device with
# a lax.while_loop and transfer only the O(N) alignment pairs.


@functools.partial(jax.jit, static_argnames=("lane_is_i", "npw", "cap"))
def _traceback_bp_on_device(bp, score, V1, V2, lane_is_i: bool, npw: int,
                            cap: int):
    """Replicates gotoh._traceback_bp on device. Returns one (cap+1, 2) int32
    array: row 0 is (count, score); the alignment pairs fill rows 1..cap from
    the END (a single array means a single D2H round trip — the tunnel has
    ~25ms latency per fetch). GAP = -1."""

    def cond(state):
        i, j, comp, idx, out = state
        return (i != 0) | (j != 0)

    def body(state):
        i, j, comp, idx, out = state
        d = i + j
        lane = i if lane_is_i else j
        b = jax.lax.dynamic_slice(bp, (d, lane), (1, 1))[0, 0]

        code = b & 0b111
        # comp update when we're in the match state
        odd = code % 2 == 1
        new_comp = jnp.where(odd, (code + 1) // 2, -(code // 2))
        comp_eff = jnp.where(comp == 0, new_comp, comp)

        is_diag = (comp == 0) & (code == 0)
        take_i = comp_eff > 0  # gap in graph2: emit (i-1, GAP)

        pair = jnp.where(
            is_diag, jnp.stack([i - 1, j - 1]),
            jnp.where(take_i, jnp.stack([i - 1, jnp.int32(-1)]),
                      jnp.stack([jnp.int32(-1), j - 1])))
        out = jax.lax.dynamic_update_slice(out, pair[None], (idx, 0))

        pw_i = comp_eff - 1
        pw_d = -comp_eff - 1
        i_closes = (b >> (3 + pw_i)) & 1
        d_closes = (b >> (6 + pw_d)) & 1
        comp_next = jnp.where(
            is_diag, 0,
            jnp.where(take_i,
                      jnp.where(i_closes == 1, 0, comp_eff),
                      jnp.where(d_closes == 1, 0, comp_eff)))
        i_next = jnp.where(is_diag | take_i, i - 1, i)
        j_next = jnp.where(is_diag | ~take_i, j - 1, j)
        return (i_next, j_next, comp_next, idx - 1, out)

    out0 = jnp.zeros((cap + 1, 2), jnp.int32)
    i0 = jnp.int32(V1)
    j0 = jnp.int32(V2)
    state = (i0, j0, jnp.int32(0), jnp.int32(cap), out0)
    i, j, comp, idx, out = jax.lax.while_loop(cond, body, state)
    header = jnp.stack([cap - idx, score[0, 0]])
    return jax.lax.dynamic_update_slice(out, header[None], (0, 0))


def gotoh_align_pallas_device_tb(seq1, seq2, params, swap_pref: bool = False):
    """Pallas fill + on-device traceback; only the alignment comes back."""
    from .gotoh import _build_skew_inputs, _bucket

    seq1 = np.asarray(seq1, dtype=np.int32)
    seq2 = np.asarray(seq2, dtype=np.int32)
    V1, V2 = len(seq1), len(seq2)
    npw = params.num_pw
    lane_is_i = V1 <= V2
    W = _pow2_bucket((V1 if lane_is_i else V2) + 1, 128)
    num_diags = _pow2_bucket(V1 + V2 + 1, CHUNK * 2)
    a, b = _build_skew_inputs(seq1, seq2, lane_is_i, W, num_diags + 128)
    scalars = np.array(
        [V1, V2, params.match, params.mismatch,
         *params.gap_open, *params.gap_extend], dtype=np.int32)
    bp, score = gotoh_fill_pallas(
        jnp.asarray(scalars), jnp.asarray(a), jnp.asarray(b),
        num_diags, W, lane_is_i, npw, swap_pref)
    packed = _traceback_bp_on_device(
        bp, score, jnp.int32(V1), jnp.int32(V2), lane_is_i, npw, num_diags)
    packed = np.asarray(jax.device_get(packed), dtype=np.int64)
    count, sc = int(packed[0, 0]), int(packed[0, 1])
    aln = packed[len(packed) - count:]
    return aln, sc


# ---------------------------------------------------------------------------
# Batched fill: one launch for a whole group of gap matrices. The tunnel to
# the chip has ~25-30ms round-trip latency, so per-gap dispatch is latency-
# bound; batching amortizes it. Grid is (B, n_chunks); scratch re-inits at
# chunk 0 of every batch element.


def _make_batch_kernel(npw: int, lane_is_i: bool, swap_pref: bool):
    def bp_write(bp_ref, k, bp):
        bp_ref[pl.ds(0, 1), pl.ds(k, 1), :] = bp[None]

    base = _make_kernel(npw, lane_is_i, swap_pref, grid_axis=1,
                        bp_write=bp_write, batched=True)

    def kernel(scal_ref, a_ref, b_ref, bp_ref, score_ref, M1, M2, II, DD):
        bidx = pl.program_id(0)

        class _Scal:
            """View of the b-th row of the scalar table."""
            def __getitem__(self, k):
                return scal_ref[bidx, k]

        class _Score:
            def __setitem__(self, _idx, v):
                score_ref[0, 0, 0] = v

        base(_Scal(), a_ref, b_ref, bp_ref, _Score(), M1, M2, II, DD)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_diags", "W", "lane_is_i", "npw", "swap_pref"))
def gotoh_fill_pallas_batch(scalars, a, b, num_diags: int, W: int,
                            lane_is_i: bool, npw: int, swap_pref: bool):
    """scalars (B, 4+2npw) int32; a (B, W); b (B, LB). Returns
    (bp (B, num_diags, W) int32, score (B, 1, 1) int32)."""
    B = a.shape[0]
    kernel = _make_batch_kernel(npw, lane_is_i, swap_pref)
    n_chunks = num_diags // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda bi, c, s: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b.shape[1]), lambda bi, c, s: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, W), lambda bi, c, s: (bi, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda bi, c, s: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((npw, W), jnp.int32),
            pltpu.VMEM((npw, W), jnp.int32),
        ],
    )
    bp, score = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, num_diags, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
    )(scalars, a[:, None, :], b[:, None, :])
    return bp, score


@functools.partial(jax.jit, static_argnames=("lane_is_i", "npw", "cap"))
def _traceback_batch_on_device(bp, score, V1, V2, lane_is_i: bool, npw: int,
                               cap: int):
    fn = functools.partial(_traceback_bp_on_device, lane_is_i=lane_is_i,
                           npw=npw, cap=cap)
    return jax.vmap(fn)(bp, score, V1, V2)


# ---------------------------------------------------------------------------
# Sublane-packed batch: 8 problems ride the 8 VPU sublanes of every vector
# op, so a (8, W) tile carries 8 real DP rows instead of one row plus 7
# rows of hardware padding — the single biggest lever identified in
# docs/kernel-roofline.md ("multi-problem lane packing"). The group size is
# ALWAYS 8 (short groups are padded with empty V1=V2=0 problems), which
# also collapses the per-batch-size compile keys of the row-per-problem
# kernel into one shape per (W, num_diags, lane_is_i, swap_pref, npw).
#
# The per-problem unaligned b-slice is made uniform across sublanes by
# storing each problem's reversed other-side sequence right-aligned at a
# bucket-fixed position: b[r, W + D - len : W + D] = src_r[::-1], so the
# slice offset for diagonal d is W + D - d for every row at once.

GROUP = 8


def _pack_chunk(W: int) -> int:
    """Per-grid-step diagonal count, sized so the (chunk, 8, W) int32
    backpointer block stays within ~2 MB of VMEM (double-buffered)."""
    chunk = CHUNK
    while chunk * GROUP * W * 4 > (2 << 20) and chunk > 8:
        chunk //= 2
    return chunk


def _make_pack8_kernel(npw: int, lane_is_i: bool, swap_pref: bool,
                       chunk: int, D: int, pid_axis: int = 0):
    def kernel(par_ref,            # VMEM (8, 16) int32 per-row params
               a_ref,              # VMEM (8, W) int32 lane-side labels
               b_ref,              # VMEM (8, LB) int32 right-aligned rev.
               bp_ref,             # out VMEM (chunk, 8, W) int32
               sc_ref,             # out VMEM (8, W) int32 (row-max = score)
               M1, M2, II, DD):    # scratch (8,W),(8,W),(npw,8,W),(npw,8,W)
        # pid_axis 0: grid=(n_chunks,). pid_axis 1: grid=(ngroups,
        # n_chunks) — the chunk axis iterates fastest, so the c==0 init
        # below re-arms the scratch state at every new group
        c = pl.program_id(pid_axis)
        W = a_ref.shape[-1]
        a_vec = a_ref[:, :]
        V1v = par_ref[:, 0:1]
        V2v = par_ref[:, 1:2]
        matchv = par_ref[:, 2:3]
        mismatchv = par_ref[:, 3:4]

        @pl.when(c == 0)
        def _init():
            M1[:, :] = jnp.full_like(M1, _NEG)
            M2[:, :] = jnp.full_like(M2, _NEG)
            II[:, :, :] = jnp.full_like(II, _NEG)
            DD[:, :, :] = jnp.full_like(DD, _NEG)
            sc_ref[:, :] = jnp.full_like(sc_ref, _NEG)

        lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)

        def body(k, _):
            d = c * chunk + k
            if lane_is_i:
                i_vec, j_vec = lane, d - lane
            else:
                i_vec, j_vec = d - lane, lane
            # uniform-offset b slice: aligned load + lane rotation
            off = W + D - d
            base = (off // 128) * 128
            rem = off - base
            chunkb = b_ref[:, pl.ds(base, W + 128)]
            rolled = pltpu.roll(chunkb, shift=(W + 128) - rem, axis=1)
            bvec = rolled[:, :W]
            score_vec = jnp.where(a_vec == bvec, matchv, -mismatchv)

            Mrow1 = M1[:, :]
            Mrow2 = M2[:, :]

            in_matrix = ((i_vec >= 0) & (i_vec <= V1v)
                         & (j_vec >= 0) & (j_vec <= V2v))
            i_pos = i_vec >= 1
            j_pos = j_vec >= 1
            corner = (i_vec == 0) & (j_vec == 0)

            if lane_is_i:
                M_up = _shift_lanes(Mrow1)
                M_left = Mrow1
                M_diag = _shift_lanes(Mrow2)
            else:
                M_up = Mrow1
                M_left = _shift_lanes(Mrow1)
                M_diag = _shift_lanes(Mrow2)

            Mnew = jnp.where(in_matrix & i_pos & j_pos,
                             M_diag + score_vec, _NEG)
            bp = jnp.zeros((GROUP, W), jnp.int32)
            comps = []
            for pw in range(npw):
                go = par_ref[:, 4 + pw:5 + pw]
                ge = par_ref[:, 4 + npw + pw:5 + npw + pw]
                Ipw = II[pw, :, :]
                Dpw = DD[pw, :, :]
                if lane_is_i:
                    I_prev = _shift_lanes(Ipw)
                    D_prev = Dpw
                else:
                    I_prev = Ipw
                    D_prev = _shift_lanes(Dpw)
                i_open_val = M_up - (go + ge)
                Inew = jnp.maximum(i_open_val, I_prev - ge)
                Inew = jnp.where(in_matrix & i_pos, Inew, _NEG)
                d_open_val = M_left - (go + ge)
                Dnew = jnp.maximum(d_open_val, D_prev - ge)
                Dnew = jnp.where(in_matrix & j_pos, Dnew, _NEG)
                II[pw, :, :] = Inew
                DD[pw, :, :] = Dnew
                Mnew = jnp.maximum(Mnew, jnp.maximum(Inew, Dnew))
                bp = bp | ((Inew == i_open_val) & (Inew > _NEG)
                           ).astype(jnp.int32) << (3 + pw)
                bp = bp | ((Dnew == d_open_val) & (Dnew > _NEG)
                           ).astype(jnp.int32) << (6 + pw)
                if swap_pref:
                    comps.append((Dnew, 2 + 2 * pw))
                    comps.append((Inew, 1 + 2 * pw))
                else:
                    comps.append((Inew, 1 + 2 * pw))
                    comps.append((Dnew, 2 + 2 * pw))

            Mnew = jnp.where(corner, jnp.int32(0), Mnew)
            Mnew = jnp.where(in_matrix, Mnew, _NEG)

            code = jnp.zeros((GROUP, W), jnp.int32)
            for comp_val, comp_code in reversed(comps):
                code = jnp.where(comp_val == Mnew, comp_code, code)
            code = jnp.where(corner, 0, code)
            bp = bp | code

            bp_ref[pl.ds(k, 1), :, :] = bp[None]
            M2[:, :] = Mrow1
            M1[:, :] = Mnew

            # per-row opt score: capture Mnew at the row's final diagonal
            last_lane = V1v if lane_is_i else V2v
            done = (d == V1v + V2v) & (lane == last_lane)
            sc_ref[:, :] = jnp.where(done, Mnew, sc_ref[:, :])
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_diags", "W", "lane_is_i", "npw", "swap_pref"))
def gotoh_fill_pallas_pack8(params, a, b, num_diags: int, W: int,
                            lane_is_i: bool, npw: int, swap_pref: bool):
    """params (8, 16) int32 [V1, V2, match, mismatch, go*, ge*, 0-pad];
    a (8, W); b (8, 2W + num_diags + 128). Returns
    (bp (num_diags, 8, W) int32, score (8,) int32)."""
    chunk = _pack_chunk(W)
    kernel = _make_pack8_kernel(npw, lane_is_i, swap_pref, chunk, num_diags)
    n_chunks = num_diags // chunk
    bp, sc = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((GROUP, 16), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, a.shape[1]), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, b.shape[1]), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, GROUP, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, W), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_diags, GROUP, W), jnp.int32),
            jax.ShapeDtypeStruct((GROUP, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, W), jnp.int32),
            pltpu.VMEM((GROUP, W), jnp.int32),
            pltpu.VMEM((npw, GROUP, W), jnp.int32),
            pltpu.VMEM((npw, GROUP, W), jnp.int32),
        ],
    )(params, a, b)
    return bp, jnp.max(sc, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "num_diags", "W", "lane_is_i", "npw", "swap_pref", "ngroups"))
def gotoh_fill_pallas_packmulti(params, a, b, num_diags: int, W: int,
                                lane_is_i: bool, npw: int, swap_pref: bool,
                                ngroups: int):
    """Multi-group packed fill: `ngroups` independent 8-problem groups ride
    ONE pallas_call (grid = groups x diagonal-chunks), so a bucket with
    dozens of small gaps pays one dispatch instead of one per 8 jobs —
    the launch-latency amortization lever for the small-gap regime
    (docs/kernel-roofline.md). params (ngroups*8, 16); a (ngroups*8, W);
    b (ngroups*8, LB). Returns (bp (ngroups, num_diags, 8, W) int32,
    score (ngroups, 8) int32)."""
    chunk = _pack_chunk(W)
    kernel = _make_pack8_kernel(npw, lane_is_i, swap_pref, chunk,
                                num_diags, pid_axis=1)
    n_chunks = num_diags // chunk
    bp, sc = pl.pallas_call(
        kernel,
        grid=(ngroups, n_chunks),
        in_specs=[
            pl.BlockSpec((GROUP, 16), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, a.shape[1]), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, b.shape[1]), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, GROUP, W),
                         lambda g, c, n=n_chunks: (g * n + c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, W), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ngroups * num_diags, GROUP, W),
                                 jnp.int32),
            jax.ShapeDtypeStruct((ngroups * GROUP, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, W), jnp.int32),
            pltpu.VMEM((GROUP, W), jnp.int32),
            pltpu.VMEM((npw, GROUP, W), jnp.int32),
            pltpu.VMEM((npw, GROUP, W), jnp.int32),
        ],
    )(params, a, b)
    bp = bp.reshape(ngroups, num_diags, GROUP, W)
    sc = jnp.max(sc.reshape(ngroups, GROUP, W), axis=2)
    return bp, sc


@functools.partial(jax.jit, static_argnames=("lane_is_i", "npw", "cap"))
def _traceback_pack8_on_device(bp, scores, V1, V2, lane_is_i: bool,
                               npw: int, cap: int):
    """Traceback for the packed fill: bp (cap, 8, W) -> per-row packed output
    identical in layout to _traceback_bp_on_device.

    Every traceback move lowers the anti-diagonal d by 1 (gap) or 2 (match),
    so the walk visits each diagonal AT MOST ONCE — which turns the
    pointer-chase into a `lax.scan` over diagonals in reverse, with each
    step's (8, W) backpointer row STREAMED in as the scan's xs instead of
    gathered with a per-step dynamic_slice (the gather walk measured ~50 us
    per step through XLA; the streamed row is one HBM read that the scan
    pipeline prefetches). A row's state only advances on the step matching
    its current diagonal."""
    D, G, W = bp.shape

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)

    def step(state, xs):
        d, bp_row = xs
        i, j, comp = state
        active = ((i + j) == d) & ((i != 0) | (j != 0))
        lane_idx = i if lane_is_i else j
        b = jnp.sum(jnp.where(lane_iota == lane_idx[:, None], bp_row, 0),
                    axis=1)
        code = b & 0b111
        odd = code % 2 == 1
        new_comp = jnp.where(odd, (code + 1) // 2, -(code // 2))
        comp_eff = jnp.where(comp == 0, new_comp, comp)
        is_diag = (comp == 0) & (code == 0)
        take_i = comp_eff > 0
        pair = jnp.where(
            is_diag[:, None], jnp.stack([i - 1, j - 1], axis=1),
            jnp.where(take_i[:, None],
                      jnp.stack([i - 1, jnp.full_like(j, -1)], axis=1),
                      jnp.stack([jnp.full_like(i, -1), j - 1], axis=1)))
        pair = jnp.where(active[:, None], pair, jnp.int32(-2))
        pw_i = comp_eff - 1
        pw_d = -comp_eff - 1
        i_closes = (b >> (3 + pw_i)) & 1
        d_closes = (b >> (6 + pw_d)) & 1
        comp_next = jnp.where(
            is_diag, 0,
            jnp.where(take_i,
                      jnp.where(i_closes == 1, 0, comp_eff),
                      jnp.where(d_closes == 1, 0, comp_eff)))
        i_next = jnp.where(is_diag | take_i, i - 1, i)
        j_next = jnp.where(is_diag | ~take_i, j - 1, j)
        return ((jnp.where(active, i_next, i),
                 jnp.where(active, j_next, j),
                 jnp.where(active, comp_next, comp)),
                pair)

    state0 = (V1, V2, jnp.zeros(G, jnp.int32))
    _, pairs = jax.lax.scan(
        step, state0, (jnp.arange(D, dtype=jnp.int32), bp), reverse=True)
    # pairs (D, 8, 2), diagonal-indexed: increasing d == alignment order.
    # Compact each row to the packed (cap+1, 2) layout with one scatter.
    valid = pairs[:, :, 0] != -2                         # (D, 8)
    count = jnp.sum(valid, axis=0, dtype=jnp.int32)      # (8,)
    pos = jnp.cumsum(valid, axis=0, dtype=jnp.int32)     # 1-based among valid

    def compact(row_pairs, row_valid, row_pos, n, score):
        # invalid rows target cap+1: out of bounds, dropped by the scatter
        # (negative indices would WRAP, clobbering the last row)
        tgt = jnp.where(row_valid, cap - n + row_pos, jnp.int32(cap + 1))
        out = jnp.zeros((cap + 1, 2), jnp.int32)
        out = out.at[tgt].set(row_pairs, mode="drop")
        return out.at[0].set(jnp.stack([n, score]))

    return jax.vmap(compact, in_axes=(1, 1, 1, 0, 0))(
        pairs, valid, pos, count, scores)


def _build_skew_inputs_packed(seq1, seq2, lane_is_i: bool, W: int, D: int,
                              a_row, b_row):
    """Fill one row of the packed (a, b) arrays: a as in _build_skew_inputs,
    b right-aligned at W + D so the slice offset is uniform per diagonal."""
    V1, V2 = len(seq1), len(seq2)
    if lane_is_i:
        a_row[1:V1 + 1] = seq1
        b_src, b_len = seq2, V2
    else:
        a_row[1:V2 + 1] = seq2
        b_src, b_len = seq1, V1
    b_row[W + D - b_len:W + D] = b_src[::-1]


def gotoh_dispatch_pack8(bucket, jobs):
    """Asynchronous launch of up to GROUP jobs of one bucket through the
    sublane-packed fill + traceback. Returns a handle for gotoh_fetch."""
    (W, num_diags, lane_is_i, swp, npw) = bucket
    a_all = np.full((GROUP, W), -1, np.int32)
    b_all = np.full((GROUP, 2 * W + num_diags + 128), -2, np.int32)
    par = np.zeros((GROUP, 16), np.int32)
    V1s = np.zeros(GROUP, np.int32)
    V2s = np.zeros(GROUP, np.int32)
    for k, (s1, s2, _swp, p) in enumerate(jobs):
        s1 = np.asarray(s1, dtype=np.int32)
        s2 = np.asarray(s2, dtype=np.int32)
        _build_skew_inputs_packed(s1, s2, lane_is_i, W, num_diags,
                                  a_all[k], b_all[k])
        par[k, :4 + 2 * npw] = [len(s1), len(s2), p.match, p.mismatch,
                                *p.gap_open, *p.gap_extend]
        V1s[k], V2s[k] = len(s1), len(s2)
    bp, scores = gotoh_fill_pallas_pack8(
        jnp.asarray(par), jnp.asarray(a_all), jnp.asarray(b_all),
        num_diags, W, lane_is_i, npw, swp)
    packed = _traceback_pack8_on_device(
        bp, scores, jnp.asarray(V1s), jnp.asarray(V2s),
        lane_is_i, npw, num_diags)
    return packed, len(jobs)


def gotoh_dispatch_packmulti(bucket, jobs):
    """Asynchronous launch of MANY jobs of one bucket through the
    multi-group packed fill (one pallas_call for ceil(n/8) groups) +
    vmapped traceback. Returns the same (packed, n) handle contract as
    gotoh_dispatch_pack8 (rows in job order)."""
    (W, num_diags, lane_is_i, swp, npw) = bucket
    n = len(jobs)
    ngroups = _pow2_bucket(-(-n // GROUP), 1)
    a_all = np.full((ngroups * GROUP, W), -1, np.int32)
    b_all = np.full((ngroups * GROUP, 2 * W + num_diags + 128), -2,
                    np.int32)
    par = np.zeros((ngroups * GROUP, 16), np.int32)
    V1s = np.zeros(ngroups * GROUP, np.int32)
    V2s = np.zeros(ngroups * GROUP, np.int32)
    for k, (s1, s2, _swp, p) in enumerate(jobs):
        s1 = np.asarray(s1, dtype=np.int32)
        s2 = np.asarray(s2, dtype=np.int32)
        _build_skew_inputs_packed(s1, s2, lane_is_i, W, num_diags,
                                  a_all[k], b_all[k])
        par[k, :4 + 2 * npw] = [len(s1), len(s2), p.match, p.mismatch,
                                *p.gap_open, *p.gap_extend]
        V1s[k], V2s[k] = len(s1), len(s2)
    bp, scores = gotoh_fill_pallas_packmulti(
        jnp.asarray(par), jnp.asarray(a_all), jnp.asarray(b_all),
        num_diags, W, lane_is_i, npw, swp, ngroups)
    tb = functools.partial(_traceback_pack8_on_device,
                           lane_is_i=lane_is_i, npw=npw, cap=num_diags)
    packed = jax.vmap(tb)(bp, scores,
                          jnp.asarray(V1s.reshape(ngroups, GROUP)),
                          jnp.asarray(V2s.reshape(ngroups, GROUP)))
    packed = packed.reshape(ngroups * GROUP, *packed.shape[2:])
    return packed, n


# The row-per-problem kernel wastes 7 of every 8 sublanes but pays for a
# problem's exact row count; the sublane-packed kernel fills all 8 sublanes
# but always computes 8 rows. Packing wins whenever the group has >1 job or
# the fill is small; huge singleton fills keep the row-per-problem path.
PACK8_MAX_W = 4096

# one multi-group launch's backpointer stream is capped at ~2 GB of HBM;
# within that, up to 64 groups (512 jobs) amortize a single dispatch
PACKMULTI_MAX_BP_BYTES = 2 << 30
PACKMULTI_MAX_GROUPS = 64


def _job_bucket(job):
    """Compile-bucket key for one (s1, s2, swap_pref, params) job."""
    s1, s2, swp, p = job
    V1, V2 = len(s1), len(s2)
    lane_is_i = V1 <= V2
    W = _pow2_bucket((V1 if lane_is_i else V2) + 1, 128)
    num_diags = _pow2_bucket(V1 + V2 + 1, CHUNK * 2)
    return (W, num_diags, lane_is_i, bool(swp), p.num_pw)


def gotoh_dispatch(bucket, jobs):
    """Launch fill + on-device traceback for one bucket group of jobs
    (same compile bucket) WITHOUT waiting: jax dispatch is asynchronous, so
    this returns a device-array handle immediately and the chip crunches
    while the host goes on aligning small gaps natively. `gotoh_fetch`
    blocks on the handle and unpacks per-job results."""
    from .gotoh import _build_skew_inputs

    (W, num_diags, lane_is_i, swp, npw) = bucket
    # even a big singleton rides the packed kernel: the 7 dead sublane rows
    # cost device time that overlaps host work anyway, and the packed
    # streamed-scan traceback is ~4x faster than the row-kernel's
    # pointer-chase walk
    if W <= PACK8_MAX_W:
        import os
        from .. import metrics
        per_group_bp = num_diags * GROUP * W * 4
        launch_groups = max(1, min(PACKMULTI_MAX_GROUPS,
                                   PACKMULTI_MAX_BP_BYTES // per_group_bp))
        # multi-group launches default ON — validated on-chip (80 mixed
        # small jobs, 2 buckets: bit-identical to the lax.scan oracle,
        # 153 ms vs 376 ms for one-group-per-launch); "0" forces the
        # round-3 one-group-per-launch behavior
        if os.environ.get("CENTROLIGN_TPU_PACKMULTI", "1") == "0":
            launch_groups = 1
        per_launch = launch_groups * GROUP
        handles = []
        for g in range(0, len(jobs), per_launch):
            group = jobs[g:g + per_launch]
            t0 = metrics.timer() if metrics._INSTRUMENT else 0.0
            if len(group) <= GROUP:
                h = gotoh_dispatch_pack8(bucket, group)
            else:
                h = gotoh_dispatch_packmulti(bucket, group)
            if metrics._INSTRUMENT:
                # per-launch device rate (VERDICT r2 #3): synchronous
                # timing, so instrument mode trades away launch overlap
                h[0].block_until_ready()
                cells = sum((len(s1) + 1) * (len(s2) + 1)
                            for s1, s2, _s, _p in group)
                metrics.record("pod_launch", cells, metrics.timer() - t0,
                               f"W={W} D={num_diags} n={len(group)}")
            handles.append(h)
        return ("pack8", handles)
    B = _pow2_bucket(len(jobs), 1)
    a_all = np.empty((B, W), np.int32)
    b_all = np.empty((B, 2 * W + num_diags + 128), np.int32)
    scal = np.empty((B, 4 + 2 * npw), np.int32)
    V1s = np.empty(B, np.int32)
    V2s = np.empty(B, np.int32)
    for k in range(B):
        s1, s2, _, p = jobs[min(k, len(jobs) - 1)]
        s1 = np.asarray(s1, dtype=np.int32)
        s2 = np.asarray(s2, dtype=np.int32)
        a_all[k], b_all[k] = _build_skew_inputs(
            s1, s2, lane_is_i, W, num_diags + 128)
        scal[k] = [len(s1), len(s2), p.match, p.mismatch,
                   *p.gap_open, *p.gap_extend]
        V1s[k], V2s[k] = len(s1), len(s2)
    bp, score = gotoh_fill_pallas_batch(
        jnp.asarray(scal), jnp.asarray(a_all), jnp.asarray(b_all),
        num_diags, W, lane_is_i, npw, swp)
    packed = _traceback_batch_on_device(
        bp, score, jnp.asarray(V1s), jnp.asarray(V2s),
        lane_is_i, npw, num_diags)
    return packed, len(jobs)


def gotoh_fetch(handle):
    """Block on a `gotoh_dispatch` handle; returns the per-job list of
    (alignment (L,2) int64, score int)."""
    if isinstance(handle, tuple) and handle[0] == "pack8":
        results = []
        for sub in handle[1]:
            results.extend(gotoh_fetch(sub))
        return results
    packed, n = handle
    packed = np.asarray(jax.device_get(packed), dtype=np.int64)
    results = []
    for k in range(n):
        row = packed[k]
        count, sc = int(row[0, 0]), int(row[0, 1])
        results.append((row[len(row) - count:], sc))
    return results


def gotoh_align_pallas_batched(jobs):
    """jobs: list of (seq1 int32[], seq2 int32[], swap_pref bool, params).
    Returns a list of (alignment (L,2) int64, score int) — identical per-job
    results to gotoh_align_pallas_device_tb, but grouped into a handful of
    launches. Jobs are grouped by (shape bucket, num_pw), so gaps with
    truncated piecewise-affine parameters batch alongside full-parameter
    ones instead of falling off the chain kernel.

    On non-TPU backends (CPU tests / the virtual mesh) the Pallas fill is
    replaced by the bit-identical lax.scan fill (ops.gotoh), so the whole
    device dispatch path is exercisable without a chip."""
    if jax.default_backend() not in ("tpu", "axon"):
        from .gotoh import gotoh_align
        return [gotoh_align(s1, s2, p, swap_pref=swp)
                for s1, s2, swp, p in jobs]

    groups = {}
    for slot, job in enumerate(jobs):
        groups.setdefault(_job_bucket(job), []).append(slot)

    results = [None] * len(jobs)
    # dispatch every bucket before fetching any: the chip pipelines the
    # launches while the host builds the next bucket's arrays
    handles = [(slots, gotoh_dispatch(bucket, [jobs[s] for s in slots]))
               for bucket, slots in groups.items()]
    for slots, handle in handles:
        for slot, res in zip(slots, gotoh_fetch(handle)):
            results[slot] = res
    return results
