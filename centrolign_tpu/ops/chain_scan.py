"""Device formulation of free-gap sparse chaining on chain graphs.

The reference's sparse_chain_dp (anchorer.hpp:1511-1750) sweeps graph1 in
topological order, maintaining one max-search tree per (path1, path2) pair
keyed by (index-on-path2 of the anchor's end, match id): anchor ends insert
their DP value, anchor starts query the prefix of path2 positions strictly
before their own. On single-path (chain) graphs — every calibration
workload, and any gap subgraph that is a chain — there is exactly one tree
and the whole sweep linearizes into an EVENT SCAN:

    for each position p of chain1, in order:
        ends at p:    val[slot(id)] = dp[id]          (insert)
        starts with predecessor p:
                      dp[id] = max(w[id], max(val[slot : idx2 <= pred2])
                                          + w[id])    (query)

which is exactly a `lax.scan` over events with a dense value table as the
carry: inserts are one-hot scatters, queries are masked max-reductions over
the table — no search tree, no pointers, pure VPU work. DP values are IEEE
f32 adds in the reference's own order, so scores are bit-identical to the
native engine. Backpointer TIES (two predecessors attaining the exact same
f32 prefix max) resolve leftmost-in-key-order here, whereas the reference's
search tree resolves them by traversal/insert history; on the calibration
workload (self-matches) outputs are identical — the oracle test asserts
exact identity there and co-optimality (bit-equal scores, valid chains) on
general workloads where such ties occur.

This is the "per-topological-level batched update/query" realization that
SURVEY §7.3 names as the search-tree replacement (primary compute target
#1). The affine variant adds the shift dimension (6 value channels and a
2-D dominance query) on the same event-scan skeleton.

Used by Anchorer._chain_parity when CENTROLIGN_TPU_DEVICE_CHAIN=1 and both
graphs are single-path; validated against the native parity engine in
tests/test_chain_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..device import configure_compile_cache

configure_compile_cache()
import numpy as np

_NEGF = np.float32(np.finfo(np.float32).min)


@functools.partial(jax.jit, static_argnames=())
def _event_scan(kind, slot, qhi, weight, dp0):
    """kind (E,) int32: 0 = query, 1 = insert; slot (E,) int32: the value-
    table slot of this event's anchor (key-sorted by (idx2, id)); qhi (E,)
    int32: exclusive slot bound of a query's key range; weight (E,) f32;
    dp0 (n,) f32 initial DP (anchor weight, MININF-gated).

    Returns (dp (n,) f32, winner (E,) int32 slot of each query's argmax or
    -1). Events must be ordered: position-major, inserts before queries at
    the same position exactly as the reference sweep interleaves them.
    """
    n = dp0.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(state, ev):
        dp, val = state
        k, s, hi, w = ev
        # query: best value among inserted slots with slot < hi
        masked = jnp.where(iota < hi, val, _NEGF)
        best = jnp.max(masked, initial=_NEGF)
        win = jnp.argmax(masked)  # leftmost max in key order
        has = best > _NEGF
        cand = best + w
        q_dp = jnp.where(has & (cand > dp[s]), cand, dp[s])
        q_win = jnp.where(has & (cand > dp[s]), win.astype(jnp.int32),
                          jnp.int32(-1))
        # insert: publish this anchor's (final) dp value at its slot
        new_dp = jnp.where(k == 0, q_dp, dp[s])
        dp = dp.at[s].set(new_dp)
        val = jnp.where(k == 1, val.at[s].set(dp[s]), val)
        return (dp, val), jnp.where(k == 0, q_win, jnp.int32(-1))

    val0 = jnp.full((n,), _NEGF, jnp.float32)
    (dp, _val), winners = jax.lax.scan(
        step, (dp0, val0), (kind, slot, qhi, weight))
    return dp, winners


# ---------------------------------------------------------------------------
# Exact tie resolution. DP VALUES are winner-independent, but when several
# predecessors attain the same f32 prefix max, the reference's MaxSearchTree
# picks a history-dependent winner: its range_max visits the Eytzinger tree
# in a fixed order keeping the FIRST max (strict >), and each subtree's
# cached submax identity is the FIRST-INSERTED among its equal maxima
# (updates use strict > too). Both rules are pure rank arithmetic — the
# tree's in-order rank of a heap node and each subtree's rank interval —
# so the winner can be computed WITHOUT building the tree, in O(log^2 n)
# per tied query.


def _subtree_interval(x, n):
    """In-order rank interval [lo, hi) of heap node x in a complete binary
    tree of n nodes (Eytzinger layout), plus x's own rank."""
    lo, hi = 0, n
    path = []
    y = x + 1
    while y > 1:
        path.append(y & 1)  # 0 = left child, 1 = right child
        y >>= 1
    for bit in reversed(path):
        root = _heap_rank(lo, hi)
        if bit == 0:
            hi = root
        else:
            lo = root + 1
    return lo, hi, _heap_rank(lo, hi)


def _heap_rank(lo, hi):
    """In-order rank of the root of the heap-layout subtree spanning ranks
    [lo, hi): lo + size of its left heap subtree."""
    m = hi - lo
    if m <= 0:
        return lo
    # left subtree size of a complete tree with m nodes
    h = m.bit_length() - 1          # full levels below root exist for 2^h-1
    full = (1 << h) - 1             # nodes in a perfect tree of height h-1
    last = m - full                 # nodes on the bottom level
    left_last = min(last, (full + 1) // 2)
    left = (full - 1) // 2 + left_last if h > 0 else 0
    return lo + left


def _tree_tie_winner(n, qhi, tied_slots, insert_rank):
    """The native MaxTreeP.range_max winner over prefix range [0, qhi) when
    `tied_slots` (sorted in-order ranks) all hold the range-max value.
    insert_rank[slot] orders equal-value submax adoption (first wins)."""
    tied = np.asarray(tied_slots)

    def subtree_candidate(x):
        lo, hi, _r = _subtree_interval(x, n)
        inside = tied[(tied >= lo) & (tied < hi)]
        if len(inside) == 0:
            return None
        return int(inside[np.argmin(insert_rank[inside])])

    def rank_of(x):
        return _subtree_interval(x, n)[2]

    # descend to the top of the range decomposition (lo is minimal)
    cursor = 0
    while cursor < n and rank_of(cursor) >= qhi:
        cursor = 2 * cursor + 1
    if cursor >= n:
        return None
    r = rank_of(cursor)
    if r in tied:
        return int(r)
    # left-boundary walk: whole left spine below cursor is in range
    lc = 2 * cursor + 1
    while lc < n:
        r = rank_of(lc)
        if r in tied:
            return int(r)
        rgt = 2 * lc + 2
        if rgt < n:
            cand = subtree_candidate(rgt)
            if cand is not None:
                return cand
        lc = 2 * lc + 1
    # right-boundary walk
    rc = 2 * cursor + 2
    while rc < n:
        if rank_of(rc) < qhi:
            r = rank_of(rc)
            if r in tied:
                return int(r)
            lft = 2 * rc + 1
            if lft < n:
                cand = subtree_candidate(lft)
                if cand is not None:
                    return cand
            rc = 2 * rc + 2
        else:
            rc = 2 * rc + 1
    return None


def sparse_chain_scan(starts1_pos, ends1_pos, idx2_start, idx2_end,
                      weights, reach_src, reach_snk):
    """Free-gap sparse chain DP over one (chain1, chain2) pair.

    Inputs are per-anchor numpy arrays: positions of walk endpoints on the
    two chains (graph1 topological positions / graph2 chain indices),
    f32-cast anchor weights, and boolean source/sink reachability gates
    (the reference's global-anchoring dp-init and final-term gates,
    sparse_parity_impl). Returns (order of chained anchor indices,
    opt score) — an empty chain when no positive-score chain exists.
    """
    n = len(weights)
    if n == 0:
        return [], 0.0
    w32 = np.asarray(weights, dtype=np.float32)

    # value-table slots: key-sorted by (idx2 of end, anchor id) — the
    # native tree's key order, so prefix bounds are searchsorted indices.
    # Everything below lives in SLOT space; `order` maps slot -> anchor.
    order = np.lexsort((np.arange(n), idx2_end))
    idx2_sorted = np.asarray(idx2_end, dtype=np.int64)[order]
    w_slot = w32[order]
    dp0 = np.where(np.asarray(reach_src)[order], w_slot, _NEGF
                   ).astype(np.float32)
    ends_pos = np.asarray(ends1_pos, dtype=np.int64)[order]
    pred1 = np.asarray(starts1_pos, dtype=np.int64)[order] - 1
    pred2 = np.asarray(idx2_start, dtype=np.int64)[order] - 1
    has_query = pred1 >= 0
    qhi = np.searchsorted(idx2_sorted, pred2, side="right").astype(np.int32)

    # events: position-major over chain1; inserts (at end position) and
    # queries (at start's predecessor position) interleave exactly as the
    # reference sweep visits them: per node, ends first, then starts
    slots = np.arange(n, dtype=np.int32)
    ev_pos = np.concatenate([ends_pos, np.where(has_query, pred1, -1)])
    ev_kind = np.concatenate([np.ones(n, np.int32), np.zeros(n, np.int32)])
    ev_slot = np.concatenate([slots, slots])
    ev_qhi = np.concatenate([np.zeros(n, np.int32), qhi])
    ev_w = np.concatenate([w_slot, w_slot])
    keep = np.concatenate([np.ones(n, bool), has_query])
    ev_pos, ev_kind, ev_slot, ev_qhi, ev_w = (
        a[keep] for a in (ev_pos, ev_kind, ev_slot, ev_qhi, ev_w))
    ev_order = np.lexsort((-ev_kind, ev_pos))
    ev_kind = ev_kind[ev_order]
    ev_slot = ev_slot[ev_order]
    ev_qhi = ev_qhi[ev_order]
    ev_w = ev_w[ev_order]

    # pow2 shape buckets bound the jit compile count: pad the value table
    # with one dead slot and the event stream with no-op inserts into it
    npad = 1
    while npad < n + 1:
        npad *= 2
    E = len(ev_kind)
    epad = 1
    while epad < max(E, 1):
        epad *= 2
    dp0 = np.concatenate([dp0, np.full(npad - n, _NEGF, np.float32)])
    pad = epad - E
    ev_kind = np.concatenate([ev_kind, np.ones(pad, np.int32)])
    ev_slot = np.concatenate([ev_slot, np.full(pad, n, np.int32)])
    ev_qhi = np.concatenate([ev_qhi, np.zeros(pad, np.int32)])
    ev_w = np.concatenate([ev_w, np.zeros(pad, np.float32)])

    dp, winners = _event_scan(
        jnp.asarray(ev_kind), jnp.asarray(ev_slot), jnp.asarray(ev_qhi),
        jnp.asarray(ev_w), jnp.asarray(dp0))
    dp = np.asarray(jax.device_get(dp))[:n]
    winners = np.asarray(jax.device_get(winners))[:E]

    # backpointers (slot -> slot) from the query winners
    bp = np.full(n, -1, dtype=np.int64)
    q_mask = ev_kind[:E] == 0
    got = winners[q_mask] >= 0
    bp[ev_slot[:E][q_mask][got]] = winners[q_mask][got]

    # native insert order (for exact tie resolution): ends by position,
    # bank (anchor) order within a position
    insert_rank = np.empty(n, dtype=np.int64)
    ir_anchor = np.empty(n, dtype=np.int64)
    ir_anchor[np.lexsort((np.arange(n), np.asarray(ends1_pos)))] = \
        np.arange(n)
    slot_lookup = np.empty(n, dtype=np.int64)
    slot_lookup[order] = np.arange(n)
    insert_rank[slot_lookup] = ir_anchor

    starts_pos = np.asarray(starts1_pos, dtype=np.int64)[order]

    def exact_winner(j):
        """Slot of the native tree's winner for chained slot j (bp[j] when
        the prefix max is unique; the visit/insert-order tie winner when
        several predecessors attain it)."""
        w = int(bp[j])
        if w < 0:
            return -1
        best = dp[w]
        visible = (ends_pos < starts_pos[j]) & \
                  (np.arange(n) < qhi[j]) & (dp == best)
        tied = np.flatnonzero(visible)
        if len(tied) <= 1:
            return w
        win = _tree_tie_winner(n, int(qhi[j]), tied, insert_rank)
        return w if win is None else win

    # traceback (reference traceback_sparse_dp): opt over sink-reachable
    # anchors with dp > 0
    final = np.where(np.asarray(reach_snk)[order], dp, _NEGF)
    if not len(final) or final.max() <= 0.0:
        return [], 0.0
    # opt tie rule: the native loop keeps the FIRST max in anchor order
    final_anchor = np.empty(n, dtype=np.float32)
    final_anchor[order] = final
    slot_of = np.empty(n, dtype=np.int64)
    slot_of[order] = np.arange(n)
    opt = int(slot_of[np.argmax(final_anchor)])
    chain = []
    at = opt
    while at != -1:
        chain.append(int(order[at]))
        at = exact_winner(at)
    chain.reverse()
    return chain, float(final[opt])
