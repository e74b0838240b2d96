"""Core graph algorithms over BaseGraph, vectorized with numpy.

Equivalents of the reference's header-only algorithms (reference
include/centrolign/topological_order.hpp:12, count_walks.hpp,
minmax_distance.hpp, ...), reformulated as frontier-parallel numpy sweeps so
they stay fast on chain-heavy megabase graphs and so their outputs (orders,
levels) are directly consumable by device kernels.
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64


def topological_order(graph) -> np.ndarray:
    """Kahn's algorithm, processed frontier-at-a-time.

    Returns a valid topological order. DP results over the graph depend only
    on its topological validity, not on the specific order (the reference's
    order is a stack-based variant; see topological_order.hpp:12).
    """
    V = graph.node_size
    if V == 0:
        return np.empty(0, dtype=_I64)
    indptr, indices = graph.next_csr()
    indeg = graph.in_degrees().copy()
    order = np.empty(V, dtype=_I64)
    frontier = np.flatnonzero(indeg == 0)
    pos = 0
    while len(frontier):
        order[pos : pos + len(frontier)] = frontier
        pos += len(frontier)
        # gather all out-edges of the frontier
        starts, ends = indptr[frontier], indptr[frontier + 1]
        total = (ends - starts).sum()
        if total == 0:
            frontier = np.empty(0, dtype=_I64)
            continue
        targets = indices[_multi_range(starts, ends)]
        dec = np.bincount(targets, minlength=V)
        indeg -= dec
        frontier = np.flatnonzero((indeg == 0) & (dec > 0))
    if pos != V:
        raise ValueError("graph contains a cycle")
    return order


def reference_topological_order(graph) -> np.ndarray:
    """Kahn's algorithm with a LIFO stack, reproducing the reference's exact
    node order (reference topological_order.hpp:12-60): initial sources pushed
    in ascending id order, successors pushed in adjacency order; the stack is
    popped from the back. Use this wherever downstream behavior depends on the
    specific order (path projection, tie-breaking); use topological_order for
    plain DP sweeps."""
    V = graph.node_size
    indeg = graph.in_degrees().copy()
    indptr, indices = graph.next_csr()
    # single-source unary chains have a unique topological order; the
    # vectorized sweep is then exact and much faster
    if (V and (np.diff(indptr) <= 1).all() and (indeg <= 1).all()
            and int((indeg == 0).sum()) == 1):
        return topological_order(graph)
    stack = list(np.flatnonzero(indeg == 0))
    order = np.empty(V, dtype=_I64)
    pos = 0
    while stack:
        v = stack.pop()
        order[pos] = v
        pos += 1
        for w in indices[indptr[v]:indptr[v + 1]]:
            indeg[w] -= 1
            if indeg[w] == 0:
                stack.append(int(w))
    if pos != V:
        raise ValueError("graph contains a cycle")
    return order


def topological_levels(graph) -> np.ndarray:
    """Longest-path depth of each node (level(v) > level(u) for every edge
    u->v). Nodes at equal level are mutually unreachable, which makes levels
    the wavefront index for anti-diagonal DP kernels."""
    V = graph.node_size
    indptr, indices = graph.next_csr()
    indeg = graph.in_degrees().copy()
    level = np.zeros(V, dtype=_I64)
    frontier = np.flatnonzero(indeg == 0)
    depth = 0
    while len(frontier):
        level[frontier] = depth
        starts, ends = indptr[frontier], indptr[frontier + 1]
        if (ends - starts).sum() == 0:
            break
        targets = indices[_multi_range(starts, ends)]
        dec = np.bincount(targets, minlength=V)
        indeg -= dec
        frontier = np.flatnonzero((indeg == 0) & (dec > 0))
        depth += 1
    return level


def _multi_range(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], ends[i]) for all i, vectorized."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=_I64)
    nz = lens > 0
    s, l = starts[nz], lens[nz]
    out = np.ones(total, dtype=_I64)
    offsets = np.cumsum(l)[:-1]
    out[0] = s[0]
    if len(s) > 1:
        out[offsets] = s[1:] - (s[:-1] + l[:-1] - 1)
    return np.cumsum(out)


def is_acyclic(graph) -> bool:
    try:
        topological_order(graph)
        return True
    except ValueError:
        return False


def is_reachable(graph, from_id: int, to_id: int) -> bool:
    """BFS reachability (test oracle; production uses XMerge tables)."""
    V = graph.node_size
    seen = np.zeros(V, dtype=bool)
    frontier = np.array([from_id], dtype=_I64)
    seen[from_id] = True
    indptr, indices = graph.next_csr()
    while len(frontier):
        if seen[to_id]:
            return True
        starts, ends = indptr[frontier], indptr[frontier + 1]
        targets = indices[_multi_range(starts, ends)]
        targets = np.unique(targets[~seen[targets]])
        seen[targets] = True
        frontier = targets
    return bool(seen[to_id])


def connected_components(graph) -> list[np.ndarray]:
    """Weakly connected components via label propagation."""
    V = graph.node_size
    if V == 0:
        return []
    ef, et = graph.edges()
    comp = np.arange(V, dtype=_I64)
    # iterate min-label propagation until fixpoint (few rounds in practice
    # thanks to path-halving style jumps)
    while True:
        changed = False
        if len(ef):
            lo = np.minimum(comp[ef], comp[et])
            new = comp.copy()
            np.minimum.at(new, ef, lo)
            np.minimum.at(new, et, lo)
            if not np.array_equal(new, comp):
                comp = new
                changed = True
        # pointer jumping
        jumped = comp[comp]
        if not np.array_equal(jumped, comp):
            comp = jumped
            changed = True
        if not changed:
            break
    groups: dict[int, list[int]] = {}
    roots, inverse = np.unique(comp, return_inverse=True)
    out = [np.flatnonzero(inverse == i) for i in range(len(roots))]
    return out


def antichain_partition(graph) -> np.ndarray:
    """Partition nodes into antichains = the topological levels."""
    return topological_levels(graph)


def count_walks(graph, saturate_at: int = np.iinfo(np.int64).max // 4) -> np.ndarray:
    """Number of source-to-node walks per node, saturating."""
    order = topological_order(graph)
    V = graph.node_size
    counts = np.zeros(V, dtype=np.float64)
    indeg = graph.in_degrees()
    counts[indeg == 0] = 1.0
    indptr, indices = graph.prev_csr()
    for v in order:
        ps = indices[indptr[v] : indptr[v + 1]]
        if len(ps):
            counts[v] = min(float(saturate_at), counts[ps].sum())
    return counts


def shortest_path(graph, from_id: int, to_id: int) -> np.ndarray:
    """A shortest (fewest-nodes) path from from_id to to_id, or empty."""
    V = graph.node_size
    parent = np.full(V, -2, dtype=_I64)
    parent[from_id] = -1
    frontier = np.array([from_id], dtype=_I64)
    indptr, indices = graph.next_csr()
    while len(frontier) and parent[to_id] == -2:
        starts, ends = indptr[frontier], indptr[frontier + 1]
        idx = _multi_range(starts, ends)
        targets = indices[idx]
        srcs = np.repeat(frontier, (ends - starts))
        fresh = parent[targets] == -2
        targets, srcs = targets[fresh], srcs[fresh]
        targets, first = np.unique(targets, return_index=True)
        parent[targets] = srcs[first]
        frontier = targets
    if parent[to_id] == -2:
        return np.empty(0, dtype=_I64)
    path = [to_id]
    while path[-1] != from_id:
        path.append(int(parent[path[-1]]))
    return np.array(path[::-1], dtype=_I64)


def minmax_distance(graph, sources=None):
    """(min, max) walk distance (in nodes) from any source to each node.

    Unreachable nodes get (-1, -1). Mirrors reference minmax_distance.hpp.
    """
    V = graph.node_size
    order = topological_order(graph)
    mind = np.full(V, np.iinfo(np.int64).max, dtype=_I64)
    maxd = np.full(V, np.iinfo(np.int64).min, dtype=_I64)
    if sources is None:
        sources = np.flatnonzero(graph.in_degrees() == 0)
    mind[sources] = 0
    maxd[sources] = 0
    indptr, indices = graph.prev_csr()
    for v in order:
        ps = indices[indptr[v] : indptr[v + 1]]
        if len(ps):
            reach = maxd[ps] != np.iinfo(np.int64).min
            if reach.any():
                mind[v] = min(mind[v], mind[ps[reach]].min() + 1)
                maxd[v] = max(maxd[v], maxd[ps[reach]].max() + 1)
    unreach = maxd == np.iinfo(np.int64).min
    mind[unreach] = -1
    maxd[unreach] = -1
    return mind, maxd
