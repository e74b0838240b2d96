"""Exact backpointer tie resolution for the CDQ affine chain engine.

The CDQ value engine (native/chain_affine_cdq.cpp) computes bit-identical
DP values but flags query results where several predecessors attain the
same f32 range max. The reference resolves such ties by the traversal
order of its search trees (MaxSearchTree / OrthogonalMaxSearchTree,
reference max_search_tree.hpp:361-445, orthogonal_max_search_tree.hpp:
343-545); this module replicates that walk on the static Eytzinger layouts
without building the trees — it is only invoked for the (rare) tied steps
on the traceback path.

Resolution status: not yet implemented — `resolve_affine_tie` returns
None, which makes the anchorer fall back to the native tree engine for the
whole subproblem (always correct, just slower). The walk replica lands
once tie frequency on real inputs justifies it.
"""

from __future__ import annotations


def resolve_affine_tie(anchor, ps1, pe1, ps2, pe2, dp, init, go, ge, scale,
                       struct, stored):
    """Return the exact tree-order predecessor of `anchor`, or None if the
    walk replica cannot resolve it (caller falls back to the tree engine)."""
    return None
