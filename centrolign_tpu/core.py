"""Top-level orchestrator: owns the pipeline stages and drives the
progressive alignment (reference core.hpp:30, src/core.cpp).

Pipeline per pairwise subproblem (reference core.hpp:256-403):
sentinel reassignment -> match finding -> PathMerge reachability ->
anchor chain -> partition -> despecify -> stitch -> fuse.

Calibration (reference src/core.cpp:96-194): per leaf, self-matches are
subset to the diagonal, a gap-free chain is computed, and the score scale is
the mean of the per-leaf (weight / anchored length) ratios.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from . import logging as logmod
from .anchorer import Anchorer, ChainAlgorithm
from .alignment import fuse, cigar as cigar_of
from .execution import Execution, Subproblem
from .match_finder import find_matches, MatchSet
from .modify_graph import SentinelTableau, reassign_sentinels
from .partitioner import Partitioner
from .path_merge import PathMerge
from .score_function import ScoreFunction
from .stitcher import Stitcher
from .tree import Tree
from .io.gfa import write_gfa, read_gfa
from .modify_graph import add_sentinels


class Core:
    def __init__(self, names_and_sequences, tree: Tree):
        self.score_function = ScoreFunction()
        self.anchorer = Anchorer(score_function=self.score_function)
        self.partitioner = Partitioner(score_function=self.score_function)
        self.stitcher = Stitcher()
        self.main_execution = Execution(names_and_sequences, tree)

        # params pushed in by config (reference parameters.cpp apply())
        self.max_count = 3000
        self.skip_calibration = False
        self.preserve_subproblems = False
        self.cyclize_tandem_duplications = False
        self.subproblems_prefix = ""
        self.subalignments_filepath = ""
        self.induced_pairwise_prefix = ""
        self.bonds_prefix = ""
        self.memory_restraint_size = 1 << 30
        self.threads = 1

    # ------------------------------------------------------------------

    def execute(self) -> None:
        if not self.skip_calibration or self.cyclize_tandem_duplications:
            self.calibrate_anchor_scores()
        logmod.log(logmod.Minimal, "Beginning MSA.")
        self.do_execution(self.main_execution, is_main_execution=True)
        if self.induced_pairwise_prefix:
            self.output_pairwise_alignments(False)
        if self.cyclize_tandem_duplications:
            raise NotImplementedError(
                "cyclic tandem-duplication mode (-c) is not implemented yet")

    def calibrate_anchor_scores(self) -> None:
        """(reference src/core.cpp:96-194, calibration part only)"""
        logmod.log(logmod.Basic, "Calibrating scale of anchoring parameters.")
        scales = []
        for i, sub in enumerate(self.main_execution.leaf_subproblems()):
            logmod.log(logmod.Verbose,
                       f"Estimating scale for sequence {i + 1}.")
            reassign_sentinels(sub.graph, sub.tableau, 5, 6)
            dummy = SentinelTableau(
                src_id=sub.tableau.src_id, snk_id=sub.tableau.snk_id,
                src_sentinel=7, snk_sentinel=8)
            matches = find_matches(sub.graph, sub.graph, sub.tableau, dummy,
                                   self.max_count, self.score_function)
            diagonal = []
            for ms in matches:
                for walk in ms.walks1:
                    diagonal.append(MatchSet(
                        walks1=walk[None, :], walks2=walk[None, :],
                        count1=ms.count1, count2=ms.count2,
                        full_length=ms.full_length))
            xm = PathMerge(sub.graph, sub.tableau)
            scale = self.anchorer.estimate_score_scale(
                diagonal, sub.graph, sub.graph, sub.tableau, sub.tableau,
                xm, xm)
            scales.append(scale)
            logmod.log(logmod.Debug,
                       f"Computed intrinsic scale of {scale} for sequence {sub.name}")
        if not self.skip_calibration and scales:
            self.score_function.score_scale = float(np.mean(scales))

    def do_execution(self, execution: Execution, is_main_execution: bool) -> None:
        while not execution.finished():
            parent, sub1, sub2 = execution.next()
            if parent.complete:
                logmod.log(logmod.Verbose,
                           "Problem already finished from restarted run.")
                continue
            reassign_sentinels(sub1.graph, sub1.tableau, 5, 6)
            reassign_sentinels(sub2.graph, sub2.tableau, 7, 8)
            logmod.log(logmod.Verbose, "Finding matches.")
            matches = find_matches(sub1.graph, sub2.graph,
                                   sub1.tableau, sub2.tableau,
                                   self.max_count, self.score_function)
            logmod.log(logmod.Verbose, "Computing reachability.")
            xm1 = PathMerge(sub1.graph, sub1.tableau)
            xm2 = PathMerge(sub2.graph, sub2.tableau)
            parent.alignment = self.align(matches, sub1, sub2, xm1, xm2,
                                          is_main_execution)
            if self.subalignments_filepath and is_main_execution:
                self.emit_subalignment(parent, sub1, sub2)
            logmod.log(logmod.Verbose, "Fusing MSAs along the alignment.")
            if self.preserve_subproblems:
                fused = sub1.graph.copy()
            else:
                fused = sub1.graph
            fuse(fused, sub2.graph, sub1.tableau, sub2.tableau,
                 parent.alignment)
            parent.graph = fused
            parent.tableau = sub1.tableau
            parent.complete = True
            if not self.preserve_subproblems:
                sub1.graph = None
                sub2.graph = None
            if self.subproblems_prefix and is_main_execution:
                self.emit_subproblem(parent)

    def align(self, matches, sub1: Subproblem, sub2: Subproblem, xm1, xm2,
              is_main_execution: bool) -> np.ndarray:
        """(reference core.hpp:182-254)"""
        anchors = self.anchorer.anchor_chain(
            matches, sub1.graph, sub2.graph, sub1.tableau, sub2.tableau,
            xm1, xm2)
        logmod.log(logmod.Verbose, f"Chained {len(anchors)} anchors.")
        segments = self.partitioner.partition_anchors(
            anchors, sub1.graph, sub2.graph, sub1.tableau, sub2.tableau,
            xm1, xm2, not is_main_execution)
        logmod.log(logmod.Verbose,
                   f"Partitioned into {len(segments)} alignable segments; stitching.")
        segments = [self.stitcher.despecify_indel_breakpoints(seg)
                    for seg in segments]
        return self.stitcher.stitch(
            segments, sub1.graph, sub2.graph, sub1.tableau, sub2.tableau,
            xm1, xm2)

    # ------------------------------------------------------------------

    def restart(self) -> None:
        """Reload completed subproblems from -S checkpoint GFAs
        (reference src/execution.cpp:223-279, src/core.cpp:1071-1081).
        Leaf graphs are preserved when calibration will need them."""
        preserve_leaves = self.preserve_subproblems or not self.skip_calibration
        preserve_internal = self.preserve_subproblems
        ex = self.main_execution
        tree = ex.tree
        for node_id in tree.preorder():
            sub = ex.subproblems[node_id]
            if sub.complete:
                continue
            path = self._subproblem_path(node_id)
            if os.path.exists(path):
                with open(path) as f:
                    sub.graph = read_gfa(f)
                sub.tableau = add_sentinels(sub.graph, 5, 6)
                sub.complete = True
                # mark descendants complete; drop graphs we won't need
                stack = list(tree.get_children(node_id))
                while stack:
                    v = stack.pop()
                    dsub = ex.subproblems[v]
                    dsub.complete = True
                    is_leaf = tree.is_leaf(v)
                    if not (preserve_leaves and is_leaf) and not (
                            preserve_internal and not is_leaf):
                        dsub.graph = None
                    stack.extend(tree.get_children(v))
                logmod.log(logmod.Verbose,
                           f"Restarted subproblem {os.path.basename(path)}")

    def _subproblem_path(self, node_id: int) -> str:
        h = self.main_execution.subproblem_hash(node_id)
        return f"{self.subproblems_prefix}_{h:016X}.gfa"

    def emit_subproblem(self, sub: Subproblem) -> None:
        """Write a completed subproblem as GFA + info line (reference
        src/core.cpp:397-422)."""
        node_id = self.main_execution.subproblems.index(sub)
        path = self._subproblem_path(node_id)
        with open(path, "w") as f:
            write_gfa(sub.graph, sub.tableau, f)
        info_path = f"{self.subproblems_prefix}_info.txt"
        new_file = not os.path.exists(info_path)
        with open(info_path, "a") as f:
            if new_file:
                f.write("filename\tsequences\n")
            names = ",".join(sorted(
                self.main_execution.leaf_descendents(node_id)))
            f.write(f"{path}\t{names}\n")

    def emit_subalignment(self, parent, sub1, sub2) -> None:
        with open(self.subalignments_filepath, "a") as f:
            f.write(f"## {sub1.name or 'subproblem'} vs {sub2.name or 'subproblem'}\n")
            f.write(cigar_of(parent.alignment) + "\n")

    def output_pairwise_alignments(self, cyclic: bool) -> None:
        """Induced pairwise alignments between every path pair of the root
        graph (reference src/core.cpp:524-591)."""
        from .alignment import induced_pairwise_alignment, explicit_cigar
        root = self.root_subproblem()
        g = root.graph
        for i in range(g.path_size):
            for j in range(i + 1, g.path_size):
                aln = induced_pairwise_alignment(g, i, j)
                name = (f"{self.induced_pairwise_prefix}_"
                        f"{g.path_name(i)}_{g.path_name(j)}.txt")
                with open(name, "w") as f:
                    lab1 = g.labels[g.path(i)]
                    lab2 = g.labels[g.path(j)]
                    f.write(explicit_cigar(aln, lab1, lab2) + "\n")

    # ------------------------------------------------------------------

    def root_subproblem(self) -> Subproblem:
        return self.main_execution.root_subproblem()

    def leaf_subproblem(self, name: str) -> Subproblem:
        return self.main_execution.leaf_subproblem(name)
