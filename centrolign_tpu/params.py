"""Typed parameter registry with config-file round-trip.

Mirrors the reference Parameters (reference parameters.hpp:19-66,
src/parameters.cpp:22-108): ~70 parameters in 7 submodules with defaults,
help text, validation, and apply(Core&). The config format is a simple
YAML-ish document, round-trippable via generate_config()/parse_config().
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

SUBMODULES = [
    ("IO", "Parameters related to file I/O and logging"),
    ("MatchFinding", "Parameters related to identifying matches between graphs"),
    ("Anchoring", "Parameters related to identifying high-scoring chains of matches to anchor alignments"),
    ("IdentifyingAlignability", "Parameters related to determining whether a graph region is alignable"),
    ("Aligning", "Parameters related to constructing a base-level alignment"),
    ("InducingCycles", "Parameters related to inducing cycles at tandem duplications"),
    ("DeveloperTools", "Parameters that were designed only to facilitate software development"),
]


@dataclass
class Param:
    submodule: str
    name: str
    type: str  # Integer | Bool | Double | String | Enum | DoubleArray3 | IntegerArray3
    default: Any
    help: str
    value: Any = None

    def get(self):
        return self.default if self.value is None else self.value


_REGISTRY = [
    ("IO", "fasta_name", "String", "", "The path to a FASTA file containing all of input sequences"),
    ("IO", "tree_name", "String", "", "The path to a guide tree for the alignment in Newick format"),
    ("IO", "logging_level", "Enum", 2, "The level of verbosity of logging to stderr (0-4)"),
    ("IO", "subproblems_prefix", "String", "", "If provided, save intermediate subproblems as GFA files with this prefix"),
    ("IO", "restart", "Bool", False, "Attempt to restart using saved partial results from 'subproblems_prefix'"),
    ("IO", "all_pairs_prefix", "String", "", "If provided, save induced pairwise alignments in CIGAR format with this prefix"),
    ("IO", "subalignments_filepath", "String", "", "If provided, save the path-to-path alignment from each subproblem"),
    ("IO", "threads", "Integer", 1, "The number of threads to use in parallel portions of the algorithm"),
    ("MatchFinding", "max_count", "Integer", 3000, "Only query matches that occur at most this many times"),
    ("MatchFinding", "use_color_set_size", "Bool", True, "Use color set size index instead of a merge sort tree"),
    ("Anchoring", "max_num_match_pairs", "Integer", 1250000, "The maximum number of matches considered during chaining"),
    ("Anchoring", "memory_restraint_size", "Integer", 1 << 30, "Switch to memory-efficient structures at this size"),
    ("Anchoring", "split_matches_at_branchpoints", "Bool", True, "Split anchors at forking paths to avoid reachability artifacts"),
    ("Anchoring", "anchor_split_limit", "Integer", 5, "How close to the end of the anchor a split must be"),
    ("Anchoring", "min_split_length", "Integer", 128, "Only split anchors at least this long"),
    ("Anchoring", "min_path_length_spread", "Integer", 50, "Only split anchors at forks whose paths differ by this much"),
    ("Anchoring", "max_split_match_set_size", "Integer", 16, "Only split anchors with at most this many matching sequences"),
    ("Anchoring", "chaining_algorithm", "Enum", 2, "0 exhaustive, 1 sparse, 2 sparse affine"),
    ("Anchoring", "anchor_gap_open", "DoubleArray3", (1.25, 50.0, 5000.0), "Anchoring affine gap open penalties"),
    ("Anchoring", "anchor_gap_extend", "DoubleArray3", (2.5, 0.1, 0.0015), "Anchoring affine gap extend penalties"),
    ("Anchoring", "anchor_score_function", "Enum", 2, "Anchor scoring function (0-3)"),
    ("Anchoring", "pair_count_power", "Double", 0.5, "Power applied to the count in the anchor score denominator"),
    ("Anchoring", "length_intercept", "Double", 2250.0, "Longest possible positively-scoring match"),
    ("Anchoring", "length_decay_power", "Double", 2.0, "Power of the subtracted monomial"),
    ("Anchoring", "global_anchoring", "Bool", True, "Identify chains that cover the whole sequence"),
    ("Anchoring", "do_fill_in_anchoring", "Bool", True, "Fill in gaps in the anchor chain with unused matches"),
    ("IdentifyingAlignability", "constraint_method", "Enum", 3, "0 Null, 1 Unconstrained, 2 MinAverage, 3 MinWindowAverage"),
    ("IdentifyingAlignability", "minimum_segment_score", "Double", 15000.0, "The minimum total score of an alignable segment"),
    ("IdentifyingAlignability", "minimum_segment_average", "Double", 0.1, "The minimum average score of an alignable segment"),
    ("IdentifyingAlignability", "window_length", "Double", 10000.0, "The length of the window for the windowed average"),
    ("IdentifyingAlignability", "generalized_length_mean", "Double", -0.5, "Holder mean parameter for combining lengths"),
    ("IdentifyingAlignability", "boundary_score_factor", "Double", 0.95, "Boundary score proportion for realignment"),
    ("Aligning", "stitch_match", "Integer", 20, "Match value when stitching"),
    ("Aligning", "stitch_mismatch", "Integer", 80, "Mismatch penalty when stitching"),
    ("Aligning", "stitch_gap_open", "IntegerArray3", (60, 800, 2500), "Stitching gap open penalties"),
    ("Aligning", "stitch_gap_extend", "IntegerArray3", (30, 5, 1), "Stitching gap extend penalties"),
    ("Aligning", "max_trivial_size", "Integer", 30000, "Max DP matrix size always aligned even if unalignable"),
    ("Aligning", "min_wfa_size", "Integer", 40000000, "Min DP matrix size for graph-graph WFA"),
    ("Aligning", "max_wfa_size", "Integer", 75000000, "Max DP matrix size for graph-graph WFA"),
    ("Aligning", "max_wfa_ratio", "Double", 1.05, "Max long-to-short ratio for WFA"),
    ("Aligning", "wfa_pruning_dist", "Integer", 25, "Lagging distance for WFA pruning"),
    ("Aligning", "deletion_alignment_ratio", "Integer", 8, "Min long-to-short ratio for deletion alignment"),
    ("Aligning", "deletion_alignment_short_max_size", "Integer", 1500, "Max short side for deletion alignment"),
    ("Aligning", "deletion_alignment_long_min_size", "Integer", 2000, "Min long side for deletion alignment"),
    ("Aligning", "indel_fuzz_score_proportion", "Double", 0.001, "Score proportion for indel despecification"),
    ("Aligning", "min_indel_fuzz_length", "Integer", 50, "Minimum indel length for despecification"),
    ("InducingCycles", "cyclize_tandem_duplications", "Bool", False, "Identify tandem duplications and induce cycles"),
    ("InducingCycles", "max_tandem_duplication_search_rounds", "Integer", 3, "Max nested tandem duplication rounds"),
    ("InducingCycles", "min_cyclizing_length", "Integer", 100000, "Minimum size of a tandem duplication"),
    ("InducingCycles", "max_tandem_duplication_search_rounds", "Integer", 3, "The maximum number of nested tandem duplications to attempt finding for any given subsequence"),
    ("InducingCycles", "tandem_dup_score_proportion", "Double", 0.2, "Minimum proportion of the optimal score for a tandem duplication"),
    ("InducingCycles", "deviation_drift_factor", "Double", 150.0, "Permissiveness of indel drift in tandem duplications"),
    ("InducingCycles", "separation_drift_factor", "Double", 50.0, "Permissiveness of deviation from the expected separation"),
    ("InducingCycles", "trim_window_proportion", "Double", 0.1, "Bond end trim window, as proportion of min_cyclizing_length"),
    ("InducingCycles", "deduplication_slosh_proportion", "Double", 0.1, "Bond interval matching slack, as proportion of min_cyclizing_length"),
    ("InducingCycles", "include_tandem_dup_gap_scores", "Bool", True, "Include gap scores in tandem duplication scoring"),
    ("InducingCycles", "tandem_dup_score_proportion", "Double", 0.2, "Required score proportion of self chain"),
    ("InducingCycles", "include_tandem_dup_gap_scores", "Bool", True, "Include gap scores in tandem dup chains"),
    ("InducingCycles", "deviation_drift_factor", "Double", 150.0, "Allowed indel deviation factor"),
    ("InducingCycles", "separation_drift_factor", "Double", 50.0, "Required separation factor"),
    ("InducingCycles", "trim_window_proportion", "Double", 0.1, "End-trimming window proportion"),
    ("InducingCycles", "deduplication_slosh_proportion", "Double", 0.1, "Tandem duplication dedup tolerance"),
    ("InducingCycles", "max_realignment_cycle_size", "Integer", 10000, "Realign cycles shorter than this"),
    ("InducingCycles", "inconsistent_indel_window", "Integer", 100, "Window for inconsistently-placed indels"),
    ("InducingCycles", "min_inconsistency_disjoint_length", "Integer", 8, "Min disjoint unmerged length"),
    ("InducingCycles", "min_inconsistency_total_length", "Integer", 50, "Min total unmerged length"),
    ("InducingCycles", "realignment_min_padding", "Integer", 1000, "Min padding when realigning"),
    ("InducingCycles", "realignment_max_padding", "Integer", 10000, "Max padding when realigning"),
    ("DeveloperTools", "bonds_prefix", "String", "", "Save tandem duplication alignments with this prefix"),
    ("DeveloperTools", "preserve_subproblems", "Bool", False, "Do not clear data from completed subproblems"),
    ("DeveloperTools", "skip_calibration", "Bool", False, "Do not calibrate the scoring parameters"),
]


class Parameters:
    def __init__(self, config_text: str | None = None):
        self._params: dict[str, Param] = {}
        for sub, name, typ, default, help_ in _REGISTRY:
            self._params[name] = Param(sub, name, typ, default, help_)
        if config_text is not None:
            self._parse(config_text)

    def set(self, name: str, value) -> None:
        p = self._params[name]
        p.value = self._coerce(p, value)

    def get(self, name: str):
        return self._params[name].get()

    def _coerce(self, p: Param, value):
        if p.type == "Integer" or p.type == "Enum":
            return int(value)
        if p.type == "Double":
            return float(value)
        if p.type == "Bool":
            if isinstance(value, str):
                return value.strip().lower() in ("1", "true", "yes")
            return bool(value)
        if p.type == "String":
            return str(value)
        if p.type in ("DoubleArray3", "IntegerArray3"):
            if isinstance(value, str):
                parts = [x for x in value.replace(",", " ").split() if x]
                conv = float if p.type == "DoubleArray3" else int
                value = tuple(conv(x) for x in parts)
            value = tuple(value)
            if len(value) != 3:
                raise ValueError(f"{p.name} requires 3 values")
            return value
        raise ValueError(p.type)

    def validate(self) -> None:
        if self.get("restart") and not self.get("subproblems_prefix"):
            raise ValueError("Restarting requires a subproblems prefix (-S) "
                             "from the original run")
        if self.get("fasta_name") == "":
            raise ValueError("FASTA input is missing")

    def __eq__(self, other):
        return all(self.get(n) == other.get(n) for n in self._params)

    # --------------- config round-trip ---------------

    def generate_config(self) -> str:
        lines = ["---", "config:"]
        for sub, desc in SUBMODULES:
            lines.append(f"  {sub}:   # {desc}")
            for p in self._params.values():
                if p.submodule != sub:
                    continue
                v = p.get()
                if p.type in ("DoubleArray3", "IntegerArray3"):
                    vs = ", ".join(str(x) for x in v)
                    lines.append(f"    {p.name}: [{vs}]")
                elif p.type == "Bool":
                    lines.append(f"    {p.name}: {'true' if v else 'false'}")
                else:
                    lines.append(f"    {p.name}: {v}")
        lines.append("...")
        return "\n".join(lines) + "\n"

    def _parse(self, text: str) -> None:
        for raw in text.splitlines():
            line = raw.split("#")[0].rstrip()
            stripped = line.strip()
            if not stripped or stripped in ("---", "...") or stripped.endswith(":"):
                continue
            if ":" not in stripped:
                continue
            name, _, val = stripped.partition(":")
            name = name.strip()
            val = val.strip().strip("[]")
            if name in self._params:
                self.set(name, val)

    # --------------- apply to core ---------------

    def apply(self, core) -> None:
        """Push values into the pipeline objects (reference
        src/parameters.cpp:110-180)."""
        from . import logging as logmod
        from .ops.align_params import AlignmentParams

        core.subproblems_prefix = self.get("subproblems_prefix")
        core.subalignments_filepath = self.get("subalignments_filepath")
        core.induced_pairwise_prefix = self.get("all_pairs_prefix")
        core.bonds_prefix = self.get("bonds_prefix")
        core.max_count = self.get("max_count")
        core.skip_calibration = self.get("skip_calibration")
        core.preserve_subproblems = self.get("preserve_subproblems")
        core.cyclize_tandem_duplications = self.get("cyclize_tandem_duplications")
        core.memory_restraint_size = self.get("memory_restraint_size")
        core.threads = self.get("threads")

        sf = core.score_function
        sf.anchor_score_function = self.get("anchor_score_function")
        sf.pair_count_power = self.get("pair_count_power")
        sf.length_intercept = self.get("length_intercept")
        sf.length_decay_power = self.get("length_decay_power")

        a = core.anchorer
        a.chaining_algorithm = self.get("chaining_algorithm")
        a.max_num_match_pairs = self.get("max_num_match_pairs")
        a.gap_open = self.get("anchor_gap_open")
        a.gap_extend = self.get("anchor_gap_extend")
        a.global_anchoring = self.get("global_anchoring")
        a.do_fill_in_anchoring = self.get("do_fill_in_anchoring")
        a.split_matches_at_branchpoints = self.get("split_matches_at_branchpoints")

        b = core.bonder
        b.min_length = self.get("min_cyclizing_length")
        b.min_opt_proportion = self.get("tandem_dup_score_proportion")
        b.include_gap_scores = self.get("include_tandem_dup_gap_scores")
        b.deviation_drift_factor = self.get("deviation_drift_factor")
        b.separation_drift_factor = self.get("separation_drift_factor")
        b.deduplication_slosh_proportion = self.get(
            "deduplication_slosh_proportion")
        b.trim_window_proportion = self.get("trim_window_proportion")
        core.max_tandem_duplication_search_rounds = self.get(
            "max_tandem_duplication_search_rounds")

        ii = core.inconsistency_identifier
        ii.max_tight_cycle_size = self.get("max_realignment_cycle_size")
        ii.max_bond_inconsistency_window = self.get("inconsistent_indel_window")
        ii.min_inconsistency_disjoint_length = self.get(
            "min_inconsistency_disjoint_length")
        ii.min_inconsistency_total_length = self.get(
            "min_inconsistency_total_length")
        ii.padding_target_min_length = self.get("realignment_min_padding")
        ii.padding_max_length_limit = self.get("realignment_max_padding")

        pt = core.partitioner
        pt.constraint_method = ["Null", "Unconstrained", "MinAverage",
                                "MinWindowAverage"][self.get("constraint_method")]
        pt.minimum_segment_score = self.get("minimum_segment_score")
        pt.minimum_segment_average = self.get("minimum_segment_average")
        pt.window_length = self.get("window_length")
        pt.generalized_length_mean = self.get("generalized_length_mean")
        pt.boundary_score_factor = self.get("boundary_score_factor")

        st = core.stitcher
        st.alignment_params = AlignmentParams(
            match=self.get("stitch_match"),
            mismatch=self.get("stitch_mismatch"),
            gap_open=tuple(self.get("stitch_gap_open")),
            gap_extend=tuple(self.get("stitch_gap_extend")))
        st.max_trivial_size = self.get("max_trivial_size")
        st.min_wfa_size = self.get("min_wfa_size")
        st.max_wfa_size = self.get("max_wfa_size")
        st.max_wfa_ratio = self.get("max_wfa_ratio")
        st.wfa_pruning_dist = self.get("wfa_pruning_dist")
        st.deletion_alignment_ratio = self.get("deletion_alignment_ratio")
        st.deletion_alignment_short_max_size = self.get("deletion_alignment_short_max_size")
        st.deletion_alignment_long_min_size = self.get("deletion_alignment_long_min_size")
        st.min_indel_fuzz_length = self.get("min_indel_fuzz_length")
        st.indel_fuzz_score_proportion = self.get("indel_fuzz_score_proportion")

        logmod.level = self.get("logging_level")
