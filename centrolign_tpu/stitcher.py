"""Stitch a partitioned anchor chain into a base-level alignment.

Behavioral equivalent of the reference Stitcher (reference stitcher.hpp:27-370,
src/stitcher.cpp):

- anchors are copied verbatim; each between-anchor gap is aligned by a
  size/shape-dispatched aligner (do_alignment, stitcher.hpp:237-370):
  PO-POA for matrices <= min_wfa_size; the deletion-WFA regime for strongly
  asymmetric gaps; (p)WFA for near-diagonal large gaps; greedy partial
  alignment for unalignable gaps. Between-segment gaps only receive
  deletion-shaped alignments (only_deletion_alns).
- gap parameters are truncated to the components a gap of that size could
  use (subalign, src/stitcher.cpp:24-78)
- despecify_indel_breakpoints removes low-scoring anchors that pin the
  placement of long indels (src/stitcher.cpp:115-311)

Aligner dispatch is reference-exact: PO-POA (TPU Gotoh kernel for chain x
chain gaps, native C++ for DAG gaps), native pruned WFA for large
near-diagonal gaps, native bidirectional deletion-WFA for strongly
asymmetric gaps, and greedy partial alignment for unalignable gaps — the
WFA family is validated pair-for-pair against the reference implementation
(tests/test_wfa.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .alignment import GAP, swap_sides
from .extractor import (
    SubGraphInfo, extract_graphs_between, extract_graphs_between_segments,
    source_sink_minmax,
)
from .ops.align_params import AlignmentParams
from .ops.aligners import pure_deletion_alignment, greedy_partial_alignment
from .native import popoa_align as popoa_native

_I64 = np.int64


@dataclass
class _Pending:
    """Placeholder for a deferred gap alignment: `kind` selects the engine
    ("chain" -> batched Pallas Gotoh, "dag" -> topological-wavefront
    kernel, "host" -> a native-aligner thunk deferred so ALL device-eligible
    gaps dispatch before any heavy host DP runs), `job` feeds it, `finish`
    maps its raw lane-space alignment back into parent-graph coordinates."""
    kind: str
    job: tuple
    finish: object


def translate_alignment(aln: np.ndarray, back1, back2) -> np.ndarray:
    """Map subgraph node ids back to parent ids (reference src/alignment.cpp:26)."""
    out = aln.copy()
    if len(out) == 0:
        return out
    back1 = np.asarray(back1, dtype=_I64)
    back2 = np.asarray(back2, dtype=_I64)
    m1 = out[:, 0] != GAP
    m2 = out[:, 1] != GAP
    if len(back1):
        out[m1, 0] = back1[out[m1, 0]]
    if len(back2):
        out[m2, 1] = back2[out[m2, 1]]
    return out


_MESH_CACHE = [None, False]  # (mesh, probed)


def _alignment_mesh():
    """A flat ('gap' x 'lane') mesh over every default-backend device, built
    once; None on single-device hosts (the common case — the sharded path
    only engages on a real multi-chip slice or the virtual CPU mesh)."""
    if _MESH_CACHE[1]:
        return _MESH_CACHE[0]
    import jax
    devs = jax.devices()
    if len(devs) >= 2:
        from .parallel.sharded_gotoh import make_alignment_mesh
        _MESH_CACHE[0] = make_alignment_mesh(len(devs), gap_axis=1)
    _MESH_CACHE[1] = True
    return _MESH_CACHE[0]


def _is_chain(sub: SubGraphInfo) -> bool:
    g = sub.subgraph
    if g.node_size == 0:
        return False
    if len(sub.sources) != 1 or len(sub.sinks) != 1:
        return False
    return (bool((g.out_degrees() <= 1).all())
            and bool((g.in_degrees() <= 1).all())
            and int((g.in_degrees() == 0).sum()) == 1)


def _chain_order(sub: SubGraphInfo):
    """Node order along a chain subgraph starting at its single source."""
    from .native import topological_order
    return topological_order(sub.subgraph)


@dataclass
class Stitcher:
    alignment_params: AlignmentParams = field(default_factory=AlignmentParams)
    max_trivial_size: int = 30000
    min_wfa_size: int = 40000000
    max_wfa_size: int = 75000000
    max_wfa_ratio: float = 1.05
    wfa_pruning_dist: int = 25
    deletion_alignment_ratio: int = 8
    deletion_alignment_short_max_size: int = 1500
    deletion_alignment_long_min_size: int = 2000
    min_indel_fuzz_length: int = 50
    indel_fuzz_score_proportion: float = 0.001
    # device dispatch: use the Pallas Gotoh kernel for chain x chain gaps at
    # least this many DP cells. Mid-size gaps are faster on the host: per
    # launch the (shared-tunnel) link costs ~25 ms of round-trip latency, so
    # the device only wins where one batch carries multi-megacell fills; the
    # host keeps aligning the plentiful small/mid gaps while those overlap.
    # On benchdata/pair.fasta this threshold sends 59% of DP cells (29 gaps)
    # to the chip and leaves 41% (1283 gaps) on the host.
    device_min_cells: int = 160000
    # sequence-parallel tier (SURVEY §5.7): a single chain x chain gap at
    # least this many DP cells is lane-sharded across ALL devices of the
    # mesh with per-diagonal ppermute halo exchange
    # (parallel/sharded_gotoh.py) instead of filling on one chip. Only
    # engages when >= 2 devices exist, so single-chip hosts are unaffected.
    shard_min_cells: int = 16000000
    use_device: bool = True

    def __post_init__(self):
        import os
        if os.environ.get("CENTROLIGN_TPU_USE_DEVICE", "1") == "0":
            self.use_device = False
        mc = os.environ.get("CENTROLIGN_TPU_DEVICE_MIN_CELLS")
        if mc is not None:
            self.device_min_cells = int(mc)
        sc = os.environ.get("CENTROLIGN_TPU_SHARD_MIN_CELLS")
        if sc is not None:
            self.shard_min_cells = int(sc)
        if os.environ.get("CENTROLIGN_TPU_PACKMULTI", "1") == "0":
            # one-group-per-launch regime: fire buckets every 8 jobs as in
            # round 3 (accumulating further would only delay the chip)
            self.dispatch_batch = 8
        self._begin_dispatch()

    def _device_ok(self) -> bool:
        """Non-blocking chip gate: gaps evaluated while the async link probe
        is still pending run natively (no wall-clock spent waiting); once the
        probe resolves healthy, later eligible gaps route to the chip. A
        dead tunnel degrades to the native path without ever blocking."""
        if not self.use_device:
            return False
        from .device import device_ready, probe_resolved
        if device_ready():
            return True
        if probe_resolved():
            # verdict is in and it is unhealthy: stop re-checking
            self.use_device = False
        return False

    # Dispatch policy for overlapped device batches: a bucket's accumulated
    # jobs launch as soon as it holds this many (or one job this large in
    # DP cells), so the chip fills big gaps while the host keeps aligning
    # small gaps natively. Leftovers launch at flush. With multi-group
    # packed launches (CENTROLIGN_TPU_PACKMULTI, default on) a single
    # launch carries up to 512 jobs, so buckets accumulate to a full
    # multi-launch during the classification pass instead of firing every
    # 8 jobs; big jobs still launch immediately either way.
    dispatch_batch: int = 512
    dispatch_big_cells: int = 2_000_000

    def stitch(self, anchor_segments, graph1, graph2, tableau1, tableau2,
               xmerge1, xmerge2) -> np.ndarray:
        self._begin_dispatch()
        within, between = extract_graphs_between_segments(
            anchor_segments, graph1, graph2, tableau1, tableau2,
            xmerge1, xmerge2)
        assert len(within) + 1 == len(between)
        stitched = []
        for i in range(len(between)):
            if i != 0:
                segment_graphs = within[i - 1]
                segment = anchor_segments[i - 1]
                for j in range(len(segment)):
                    if j != 0:
                        pair = segment_graphs[j - 1]
                        self._subalign(pair[0], pair[1], stitched, False)
                    a = segment[j]
                    stitched.append(np.stack([a.walk1, a.walk2], axis=1))
            pair = between[i]
            self._subalign(pair[0], pair[1], stitched, True)
        self._launch_remaining()
        self._run_host_pending(stitched)
        self._flush_pending(stitched)
        if stitched:
            return np.concatenate(stitched, axis=0)
        return np.empty((0, 2), dtype=_I64)

    def _begin_dispatch(self) -> None:
        """Reset the overlapped-dispatch state for one stitch call."""
        self._accum: dict = {}      # bucket -> [_Pending, ...]
        self._handles: list = []    # [( [_Pending, ...], device handle )]
        self._dispatch_t = 0.0

    def _register_pending(self, pending: _Pending) -> None:
        """Queue a chain device job; launch its bucket asynchronously once
        enough work has accumulated (jax dispatch returns immediately, so
        the chip overlaps with subsequent host-side native alignments)."""
        if pending.kind != "chain":
            return
        import jax
        if jax.default_backend() not in ("tpu", "axon"):
            return  # CPU fallback path batches synchronously at flush
        from .ops.gotoh_pallas import _job_bucket
        bucket = _job_bucket(pending.job)
        lst = self._accum.setdefault(bucket, [])
        lst.append(pending)
        s1, s2 = pending.job[0], pending.job[1]
        big = (len(s1) + 1) * (len(s2) + 1) >= self.dispatch_big_cells
        if len(lst) >= self.dispatch_batch or big:
            self._dispatch_bucket(bucket)

    def _dispatch_bucket(self, bucket) -> None:
        from . import metrics
        from .ops.gotoh_pallas import gotoh_dispatch
        lst = self._accum.pop(bucket, [])
        if not lst:
            return
        t0 = metrics.timer()
        handle = gotoh_dispatch(bucket, [p.job for p in lst])
        self._dispatch_t += metrics.timer() - t0
        self._handles.append((lst, handle))

    def _launch_remaining(self) -> None:
        """Dispatch every still-accumulated device bucket NOW — called after
        the classification pass so the chip works on all eligible gaps while
        the host pass (below) aligns the native gaps. Buckets only ever
        accumulate after _register_pending saw a live backend, so an empty
        _accum means jax must NOT be touched here (backend init on a dead
        tunnel blocks forever, device.py:36-47)."""
        if not self._accum:
            return
        for bucket in list(self._accum):
            self._dispatch_bucket(bucket)

    def _run_host_pending(self, stitched: list) -> None:
        """Execute the deferred host-native gap alignments (kind="host"),
        in output order, overlapping the in-flight device batches."""
        for k, x in enumerate(stitched):
            if isinstance(x, _Pending) and x.kind == "host":
                stitched[k] = x.finish(x.job())

    def _flush_pending(self, stitched: list) -> None:
        """Complete all queued device gap alignments: launch the leftover
        buckets, then collect every in-flight batch (the bulk of the fill
        time has already overlapped with the host's native alignments)."""
        from . import metrics
        chain_slots = [k for k, x in enumerate(stitched)
                       if isinstance(x, _Pending) and x.kind == "chain"]
        dag_slots = [k for k, x in enumerate(stitched)
                     if isinstance(x, _Pending) and x.kind == "dag"]
        if self._handles or self._accum:
            from .ops.gotoh_pallas import gotoh_fetch
            t0 = metrics.timer()
            for bucket in list(self._accum):
                self._dispatch_bucket(bucket)
            by_id = {}
            for lst, handle in self._handles:
                for p, res in zip(lst, gotoh_fetch(handle)):
                    by_id[id(p)] = res
            cells = 0
            for k in chain_slots:
                aln, _score = by_id[id(stitched[k])]
                s1, s2 = stitched[k].job[0], stitched[k].job[1]
                cells += (len(s1) + 1) * (len(s2) + 1)
                stitched[k] = stitched[k].finish(aln)
            metrics.record(
                "pod", cells,
                self._dispatch_t + metrics.timer() - t0,
                f"batches={len(self._handles)} overlap")
            self._handles = []
        elif chain_slots:
            # synchronous fallback (CPU-jax backends: tests, virtual mesh)
            from .ops.gotoh_pallas import gotoh_align_pallas_batched
            jobs = [stitched[k].job for k in chain_slots]
            t0 = metrics.timer()
            results = gotoh_align_pallas_batched(jobs)
            cells = sum((len(s1) + 1) * (len(s2) + 1)
                        for s1, s2, _sw, _p in jobs)
            metrics.record("pod", cells, metrics.timer() - t0,
                           f"batch={len(jobs)}")
            for k, (aln, _score) in zip(chain_slots, results):
                stitched[k] = stitched[k].finish(aln)
        if dag_slots:
            from .ops.popoa_dag import popoa_dag_batch
            jobs = [stitched[k].job[0] for k in dag_slots]
            t0 = metrics.timer()
            results = popoa_dag_batch(jobs)
            cells = sum((j.t1.V + 1) * (j.t2.V + 1) for j in jobs)
            metrics.record("podag", cells, metrics.timer() - t0,
                           f"dag batch={len(jobs)}")
            for k, got in zip(dag_slots, results):
                if got is None:
                    # rare: no interior alignment through the kernel's
                    # matrix; rerun this gap on the native engine
                    aln, _ = popoa_native(*stitched[k].job[1])
                else:
                    aln = got[0]
                stitched[k] = stitched[k].finish(aln)

    def internal_stitch(self, anchor_chain, graph, xmerge) -> np.ndarray:
        """(reference stitcher.hpp:208-234). Note the reference appends each
        anchor first and the gap *before* it afterwards — the output row
        order is anchor0, anchor1, gap01, anchor2, gap12, ...; internal_fuse
        only consumes aligned pairs, so the order is immaterial, but we
        replicate it."""
        self._begin_dispatch()
        stitch_graphs = extract_graphs_between(
            anchor_chain, graph, graph, None, None, xmerge, xmerge)
        stitched = []
        for i, a in enumerate(anchor_chain):
            stitched.append(np.stack([a.walk1, a.walk2], axis=1))
            if i != 0:
                pair = stitch_graphs[i - 1]
                self._subalign(pair[0], pair[1], stitched, False)
        self._launch_remaining()
        self._run_host_pending(stitched)
        self._flush_pending(stitched)
        return np.concatenate(stitched, axis=0) if stitched else np.empty((0, 2), dtype=_I64)

    # ------------------------------------------------------------------

    def _subalign(self, ex1: SubGraphInfo, ex2: SubGraphInfo, stitched: list,
                  only_deletion_alns: bool) -> None:
        """(reference src/stitcher.cpp:24-78): truncate the gap parameters to
        the components reachable at this gap size, align, translate."""
        p = self.alignment_params
        cutoffs = []
        for i in range(1, len(p.gap_open)):
            if p.gap_open[i - 1] > p.gap_open[i] or p.gap_extend[i - 1] < p.gap_extend[i]:
                raise ValueError("Affine gap parameters must be increasing in "
                                 "gap open and decreasing in gap extend")
            diff_open = p.gap_open[i] - p.gap_open[i - 1]
            diff_extend = p.gap_extend[i - 1] - p.gap_extend[i]
            cutoffs.append((diff_open + diff_extend - 1) // diff_extend)
        c = 0
        while (c < len(cutoffs) and ex1.subgraph.node_size > cutoffs[c]
               and ex2.subgraph.node_size > cutoffs[c]):
            c += 1
        params = p.truncated(c + 1)
        aln = self._do_alignment(ex1, ex2, only_deletion_alns, params)
        back1, back2 = ex1.back_translation, ex2.back_translation
        if isinstance(aln, _Pending):
            inner = aln.finish
            aln = _Pending(aln.kind, aln.job,
                           lambda a, inner=inner, b1=back1, b2=back2:
                           translate_alignment(inner(a), b1, b2))
            self._register_pending(aln)
        else:
            aln = translate_alignment(aln, back1, back2)
        stitched.append(aln)

    @staticmethod
    def _host_pending(tag, cells, detail, fn):
        """Defer a host-native aligner call: the decision is made NOW (pass
        1), the DP runs in the host pass (pass 2) while device batches are
        in flight. Timing is recorded at execution, same tags as before."""
        def thunk():
            from . import metrics
            t0 = metrics.timer()
            aln = fn()
            metrics.record(tag, cells, metrics.timer() - t0, detail)
            return aln
        return _Pending(kind="host", job=thunk, finish=lambda a: a)

    def _do_alignment(self, ex1, ex2, only_deletion_alns, params):
        """(reference stitcher.hpp:237-370). Returns an alignment array or
        a _Pending (device job or deferred host thunk)."""
        from . import metrics
        V1, V2 = ex1.subgraph.node_size, ex2.subgraph.node_size
        mat_size = (V1 + 1) * (V2 + 1)
        t0 = metrics.timer()
        if V2 == 0:
            aln = pure_deletion_alignment(ex1.subgraph, ex1.sources,
                                          ex1.sinks, params)
            metrics.record("pd1", V1, metrics.timer() - t0)
            return aln
        if V1 == 0:
            aln = pure_deletion_alignment(ex2.subgraph, ex2.sources, ex2.sinks, params)
            metrics.record("pd2", V2, metrics.timer() - t0)
            return swap_sides(aln)
        min1, max1 = source_sink_minmax(ex1)
        min2, max2 = source_sink_minmax(ex2)
        r = self.max_wfa_ratio
        if mat_size <= self.min_wfa_size and (not only_deletion_alns or mat_size <= self.max_trivial_size):
            return self._po_poa(ex1, ex2, params)
        if (max1 * self.deletion_alignment_ratio <= min2
                and max1 <= self.deletion_alignment_short_max_size
                and min2 >= self.deletion_alignment_long_min_size):
            from .native import deletion_wfa_po_poa
            return self._host_pending(
                "ad1", mat_size, f"{V1}x{V2}",
                lambda: deletion_wfa_po_poa(
                    ex1.subgraph, ex2.subgraph, ex1.sources, ex2.sources,
                    ex1.sinks, ex2.sinks, params)[0])
        if (max2 * self.deletion_alignment_ratio <= min1
                and max2 <= self.deletion_alignment_short_max_size
                and min1 >= self.deletion_alignment_long_min_size):
            from .native import deletion_wfa_po_poa
            return self._host_pending(
                "ad2", mat_size, f"{V1}x{V2}",
                lambda: swap_sides(deletion_wfa_po_poa(
                    ex2.subgraph, ex1.subgraph, ex2.sources, ex1.sources,
                    ex2.sinks, ex1.sinks, params)[0]))
        if (mat_size < self.max_wfa_size
                and ((min2 * r >= min1 and min2 <= max1 * r)
                     or (max2 * r >= min1 and max2 <= max1 * r)
                     or (min1 * r >= min2 and min1 <= max2 * r)
                     or (max1 * r >= min2 and max1 <= max2 * r))
                and not only_deletion_alns):
            from .native import wfa_po_poa
            return self._host_pending(
                "w", mat_size, f"{V1}x{V2}",
                lambda: wfa_po_poa(
                    ex1.subgraph, ex2.subgraph, ex1.sources, ex2.sources,
                    ex1.sinks, ex2.sinks, params,
                    prune_limit=2 * self.wfa_pruning_dist)[0])
        return self._host_pending(
            "u", mat_size, f"{V1}x{V2}",
            lambda: greedy_partial_alignment(
                ex1.subgraph, ex2.subgraph, ex1.sources, ex2.sources,
                ex1.sinks, ex2.sinks, params))

    def _po_poa(self, ex1, ex2, params, swapped: bool = False):
        from . import metrics
        V1, V2 = ex1.subgraph.node_size, ex2.subgraph.node_size
        if (self.use_device and V1 * V2 >= self.shard_min_cells
                and _is_chain(ex1) and _is_chain(ex2)
                and self._device_ok() and _alignment_mesh() is not None):
            # one matrix too big for a single chip's launch: lane-shard the
            # wavefront across the whole mesh (ICI halo exchange), traceback
            # on the host — bit-identical to the single-chip kernel
            from .parallel.sharded_gotoh import sharded_gotoh_align
            mesh = _alignment_mesh()
            order1 = _chain_order(ex1)
            order2 = _chain_order(ex2)
            s1 = ex1.subgraph.labels[order1].astype(np.int32)
            s2 = ex2.subgraph.labels[order2].astype(np.int32)
            t0 = metrics.timer()
            aln, _score = sharded_gotoh_align(s1, s2, params, mesh,
                                              swap_pref=swapped)
            out = aln.copy()
            m1 = out[:, 0] != GAP
            m2 = out[:, 1] != GAP
            out[m1, 0] = order1[out[m1, 0]]
            out[m2, 1] = order2[out[m2, 1]]
            metrics.record("posh", (V1 + 1) * (V2 + 1),
                           metrics.timer() - t0,
                           f"{V1}x{V2} devices={mesh.devices.size}")
            return out
        if (self.use_device and V1 * V2 >= self.device_min_cells
                and _is_chain(ex1) and _is_chain(ex2)
                and self._device_ok()):
            order1 = _chain_order(ex1)
            order2 = _chain_order(ex2)
            # chain subgraph node ids may not be in order; remap through the
            # chain order and back
            s1 = ex1.subgraph.labels[order1].astype(np.int32)
            s2 = ex2.subgraph.labels[order2].astype(np.int32)

            def finish(aln, order1=order1, order2=order2):
                out = aln.copy()
                m1 = out[:, 0] != GAP
                m2 = out[:, 1] != GAP
                out[m1, 0] = order1[out[m1, 0]]
                out[m2, 1] = order2[out[m2, 1]]
                return out

            # truncated gap parameters ride along: the batched kernel groups
            # jobs by num_pw, so every chain x chain gap (not just the
            # full-parameter ones) runs on the device kernel
            return _Pending(kind="chain", job=(s1, s2, swapped, params),
                            finish=finish)
        from . import metrics
        import os
        if (self.use_device and V1 * V2 >= self.device_min_cells
                and os.environ.get("CENTROLIGN_TPU_DEVICE_DAG", "0") == "1"
                and self._device_ok()):
            # DAG x DAG (and truncated-parameter chain) gaps: the
            # topological-wavefront device kernel (ops/popoa_dag.py),
            # queued for bucketed batch launches; graphs outside its
            # envelope fall through to the native engine.
            # OPT-IN (CENTROLIGN_TPU_DEVICE_DAG=1): on the 10-seq MSA the
            # DAG batches block ~95s of device time for 72M cells vs ~2s
            # on the native engine through the shared-tunnel link, so the
            # production default keeps DAG gaps on the host; chain gaps
            # (the latency-tolerant, batched majority) stay on device
            from .ops.popoa_dag import _DagJob
            job = _DagJob(ex1.subgraph, ex2.subgraph, ex1.sources,
                          ex2.sources, ex1.sinks, ex2.sinks, params)
            if job.eligible:
                job.prepare()
                native_args = (ex1.subgraph, ex2.subgraph, ex1.sources,
                               ex2.sources, ex1.sinks, ex2.sinks, params)
                return _Pending(kind="dag", job=(job, native_args),
                                finish=lambda aln: aln)
            # outside the DAG-kernel envelope: record the fallback so the
            # eligible fraction of device-sized DAG cells is measurable
            # (the native fill below is timed under the 'po' tag as usual)
            metrics.record(
                "po_dagfb", (V1 + 1) * (V2 + 1), 0.0,
                f"K={max(job.t1.K, job.t2.K)} S={max(job.t1.S, job.t2.S)}")
        return self._host_pending(
            "po", (V1 + 1) * (V2 + 1), f"{V1}x{V2}",
            lambda: popoa_native(ex1.subgraph, ex2.subgraph, ex1.sources,
                                 ex2.sources, ex1.sinks, ex2.sinks,
                                 params)[0])

    # ------------------------------------------------------------------

    def despecify_indel_breakpoints(self, anchors: list) -> list:
        """(reference src/stitcher.cpp:115-311). Returns the filtered list."""
        partition = self._identify_despecification_partition(anchors)
        removed = 0
        d = 0
        gap = 0
        gap_score = 0.0
        anchors = list(anchors)
        for i in range(len(anchors)):
            if (d < len(partition) and partition[d][0] <= i < partition[d][1]):
                gap += anchors[i].gap_before
                gap_score += anchors[i].gap_score_before
                removed += 1
            elif removed != 0:
                anchors[i - removed] = anchors[i]
            if d < len(partition) and i == partition[d][1]:
                anchors[i - removed - 1].gap_after = gap
                anchors[i - removed - 1].gap_score_after = gap_score
                anchors[i - removed].gap_before = gap
                anchors[i - removed].gap_score_before = gap_score
                gap = 0
                gap_score = 0.0
                d += 1
        if removed:
            anchors = anchors[:len(anchors) - removed]
        return anchors

    def _identify_despecification_partition(self, anchors):
        """(reference src/stitcher.cpp:115-263). DP over (excluded, included)
        tuple values (num indels despecified, score bookkeeping, index); the
        2D range-max query is done by linear scan over the narrow index
        window."""
        n = len(anchors)
        if n == 0 or self.indel_fuzz_score_proportion <= 0.0:
            return []
        fuzz = self.indel_fuzz_score_proportion
        search_limit = [(0, 0)] * n
        prev_indel = -1
        before_prev = -1
        limits = []
        for i in range(n):
            if i != 0 and abs(anchors[i].gap_before) >= self.min_indel_fuzz_length:
                before_prev = prev_indel
                prev_indel = i
            if before_prev != -1 and prev_indel != -1:
                limits.append((before_prev + 1, min(i, prev_indel + 1)))
            elif prev_indel != -1:
                limits.append((min(1, i), min(prev_indel + 1, i)))
            else:
                limits.append((0, 0))
        search_limit = limits

        prefix = [0.0] * (n + 1)
        for i in range(n):
            prefix[i + 1] = prefix[i] + anchors[i].score
        score_index_key = [-np.inf] * n
        for i in range(1, n):
            score_index_key[i] = prefix[i] + fuzz * anchors[i - 1].score

        NEG = (-1, 0.0, 0)
        dp = [(NEG, NEG) for _ in range(n + 1)]
        bp = [-1] * (n + 1)
        dp[0] = ((0, 0.0, 0), NEG)
        # tree values: entry[j] = value tuple at index j with key
        # score_index_key[j]; query: max value over j in [lo, hi) with
        # score_index_key[j] >= score_query_key
        tree_vals: list = [(0, 0.0, 0)] * n  # reference seeds every index
        opt_idx = 0
        for i in range(1, n):
            excl = max(dp[i - 1][0], dp[i - 1][1])
            incl = dp[i][1]
            score_query_key = prefix[i] - fuzz * anchors[i].score
            lo, hi = search_limit[i]
            best = None
            best_j = -1
            for j in range(lo, hi):
                if tree_vals[j] is not None and score_index_key[j] >= score_query_key:
                    if best is None or tree_vals[j] > best:
                        best = tree_vals[j]
                        best_j = j
            dpi_second = NEG
            if best is not None:
                dpi_second = (best[0] + 1,
                              best[0] - prefix[i] + prefix[best_j],
                              i)
                bp[i] = best_j
            dp[i] = (excl, dpi_second)
            if dpi_second > dp[opt_idx][1]:
                opt_idx = i
            tree_vals[i] = (excl[0], excl[1], i)
        from .partitioner import _shared_traceback
        return _shared_traceback(dp, bp, opt_idx)
