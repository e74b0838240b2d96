"""True multi-process execution: one jax process per "host", a global
device mesh formed with ``jax.distributed.initialize``, and completed
subproblems exchanged between hosts THROUGH jax collectives.

This is the pod-shaped counterpart of ``parallel.scheduler`` (which uses an
in-machine process pool and pickled arrays). Here every host is a separate
jax process that contributes its local devices to one global runtime:

 - rank 0 starts the coordination service; every rank calls
   ``jax.distributed.initialize(coordinator, num_processes, process_id)``.
 - all ranks parse the same FASTA + guide tree (and apply the same
   Parameters blob), so every rank derives the identical layer schedule
   (``Execution.independent_layers``) and the identical deterministic
   SIZE-BALANCED assignment: within a layer, pending subproblems are
   assigned heaviest-first (DP-cost proxy n1*n2 + n1 + n2) to the
   least-loaded rank, so one huge join does not serialize a layer the way
   positional round-robin can.
 - at the layer barrier, each completed subproblem's graph is serialized
   to GFA text — exactly the reference's checkpoint/restart contract
   (reference src/execution.cpp:223-279) — and allgathered across hosts as
   a padded uint8 payload via ``multihost_utils.process_allgather``. On a
   TPU pod this collective rides DCN; on the test machine it rides the
   local CPU backend. Every rank (owners included) re-parses the exchanged
   GFA so all hosts hold bit-identical subproblem state. When side outputs
   need them (-s / 2-sequence CIGAR), the fused alignments ride the same
   payload.

Coverage matches the serial path and the pool scheduler: calibration
(size-balanced across ranks), cyclization (-c: per-leaf bonding rounds
distributed, bond alignments allgathered in leaf order), checkpointing
(-S: rank 0 emits every subproblem in serial execution order plus the
bonds checkpoint), restart (-R: every rank replays the shared checkpoint
directory before scheduling), subalignments (-s) and induced pairwise
outputs on rank 0.

Determinism: restart-interop tests establish that emit -> parse -> continue
reproduces the serial bytes, so the multi-process output equals the serial
run regardless of host count or scheduling (tests/test_multiprocess.py).

Run via ``python -m centrolign_tpu.parallel.multiprocess <n> <fasta>
[tree]`` (rank 0 writes the final GFA to stdout) or programmatically with
``run_multiprocess_msa``; the CLI routes here when
CENTROLIGN_TPU_EXECUTOR=jaxdist and more than one host is requested.
"""

from __future__ import annotations

import io
import multiprocessing as mp
import os
import pickle
import sys

import numpy as np


def balanced_assignment(weights, n_procs):
    """Deterministic size-balanced assignment: heaviest item first to the
    least-loaded rank (ties -> lowest rank). Every rank computes the same
    mapping from the same replicated state."""
    order = sorted(range(len(weights)), key=lambda i: (-weights[i], i))
    load = [0.0] * n_procs
    rank_of = [0] * len(weights)
    for i in order:
        r = min(range(n_procs), key=lambda x: (load[x], x))
        rank_of[i] = r
        load[r] += weights[i]
    return rank_of


def _rank_main(rank: int, n_procs: int, port: int, fasta: str,
               tree_path: str | None, out_path: str | None,
               params_blob: bytes | None) -> None:
    # the collective transport (Gloo) chats on fd 1; ranks inherit the
    # parent CLI's stdout, which may be the user's GFA destination, so move
    # fd 1 onto stderr for the whole rank (keeping the original for the
    # out_path=None stdout-writing case)
    orig_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    # platform selection must precede any jax backend init; the virtual
    # mesh contributes one CPU device per rank
    os.environ["JAX_PLATFORMS"] = os.environ.get(
        "CENTROLIGN_TPU_MP_PLATFORM", "cpu")
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] = (
            os.environ["XLA_FLAGS"] +
            " --xla_force_host_platform_device_count=1").strip()
    import jax
    # an accelerator plugin can hook backend init regardless of
    # JAX_PLATFORMS; pin through jax.config before the first backend call
    # (a dead accelerator tunnel would otherwise hang every rank)
    jax.config.update("jax_platforms",
                      os.environ.get("CENTROLIGN_TPU_MP_PLATFORM", "cpu"))
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_procs, process_id=rank)
    assert jax.process_count() == n_procs

    from jax.experimental import multihost_utils

    from ..core import (Core, pairwise_align_step, fuse_step,
                        leaf_intrinsic_scale, leaf_bond_alignments)
    from ..io.fasta import parse_fasta
    from ..io.gfa import write_gfa, read_gfa
    from ..modify_graph import add_sentinels
    from ..tree import Tree, in_order_newick_string

    with open(fasta) as f:
        seqs = parse_fasta(f)
    if tree_path:
        with open(tree_path) as f:
            tree = Tree(f.read())
    else:
        tree = Tree(in_order_newick_string([n for n, _ in seqs]))
    core = Core(seqs, tree)
    if params_blob is not None:
        params = pickle.loads(params_blob)
        params.apply(core)
        do_restart = params.get("restart")
    else:
        do_restart = False
    if len(seqs) == 2:
        core.preserve_subproblems = True
    if do_restart:
        # every rank replays the shared checkpoint directory, so the
        # completed-subproblem state (and any bonds checkpoint) is
        # replicated without a collective
        core.restart()
    ex = core.main_execution
    cyclic = core.cyclize_tandem_duplications
    restarted = core._restarted_bond_alignments is not None
    bond_alignments = core._restarted_bond_alignments if restarted else []
    want_alignments = bool(core.subalignments_filepath
                           or core.preserve_subproblems)
    # -S/-s need child graphs alive for rank 0's deferred emit loop;
    # cyclization needs the root graph for apply_bonds; otherwise drop
    # each layer's consumed children (mirrors the pool scheduler)
    keep_graphs = bool(core.preserve_subproblems
                       or core.subalignments_filepath
                       or core.subproblems_prefix
                       or cyclic)

    def exchange_bytes(local: bytes) -> list[bytes]:
        """Allgather one byte payload per rank (padded to the global max
        so shapes agree across processes)."""
        n = np.int64(len(local))
        sizes = multihost_utils.process_allgather(n)
        cap = int(sizes.max())
        buf = np.zeros(max(cap, 1), dtype=np.uint8)
        arr = np.frombuffer(local, dtype=np.uint8)
        buf[:len(arr)] = arr
        gathered = multihost_utils.process_allgather(buf)
        return [gathered[r, :int(sizes[r])].tobytes()
                for r in range(n_procs)]

    def exchange_items(mine: list) -> list:
        """Allgather a list of picklable items from every rank, returned
        concatenated in rank order."""
        out = []
        for blob in exchange_bytes(pickle.dumps(
                mine, protocol=pickle.HIGHEST_PROTOCOL)):
            if blob:
                out.extend(pickle.loads(blob))
        return out

    # ---- calibration: leaves size-balanced across hosts, scales (and,
    # under -c, each leaf's bonding-round alignments) allgathered.
    # Restart semantics mirror the serial path (core.execute,
    # core.py:230-241): a restarted run RE-runs the scale calibration
    # (bonds come from the restored checkpoint) unless -skip-calibration.
    leaves = list(ex.leaf_subproblems())
    scales = {}
    run_calibration = ((restarted and not core.skip_calibration)
                       or (not restarted
                           and (not core.skip_calibration or cyclic)))
    if run_calibration:
        from .. import logging as logmod
        logmod.log(logmod.Basic,
                   "Calibrating scale of anchoring parameters."
                   if not cyclic else
                   "Calibrating scale of anchoring parameters and "
                   "identifying tandem duplications.")
        rank_of = balanced_assignment(
            [s.graph.node_size for s in leaves], n_procs)
        mine = []
        leaf_state = {}
        for i, sub in enumerate(leaves):
            if rank_of[i] == rank:
                scale, matches, chain = leaf_intrinsic_scale(
                    sub, core.max_count, core.score_function, core.anchorer)
                leaf_state[i] = (matches, chain)
                # repr() round-trips floats exactly
                mine.append((i, repr(float(scale))))
        for i, s in exchange_items(mine):
            scales[i] = float(s)
        assert len(scales) == len(leaves)
        if not core.skip_calibration and scales:
            core.score_function.score_scale = float(
                np.mean([scales[i] for i in range(len(leaves))]))

        if cyclic and not restarted:
            mine = []
            for i, (matches, chain) in sorted(leaf_state.items()):
                alns, raw = leaf_bond_alignments(
                    leaves[i], scales[i], matches, chain, core.anchorer,
                    core.bonder, core.stitcher,
                    core.max_tandem_duplication_search_rounds,
                    collect_raw=bool(core.bonds_prefix))
                mine.append((i, alns, raw))
            gathered = sorted(exchange_items(mine))
            for i, alns, raw in gathered:
                if core.bonds_prefix and rank == 0:
                    for k, raw_aln in enumerate(raw):
                        core.output_bond_alignment(
                            raw_aln, leaves[i].graph, 0, k)
                bond_alignments.extend(alns)
            if core.subproblems_prefix and rank == 0:
                core.emit_restart_bonds(bond_alignments)

    # ---- layer-wise MSA with GFA payload exchange at each barrier
    from .. import logging as logmod
    logmod.log(logmod.Minimal, "Beginning MSA.")
    computed = set()
    layers = ex.independent_layers()
    for li, layer in enumerate(layers):
        pending = [n for n in layer if not ex.subproblems[n].complete]
        logmod.log(logmod.Basic,
                   f"Executing layer {li + 1} of {len(layers)} "
                   f"({len(pending)} subproblem(s)) across {n_procs} "
                   "host(s).")
        weights = []
        for node_id in pending:
            c1, c2 = ex.tree.get_children(node_id)
            n1 = ex.subproblems[c1].graph.node_size
            n2 = ex.subproblems[c2].graph.node_size
            weights.append(float(n1) * float(n2) + n1 + n2)
        rank_of = balanced_assignment(weights, n_procs)
        mine = []
        for pos, node_id in enumerate(pending):
            computed.add(node_id)
            if rank_of[pos] != rank:
                continue
            c1, c2 = ex.tree.get_children(node_id)
            s1, s2 = ex.subproblems[c1], ex.subproblems[c2]
            alignment = pairwise_align_step(
                s1, s2, core.max_count, core.score_function,
                core.anchorer, core.partitioner, core.stitcher,
                memory_restraint_size=core.memory_restraint_size)
            graph, tableau = fuse_step(s1, s2, alignment,
                                       preserve=keep_graphs)
            buf = io.StringIO()
            write_gfa(graph, tableau, buf)
            mine.append((pos, buf.getvalue(),
                         alignment if want_alignments else None))
        for pos, text, alignment in exchange_items(mine):
            node_id = pending[pos]
            sub = ex.subproblems[node_id]
            # every rank — owner included — adopts the exchanged GFA,
            # so all hosts hold bit-identical graphs
            sub.graph = read_gfa(io.StringIO(text))
            sub.tableau = add_sentinels(sub.graph, 5, 6)
            sub.alignment = alignment
            sub.complete = True
        if not keep_graphs:
            for node_id in layer:
                for c in ex.tree.get_children(node_id):
                    ex.subproblems[c].graph = None

    if rank == 0:
        # ---- side outputs in serial execution order (byte-identical
        # files), then the cyclization epilogue, then the final GFA
        if core.subalignments_filepath or core.subproblems_prefix:
            for node_id in ex.execution_order:
                if node_id not in computed:
                    continue
                parent = ex.subproblems[node_id]
                if core.subalignments_filepath:
                    c1, c2 = ex.tree.get_children(node_id)
                    core.emit_subalignment(parent, ex.subproblems[c1],
                                           ex.subproblems[c2])
                if core.subproblems_prefix:
                    core.emit_subproblem(parent)
        if core.induced_pairwise_prefix:
            core.output_pairwise_alignments(False)
        if cyclic:
            core.apply_bonds(bond_alignments)
            if core.induced_pairwise_prefix:
                core.output_pairwise_alignments(True)
        root = core.root_subproblem()
        out = (open(out_path, "w") if out_path
               else os.fdopen(os.dup(orig_stdout_fd), "w"))
        write_gfa(root.graph, root.tableau, out)
        out.close()
    jax.distributed.shutdown()


def run_multiprocess_msa(n_procs: int, fasta: str, tree_path: str | None,
                         out_path: str, port: int = 0,
                         params=None) -> None:
    """Spawn `n_procs` jax processes and run the MSA across them; rank 0
    writes the final GFA to `out_path`. `params` (a Parameters object) is
    pickled to every rank and applied to its Core — this carries -S/-R/-c/
    -s/--bonds configuration into the distributed run."""
    if port == 0:
        import socket
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    blob = pickle.dumps(params) if params is not None else None
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_rank_main,
                         args=(r, n_procs, port, fasta, tree_path, out_path
                               if r == 0 else None, blob))
             for r in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    bad = [p.exitcode for p in procs if p.exitcode != 0]
    assert not bad, f"multiprocess ranks failed: exit codes {bad}"


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    n = int(argv[0])
    fasta = argv[1]
    tree = argv[2] if len(argv) > 2 else None
    # None -> rank 0 writes to its original stdout (fd 1 itself is moved
    # to stderr inside the ranks to keep Gloo chatter out of the GFA)
    out = argv[3] if len(argv) > 3 and argv[3] else None
    run_multiprocess_msa(n, fasta, tree, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
