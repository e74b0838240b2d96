"""True multi-process execution: one jax process per "host", a global
device mesh formed with ``jax.distributed.initialize``, and completed
subproblems exchanged between hosts THROUGH jax collectives.

This is the pod-shaped counterpart of ``parallel.scheduler`` (which uses an
in-machine process pool and pickled arrays). Here every host is a separate
jax process that contributes its local devices to one global runtime:

 - rank 0 starts the coordination service; every rank calls
   ``jax.distributed.initialize(coordinator, num_processes, process_id)``.
 - all ranks parse the same FASTA + guide tree and derive the identical
   layer schedule (``Execution.independent_layers``).
 - within a layer, subproblems are assigned round-robin by position; each
   rank computes its own assignments on its host (the host-side pipeline)
   with its local devices serving that host's stitch kernels.
 - at the layer barrier, each completed subproblem's graph is serialized
   to GFA text — exactly the reference's checkpoint/restart contract
   (reference src/execution.cpp:223-279) — and allgathered across hosts as
   a padded uint8 payload via ``multihost_utils.process_allgather``. On a
   TPU pod this collective rides DCN; on the test machine it rides the
   local CPU backend. Every rank (owners included) re-parses the exchanged
   GFA so all hosts hold bit-identical subproblem state.

Determinism: restart-interop tests establish that emit -> parse -> continue
reproduces the serial bytes, so the multi-process output equals the serial
run regardless of host count or scheduling.

Run via ``python -m centrolign_tpu.parallel.multiprocess <n> <fasta>
[tree]`` (rank 0 writes the final GFA to stdout) or programmatically with
``run_multiprocess_msa``.
"""

from __future__ import annotations

import io
import multiprocessing as mp
import os
import sys

import numpy as np


def _rank_main(rank: int, n_procs: int, port: int, fasta: str,
               tree_path: str | None, out_path: str | None) -> None:
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

    from ..core import Core, pairwise_align_step, fuse_step, \
        leaf_intrinsic_scale
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
    ex = core.main_execution

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

    # ---- calibration: leaves round-robin across hosts, scales allgathered
    if not core.skip_calibration:
        leaves = list(ex.leaf_subproblems())
        mine = {}
        for i, sub in enumerate(leaves):
            if i % n_procs == rank:
                scale, _m, _c = leaf_intrinsic_scale(
                    sub, core.max_count, core.score_function, core.anchorer)
                mine[i] = float(scale)
        payload = ("\n".join(f"{i}\t{s!r}" for i, s in sorted(mine.items()))
                   ).encode()
        scales = {}
        for blob in exchange_bytes(payload):
            for line in blob.decode().splitlines():
                i, s = line.split("\t")
                scales[int(i)] = float(s)  # repr() round-trips exactly
        assert len(scales) == len(leaves)
        core.score_function.score_scale = float(
            np.mean([scales[i] for i in range(len(leaves))]))

    # ---- layer-wise MSA with GFA payload exchange at each barrier
    for layer in ex.independent_layers():
        mine = []
        for pos, node_id in enumerate(layer):
            if ex.subproblems[node_id].complete:
                continue
            if pos % n_procs == rank:
                c1, c2 = ex.tree.get_children(node_id)
                s1, s2 = ex.subproblems[c1], ex.subproblems[c2]
                alignment = pairwise_align_step(
                    s1, s2, core.max_count, core.score_function,
                    core.anchorer, core.partitioner, core.stitcher,
                    memory_restraint_size=core.memory_restraint_size)
                graph, tableau = fuse_step(s1, s2, alignment)
                buf = io.StringIO()
                write_gfa(graph, tableau, buf)
                mine.append((pos, buf.getvalue()))
        payload = "\x00".join(f"{pos}\x01{text}" for pos, text in mine)
        for blob in exchange_bytes(payload.encode()):
            if not blob:
                continue
            for item in blob.decode().split("\x00"):
                if not item:
                    continue
                pos_s, text = item.split("\x01", 1)
                node_id = layer[int(pos_s)]
                sub = ex.subproblems[node_id]
                # every rank — owner included — adopts the exchanged GFA,
                # so all hosts hold bit-identical graphs
                sub.graph = read_gfa(io.StringIO(text))
                sub.tableau = add_sentinels(sub.graph, 5, 6)
                sub.complete = True

    if rank == 0:
        root = core.root_subproblem()
        out = out_path and open(out_path, "w") or sys.stdout
        write_gfa(root.graph, root.tableau, out)
        if out_path:
            out.close()
    jax.distributed.shutdown()


def run_multiprocess_msa(n_procs: int, fasta: str, tree_path: str | None,
                         out_path: str, port: int = 0) -> None:
    """Spawn `n_procs` jax processes and run the MSA across them; rank 0
    writes the final GFA to `out_path`."""
    if port == 0:
        import socket
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_rank_main,
                         args=(r, n_procs, port, fasta, tree_path, out_path
                               if r == 0 else None))
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
    out = argv[3] if len(argv) > 3 else "/dev/stdout"
    run_multiprocess_msa(n, fasta, tree, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
