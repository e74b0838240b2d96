"""centrolign_tpu: a TPU-native tandem-repeat MSA engine.

A from-scratch reimplementation of the capabilities of jeizenga/centrolign
(progressive guide-tree MSA of megabase tandem-repeat DNA over sequence DAGs)
designed TPU-first: host Python/C++ orchestrates graphs, trees, and I/O while
the dynamic-programming inner loops (graph-graph Gotoh / PO-POA, sparse anchor
chaining) run as anti-diagonal wavefront JAX/Pallas kernels.

Reference behavior parity is documented per-module with file:line citations
into the reference source tree (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: kernel shapes recur across runs, and a
# cold compile through the TPU tunnel costs ~0.5s each.
try:
    import jax as _jax

    _cache_dir = _os.environ.get(
        "CENTROLIGN_TPU_XLA_CACHE",
        _os.path.expanduser("~/.cache/centrolign_tpu/xla"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - jax config API drift
    pass

from .graph import BaseGraph
from .alignment import GAP, cigar, explicit_cigar

__all__ = ["BaseGraph", "GAP", "cigar", "explicit_cigar", "__version__"]
