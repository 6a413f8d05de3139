"""stwo_brainfuck_tpu: a TPU-native Circle-STARK zkVM for Brainfuck.

Brand-new JAX/XLA implementation with the capability surface of
kkrt-labs/stwo-brainfuck (see SURVEY.md): Brainfuck VM + trace generation,
13-component AIR with LogUp, M31/QM31 fields, circle FFT, Blake2s Merkle
commitments, FRI, and a prove/verify CLI.
"""

import os

import numpy as _np

# This box runs THP defrag=madvise, and numpy madvises MADV_HUGEPAGE on every
# >=4MB allocation — each 2MB page fault then does synchronous compaction at
# ~5 MB/s. Measured here: np.ones(256MB) 35-50 s with hugepages, 0.18 s
# without; the prover's host-side table builds and staging buffers hit this
# on every fresh mmap. Env var NUMPY_MADVISE_HUGEPAGE only works before
# numpy's first import, so also flip the runtime switch.
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:
    _np._core.multiarray._set_madvise_hugepage(False)
except Exception:  # pragma: no cover - numpy<2 private API moved
    try:
        _np.core.multiarray._set_madvise_hugepage(False)
    except Exception:
        pass

import jax

# Persistent compilation cache: the prover's jitted stages (FFT, Blake2s
# tree hashing, constraint evaluation, quotients, FRI folds) compile once
# per shape and are reused across processes/runs.
_cache_dir = os.environ.get(
    "STWO_BF_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "stwo_bf_jax")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0: cache EVERYTHING. ~27 sub-0.3s glue executables (flatten/gather/
    # split/squeeze) recompiled in every fresh process (measured; through
    # the relay a tiny compile is ~0.8 s vs a ~0.4 s cached load)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Pallas/Mosaic kernels embed Python source locations in the serialized
    # kernel payload (an opaque custom-call attribute that the cache key's
    # strip-debuginfo pass cannot reach), so by default ANY source edit that
    # shifts a line number invalidates every cached Pallas executable — each
    # fresh process then recompiles the whole fused-FFT family (~60 s of the
    # cold start, measured). Zero traceback frames in locations makes the
    # lowering location-free and the cache keys edit-invariant (verified:
    # keys identical before/after a line shift in ops/m31_pallas.py).
    if os.environ.get("STWO_BF_LOCATION_FREE_CACHE", "1") != "0":
        jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:  # pragma: no cover - older jax without these options
    pass

__version__ = "0.1.0"
