"""stwo_brainfuck_tpu: a TPU-native Circle-STARK zkVM for Brainfuck.

Brand-new JAX/XLA implementation with the capability surface of
kkrt-labs/stwo-brainfuck (see SURVEY.md): Brainfuck VM + trace generation,
13-component AIR with LogUp, M31/QM31 fields, circle FFT, Blake2s Merkle
commitments, FRI, and a prove/verify CLI.
"""

import os

import jax

# Persistent compilation cache: the prover's jitted stages (FFT, Blake2s
# tree hashing, constraint evaluation, quotients, FRI folds) compile once
# per shape and are reused across processes/runs.
_cache_dir = os.environ.get(
    "STWO_BF_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "stwo_bf_jax")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax without these options
    pass

__version__ = "0.1.0"
