"""Batched device->host transfer: one relay round trip for many small arrays.

Each np.asarray(device_array) costs a full round trip through the TPU relay
(~100ms); decommitment produces dozens of tiny gathers. pull_all flattens
and concatenates them on device, pulls once, and re-splits on host."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _flatten_jit(arrays: tuple) -> jnp.ndarray:
    """Flatten+concatenate in ONE executable, keyed by the tuple of input
    shapes. Eager per-array ravel + one concatenate was 2N+1 separate tiny
    executables (each a compile + relay round trip on the cold path)."""
    return jnp.concatenate([jnp.ravel(a) for a in arrays])


def pull_all(arrays: Sequence[jnp.ndarray]) -> List[np.ndarray]:
    """Materialize many device arrays with a single host transfer."""
    arrays = list(arrays)
    if not arrays:
        return []
    if len(arrays) == 1:
        return [np.asarray(arrays[0])]
    shapes = [tuple(a.shape) for a in arrays]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    host = np.asarray(_flatten_jit(tuple(jnp.asarray(a) for a in arrays)))
    out = []
    off = 0
    for shape, size in zip(shapes, sizes):
        out.append(host[off : off + size].reshape(shape))
        off += size
    return out
