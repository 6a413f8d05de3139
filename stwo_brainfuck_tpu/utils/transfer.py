"""Batched device->host transfer: one relay round trip for many small arrays.

Each np.asarray(device_array) costs a full round trip through the TPU relay
(~100ms); decommitment produces dozens of tiny gathers. pull_all flattens
and concatenates them on device, pulls once, and re-splits on host."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp


def pull_all(arrays: Sequence[jnp.ndarray]) -> List[np.ndarray]:
    """Materialize many device arrays with a single host transfer."""
    arrays = list(arrays)
    if not arrays:
        return []
    if len(arrays) == 1:
        return [np.asarray(arrays[0])]
    shapes = [tuple(a.shape) for a in arrays]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    flat = jnp.concatenate([jnp.ravel(a) for a in arrays])
    host = np.asarray(flat)
    out = []
    off = 0
    for shape, size in zip(shapes, sizes):
        out.append(host[off : off + size].reshape(shape))
        off += size
    return out
