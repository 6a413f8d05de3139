"""Sharded Blake2s Merkle commitment over a device mesh.

Nodes are sharded as contiguous chunks, so children (2i, 2i+1) of a shard's
nodes always live in the same shard: every level hashes locally until the
node count reaches the device count. Each device then holds the root of its
subtree; one all_gather collects the D subtree roots and the remaining
log2(D) levels (plus any column injections at those tiny levels) finish
replicated.

Roots are bit-identical to the single-device core/merkle.py commit
(shard-count invariance is the SURVEY §7 acceptance test for sharded
commitments).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import blake2s, merkle
from .mesh import ROW_AXIS


def commit_sharded(mesh: Mesh, columns_by_log: Dict[int, List[jnp.ndarray]]) -> merkle.MerkleTree:
    """Full sharded Merkle commit: like core/merkle.commit but the levels with
    >= D nodes are hashed by a shard_map over contiguous node chunks (children
    of a shard's nodes are local by construction), the D subtree roots are
    all_gathered, and the tiny top levels finish replicated.

    Returns the same MerkleTree structure as core/merkle.commit (layers +
    column_matrix kept as device arrays — the big ones sharded), so
    decommitment works unchanged. The root is bit-identical to the
    single-device commit (shard-count invariance)."""
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    # normalize (C, N) matrices to column lists (the single-chip commit's
    # preferred form is a matrix; the shard_map specs here want per-column)
    columns_by_log = {
        k: ([v[i] for i in range(v.shape[0])] if hasattr(v, "ndim") and v.ndim == 2
            else list(v))
        for k, v in columns_by_log.items()
    }
    max_log = max(columns_by_log)
    split_log = int(np.log2(D))
    if max_log < split_log:
        return merkle.commit(columns_by_log)

    sharded_levels = list(range(max_log, split_log - 1, -1))
    col_specs = {
        k: [P(ROW_AXIS)] * len(columns_by_log.get(k, []))
        for k in sharded_levels
    }

    def step(cols):
        layers = {}
        mats = {}
        prev = None
        for k in sharded_levels:
            level_cols = cols.get(k, [])
            n_local = (1 << k) // D
            parts = []
            if prev is not None:
                parts.append(prev.reshape(n_local, 16))
            for c in level_cols:
                parts.append(c.reshape(n_local, 1))
            msg = jnp.concatenate(parts, axis=1)
            if level_cols:
                mats[k] = msg[:, -len(level_cols):]
            prev = blake2s.hash_words(msg)
            layers[k] = prev
        return layers, mats

    fn = shard_map(
        step, mesh=mesh,
        in_specs=({k: specs for k, specs in col_specs.items()},),
        out_specs=(
            {k: P(ROW_AXIS, None) for k in sharded_levels},
            {k: P(ROW_AXIS, None) for k in sharded_levels
             if columns_by_log.get(k)},
        ),
        check_vma=False,
    )
    dev_cols = {
        k: [jnp.asarray(c, jnp.uint32) for c in columns_by_log.get(k, [])]
        for k in sharded_levels
    }
    layers, col_matrix = jax.jit(fn)(dev_cols)
    layers = dict(layers)
    col_matrix = dict(col_matrix)

    # finish the top levels (< D nodes) replicated, identical to merkle.commit
    prev = layers[split_log]
    for k in range(split_log - 1, -1, -1):
        cols = columns_by_log.get(k, [])
        parts = [prev.reshape(1 << k, 16)]
        for c in cols:
            parts.append(jnp.asarray(c, jnp.uint32).reshape(1 << k, 1))
        msg = jnp.concatenate(parts, axis=1)
        if cols:
            col_matrix[k] = msg[:, -len(cols):]
        prev = blake2s.hash_words(msg)
        layers[k] = prev

    root = blake2s.digest_to_bytes(np.asarray(layers[0][0]))
    return merkle.MerkleTree(
        root=root, layers=layers,
        columns_by_log={k: list(v) for k, v in columns_by_log.items()},
        column_matrix=col_matrix,
    )


def sharded_commit(mesh: Mesh, columns_by_log: Dict[int, List[jnp.ndarray]]) -> bytes:
    """Compute the Merkle root with level-sharded hashing.

    columns_by_log: level -> list of (2^level,) M31 columns (device or host).
    Returns the 32-byte root, equal to merkle.commit(...).root.
    """
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    max_log = max(columns_by_log)
    split_log = int(np.log2(D))
    assert (1 << split_log) == D and max_log >= split_log

    # levels >= split_log are sharded; deeper-than-split columns ride along
    sharded_levels = [k for k in range(max_log, split_log - 1, -1)]
    col_specs = {
        k: [P(ROW_AXIS)] * len(columns_by_log.get(k, []))
        for k in sharded_levels
    }

    def step(cols):
        prev = None
        for k in sharded_levels:
            level_cols = cols.get(k, [])
            n_local = (1 << k) // D
            parts = []
            if prev is not None:
                parts.append(prev.reshape(n_local, 16))
            for c in level_cols:
                parts.append(c.reshape(n_local, 1))
            msg = jnp.concatenate(parts, axis=1)
            prev = blake2s.hash_words(msg)
        # prev: (1, 8) per shard = subtree root at level split_log
        return jax.lax.all_gather(prev.reshape(8), ROW_AXIS)  # (D, 8)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=({k: specs for k, specs in col_specs.items()},),
        out_specs=P(None, None), check_vma=False,
    )
    dev_cols = {
        k: [jnp.asarray(c, jnp.uint32) for c in columns_by_log.get(k, [])]
        for k in sharded_levels
    }
    subtree_roots = np.asarray(jax.jit(fn)(dev_cols))  # (D, 8)

    # finish the top levels on host (tiny): levels split_log-1 .. 0
    prev = subtree_roots
    for k in range(split_log - 1, -1, -1):
        cols = columns_by_log.get(k, [])
        msgs = []
        for i in range(1 << k):
            m = prev[2 * i : 2 * i + 2].reshape(16).astype("<u4").tobytes()
            for c in cols:
                m += int(np.asarray(c)[i]).to_bytes(4, "little")
            msgs.append(m)
        import hashlib

        prev = np.stack([
            np.frombuffer(hashlib.blake2s(m).digest(), dtype="<u4") for m in msgs
        ])
    return prev[0].astype("<u4").tobytes()
