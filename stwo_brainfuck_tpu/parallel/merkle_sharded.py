"""Sharded Blake2s Merkle commitment over a device mesh.

Nodes are sharded as contiguous chunks, so children (2i, 2i+1) of a shard's
nodes always live in the same shard: every level hashes locally until the
node count reaches the device count. Each device then holds the root of its
subtree; one all_gather collects the D subtree roots and the remaining
log2(D) levels (plus any column injections at those tiny levels) finish
replicated — all inside ONE jitted executable per tree signature.

Roots are bit-identical to the single-device core/merkle.py commit
(shard-count invariance is the SURVEY §7 acceptance test for sharded
commitments).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import blake2s, merkle
from .mesh import ROW_AXIS


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


@lru_cache(maxsize=32)
def _commit_fn(mesh: Mesh, sig: tuple):
    """ONE executable for a whole tree signature ((level, n_cols), ...):
    sharded level hashing (children of a shard's contiguous node chunk are
    local by construction), the all_gather of the D subtree roots, and the
    replicated top levels — fused. The executable is shared by every tree
    with the same signature (the eager per-level/per-column version cost a
    dispatch + cold compile per level)."""
    D = _mesh_size(mesh)
    split_log = int(np.log2(D))
    by = dict(sig)
    max_log = max(by)
    sharded_levels = tuple(range(max_log, split_log - 1, -1))

    def step(mats):
        layers = {}
        prev = None
        for k in sharded_levels:
            n_local = (1 << k) // D
            parts = []
            if prev is not None:
                parts.append(prev.reshape(n_local, 16))
            if k in mats:
                parts.append(mats[k].T)
            msg = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            prev = blake2s.hash_words(msg)
            layers[k] = prev
        # level split_log: one node per shard -> replicate the D digests
        sub = jax.lax.all_gather(prev.reshape(8), ROW_AXIS)  # (D, 8)
        return layers, sub

    big_keys = [k for k in sharded_levels if k in by]
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=({k: P(None, ROW_AXIS) for k in big_keys},),
        out_specs=(
            {k: P(ROW_AXIS, None) for k in sharded_levels},
            P(None, None),
        ),
        check_vma=False,
    )

    @jax.jit
    def fn(mats):
        big = {k: mats[k] for k in big_keys}
        layers, prev = sharded(big)
        layers = dict(layers)
        # top levels (< D nodes): replicated, identical to merkle.commit
        for k in range(split_log - 1, -1, -1):
            parts = [prev.reshape(1 << k, 16)]
            if k in mats:
                parts.append(mats[k].T)
            msg = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            prev = blake2s.hash_words(msg)
            layers[k] = prev
        return layers

    return fn


def commit_sharded(mesh: Mesh, columns_by_log: Dict[int, List[jnp.ndarray]]) -> merkle.MerkleTree:
    """Full sharded Merkle commit: like core/merkle.commit but levels with
    >= D nodes hash in a shard_map over contiguous node chunks, and the whole
    tree (including the replicated top levels) is ONE executable per
    signature.

    columns_by_log values may be a list of (2^k,) columns or one (C, 2^k)
    matrix (preferred — no per-column slicing dispatches). Returns the same
    MerkleTree structure as core/merkle.commit (layers kept as device
    arrays — the big ones sharded — and column_mats referencing the input
    matrices), so decommitment works unchanged. The root is bit-identical
    to the single-device commit (shard-count invariance)."""
    D = _mesh_size(mesh)
    split_log = int(np.log2(D))
    mats: Dict[int, jnp.ndarray] = {}
    for k, v in columns_by_log.items():
        if isinstance(v, (list, tuple)):
            mat = jnp.stack([jnp.asarray(c, jnp.uint32) for c in v])
        else:
            mat = jnp.asarray(v, jnp.uint32)
        assert mat.shape[1] == 1 << k, (mat.shape, k)
        mats[k] = mat
    max_log = max(mats)
    if max_log < split_log:
        return merkle.commit(mats)

    sig = tuple(sorted((k, int(m.shape[0])) for k, m in mats.items()))
    layers = dict(_commit_fn(mesh, sig)(mats))

    root = blake2s.digest_to_bytes(np.asarray(layers[0][0]))
    return merkle.MerkleTree(root=root, layers=layers, column_mats=mats)


def sharded_commit(mesh: Mesh, columns_by_log: Dict[int, List[jnp.ndarray]]) -> bytes:
    """Compute just the Merkle ROOT with level-sharded hashing (kept as the
    minimal standalone form of the algorithm; commit_sharded is the prover
    path).

    columns_by_log: level -> list of (2^level,) M31 columns (device or host).
    Returns the 32-byte root, equal to merkle.commit(...).root.
    """
    return commit_sharded(mesh, columns_by_log).root
