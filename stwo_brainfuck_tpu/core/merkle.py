"""Blake2s Merkle vector commitment over mixed-size M31 columns.

TPU-native equivalent of stwo's ``MerkleProver``/``MerkleVerifier``
(``vcs::blake2_merkle``, used via CommitmentSchemeProver at
crates/brainfuck_prover/src/brainfuck_air/mod.rs:495-500).

One tree commits a whole commitment phase (preprocessed / main / interaction /
composition). Columns of commitment-domain size 2^k are injected at tree
level k (level k has 2^k nodes; level 0 is the root):

    node_{k,i} = blake2s( child_{k+1,2i} || child_{k+1,2i+1}
                          || col_values_at_level_k[i] ... )

Tree building is the device hot path: every level is one vectorized Blake2s
over all nodes (core/blake2s.py). Decommitment/verification run on host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import blake2s


ColumnsByLog = Dict[int, List[jnp.ndarray]]


# Executable granularity: ONE executable per level-with-columns plus chains
# of up to _CHAIN_CHUNK digest-only levels, chunk boundaries aligned to
# multiples of _CHAIN_CHUNK. jax.jit keys executables by input shapes alone,
# so every tree in a proof (preprocessed / main / interaction / composition /
# all FRI layer trees) SHARES them: the cold path compiles O(max_log) small
# programs total instead of one giant unrolled program per distinct tree
# signature (measured on the TPU relay: a fused 2^21 mixed-size tree took
# 160-350 s to compile, times ~20 signatures; a per-level program takes
# ~1-3 s and is compiled once).

_CHAIN_CHUNK = 4


@jax.jit
def _leaf_hash_jit(mat: jnp.ndarray):
    """Deepest level: hash the (C, 2^k) column matrix rows-as-messages,
    returning the (2^k, 8) digests. The transpose lives only inside the
    executable — an earlier version ALSO returned the (2^k, C) transposed
    matrix and the tree retained it for decommit gathers, doubling every
    committed matrix's HBM footprint for the proof's lifetime (big22's
    main+interaction trees alone held 2x(1.0+0.78) GiB, and the prove
    OOMed a 15.75 GiB v5e at the interaction commit)."""
    return blake2s.hash_words(mat.T)


@jax.jit
def _node_hash_jit(prev: jnp.ndarray, mat: jnp.ndarray):
    """Level with injected columns: node = H(child0 || child1 || columns).
    prev: (2^(k+1), 8) child digests; mat: (C, 2^k)."""
    msg = jnp.concatenate([prev.reshape(mat.shape[1], 16), mat.T], axis=1)
    return blake2s.hash_words(msg)


@partial(jax.jit, static_argnames=("depth",))
def _chain_hash_jit(prev: jnp.ndarray, depth: int):
    """`depth` digest-only levels: returns the digests of the next `depth`
    levels up ((2^(k-1), 8), ..., (2^(k-depth), 8))."""
    outs = []
    for _ in range(depth):
        prev = blake2s.hash_words(prev.reshape(prev.shape[0] // 2, 16))
        outs.append(prev)
    return tuple(outs)


def level_plan(sig) -> list:
    """Executable schedule for a tree signature [(level, n_cols), ...]:
    [("leaf", k, C), ("node", k, C), ("chain", k, depth), ...] where a chain
    step consumes the digests of level k+1 and emits levels k..k-depth+1.
    Drives commit(); exposed so warmup can precompile each distinct kernel
    shape as its own (concurrent) thunk."""
    by = dict(sig)
    ks = sorted(by, reverse=True)
    steps = []
    k = ks[0]
    first = True
    while k >= 0:
        if k in by:
            steps.append(("leaf" if first else "node", k, by[k]))
            first = False
            k -= 1
        else:
            # Chunk boundaries aligned to multiples of _CHAIN_CHUNK so chunk
            # shapes recur across trees of different heights.
            nxt = next((l for l in ks if l < k), -1)
            stop = max(nxt + 1, _CHAIN_CHUNK * (k // _CHAIN_CHUNK))
            steps.append(("chain", k, k - stop + 1))
            k = stop - 1
    return steps


@dataclass
class MerkleTree:
    root: bytes
    # level -> (2^level, 8) uint32 digest words (kept ON DEVICE; decommit
    # gathers only the few queried positions — pulling whole layers through
    # the TPU relay costs hundreds of MB per proof)
    layers: Dict[int, jnp.ndarray]
    # level -> (n_cols, 2^level) stacked column matrix — the SAME device
    # buffers the caller committed (no copy); decommit gathers the few
    # queried positions along axis 1. (A transposed (n_nodes, n_cols)
    # duplicate was previously retained here; see _leaf_hash_jit.)
    column_mats: Dict[int, jnp.ndarray] = None  # type: ignore[assignment]

    @property
    def max_log(self) -> int:
        return max(self.layers)


def commit(columns_by_log: ColumnsByLog, pull_root: bool = True) -> MerkleTree:
    """Build the tree on device; only the 32-byte root leaves the device.
    pull_root=False defers even that (root=None; the device digest stays at
    layers[0][0]) — the FRI layer loop batches all its root pulls into one.

    columns_by_log values may be a list of (2^level,) columns or one
    (C, 2^level) matrix (preferred — avoids per-column slicing executables).
    Dispatches one small shared executable per level-with-columns and per
    aligned chunk of digest-only levels (see _CHAIN_CHUNK note above); all
    dispatches are async, only the 32-byte root pull synchronizes."""
    assert columns_by_log, "empty commitment"
    mats: Dict[int, jnp.ndarray] = {}
    for k, v in columns_by_log.items():
        if isinstance(v, (list, tuple)):
            mat = jnp.stack([jnp.asarray(c, jnp.uint32) for c in v])
        else:
            mat = jnp.asarray(v, jnp.uint32)
        assert mat.shape[1] == 1 << k, (mat.shape, k)
        mats[k] = mat
    layers: Dict[int, jnp.ndarray] = {}
    prev = None
    for step in level_plan([(k, m.shape[0]) for k, m in mats.items()]):
        kind, k = step[0], step[1]
        if kind == "leaf":
            prev = _leaf_hash_jit(mats[k])
            layers[k] = prev
        elif kind == "node":
            prev = _node_hash_jit(prev, mats[k])
            layers[k] = prev
        else:
            outs = _chain_hash_jit(prev, step[2])
            for i, d in enumerate(outs):
                layers[k - i] = d
            prev = outs[-1]

    root = (blake2s.digest_to_bytes(np.asarray(layers[0][0]))
            if pull_root else None)
    return MerkleTree(root=root, layers=layers, column_mats=mats)


@dataclass
class MerkleDecommitment:
    """Witness for a set of query positions (positions on the deepest level).

    column_values[k] = per column at level k, values at sorted needed
    positions of level k. witness_hashes: sibling digests (32B each) ordered
    by (level descending, position ascending)."""

    column_values: Dict[int, List[List[int]]] = field(default_factory=dict)
    witness_hashes: List[bytes] = field(default_factory=list)

    def to_json(self):
        return {
            "column_values": {str(k): v for k, v in self.column_values.items()},
            "witness_hashes": [h.hex() for h in self.witness_hashes],
        }

    @staticmethod
    def from_json(obj) -> "MerkleDecommitment":
        return MerkleDecommitment(
            column_values={int(k): [[int(x) for x in col] for col in v]
                           for k, v in obj["column_values"].items()},
            witness_hashes=[bytes.fromhex(h) for h in obj["witness_hashes"]],
        )


def _needed_positions(queries, max_log: int) -> Dict[int, List[int]]:
    """Expand query positions into per-level needed sets.

    `queries` is either a sequence of deepest-level positions, or an explicit
    dict {level: positions}. Every level's needed set additionally includes
    the parents of the level below (hash recomputation path)."""
    if not isinstance(queries, dict):
        queries = {max_log: list(queries)}
    needed: Dict[int, List[int]] = {}
    below: set = set()
    for k in range(max_log, -1, -1):
        cur = set(queries.get(k, ())) | {p >> 1 for p in below}
        needed[k] = sorted(cur)
        below = cur
    return needed


class PendingDecommitment:
    """Device-side gathers issued, not yet pulled. finalize_many materializes
    any number of pending decommitments with ONE host transfer (each separate
    pull costs a full TPU-relay round trip). Gather index arrays are padded
    to powers of two (entries carry the real count) so the executable shapes
    are shared across levels/proofs instead of one compile per position
    count."""

    def __init__(self, pending_cols, pending_wit):
        self._cols = pending_cols          # (level, n_real, future)
        self._wit = sorted(pending_wit, key=lambda kv: -kv[0])

    def futures(self):
        return [f for _, _, f in self._cols] + [f for _, _, f in self._wit]

    def build(self, host_arrays) -> MerkleDecommitment:
        out = MerkleDecommitment()
        i = 0
        for k, n, _ in self._cols:
            gathered = host_arrays[i][:n].T  # (n_cols, n_positions)
            out.column_values[k] = [[int(v) for v in row] for row in gathered]
            i += 1
        for _k, n, _ in self._wit:
            for h in host_arrays[i][:n]:
                out.witness_hashes.append(blake2s.digest_to_bytes(h))
            i += 1
        return out

    def finalize(self) -> MerkleDecommitment:
        return finalize_many([self])[0]


def finalize_many(pendings: Sequence["PendingDecommitment"]) -> List[MerkleDecommitment]:
    decs, _ = finalize_with_extra(pendings, [])
    return decs


def finalize_with_extra(pendings: Sequence["PendingDecommitment"],
                        extra_futs: Sequence[jnp.ndarray]):
    """Materialize many pending decommitments PLUS arbitrary extra device
    arrays with ONE host transfer (air.py batches the 4 trees' and all FRI
    layers' decommitments with the FRI value gathers this way — sync B).
    Returns (decommitments, extra_host_arrays)."""
    from ..utils.transfer import pull_all

    futs = []
    counts = []
    for p in pendings:
        f = p.futures()
        futs.extend(f)
        counts.append(len(f))
    base = len(futs)
    host = pull_all(futs + list(extra_futs))
    out = []
    off = 0
    for p, c in zip(pendings, counts):
        out.append(p.build(host[off : off + c]))
        off += c
    return out, host[base:]


def _padded_idx(positions, bound: int | None = None) -> Tuple[jnp.ndarray, int]:
    """Index array padded to the next power of two (gather shapes shared).
    `bound` pins the padded size to a config-derived value (still >= the
    real count) so the gather shapes do not depend on the random query draw
    at all — warmup can then precompile the exact executables. Padding
    repeats row 0; entries carry the real count."""
    n = len(positions)
    target = 1 << max(0, n - 1).bit_length()
    if bound is not None:
        assert n <= bound, (n, bound)
        target = bound
    arr = np.zeros(target, np.int32)
    arr[:n] = positions
    return jnp.asarray(arr), n


@partial(jax.jit, static_argnames=("axes",))
def _gather_rows_jit(mats: tuple, idxs: tuple, axes: tuple):
    """All of one decommitment's gathers in ONE executable (keyed by the
    shape tuple; eager per-level jnp.take was a compile + relay round trip
    per level on the cold path). axes[j] = 1 gathers positions from a
    (C, N) column matrix (output transposed to (|idx|, C), matching the
    old row-matrix layout downstream); 0 gathers rows of a (N, 8) digest
    layer. axes is REQUIRED and must match mats 1:1 — a silent all-axis-0
    default would read transposed data for column matrices."""
    assert len(axes) == len(mats), (len(axes), len(mats))
    return tuple(
        jnp.take(m, i, axis=1).T if ax == 1 else jnp.take(m, i, axis=0)
        for m, i, ax in zip(mats, idxs, axes))


def decommit_async(tree: MerkleTree, queries,
                   n_queries: int | None = None,
                   include_values: bool = True) -> PendingDecommitment:
    """Issue the decommitment gathers without materializing.

    n_queries (the config's query count) pins every gather's padded size:
    each level's needed set is contained in the union of the queries'
    radix-4 quads projected to that level, so |needed[k]| <= 4*n_queries
    and |witness[k]| <= 8*n_queries — the executable shapes then depend
    only on (tree signature, n_queries), never on the drawn positions.

    include_values=False skips the column-value gathers and produces a
    witness-hash-only decommitment: FRI layer values already travel in
    proof["fri"]["layer_values"] (Merkle-checked by the verifier), so a
    second copy inside the decommitment would be ignored bytes."""
    max_log = tree.max_log
    if n_queries is not None:
        b_col = 1 << max(0, 4 * n_queries - 1).bit_length()
        b_wit = 2 * b_col
    needed = _needed_positions(queries, max_log)
    col_meta: List[tuple] = []
    wit_meta: List[tuple] = []
    col_mats: List[jnp.ndarray] = []
    col_idxs: List[jnp.ndarray] = []
    wit_mats: List[jnp.ndarray] = []
    wit_idxs: List[jnp.ndarray] = []
    for k in range(max_log, -1, -1):
        if include_values and k in tree.column_mats:
            bound = min(1 << k, b_col) if n_queries is not None else None
            idx, n = _padded_idx(needed[k], bound)
            col_meta.append((k, n))
            col_mats.append(tree.column_mats[k])
            col_idxs.append(idx)
        if k < max_log:
            # children of needed[k] at level k+1; provide siblings not needed
            child_needed = set(needed[k + 1])
            witness_pos = [
                child
                for p in needed[k]
                for child in (2 * p, 2 * p + 1)
                if child not in child_needed
            ]
            # under a pinned n_queries the gather is issued even when no
            # witness is needed (n=0): whether a level has witnesses depends
            # on the drawn positions, and the executable signature must not
            if witness_pos or n_queries is not None:
                bound = min(1 << (k + 1), b_wit) if n_queries is not None else None
                idx, n = _padded_idx(witness_pos, bound)
                wit_meta.append((k, n))
                wit_mats.append(tree.layers[k + 1])
                wit_idxs.append(idx)
    nc = len(col_meta)
    outs = _gather_rows_jit(tuple(col_mats + wit_mats),
                            tuple(col_idxs + wit_idxs),
                            axes=(1,) * nc + (0,) * len(wit_meta))
    pending_cols = [(k, n, o) for (k, n), o in zip(col_meta, outs[:nc])]
    pending_wit = [(k, n, o) for (k, n), o in zip(wit_meta, outs[nc:])]
    return PendingDecommitment(pending_cols, pending_wit)


def gather_arg_shapes(sig, n_queries: int, max_log: int | None = None,
                      include_values: bool = True) -> Tuple[list, list, tuple]:
    """The (mats, idxs, axes) ShapeDtypeStruct args of the _gather_rows_jit
    call issued by decommit_async(tree, ..., n_queries=...) for a tree of
    signature [(level, n_cols), ...] — column gathers by level descending,
    then witness gathers by level descending (mirrors decommit_async's
    walk). Lets warmup AOT-load the gather executables without building a
    real tree (the tree walk itself is pure cache-hit dispatches)."""
    import jax

    by = dict(sig)
    if max_log is None:
        max_log = max(by)
    b_col = 1 << max(0, 4 * n_queries - 1).bit_length()
    b_wit = 2 * b_col
    col_mats, col_idxs, wit_mats, wit_idxs = [], [], [], []
    for k in range(max_log, -1, -1):
        if include_values and k in by:
            col_mats.append(jax.ShapeDtypeStruct((by[k], 1 << k), jnp.uint32))
            col_idxs.append(
                jax.ShapeDtypeStruct((min(1 << k, b_col),), jnp.int32))
        if k < max_log:
            wit_mats.append(
                jax.ShapeDtypeStruct((1 << (k + 1), 8), jnp.uint32))
            wit_idxs.append(
                jax.ShapeDtypeStruct((min(1 << (k + 1), b_wit),), jnp.int32))
    axes = (1,) * len(col_mats) + (0,) * len(wit_mats)
    return col_mats + wit_mats, col_idxs + wit_idxs, axes


def decommit_shapes(sig, n_queries: int,
                    include_values: bool = True) -> List[tuple]:
    """Future shapes of decommit_async(tree, ..., n_queries=...) for a tree
    of signature [(level, n_cols), ...], in PendingDecommitment.futures()
    order (column gathers by level descending, then witness gathers by level
    descending). Lets warmup precompile the batched pull executable without
    building the tree."""
    by = dict(sig)
    max_log = max(by)
    b_col = 1 << max(0, 4 * n_queries - 1).bit_length()
    b_wit = 2 * b_col
    shapes = ([(min(1 << k, b_col), by[k]) for k in sorted(by, reverse=True)]
              if include_values else [])
    shapes += [(min(1 << (k + 1), b_wit), 8)
               for k in range(max_log - 1, -1, -1)]
    return shapes


def decommit(tree: MerkleTree, queries) -> MerkleDecommitment:
    """Produce the witness for query positions: either a list of positions at
    the deepest level, or a dict {level: positions} (explicit per-level)."""
    return decommit_async(tree, queries).finalize()


class MerkleVerificationError(Exception):
    pass


def verify(
    root: bytes,
    column_log_sizes: Dict[int, int],
    queries,
    decommitment: MerkleDecommitment,
    max_log: int | None = None,
) -> Dict[int, List[List[int]]]:
    """Verify a decommitment against `root`.

    column_log_sizes: level -> number of columns at that level.
    queries: deepest-level positions or explicit {level: positions}.
    Returns the verified column values (level -> per-column values at the
    level's needed positions) for use by the FRI/quotient checks.
    Raises MerkleVerificationError on any mismatch.
    """
    if max_log is None:
        max_log = max(column_log_sizes)
    needed = _needed_positions(queries, max_log)
    witness = iter(decommitment.witness_hashes)
    prev_hashes: Dict[int, bytes] = {}

    import hashlib

    for k in range(max_log, -1, -1):
        n_cols = column_log_sizes.get(k, 0)
        vals = decommitment.column_values.get(k, [])
        if len(vals) != n_cols or any(len(v) != len(needed[k]) for v in vals):
            raise MerkleVerificationError(f"bad column values at level {k}")
        # per-position value bytes in one numpy pass (the per-cell
        # int.to_bytes loop dominated host verify at ~100-column levels)
        if vals:
            arr = np.array(vals, dtype=np.uint64)
            if (arr >> 32).any():
                # out-of-range cells must fail hard, exactly like the old
                # per-cell int.to_bytes(4) (silent wrapping would admit
                # equivalent encodings of one witness — malleability)
                raise MerkleVerificationError(
                    f"column value out of range at level {k}")
            val_bytes = np.ascontiguousarray(arr.T.astype("<u4"))
        cur: Dict[int, bytes] = {}
        for pi, p in enumerate(needed[k]):
            msg = b""
            if k < max_log:
                for child in (2 * p, 2 * p + 1):
                    if child in prev_hashes:
                        msg += prev_hashes[child]
                    else:
                        try:
                            msg += next(witness)
                        except StopIteration:
                            raise MerkleVerificationError("witness exhausted")
            if vals:
                msg += val_bytes[pi].tobytes()
            cur[p] = hashlib.blake2s(msg).digest()
        prev_hashes = cur

    if next(witness, None) is not None:
        raise MerkleVerificationError("unused witness hashes")
    if prev_hashes.get(0) != root:
        raise MerkleVerificationError("root mismatch")
    return decommitment.column_values
