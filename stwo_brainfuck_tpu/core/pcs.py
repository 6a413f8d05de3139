"""Polynomial commitment scheme: per-phase commitment trees with blowup,
OODS sampling, and query decommitment.

TPU-native equivalent of stwo's CommitmentSchemeProver/Verifier
(reference usage: crates/brainfuck_prover/src/brainfuck_air/mod.rs:486-500,
:744-786). Each phase (preprocessed / main / interaction / composition)
commits one Merkle tree over all its columns, each column low-degree-extended
by the blowup and injected at its own tree level.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

import jax

from . import fft, merkle
from .circle import point_at_index, secure_point_add, secure_point_from_m31, M31_CIRCLE_LOG_ORDER
from .rowref import RowRef


@jax.jit
def _row_mat_jit(col):
    """(N,) column -> (1, N) level matrix (an eager col[None] is one
    broadcast executable per shape on the cold path; this one is shared and
    AOT-warmable)."""
    return col[None]


@dataclass
class PcsConfig:
    log_blowup: int = 1
    n_queries: int = 20
    pow_bits: int = 10
    log_max_rows: int = 24

    def mix_into(self, channel) -> None:
        channel.mix_u32s([self.log_blowup, self.n_queries, self.pow_bits, self.log_max_rows])

    def to_json(self):
        return {
            "log_blowup": self.log_blowup,
            "n_queries": self.n_queries,
            "pow_bits": self.pow_bits,
            "log_max_rows": self.log_max_rows,
        }

    @staticmethod
    def from_json(obj) -> "PcsConfig":
        return PcsConfig(**obj)


# Commitment level at or above which the extend results are synchronized
# before the Merkle dispatches are enqueued. The TPU relay virtualizes
# client buffers but pins every queued executable's args/outputs in HBM;
# a near-capacity prove (big22: 2^22 tables, composition committed at
# 2^24) queues the whole composition chain + commit without a sync point
# and runtime-OOMs the 15.75 GiB chip, while every piece fits comfortably
# alone. The barrier costs one relay round trip (~45 ms) and is never hit
# by normal-size workloads (fib19's top level is 2^20).
_SYNC_COMMIT_LOG = 24


@dataclass
class ColumnRecord:
    log_size: int                 # trace domain log
    coeffs: object                # (2^log,) M31 coefficients — array or RowRef
    extended: object              # (2^(log+blowup),) evaluation — array or RowRef


class TreeProver:
    """One committed phase: extend columns, commit, sample, decommit."""

    def __init__(self, columns: Sequence[Tuple[int, jnp.ndarray]], config: PcsConfig,
                 channel, ops=None):
        """columns: list of (log_size, trace-domain evaluation). Columns of a
        common size are batched through one interpolate/extend FFT.

        ops: optional backend (parallel.prove.ShardedOps) providing
        interpolate/evaluate/commit for multi-device proving; None = the
        single-chip fft/merkle modules. The produced roots/records are
        bit-identical either way."""
        self.config = config
        commit = ops.commit if ops else merkle.commit
        groups: Dict[int, List[int]] = {}
        for i, (log_size, _) in enumerate(columns):
            groups.setdefault(log_size, []).append(i)
        coeffs_all: Dict[int, jnp.ndarray] = {}
        ext_all: Dict[int, jnp.ndarray] = {}
        extend = ops.extend_with_coeffs if ops else fft.extend_with_coeffs
        for log_size, idxs in groups.items():
            vals = [columns[i][1] for i in idxs]
            if all(isinstance(v, np.ndarray) for v in vals):
                # host-side stack -> single upload instead of one per column
                mat = jnp.asarray(np.stack(vals).astype(np.uint32))
            else:
                # device-resident columns (or RowRefs): stacked INSIDE the
                # extend executable (an eager jnp.stack is a separate compile
                # + relay round trip per size group on the cold path) — both
                # the single-chip and the sharded extend accept the tuple
                mat = tuple(v if isinstance(v, RowRef)
                            else jnp.asarray(v, jnp.uint32) for v in vals)
            # fused interpolate+pad+evaluate: one executable per group
            coeffs, ext = extend(mat, log_size, config.log_blowup)
            coeffs_all[log_size] = coeffs
            ext_all[log_size] = ext
        self.records: List[ColumnRecord] = []
        pos: Dict[int, int] = {k: 0 for k in groups}
        for log_size, _ in columns:
            j = pos[log_size]
            pos[log_size] = j + 1
            # deferred rows: consumers slice inside their executables
            # (an eager mat[j] is one lax.slice executable per row cold
            # plus a relay dispatch per record warm)
            self.records.append(ColumnRecord(
                log_size, RowRef(coeffs_all[log_size], j),
                RowRef(ext_all[log_size], j)))
        # one (C, N) matrix per level — the whole size group, in record order
        by_level = {lg + config.log_blowup: ext_all[lg] for lg in groups}
        if max(by_level) >= _SYNC_COMMIT_LOG:
            jax.block_until_ready(list(ext_all.values()))
        from .devchan import DeviceChannel

        if isinstance(channel, DeviceChannel):
            # device-resident transcript: the root stays on device (mixed as
            # its (1, 8) word row); the caller batches the root pull with
            # the rest of the prove's outputs and fills self.tree.root then
            assert ops is None, "device channel is the single-chip path"
            self.tree = commit(by_level, pull_root=False)
            channel.mix_root(self.tree.layers[0])
        else:
            self.tree = commit(by_level)
            channel.mix_root(self.tree.root)

    @classmethod
    def from_records(cls, records: List["ColumnRecord"], config: PcsConfig,
                     ops=None) -> "TreeProver":
        """Commit a tree from precomputed (coeffs, extended) records —
        used by the closed-form is_first ladder, which needs no CFFT."""
        self = object.__new__(cls)
        self.config = config
        self.records = list(records)
        by_level: Dict[int, jnp.ndarray] = {}
        for rec in self.records:
            lvl = rec.log_size + config.log_blowup
            assert lvl not in by_level, "from_records: one column per level"
            by_level[lvl] = _row_mat_jit(rec.extended)
        commit = ops.commit if ops else merkle.commit
        self.tree = commit(by_level)
        return self

    @property
    def root(self) -> bytes:
        return self.tree.root

    def decommit(self, positions_by_level: Dict[int, List[int]]) -> merkle.MerkleDecommitment:
        return merkle.decommit(self.tree, positions_by_level)

    def column_levels(self) -> Dict[int, int]:
        by_level: Dict[int, int] = {}
        for rec in self.records:
            lvl = rec.log_size + self.config.log_blowup
            by_level[lvl] = by_level.get(lvl, 0) + 1
        return by_level


def shifted_point(z, log_size: int, shift: int):
    """z - shift * g_{log_size} (the mask offset point for prefix-sum
    columns). g is the trace-domain step, index 2^(31-log_size)."""
    if shift == 0:
        return z
    idx = (-shift * (1 << (M31_CIRCLE_LOG_ORDER - log_size))) % (1 << M31_CIRCLE_LOG_ORDER)
    return secure_point_add(z, secure_point_from_m31(point_at_index(idx)))


def query_positions_by_level(
    queries: Sequence[int], s_max: int, levels: Sequence[int]
) -> Dict[int, List[int]]:
    """For each commitment level, the projected query positions expanded to
    their radix-4 fold QUAD (the FRI verifier folds twice per committed
    layer, and mid-layer injections consume the whole quad)."""
    out: Dict[int, List[int]] = {}
    for s in levels:
        if s > s_max:
            # deeper than any FRI input (unopened ladder sizes): nothing is
            # queried there — their digests enter via witness hashes.
            continue
        out[s] = sorted({((q >> (s_max - s)) & ~3) + j
                         for q in queries for j in range(4)})
    return out
