"""Deferred rows of device matrices.

The PCS keeps each size group's columns as ONE (C, N) device matrix (batched
CFFT, one Merkle injection). Consumers (constraints, OODS sampling,
quotients) want individual rows; slicing them out eagerly costs one
lax.slice executable per (shape, row) — the row offset is baked into the
eager program — plus a relay dispatch per record. A RowRef defers the slice:
the matrix is the only pytree leaf and the row index is AUX DATA (static),
so consumer jits resolve `mat[idx]` at trace time — zero extra executables,
zero extra dispatches, and XLA fuses the static slice into the consumer
program."""

from __future__ import annotations

from dataclasses import dataclass

import jax


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RowRef:
    mat: object   # (C, N) device matrix (jnp.ndarray or tracer)
    idx: int      # static row index

    def resolve(self):
        return self.mat[self.idx]

    def tree_flatten(self):
        return (self.mat,), self.idx

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def as_row(x):
    """Resolve a RowRef to its row; pass plain arrays through."""
    return x.resolve() if isinstance(x, RowRef) else x
