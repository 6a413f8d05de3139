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


def _dedup(args: tuple):
    """Flatten an args pytree keeping RowRefs as leaves, deduplicating their
    base matrices BY IDENTITY: N RowRefs into one (C, 2^23) level matrix
    otherwise lower as N separate 800 MB executable parameters — the XLA
    AOT compiler sums parameters as if they were distinct buffers and
    rejects big-trace programs for phantom HBM (measured: the big22
    quotient executable declared 51.6 GB of arguments for ~3 GB of real
    buffers). Plain array leaves pass through un-deduplicated (warmup
    thunks may share placeholder objects where the prove passes distinct
    arrays; aliasing them would fork the jit cache key)."""
    leaves, treedef = jax.tree_util.tree_flatten(
        args, is_leaf=lambda x: isinstance(x, RowRef))
    arrays = []
    base_index: dict = {}
    desc = []
    for leaf in leaves:
        if isinstance(leaf, RowRef):
            key = id(leaf.mat)
            if key not in base_index:
                base_index[key] = len(arrays)
                arrays.append(leaf.mat)
            desc.append(("r", base_index[key], leaf.idx))
        else:
            desc.append(("a", len(arrays)))
            arrays.append(leaf)
    return tuple(arrays), (treedef, tuple(desc))


def _restore(arrays: tuple, skel):
    treedef, desc = skel
    leaves = [RowRef(arrays[d[1]], d[2]) if d[0] == "r" else arrays[d[1]]
              for d in desc]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class dedup_jit:
    """jax.jit with RowRef-base deduplication at the call boundary.

    Drop-in for ``@jax.jit`` on functions whose positional args carry
    RowRefs (constraints, quotients, sampling, extends). Supports
    static_argnums (hashable positional statics, folded into the skeleton)
    and .lower(*args).compile() for AOT warmup — the lowered signature is
    identical to the call path's, so the jit/persistent cache entries
    match."""

    def __init__(self, fn=None, *, static_argnums=()):
        self._static = tuple(static_argnums)
        if fn is None:
            self._fn = None
        else:
            self._wrap(fn)

    def __call__(self, *args):
        if self._fn is None:  # decorator-with-arguments form
            self._wrap(args[0])
            return self
        arrays, skel = self._split(args)
        return self._inner(arrays, skel)

    def _wrap(self, fn):
        self._fn = fn
        self.__name__ = getattr(fn, "__name__", "dedup_jit")

        def core(arrays, skel):
            statics, inner_skel = skel
            dyn = _restore(arrays, inner_skel)
            it = iter(dyn)
            full = []
            si = dict(statics)
            n_total = len(dyn) + len(si)
            for i in range(n_total):
                full.append(si[i] if i in si else next(it))
            return fn(*full)

        core.__name__ = self.__name__
        self._inner = jax.jit(core, static_argnums=(1,))

    def _split(self, args):
        statics = tuple((i, args[i]) for i in self._static)
        dyn = tuple(a for i, a in enumerate(args) if i not in self._static)
        arrays, inner_skel = _dedup(dyn)
        return arrays, (statics, inner_skel)

    def lower(self, *args):
        arrays, skel = self._split(args)
        return self._inner.lower(arrays, skel)
