"""ShardedOps: the multi-device backend for prove_brainfuck.

The reference parallelizes its whole prover with one cargo feature flag
(stwo's rayon backend, crates/brainfuck_prover/Cargo.toml:13). The TPU
analog is this backend object: `prove_brainfuck(machine, mesh=mesh)` routes
every heavy phase through SPMD kernels over a jax.sharding.Mesh:

- LogUp fractions + prefix sums  -> shard_map (all_gather of shard totals,
  the seam pattern of parallel/sharded.py);
- CFFT interpolate/extend        -> parallel/fft_sharded.py (ppermute
  butterfly exchanges for the cross-shard stages);
- Merkle commitment              -> parallel/merkle_sharded.commit_sharded
  (subtree roots all_gathered, top levels replicated);
- composition constraint eval    -> pointwise shard_map per component;
- quotient accumulation          -> sharded weighted-reduction kernels;
- FRI folds                      -> pointwise shard_map (pairs are adjacent
  in bit-reversed storage, so folds never cross a shard boundary until the
  layer is smaller than the mesh — then it finishes replicated).

All arithmetic is exact mod-p integer math, so the proof bytes are identical
to the single-chip proof for ANY device count (tested for 1/2/8 in
tests/test_parallel.py — the shard-count-invariance acceptance criterion of
SURVEY.md §7 step 10).

Arrays with fewer than 2 rows per device stay on the single-chip path (the
top FRI layers, tiny tables); they are latency-, not throughput-bound.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import fft, fri, m31, merkle, qm31, quotients
from ..framework.component import (
    Component,
    Evaluator,
    LookupElements,
    _device_combine,
    _device_perm,
    _qm31_cumsum,
)
from .fft_sharded import make_sharded_evaluate, make_sharded_interpolate
from .merkle_sharded import commit_sharded
from .mesh import ROW_AXIS

_ELEMENT_KEYS = ("memory", "instruction", "processor")


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


# ---------------------------------------------------------------------------
# Sharded kernels (cached per mesh/component/size)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _fractions_fn(mesh: Mesh, cls, log_size: int):
    """LogUp fraction columns Q_k = num_k / den_k, pointwise over row shards
    (the heavy half of the interaction build; the prefix-sum seam runs in
    _cumsum_fn)."""
    comp = cls(log_size)
    col_spec = P(ROW_AXIS)
    in_specs = (
        {name: col_spec for name in comp.columns},
        {k: {"alpha_powers": P(None, None), "z": P(None)} for k in _ELEMENT_KEYS},
        col_spec,  # is_first
    )
    n_rel = comp.relation_count()
    out_specs = ([P(None, ROW_AXIS)] * n_rel, P(None, ROW_AXIS))

    def step(main_cols, elements_dev, is_first):
        ev = Evaluator(comp, main_cols, [], None, is_first, None,
                       elements_dev, host=False)
        ev.finalize_logup = lambda: None  # type: ignore[method-assign]
        comp.define_constraints(ev)
        q_cols = []
        total = None
        for rel in ev.relations:
            den = _device_combine(elements_dev[rel.elements_name],
                                  [v.v for v in rel.values])
            q = qm31.mul(rel.numerator._qm().v, qm31.inv(den))
            q_cols.append(q)
            total = q if total is None else qm31.add(total, q)
        return q_cols, total

    return jax.jit(shard_map(step, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False))


@lru_cache(maxsize=8)
def _cumsum_fn(mesh: Mesh):
    """Sharded modular prefix sum over axis 1 of a (4, N) array in LINEAR
    order: local cumsum + all_gather of shard totals for the offsets."""
    D = _mesh_size(mesh)

    def step(x):
        local = _qm31_cumsum(x)
        totals = jax.lax.all_gather(local[:, -1], ROW_AXIS)   # (D, 4)
        rank = jax.lax.axis_index(ROW_AXIS)
        mask = (jnp.arange(D) < rank).astype(jnp.uint32)
        offset = None
        for d in range(D):
            term = m31.mul(totals[d], jnp.broadcast_to(mask[d], (4,)))
            offset = term if offset is None else m31.add(offset, term)
        return m31.add(local, offset[:, None])

    return jax.jit(shard_map(step, mesh=mesh, in_specs=(P(None, ROW_AXIS),),
                             out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=128)
def _sharded_constraints_fn(mesh: Mesh, cls, log_size: int):
    """Pointwise composition contribution over the blown-up domain, sharded
    by rows (mirror of framework._constraints_fn)."""
    comp = cls(log_size)
    n_inter = comp.relation_count() + 1
    in_specs = (
        {name: P(ROW_AXIS) for name in comp.columns},     # extended main
        [P(None, ROW_AXIS)] * n_inter,                    # extended interaction
        P(None, ROW_AXIS),                                # s_prev
        P(ROW_AXIS),                                      # is_first ext
        P(None),                                          # claimed sum (4,)
        {k: {"alpha_powers": P(None, None), "z": P(None)} for k in _ELEMENT_KEYS},
        P(None, None),                                    # alpha powers (C, 4)
        P(ROW_AXIS),                                      # v_inv
    )

    def step(main_cols, interaction_cols, s_prev, is_first, claimed_sum,
             elements_dev, alpha_powers, v_inv):
        claimed = jnp.reshape(claimed_sum, (4, 1))
        ev = Evaluator(comp, main_cols, interaction_cols, s_prev, is_first,
                       claimed, elements_dev, host=False)
        comp.define_constraints(ev)
        acc = None
        for i, c in enumerate(ev.constraints):
            aw = jnp.reshape(alpha_powers[i], (4, 1))
            if c.qm:
                term = qm31.mul(aw, c.v)
            else:
                term = m31.mul(aw, c.v[None])
            acc = term if acc is None else qm31.add(acc, term)
        return qm31.mul_m31(acc, v_inv)

    fn = jax.jit(shard_map(step, mesh=mesh, in_specs=in_specs,
                           out_specs=P(None, ROW_AXIS), check_vma=False))
    return fn, comp.constraint_count()


@lru_cache(maxsize=8)
def _weighted_fn(mesh: Mesh):
    def step(cols, weights):
        prods = m31.mul(weights.T[:, :, None], cols[None, :, :])  # (4, C, n)
        acc = prods
        while acc.shape[1] > 1:
            c = acc.shape[1]
            if c % 2:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((4, 1, acc.shape[2]), jnp.uint32)], axis=1)
            acc = m31.add(acc[:, 0::2], acc[:, 1::2])
        return acc[:, 0]

    return jax.jit(shard_map(step, mesh=mesh,
                             in_specs=(P(None, ROW_AXIS), P(None, None)),
                             out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=8)
def _point_group_fn(mesh: Mesh):
    def step(wf, a_const, b_const, dy, dx, vc, px, py):
        def c(v):
            return v.reshape(4, 1)

        num = qm31.sub(wf, qm31.add(c(a_const),
                                    qm31.mul(c(b_const), qm31.from_m31(py))))
        van = qm31.add(
            qm31.sub(qm31.mul(c(dy), qm31.from_m31(px)),
                     qm31.mul(c(dx), qm31.from_m31(py))),
            c(vc),
        )
        return qm31.mul(num, qm31.inv(van))

    specs = (P(None, ROW_AXIS),) + (P(None),) * 5 + (P(ROW_AXIS), P(ROW_AXIS))
    return jax.jit(shard_map(step, mesh=mesh, in_specs=specs,
                             out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=8)
def _fold_fn(mesh: Mesh):
    def step(values, itw, beta):
        a = values[:, 0::2]
        b = values[:, 1::2]
        s = qm31.mul_m31(m31.add(a, b), jnp.uint32(fri._INV2))
        d = qm31.mul_m31(m31.sub(a, b), itw)
        return qm31.add(s, qm31.mul(beta.reshape(4, 1), d))

    return jax.jit(shard_map(step, mesh=mesh,
                             in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P(None)),
                             out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=32)
def _sharded_fft(mesh: Mesh, log_size: int, inverse: bool, batched: bool):
    if inverse:
        return make_sharded_interpolate(mesh, log_size, batched=batched)
    return make_sharded_evaluate(mesh, log_size, batched=batched)


@lru_cache(maxsize=64)
def _inv_perm(log_size: int) -> np.ndarray:
    """Storage position -> linear index (inverse of coset_order_permutation)."""
    return np.argsort(fft.coset_order_permutation(log_size)).astype(np.uint32)


# ---------------------------------------------------------------------------
# The backend object
# ---------------------------------------------------------------------------

class ShardedOps:
    """Multi-device implementations of the prove-pipeline primitives.

    Anything smaller than 2 rows/device falls back to the single-chip path
    (identical values either way)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.D = _mesh_size(mesh)
        self.split_log = int(np.log2(self.D))
        assert (1 << self.split_log) == self.D, "mesh size must be a power of 2"

    def _shardable(self, log_size: int) -> bool:
        return log_size >= self.split_log + 1

    # -- FFT ---------------------------------------------------------------

    def interpolate(self, values: jnp.ndarray, log_size: int) -> jnp.ndarray:
        if not self._shardable(log_size):
            return fft.interpolate(values, log_size)
        return _sharded_fft(self.mesh, log_size, True, values.ndim == 2)(values)

    def evaluate(self, coeffs: jnp.ndarray, log_size: int) -> jnp.ndarray:
        if not self._shardable(log_size):
            return fft.evaluate(coeffs, log_size)
        return _sharded_fft(self.mesh, log_size, False, coeffs.ndim == 2)(coeffs)

    # -- Merkle ------------------------------------------------------------

    def commit(self, columns_by_log: Dict[int, List[jnp.ndarray]]) -> merkle.MerkleTree:
        if not self._shardable(max(columns_by_log)):
            return merkle.commit(columns_by_log)
        return commit_sharded(self.mesh, columns_by_log)

    # -- LogUp interaction -------------------------------------------------

    def interaction(
        self,
        component: Component,
        main_cols: Dict[str, jnp.ndarray],
        elements: Dict[str, LookupElements],
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """Sharded equivalent of build_interaction_trace_async."""
        from ..framework.component import build_interaction_trace_async

        log_size = component.log_size
        if not self._shardable(log_size):
            return build_interaction_trace_async(component, main_cols, elements)
        n = 1 << log_size
        els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
                   for k, e in elements.items()}
        is_first = jnp.zeros(n, jnp.uint32).at[0].set(1)
        fn = _fractions_fn(self.mesh, type(component), log_size)
        q_cols, total = fn(main_cols, els_dev, is_first)
        # prefix sum in coset linear order; the permutation is a global
        # shuffle (all-to-all), applied outside the pointwise kernels
        lin = jnp.take(total, _device_perm(log_size), axis=1)
        s_lin = _cumsum_fn(self.mesh)(lin)
        claimed = s_lin[:, -1]
        s = jnp.take(s_lin, jnp.asarray(_inv_perm(log_size)), axis=1)
        return list(q_cols) + [s], claimed

    # -- Composition -------------------------------------------------------

    def composition_contribution(
        self, component, ext_main, ext_inter, s_prev, isf_ext, claimed_sum,
        elements, alpha, alpha_offset, v_inv,
    ) -> Tuple[jnp.ndarray, int]:
        from ..framework.component import composition_contribution

        if not self._shardable(component.log_size):
            return composition_contribution(
                component, ext_main, ext_inter, s_prev, isf_ext, claimed_sum,
                elements, alpha, alpha_offset, v_inv)
        fn, n_cons = _sharded_constraints_fn(
            self.mesh, type(component), component.log_size)
        powers = np.empty((n_cons, 4), np.uint32)
        for i in range(n_cons):
            powers[i] = qm31.h_pow(alpha, alpha_offset + i)
        els_dev = {k: e.device() for k, e in elements.items()}
        out = fn(ext_main, list(ext_inter), s_prev, isf_ext,
                 jnp.asarray(np.array(claimed_sum, np.uint32)), els_dev,
                 jnp.asarray(powers), v_inv)
        return out, alpha_offset + n_cons

    # -- Quotients ---------------------------------------------------------

    def weighted_columns(self, cols: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        if not self._shardable(int(cols.shape[-1]).bit_length() - 1):
            return quotients._weighted_columns(cols, weights)
        return _weighted_fn(self.mesh)(cols, weights)

    def point_group_quotient(self, wf, a_const, b_const, dy, dx, vc, px, py):
        if not self._shardable(int(px.shape[-1]).bit_length() - 1):
            return quotients._point_group_quotient(
                wf, a_const, b_const, dy, dx, vc, px, py)
        return _point_group_fn(self.mesh)(wf, a_const, b_const, dy, dx, vc, px, py)

    # -- FRI ---------------------------------------------------------------

    def fold(self, values: jnp.ndarray, itw, beta) -> jnp.ndarray:
        n_pairs = values.shape[1] // 2
        if n_pairs < 2 * self.D:
            return fri._fold(values, itw, beta)
        return _fold_fn(self.mesh)(
            values, jnp.asarray(itw), jnp.asarray(np.array(beta, np.uint32)))
