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
from ..core.rowref import dedup_jit
from ..framework.component import (
    Component,
    Evaluator,
    LookupElements,
    _device_combine,
    _device_perm,
    _qm31_cumsum,
)
from .fft_sharded import (
    make_sharded_evaluate,
    make_sharded_interpolate,
    pallas_env_key,
)
from .merkle_sharded import commit_sharded
from .mesh import ROW_AXIS

_ELEMENT_KEYS = ("memory", "instruction", "processor")


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


# ---------------------------------------------------------------------------
# Sharded kernels (cached per mesh/component/size)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _interaction_full_fn(mesh: Mesh, cls, log_size: int):
    """The WHOLE interaction build for one component in ONE executable:
    LogUp fractions (pointwise over row shards), the linear-order
    permutation (a global gather), the sharded prefix sum, and the scatter
    back to storage order. Main columns arrive as RowRefs into the uploaded
    (k, N) component matrix, resolved at trace time — the previous design's
    eager mat[i] slices / takes / claimed-sum slicing cost a dispatch (and a
    cold compile) each (VERDICT r2 weak #4)."""
    comp = cls(log_size)
    D = _mesh_size(mesh)
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

    fractions = shard_map(step, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)

    def cumsum_step(x):
        local = _qm31_cumsum(x)
        totals = jax.lax.all_gather(local[:, -1], ROW_AXIS)   # (D, 4)
        rank = jax.lax.axis_index(ROW_AXIS)
        mask = (jnp.arange(D) < rank).astype(jnp.uint32)
        offset = None
        for d in range(D):
            term = m31.mul(totals[d], jnp.broadcast_to(mask[d], (4,)))
            offset = term if offset is None else m31.add(offset, term)
        return m31.add(local, offset[:, None])

    cumsum = shard_map(cumsum_step, mesh=mesh, in_specs=(P(None, ROW_AXIS),),
                       out_specs=P(None, ROW_AXIS), check_vma=False)

    # dedup_jit, not jax.jit: the RowRef main columns share one (k, N) base
    # matrix — plain jit lowers it as k separate executable parameters, the
    # phantom-HBM AOT accounting problem dedup_jit fixes on the single-chip
    # path (a big22 executable declared 51.6 GB for ~3 GB real).
    @dedup_jit
    def fn(main_cols, elements_dev, perm, inv_perm):
        from ..core.rowref import as_row

        main_cols = {k: as_row(v) for k, v in main_cols.items()}
        n = 1 << log_size
        is_first = jnp.zeros(n, jnp.uint32).at[0].set(1)
        q_cols, total = fractions(main_cols, elements_dev, is_first)
        lin = jnp.take(total, perm, axis=1)
        s_lin = cumsum(lin)
        claimed = s_lin[:, -1]
        s = jnp.take(s_lin, inv_perm, axis=1)
        return q_cols, s, claimed

    return fn


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

    sharded = shard_map(step, mesh=mesh, in_specs=in_specs,
                        out_specs=P(None, ROW_AXIS), check_vma=False)

    @dedup_jit  # RowRef bases (per-tree level matrices) fold to one param
    def fn(main_cols, interaction_cols, s_prev, is_first, claimed_sum,
           elements_dev, alpha_powers, v_inv):
        from ..framework.component import _normalize_inter

        # main/interaction columns arrive as RowRefs / coord tuples /
        # (coords, perm) exactly like the single-chip path — the slices,
        # stacks, and the prefix-sum rotation resolve inside this jit
        main_cols, interaction_cols, s_prev = _normalize_inter(
            main_cols, interaction_cols, s_prev)
        return sharded(main_cols, interaction_cols, s_prev, is_first,
                       claimed_sum, elements_dev, alpha_powers, v_inv)

    return fn, comp.constraint_count()


def _weighted_step(cols, weights):
    prods = m31.mul(weights.T[:, :, None], cols[None, :, :])  # (4, C, n)
    acc = prods
    while acc.shape[1] > 1:
        c = acc.shape[1]
        if c % 2:
            acc = jnp.concatenate(
                [acc, jnp.zeros((4, 1, acc.shape[2]), jnp.uint32)], axis=1)
        acc = m31.add(acc[:, 0::2], acc[:, 1::2])
    return acc[:, 0]


def _point_group_step(wf, a_const, b_const, dy, dx, vc, px, py):
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


@lru_cache(maxsize=32)
def _accumulate_all_fn(mesh: Mesh, idx_groups: tuple):
    """ALL quotient point groups of one commitment size in ONE executable
    (mesh analog of quotients._accumulate_all_jit): in-jit RowRef resolution
    + column stacking, sharded weighted reductions, sharded per-group
    quotients, final accumulation."""
    from ..core.quotients import _COL_CHUNK

    weighted = shard_map(_weighted_step, mesh=mesh,
                         in_specs=(P(None, ROW_AXIS), P(None, None)),
                         out_specs=P(None, ROW_AXIS), check_vma=False)
    pg_specs = (P(None, ROW_AXIS),) + (P(None),) * 5 + (P(ROW_AXIS),
                                                        P(ROW_AXIS))
    point_group = shard_map(_point_group_step, mesh=mesh, in_specs=pg_specs,
                            out_specs=P(None, ROW_AXIS), check_vma=False)

    @dedup_jit  # quotient columns are RowRefs into shared per-tree matrices
    def fn(cols, consts, w, px, py):
        from ..core.rowref import as_row

        acc = None
        off = 0
        for gi, idxs in enumerate(idx_groups):
            wf = None
            for start in range(0, len(idxs), _COL_CHUNK):
                sel = idxs[start:start + _COL_CHUNK]
                mat = jnp.stack([as_row(cols[ci]) for ci in sel])
                part = weighted(mat, w[off:off + len(sel)])
                off += len(sel)
                wf = part if wf is None else qm31.add(wf, part)
            q = point_group(wf, consts[gi, 0], consts[gi, 1], consts[gi, 2],
                            consts[gi, 3], consts[gi, 4], px, py)
            acc = q if acc is None else qm31.add(acc, q)
        return acc

    return fn


def _fold_step(values, itw, beta):
    a = values[:, 0::2]
    b = values[:, 1::2]
    s = qm31.mul_m31(m31.add(a, b), jnp.uint32(fri._INV2))
    d = qm31.mul_m31(m31.sub(a, b), itw)
    return qm31.add(s, qm31.mul(beta.reshape(4, 1), d))


@lru_cache(maxsize=8)
def _fold_fn(mesh: Mesh):
    return jax.jit(shard_map(_fold_step, mesh=mesh,
                             in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P(None)),
                             out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=8)
def _fold2_fn(mesh: Mesh):
    """Two folds (beta, then beta2) in ONE executable — radix-4 layer body.
    Both folds stay intra-shard: fold pairs are adjacent in bit-reversed
    storage, so a shard's contiguous chunk folds to a contiguous chunk."""
    def step(values, itw1, itw2, beta, beta2):
        return _fold_step(_fold_step(values, itw1, beta), itw2, beta2)

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(None),
                  P(None)),
        out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=8)
def _fold_add_fn(mesh: Mesh):
    """Circle-fold an injected FRI input and add it to the accumulator in
    ONE executable (mesh analog of fri._fold_add_jit)."""
    def step(values, itw, beta, cur):
        return qm31.add(cur, _fold_step(values, itw, beta))

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P(None), P(None, ROW_AXIS)),
        out_specs=P(None, ROW_AXIS), check_vma=False))


@lru_cache(maxsize=32)
def _sharded_fft_impl(mesh: Mesh, log_size: int, inverse: bool,
                      batched: bool, env_key: tuple):
    if inverse:
        return make_sharded_interpolate(mesh, log_size, batched=batched)
    return make_sharded_evaluate(mesh, log_size, batched=batched)


def _sharded_fft(mesh: Mesh, log_size: int, inverse: bool, batched: bool):
    return _sharded_fft_impl(mesh, log_size, inverse, batched,
                             pallas_env_key())


@lru_cache(maxsize=64)
def _extend_fn_impl(mesh: Mesh, log_size: int, blow: int, env_key: tuple):
    """Fused sharded interpolate -> zero-pad -> evaluate (the mesh analog of
    fft.extend_with_coeffs): ONE executable per size group instead of eager
    stack / interpolate / pad / evaluate dispatches. `values` may be a tuple
    of (N,) columns / RowRefs, stacked in-executable."""
    interp = make_sharded_interpolate(mesh, log_size, batched=True)
    evaluate = make_sharded_evaluate(mesh, log_size + blow, batched=True)

    @dedup_jit  # extend columns arrive as RowRefs into one upload matrix
    def fn(values):
        from ..core.rowref import as_row

        if isinstance(values, tuple):
            values = jnp.stack([as_row(v) for v in values])
        coeffs = interp(values)
        pad = (1 << (log_size + blow)) - (1 << log_size)
        ext = evaluate(jnp.pad(coeffs, ((0, 0), (0, pad))))
        return coeffs, ext

    return fn


def _extend_fn(mesh: Mesh, log_size: int, blow: int):
    return _extend_fn_impl(mesh, log_size, blow, pallas_env_key())


@lru_cache(maxsize=16)
def _combine_eval_fn_impl(mesh: Mesh, sizes: tuple, counts: tuple,
                          comp_log: int, split_log: int, env_key: tuple):
    """Fused composition combine for the mesh path (the analog of
    air._combine_eval_jit): per-size contribution sums, per-size sharded
    interpolates, zero-pad + modular add into the top block, and the
    composition-domain evaluate — ONE executable."""
    interps = {}
    for lg in sizes:
        if lg >= split_log + 1:
            interps[lg] = make_sharded_interpolate(mesh, lg, batched=True)
    evaluate = make_sharded_evaluate(mesh, comp_log, batched=True)

    @jax.jit
    def fn(acc_lists: tuple, small_tws: dict):
        from ..core import fft

        total = jnp.zeros((4, 1 << comp_log), jnp.uint32)
        for lg, cnt, arrs in zip(sizes, counts, acc_lists):
            arr = arrs[0]
            for a in arrs[1:]:
                arr = qm31.add(arr, a)
            if lg in interps:
                coeffs = interps[lg](arr)
            else:
                coeffs = fft._interpolate_body(arr, small_tws[lg], lg)
            pad = (1 << comp_log) - (1 << lg)
            total = m31.add(total, jnp.pad(coeffs, ((0, 0), (0, pad))))
        return evaluate(total)

    return fn


def _combine_eval_fn(mesh: Mesh, sizes: tuple, counts: tuple, comp_log: int,
                     split_log: int):
    return _combine_eval_fn_impl(mesh, sizes, counts, comp_log, split_log,
                                 pallas_env_key())


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

    def extend_with_coeffs(self, values, log_size: int, blow: int):
        """Fused interpolate+pad+evaluate over the mesh (columns may be a
        tuple of RowRefs, stacked in-executable)."""
        if not self._shardable(log_size):
            return fft.extend_with_coeffs(values, log_size, blow)
        return _extend_fn(self.mesh, log_size, blow)(values)

    def combine_eval(self, acc: Dict[int, list], comp_log: int):
        """Fused per-size sum + interpolate + pad-add + top evaluate."""
        sizes = tuple(sorted(acc))
        counts = tuple(len(acc[lg]) for lg in sizes)
        small_tws = {lg: fft._device_twiddles(lg)[1] for lg in sizes
                     if lg < self.split_log + 1}
        fn = _combine_eval_fn(self.mesh, sizes, counts, comp_log,
                              self.split_log)
        return fn(tuple(tuple(acc[lg]) for lg in sizes), small_tws)

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
        """Sharded equivalent of build_interaction_trace_async; ONE
        executable per (component structure, size) — fractions, permutation,
        sharded prefix sum, and scatter fused."""
        from ..framework.component import build_interaction_trace_async

        log_size = component.log_size
        if not self._shardable(log_size):
            return build_interaction_trace_async(component, main_cols, elements)
        els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
                   for k, e in elements.items()}
        fn = _interaction_full_fn(self.mesh, type(component), log_size)
        q_cols, s, claimed = fn(main_cols, els_dev, _device_perm(log_size),
                                jnp.asarray(_inv_perm(log_size)))
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

    def accumulate_all(self, log_size: int, cols: tuple, consts, w,
                       idx_groups: tuple):
        """Fused quotient accumulation for one commitment size (columns may
        be RowRefs, resolved in-executable)."""
        px, py = quotients._dev_points(log_size)
        if not self._shardable(log_size):
            return quotients._accumulate_all_jit(
                cols, jnp.asarray(consts), jnp.asarray(w), px, py, idx_groups)
        fn = _accumulate_all_fn(self.mesh, idx_groups)
        return fn(cols, jnp.asarray(consts), jnp.asarray(w), px, py)

    # -- FRI ---------------------------------------------------------------

    def fold(self, values: jnp.ndarray, itw, beta) -> jnp.ndarray:
        n_pairs = values.shape[1] // 2
        if n_pairs < 2 * self.D:
            return fri._fold(values, itw, beta)
        return _fold_fn(self.mesh)(
            values, jnp.asarray(itw), jnp.asarray(np.array(beta, np.uint32)))

    def fold2(self, values: jnp.ndarray, itw1, itw2, beta, beta2) -> jnp.ndarray:
        """Two folds fused (radix-4 layer body)."""
        b = jnp.asarray(np.array(beta, np.uint32))
        b2 = jnp.asarray(np.array(beta2, np.uint32))
        if values.shape[1] // 4 < 2 * self.D:
            return fri._fold2_jit(values, jnp.asarray(itw1),
                                  jnp.asarray(itw2), b, b2)
        return _fold2_fn(self.mesh)(values, jnp.asarray(itw1),
                                    jnp.asarray(itw2), b, b2)

    def fold_add(self, values: jnp.ndarray, itw, beta, cur) -> jnp.ndarray:
        """Fold an injected input and add to the accumulator, fused."""
        b = jnp.asarray(np.array(beta, np.uint32))
        if values.shape[1] // 2 < 2 * self.D:
            return fri._fold_add_jit(values, jnp.asarray(itw), b, cur)
        return _fold_add_fn(self.mesh)(values, jnp.asarray(itw), b, cur)
