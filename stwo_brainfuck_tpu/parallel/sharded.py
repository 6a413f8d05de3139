"""Row-sharded proving steps (shard_map over a device mesh).

The reference is single-process (SURVEY.md §2.5: stwo's rayon under a cargo
feature); the distributed axis is new here. Layout: inside the sharded
region all columns are in coset LINEAR order (row r <-> point q(1+2r)), so

- LogUp fractions and AIR constraints are pointwise -> embarrassingly
  parallel across row shards;
- the LogUp prefix sum is a local cumsum + an all_gather of per-shard totals
  (exclusive offset) — one small collective;
- the S(p - g) mask needs only the LAST element of the left neighbor shard —
  one ppermute;
- the claimed sum is a psum of shard totals.

Bit-reversal/commitment order is applied outside the sharded region (at FFT
and Merkle time).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import m31, qm31
from ..framework.component import Component, Evaluator, _device_combine, _qm31_cumsum
from .mesh import ROW_AXIS


def sharded_prove_step(mesh: Mesh, component_cls, log_size: int):
    """Build a jitted, mesh-sharded step for one component:
    main columns (linear order) -> (interaction columns, claimed sum,
    constraint evaluations on the trace domain).

    This is the multi-chip analog of build_interaction_trace +
    evaluate_constraints_device fused into one SPMD program.
    """
    comp = component_cls(log_size)
    n = 1 << log_size

    col_spec = P(ROW_AXIS)
    qm_spec = P(None, ROW_AXIS)

    in_specs = (
        {name: col_spec for name in comp.columns},  # main columns
        {k: {"alpha_powers": P(None, None), "z": P(None)}
         for k in ("memory", "instruction", "processor")},
        col_spec,                                   # is_first (linear)
    )
    out_specs = (qm_spec, P(None), P(None, None, ROW_AXIS))

    def step(main_cols, elements_dev, is_first):
        axis_n = jax.lax.axis_size(ROW_AXIS)
        rank = jax.lax.axis_index(ROW_AXIS)

        # --- LogUp fractions (pointwise) ---
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

        # --- prefix sum across shards ---
        local_cum = _qm31_cumsum(total)                      # (4, n/d)
        local_total = local_cum[:, -1]                       # (4,)
        all_totals = jax.lax.all_gather(local_total, ROW_AXIS)  # (d, 4)
        mask = (jnp.arange(axis_n) < rank).astype(jnp.uint32)
        offset = None
        for d in range(all_totals.shape[0]):
            term = m31.mul(all_totals[d], jnp.broadcast_to(mask[d], (4,)))
            offset = term if offset is None else m31.add(offset, term)
        s_local = m31.add(local_cum, offset[:, None])

        # claimed sum = sum of every shard's total (psum over M31 vectors
        # is NOT modular; reduce via gathered totals instead)
        claimed = None
        for d in range(all_totals.shape[0]):
            claimed = all_totals[d] if claimed is None else m31.add(claimed, all_totals[d])

        # --- S(p - g): previous element in linear order; the first element
        # of each shard comes from the left neighbor's last (cyclically) ---
        left_last = jax.lax.ppermute(
            s_local[:, -1:], ROW_AXIS,
            [(i, (i + 1) % axis_n) for i in range(axis_n)],
        )
        s_prev = jnp.concatenate([left_last, s_local[:, :-1]], axis=1)

        # --- constraints (pointwise) ---
        ev2 = Evaluator(comp, main_cols, q_cols + [s_local], s_prev,
                        is_first, claimed[:, None], elements_dev, host=False)
        comp.define_constraints(ev2)
        cons = jnp.stack([c._qm().v for c in ev2.constraints])  # (C, 4, n/d)
        return s_local, claimed, cons

    sharded = shard_map(step, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded), comp
