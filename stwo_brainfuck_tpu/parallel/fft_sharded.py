"""Sharded circle FFT: evaluation/interpolation over a device mesh.

The evaluation array (bit-reversed storage) is split into contiguous chunks
of N/D positions per device. Stage L has butterfly stride 2^L:

- local stages (2^(L+1) <= N/D): blocks never cross a shard boundary; the
  butterflies and twiddle slices are fully local (identical code to the
  single-chip FFT on the chunk);
- cross stages (2^L >= N/D, the top log2(D) stages): each shard's positions
  all share one block and one twiddle; partners are shards i and i^dist with
  dist = 2^L/(N/D). One ppermute exchanges partner chunks per stage (rides
  ICI neighbor links for adjacent dist), the lower shard computes u0 = a+t*b,
  the upper u1 = a-t*b.

This is SURVEY.md §7 step 10 (stage-sharded CFFT, butterfly stages exchanged
over the interconnect).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import m31
from ..core.fft import get_twiddles
from ..core.m31 import P_INT
from .mesh import ROW_AXIS


@lru_cache(maxsize=32)
def _cross_twiddles(log_size: int, n_devices: int, inverse: bool) -> np.ndarray:
    """Per-shard twiddle scalar for each cross stage.

    Returns (n_cross, D) where entry [k, i] is the stage-(n-1-k) twiddle for
    shard i (for the inverse FFT: 1/t; the /2 normalization is applied
    globally)."""
    n = log_size
    local_log = n - int(np.log2(n_devices))
    tw = get_twiddles(n)
    cross = []
    for L in range(n - 1, local_log - 1, -1):
        vals = np.empty(n_devices, np.uint32)
        for i in range(n_devices):
            pos = i << local_log
            t = pos >> (L + 1)
            vals[i] = tw.fwd[L][t]
        cross.append(m31.np_inv(vals) if inverse else vals)
    return np.stack(cross) if cross else np.zeros((0, n_devices), np.uint32)


@lru_cache(maxsize=32)
def _shard_pallas_tables(log_size: int, n_devices: int, inverse: bool):
    """Stacked per-shard Pallas twiddle tables for the LOCAL stages.

    Shard i's chunk is positions [i*2^local, (i+1)*2^local); its local stage
    L (< local_log) twiddle blocks are the contiguous slice
    st[L][i*2^(local-1-L) : (i+1)*2^(local-1-L)] of the global bit-reversed
    stage array (storage is bit-reversed, so contiguous chunks = contiguous
    twiddle blocks). Returns host (D, ...) stacks of fft_pallas tables,
    sharded on the leading axis inside the shard_map."""
    from ..ops import fft_pallas

    n = log_size
    D = n_devices
    local = n - int(np.log2(D))
    tw = get_twiddles(n)
    st = tw.inv if inverse else tw.fwd
    outs = []
    for i in range(D):
        stages_i = [
            st[L][i * (1 << (local - 1 - L)):(i + 1) * (1 << (local - 1 - L))]
            for L in range(local)
        ]
        outs.append(fft_pallas._tables_from_stages(stages_i, local))
    return tuple(np.stack([o[k] for o in outs]) for k in range(3))


def _use_local_pallas(local_log: int) -> bool:
    """Route the sharded transform's local stages through the fused Pallas
    kernels when the per-shard size supports them (same policy switch as the
    single-chip path; interpret mode is used by tests via
    STWO_BF_SHARDED_PALLAS=interpret)."""
    import os

    from ..core import fft as fft_mod

    if os.environ.get("STWO_BF_SHARDED_PALLAS") == "interpret":
        from ..ops import fft_pallas

        return fft_pallas._supported(local_log)
    return fft_mod._use_pallas(local_log)


def _pallas_interpret() -> bool:
    import os

    return os.environ.get("STWO_BF_SHARDED_PALLAS") == "interpret"


def pallas_env_key() -> tuple:
    """The environment flags the sharded-transform builders depend on —
    consumers that lru_cache a built transform must include this in their
    key (the builders read the flags at BUILD time)."""
    import os

    return (os.environ.get("STWO_BF_SHARDED_PALLAS"),
            os.environ.get("STWO_BF_PALLAS_FFT"))


@lru_cache(maxsize=32)
def _local_twiddles(log_size: int, n_devices: int, inverse: bool):
    """Sharded twiddle arrays for the local stages: for stage L, the full
    fwd[L]/inv[L] array (length 2^(n-1-L) >= D) — sharded along the axis."""
    n = log_size
    local_log = n - int(np.log2(n_devices))
    tw = get_twiddles(n)
    out = []
    for L in range(local_log - 1, -1, -1):
        out.append(tw.inv[L] if inverse else tw.fwd[L])
    return out  # ordered stage L = local_log-1 .. 0


def make_sharded_evaluate(mesh: Mesh, log_size: int, batched: bool = False):
    """Returns a jitted fn: coefficients (natural order, sharded) ->
    evaluation (bit-reversed storage, sharded).

    batched=True accepts (C, N) matrices (sharded along N — the batched form
    used by the sharded TreeProver extends); False accepts (N,) vectors."""
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = log_size
    local_log = n - int(np.log2(D))
    assert 1 << (n - local_log) == D and local_log >= 1

    cross_tw = jnp.asarray(_cross_twiddles(n, D, False))     # (n_cross, D)
    use_pallas = _use_local_pallas(local_log)
    if use_pallas:
        local_tabs = [jnp.asarray(t)
                      for t in _shard_pallas_tables(n, D, False)]
        local_specs = [P(ROW_AXIS, *([None] * (t.ndim - 1)))
                       for t in local_tabs]
    else:
        local_tabs = [jnp.asarray(t) for t in _local_twiddles(n, D, False)]
        local_specs = [P(ROW_AXIS) for _ in local_tabs]

    spec = P(None, ROW_AXIS) if batched else P(ROW_AXIS)

    def step(v, cross_t, *loc_tw):
        me = jax.lax.axis_index(ROW_AXIS)
        # cross stages: n-1 down to local_log
        for k, L in enumerate(range(n - 1, local_log - 1, -1)):
            dist = 1 << (L - local_log)
            partner_perm = [(i, i ^ dist) for i in range(D)]
            other = jax.lax.ppermute(v, ROW_AXIS, partner_perm)
            t_me = cross_t[k, me]
            is_lower = (me & dist) == 0
            # lower shard: a = v, b = other -> u0 = a + t b
            # upper shard: a = other, b = v -> u1 = a - t b
            tb_low = m31.mul(other, t_me)
            u0 = m31.add(v, tb_low)
            tb_high = m31.mul(v, t_me)
            u1 = m31.sub(other, tb_high)
            v = jnp.where(is_lower, u0, u1)
        if use_pallas:
            # local stages as the fused two-pass Pallas transform on the
            # shard's chunk (VERDICT r2 weak #4: the mesh path previously
            # ran staged XLA — 11x slower than the fused kernels)
            from ..ops import fft_pallas

            mat = v if v.ndim == 2 else v[None]
            out = fft_pallas._transform_body(
                mat, loc_tw[0][0], loc_tw[1][0], loc_tw[2][0], local_log,
                False, _pallas_interpret())
            return out if v.ndim == 2 else out[0]
        # local stages: local_log-1 down to 0 (standard butterflies on chunk)
        for k, L in enumerate(range(local_log - 1, -1, -1)):
            tloc = loc_tw[k]
            blocks = tloc.shape[0]  # per-shard block count
            vv = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
            a = vv[..., 0, :]
            b = vv[..., 1, :]
            t = tloc.reshape(blocks, 1)
            tb = m31.mul(b, t)
            v = jnp.stack([m31.add(a, tb), m31.sub(a, tb)], axis=-2)
            v = v.reshape(v.shape[:-3] + (-1,))
        return v

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(spec, P(None, None)) + tuple(local_specs),
        out_specs=spec, check_vma=False,
    )

    def fn(coeffs):
        return sharded(coeffs, cross_tw, *local_tabs)

    return jax.jit(fn)


def make_sharded_interpolate(mesh: Mesh, log_size: int, batched: bool = False):
    """Inverse: evaluation (bit-reversed, sharded) -> coefficients (natural
    order, sharded). Local inverse stages first, then cross stages with
    ppermute exchanges, then the global 1/2^n scale."""
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = log_size
    local_log = n - int(np.log2(D))
    assert 1 << (n - local_log) == D and local_log >= 1

    cross_itw = jnp.asarray(_cross_twiddles(n, D, True))     # (n_cross, D)
    use_pallas = _use_local_pallas(local_log)
    if use_pallas:
        local_itws = [jnp.asarray(t)
                      for t in _shard_pallas_tables(n, D, True)]
        local_specs = [P(ROW_AXIS, *([None] * (t.ndim - 1)))
                       for t in local_itws]
    else:
        local_itws = [jnp.asarray(t) for t in _local_twiddles(n, D, True)]
        local_specs = [P(ROW_AXIS) for _ in local_itws]
    scale = np.uint32(pow((P_INT + 1) // 2, n, P_INT))

    spec = P(None, ROW_AXIS) if batched else P(ROW_AXIS)

    def step(v, cross_t, *loc_tw):
        me = jax.lax.axis_index(ROW_AXIS)
        if use_pallas:
            # local inverse stages as the fused Pallas transform (no local
            # normalization — the global 1/2^n scale is applied at the end)
            from ..ops import fft_pallas

            mat = v if v.ndim == 2 else v[None]
            out = fft_pallas._transform_body(
                mat, loc_tw[0][0], loc_tw[1][0], loc_tw[2][0], local_log,
                True, _pallas_interpret(), scale_log=0)
            v = out if v.ndim == 2 else out[0]
        else:
            # local inverse stages: 0 up to local_log-1
            for k, L in enumerate(range(0, local_log)):
                tloc = loc_tw[local_log - 1 - k]  # ordered local_log-1..0
                blocks = tloc.shape[0]
                vv = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
                a = vv[..., 0, :]
                b = vv[..., 1, :]
                it = tloc.reshape(blocks, 1)
                s = m31.add(a, b)
                d = m31.mul(m31.sub(a, b), it)
                v = jnp.stack([s, d], axis=-2).reshape(vv.shape[:-3] + (-1,))
        # cross inverse stages: local_log up to n-1
        for k, L in enumerate(range(local_log, n)):
            dist = 1 << (L - local_log)
            partner_perm = [(i, i ^ dist) for i in range(D)]
            other = jax.lax.ppermute(v, ROW_AXIS, partner_perm)
            ck = n - 1 - L  # cross_t rows are ordered stage n-1..local_log
            it_me = cross_t[ck, me]
            is_lower = (me & dist) == 0
            # lower holds a (u0), upper holds b (u1):
            # s = a + b (at lower), d = (a - b) * itw (at upper)
            s = m31.add(v, other)
            d_high = m31.mul(m31.sub(other, v), it_me)  # upper: (a - b)*itw
            v = jnp.where(is_lower, s, d_high)
        return m31.mul(v, jnp.uint32(scale))

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(spec, P(None, None)) + tuple(local_specs),
        out_specs=spec, check_vma=False,
    )

    def fn(values):
        return sharded(values, cross_itw, *local_itws)

    return jax.jit(fn)
