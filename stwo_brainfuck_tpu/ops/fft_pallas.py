"""Fused circle-FFT Pallas kernels (docs/FFT_FUSION_PLAN.md) — hybrid form.

The staged XLA path (core/fft.py) materializes the array between every
butterfly stage: ~n HBM round trips for a size-2^n transform. The hybrid
here fuses ALL high stages (L >= 7, i.e. n-7 of the n stages) into one
VMEM-resident Pallas kernel; the 7 low stages (lane-dim strides, which
Mosaic would relayout heavily) stay on a single fused XLA executable.
HBM round trips: 2 (kernel) + 7 (XLA lo) instead of n.

High-stage butterflies on the (A, 128) view (j = a*128 + b, storage is
bit-reversed; stage L pairs rows at stride s = 2^(L-7), same lane; the
twiddle j >> (L+1) depends only on the row's block):

    tb    = x * t             (t = per-row pair twiddle, an (A, 1) slice)
    lower = x + roll(tb, -s)  (a + t*b)
    upper = roll(x, s) - tb   (a - t*b)
    x     = where(row & s == 0, lower, upper)

— one modular multiply per element per stage, two cyclic sublane rolls, one
select; no reshapes, no concatenates (Mosaic rejects trailing-1 reshapes
and pays relayouts for collapse/expand forms — the first, fully-fused
attempt was 10x slower than XLA because of them).

The M31 product is the 16-bit limb decomposition of ops/m31_pallas.py.
Supported on TPU for MIN_LOG <= log <= MAX_LOG; everything else falls back
to the staged XLA path. Batched (C, N) inputs grid over C.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import fft
from ..core.m31 import P_INT
from .m31_pallas import _mul_body, _on_tpu

_LANES = 128
_LOG_LANES = 7
# 19+ crashes the TPU compile helper (deeply unrolled big-VMEM kernel);
# measured wins at 14..18: eval 1.18x, interp 1.26x vs the staged XLA path
MIN_LOG, MAX_LOG = 14, 18


def _addmod(a, b):
    s = a + b
    s = (s & np.uint32(P_INT)) + (s >> 31)
    return jnp.where(s >= np.uint32(P_INT), s - np.uint32(P_INT), s)


def _submod(a, b):
    return _addmod(a, np.uint32(P_INT) - b)


@lru_cache(maxsize=16)
def _row_twiddles(log_size: int, inverse: bool) -> np.ndarray:
    """THI_T (A, n_hi): column k = stage L_k = n-1-k's per-row pair twiddle
    THI_T[a, k] = tw[L_k][a >> (L_k - 6)] (2-D so the kernel slices an
    (A, 1) column — no reshape)."""
    n = log_size
    A = 1 << (n - _LOG_LANES)
    tw = fft.get_twiddles(n)
    stages = tw.inv if inverse else tw.fwd
    n_hi = n - _LOG_LANES
    out = np.empty((A, n_hi), np.uint32)
    a = np.arange(A)
    for k, L in enumerate(range(n - 1, _LOG_LANES - 1, -1)):
        out[:, k] = stages[L][a >> (L - _LOG_LANES + 1)]
    return out


def _make_hi_kernel(n: int, inverse: bool):
    from jax.experimental.pallas import tpu as pltpu

    A = 1 << (n - _LOG_LANES)

    def kernel(x_ref, tw_ref, o_ref):
        x = x_ref[0]
        iota = jax.lax.broadcasted_iota(jnp.uint32, (A, _LANES), 0)
        if inverse:
            stage_order = range(_LOG_LANES, n)          # low -> high
        else:
            stage_order = range(n - 1, _LOG_LANES - 1, -1)
        for L in stage_order:
            k = n - 1 - L
            s = 1 << (L - _LOG_LANES)
            t = tw_ref[:, k:k + 1]                      # (A, 1)
            sel = (iota & np.uint32(s)) == 0
            up = pltpu.roll(x, A - s, axis=0)           # row a -> x[a+s]
            down = pltpu.roll(x, s, axis=0)             # row a -> x[a-s]
            if inverse:
                # lower: a+b ; upper: (a-b)*itw
                x = jnp.where(sel, _addmod(x, up),
                              _mul_body(_submod(down, x), t))
            else:
                tb = _mul_body(x, t)
                tb_up = pltpu.roll(tb, A - s, axis=0)
                x = jnp.where(sel, _addmod(x, tb_up), _submod(down, tb))
        o_ref[0] = x

    return kernel


@partial(jax.jit, static_argnames=("n", "inverse", "interpret"))
def _hi_stages_call(values, tw, n: int, inverse: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A = 1 << (n - _LOG_LANES)
    C = values.shape[0]
    kernel = _make_hi_kernel(n, inverse)
    n_hi = n - _LOG_LANES

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, A, _LANES), jnp.uint32),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, A, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, n_hi), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values.reshape(C, A, _LANES), tw)
    return out.reshape(C, 1 << n)


@partial(jax.jit, static_argnames=("n",))
def _lo_eval_jit(v, fwd_tw, n: int):
    """Fused XLA low stages 6..0 of the forward transform."""
    for L in reversed(range(_LOG_LANES)):
        blocks = 1 << (n - 1 - L)
        vv = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
        a = vv[..., 0, :]
        b = vv[..., 1, :]
        from ..core import m31

        tb = m31.mul(b, fwd_tw[L].reshape((blocks, 1)))
        v = jnp.stack([m31.add(a, tb), m31.sub(a, tb)],
                      axis=-2).reshape(v.shape[:-1] + (1 << n,))
    return v


@partial(jax.jit, static_argnames=("n",))
def _lo_interp_jit(v, inv_tw, n: int):
    """Fused XLA low stages 0..6 of the inverse transform (no final scale —
    the high-stage kernel's caller applies 1/2^n)."""
    from ..core import m31

    for L in range(_LOG_LANES):
        blocks = 1 << (n - 1 - L)
        vv = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
        a = vv[..., 0, :]
        b = vv[..., 1, :]
        s = m31.add(a, b)
        d = m31.mul(m31.sub(a, b), inv_tw[L].reshape((blocks, 1)))
        v = jnp.stack([s, d], axis=-2).reshape(v.shape[:-1] + (1 << n,))
    return v


def _supported(log_size: int) -> bool:
    return MIN_LOG <= log_size <= MAX_LOG


def available(log_size: int) -> bool:
    return _on_tpu() and _supported(log_size)


def evaluate(coeffs: jnp.ndarray, log_size: int, interpret: bool = False) -> jnp.ndarray:
    """Hybrid pallas/XLA circle-FFT evaluate; same contract as
    fft.evaluate. coeffs: (C, 2^n) or (2^n,)."""
    n = log_size
    squeeze = coeffs.ndim == 1
    mat = coeffs[None] if squeeze else coeffs
    tw = jnp.asarray(_row_twiddles(n, False))
    mid = _hi_stages_call(mat, tw, n, False, interpret)
    out = _lo_eval_jit(mid, fft._device_twiddles(n)[0], n)
    return out[0] if squeeze else out


def interpolate(values: jnp.ndarray, log_size: int, interpret: bool = False) -> jnp.ndarray:
    """Hybrid pallas/XLA circle-FFT interpolate; same contract as
    fft.interpolate."""
    from ..core import m31

    n = log_size
    squeeze = values.ndim == 1
    mat = values[None] if squeeze else values
    mid = _lo_interp_jit(mat, fft._device_twiddles(n)[1], n)
    tw = jnp.asarray(_row_twiddles(n, True))
    out = _hi_stages_call(mid, tw, n, True, interpret)
    scale = np.uint32(pow((P_INT + 1) // 2, n, P_INT))
    out = m31.mul(out, scale)
    return out[0] if squeeze else out
