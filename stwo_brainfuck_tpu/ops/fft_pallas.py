"""Fused multi-stage circle-FFT Pallas kernels (docs/FFT_FUSION_PLAN.md).

The staged XLA path (core/fft.py) materializes the array between every
butterfly stage: ~n HBM round trips for a size-2^n transform. These kernels
run ALL stages of one transform inside VMEM — one HBM read and one write.

Layout algebra (storage is bit-reversed; stage L pairs stride 2^L):
the flat array is viewed as an (A, 128) matrix, j = a*128 + b.

- HIGH stages (L >= 7): pairs are rows at row-stride 2^(L-7), same lane.
  The stage twiddle index j >> (L+1) depends only on the row, so twiddles
  pre-broadcast to per-row vectors THI[k, a] = tw[L_k][a >> (L_k - 6)]
  (host-side, cached per size).
- LOW stages (L < 7): pairs sit within a row at lane-stride 2^L. ONE VMEM
  transpose to (128, A) turns them into row-stride butterflies; the twiddle
  t = j >> (L+1) = a*2^(6-L) + (b >> (L+1)) becomes the transposed matrix
  TLO_L[g, a] = tw[L][a*2^(6-L) + g], packed (127, A) over all 7 stages.

Everything is sublane-dim reshapes + elementwise u32 VPU ops (the M31
product is the 16-bit limb decomposition of ops/m31_pallas.py) + a single
transpose each way — no lane-dim shuffles.

Supported: 12 <= log_size <= 19 on TPU (whole transform + twiddles fit
VMEM); other sizes and other backends fall back to the staged XLA path.
Batched (C, N) inputs grid over C.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import fft, m31
from ..core.m31 import P_INT
from .m31_pallas import _mul_body, _on_tpu

_LANES = 128
_LOG_LANES = 7
MIN_LOG, MAX_LOG = 14, 19


def _addmod(a, b):
    s = a + b
    s = (s & np.uint32(P_INT)) + (s >> 31)
    return jnp.where(s >= np.uint32(P_INT), s - np.uint32(P_INT), s)


def _submod(a, b):
    return _addmod(a, np.uint32(P_INT) - b)


@lru_cache(maxsize=16)
def _packed_twiddles(log_size: int, inverse: bool):
    """(TBLK (A//2, n_hi), TLO (127, A)) host arrays for the fused kernel.

    TBLK[:, k] holds stage L_k = n-1-k's per-block twiddles in its first
    2^(n-1-L_k) rows (2-D so the kernel takes a plain (blocks, 1) slice —
    Mosaic rejects trailing-1 reshapes of 1-D vectors). TLO packs the
    transposed low-stage twiddles: rows (2^(6-L) - 1) .. (2^(5-L) * 2 - 1)
    hold TLO_L[g, a] = tw[L][a * 2^(6-L) + g].
    """
    n = log_size
    A = 1 << (n - _LOG_LANES)
    tw = fft.get_twiddles(n)
    stages = tw.inv if inverse else tw.fwd
    n_hi = n - _LOG_LANES
    tblk = np.zeros((A // 2, max(n_hi, 1)), np.uint32)
    for k, L in enumerate(range(n - 1, _LOG_LANES - 1, -1)):
        blocks = 1 << (n - 1 - L)
        tblk[:blocks, k] = stages[L][:blocks]
    tlo = np.empty((127, A), np.uint32)
    off = 0
    for L in range(_LOG_LANES - 1, -1, -1):
        g_count = 1 << (_LOG_LANES - 1 - L)   # 2^(6-L)
        a = np.arange(A)[None, :]
        g = np.arange(g_count)[:, None]
        tlo[off:off + g_count] = stages[L][a * g_count + g]
        off += g_count
    assert off == 127
    return tblk, tlo


def _eval_stages_hi(x, tblk, n, A):
    """Forward butterflies for stages n-1 .. 7 on the (A, 128) view.
    2-D forms only: leading-dim collapse, lane slices at 128-multiples,
    (blocks, 1) twiddle broadcast."""
    for k, L in enumerate(range(n - 1, _LOG_LANES - 1, -1)):
        s = 1 << (L - _LOG_LANES)
        blocks = A // (2 * s)
        w = s * _LANES
        v = x.reshape(blocks, 2 * w)
        a_, b_ = v[:, :w], v[:, w:]
        t = tblk[:blocks, k:k + 1]                    # (blocks, 1)
        tb = _mul_body(b_, t)
        x = jnp.concatenate([_addmod(a_, tb), _submod(a_, tb)],
                            axis=1).reshape(A, _LANES)
    return x


def _eval_stages_lo(y, tlo, A):
    """Forward butterflies for stages 6 .. 0 on the transposed (128, A)."""
    off = 0
    for L in range(_LOG_LANES - 1, -1, -1):
        g_count = 1 << (_LOG_LANES - 1 - L)
        s = 1 << L
        t_g = tlo[off:off + g_count]                  # (g_count, A)
        off += g_count
        w = s * A
        v = y.reshape(g_count, 2 * w)
        a_, b_ = v[:, :w], v[:, w:]
        # trailing (i, a) layout is i-major: tile the A-vector s times
        t = t_g if s == 1 else jnp.concatenate([t_g] * s, axis=1)
        tb = _mul_body(b_, t)
        y = jnp.concatenate([_addmod(a_, tb), _submod(a_, tb)],
                            axis=1).reshape(_LANES, A)
    return y


def _interp_stages_lo(y, tlo, A):
    """Inverse butterflies for stages 0 .. 6 on the transposed (128, A)."""
    for L in range(0, _LOG_LANES):
        g_count = 1 << (_LOG_LANES - 1 - L)
        s = 1 << L
        # tlo rows for stage L start after all stages > L
        off = (1 << (_LOG_LANES - 1 - L)) - 1
        t_g = tlo[off:off + g_count]
        w = s * A
        v = y.reshape(g_count, 2 * w)
        a_, b_ = v[:, :w], v[:, w:]
        t = t_g if s == 1 else jnp.concatenate([t_g] * s, axis=1)
        ssum = _addmod(a_, b_)
        d = _mul_body(_submod(a_, b_), t)
        y = jnp.concatenate([ssum, d], axis=1).reshape(_LANES, A)
    return y


def _interp_stages_hi(x, tblk, n, A):
    """Inverse butterflies for stages 7 .. n-1 on the (A, 128) view."""
    for L in range(_LOG_LANES, n):
        k = n - 1 - L   # tblk columns are ordered stage n-1 .. 7
        s = 1 << (L - _LOG_LANES)
        blocks = A // (2 * s)
        w = s * _LANES
        v = x.reshape(blocks, 2 * w)
        a_, b_ = v[:, :w], v[:, w:]
        t = tblk[:blocks, k:k + 1]
        ssum = _addmod(a_, b_)
        d = _mul_body(_submod(a_, b_), t)
        x = jnp.concatenate([ssum, d], axis=1).reshape(A, _LANES)
    return x


def _make_eval_kernel(n: int):
    A = 1 << (n - _LOG_LANES)

    def kernel(x_ref, thi_ref, tlo_ref, o_ref):
        x = _eval_stages_hi(x_ref[0], thi_ref[:], n, A)
        y = _eval_stages_lo(x.T, tlo_ref[:], A)
        o_ref[0] = y.T

    return kernel


def _make_interp_kernel(n: int):
    A = 1 << (n - _LOG_LANES)
    scale = np.uint32(pow((P_INT + 1) // 2, n, P_INT))

    def kernel(x_ref, thi_ref, tlo_ref, o_ref):
        y = _interp_stages_lo(x_ref[0].T, tlo_ref[:], A)
        x = _interp_stages_hi(y.T, thi_ref[:], n, A)
        o_ref[0] = _mul_body(x, jnp.full((A, _LANES), scale, jnp.uint32))

    return kernel


@partial(jax.jit, static_argnames=("n", "inverse", "interpret"))
def _fft_pallas_call(values, thi, tlo, n: int, inverse: bool,
                     interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A = 1 << (n - _LOG_LANES)
    C = values.shape[0]
    kernel = (_make_interp_kernel if inverse else _make_eval_kernel)(n)
    n_hi = max(n - _LOG_LANES, 1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, A, _LANES), jnp.uint32),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, A, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A // 2, n_hi), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((127, A), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values.reshape(C, A, _LANES), thi, tlo)
    return out.reshape(C, 1 << n)


def _supported(log_size: int) -> bool:
    return MIN_LOG <= log_size <= MAX_LOG


def evaluate(coeffs: jnp.ndarray, log_size: int, interpret: bool = False) -> jnp.ndarray:
    """Fused-pallas circle-FFT evaluate; same contract as fft.evaluate.
    coeffs: (C, 2^n) or (2^n,)."""
    squeeze = coeffs.ndim == 1
    mat = coeffs[None] if squeeze else coeffs
    thi, tlo = _packed_twiddles(log_size, False)
    out = _fft_pallas_call(mat, jnp.asarray(thi), jnp.asarray(tlo),
                           log_size, False, interpret)
    return out[0] if squeeze else out


def interpolate(values: jnp.ndarray, log_size: int, interpret: bool = False) -> jnp.ndarray:
    """Fused-pallas circle-FFT interpolate; same contract as
    fft.interpolate."""
    squeeze = values.ndim == 1
    mat = values[None] if squeeze else values
    thi, tlo = _packed_twiddles(log_size, True)
    out = _fft_pallas_call(mat, jnp.asarray(thi), jnp.asarray(tlo),
                           log_size, True, interpret)
    return out[0] if squeeze else out


def available(log_size: int) -> bool:
    return _on_tpu() and _supported(log_size)
