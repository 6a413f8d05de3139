"""Fused circle-FFT Pallas kernels — two-pass VMEM-resident form.

The staged XLA path (core/fft.py) materializes the array between every
butterfly stage: ~n HBM round trips for a size-2^n transform, measured at
~8 G butterflies/s (~31% of HBM peak across the strided stages). This module
runs the WHOLE transform in at most two Pallas passes, each of which keeps
its block resident in VMEM across all its butterfly stages:

  view x as (A1, A2, 128) with A1*A2*128 = 2^n, A2 <= 2^9:
  - pass 1 (only when A1 > 1): row stages with stride >= A2 rows. Grid over
    (a2-chunks, columns); each step loads the (A1, 8, 128) slab of rows
    {a1*A2 + a2}, does its n1 = log2(A1) butterfly stages as cyclic
    sublane rolls + selects, and writes it back.
  - pass 2: row stages with stride < A2 plus the 7 lane stages. Grid over
    (a1, columns); each step owns a contiguous (A2, 128) slab. Row
    butterflies roll axis 0; lane butterflies roll axis 1 with per-element
    expanded twiddles.

HBM round trips: 2 reads + 2 writes total (plus ~0.5x for twiddle blocks,
amortized across the column batch by making the column grid axis innermost —
Pallas skips re-DMAing a block whose index map output is unchanged between
consecutive steps) instead of n. Evaluate runs stages high -> low, the
inverse ascending, with the 1/2^n normalization folded into the final pass.

Per-pair twiddles (t[j] = stage_tw[j >> (L+1)] at element j) are precomputed
on host per (size, direction): row stages as (A1, A2, n_stages) tables whose
(..., 1) column slices broadcast across lanes; lane stages fully expanded to
(A1, 7, A2, 128) — pltpu.repeat is tile-concat, not elementwise, so the
compact form cannot be expanded in-kernel.

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
from ..core.rowref import dedup_jit
from .m31_pallas import _on_tpu

_LANES = 128
_LOG_LANES = 7
_MAX_LOG_A2 = 9     # pass-2 slab: up to (512, 128) = 256 KB in VMEM
_SUB = 8            # pass-2 packed-form row-stride floor (one sublane tile)


def _sub1(n: int) -> int:
    """Pass-1 a2-chunk (rows of the (A1, sub, 128) slab per grid step).
    Round 5 measurement (PERF.md §2): with the original fixed chunk of 8
    rows, n=18 pass 1 ran 512 grid steps of 16 KB / 2 stages each and
    sustained only 24 G butterflies/s (≈98 implied ALU-op equivalents per
    element-stage at the measured 4.7 T op/s VPU ceiling) while pass 2's
    32 steps of 256 KB ran at 104 G — the per-step DMA/prologue overhead
    dominated, not the butterfly math. Size the chunk so one block is
    ~512 KB (A1·sub·128·4 B), clamped to [8, A2]."""
    A1, A2, _, _ = _plan(n)
    target = max(1, (1 << 19) // (A1 * _LANES * 4))
    sub = 1 << max(3, target.bit_length() - 1)
    return min(sub, A2)
# MAX_LOG 24 covers the near-capacity workloads' FULL transform set: a 2^22
# table extends to 2^23, and the composition polynomial of 2^22-row
# components lives at 2^23 and COMMITS at 2^24 (big22's tree3 extend — the
# staged-XLA fallback scheduled ~12 GB of HLO temps at 2^23 and OOMed the
# 15.75 GB chip at 2^24). The n=24 lane-twiddle table costs 7·2^24·4 B =
# 448 MiB of HBM, paid only when a near-capacity proof touches that size.
MIN_LOG, MAX_LOG = 11, 24


# Lazy (semi-reduced) modular arithmetic: stage values live in [0, P]
# (canonical + the single alias P ≡ 0) and are canonicalized ONCE per pass.
# _fold maps [0, 2^32-2] -> [0, P] exactly ((x&P)+(x>>31) = 2^31 only for
# x = 2^32-1, which no path below can produce), so sums of two [0, P]
# values (<= 2P = 2^32-2) and the Mersenne fold of a 62-bit product both
# stay in range. Dropping the per-op canonicalization compare/select saves
# ~22 of the ~84 u32 ops per butterfly of the round-3 kernel (the measured
# 81 G butterflies/s matched that op count at the VPU issue rate almost
# exactly, so op count IS the lever).
_PC = np.uint32(0x7FFF_FFFF)


def _fold(x):
    return (x & _PC) + (x >> 31)


def _canon(x):
    return jnp.where(x >= _PC, x - _PC, x)


def _mul_semi(a, b):
    """M31 product of semi-reduced inputs (<= P), semi-reduced output.
    Same 16-bit limb scheme as m31_pallas._mul_body minus the final
    canonicalization: r = 2*hi + (lo>>31) + (lo&P) <= 2^32-4 for inputs
    <= P, so one _fold lands in [0, P]."""
    m16 = np.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> 16
    b0 = b & m16
    b1 = b >> 16
    t0 = a0 * b0
    t1 = a0 * b1 + a1 * b0
    t2 = a1 * b1
    t1_lo = t1 << 16
    lo = t0 + t1_lo
    carry = (lo < t1_lo).astype(jnp.uint32)
    hi = t2 + (t1 >> 16) + carry
    return _fold((hi << 1) + (lo >> 31) + (lo & _PC))


def _plan(n: int):
    """(A1, A2, n1, n2): row-block split of the (A, 128) view."""
    a_log = n - _LOG_LANES
    n2 = min(a_log, _MAX_LOG_A2)
    n1 = a_log - n2
    return 1 << n1, 1 << n2, n1, n2


def _tables_from_stages(st, n: int):
    """Host twiddle tables from an explicit stage list (st[L] has length
    2^(n-1-L), bit-reversed block order): (twr1 (A1, A2, n1),
    twr2 (A1, A2, n2), twl (A1, 7, A2, 128)). Row table column k holds stage
    L = n-1-k's per-row twiddle st[L][a >> (L-6)]; twl[:, L] holds stage L's
    per-element twiddle st[L][j >> (L+1)]. Shared by the single-chip tables
    and the per-shard tables of the sharded transform (parallel/
    fft_sharded.py), whose local stages use contiguous slices of the global
    twiddles."""
    A1, A2, n1, n2 = _plan(n)
    A = A1 * A2
    a = np.arange(A)
    twr = np.empty((A, n - _LOG_LANES), np.uint32)
    for k, L in enumerate(range(n - 1, _LOG_LANES - 1, -1)):
        twr[:, k] = st[L][a >> (L - (_LOG_LANES - 1))]
    twr = twr.reshape(A1, A2, n - _LOG_LANES)
    twr1 = np.ascontiguousarray(twr[:, :, :n1])
    twr2 = np.ascontiguousarray(twr[:, :, n1:])
    j = np.arange(A * _LANES, dtype=np.int64)
    twl = np.empty((A1, _LOG_LANES, A2, _LANES), np.uint32)
    for L in range(_LOG_LANES):
        plane = st[L][j >> (L + 1)].reshape(A1, A2, _LANES)
        if L >= _LANE_T_MIN and _lane_transposed(n2):
            # stages that run on the block-transposed slab store their
            # per-element twiddles pre-transposed (same block transpose)
            plane = plane.reshape(A1, A2 // _LANES, _LANES, _LANES) \
                .swapaxes(2, 3).reshape(A1, A2, _LANES)
        twl[:, L] = plane
    return twr1, twr2, twl


@lru_cache(maxsize=24)
def _tables(n: int, inverse: bool):
    tw = fft.get_twiddles(n)
    return _tables_from_stages(tw.inv if inverse else tw.fwd, n)


@lru_cache(maxsize=24)
def _row_tables(n: int, inverse: bool):
    """Host (twr1, twr2) only — the compact row-stage tables."""
    twr1, twr2, _ = _tables(n, inverse)
    return twr1, twr2


@partial(jax.jit, static_argnames=("n",))
def _expand_twl_jit(stages: tuple, n: int):
    """Expand the 7 compact lane-stage twiddle arrays (st[L], length
    2^(n-1-L)) into the (A1, 7, A2, 128) per-element table ON DEVICE:
    element j's stage-L twiddle is st[L][j >> (L+1)], i.e. each entry
    repeated 2^(L+1) times. Uploading the expanded table cost 28·2^n bytes
    per (size, direction) — 156 MB of the fib19 warmup's constant batch —
    vs 4·2^n compact."""
    A1, A2, _, n2 = _plan(n)
    outs = []
    for L in range(_LOG_LANES):
        full = jnp.repeat(stages[L], 1 << (L + 1))
        plane = full.reshape(A1, A2, _LANES)
        if L >= _LANE_T_MIN and _lane_transposed(n2):
            plane = jnp.swapaxes(
                plane.reshape(A1, A2 // _LANES, _LANES, _LANES), 2, 3
            ).reshape(A1, A2, _LANES)
        outs.append(plane)
    return jnp.stack(outs, axis=1)


def lane_stage_hosts(n: int, inverse: bool):
    """The 7 compact host lane-stage arrays feeding _expand_twl_jit."""
    tw = fft.get_twiddles(n)
    st = tw.inv if inverse else tw.fwd
    return [np.asarray(st[L]) for L in range(_LOG_LANES)]


_DEV_TABLES: dict = {}


def _dev_tables(n: int, inverse: bool):
    if (n, inverse) not in _DEV_TABLES:
        from ..utils.transfer import upload_many

        # eager even if first touched inside a jit trace (a traced creation
        # would cache tracers and leak); one upload RPC for the compact
        # tables, lane table expanded on device
        with jax.ensure_compile_time_eval():
            twr1, twr2 = _row_tables(n, inverse)
            devs = upload_many([twr1, twr2] + lane_stage_hosts(n, inverse))
            twl = _expand_twl_jit(tuple(devs[2:]), n)
            _DEV_TABLES[(n, inverse)] = (devs[0], devs[1], twl)
    return _DEV_TABLES[(n, inverse)]


def set_dev_tables(n: int, inverse: bool, twr1, twr2, lane_stages) -> None:
    """Populate the device-table cache from already-uploaded compact pieces
    (warmup's batched-constant lane)."""
    if (n, inverse) not in _DEV_TABLES:
        _DEV_TABLES[(n, inverse)] = (
            twr1, twr2, _expand_twl_jit(tuple(lane_stages), n))


def _bf_fwd(x, t, s, sel, axis):
    """(u, v) -> (u + t·v, u − t·v), semi-reduced in and out. The two
    branches share one folded add: base is u at BOTH positions of a pair
    (x at even, the roll-down at odd) and delta is ±t·v (the roll-up of the
    product at even, P − product at odd), so the butterfly costs one
    mul_semi + one fold-add + two rolls + three selects per element —
    down from mul + full addmod + full submod + select."""
    size = x.shape[axis]
    from jax.experimental.pallas import tpu as pltpu

    tb = _mul_semi(x, t)
    up = pltpu.roll(tb, size - s, axis=axis)     # pos i -> tb[i + s]
    down = pltpu.roll(x, s, axis=axis)           # pos i -> x[i - s]
    base = jnp.where(sel, x, down)               # u at both positions
    delta = jnp.where(sel, up, _PC - tb)         # +t·v / −t·v
    return _fold(base + delta)


def _bf_inv(x, t, s, sel, axis):
    """(u, v) -> (u + v, t·(u − v)), semi-reduced in and out."""
    size = x.shape[axis]
    from jax.experimental.pallas import tpu as pltpu

    up = pltpu.roll(x, size - s, axis=axis)
    down = pltpu.roll(x, s, axis=axis)
    add = _fold(x + up)                          # u + v at even positions
    sub = _mul_semi(_fold(down + (_PC - x)), t)  # t·(u − v) at odd
    return jnp.where(sel, add, sub)


# Pair-packed butterflies for TILE-ALIGNED leading-axis strides: when the
# pair stride is a whole number of (8, 128) vreg tiles, the u/v halves are
# block slices (vreg moves, ~free next to the ALU work) instead of rolls,
# and the M31 product runs on the v HALF only — the roll/select form above
# multiplies at BOTH positions of every pair and evaluates both branches,
# ~2x the essential ALU work. Packed applies to every pass-1 stage (axis-0
# elements are whole tiles) and pass-2 row stages with stride >= 8 rows;
# sub-tile row strides and the 7 lane stages keep the roll form.

def _bf_fwd_packed(x, t, s):
    sh = x.shape
    k = sh[0] // (2 * s)
    x4 = x.reshape((k, 2, s) + sh[1:])
    t4 = t.reshape((k, 2, s) + t.shape[1:])
    u, v, tv = x4[:, 0], x4[:, 1], t4[:, 1]
    w = _mul_semi(v, tv)
    lo = _fold(u + w)                            # u + t·v
    hi = _fold(u + (_PC - w))                    # u − t·v
    return jnp.stack([lo, hi], axis=1).reshape(sh)


def _bf_inv_packed(x, t, s):
    sh = x.shape
    k = sh[0] // (2 * s)
    x4 = x.reshape((k, 2, s) + sh[1:])
    t4 = t.reshape((k, 2, s) + t.shape[1:])
    u, v, tv = x4[:, 0], x4[:, 1], t4[:, 1]
    add = _fold(u + v)                           # u + v
    sub = _mul_semi(_fold(u + (_PC - v)), tv)    # t·(u − v)
    return jnp.stack([add, sub], axis=1).reshape(sh)


# Radix-4 pair-packed butterflies: TWO consecutive stages (strides 2s and s)
# in one pack/unpack. The slab reshape + 4 slices + one 4-way stack replace
# two (reshape + 2 slices + 2-way stack) rounds — the Mosaic relayout for
# the pack/unpack block slices was the named residue between the measured
# round-4 rate and its op-count prediction (PERF.md §2), and the ALU work
# (4 muls + 8 folded adds per 4 elements) is unchanged. Twiddle layout:
# the stride-2s stage's twiddle is constant across the quad (tA4[:, 2]);
# the stride-s stage has per-half twiddles (tB4[:, 1], tB4[:, 3]).

def _bf_fwd_packed4(x, tA, tB, s):
    """Forward stages stride 2s then s; `s` is the LOWER stride."""
    sh = x.shape
    k = sh[0] // (4 * s)
    x4 = x.reshape((k, 4, s) + sh[1:])
    tA4 = tA.reshape((k, 4, s) + tA.shape[1:])
    tB4 = tB.reshape((k, 4, s) + tB.shape[1:])
    q0, q1, q2, q3 = x4[:, 0], x4[:, 1], x4[:, 2], x4[:, 3]
    ta = tA4[:, 2]
    tb0, tb1 = tB4[:, 1], tB4[:, 3]
    w2 = _mul_semi(q2, ta)
    w3 = _mul_semi(q3, ta)
    a0 = _fold(q0 + w2)
    a2 = _fold(q0 + (_PC - w2))
    a1 = _fold(q1 + w3)
    a3 = _fold(q1 + (_PC - w3))
    u1 = _mul_semi(a1, tb0)
    u3 = _mul_semi(a3, tb1)
    r0 = _fold(a0 + u1)
    r1 = _fold(a0 + (_PC - u1))
    r2 = _fold(a2 + u3)
    r3 = _fold(a2 + (_PC - u3))
    return jnp.stack([r0, r1, r2, r3], axis=1).reshape(sh)


def _bf_inv_packed4(x, tB, tA, s):
    """Inverse stages stride s then 2s; `s` is the LOWER stride."""
    sh = x.shape
    k = sh[0] // (4 * s)
    x4 = x.reshape((k, 4, s) + sh[1:])
    tA4 = tA.reshape((k, 4, s) + tA.shape[1:])
    tB4 = tB.reshape((k, 4, s) + tB.shape[1:])
    q0, q1, q2, q3 = x4[:, 0], x4[:, 1], x4[:, 2], x4[:, 3]
    ta = tA4[:, 2]
    tb0, tb1 = tB4[:, 1], tB4[:, 3]
    b0 = _fold(q0 + q1)
    b1 = _mul_semi(_fold(q0 + (_PC - q1)), tb0)
    b2 = _fold(q2 + q3)
    b3 = _mul_semi(_fold(q2 + (_PC - q3)), tb1)
    r0 = _fold(b0 + b2)
    r2 = _mul_semi(_fold(b0 + (_PC - b2)), ta)
    r1 = _fold(b1 + b3)
    r3 = _mul_semi(_fold(b1 + (_PC - b3)), ta)
    return jnp.stack([r0, r1, r2, r3], axis=1).reshape(sh)


# Lane stages 3..6 (strides 8..64 across lanes) take the packed form too,
# via a per-(128, 128)-block transpose: lane pairs become tile-aligned row
# pairs, the four stages run packed on the transposed slab, and one
# transpose back restores the layout for the sub-tile stages 0..2. Applies
# when the slab has >= 128 rows (n >= 14); their twiddle planes are stored
# pre-transposed (_tables_from_stages / _expand_twl_jit).
_LANE_T_MIN = 3


def _lane_transposed(n2: int) -> bool:
    return (1 << n2) >= _LANES


def _blocks_T(x):
    """Transpose each (128, 128) block of a (k*128, 128) slab (involution)."""
    nb = x.shape[0] // _LANES
    xt = jnp.swapaxes(x.reshape(nb, _LANES, _LANES), 1, 2)
    return xt.reshape(nb * _LANES, _LANES)


def _scale_const(n: int) -> np.uint32:
    return np.uint32(pow((P_INT + 1) // 2, n, P_INT))


def _make_pass1(n: int, inverse: bool, scale: int):
    """Row stages with stride >= A2: slab (A1, SUB, 128), rolls on axis 0.
    `scale` = log of the 1/2^scale normalization folded into this pass
    (0 = none)."""
    _, _, n1, n2 = _plan(n)

    def kernel(x_ref, t_ref, o_ref):
        x = x_ref[0]
        stages = list(range(n - 1, n - 1 - n1, -1))
        if inverse:
            stages = stages[::-1]
        # axis-0 elements are whole (8, 128) tiles: every pass-1 stage takes
        # the pair-packed form; consecutive stages fuse radix-4
        i = 0
        while i < len(stages):
            L = stages[i]
            k = n - 1 - L
            s1 = 1 << (L - _LOG_LANES - n2)
            t = t_ref[:, :, k:k + 1]
            if i + 1 < len(stages):
                L2 = stages[i + 1]
                t2 = t_ref[:, :, n - 1 - L2:n - L2]
                if inverse:
                    x = _bf_inv_packed4(x, t, t2, s1)
                else:
                    x = _bf_fwd_packed4(x, t, t2, s1 // 2)
                i += 2
                continue
            x = _bf_inv_packed(x, t, s1) if inverse else \
                _bf_fwd_packed(x, t, s1)
            i += 1
        if scale:
            x = _mul_semi(x, _scale_const(scale))
        o_ref[0] = _canon(x)

    return kernel


def _make_pass2(n: int, inverse: bool, scale: int):
    """Row stages with stride < A2 plus lane stages: slab (A2, 128)."""
    _, A2, n1, n2 = _plan(n)

    def kernel(x_ref, tr_ref, tl_ref, o_ref):
        x = x_ref[0, 0]
        riota = jax.lax.broadcasted_iota(jnp.uint32, (A2, _LANES), 0)
        liota = jax.lax.broadcasted_iota(jnp.uint32, (A2, _LANES), 1)

        def row_t(L):
            j = (_LOG_LANES + n2 - 1) - L
            return tr_ref[0, :, j:j + 1]

        def row(L, x):
            s = 1 << (L - _LOG_LANES)
            t = row_t(L)
            if s >= _SUB:  # tile-aligned row stride: pair-packed form
                return _bf_inv_packed(x, t, s) if inverse else \
                    _bf_fwd_packed(x, t, s)
            sel = (riota & np.uint32(s)) == 0
            return _bf_inv(x, t, s, sel, 0) if inverse else \
                _bf_fwd(x, t, s, sel, 0)

        def rows(Ls, x):
            """Ordered row stages, radix-4 fusing adjacent pairs whose
            LOWER stride is still tile-aligned (>= _SUB rows)."""
            i = 0
            while i < len(Ls):
                L = Ls[i]
                s = 1 << (L - _LOG_LANES)
                if i + 1 < len(Ls):
                    lower = min(s, 1 << (Ls[i + 1] - _LOG_LANES))
                    if lower >= _SUB:
                        if inverse:
                            x = _bf_inv_packed4(x, row_t(L), row_t(Ls[i + 1]),
                                                s)
                        else:
                            x = _bf_fwd_packed4(x, row_t(L), row_t(Ls[i + 1]),
                                                s // 2)
                        i += 2
                        continue
                x = row(L, x)
                i += 1
            return x

        def lane(L, x):
            s = 1 << L
            t = tl_ref[0, L]
            sel = (liota & np.uint32(s)) == 0
            return _bf_inv(x, t, s, sel, 1) if inverse else \
                _bf_fwd(x, t, s, sel, 1)

        def lanes_packed(Ls, xt):
            """Block-transposed lane stages (pre-transposed tl planes),
            radix-4 fusing adjacent pairs."""
            i = 0
            while i < len(Ls):
                L = Ls[i]
                if i + 1 < len(Ls):
                    t1, t2 = tl_ref[0, L], tl_ref[0, Ls[i + 1]]
                    if inverse:
                        xt = _bf_inv_packed4(xt, t1, t2, 1 << L)
                    else:
                        xt = _bf_fwd_packed4(xt, t1, t2, 1 << Ls[i + 1])
                    i += 2
                    continue
                t = tl_ref[0, L]
                xt = _bf_inv_packed(xt, t, 1 << L) if inverse else \
                    _bf_fwd_packed(xt, t, 1 << L)
                i += 1
            return xt

        T = _lane_transposed(n2)
        if inverse:
            for L in range(_LANE_T_MIN if T else _LOG_LANES):
                x = lane(L, x)
            if T:
                x = _blocks_T(x)
                x = lanes_packed(list(range(_LANE_T_MIN, _LOG_LANES)), x)
                x = _blocks_T(x)
            x = rows(list(range(_LOG_LANES, _LOG_LANES + n2)), x)
        else:
            x = rows(list(range(_LOG_LANES + n2 - 1, _LOG_LANES - 1, -1)), x)
            if T:
                x = _blocks_T(x)
                x = lanes_packed(
                    list(range(_LOG_LANES - 1, _LANE_T_MIN - 1, -1)), x)
                x = _blocks_T(x)
            for L in range((_LANE_T_MIN if T else _LOG_LANES) - 1, -1, -1):
                x = lane(L, x)
        if scale:
            x = _mul_semi(x, _scale_const(scale))
        o_ref[0, 0] = _canon(x)

    return kernel


def _pass1_call(x4, twr1, n, inverse, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, A1, A2, _ = x4.shape
    n1 = twr1.shape[-1]
    sub = _sub1(n)
    return pl.pallas_call(
        _make_pass1(n, inverse, scale),
        out_shape=jax.ShapeDtypeStruct(x4.shape, jnp.uint32),
        grid=(A2 // sub, C),
        in_specs=[
            pl.BlockSpec((1, A1, sub, _LANES), lambda i, c: (c, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A1, sub, n1), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A1, sub, _LANES), lambda i, c: (c, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, twr1)


def _pass2_call(x4, twr2, twl, n, inverse, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, A1, A2, _ = x4.shape
    n2 = twr2.shape[-1]
    return pl.pallas_call(
        _make_pass2(n, inverse, scale),
        out_shape=jax.ShapeDtypeStruct(x4.shape, jnp.uint32),
        grid=(A1, C),
        in_specs=[
            pl.BlockSpec((1, 1, A2, _LANES), lambda a, c: (c, a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A2, n2), lambda a, c: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LOG_LANES, A2, _LANES),
                         lambda a, c: (a, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, A2, _LANES), lambda a, c: (c, a, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, twr2, twl)


def _transform_body(mat, twr1, twr2, twl, n: int, inverse: bool,
                    interpret: bool, scale_log: int | None = None):
    """scale_log: log of the 1/2^k normalization folded into the final
    inverse pass; None = n (the full-transform default). The sharded
    transform passes 0 (its global 1/2^N scale is applied once after the
    cross stages)."""
    C = mat.shape[0]
    A1, A2, n1, _ = _plan(n)
    if scale_log is None:
        scale_log = n
    x4 = mat.reshape(C, A1, A2, _LANES)
    if inverse:
        x4 = _pass2_call(x4, twr2, twl, n, True,
                         scale=(scale_log if n1 == 0 else 0),
                         interpret=interpret)
        if n1:
            x4 = _pass1_call(x4, twr1, n, True, scale=scale_log,
                             interpret=interpret)
    else:
        if n1:
            x4 = _pass1_call(x4, twr1, n, False, scale=0,
                             interpret=interpret)
        x4 = _pass2_call(x4, twr2, twl, n, False, scale=0,
                         interpret=interpret)
    return x4.reshape(C, 1 << n)


@partial(jax.jit, static_argnames=("n", "inverse", "interpret"))
def _transform_jit(mat, twr1, twr2, twl, n: int, inverse: bool,
                   interpret: bool = False):
    return _transform_body(mat, twr1, twr2, twl, n, inverse, interpret)


@partial(dedup_jit, static_argnums=(3, 4, 5))
def _extend_jit(values, ti, tf, n: int, blow: int, interpret: bool = False):
    """Fused interpolate -> zero-pad -> evaluate, Pallas passes inline in ONE
    executable (same contract as fft._extend_jit). `values` may be a tuple
    of (N,) columns / RowRefs — stacked in-executable."""
    if isinstance(values, tuple):
        from ..core.rowref import as_row

        values = jnp.stack([as_row(v) for v in values])
    coeffs = _transform_body(values, *ti, n, True, interpret)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (1 << (n + blow)) - (1 << n))]
    ext = _transform_body(jnp.pad(coeffs, pad), *tf, n + blow, False,
                          interpret)
    return coeffs, ext


def _supported(log_size: int) -> bool:
    return MIN_LOG <= log_size <= MAX_LOG


def available(log_size: int) -> bool:
    return _on_tpu() and _supported(log_size)


def _as_mat(values):
    return (values[None], True) if values.ndim == 1 else (values, False)


def evaluate(coeffs: jnp.ndarray, log_size: int,
             interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas circle-FFT evaluate; same contract as fft.evaluate.
    coeffs: (C, 2^n) or (2^n,)."""
    mat, squeeze = _as_mat(coeffs)
    out = _transform_jit(mat, *_dev_tables(log_size, False), log_size, False,
                         interpret)
    return out[0] if squeeze else out


def interpolate(values: jnp.ndarray, log_size: int,
                interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas circle-FFT interpolate; same contract as
    fft.interpolate."""
    mat, squeeze = _as_mat(values)
    out = _transform_jit(mat, *_dev_tables(log_size, True), log_size, True,
                         interpret)
    return out[0] if squeeze else out


def extend_with_coeffs(values, log_size: int, log_blowup: int,
                       aot: bool = False, interpret: bool = False):
    """(coefficients, blown-up evaluation), one dispatch. `values`: (C, N)
    array or tuple of (N,) columns / RowRefs. With aot=True, loads the
    executable via .lower().compile() without executing (values may be
    ShapeDtypeStructs) and returns None."""
    ti = _dev_tables(log_size, True)
    tf = _dev_tables(log_size + log_blowup, False)
    if aot:
        # statics lowered EXACTLY as the real call passes them (including the
        # trailing interpret) — a 5-positional lower and a 6-positional call
        # land in different jit cache entries AND different persistent-cache
        # keys, so the first prove would fully recompile every extend
        # (measured: 7 signatures x 2.8 s on the TPU relay)
        _extend_jit.lower(values, ti, tf, log_size, log_blowup, False).compile()
        return None
    return _extend_jit(values, ti, tf, log_size, log_blowup, interpret)
