"""Pallas TPU kernels for M31 field arithmetic.

The jnp path (core/m31.py) already vectorizes well, but XLA materializes
intermediates between fused ops at HBM bandwidth; these Pallas kernels keep
the 16-bit limb decomposition entirely in VMEM/registers. They are the
building blocks for fused butterfly/constraint kernels and the
"M31 ops/s/chip" speed-of-light metric (BASELINE.md).

All kernels fall back to the jnp implementation off-TPU (CPU tests).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import m31

# numpy scalars: literals inside Pallas kernels (jnp scalars would be
# captured tracer constants, which pallas_call rejects)
_P = np.uint32(0x7FFF_FFFF)
_M16 = np.uint32(0xFFFF)

_BLOCK = 1024  # rows per grid step (x 128 lanes)
_LANES = 128


def _mul_body(a, b):
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    t0 = a0 * b0
    t1 = a0 * b1 + a1 * b0
    t2 = a1 * b1
    t1_lo = t1 << 16
    lo = t0 + t1_lo
    carry = (lo < t1_lo).astype(jnp.uint32)
    hi = t2 + (t1 >> 16) + carry
    r = (hi << 1) + (lo >> 31) + (lo & _P)
    r = (r & _P) + (r >> 31)
    return jnp.where(r >= _P, r - _P, r)


def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = _mul_body(a_ref[:], b_ref[:])


def _mul_add_kernel(a_ref, b_ref, c_ref, o_ref):
    prod = _mul_body(a_ref[:], b_ref[:])
    s = prod + c_ref[:]
    s = (s & _P) + (s >> 31)
    o_ref[:] = jnp.where(s >= _P, s - _P, s)


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def _pallas_ok(x) -> bool:
    """Pallas path requires total size divisible into whole (block, 128)
    tiles; anything else falls back to the fused XLA implementation."""
    n = int(np.prod(x.shape))
    if n % _LANES:
        return False
    rows = n // _LANES
    return rows % min(_BLOCK, rows) == 0


def _pallas_elementwise(kernel, n_in, x, *rest):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = x.shape
    n = int(np.prod(shape))
    rows = n // _LANES
    blk = min(_BLOCK, rows)
    grid = (rows // blk,)
    spec = pl.BlockSpec((blk, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    args = [v.reshape(rows, _LANES) for v in (x,) + rest]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=spec,
    )(*args)
    return out.reshape(shape)


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise M31 product; Pallas on TPU (whole-tile shapes), fused XLA
    otherwise."""
    if not _on_tpu() or not _pallas_ok(a) or a.shape != b.shape:
        return m31.mul(a, b)
    return _pallas_elementwise(_mul_kernel, 2, a, b)


@jax.jit
def mul_add(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a*b + c mod p, fused."""
    if not _on_tpu() or not _pallas_ok(a) or not (a.shape == b.shape == c.shape):
        return m31.add(m31.mul(a, b), c)
    return _pallas_elementwise(_mul_add_kernel, 3, a, b, c)


def _mul_chain_kernel(a_ref, b_ref, o_ref, *, chain):
    x = a_ref[:]
    b = b_ref[:]
    # hoist the constant operand's limb split out of the chain (XLA CSEs
    # this automatically; without it the kernel pays 2 extra ops per mul)
    b0 = b & _M16
    b1 = b >> 16
    for _ in range(chain):
        a0 = x & _M16
        a1 = x >> 16
        t0 = a0 * b0
        t1 = a0 * b1 + a1 * b0
        t2 = a1 * b1
        t1_lo = t1 << 16
        lo = t0 + t1_lo
        carry = (lo < t1_lo).astype(jnp.uint32)
        hi = t2 + (t1 >> 16) + carry
        r = (hi << 1) + (lo >> 31) + (lo & _P)
        r = (r & _P) + (r >> 31)
        x = jnp.where(r >= _P, r - _P, r)
    o_ref[:] = x


@partial(jax.jit, static_argnames=("chain",))
def mul_chain(a: jnp.ndarray, b: jnp.ndarray, chain: int = 8) -> jnp.ndarray:
    """((a*b)*b)*... `chain` times, entirely in VMEM — the compute-bound
    sustained-throughput kernel (XLA fuses its chain the same way, so this
    is the apples-to-apples comparison; round 1 compared a chain of separate
    Pallas dispatches against one fused XLA loop and lost on HBM traffic)."""
    if not _on_tpu() or not _pallas_ok(a):
        x = a
        for _ in range(chain):
            x = m31.mul(x, b)
        return x
    from functools import partial as _p

    return _pallas_elementwise(_p(_mul_chain_kernel, chain=chain), 2, a, b)


def throughput_benchmark(log_n: int = 24, k_lo: int = 64,
                         k_hi: int = 256) -> dict:
    """Measure sustained M31 multiply throughput (mul/s/chip) for the Pallas
    and fused-XLA paths.

    All iterations run inside ONE executable (a fori_loop over a chain-of-8
    body), and completion is forced by pulling a 1-element slice: through the
    axon relay, multi-dispatch timing loops measure enqueue rate, not compute
    (block_until_ready returns before the device finishes), which is how
    round 1 printed a physically impossible 2.7 T mul/s. Reporting the slope
    between k_lo and k_hi loop counts cancels the fixed dispatch + pull
    round-trip (~45 ms)."""
    import time

    n = 1 << log_n
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, int(m31.P), n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, int(m31.P), n, dtype=np.uint32))

    chain = 8

    def body_pallas(x, b):
        return mul_chain(x, b, chain)

    def body_jnp(x, b):
        for _ in range(chain):
            x = m31.mul(x, b)
        return x

    @partial(jax.jit, static_argnames=("k", "which"))
    def run(a, b, k, which):
        body = body_pallas if which == "pallas" else body_jnp
        return jax.lax.fori_loop(0, k, lambda i, x: body(x, b), a)[:1]

    results = {}
    for name in ("pallas", "jnp"):
        times = {}
        for k in (k_lo, k_hi):
            np.asarray(run(a, b, k, name))  # compile + warm
            times[k] = min(
                _timed(lambda: np.asarray(run(a, b, k, name)))
                for _ in range(3))
        results[name] = chain * (k_hi - k_lo) * n / (times[k_hi] - times[k_lo])
    return results


def _timed(fn) -> float:
    import time

    t0 = time.time()
    fn()
    return time.time() - t0
