"""M31 (Mersenne-31, p = 2^31 - 1) field arithmetic, TPU-native.

All device arithmetic is carried out on ``uint32`` arrays using only 32-bit
integer operations (TPU vector units have no 64-bit integer path): products are
formed from 16-bit limbs with explicit carry handling, and the Mersenne
reduction ``2^31 ≡ 1 (mod p)`` folds the high half back in.

This module is the TPU-native equivalent of the reference prover's base field
(`stwo-prover` ``core::fields::m31``; used throughout the reference, e.g.
crates/brainfuck_vm/src/machine.rs:8 and
crates/brainfuck_prover/src/components/memory/table.rs:15).

Functions operate element-wise on arrays of any shape and are safe to call
inside ``jax.jit`` and Pallas kernels (uint32 ops only, no data-dependent
control flow).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Field modulus.
P = np.uint32(2**31 - 1)
_MASK31 = np.uint32(0x7FFF_FFFF)
_MASK16 = np.uint32(0xFFFF)

# Hot ops are wrapped in jax.jit(inline=True): the traced jaxpr is cached per
# argument signature and SPLICED INLINE into enclosing traces — the lowered
# HLO is byte-identical to the unwrapped form (verified), but each op's
# subgraph is built once per process instead of once per call site. This cut
# the prover's Python tracing time (the dominant per-process warmup cost:
# ~170 s GIL-serial for fib19's ~143 executables) by ~10x.
_inline_jit = partial(jax.jit, inline=True)


def reduce_once(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce x < 2^32 to canonical [0, p). Folds bit 31 and subtracts p once."""
    x = (x & _MASK31) + (x >> 31)
    return jnp.where(x >= P, x - P, x)


@_inline_jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b mod p for canonical inputs (< p)."""
    s = a + b  # < 2^32, no overflow
    s = (s & _MASK31) + (s >> 31)
    return jnp.where(s >= P, s - P, s)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b mod p for canonical inputs."""
    return add(a, P - b) if isinstance(b, (int, np.integer)) else add(a, jnp.where(b == 0, 0, P - b))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == 0, jnp.uint32(0), P - a)


@_inline_jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * b mod p using 16-bit limb decomposition (uint32 only; TPU-safe).

    a = a0 + a1·2^16, b = b0 + b1·2^16 with a1, b1 < 2^15 (inputs canonical).
    Full 62-bit product P = lo + hi·2^32, then 2^32 ≡ 2 (mod p).
    """
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16

    t0 = a0 * b0            # < 2^32
    t1 = a0 * b1 + a1 * b0  # < 2^32 (each term < 2^31)
    t2 = a1 * b1            # < 2^30

    t1_lo = t1 << 16
    lo = t0 + t1_lo                              # mod 2^32
    carry = (lo < t1_lo).astype(jnp.uint32)      # carry out of low word
    hi = t2 + (t1 >> 16) + carry                 # < 2^30 + 2^16 + 1

    # P = hi·2^32 + lo ≡ 2·hi + lo (mod p); fold lo's top bit.
    r = (hi << 1) + (lo >> 31) + (lo & _MASK31)  # < 2^32
    r = (r & _MASK31) + (r >> 31)
    return jnp.where(r >= P, r - P, r)


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a static Python exponent (unrolled square-and-multiply)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        base = square(base)
        e >>= 1
    if result is None:
        return jnp.ones_like(a)
    return result


@_inline_jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) = a^-1 (0 maps to 0, matching the VM's mvi convention,
    crates/brainfuck_vm/src/machine.rs:221-226).

    Addition chain exploiting p-2 = 2^31 - 3 = (2^29 - 1)·4 + 1:
    build a^(2^29-1) from doubling chains 1→2→5→10→20→29 bits of ones,
    then two squarings and one multiply. 36 muls total, branch-free.
    """
    x1 = a                                        # 2^1 - 1 ones pattern
    x2 = mul(pow_const_sq(x1, 1), x1)             # a^(2^2-1)
    x4 = mul(pow_const_sq(x2, 2), x2)             # a^(2^4-1)
    x5 = mul(pow_const_sq(x4, 1), x1)             # a^(2^5-1)
    x10 = mul(pow_const_sq(x5, 5), x5)            # a^(2^10-1)
    x20 = mul(pow_const_sq(x10, 10), x10)         # a^(2^20-1)
    x29 = mul(pow_const_sq(x20, 9), mul(pow_const_sq(x5, 4), x4))  # a^(2^29-1)
    return mul(pow_const_sq(x29, 2), x1)          # a^((2^29-1)·4 + 1) = a^(p-2)


def pow_const_sq(a: jnp.ndarray, n: int) -> jnp.ndarray:
    """a^(2^n): n repeated squarings."""
    for _ in range(n):
        a = square(a)
    return a


# ---------------------------------------------------------------------------
# Host-side (numpy, uint64) reference implementations: used by the VM, table
# builders, the verifier and tests. Bit-identical results to the device path.
# ---------------------------------------------------------------------------

P_INT = int(P)


def np_add(a, b):
    return ((np.asarray(a, np.uint64) + np.asarray(b, np.uint64)) % np.uint64(P_INT)).astype(np.uint32)


def np_sub(a, b):
    return ((np.asarray(a, np.uint64) + np.uint64(P_INT) - np.asarray(b, np.uint64)) % np.uint64(P_INT)).astype(np.uint32)


def np_mul(a, b):
    return ((np.asarray(a, np.uint64) * np.asarray(b, np.uint64)) % np.uint64(P_INT)).astype(np.uint32)


def np_neg(a):
    a = np.asarray(a, np.uint64)
    return ((np.uint64(P_INT) - a) % np.uint64(P_INT)).astype(np.uint32)


def np_inv(a):
    """Elementwise inverse on host via Fermat little theorem (0 -> 0),
    vectorized square-and-multiply (31 numpy passes)."""
    a = np.asarray(a, np.uint64)
    result = np.ones_like(a)
    base = a.copy()
    e = P_INT - 2
    while e:
        if e & 1:
            result = (result * base) % P_INT
        base = (base * base) % P_INT
        e >>= 1
    return np.where(a == 0, 0, result).astype(np.uint32)
