"""Polynomial utilities: out-of-domain evaluation and modular reductions.

Used by the prover to produce the OODS sampled values (the mask) that the
verifier checks the composition identity against (stwo's equivalent machinery
lives in its prover internals; entry point cited at
crates/brainfuck_prover/src/brainfuck_air/mod.rs:732).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from . import m31, qm31
from .m31 import P_INT
from .rowref import dedup_jit


def sum_mod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Modular sum along an axis via log-depth pairwise m31.add (uint32-safe:
    jnp.sum would overflow and TPUs have no uint64)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    # pad to a power of two with zeros
    target = 1 << (n - 1).bit_length() if n > 1 else 1
    if target != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, target - n)]
        x = jnp.pad(x, pad)
    while x.shape[-1] > 1:
        x = m31.add(x[..., 0::2], x[..., 1::2])
    return x[..., 0]


from functools import partial

import jax


def _point_factors(log_size: int, point) -> list:
    """Host: the per-bit basis factors [y, x, pi(x), ...] at a QM31 point
    (list of QM31 tuples; bit k of a basis index selects factors[k])."""
    x, y = point
    factors = [y]
    cur = x
    for _ in range(log_size - 1):
        factors.append(cur)
        cur = qm31.h_sub(qm31.h_mul(cur, qm31.h_add(cur, cur)), qm31.ONE)  # 2c^2-1
    return factors


def half_bases_at_point(log_size: int, point) -> Tuple[np.ndarray, np.ndarray]:
    """Tensor-product split of the circle-FFT basis at a QM31 point.

    basis_j(point) = y^{j0} x^{j1} pi(x)^{j2} ... is a product basis, so it
    factors exactly: basis[j] = b_lo[j % 2^lo] * b_hi[j >> lo] with
    lo = log_size // 2. Returns host uint32 arrays (4, 2^lo), (4, 2^hi).
    Computing the two half-bases on the host (<= 2^11 h_mul calls) keeps the
    device OODS program to two tiny modular contractions instead of a
    log_size-deep doubling chain per group (the fused all-groups executable
    lowered to 15 MB of HLO and dominated cold compile latency)."""
    factors = _point_factors(log_size, point)
    lo = log_size // 2

    def build(fs):
        basis = [qm31.ONE]
        for f in fs:
            basis += [qm31.h_mul(b, f) for b in basis]
        return np.array(basis, np.uint32).T.copy()  # (4, 2^len(fs))

    return build(factors[:lo]), build(factors[lo:])


@dedup_jit
def _sample_tensor_jit(rows: tuple, b_lo: jnp.ndarray, b_hi: jnp.ndarray):
    """Evaluate C coefficient rows at one QM31 point via the tensor-product
    basis split: out[:, c] = sum_hi b_hi * (sum_lo rows[c].(H,L) * b_lo).
    One small shared executable per (C, N) shape bucket; exact mod-p, so the
    result is bit-identical to the direct basis dot. `rows` entries may be
    RowRefs (deferred group-matrix rows, resolved here at trace time)."""
    from .rowref import as_row

    L = b_lo.shape[1]
    mat = jnp.stack([as_row(r) for r in rows])             # (C, N)
    M = mat.reshape(mat.shape[0], -1, L)                   # (C, H, L)
    t = sum_mod(m31.mul(M[None], b_lo[:, None, None, :]), axis=-1)  # (4, C, H)
    return sum_mod(qm31.mul(t, b_hi[:, None, :]), axis=-1)          # (4, C)


def vanishing_at_point(log_size: int, point) -> tuple:
    """V_n(z) for the canonic circle domain of size 2^log_size:
    pi^(log_size-1)(x(z)) (host QM31)."""
    x = point[0]
    for _ in range(log_size - 1):
        x = qm31.h_sub(qm31.h_mul(x, qm31.h_add(x, x)), qm31.ONE)
    return x


def vanishing_on_domain(log_size: int, eval_log_size: int) -> np.ndarray:
    """V_{log_size} evaluated on the canonic domain of size 2^eval_log_size
    (bit-reversed storage), as a host uint32 array. Nonzero everywhere
    (canonic domains of different sizes are disjoint)."""
    from .circle import CanonicCoset
    from .fft import bit_reverse_indices

    dom = CanonicCoset(eval_log_size).circle_domain()
    xs, _ = dom.points()
    rev = bit_reverse_indices(eval_log_size)
    x = xs[rev].astype(np.uint64)
    for _ in range(log_size - 1):
        x = (2 * x * x + (P_INT - 1)) % P_INT
    return x.astype(np.uint32)
