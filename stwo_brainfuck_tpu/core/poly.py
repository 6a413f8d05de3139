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


def _point_factors(log_size: int, point) -> np.ndarray:
    """Host: the per-bit basis factors [y, x, pi(x), ...] at a QM31 point."""
    x, y = point
    factors = [y]
    cur = x
    for _ in range(log_size - 1):
        factors.append(cur)
        cur = qm31.h_sub(qm31.h_mul(cur, qm31.h_add(cur, cur)), qm31.ONE)  # 2c^2-1
    return np.array(factors, np.uint32)  # (log_size, 4)


@partial(jax.jit, static_argnames=("log_size",))
def _basis_from_factors(factors: jnp.ndarray, log_size: int) -> jnp.ndarray:
    basis = qm31.one((1,))
    for k in range(log_size):
        fv = factors[k].reshape(4, 1)
        basis = jnp.concatenate([basis, qm31.mul(basis, fv)], axis=1)
    return basis


def secure_basis_at_point(log_size: int, point) -> jnp.ndarray:
    """QM31 values of the 2^log_size circle-FFT basis functions at a QM31
    circle point: basis_j = y^{j0} x^{j1} pi(x)^{j2} ... (device, (4, N))."""
    return _basis_from_factors(jnp.asarray(_point_factors(log_size, point)), log_size)


@jax.jit
def _dot_basis(coeff_matrix: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    prods = m31.mul(coeff_matrix[None, :, :], basis[:, None, :])  # (4, C, N)
    return sum_mod(prods, axis=-1)  # (4, C)


def eval_columns_at_point(coeff_matrix: jnp.ndarray, point) -> List[Tuple[int, int, int, int]]:
    """Evaluate C circle polynomials (M31 coefficient rows, shape (C, N)) at
    one QM31 circle point. Returns C host QM31 tuples."""
    n = int(coeff_matrix.shape[-1])
    log_size = n.bit_length() - 1
    basis = secure_basis_at_point(log_size, point)  # (4, N)
    arr = np.asarray(_dot_basis(coeff_matrix, basis))
    return [tuple(int(arr[k, c]) for k in range(4)) for c in range(arr.shape[1])]


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
