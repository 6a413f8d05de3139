"""OODS quotients: reduce "column f equals v at z" claims to a low-degree
test, batched per commitment-domain size for FRI.

For a committed M31 column f and a sampled value v = f(z) at the QM31 point z,
let zb = phi(z) (Frobenius conjugate; f(zb) = phi(v) for free since f has M31
coefficients). The line l through (z, v), (zb, phi(v)) and the pair-vanishing

    V(p) = (p.x - z.x)(zb.y - z.y) - (p.y - z.y)(zb.x - z.x)

(the line through z and zb, which cuts the circle exactly at {z, zb}) give the
quotient q(p) = (f(p) - l(p)) / V(p) — a polynomial iff v is correct. All
quotients of one commitment size are combined with powers of the channel
coefficient alpha; the per-size combinations feed FRI.

This mirrors stwo's quotient/pair-vanishing machinery (internal to its
prover; entry at brainfuck_air/mod.rs:732) with the QM31 Frobenius in place
of stwo's CM31 complex conjugation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import m31, qm31
from .circle import CanonicCoset
from .fft import bit_reverse_indices
from .m31 import P_INT


@dataclass
class QuotientClaim:
    """One (column, sample point) pair: the column's extended evaluation (for
    the prover) or its decommitted values (verifier), the point, the value."""

    point: tuple        # (x, y) host QM31 circle point
    value: tuple        # claimed f(z), host QM31
    alpha_index: int    # global batching power


@lru_cache(maxsize=32)
def domain_points_storage(log_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(x, y) of the canonic domain of size 2^log_size in bit-reversed
    storage order (host uint32 arrays)."""
    dom = CanonicCoset(log_size).circle_domain()
    xs, ys = dom.points()
    rev = bit_reverse_indices(log_size)
    return xs[rev], ys[rev]


def _line_and_vanishing_coeffs(point, value):
    """Constants for l(p) and V(p):
    l(p) = value + (vb - v) * (p.y - z.y) / (zb.y - z.y)
         = (v - z.y * s) + s * p.y          with s = (vb - v)/(zb.y - z.y)
    V(p) = (p.x - z.x) * dy - (p.y - z.y) * dx
         = (p.x * dy - p.y * dx) + (z.y * dx - z.x * dy)
    Returns (l0, s, dy, dx, v_const) host QM31 tuples."""
    zx, zy = point
    zbx, zby = qm31.h_frobenius(zx), qm31.h_frobenius(zy)
    vb = qm31.h_frobenius(value)
    dy = qm31.h_sub(zby, zy)
    dx = qm31.h_sub(zbx, zx)
    s = qm31.h_mul(qm31.h_sub(vb, value), qm31.h_inv(dy))
    l0 = qm31.h_sub(value, qm31.h_mul(zy, s))
    v_const = qm31.h_sub(qm31.h_mul(zy, dx), qm31.h_mul(zx, dy))
    return l0, s, dy, dx, v_const


_CLAIM_CHUNK = 32  # bound peak memory of the (4, M, N) batched quotient


@partial(jax.jit, static_argnames=("n_claims",))
def _accumulate_chunk(f_all, consts, px, py, n_claims):
    """Batched quotients for one chunk of claims.

    f_all: (M, N) gathered M31 column evaluations; consts: (6, M, 4) host
    constants [L0, S, DY, DX, VC, AW]; px/py: (N,) domain coordinates.
    Returns the alpha-weighted QM31 sum over the chunk, (4, N)."""
    def c(i):  # (M, 4) -> (4, M, 1) broadcast shape
        return jnp.transpose(consts[i]).reshape(4, n_claims, 1)

    l0, s, dy, dx, vc, aw = (c(i) for i in range(6))
    fq = f_all[None, :, :]          # (1, M, N) M31 embedded below
    pyq = py[None, None, :]
    pxq = px[None, None, :]

    def embed(x):  # M31 broadcastable -> QM31 (4, M, N)-broadcast
        return jnp.concatenate([x, jnp.zeros((3,) + x.shape[1:], jnp.uint32)], axis=0)

    f_emb = embed(fq)
    py_emb = embed(pyq)
    px_emb = embed(pxq)
    num = qm31.sub(f_emb, qm31.add(l0, qm31.mul(s, py_emb)))
    van = qm31.add(qm31.sub(qm31.mul(dy, px_emb), qm31.mul(dx, py_emb)), vc)
    q = qm31.mul(num, qm31.inv(van))
    weighted = qm31.mul(aw, q)
    # modular sum over the claim axis (axis 1 of (4, M, N))
    acc = weighted
    while acc.shape[1] > 1:
        m = acc.shape[1]
        if m % 2:
            acc = jnp.concatenate(
                [acc, jnp.zeros((4, 1, acc.shape[2]), jnp.uint32)], axis=1)
            m += 1
        acc = m31.add(acc[:, 0::2], acc[:, 1::2])
    return acc[:, 0]


def accumulate_quotients(
    log_size: int,
    columns: Sequence[jnp.ndarray],
    claims: Sequence[Sequence[QuotientClaim]],
    alpha: tuple,
) -> jnp.ndarray:
    """Prover: combined quotient evaluation on the commitment domain
    2^log_size (QM31, (4, N)). columns[i] is an extended M31 evaluation in
    bit-reversed storage; claims[i] its sample claims."""
    xs, ys = domain_points_storage(log_size)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)

    flat: List[Tuple[int, QuotientClaim]] = []
    for ci, col_claims in enumerate(claims):
        for c in col_claims:
            flat.append((ci, c))

    col_mat = jnp.stack(list(columns))
    acc = None
    for start in range(0, len(flat), _CLAIM_CHUNK):
        chunk = flat[start : start + _CLAIM_CHUNK]
        m = len(chunk)
        consts = np.empty((6, m, 4), np.uint32)
        idxs = np.empty(m, np.int32)
        for i, (ci, c) in enumerate(chunk):
            l0, s, dy, dx, vc = _line_and_vanishing_coeffs(c.point, c.value)
            consts[0, i] = l0
            consts[1, i] = s
            consts[2, i] = dy
            consts[3, i] = dx
            consts[4, i] = vc
            consts[5, i] = qm31.h_pow(alpha, c.alpha_index)
            idxs[i] = ci
        f_all = jnp.take(col_mat, jnp.asarray(idxs), axis=0)
        part = _accumulate_chunk(f_all, jnp.asarray(consts), px, py, m)
        acc = part if acc is None else qm31.add(acc, part)
    assert acc is not None
    return acc


def quotient_value_at_position(
    log_size: int,
    position: int,
    column_values: Sequence[int],
    claims: Sequence[Sequence[QuotientClaim]],
    alpha: tuple,
) -> tuple:
    """Verifier: the combined quotient at one storage position, from the
    decommitted column values (host)."""
    xs, ys = domain_points_storage(log_size)
    px = (int(xs[position]), 0, 0, 0)
    py = (int(ys[position]), 0, 0, 0)
    acc = qm31.ZERO
    for fval, col_claims in zip(column_values, claims):
        fq = (int(fval) % P_INT, 0, 0, 0)
        for c in col_claims:
            l0, s, dy, dx, v_const = _line_and_vanishing_coeffs(c.point, c.value)
            num = qm31.h_sub(fq, qm31.h_add(l0, qm31.h_mul(s, py)))
            van = qm31.h_add(
                qm31.h_sub(qm31.h_mul(dy, px), qm31.h_mul(dx, py)), v_const
            )
            q = qm31.h_mul(num, qm31.h_inv(van))
            acc = qm31.h_add(acc, qm31.h_mul(qm31.h_pow(alpha, c.alpha_index), q))
    return acc
