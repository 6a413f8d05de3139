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


@jax.jit
def _weighted_columns(cols: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """sum_k weights[k] * cols[k]: (C, N) M31 columns with (C, 4) QM31
    weights -> (4, N). One modular matvec per QM31 coordinate."""
    prods = m31.mul(weights.T[:, :, None], cols[None, :, :])  # (4, C, N)
    acc = prods
    while acc.shape[1] > 1:
        c = acc.shape[1]
        if c % 2:
            acc = jnp.concatenate(
                [acc, jnp.zeros((4, 1, acc.shape[2]), jnp.uint32)], axis=1)
        acc = m31.add(acc[:, 0::2], acc[:, 1::2])
    return acc[:, 0]


@jax.jit
def _point_group_quotient(wf, a_const, b_const, dy, dx, vc, px, py):
    """inv_V(p) * (wf(p) - A - B*p.y) for one sample point.

    wf: (4, N) weighted column combination; A/B and the vanishing
    coefficients are (4,) QM31 constants; px/py (N,) M31."""
    def c(v):
        return v.reshape(4, 1)

    num = qm31.sub(wf, qm31.add(c(a_const), qm31.mul(c(b_const), qm31.from_m31(py))))
    van = qm31.add(
        qm31.sub(qm31.mul(c(dy), qm31.from_m31(px)), qm31.mul(c(dx), qm31.from_m31(py))),
        c(vc),
    )
    return qm31.mul(num, qm31.inv(van))


_COL_CHUNK = 64  # bound the (4, C, N) weighted-reduction intermediate

_DEV_POINTS: dict = {}


def _dev_points(log_size: int):
    """Device copies of the domain point coordinates (uploading them per
    accumulate call costs a multi-MB relay transfer per size)."""
    if log_size not in _DEV_POINTS:
        xs, ys = domain_points_storage(log_size)
        _DEV_POINTS[log_size] = (jnp.asarray(xs), jnp.asarray(ys))
    return _DEV_POINTS[log_size]


def _group_claims(claims: Sequence[Sequence[QuotientClaim]]) -> dict:
    """point -> [(column index, claim)] in claim order."""
    groups: dict = {}
    for ci, col_claims in enumerate(claims):
        for c in col_claims:
            key = (tuple(c.point[0]), tuple(c.point[1]))
            groups.setdefault(key, []).append((ci, c))
    return groups


def _group_constants(members, alpha: tuple):
    """Host constants of one point group: (consts (5, 4) = [A, B, dy, dx, vc],
    weights (C_g, 4), member column indices)."""
    a_const = qm31.ZERO
    b_const = qm31.ZERO
    weights = np.zeros((len(members), 4), np.uint32)
    idxs = []
    dy = dx = vc = None
    for i, (ci, c) in enumerate(members):
        l0, s, dy_, dx_, vc_ = _line_and_vanishing_coeffs(c.point, c.value)
        dy, dx, vc = dy_, dx_, vc_  # identical for the whole group
        aw = qm31.h_pow(alpha, c.alpha_index)
        weights[i] = aw
        idxs.append(ci)
        a_const = qm31.h_add(a_const, qm31.h_mul(aw, l0))
        b_const = qm31.h_add(b_const, qm31.h_mul(aw, s))
    consts = np.array([a_const, b_const, dy, dx, vc], np.uint32)
    return consts, weights, tuple(idxs)


@partial(jax.jit, static_argnames=("idx_groups",))
def _accumulate_all_jit(cols: tuple, consts: jnp.ndarray, w: jnp.ndarray,
                        px: jnp.ndarray, py: jnp.ndarray, idx_groups: tuple):
    """ALL point groups of one commitment size in ONE executable: column
    stacking, chunked weighted reductions, the per-group quotient, and the
    final accumulation (was ~10 eager dispatches + 6 tiny uploads per size,
    each a TPU-relay round trip)."""
    from .rowref import as_row

    acc = None
    off = 0
    for gi, idxs in enumerate(idx_groups):
        wf = None
        for start in range(0, len(idxs), _COL_CHUNK):
            sel = idxs[start:start + _COL_CHUNK]
            mat = jnp.stack([as_row(cols[ci]) for ci in sel])
            part = _weighted_columns(mat, w[off:off + len(sel)])
            off += len(sel)
            wf = part if wf is None else qm31.add(wf, part)
        q = _point_group_quotient(wf, consts[gi, 0], consts[gi, 1],
                                  consts[gi, 2], consts[gi, 3], consts[gi, 4],
                                  px, py)
        acc = q if acc is None else qm31.add(acc, q)
    return acc


def accumulate_quotients(
    log_size: int,
    columns: Sequence[jnp.ndarray],
    claims: Sequence[Sequence[QuotientClaim]],
    alpha: tuple,
    ops=None,
) -> jnp.ndarray:
    """Prover: combined quotient evaluation on the commitment domain
    2^log_size (QM31, (4, N)).

    Claims are grouped by sample point: all columns sampled at the same z
    share the pair-vanishing V and the line structure, so
        sum_k a^k (f_k - l_k)/V  =  (1/V) * (sum_k a^k f_k - A - B*p.y)
    with scalar A = sum a^k l0_k, B = sum a^k s_k — one batch inverse and one
    weighted column reduction per point instead of per claim. On a single
    chip the whole size runs as ONE fused executable."""
    groups = _group_claims(claims)

    if ops is None:
        consts_list = []
        w_list = []
        idx_groups = []
        for members in groups.values():
            consts, weights, idxs = _group_constants(members, alpha)
            consts_list.append(consts)
            w_list.append(weights)
            idx_groups.append(idxs)
        px, py = _dev_points(log_size)
        return _accumulate_all_jit(
            tuple(columns), jnp.asarray(np.stack(consts_list)),
            jnp.asarray(np.concatenate(w_list)), px, py, tuple(idx_groups))

    # multi-device path: per-group sharded kernels (parallel/prove.py)
    from .rowref import as_row

    columns = [as_row(c) for c in columns]
    weighted = ops.weighted_columns
    point_group = ops.point_group_quotient
    xs, ys = domain_points_storage(log_size)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)

    acc = None
    for members in groups.values():
        consts, weights, idxs = _group_constants(members, alpha)
        wf = None
        for start in range(0, len(members), _COL_CHUNK):
            sel = idxs[start : start + _COL_CHUNK]
            cols = jnp.stack([columns[ci] for ci in sel])
            w = jnp.asarray(weights[start : start + _COL_CHUNK])
            part = weighted(cols, w)
            wf = part if wf is None else qm31.add(wf, part)

        dev_consts = jnp.asarray(consts)
        q = point_group(wf, dev_consts[0], dev_consts[1],
                        dev_consts[2], dev_consts[3], dev_consts[4], px, py)
        acc = q if acc is None else qm31.add(acc, q)
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
