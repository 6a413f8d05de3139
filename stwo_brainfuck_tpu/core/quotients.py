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

from .rowref import dedup_jit
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


def point_at_storage(log_size: int, position: int) -> Tuple[int, int]:
    """Single domain point at a bit-reversed storage position (host ints).
    The verifier touches ~4*n_queries positions per size; materializing the
    full 2^n domain (domain_points_storage) cost ~20 s of a fresh-process
    verify."""
    from .fft import bitrev_int

    return CanonicCoset(log_size).circle_domain().at(
        bitrev_int(position, log_size))


def points_at_storage_batch(log_size: int, positions) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized point_at_storage: (x, y) uint32 arrays for many storage
    positions, without materializing the 2^n domain."""
    from .circle import M31_CIRCLE_LOG_ORDER, half_odds, points_at_indices

    pos = np.asarray(positions, np.uint64)
    # bit-reverse each position (log_size bits)
    rev = np.zeros_like(pos)
    v = pos.copy()
    for _ in range(log_size):
        rev = (rev << np.uint64(1)) | (v & np.uint64(1))
        v >>= np.uint64(1)
    half = np.uint64(1 << (log_size - 1))
    hc = half_odds(log_size - 1)
    order = np.uint64(1 << M31_CIRCLE_LOG_ORDER)
    base = (np.uint64(hc.initial_index)
            + np.where(rev < half, rev, rev - half) * np.uint64(hc.step)) % order
    idx = np.where(rev < half, base, (order - base) % order)
    return points_at_indices(idx)


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


# Above this row count the (4, C, N) tree-reduction intermediate (plus the
# limb-mul temps XLA materializes around it) exceeds HBM: big22's 58-column
# 2^23 point group compiled to an 18.9 GB temp footprint on a 15.75 GB v5e.
# The scan form's footprint is the (4, N) carry + per-step temps, independent
# of C. Small sizes keep the tree form so their jaxprs (and persistent-cache
# keys) are unchanged.
_SCAN_ROWS = 1 << 22


@jax.jit
def _weighted_columns(cols: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """sum_k weights[k] * cols[k]: (C, N) M31 columns with (C, 4) QM31
    weights -> (4, N). One modular matvec per QM31 coordinate."""
    if cols.shape[1] >= _SCAN_ROWS and cols.shape[0] > 1:
        def step(acc, cw):
            col, w = cw
            return m31.add(acc, m31.mul(w[:, None], col[None, :])), None

        init = m31.mul(weights[0][:, None], cols[0][None, :])
        acc, _ = jax.lax.scan(step, init, (cols[1:], weights[1:]))
        return acc
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
        from ..utils.transfer import upload_many

        xs, ys = domain_points_storage(log_size)
        _DEV_POINTS[log_size] = tuple(upload_many([xs, ys]))
    return _DEV_POINTS[log_size]


def _group_claims(claims: Sequence[Sequence[QuotientClaim]]) -> dict:
    """point -> [(column index, claim)] in claim order."""
    groups: dict = {}
    for ci, col_claims in enumerate(claims):
        for c in col_claims:
            key = (tuple(c.point[0]), tuple(c.point[1]))
            groups.setdefault(key, []).append((ci, c))
    return groups


def _group_constants(members, alpha: tuple, powers: list = None):
    """Host constants of one point group: (consts (5, 4) = [A, B, dy, dx, vc],
    weights (C_g, 4), member column indices). `powers` optionally carries the
    precomputed alpha-power ladder (one incremental h_mul per index instead
    of an h_pow per claim). The per-claim line coefficients are computed as
    one vectorized (4, C) batch — the group shares its point, so dy/dx/vc
    and the single QM31 inverse are computed once."""
    point = members[0][1].point
    zx, zy = point
    zbx, zby = qm31.h_frobenius(zx), qm31.h_frobenius(zy)
    dy = qm31.h_sub(zby, zy)
    dx = qm31.h_sub(zbx, zx)
    dy_inv = qm31.h_inv(dy)
    vc = qm31.h_sub(qm31.h_mul(zy, dx), qm31.h_mul(zx, dy))

    n = len(members)
    vals = np.array([c.value for _ci, c in members], np.uint64).T % P_INT
    aw = np.array(
        [(powers[c.alpha_index] if powers is not None
          else qm31.h_pow(alpha, c.alpha_index)) for _ci, c in members],
        np.uint64)                                            # (C, 4)
    vb = qm31.npq_frobenius(vals)
    s_arr = qm31.npq_mul(qm31.npq_sub(vb, vals), qm31.npq_const(dy_inv, n))
    l0 = qm31.npq_sub(vals, qm31.npq_mul(qm31.npq_const(zy, n), s_arr))
    aw_t = aw.T                                               # (4, C)
    a_const = qm31.npq_mul(aw_t, l0).sum(axis=1) % P_INT
    b_const = qm31.npq_mul(aw_t, s_arr).sum(axis=1) % P_INT

    consts = np.array([a_const, b_const,
                       np.array(dy, np.uint64), np.array(dx, np.uint64),
                       np.array(vc, np.uint64)], np.uint64).astype(np.uint32)
    idxs = tuple(ci for ci, _c in members)
    return consts, aw.astype(np.uint32), idxs


@partial(dedup_jit, static_argnums=(5,))
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

    consts_list = []
    w_list = []
    idx_groups = []
    for members in groups.values():
        consts, weights, idxs = _group_constants(members, alpha)
        consts_list.append(consts)
        w_list.append(weights)
        idx_groups.append(idxs)
    consts_arr = np.stack(consts_list)
    w_arr = np.concatenate(w_list)

    if ops is None:
        px, py = _dev_points(log_size)
        return _accumulate_all_jit(
            tuple(columns), jnp.asarray(consts_arr), jnp.asarray(w_arr),
            px, py, tuple(idx_groups))

    # multi-device path: same fusion, sharded inner kernels
    # (parallel/prove.py _accumulate_all_fn)
    return ops.accumulate_all(log_size, tuple(columns), consts_arr, w_arr,
                              tuple(idx_groups))


def prepare_point_groups(claims: Sequence[Sequence[QuotientClaim]], alpha: tuple):
    """Verifier-side prep: the per-position work previously recomputed every
    claim's line/vanishing constants and alpha power at every queried
    position (~5 s of the ~3 s verify wall; VERDICT r2 weak #5). Claims
    sampled at the same point share the vanishing line, so precompute once
    per point group: (A, B, dy, dx, vc, [(column index, alpha^k)]) with
    A = sum a^k l0_k, B = sum a^k s_k — exactly the prover's grouping
    (accumulate_quotients), so the verifier evaluates
        (sum a^k f_k - A - B*p.y) / V
    per group: one inverse per (group, position) instead of per claim."""
    groups = _group_claims(claims)
    n_pows = 1 + max((c.alpha_index for ms in groups.values()
                      for _ci, c in ms), default=0)
    powers = [qm31.ONE]
    for _ in range(n_pows - 1):
        powers.append(qm31.h_mul(powers[-1], alpha))
    out = []
    for members in groups.values():
        consts, weights, idxs = _group_constants(members, alpha, powers)
        out.append((
            tuple(tuple(int(x) for x in c) for c in consts),
            [(ci, tuple(int(x) for x in w)) for ci, w in zip(idxs, weights)],
        ))
    return out


def quotient_values_batch(log_size: int, positions, column_values: np.ndarray,
                          prepared) -> dict:
    """Verifier: the combined quotient at MANY storage positions at once
    (vectorized host math; VERDICT r4 item 5 — the per-position tuple loop
    dominated verify wall-clock). column_values: (C, n_pos) decommitted
    values in claim-column order at `positions`. Returns {position: QM31
    tuple}, bit-identical to quotient_value_at_position per position."""
    positions = list(positions)
    n = len(positions)
    if n == 0:
        return {}
    xs, ys = points_at_storage_batch(log_size, positions)
    px = np.zeros((4, n), np.uint64)
    py = np.zeros((4, n), np.uint64)
    px[0] = xs
    py[0] = ys
    vals = np.asarray(column_values, np.uint64) % P_INT   # (C, n)
    acc = np.zeros((4, n), np.uint64)
    for (consts_t, members), _ in zip(prepared, range(len(prepared))):
        a_const, b_const, dy, dx, vc = (qm31.npq_const(c, n) for c in consts_t)
        aw = np.array([w for _ci, w in members], np.uint64)   # (C_g, 4)
        sel = vals[[ci for ci, _w in members]]                # (C_g, n)
        # sum_c aw[c] * f_c: per-coordinate products reduced mod p, then a
        # plain sum (C_g terms < 2^31 each — no u64 overflow below C ~ 2^33)
        wf = ((aw.T[:, :, None] * sel[None, :, :]) % P_INT).sum(axis=1) % P_INT
        num = qm31.npq_sub(wf, qm31.npq_add(a_const, qm31.npq_mul(b_const, py)))
        van = qm31.npq_add(
            qm31.npq_sub(qm31.npq_mul(dy, px), qm31.npq_mul(dx, py)), vc)
        acc = qm31.npq_add(acc, qm31.npq_mul(num, qm31.npq_inv(van)))
    return {p: tuple(int(acc[k, i]) for k in range(4))
            for i, p in enumerate(positions)}


def quotient_value_at_position(
    log_size: int,
    position: int,
    column_values: Sequence[int],
    claims: Sequence[Sequence[QuotientClaim]] = None,
    alpha: tuple = None,
    prepared=None,
) -> tuple:
    """Verifier: the combined quotient at one storage position, from the
    decommitted column values (host). Pass `prepared` from
    prepare_point_groups to amortize the per-claim constants across
    positions; (claims, alpha) is the unprepared compatibility form."""
    if prepared is None:
        prepared = prepare_point_groups(claims, alpha)
    x, y = point_at_storage(log_size, position)
    px = (x, 0, 0, 0)
    py = (y, 0, 0, 0)
    acc = qm31.ZERO
    for (a_const, b_const, dy, dx, vc), members in prepared:
        wf = qm31.ZERO
        for ci, aw in members:
            fv = int(column_values[ci]) % P_INT
            wf = qm31.h_add(wf, tuple((x * fv) % P_INT for x in aw))
        num = qm31.h_sub(wf, qm31.h_add(a_const, qm31.h_mul(b_const, py)))
        van = qm31.h_add(
            qm31.h_sub(qm31.h_mul(dy, px), qm31.h_mul(dx, py)), vc
        )
        acc = qm31.h_add(acc, qm31.h_mul(num, qm31.h_inv(van)))
    return acc
