"""Circle FFT (CFFT): interpolation and evaluation of circle polynomials on
canonic circle domains, fully vectorized for TPU (jax.numpy on uint32 M31).

TPU-native replacement for stwo's ``PolyOps`` / ``precompute_twiddles``
(reference usage: crates/brainfuck_prover/src/brainfuck_air/mod.rs:480-484,
CircleEvaluation construction in every table builder).

Layout: evaluations are stored in BIT-REVERSED order of the domain's natural
order [half_coset, -half_coset]. Consequences used throughout:
- positions (2m, 2m+1) hold f(p_m), f(-p_m) — the stage-0 (y) butterfly and
  the first FRI fold touch adjacent lanes;
- stage L >= 1 butterflies pair positions at stride 2^L with per-block
  twiddles pi^(L-1)(x) in bit-reversed block order.

Basis (circle-FFT basis): coefficient j (bits j0..j_{n-1}) multiplies
    y^{j0} * x^{j1} * pi(x)^{j2} * ... * pi^{n-2}(x)^{j_{n-1}},
with pi(x) = 2x^2 - 1. The basis is nested across sizes, so zero-padding
coefficients and running a larger evaluate() performs low-degree extension
(the blowup used for commitments and FRI).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from . import m31
from .circle import CanonicCoset, points_at_indices
from .rowref import dedup_jit

P_INT = m31.P_INT


def bit_reverse_indices(log_size: int) -> np.ndarray:
    """Permutation array: out[i] = bitrev(i, log_size)."""
    n = 1 << log_size
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_size):
        rev |= ((idx >> b) & 1) << (log_size - 1 - b)
    return rev


def bitrev_int(x: int, bits: int) -> int:
    """Bit-reverse of a single index (the verifier's point-wise accessors
    must not build 2^n permutation arrays for a handful of positions)."""
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _pi(x: np.ndarray) -> np.ndarray:
    """pi(x) = 2x^2 - 1 (host, uint64)."""
    x = np.asarray(x, np.uint64)
    return ((2 * x * x + (P_INT - 1)) % P_INT).astype(np.uint64)


@dataclass(frozen=True)
class Twiddles:
    """Per-domain twiddle stack (HOST numpy arrays, bit-reversed block order;
    device copies are cached separately — see _device_twiddles).

    fwd[L] has length 2^(log_size-1-L):
      L = 0: y(p) of the half coset; L >= 1: pi^(L-1)(x(p)).
    inv[L] = fwd[L]^-1 (the interpolation butterfly divides by the twiddle;
    the global 1/2^log_size normalization is applied once at the end).
    """

    log_size: int
    fwd: tuple
    inv: tuple


@lru_cache(maxsize=32)
def get_twiddles(log_size: int) -> Twiddles:
    """Precompute twiddles for the canonic domain of size 2^log_size."""
    assert log_size >= 1
    half = CanonicCoset(log_size).circle_domain().half_coset
    hx, hy = points_at_indices(half.indices())
    fwd: List[np.ndarray] = []
    # Stage 0: y twiddles over the half coset, block order bit-reversed.
    rev = bit_reverse_indices(log_size - 1) if log_size > 1 else np.array([0], np.uint32)
    fwd.append(hy[rev].astype(np.uint32))
    # Stage L >= 1 twiddles: pi^(L-1)(x(half.at(k))) for k < 2^(n-1-L),
    # in bit-reversed block order.
    x = hx.astype(np.uint64)
    for L in range(1, log_size):
        cnt = 1 << (log_size - 1 - L)
        r = bit_reverse_indices(log_size - 1 - L) if cnt > 1 else np.array([0], np.uint32)
        fwd.append(x[:cnt][r].astype(np.uint32))
        x = _pi(x)
    # Cache HOST arrays only: jnp constants created inside a jit trace would
    # leak tracers through the lru_cache.
    inv = tuple(m31.np_inv(t) for t in fwd)
    return Twiddles(log_size, tuple(fwd), inv)


_DEV_TW_CACHE: dict = {}


def _device_twiddles(n: int):
    """Device copies of the twiddle stacks (created eagerly, passed as jit
    arguments — never baked as constants, never re-uploaded per call).
    All 2n stage arrays ride ONE upload RPC (per-array jnp.asarray costs a
    TPU-relay round trip each)."""
    if n not in _DEV_TW_CACHE:
        from ..utils.transfer import upload_many

        t = get_twiddles(n)
        # eager even if first touched inside a jit trace (a traced creation
        # would cache tracers and leak)
        with jax.ensure_compile_time_eval():
            devs = upload_many(list(t.fwd) + list(t.inv))
        _DEV_TW_CACHE[n] = (tuple(devs[:len(t.fwd)]),
                            tuple(devs[len(t.fwd):]))
    return _DEV_TW_CACHE[n]


def _use_pallas(log_size: int) -> bool:
    """Route transforms through the fused Pallas kernels
    (ops/fft_pallas.py). STWO_BF_PALLAS_FFT: 1 = on where supported,
    0 = never, auto (default) = on-TPU where supported."""
    import os

    mode = os.environ.get("STWO_BF_PALLAS_FFT", "auto")
    if mode == "0":
        return False
    from ..ops import fft_pallas

    if mode == "1":
        return fft_pallas._supported(log_size)
    return fft_pallas.available(log_size)


def interpolate(values: jnp.ndarray, log_size: int | None = None) -> jnp.ndarray:
    """Circle evaluation (bit-reversed order, length 2^n) -> coefficients
    (natural order). Inverse of evaluate() on the same-size domain."""
    n = int(values.shape[-1]).bit_length() - 1 if log_size is None else log_size
    if _use_pallas(n):
        from ..ops import fft_pallas

        return fft_pallas.interpolate(values, n)
    # Twiddles are passed as traced arguments: baking them in as constants
    # makes XLA constant-fold multi-MB arrays at compile time.
    return _interpolate_jit(values, _device_twiddles(n)[1], n)


def _interpolate_body(values: jnp.ndarray, inv_tw, n: int) -> jnp.ndarray:
    v = values
    for L in range(n):
        blocks = 1 << (n - 1 - L)
        v = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
        a = v[..., 0, :]
        b = v[..., 1, :]
        t_inv = inv_tw[L].reshape((blocks, 1))
        s = m31.add(a, b)
        d = m31.mul(m31.sub(a, b), t_inv)
        v = jnp.stack([s, d], axis=-2).reshape(v.shape[:-3] + (1 << n,))
    # Global normalization 1/2^n mod p.
    scale = jnp.uint32(pow((P_INT + 1) // 2, n, P_INT))
    return m31.mul(v, scale)


_interpolate_jit = partial(jax.jit, static_argnames=("n",))(_interpolate_body)


def evaluate(coeffs: jnp.ndarray, log_size: int | None = None) -> jnp.ndarray:
    """Coefficients (natural order, length 2^m, zero-padded by the caller for
    blowup) -> circle evaluation on the canonic domain of size 2^n in
    bit-reversed order. n defaults to len(coeffs)."""
    n = int(coeffs.shape[-1]).bit_length() - 1 if log_size is None else log_size
    if _use_pallas(n):
        from ..ops import fft_pallas

        return fft_pallas.evaluate(coeffs, n)
    return _evaluate_jit(coeffs, _device_twiddles(n)[0], n)


def _evaluate_body(coeffs: jnp.ndarray, fwd_tw, n: int) -> jnp.ndarray:
    v = coeffs
    for L in reversed(range(n)):
        blocks = 1 << (n - 1 - L)
        v = v.reshape(v.shape[:-1] + (blocks, 2, 1 << L))
        a = v[..., 0, :]
        b = v[..., 1, :]
        t = fwd_tw[L].reshape((blocks, 1))
        tb = m31.mul(b, t)
        u0 = m31.add(a, tb)
        u1 = m31.sub(a, tb)
        v = jnp.stack([u0, u1], axis=-2).reshape(v.shape[:-3] + (1 << n,))
    return v


_evaluate_jit = partial(jax.jit, static_argnames=("n",))(_evaluate_body)


@partial(dedup_jit, static_argnums=(3, 4))
def _extend_jit(values, inv_tw, fwd_tw_big, n: int, blow: int):
    """Fused interpolate -> zero-pad -> evaluate on the blown-up domain:
    one executable per (batch, size) instead of three plus eager pad glue
    (each eager op is a compile + a relay round trip cold). `values` may be
    a tuple of (N,) columns — stacked in-executable (the eager jnp.stack of
    device-resident columns was a separate compile per group)."""
    if isinstance(values, tuple):
        from .rowref import as_row

        values = jnp.stack([as_row(v) for v in values])
    coeffs = _interpolate_body(values, inv_tw, n)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (1 << (n + blow)) - (1 << n))]
    ext = _evaluate_body(jnp.pad(coeffs, pad), fwd_tw_big, n + blow)
    return coeffs, ext


def extend_with_coeffs(values, log_size: int, log_blowup: int,
                       aot: bool = False):
    """(coefficients, blown-up evaluation) of a batch of columns, fused.
    `values`: (C, N) array or tuple of (N,) device columns (stacked inside
    the executable on the XLA path).

    aot=True (warmup): `values` entries may be ShapeDtypeStructs — the
    executable is loaded via .lower().compile() without executing; returns
    None."""
    if _use_pallas(log_size) and _use_pallas(log_size + log_blowup):
        from ..ops import fft_pallas

        return fft_pallas.extend_with_coeffs(values, log_size, log_blowup,
                                             aot=aot)
    args = (values, _device_twiddles(log_size)[1],
            _device_twiddles(log_size + log_blowup)[0])
    if aot:
        # statics passed positionally, exactly like the real call below —
        # keyword statics land in a different jit-cache entry
        _extend_jit.lower(*args, log_size, log_blowup).compile()
        return None
    return _extend_jit(*args, log_size, log_blowup)


# ---------------------------------------------------------------------------
# Closed-form is_first (Lagrange kernel at the first domain point)
# ---------------------------------------------------------------------------
#
# interpolate(e_0) has Kronecker structure: only block 0 of each butterfly
# stage is nonzero, so  c_j = (1/N) * prod_{bits b of j set} invtw_b[0].
# Hence the polynomial factors:
#   f(p) = (1/N) * prod_{b=0}^{n-1} (1 + invtw_b[0] * phi_b(p)),
#   phi_0 = y, phi_k = pi^(k-1)(x)
# — the extended evaluation is n fused elementwise passes (no butterflies),
# one tiny executable per (n, m) instead of a full CFFT per ladder size.

@partial(jax.jit, static_argnames=("n",))
def _is_first_coeffs_jit(tws, n: int):
    v = jnp.ones((1,), jnp.uint32)
    for b in range(n):
        v = jnp.concatenate([v, m31.mul(v, tws[b])])
    scale = np.uint32(pow((P_INT + 1) // 2, n, P_INT))
    return m31.mul(v, scale)


@partial(jax.jit, static_argnames=("n",))
def _is_first_ext_jit(xs, ys, tws, n: int):
    one = jnp.uint32(1)
    f = m31.add(one, m31.mul(ys, tws[0]))
    cur = xs
    for b in range(1, n):
        f = m31.mul(f, m31.add(one, m31.mul(cur, tws[b])))
        if b + 1 < n:
            # pi(x) = 2x^2 - 1
            x2 = m31.mul(cur, cur)
            cur = m31.add(m31.add(x2, x2), jnp.uint32(P_INT - 1))
    scale = np.uint32(pow((P_INT + 1) // 2, n, P_INT))
    return m31.mul(f, scale)


def _is_first_tws(n: int) -> jnp.ndarray:
    return jnp.asarray(np.array(
        [get_twiddles(n).inv[b][0] for b in range(n)], np.uint32))


def is_first_coeffs(log_size: int) -> jnp.ndarray:
    """Coefficients of the is_first column's interpolant (equals
    interpolate(e_0) exactly; tested against the CFFT path)."""
    return _is_first_coeffs_jit(_is_first_tws(log_size), log_size)


def is_first_extended(log_size: int, eval_log: int) -> jnp.ndarray:
    """is_first's low-degree extension onto the canonic domain of size
    2^eval_log (bit-reversed storage) — closed form, no CFFT."""
    from .quotients import domain_points_storage

    xs, ys = domain_points_storage(eval_log)
    return _is_first_ext_jit(jnp.asarray(xs), jnp.asarray(ys),
                             _is_first_tws(log_size), log_size)


@lru_cache(maxsize=64)
def coset_order_permutation(log_size: int) -> np.ndarray:
    """perm[l] = storage position (bit-reversed [H, -H] order) of the l-th
    point of the canonic coset in LINEAR order (point q(1+2l)).

    l = 2k   -> natural index k          (in H)
    l = 2k+1 -> natural index 2^(n-1) + (2^(n-1)-1-k)   (in -H, reversed)
    """
    n = log_size
    half = 1 << (n - 1)
    k = np.arange(half, dtype=np.uint32)
    nat = np.empty(1 << n, np.uint32)
    nat[0::2] = k
    nat[1::2] = half + (half - 1 - k)
    rev = bit_reverse_indices(n)
    return rev[nat]


@lru_cache(maxsize=64)
def rotation_permutation(log_size: int, log_blowup: int, shift_steps: int) -> np.ndarray:
    """Permutation realizing evaluation of f(p - shift_steps * g_n) from the
    evaluations of f on the blown-up domain of size 2^(log_size+log_blowup)
    (both in bit-reversed storage). g_n is the trace-domain step 2^(31-n).

    perm[j] = storage position of (point at storage j) - shift*g_n; i.e.
    rotated[j] = values[perm[j]].
    """
    # Closed form: the linear-order point l of the canonic domain of size
    # 2^n_big has circle index q*(2l+1) with q = 2^(30-n_big), and the trace
    # step is g_n = 2^(31-log_size) = q*2^(blowup+1) — so subtracting
    # shift_steps*g_n maps linear l to (l - shift_steps*2^blowup) mod N.
    # Composing with the linear<->storage permutation gives perm without the
    # 2^22-entry Python dict the first implementation built (~15 s of host
    # time per size on the first prove).
    n_big = log_size + log_blowup
    n = 1 << n_big
    cop = coset_order_permutation(n_big).astype(np.int64)  # linear -> storage
    inv = np.empty(n, np.int64)
    inv[cop] = np.arange(n)
    delta = shift_steps << log_blowup
    return cop[(inv - delta) % n].astype(np.uint32)


def extend(values: jnp.ndarray, log_blowup: int) -> jnp.ndarray:
    """Low-degree extension: evaluation on domain 2^n (bit-reversed) ->
    evaluation on domain 2^(n+log_blowup) (bit-reversed)."""
    n = int(values.shape[-1]).bit_length() - 1
    coeffs = interpolate(values, n)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (1 << (n + log_blowup)) - (1 << n))]
    coeffs = jnp.pad(coeffs, pad)
    return evaluate(coeffs, n + log_blowup)
