"""CFFT tests: generator/domain structure, naive-basis cross-check,
interpolate/evaluate roundtrip, low-degree extension."""

import numpy as np
import jax.numpy as jnp
import pytest

from stwo_brainfuck_tpu.core import fft, m31
from stwo_brainfuck_tpu.core.circle import (
    M31_CIRCLE_GEN,
    CanonicCoset,
    point_add,
    point_at_index,
    point_double,
    points_at_indices,
)
from stwo_brainfuck_tpu.core.m31 import P_INT

RNG = np.random.default_rng(1)


def test_generator_order():
    assert (M31_CIRCLE_GEN[0] ** 2 + M31_CIRCLE_GEN[1] ** 2) % P_INT == 1
    q = M31_CIRCLE_GEN
    for _ in range(30):
        q = point_double(q)
    assert q == (P_INT - 1, 0)  # order exactly 2^31


def test_point_at_index():
    assert point_at_index(0) == (1, 0)
    assert point_at_index(1) == M31_CIRCLE_GEN
    assert point_at_index(2) == point_double(M31_CIRCLE_GEN)
    assert point_at_index(3) == point_add(point_double(M31_CIRCLE_GEN), M31_CIRCLE_GEN)
    x, y = points_at_indices(np.array([0, 1, 2, 5]))
    assert (x[0], y[0]) == (1, 0)
    assert (x[1], y[1]) == M31_CIRCLE_GEN
    assert (x[3], y[3]) == point_at_index(5)


def test_domain_structure():
    n = 5
    dom = CanonicCoset(n).circle_domain()
    assert dom.size == 32
    xs, ys = dom.points()
    # all points on the circle
    assert np.all((xs.astype(np.uint64) ** 2 + ys.astype(np.uint64) ** 2) % P_INT == 1)
    # second half is the conjugate of the first half
    half = dom.size // 2
    np.testing.assert_array_equal(xs[:half], xs[half:])
    np.testing.assert_array_equal((P_INT - ys[:half]) % P_INT, ys[half:])
    # all 32 points distinct
    assert len({(int(x), int(y)) for x, y in zip(xs, ys)}) == 32
    # bit-reversed adjacency: positions 2m, 2m+1 are p, -p
    rev = fft.bit_reverse_indices(n)
    bx, by = xs[rev], ys[rev]
    np.testing.assert_array_equal(bx[0::2], bx[1::2])
    np.testing.assert_array_equal((P_INT - by[0::2]) % P_INT, by[1::2])


def naive_basis_eval(coeffs, log_size):
    """Evaluate sum_j c_j * y^{j0} x^{j1} pi(x)^{j2} ... at every domain point
    (natural order) with python ints."""
    dom = CanonicCoset(log_size).circle_domain()
    out = []
    for i in range(dom.size):
        x, y = dom.at(i)
        # basis factor per bit
        factors = [y]
        cur = x
        for _ in range(log_size - 1):
            factors.append(cur)
            cur = (2 * cur * cur - 1) % P_INT
        acc = 0
        for j, c in enumerate(coeffs):
            term = int(c)
            for b in range(log_size):
                if (j >> b) & 1:
                    term = term * factors[b] % P_INT
            acc = (acc + term) % P_INT
        out.append(acc)
    return np.array(out, np.uint32)


@pytest.mark.parametrize("log_size", [1, 2, 3, 4, 6])
def test_evaluate_matches_naive_basis(log_size):
    n = 1 << log_size
    coeffs = RNG.integers(0, P_INT, size=n, dtype=np.uint32)
    vals = np.asarray(fft.evaluate(coeffs, log_size))
    naive = naive_basis_eval(coeffs, log_size)
    rev = fft.bit_reverse_indices(log_size)
    # vals is bit-reversed: vals[j] = f(domain.at(bitrev(j)))
    np.testing.assert_array_equal(vals, naive[rev])


@pytest.mark.parametrize("log_size", [1, 3, 5, 8, 10])
def test_roundtrip(log_size):
    n = 1 << log_size
    vals = RNG.integers(0, P_INT, size=n, dtype=np.uint32)
    coeffs = fft.interpolate(vals, log_size)
    back = np.asarray(fft.evaluate(coeffs, log_size))
    np.testing.assert_array_equal(back, vals)


def test_extend_is_low_degree():
    log_size, blowup = 4, 2
    n = 1 << log_size
    coeffs = RNG.integers(0, P_INT, size=n, dtype=np.uint32)
    small = fft.evaluate(coeffs, log_size)
    big = np.asarray(fft.extend(small, blowup))
    # extension = evaluating zero-padded coefficients on the big domain
    padded = np.zeros(n << blowup, np.uint32)
    padded[:n] = np.asarray(fft.interpolate(small, log_size))
    np.testing.assert_array_equal(padded[:n], np.asarray(coeffs))
    naive = naive_basis_eval(padded, log_size + blowup)
    rev = fft.bit_reverse_indices(log_size + blowup)
    np.testing.assert_array_equal(big, naive[rev])


def test_batch_columns():
    # leading batch dimensions work (column matrices)
    log_size = 6
    vals = RNG.integers(0, P_INT, size=(5, 1 << log_size), dtype=np.uint32)
    coeffs = fft.interpolate(vals, log_size)
    back = np.asarray(fft.evaluate(coeffs, log_size))
    np.testing.assert_array_equal(back, vals)


def test_pallas_fft_bit_exact_interpret():
    """ops/fft_pallas fused two-pass kernels vs the staged XLA path
    (interpret mode runs the Pallas kernel on CPU; real-TPU exactness is
    asserted by the same comparison in the TPU bench path)."""
    from stwo_brainfuck_tpu.ops import fft_pallas

    rng = np.random.default_rng(3)
    for log in (12, 13):
        vals = jnp.asarray(rng.integers(0, P_INT, (2, 1 << log), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(fft_pallas.evaluate(vals, log, interpret=True)),
            np.asarray(fft.evaluate(vals, log)))
        np.testing.assert_array_equal(
            np.asarray(fft_pallas.interpolate(vals, log, interpret=True)),
            np.asarray(fft.interpolate(vals, log)))
        # 1-D contract
        np.testing.assert_array_equal(
            np.asarray(fft_pallas.evaluate(vals[0], log, interpret=True)),
            np.asarray(fft.evaluate(vals[0], log)))
        # fused extend (stack + interpolate + pad + evaluate, one program)
        c, e = fft_pallas.extend_with_coeffs(vals, log, 1, interpret=True)
        c2, e2 = fft._extend_jit(vals, fft._device_twiddles(log)[1],
                                 fft._device_twiddles(log + 1)[0], log, 1)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(e), np.asarray(e2))


def test_pallas_fft_two_pass_interpret(monkeypatch):
    """Force the two-pass row split (pass 1 strides >= A2) at a small size by
    shrinking the pass-2 slab cap; must stay bit-exact vs the XLA path."""
    from stwo_brainfuck_tpu.ops import fft_pallas

    monkeypatch.setattr(fft_pallas, "_MAX_LOG_A2", 3)
    fft_pallas._tables.cache_clear()
    saved = dict(fft_pallas._DEV_TABLES)
    fft_pallas._DEV_TABLES.clear()
    try:
        rng = np.random.default_rng(5)
        log = 12
        assert fft_pallas._plan(log)[2] == 2  # n1 = 2 pass-1 stages
        vals = jnp.asarray(
            rng.integers(0, P_INT, (2, 1 << log), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(fft_pallas.evaluate(vals, log, interpret=True)),
            np.asarray(fft.evaluate(vals, log)))
        np.testing.assert_array_equal(
            np.asarray(fft_pallas.interpolate(vals, log, interpret=True)),
            np.asarray(fft.interpolate(vals, log)))
    finally:
        fft_pallas._tables.cache_clear()
        fft_pallas._DEV_TABLES.clear()
        fft_pallas._DEV_TABLES.update(saved)


def test_is_first_closed_form_matches_cfft():
    """The closed-form Lagrange-kernel is_first (fft.is_first_coeffs /
    is_first_extended, used for the preprocessed ladder in air.py) must be
    bit-identical to running the full CFFT on the indicator column e_0."""
    for log_size in (2, 3, 5, 8):
        e0 = np.zeros(1 << log_size, np.uint32)
        e0[0] = 1
        ref_coeffs = np.asarray(fft.interpolate(jnp.asarray(e0), log_size))
        np.testing.assert_array_equal(
            np.asarray(fft.is_first_coeffs(log_size)), ref_coeffs)
        for blowup in (1, 2):
            ref_ext = np.asarray(fft.extend(jnp.asarray(e0), blowup))
            np.testing.assert_array_equal(
                np.asarray(fft.is_first_extended(log_size, log_size + blowup)),
                ref_ext)


def test_rotation_permutation_closed_form():
    """The closed-form rotation permutation (linear-index shift composed
    with the linear<->storage maps) must match the definitional version:
    position of (point at storage j) - shift*g_{log_size}, computed by
    looking indices up in a dict."""
    from stwo_brainfuck_tpu.core.circle import CanonicCoset, M31_CIRCLE_LOG_ORDER
    from stwo_brainfuck_tpu.core.fft import (
        bit_reverse_indices,
        rotation_permutation,
    )

    def definitional(log_size, log_blowup, shift_steps):
        n_big = log_size + log_blowup
        dom = CanonicCoset(n_big).circle_domain()
        sv = dom.indices().astype(np.int64)[bit_reverse_indices(n_big)]
        pos = {int(v): j for j, v in enumerate(sv)}
        g = shift_steps * (1 << (M31_CIRCLE_LOG_ORDER - log_size))
        return np.array(
            [pos[int((v - g) % (1 << M31_CIRCLE_LOG_ORDER))] for v in sv],
            np.uint32)

    for log, blow, s in [(3, 0, 1), (3, 1, 1), (4, 1, 0), (5, 2, 1),
                         (6, 1, 3), (7, 3, 2), (4, 2, 5), (8, 1, 1)]:
        np.testing.assert_array_equal(
            rotation_permutation(log, blow, s), definitional(log, blow, s))


def test_pallas_fft_top_size_interpret():
    """The top supported sizes exercise the deepest pass-1 stage counts; pin
    bit-exactness vs staged XLA. The full MAX_LOG=24 interpret-mode transform
    costs ~70 s, so default CI runs 2^22 (the deepest size any bundled
    program commits at below the composition domain) and the full size is
    opt-in via STWO_BF_SLOW_TESTS=1."""
    import os

    from stwo_brainfuck_tpu.ops import fft_pallas

    log = (fft_pallas.MAX_LOG
           if os.environ.get("STWO_BF_SLOW_TESTS") == "1"
           else min(fft_pallas.MAX_LOG, 22))
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.integers(0, P_INT, (1, 1 << log), dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(fft_pallas.evaluate(vals, log, interpret=True)),
        np.asarray(fft.evaluate(vals, log)))
    np.testing.assert_array_equal(
        np.asarray(fft_pallas.interpolate(vals, log, interpret=True)),
        np.asarray(fft.interpolate(vals, log)))
