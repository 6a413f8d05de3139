"""The verifier's point-wise fast paths (added to cut fresh-process verify
from ~23 s to ~0.3 s) must be value-identical to the full-domain forms they
replace — any drift here is a soundness/completeness bug:

- fft.bitrev_int vs the bit_reverse_indices permutation array
- quotients.point_at_storage vs quotients.domain_points_storage
- fri._circle_itw_host / _line_itw_host vs the full fold-twiddle stacks
- quotients.prepare_point_groups + quotient_value_at_position vs the naive
  per-claim sum  sum_k alpha^k (f_k - l_k(p)) / V_k(p)
"""

import numpy as np
import pytest

from stwo_brainfuck_tpu.core import fft, fri, qm31, quotients
from stwo_brainfuck_tpu.core.m31 import P_INT


@pytest.mark.parametrize("bits", [1, 4, 9])
def test_bitrev_int_matches_permutation_array(bits):
    rev = fft.bit_reverse_indices(bits)
    for i in range(1 << bits):
        assert fft.bitrev_int(i, bits) == rev[i]


@pytest.mark.parametrize("log_size", [4, 8, 12])
def test_point_at_storage_matches_full_domain(log_size):
    xs, ys = quotients.domain_points_storage(log_size)
    rng = np.random.default_rng(5)
    for pos in rng.integers(0, 1 << log_size, 16):
        x, y = quotients.point_at_storage(log_size, int(pos))
        assert (x, y) == (int(xs[pos]), int(ys[pos]))


@pytest.mark.parametrize("log_size", [4, 9, 13])
def test_circle_itw_host_matches_stack(log_size):
    full = fri._circle_fold_itw(log_size)
    rng = np.random.default_rng(7)
    for t in rng.integers(0, 1 << (log_size - 1), 8):
        assert fri._circle_itw_host(log_size, int(t)) == int(full[t])


@pytest.mark.parametrize("line_log", [3, 8, 12])
def test_line_itw_host_matches_stack(line_log):
    full = fri._line_fold_itw(line_log)
    rng = np.random.default_rng(9)
    for t in rng.integers(0, 1 << (line_log - 1), 8):
        assert fri._line_itw_host(line_log, int(t)) == int(full[t])


def _rand_qm31(rng):
    return tuple(int(v) for v in rng.integers(0, P_INT, 4, dtype=np.int64))


def test_prepared_quotient_matches_naive_per_claim_sum():
    """The grouped evaluation (one inverse per point group) must equal the
    naive per-claim sum — the exact formula the round-2 verifier computed."""
    rng = np.random.default_rng(11)
    log_size = 6
    z1 = (_rand_qm31(rng), _rand_qm31(rng))
    z2 = (_rand_qm31(rng), _rand_qm31(rng))
    # 3 columns; columns 0,2 sampled at z1 and z2, column 1 only at z1
    claims = [
        [quotients.QuotientClaim(z1, _rand_qm31(rng), 0),
         quotients.QuotientClaim(z2, _rand_qm31(rng), 1)],
        [quotients.QuotientClaim(z1, _rand_qm31(rng), 2)],
        [quotients.QuotientClaim(z1, _rand_qm31(rng), 3),
         quotients.QuotientClaim(z2, _rand_qm31(rng), 4)],
    ]
    alpha = _rand_qm31(rng)
    prepared = quotients.prepare_point_groups(claims, alpha)

    for position in (0, 5, 63):
        col_vals = [int(v) for v in rng.integers(0, P_INT, 3, dtype=np.int64)]
        got = quotients.quotient_value_at_position(
            log_size, position, col_vals, prepared=prepared)

        # naive: sum_k alpha^k (f_k - l_k(p)) / V_k(p), claim by claim
        x, y = quotients.point_at_storage(log_size, position)
        px, py = (x, 0, 0, 0), (y, 0, 0, 0)
        acc = qm31.ZERO
        for fval, col_claims in zip(col_vals, claims):
            fq = (fval % P_INT, 0, 0, 0)
            for c in col_claims:
                l0, s, dy, dx, vc = quotients._line_and_vanishing_coeffs(
                    c.point, c.value)
                num = qm31.h_sub(fq, qm31.h_add(l0, qm31.h_mul(s, py)))
                van = qm31.h_add(
                    qm31.h_sub(qm31.h_mul(dy, px), qm31.h_mul(dx, py)), vc)
                q = qm31.h_mul(num, qm31.h_inv(van))
                acc = qm31.h_add(
                    acc, qm31.h_mul(qm31.h_pow(alpha, c.alpha_index), q))
        assert got == acc
