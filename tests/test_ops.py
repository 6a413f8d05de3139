"""Pallas kernel wrappers: CPU fallback correctness (the Pallas path itself
is exercised on real TPU hardware via `BENCH_PROGRAM=m31 python bench.py`)."""

import numpy as np
import jax.numpy as jnp

from stwo_brainfuck_tpu.core import m31
from stwo_brainfuck_tpu.ops import m31_pallas

RNG = np.random.default_rng(9)


def test_mul_fallback_matches_host():
    a = RNG.integers(0, int(m31.P), 1 << 12, dtype=np.uint32)
    b = RNG.integers(0, int(m31.P), 1 << 12, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(m31_pallas.mul(jnp.asarray(a), jnp.asarray(b))),
        m31.np_mul(a, b),
    )


def test_mul_add_fallback_matches_host():
    a = RNG.integers(0, int(m31.P), 1 << 10, dtype=np.uint32)
    b = RNG.integers(0, int(m31.P), 1 << 10, dtype=np.uint32)
    c = RNG.integers(0, int(m31.P), 1 << 10, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(m31_pallas.mul_add(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))),
        m31.np_add(m31.np_mul(a, b), c),
    )
