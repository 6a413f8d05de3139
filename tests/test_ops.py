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


def test_weighted_columns_scan_matches_tree(monkeypatch):
    """The large-N lax.scan form of quotients._weighted_columns (bounded
    memory: big22's 58-column 2^23 group OOMed the tree form's (4, C, N)
    intermediate on a 15.75 GB chip) must be value-identical to the
    small-N tree form."""
    from stwo_brainfuck_tpu.core import quotients

    C, N = 7, 1 << 10
    cols = RNG.integers(0, int(m31.P), (C, N), dtype=np.uint32)
    weights = RNG.integers(0, int(m31.P), (C, 4), dtype=np.uint32)

    tree = np.asarray(
        quotients._weighted_columns(jnp.asarray(cols), jnp.asarray(weights)))

    # force the scan branch; use the unjitted wrapped function so the
    # patched threshold is actually read (the jit cache keys on shapes only)
    monkeypatch.setattr(quotients, "_SCAN_ROWS", 1)
    scan = np.asarray(quotients._weighted_columns.__wrapped__(
        jnp.asarray(cols), jnp.asarray(weights)))

    np.testing.assert_array_equal(tree, scan)


def test_weighted_columns_single_column_scan(monkeypatch):
    """C=1 must stay on the tree form even above the threshold (the scan
    form's init consumes the first column; scanning zero steps is fine, but
    the C>1 guard keeps the jaxpr trivial)."""
    from stwo_brainfuck_tpu.core import quotients

    cols = RNG.integers(0, int(m31.P), (1, 1 << 10), dtype=np.uint32)
    weights = RNG.integers(0, int(m31.P), (1, 4), dtype=np.uint32)
    monkeypatch.setattr(quotients, "_SCAN_ROWS", 1)
    out = np.asarray(quotients._weighted_columns.__wrapped__(
        jnp.asarray(cols), jnp.asarray(weights)))
    exp = m31.np_mul(weights.T[:, :1], cols[:1])
    np.testing.assert_array_equal(out, exp)
