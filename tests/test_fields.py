"""Field arithmetic tests: device (uint32 limb) path vs host (uint64/bigint)
reference, plus algebraic identities. Mirrors the reference's reliance on
stwo's field tests (fields are external there; here they are ours to test)."""

import numpy as np
import jax.numpy as jnp

from stwo_brainfuck_tpu.core import m31, qm31

P = int(m31.P)
RNG = np.random.default_rng(0)


def rand_m31(n):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


def test_m31_add_sub_mul_vs_host():
    a = rand_m31(4096)
    b = rand_m31(4096)
    np.testing.assert_array_equal(np.asarray(m31.add(a, b)), m31.np_add(a, b))
    np.testing.assert_array_equal(np.asarray(m31.sub(a, b)), m31.np_sub(a, b))
    np.testing.assert_array_equal(np.asarray(m31.mul(a, b)), m31.np_mul(a, b))
    np.testing.assert_array_equal(np.asarray(m31.neg(a)), m31.np_neg(a))


def test_m31_mul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 2**30, 2**16 - 1, 2**16, 65537], np.uint32)
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    np.testing.assert_array_equal(np.asarray(m31.mul(a, b)), m31.np_mul(a, b))


def test_m31_inverse():
    a = rand_m31(512)
    a[0] = 0  # inv(0) = 0 convention (machine.rs:221-226)
    ai = np.asarray(m31.inv(a))
    prod = np.asarray(m31.mul(a, ai))
    expected = np.where(a == 0, 0, 1).astype(np.uint32)
    np.testing.assert_array_equal(prod, expected)
    assert ai[0] == 0


def test_m31_pow():
    a = rand_m31(16)
    # Fermat: a^(p-1) = 1 for a != 0
    np.testing.assert_array_equal(
        np.asarray(m31.pow_const(a, P - 1)),
        np.where(a == 0, 0, 1).astype(np.uint32),
    )


def rand_qm31(n):
    return RNG.integers(0, P, size=(4, n), dtype=np.uint32)


def test_qm31_ring_axioms():
    x = rand_qm31(256)
    y = rand_qm31(256)
    z = rand_qm31(256)
    # distributivity
    lhs = qm31.mul(x, qm31.add(y, z))
    rhs = qm31.add(qm31.mul(x, y), qm31.mul(x, z))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))
    # commutativity
    np.testing.assert_array_equal(np.asarray(qm31.mul(x, y)), np.asarray(qm31.mul(y, x)))
    # associativity
    np.testing.assert_array_equal(
        np.asarray(qm31.mul(qm31.mul(x, y), z)), np.asarray(qm31.mul(x, qm31.mul(y, z)))
    )


def test_qm31_inverse():
    x = rand_qm31(128)
    xi = qm31.inv(x)
    prod = np.asarray(qm31.mul(x, xi))
    one = np.asarray(qm31.one((128,)))
    np.testing.assert_array_equal(prod, one)


def test_qm31_device_vs_host():
    x = rand_qm31(64)
    y = rand_qm31(64)
    dev = np.asarray(qm31.mul(x, y))
    for i in range(64):
        hx = tuple(int(v) for v in x[:, i])
        hy = tuple(int(v) for v in y[:, i])
        hm = qm31.h_mul(hx, hy)
        assert tuple(int(v) for v in dev[:, i]) == hm
    # host inverse agrees with device inverse
    xi_dev = np.asarray(qm31.inv(x))
    for i in range(8):
        hx = tuple(int(v) for v in x[:, i])
        assert tuple(int(v) for v in xi_dev[:, i]) == qm31.h_inv(hx)


def test_qm31_is_field_of_size_p4():
    # multiplicative order of a random element divides p^4 - 1
    x = (5, 1, 3, 9)
    assert qm31.h_pow(x, P**4 - 1) == qm31.ONE


def test_qm31_embedding():
    a = rand_m31(32)
    emb = np.asarray(qm31.from_m31(a))
    assert emb.shape == (4, 32)
    np.testing.assert_array_equal(emb[0], a)
    assert emb[1:].sum() == 0
    b = rand_m31(32)
    np.testing.assert_array_equal(
        np.asarray(qm31.mul(qm31.from_m31(a), qm31.from_m31(b)))[0],
        m31.np_mul(a, b),
    )
