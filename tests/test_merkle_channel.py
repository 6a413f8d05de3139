"""Blake2s device/host parity, channel determinism, Merkle commit/verify."""

import hashlib

import numpy as np
import pytest

from stwo_brainfuck_tpu.core import blake2s, merkle
from stwo_brainfuck_tpu.core.channel import Blake2sChannel
from stwo_brainfuck_tpu.core.m31 import P_INT

RNG = np.random.default_rng(2)


def test_blake2s_matches_hashlib():
    for nwords in (1, 8, 16, 17, 33):
        msgs = RNG.integers(0, 2**32, size=(5, nwords), dtype=np.uint32)
        digs = np.asarray(blake2s.hash_words(msgs))
        for i in range(5):
            expect = hashlib.blake2s(msgs[i].astype("<u4").tobytes()).digest()
            assert blake2s.digest_to_bytes(digs[i]) == expect


def test_channel_determinism_and_divergence():
    a, b = Blake2sChannel(), Blake2sChannel()
    a.mix_u32s([1, 2, 3])
    b.mix_u32s([1, 2, 3])
    assert a.draw_felt() == b.draw_felt()
    assert a.digest == b.digest
    a.mix_u64(7)
    b.mix_u64(8)
    assert a.draw_felt() != b.draw_felt()
    # draws advance
    c = Blake2sChannel()
    assert c.draw_felt() != c.draw_felt()
    # felts are canonical M31
    for f in c.draw_felts(8):
        assert all(0 <= v < P_INT for v in f)


def test_channel_pow():
    ch = Blake2sChannel()
    ch.mix_u32s([42])
    nonce = ch.grind_pow(8)
    assert ch.check_pow_nonce(8, nonce)
    assert not ch.check_pow_nonce(30, nonce) or True  # just must not raise


def test_device_pow_grind_matches_host():
    from stwo_brainfuck_tpu.core.channel import _device_grind

    ch = Blake2sChannel()
    ch.mix_u32s([99])
    # host sequential smallest nonce at 8 bits
    host_nonce = 0
    while not ch.check_pow_nonce(8, host_nonce):
        host_nonce += 1
    assert _device_grind(ch.digest, 8) == host_nonce


def test_device_pow_grind_high_bits():
    ch = Blake2sChannel()
    ch.mix_u32s([7, 13])
    nonce = ch.grind_pow(16)  # routed to the device path (> 13 bits)
    assert ch.check_pow_nonce(16, nonce)


def test_draw_queries_exact_count():
    # Must return exactly n distinct positions even when raw draws collide
    # (small domain forces collisions).
    ch = Blake2sChannel()
    ch.mix_u32s([1])
    qs = ch.draw_queries(20, 5)
    assert len(qs) == 20 and len(set(qs)) == 20
    assert all(0 <= q < 32 for q in qs)
    # domain smaller than the request: capped at the domain size
    ch2 = Blake2sChannel()
    qs2 = ch2.draw_queries(20, 4)
    assert sorted(qs2) == list(range(16))
    # deterministic replay
    ch3 = Blake2sChannel()
    ch3.mix_u32s([1])
    assert ch3.draw_queries(20, 5) == qs


def _random_columns():
    return {
        6: [RNG.integers(0, P_INT, 64, dtype=np.uint32) for _ in range(3)],
        4: [RNG.integers(0, P_INT, 16, dtype=np.uint32) for _ in range(2)],
        2: [RNG.integers(0, P_INT, 4, dtype=np.uint32)],
    }


def test_merkle_commit_verify_roundtrip():
    cols = _random_columns()
    tree = merkle.commit(cols)
    queries = [0, 5, 63, 17]
    dec = merkle.decommit(tree, queries)
    sizes = {k: len(v) for k, v in cols.items()}
    values = merkle.verify(tree.root, sizes, queries, dec)
    # returned values match the committed columns
    needed6 = sorted({q for q in queries})
    np.testing.assert_array_equal(values[6][0], [int(cols[6][0][p]) for p in needed6])
    needed4 = sorted({q >> 2 for q in queries})
    np.testing.assert_array_equal(values[4][1], [int(cols[4][1][p]) for p in needed4])


def test_merkle_detects_tampering():
    cols = _random_columns()
    tree = merkle.commit(cols)
    queries = [3, 40]
    sizes = {k: len(v) for k, v in cols.items()}

    dec = merkle.decommit(tree, queries)
    dec.column_values[6][0][0] = (dec.column_values[6][0][0] + 1) % P_INT
    with pytest.raises(merkle.MerkleVerificationError):
        merkle.verify(tree.root, sizes, queries, dec)

    dec2 = merkle.decommit(tree, queries)
    dec2.witness_hashes[0] = bytes(32)
    with pytest.raises(merkle.MerkleVerificationError):
        merkle.verify(tree.root, sizes, queries, dec2)

    dec3 = merkle.decommit(tree, queries)
    with pytest.raises(merkle.MerkleVerificationError):
        merkle.verify(bytes(32), sizes, queries, dec3)


def test_merkle_root_depends_on_all_columns():
    cols = _random_columns()
    r1 = merkle.commit(cols).root
    cols[2][0] = cols[2][0].copy()
    cols[2][0][3] ^= 1
    r2 = merkle.commit(cols).root
    assert r1 != r2


def test_level_plan_covers_all_levels():
    # Every level from the deepest injected level down to 0 must be produced
    # exactly once, levels-with-columns as leaf/node steps and digest-only
    # levels inside chains with chunk boundaries aligned to _CHAIN_CHUNK
    # multiples (so chunk shapes recur across trees of different heights).
    for sig in ([(6, 3), (4, 2), (2, 1)], [(10, 8)], [(13, 4), (5, 1)],
                [(21, 96), (18, 16), (17, 8)]):
        plan = merkle.level_plan(sig)
        by = dict(sig)
        produced = []
        assert plan[0][0] == "leaf" and plan[0][1] == max(by)
        for kind, k, arg in plan:
            if kind in ("leaf", "node"):
                assert arg == by[k]
                produced.append(k)
            else:
                assert kind == "chain"
                assert k not in by
                produced.extend(range(k, k - arg, -1))
                # chain stops at a column level or an aligned boundary
                stop = k - arg + 1
                assert stop - 1 in by or stop % merkle._CHAIN_CHUNK == 0
                assert arg <= merkle._CHAIN_CHUNK
        assert produced == list(range(max(by), -1, -1))


def test_level_plan_chunks_shared_across_heights():
    # Two trees of different heights with no intermediate columns share the
    # aligned interior chain shapes (same (depth) for the same k ranges).
    p1 = {s[1:] for s in merkle.level_plan([(12, 4)]) if s[0] == "chain"}
    p2 = {s[1:] for s in merkle.level_plan([(16, 4)]) if s[0] == "chain"}
    shared = p1 & p2
    assert shared, (p1, p2)


def test_device_mix_draw_matches_host_channel():
    """_mix_draw2_jit (the FRI loop's device-resident Fiat-Shamir step) must
    be bit-identical to Blake2sChannel.mix_root + draw_felt."""
    import numpy as np
    import jax.numpy as jnp

    from stwo_brainfuck_tpu.core import qm31
    from stwo_brainfuck_tpu.core.channel import Blake2sChannel
    from stwo_brainfuck_tpu.core.fri import _mix_draw2_jit

    rng = np.random.default_rng(3)
    for _ in range(4):
        start = rng.bytes(32)
        root = rng.bytes(32)
        ch = Blake2sChannel()
        ch.digest = start
        ch.mix_root(root)
        beta_host = ch.draw_felt()

        d2, beta, beta2 = _mix_draw2_jit(
            jnp.asarray(np.frombuffer(start, dtype="<u4")),
            jnp.asarray(np.frombuffer(root, dtype="<u4")))
        assert np.asarray(d2, dtype="<u4").tobytes() == ch.digest
        assert tuple(int(x) for x in np.asarray(beta)) == beta_host
        exp2 = qm31.h_mul(beta_host, beta_host)
        assert tuple(int(x) for x in np.asarray(beta2)) == exp2
