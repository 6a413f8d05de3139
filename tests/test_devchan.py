"""Device-channel transcript bit-identity: every devchan primitive must
reproduce the host Blake2sChannel's bytes exactly (the verifier replays the
transcript on host with hashlib — any divergence breaks every proof)."""

import numpy as np
import jax.numpy as jnp

from stwo_brainfuck_tpu.core import devchan, qm31
from stwo_brainfuck_tpu.core.channel import Blake2sChannel
from stwo_brainfuck_tpu.core.m31 import P_INT


def _host_channel(seed: bytes = b"") -> Blake2sChannel:
    ch = Blake2sChannel()
    if seed:
        ch.mix_bytes(seed)
    return ch


def _dc_from(ch: Blake2sChannel) -> devchan.DeviceChannel:
    return devchan.DeviceChannel(ch.digest)


def test_mix_root_matches_host():
    ch = _host_channel(b"seed")
    dc = _dc_from(ch)
    root = bytes(range(32))
    ch.mix_root(root)
    dc.mix_root(jnp.asarray(np.frombuffer(root, dtype="<u4")).reshape(1, 8))
    assert np.asarray(dc.digest).tobytes() == ch.digest


def test_draw_felt_matches_host():
    ch = _host_channel(b"abc")
    dc = _dc_from(ch)
    for _ in range(3):
        host = ch.draw_felt()
        dev = tuple(int(v) for v in np.asarray(dc.draw_felt()))
        assert dev == host


def test_els_matches_host_draw_elements():
    from stwo_brainfuck_tpu.air import draw_elements

    ch = _host_channel(b"elements")
    dc = _dc_from(ch)
    els_host = draw_elements(ch)
    els_dev = dc.draw_elements()
    assert dc.counter == ch._counter == 6
    for name, e in els_host.items():
        d = els_dev[name]
        assert tuple(int(v) for v in np.asarray(d["z"])) == e.z
        np.testing.assert_array_equal(
            np.asarray(d["alpha_powers"]),
            np.array(e.alpha_powers, np.uint32))


def test_mix_chain_matches_host_mix_felts():
    ch = _host_channel(b"chain")
    dc = _dc_from(ch)
    rng = np.random.default_rng(0)
    g0 = rng.integers(0, P_INT, (4,), dtype=np.uint32)
    g1 = rng.integers(0, P_INT, (4, 3), dtype=np.uint32)
    # host: one whole-array mix, a two-felt mix, an empty mix, a single
    # member mix — exactly the sampled-values walk's mix shapes
    ch.mix_felts([tuple(int(v) for v in g0)])
    ch.mix_felts([tuple(int(v) for v in g1[:, 0]),
                  tuple(int(v) for v in g1[:, 2])])
    ch.mix_felts([])
    ch.mix_felts([tuple(int(v) for v in g1[:, 1])])
    spec = (((0, -1),), ((1, 0), (1, 2)), (), ((1, 1),))
    dc.mix_chain((jnp.asarray(g0), jnp.asarray(g1)), spec)
    assert np.asarray(dc.digest).tobytes() == ch.digest


def test_mix_felt_arrays_matches_interaction_claim_mix():
    ch = _host_channel(b"iclaim")
    dc = _dc_from(ch)
    rng = np.random.default_rng(1)
    vals = [rng.integers(0, P_INT, (4,), dtype=np.uint32) for _ in range(13)]
    for v in vals:
        ch.mix_felts([tuple(int(x) for x in v)])
    dc.mix_felt_arrays([jnp.asarray(v) for v in vals])
    assert np.asarray(dc.digest).tobytes() == ch.digest


def test_comp_weights_matches_host_powers():
    ch = _host_channel(b"weights")
    dc = _dc_from(ch)
    alpha = ch.draw_felt()
    spec = (("dense", 0, 3), ("union", 3, (0, 2, 4), 5), ("dense", 6, 2))
    outs = devchan._comp_weights_jit(dc.digest, spec, 0)
    dense0 = np.array([qm31.h_pow(alpha, i) for i in range(3)], np.uint32)
    np.testing.assert_array_equal(np.asarray(outs[0]), dense0)
    union = np.zeros((5, 4), np.uint32)
    for local, slot in enumerate((0, 2, 4)):
        union[slot] = qm31.h_pow(alpha, 3 + local)
    np.testing.assert_array_equal(np.asarray(outs[1]), union)
    dense2 = np.array([qm31.h_pow(alpha, 6 + i) for i in range(2)], np.uint32)
    np.testing.assert_array_equal(np.asarray(outs[2]), dense2)


def test_oods_matches_host_point_and_bases():
    from stwo_brainfuck_tpu.core.circle import point_from_t
    from stwo_brainfuck_tpu.core.pcs import shifted_point
    from stwo_brainfuck_tpu.core.poly import half_bases_at_point

    ch = _host_channel(b"oods")
    dc = _dc_from(ch)
    t = ch.draw_felt()
    z = point_from_t(t)
    groups = ((4, 0), (4, 1), (6, 0), (9, 1))
    zx, zy, bases = devchan._oods_jit(dc.digest, groups)
    assert tuple(int(v) for v in np.asarray(zx)) == z[0]
    assert tuple(int(v) for v in np.asarray(zy)) == z[1]
    for (lg, s), (b_lo, b_hi) in zip(groups, bases):
        hb_lo, hb_hi = half_bases_at_point(lg, shifted_point(z, lg, s))
        np.testing.assert_array_equal(np.asarray(b_lo), hb_lo)
        np.testing.assert_array_equal(np.asarray(b_hi), hb_hi)


def test_quot_consts_matches_host_group_constants():
    from stwo_brainfuck_tpu.core.circle import point_from_t
    from stwo_brainfuck_tpu.core.pcs import shifted_point
    from stwo_brainfuck_tpu.core.quotients import (
        QuotientClaim,
        _group_claims,
        _group_constants,
    )

    ch = _host_channel(b"quot")
    t = ch.draw_felt()
    z = point_from_t(t)
    ch.mix_bytes(b"sampled")  # the sampled-values walk precedes the draws
    dc = _dc_from(ch)
    alpha_q = ch.draw_felt()   # counter 0 post-mix
    beta0_host = ch.draw_felt()  # counter 1

    rng = np.random.default_rng(2)
    lg = 5
    vals0 = rng.integers(0, P_INT, (4, 3), dtype=np.uint32)  # 3 cols shift 0
    vals1 = rng.integers(0, P_INT, (4, 1), dtype=np.uint32)  # 1 col shift 1
    # host claims: columns 0..2 at z (aidx 0,1,3), column 2 also at z-g
    # (aidx 2) — the s-column interleaving of the real walk
    claims = [
        [QuotientClaim(shifted_point(z, lg, 0),
                       tuple(int(v) for v in vals0[:, 0]), 0)],
        [QuotientClaim(shifted_point(z, lg, 0),
                       tuple(int(v) for v in vals0[:, 1]), 1),
         QuotientClaim(shifted_point(z, lg, 1),
                       tuple(int(v) for v in vals1[:, 0]), 2)],
        [QuotientClaim(shifted_point(z, lg, 0),
                       tuple(int(v) for v in vals0[:, 2]), 3)],
    ]
    groups = _group_claims(claims)
    host_out = [_group_constants(members, alpha_q)
                for members in groups.values()]

    spec = ((lg, ((0, 0, (0, 1, 3)), (1, 1, (2,)))),)
    zx = jnp.asarray(np.array(z[0], np.uint32))
    zy = jnp.asarray(np.array(z[1], np.uint32))
    aq_dev, beta0_dev, outs = devchan._quot_consts_jit(
        dc.digest, zx, zy, (jnp.asarray(vals0), jnp.asarray(vals1)), spec)
    assert tuple(int(v) for v in np.asarray(aq_dev)) == alpha_q
    assert tuple(int(v) for v in np.asarray(beta0_dev)) == beta0_host
    consts, w = outs[0]
    consts = np.asarray(consts)
    w = np.asarray(w)
    for gi, (h_consts, h_weights, _idxs) in enumerate(host_out):
        np.testing.assert_array_equal(consts[gi], h_consts)
    np.testing.assert_array_equal(
        w, np.concatenate([h[1] for h in host_out]))
