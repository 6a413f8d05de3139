"""BLAKE2s-256, vectorized over many independent messages (TPU device path).

TPU-native equivalent of the reference's Blake2s Merkle hasher / channel hash
(stwo ``vcs::blake2_merkle`` / ``channel::Blake2sChannel``; used at
crates/brainfuck_prover/src/brainfuck_air/mod.rs:57-64).

The device path hashes N same-length messages at once as pure uint32 VPU ops
(xor/add/rotr); digests are bit-identical to python's hashlib.blake2s
(tested), which the host-side channel and verifier use.

Messages are uint32 word arrays (everything we hash — digests and M31 column
values — is 4-byte aligned little-endian, so no byte plumbing is needed).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

# h[0] ^= 0x01010000 | digest_length (32); fanout=1 depth=1, no key.
_H0 = _IV.copy()
_H0[0] ^= np.uint32(0x01010020)

_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int32,
)


def _rotr(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress_t(h: jnp.ndarray, m_t: jnp.ndarray, t_lo, t_hi, last) -> jnp.ndarray:
    """One BLAKE2s compression. h: (..., 8) uint32; m_t: (16, ...) uint32
    message words TRANSPOSED (word index leading); t_lo/t_hi: byte counter
    after this block (traced uint32 scalars); last: final-block flag (traced
    bool scalar).

    The 10 rounds run as a lax.fori_loop; each round gathers its message
    schedule from m_t along the LEADING axis (16 major-dim rows — cheap on
    TPU). The previous form pre-permuted all 10 schedules into a
    (10, ..., 16) buffer: 10x the message bytes materialized in HBM and a
    multi-MB serialized executable per Merkle level shape — executable LOAD
    bandwidth through the TPU relay is the dominant cold-start cost."""
    shape = h.shape[:-1]
    v = [h[..., i] for i in range(8)] + [
        jnp.broadcast_to(jnp.uint32(_IV[i]), shape) for i in range(8)
    ]
    v[12] = v[12] ^ jnp.uint32(t_lo)
    v[13] = v[13] ^ jnp.uint32(t_hi)
    v[14] = jnp.where(last, v[14] ^ jnp.uint32(0xFFFFFFFF), v[14])

    sigma = jnp.asarray(_SIGMA)

    def g(a, b, c, d, x, y):
        a = a + b + x
        d = _rotr(d ^ a, 16)
        c = c + d
        b = _rotr(b ^ c, 12)
        a = a + b + y
        d = _rotr(d ^ a, 8)
        c = c + d
        b = _rotr(b ^ c, 7)
        return a, b, c, d

    def round_fn(r, v):
        v = list(v)
        mr = jnp.take(m_t, sigma[r], axis=0)
        v[0], v[4], v[8], v[12] = g(v[0], v[4], v[8], v[12], mr[0], mr[1])
        v[1], v[5], v[9], v[13] = g(v[1], v[5], v[9], v[13], mr[2], mr[3])
        v[2], v[6], v[10], v[14] = g(v[2], v[6], v[10], v[14], mr[4], mr[5])
        v[3], v[7], v[11], v[15] = g(v[3], v[7], v[11], v[15], mr[6], mr[7])
        v[0], v[5], v[10], v[15] = g(v[0], v[5], v[10], v[15], mr[8], mr[9])
        v[1], v[6], v[11], v[12] = g(v[1], v[6], v[11], v[12], mr[10], mr[11])
        v[2], v[7], v[8], v[13] = g(v[2], v[7], v[8], v[13], mr[12], mr[13])
        v[3], v[4], v[9], v[14] = g(v[3], v[4], v[9], v[14], mr[14], mr[15])
        return tuple(v)

    v = jax.lax.fori_loop(0, 10, round_fn, tuple(v))
    out = [h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)]
    return jnp.stack(out, axis=-1)


def compress(h: jnp.ndarray, m: jnp.ndarray, t: int, last: bool) -> jnp.ndarray:
    """Compatibility wrapper: m word-minor (..., 16), static t/last."""
    return _compress_t(h, jnp.moveaxis(m, -1, 0), t & 0xFFFFFFFF,
                       (t >> 32) & 0xFFFFFFFF, last)


def hash_words(words: jnp.ndarray, n_bytes: int | None = None) -> jnp.ndarray:
    """BLAKE2s-256 of N same-length word-aligned messages.

    words: (..., W) uint32 little-endian message words.
    n_bytes: true message length (defaults to 4*W; pass a smaller value only
    if trailing words are zero padding).
    Returns (..., 8) uint32 digest words.
    """
    return _hash_words_jit(jnp.asarray(words, jnp.uint32), n_bytes)


@partial(jax.jit, static_argnames=("n_bytes",))
def _hash_words_jit(words: jnp.ndarray, n_bytes: int | None) -> jnp.ndarray:
    w = words.shape[-1]
    total = 4 * w if n_bytes is None else n_bytes
    n_blocks = max(1, -(-w // 16))
    pad = n_blocks * 16 - w
    if pad:
        words = jnp.concatenate(
            [words, jnp.zeros(words.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    h = jnp.broadcast_to(jnp.asarray(_H0), words.shape[:-1] + (8,))
    if n_blocks == 1:
        return _compress_t(h, jnp.moveaxis(words, -1, 0), total, 0, True)
    # Multi-block: ONE compression body scanned over blocks (the unrolled
    # form compiled a full compress per block — executable size grew with
    # the column count of every Merkle level shape).
    blocks = jnp.moveaxis(  # (n_blocks, 16, ...)
        words.reshape(words.shape[:-1] + (n_blocks, 16)), (-2, -1), (0, 1))
    t_lo = jnp.asarray(
        [(total if b == n_blocks - 1 else 64 * (b + 1)) & 0xFFFFFFFF
         for b in range(n_blocks)], jnp.uint32)
    t_hi = jnp.asarray(
        [(total if b == n_blocks - 1 else 64 * (b + 1)) >> 32
         for b in range(n_blocks)], jnp.uint32)
    last = jnp.asarray([b == n_blocks - 1 for b in range(n_blocks)])

    def body(h, x):
        blk, lo, hi, lst = x
        return _compress_t(h, blk, lo, hi, lst), None

    h, _ = jax.lax.scan(body, h, (blocks, t_lo, t_hi, last))
    return h


def digest_to_bytes(digest_words: np.ndarray) -> bytes:
    """(8,) uint32 digest words -> 32-byte digest (little-endian words)."""
    return np.asarray(digest_words, dtype="<u4").tobytes()
