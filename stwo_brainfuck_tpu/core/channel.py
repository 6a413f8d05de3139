"""Blake2s Fiat-Shamir channel (host side).

TPU-native equivalent of stwo's ``Blake2sChannel``
(crates/brainfuck_prover/src/brainfuck_air/mod.rs:485 and :744-747).
The transcript is tiny and strictly sequential, so it runs on host with
hashlib.blake2s; the device Blake2s (core/blake2s.py) is bit-identical, which
keeps every committed root reproducible on either side.

Transcript rules (self-consistent; both prover and verifier call the same
methods in the same order):
- mix_*: digest <- blake2s(digest || data), draw counter resets;
- draw_*: stream blocks blake2s(digest || counter_le8), counter increments.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Sequence, Tuple

from .m31 import P_INT

QM31 = Tuple[int, int, int, int]


def _blake(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()


class Blake2sChannel:
    def __init__(self):
        self.digest = bytes(32)
        self._counter = 0

    # -- mixing ------------------------------------------------------------

    def mix_bytes(self, data: bytes) -> None:
        self.digest = _blake(self.digest + data)
        self._counter = 0

    def mix_root(self, root: bytes) -> None:
        assert len(root) == 32
        self.mix_bytes(root)

    def mix_u32s(self, values: Sequence[int]) -> None:
        self.mix_bytes(b"".join(struct.pack("<I", v & 0xFFFFFFFF) for v in values))

    def mix_u64(self, value: int) -> None:
        self.mix_bytes(struct.pack("<Q", value & 0xFFFFFFFFFFFFFFFF))

    def mix_felts(self, felts: Sequence[QM31]) -> None:
        self.mix_u32s([c for f in felts for c in f])

    # -- drawing -----------------------------------------------------------

    def _draw_block(self) -> bytes:
        out = _blake(self.digest + struct.pack("<Q", self._counter))
        self._counter += 1
        return out

    def draw_words(self, n: int) -> List[int]:
        words: List[int] = []
        while len(words) < n:
            block = self._draw_block()
            words.extend(struct.unpack("<8I", block))
        return words[:n]

    def draw_felt(self) -> QM31:
        w = self.draw_words(4)
        return tuple(v % P_INT for v in w)  # type: ignore[return-value]

    def draw_felts(self, n: int) -> List[QM31]:
        return [self.draw_felt() for _ in range(n)]

    def draw_queries(self, n_queries: int, log_domain_size: int) -> List[int]:
        """Exactly min(n_queries, domain) DISTINCT positions in
        [0, 2^log_domain_size), sorted. Keeps drawing until the target count
        is reached, so a duplicate draw never silently shrinks the query set
        (and with it the soundness margin)."""
        mask = (1 << log_domain_size) - 1
        target = min(n_queries, 1 << log_domain_size)
        positions: set = set()
        while len(positions) < target:
            for w in self.draw_words(8):
                positions.add(w & mask)
                if len(positions) >= target:
                    break
        return sorted(positions)

    # -- proof of work -----------------------------------------------------

    def check_pow_nonce(self, pow_bits: int, nonce: int) -> bool:
        return _check_pow(self.digest, pow_bits, nonce)

    def grind_pow(self, pow_bits: int) -> int:
        """Smallest valid nonce. Small grinds run on host; beyond ~2^13
        expected hashes the vectorized device Blake2s searches 2^17-nonce
        batches per call (a 20-bit grind is ~8 batches, well under a second,
        vs minutes for the sequential host loop)."""
        if pow_bits <= 13:
            nonce = 0
            while not self.check_pow_nonce(pow_bits, nonce):
                nonce += 1
            return nonce
        return _device_grind(self.digest, pow_bits)


def _check_pow(digest: bytes, pow_bits: int, nonce: int) -> bool:
    h = _blake(digest + struct.pack("<Q", nonce))
    v = struct.unpack("<I", h[:4])[0]
    return (v & ((1 << pow_bits) - 1)) == 0


_POW_BATCH_LOG = 17


def _device_grind(digest: bytes, pow_bits: int) -> int:
    import jax.numpy as jnp
    import numpy as np

    dw = jnp.asarray(np.frombuffer(digest, dtype="<u4"))
    mask = np.uint32((1 << pow_bits) - 1)
    batch = 1 << _POW_BATCH_LOG
    base = 0
    while True:
        idx, found = _pow_batch(dw, jnp.uint32(base & 0xFFFFFFFF),
                                jnp.uint32(base >> 32), jnp.uint32(mask))
        if bool(found):
            nonce = base + int(idx)
            assert _check_pow(digest, pow_bits, nonce)
            return nonce
        base += batch
        if base >= 1 << 48:  # unreachable for sane pow_bits
            raise RuntimeError("PoW grind exhausted")


def _pow_batch(digest_words, base_lo, base_hi, mask):
    import jax
    import jax.numpy as jnp

    from . import blake2s

    global _POW_BATCH_JIT
    try:
        fn = _POW_BATCH_JIT
    except NameError:
        @jax.jit
        def fn(dw, lo0, hi0, m):
            B = 1 << _POW_BATCH_LOG
            lo = lo0 + jnp.arange(B, dtype=jnp.uint32)
            hi = jnp.broadcast_to(hi0, (B,))
            msg = jnp.concatenate(
                [jnp.broadcast_to(dw, (B, 8)), lo[:, None], hi[:, None]],
                axis=1,
            )
            h = blake2s.hash_words(msg, n_bytes=40)
            ok = (h[:, 0] & m) == 0
            return jnp.argmax(ok), jnp.any(ok)

        _POW_BATCH_JIT = fn
    return fn(digest_words, base_lo, base_hi, mask)
