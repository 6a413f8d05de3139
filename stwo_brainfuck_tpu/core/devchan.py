"""Device-resident Fiat-Shamir transcript for the single-chip prove path.

Byte-identical to the host ``Blake2sChannel`` (core/channel.py): mixes are
``digest' = blake2s(digest || data)`` and draws are
``blake2s(digest || counter_le8)`` with the counter reset by every mix. The
whole prove pipeline's transcript sequence is STATIC given (claim, config),
so the counter at every draw site is a Python-side constant and the only
cross-executable state is the 32-byte digest — which stays on device from
the phase-1 root mix until one batched pull before the proof-of-work.

This removes the per-phase host sync round trips (~10 per prove through the
TPU relay, ~45 ms each) that dominated small-program prove latency
(VERDICT r4 items 3; reference wall-clock hooks:
crates/brainfuck_prover/src/bin/brainfuck_prover.rs:119-125). The FRI layer
loop already ran its chain on device (core/fri.py:_mix_draw2_jit); this
module extends the same pattern to phases 1-3, element/alpha/OODS draws,
and the OODS quotient constants.

Transcript-bit-identity with the host channel is pinned by
tests/test_devchan.py; proofs are byte-identical to the host-channel path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import blake2s, m31, qm31
from .poly import sum_mod


def _le8(counter: int) -> np.ndarray:
    return np.array([counter & 0xFFFFFFFF, counter >> 32], np.uint32)


def _hash1(words: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """blake2s of ONE word-aligned message (inline in an enclosing jit)."""
    return blake2s.hash_words(words, n_bytes=n_bytes)


def _draw_felt(digest: jnp.ndarray, counter: int) -> jnp.ndarray:
    """draw_felt at a static counter: first 4 words of
    blake2s(digest || counter_le8) reduced to canonical M31."""
    blk = _hash1(jnp.concatenate([digest, jnp.asarray(_le8(counter))]),
                 n_bytes=40)
    return m31.reduce_once(blk[:4])


@jax.jit
def _mix_root_jit(digest: jnp.ndarray, root: jnp.ndarray) -> jnp.ndarray:
    """digest' = blake2s(digest || root). root may be (8,) or (1, 8) (the
    Merkle root layer as produced by commit — reshaped in-executable so no
    eager getitem dispatch is needed)."""
    return _hash1(jnp.concatenate([digest, root.reshape(8)]), n_bytes=64)


@partial(jax.jit, static_argnames=("counters",))
def _draw_felts_jit(digest: jnp.ndarray, counters: tuple) -> tuple:
    return tuple(_draw_felt(digest, c) for c in counters)


@partial(jax.jit, static_argnames=("spec",))
def _mix_chain_jit(digest: jnp.ndarray, garrs: tuple, spec: tuple):
    """A static sequence of felt mixes, scanned on device.

    spec: per mix, a tuple of (group_index, member_index) — the mix appends
    those felts (16 bytes each; member_index -1 = the whole (4,) array) and
    rehashes. An EMPTY mix tuple hashes digest alone (mix_felts([]) — the
    unopened-ladder columns of the sampled-values walk). At most 2 felts
    per mix (every transcript mix here is 0-2 felts => a single 64-byte
    compression block). The (M, 8) tail matrix is assembled in-executable
    from the group arrays; the digest chain runs as ONE lax.scan of the
    Blake2s compression."""
    h0 = jnp.asarray(blake2s._H0)
    tails = []
    tlos = []
    for mix in spec:
        parts = []
        for g, mi in mix:
            arr = garrs[g]
            parts.append(arr if mi < 0 else arr[:, mi])
        tail = (jnp.concatenate(parts) if parts
                else jnp.zeros(0, jnp.uint32))
        w = tail.shape[0]
        assert w <= 8, "mix exceeds one compression block"
        if w < 8:
            tail = jnp.pad(tail, (0, 8 - w))
        tails.append(tail)
        tlos.append(32 + 4 * w)
    tails_arr = jnp.stack(tails)
    tlos_arr = jnp.asarray(np.array(tlos, np.uint32))

    def body(d, x):
        tail, tlo = x
        m_t = jnp.concatenate([d, tail])
        return blake2s._compress_t(h0, m_t, tlo, jnp.uint32(0), True), None

    out, _ = jax.lax.scan(body, digest, (tails_arr, tlos_arr))
    return out


_ELEMENT_ORDER = (("memory", 3), ("instruction", 3), ("processor", 7))


@jax.jit
def _els_jit(digest: jnp.ndarray) -> Dict[str, Dict[str, jnp.ndarray]]:
    """draw_elements on device: 6 consecutive draws (counters 0-5; order
    memory z/alpha, instruction, processor — mod.rs:158-164) plus the
    per-set alpha-power ladders, in ONE executable. Output pytree matches
    LookupElements.device() exactly, so the interaction/constraint
    executables are unchanged."""
    felts = [_draw_felt(digest, c) for c in range(6)]
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i, (name, size) in enumerate(_ELEMENT_ORDER):
        z, alpha = felts[2 * i], felts[2 * i + 1]
        powers = [jnp.asarray(np.array([1, 0, 0, 0], np.uint32))]
        for _ in range(size - 1):
            powers.append(qm31.mul(powers[-1], alpha))
        out[name] = {"alpha_powers": jnp.stack(powers), "z": z}
    return out


def _powers(alpha: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, 4): alpha^0 .. alpha^(n-1) (scan; inline in an enclosing jit)."""
    def body(c, _):
        return qm31.mul(c, alpha), c

    _, out = jax.lax.scan(
        body, jnp.asarray(np.array([1, 0, 0, 0], np.uint32)), None, length=n)
    return out


@partial(jax.jit, static_argnames=("spec", "counter"))
def _comp_weights_jit(digest: jnp.ndarray, spec: tuple, counter: int):
    """Composition randomness: draw alpha_comp (at the static post-mix
    counter), build the full alpha-power ladder, and emit every component's
    weight matrix in ONE executable.

    spec: per component, ("dense", offset, n_cons) -> consecutive powers
    (n_cons, 4), or ("union", offset, layout, n_slots) -> an (n_slots, 4)
    scatter of the member's powers into its union-group slots (zero slots
    contribute nothing). Shapes match the host-side composition_contribution
    weights exactly, so the constraint executables are unchanged."""
    alpha = _draw_felt(digest, counter)
    n_total = max(off + (len(lay) if kind == "union" else n)
                  for kind, off, lay, n in _norm_spec(spec))
    pows = _powers(alpha, n_total)
    outs = []
    for kind, off, layout, n_slots in _norm_spec(spec):
        if kind == "dense":
            outs.append(jax.lax.slice(pows, (off, 0), (off + n_slots, 4)))
        else:
            rows = jax.lax.slice(pows, (off, 0), (off + len(layout), 4))
            outs.append(jnp.zeros((n_slots, 4), jnp.uint32)
                        .at[jnp.asarray(np.array(layout, np.int32))].set(rows))
    return tuple(outs)


def _norm_spec(spec: tuple) -> list:
    out = []
    for entry in spec:
        if entry[0] == "dense":
            _, off, n = entry
            out.append(("dense", off, None, n))
        else:
            _, off, layout, n_slots = entry
            out.append(("union", off, layout, n_slots))
    return out


def _shifted_point_dev(zx, zy, log_size: int, shift: int):
    """z - shift * g_{log_size} with the constant point folded in (device
    mirror of core/pcs.shifted_point)."""
    from .circle import M31_CIRCLE_LOG_ORDER, point_at_index

    if shift == 0:
        return zx, zy
    idx = (-shift * (1 << (M31_CIRCLE_LOG_ORDER - log_size))) % (
        1 << M31_CIRCLE_LOG_ORDER)
    cx, cy = point_at_index(idx)
    nx = m31.sub(qm31.mul_m31(zx, jnp.uint32(cx)),
                 qm31.mul_m31(zy, jnp.uint32(cy)))
    ny = m31.add(qm31.mul_m31(zx, jnp.uint32(cy)),
                 qm31.mul_m31(zy, jnp.uint32(cx)))
    return nx, ny


@partial(jax.jit, static_argnames=("groups",))
def _oods_jit(digest: jnp.ndarray, groups: tuple):
    """OODS randomness: draw t (counter 0 after the composition root mix),
    map to the point z, and build the tensor-product half-bases of every
    (trace log, shift) sampling group in ONE executable — device mirror of
    point_from_t + half_bases_at_point (the host versions fed an upload per
    group). Returns (zx, zy, ((b_lo, b_hi), ...)) in `groups` order."""
    one = jnp.asarray(np.array([1, 0, 0, 0], np.uint32))
    t = _draw_felt(digest, 0)
    t2 = qm31.mul(t, t)
    dinv = qm31.inv(qm31.add(one, t2))
    zx = qm31.mul(qm31.sub(one, t2), dinv)
    zy = qm31.mul(qm31.add(t, t), dinv)

    bases = []
    for log_size, shift in groups:
        px, py = _shifted_point_dev(zx, zy, log_size, shift)
        factors = [py]
        cur = px
        for _ in range(log_size - 1):
            factors.append(cur)
            cur = qm31.sub(qm31.mul(cur, qm31.add(cur, cur)), one)
        lo = log_size // 2

        def build(fs):
            b = one[:, None]
            for f in fs:
                b = jnp.concatenate([b, qm31.mul(f[:, None], b)], axis=1)
            return b

        bases.append((build(factors[:lo]), build(factors[lo:])))
    return zx, zy, tuple(bases)


@partial(jax.jit, static_argnames=("spec",))
def _quot_consts_jit(digest: jnp.ndarray, zx, zy, garrs: tuple, spec: tuple):
    """Post-OODS randomness + quotient constants in ONE executable: draw
    alpha_q (counter 0) and the FRI circle-fold beta0 (counter 1), build the
    global alpha-power ladder, and compute every commitment size's point-
    group constants and weights — the device mirror of
    quotients._group_constants over the claims_by_size walk.

    spec: per size, (log_size, ((shift, group_index, alpha_idx_tuple), ...))
    where group_index names the sampled-values array in garrs holding that
    point group's claimed values (4, C) in claim order. Outputs per size:
    consts (n_groups, 5, 4) = [A, B, dy, dx, vc] and weights (n_w, 4) —
    exactly the traced operands of quotients._accumulate_all_jit."""
    alpha_q = _draw_felt(digest, 0)
    beta0 = _draw_felt(digest, 1)
    n_total = max(ai for _lg, gs in spec for _s, _g, idxs in gs
                  for ai in idxs) + 1
    pows = _powers(alpha_q, n_total)

    outs = []
    for log_size, gs in spec:
        consts = []
        weights = []
        for shift, gi, idxs in gs:
            px_, py_ = _shifted_point_dev(zx, zy, log_size, shift)
            pbx, pby = qm31.frobenius(px_), qm31.frobenius(py_)
            dy = qm31.sub(pby, py_)
            dx = qm31.sub(pbx, px_)
            vals = garrs[gi]                       # (4, C)
            vb = qm31.frobenius(vals)
            s_arr = qm31.mul(qm31.sub(vb, vals), qm31.inv(dy)[:, None])
            l0 = qm31.sub(vals, qm31.mul(py_[:, None], s_arr))
            aw = jnp.take(pows, jnp.asarray(np.array(idxs, np.int32)),
                          axis=0)                  # (C, 4)
            aw_t = aw.T
            a_const = sum_mod(qm31.mul(aw_t, l0), axis=1)
            b_const = sum_mod(qm31.mul(aw_t, s_arr), axis=1)
            vc = qm31.sub(qm31.mul(py_, dx), qm31.mul(px_, dy))
            consts.append(jnp.stack([a_const, b_const, dy, dx, vc]))
            weights.append(aw)
        outs.append((jnp.stack(consts), jnp.concatenate(weights)))
    return alpha_q, beta0, tuple(outs)


class DeviceChannel:
    """Drop-in transcript frontend for the single-chip prove: mirrors the
    Blake2sChannel call sites but keeps the digest on device. The draw
    counter is tracked in Python (the call sequence is static per claim).

    Use `digest` for device ops; after the final batched pull, hand the
    32-byte digest back to the host channel for PoW + query drawing."""

    def __init__(self, digest_bytes: bytes):
        self.digest = jnp.asarray(np.frombuffer(digest_bytes, dtype="<u4"))
        self.counter = 0

    def mix_root(self, root: jnp.ndarray) -> None:
        self.digest = _mix_root_jit(self.digest, root)
        self.counter = 0

    def draw_felt(self) -> jnp.ndarray:
        (f,) = _draw_felts_jit(self.digest, (self.counter,))
        self.counter += 1
        return f

    def draw_elements(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        assert self.counter == 0
        els = _els_jit(self.digest)
        self.counter = 6
        return els

    def mix_felt_arrays(self, arrays: List[jnp.ndarray]) -> None:
        """One mix per (4,) array, in order (mix_interaction_claim)."""
        spec = tuple(((i, -1),) for i in range(len(arrays)))
        self.digest = _mix_chain_jit(self.digest, tuple(arrays), spec)
        self.counter = 0

    def mix_chain(self, garrs: tuple, spec: tuple) -> None:
        self.digest = _mix_chain_jit(self.digest, garrs, spec)
        self.counter = 0
