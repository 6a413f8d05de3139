"""FRI over the circle: commit/fold on device, per-query verification on host.

TPU-native equivalent of stwo's FRI (internal to ``prover::prove``; entry at
crates/brainfuck_prover/src/brainfuck_air/mod.rs:732). Mixed-degree inputs
are supported the same way: the combined quotient of each commitment size is
"injected" (circle->line folded and added) when the running accumulator
reaches its size.

Folds (bit-reversed storage => pairs are adjacent positions 2t, 2t+1):
- circle->line (y-twiddle):  g = (a+b)/2 + beta * (a-b)/(2 y_t)
- line->line  (x-twiddles):  g = (a+b)/2 + beta * (a-b)/(2 x_t)

The same beta (circle_fold_alpha) is used for every circle->line injection;
each committed intermediate line layer draws a fresh beta from the channel
after its Merkle root is mixed. The last layer (line domain of size
2^LOG_LAST_LAYER) is sent in the clear as a single constant coefficient.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import m31, merkle, qm31
from .fft import get_twiddles
from .m31 import P_INT

LOG_LAST_LAYER = 1  # stop at a 2-point line domain; send 1 (constant) coeff

_INV2 = (P_INT + 1) // 2


@lru_cache(maxsize=32)
def _circle_fold_itw(log_size: int) -> np.ndarray:
    """inv(2*y_t) for the circle domain of size 2^log_size (host)."""
    y = np.asarray(get_twiddles(log_size).fwd[0])
    return m31.np_inv((2 * y.astype(np.uint64)) % P_INT)


@lru_cache(maxsize=32)
def _line_fold_itw(line_log_size: int) -> np.ndarray:
    """inv(2*x_t) for the line domain of size 2^line_log_size (x-projection
    of the circle domain of size 2^(line_log_size+1))."""
    x = np.asarray(get_twiddles(line_log_size + 1).fwd[1])
    return m31.np_inv((2 * x.astype(np.uint64)) % P_INT)


_DEV_ITW: dict = {}


def _dev_itw(kind: str, log: int) -> jnp.ndarray:
    """Device copies of the fold twiddle arrays — uploading the host array on
    every fold costs an 8 MB relay transfer per layer at the big sizes."""
    key = (kind, log)
    if key not in _DEV_ITW:
        host = _circle_fold_itw(log) if kind == "c" else _line_fold_itw(log)
        _DEV_ITW[key] = jnp.asarray(host)
    return _DEV_ITW[key]


@jax.jit
def _fold_jit(values: jnp.ndarray, itw: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """One fold of a QM31 evaluation (4, 2N) -> (4, N)."""
    a = values[:, 0::2]
    b = values[:, 1::2]
    s = qm31.mul_m31(m31.add(a, b), jnp.uint32(_INV2))
    d = qm31.mul_m31(m31.sub(a, b), itw)
    return qm31.add(s, qm31.mul(beta.reshape(4, 1), d))


@jax.jit
def _fold2_jit(values, itw1, itw2, beta, beta2) -> jnp.ndarray:
    """Two line folds (beta then beta^2) in ONE executable — the radix-4
    layer body when no injection lands between the folds (each eager
    dispatch is a TPU-relay round trip)."""
    return _fold_jit(_fold_jit(values, itw1, beta), itw2, beta2)


@jax.jit
def _fold_add_jit(values, itw, beta, cur) -> jnp.ndarray:
    """Circle-fold an injected input and add it to the running accumulator
    in ONE executable (the eager qm31.add costs 4 extra tiny executables
    per injection on the cold path)."""
    return qm31.add(cur, _fold_jit(values, itw, beta))


def _fold(values, itw, beta: tuple):
    return _fold_jit(values, jnp.asarray(itw), jnp.asarray(np.array(beta, np.uint32)))


@dataclass
class FriProof:
    layer_roots: List[bytes]
    last_layer_value: tuple
    # filled during decommit:
    layer_decommitments: List[merkle.MerkleDecommitment] = field(default_factory=list)
    layer_values: List[Dict[int, tuple]] = field(default_factory=list)

    def to_json(self):
        return {
            "layer_roots": [r.hex() for r in self.layer_roots],
            "last_layer_value": list(self.last_layer_value),
            "layer_decommitments": [d.to_json() for d in self.layer_decommitments],
            "layer_values": [
                {str(k): list(v) for k, v in lv.items()} for lv in self.layer_values
            ],
        }

    @staticmethod
    def from_json(obj) -> "FriProof":
        return FriProof(
            layer_roots=[bytes.fromhex(r) for r in obj["layer_roots"]],
            last_layer_value=tuple(obj["last_layer_value"]),
            layer_decommitments=[
                merkle.MerkleDecommitment.from_json(d) for d in obj["layer_decommitments"]
            ],
            layer_values=[
                {int(k): tuple(v) for k, v in lv.items()} for lv in obj["layer_values"]
            ],
        )


@dataclass
class FriProver:
    """Holds the committed layers so queries can be decommitted later."""

    proof: FriProof
    layers: List[merkle.MerkleTree]          # committed line layers
    layer_evals: List[jnp.ndarray]           # (4, N) device evaluations
    layer_levels: List[int]                  # line level of each layer
    circle_fold_alpha: tuple
    max_log: int


@jax.jit
def _mix_draw2_jit(digest: jnp.ndarray, root: jnp.ndarray):
    """Device Fiat-Shamir step: digest' = blake2s(digest || root); beta =
    first 4 words of blake2s(digest' || counter0_le8) reduced mod p;
    beta2 = beta^2. Bit-identical to Blake2sChannel.mix_root + draw_felt
    (core/channel.py:37-70) — keeps the FRI root->beta transcript chain on
    device so the layer loop enqueues with ZERO sync round trips."""
    from . import blake2s, qm31
    from .m31 import reduce_once

    d2 = blake2s.hash_words(jnp.concatenate([digest, root])[None, :],
                            n_bytes=64)[0]
    blk = blake2s.hash_words(
        jnp.concatenate([d2, jnp.zeros(2, jnp.uint32)])[None, :],
        n_bytes=40)[0]
    beta = reduce_once(blk[:4])
    return d2, beta, qm31.mul(beta, beta)


def fri_commit(inputs: Dict[int, jnp.ndarray], channel, ops=None) -> FriProver:
    """inputs: circle-domain size log -> combined quotient (4, 2^log).
    Performs all folds, committing each intermediate line layer and mixing
    roots/last value into the channel.

    Single-chip path: the per-layer root -> mix -> draw -> fold chain runs
    with a DEVICE-resident channel digest (_mix_draw2_jit) and deferred root
    pulls, so the whole commit phase is async dispatches plus one batched
    pull at the end (the host loop paid a ~25 ms relay sync per layer).

    ops: optional multi-device backend (parallel.prove.ShardedOps); folds and
    layer commits then run sharded over the mesh with identical results."""
    logs = sorted(inputs, reverse=True)
    assert logs, "no FRI inputs"
    max_log = logs[0]

    if ops is None:
        return _fri_commit_device(inputs, channel, max_log)

    def fold_c(values, beta, log_size):
        return ops.fold(values, _dev_itw("c", log_size), beta)

    def fold_l(values, beta, line_log):
        return ops.fold(values, _dev_itw("l", line_log), beta)

    def commit_layer(values):
        log = values.shape[1].bit_length() - 1
        return ops.commit({log: values})

    beta0 = channel.draw_felt()  # circle fold coefficient for all injections

    cur = fold_c(inputs[max_log], beta0, max_log)  # line size 2^(max-1)
    m = max_log - 1
    layers: List[merkle.MerkleTree] = []
    layer_evals: List[jnp.ndarray] = []
    layer_levels: List[int] = []
    roots: List[bytes] = []

    def inject(cur, m):
        if m + 1 in inputs and m + 1 != max_log:
            return ops.fold_add(inputs[m + 1], _dev_itw("c", m + 1),
                                beta0, cur)
        return cur

    # Radix-4: each committed layer folds TWICE (beta, then beta^2) — halves
    # the sequential root->beta transcript chain and the layer count. When no
    # injection lands between the two folds (most layers), both run in ONE
    # fused executable.
    while m > LOG_LAST_LAYER:
        cur = inject(cur, m)
        tree = commit_layer(cur)
        layers.append(tree)
        layer_evals.append(cur)
        layer_levels.append(m)
        roots.append(tree.root)
        channel.mix_root(tree.root)
        beta = channel.draw_felt()
        if m - 1 > LOG_LAST_LAYER and m not in inputs:
            beta2 = qm31.h_mul(beta, beta)
            cur = ops.fold2(cur, _dev_itw("l", m), _dev_itw("l", m - 1),
                            beta, beta2)
            m -= 2
            continue
        cur = fold_l(cur, beta, m)
        m -= 1
        if m > LOG_LAST_LAYER:
            cur = inject(cur, m)
            cur = fold_l(cur, qm31.h_mul(beta, beta), m)
            m -= 1

    cur = inject(cur, m)

    # last layer: 2-point line evaluation of a constant polynomial
    arr = np.asarray(cur)
    v0 = tuple(int(x) for x in arr[:, 0])
    last = v0
    channel.mix_felts([last])

    proof = FriProof(layer_roots=roots, last_layer_value=last)
    return FriProver(
        proof=proof, layers=layers, layer_evals=layer_evals,
        layer_levels=layer_levels,
        circle_fold_alpha=beta0, max_log=max_log,
    )


def fri_commit_async(inputs: Dict[int, jnp.ndarray], beta0_dev: jnp.ndarray,
                     digest: jnp.ndarray, sync_log: int | None = None):
    """Device-channel fri_commit: the whole commit phase (folds, layer
    commits, root->beta transcript chain, the last-layer mix) is async
    dispatches against a DEVICE digest; NOTHING is pulled here. Returns
    (prover, root_futures, last_eval, digest') — the caller batches the
    pull with the rest of the prove's outputs (air.py sync A) and fills
    prover.proof via fri_commit_finish. Transcript bytes are identical to
    the host loop (pinned by tests)."""
    from .devchan import _mix_chain_jit

    logs = sorted(inputs, reverse=True)
    assert logs, "no FRI inputs"
    max_log = logs[0]

    cur = _fold_jit(inputs[max_log], _dev_itw("c", max_log), beta0_dev)
    m = max_log - 1
    layers: List[merkle.MerkleTree] = []
    layer_evals: List[jnp.ndarray] = []
    layer_levels: List[int] = []

    def inject(cur, m):
        if m + 1 in inputs and m + 1 != max_log:
            return _fold_add_jit(inputs[m + 1], _dev_itw("c", m + 1),
                                 beta0_dev, cur)
        return cur

    while m > LOG_LAST_LAYER:
        cur = inject(cur, m)
        tree = merkle.commit({m: cur}, pull_root=False)
        layers.append(tree)
        layer_evals.append(cur)
        layer_levels.append(m)
        digest, beta, beta2 = _mix_draw2_jit(digest, tree.layers[0][0])
        if sync_log is not None and m >= sync_log:
            # near-capacity queue drain (air.py BIG_SYNC_LOG): the first
            # layers' folds/commits read multi-GB inputs; without a sync the
            # relay pins them all in HBM at once
            jax.block_until_ready(digest)
        if m - 1 > LOG_LAST_LAYER and m not in inputs:
            cur = _fold2_jit(cur, _dev_itw("l", m), _dev_itw("l", m - 1),
                             beta, beta2)
            m -= 2
            continue
        cur = _fold_jit(cur, _dev_itw("l", m), beta)
        m -= 1
        if m > LOG_LAST_LAYER:
            cur = inject(cur, m)
            cur = _fold_jit(cur, _dev_itw("l", m), beta2)
            m -= 1

    cur = inject(cur, m)
    # last-layer value mix (mix_felts([last])) on device: cur[:, 0]
    digest = _mix_chain_jit(digest, (cur,), (((0, 0),),))

    proof = FriProof(layer_roots=[], last_layer_value=None)
    prover = FriProver(
        proof=proof, layers=layers, layer_evals=layer_evals,
        layer_levels=layer_levels,
        circle_fold_alpha=beta0_dev, max_log=max_log,
    )
    return prover, [t.layers[0] for t in layers], cur, digest


def fri_commit_finish(prover: FriProver, root_rows, last_eval_host) -> None:
    """Fill the proof from the batched pull: root_rows are the pulled (1, 8)
    root layers in order, last_eval_host the pulled (4, 2) last evaluation."""
    from . import blake2s

    for t, rw in zip(prover.layers, root_rows):
        t.root = blake2s.digest_to_bytes(np.asarray(rw).reshape(8))
        prover.proof.layer_roots.append(t.root)
    prover.proof.last_layer_value = tuple(
        int(x) for x in np.asarray(last_eval_host)[:, 0])


def _fri_commit_device(inputs: Dict[int, jnp.ndarray], channel,
                       max_log: int) -> FriProver:
    """Single-chip fri_commit with the Fiat-Shamir chain on device: every
    layer's commit, mix, draw and fold is an async dispatch; the layer roots,
    last value and final digest come back in ONE batched pull. Transcript
    bytes are identical to the host loop (pinned by tests)."""
    from . import blake2s
    from ..utils.transfer import pull_all

    beta0 = channel.draw_felt()  # circle fold coefficient for all injections
    beta0_dev = jnp.asarray(np.array(beta0, np.uint32))
    digest = jnp.asarray(np.frombuffer(channel.digest, dtype="<u4"))

    cur = _fold_jit(inputs[max_log], _dev_itw("c", max_log), beta0_dev)
    m = max_log - 1
    layers: List[merkle.MerkleTree] = []
    layer_evals: List[jnp.ndarray] = []
    layer_levels: List[int] = []

    def inject(cur, m):
        if m + 1 in inputs and m + 1 != max_log:
            return _fold_add_jit(inputs[m + 1], _dev_itw("c", m + 1),
                                 beta0_dev, cur)
        return cur

    while m > LOG_LAST_LAYER:
        cur = inject(cur, m)
        tree = merkle.commit({m: cur}, pull_root=False)
        layers.append(tree)
        layer_evals.append(cur)
        layer_levels.append(m)
        digest, beta, beta2 = _mix_draw2_jit(digest, tree.layers[0][0])
        if m - 1 > LOG_LAST_LAYER and m not in inputs:
            cur = _fold2_jit(cur, _dev_itw("l", m), _dev_itw("l", m - 1),
                             beta, beta2)
            m -= 2
            continue
        cur = _fold_jit(cur, _dev_itw("l", m), beta)
        m -= 1
        if m > LOG_LAST_LAYER:
            cur = inject(cur, m)
            cur = _fold_jit(cur, _dev_itw("l", m), beta2)
            m -= 1

    cur = inject(cur, m)

    # ONE pull: every layer root + the last-layer value + the final digest
    pulled = pull_all([t.layers[0][0] for t in layers] + [cur, digest])
    roots: List[bytes] = []
    for t, rw in zip(layers, pulled):
        t.root = blake2s.digest_to_bytes(rw)
        roots.append(t.root)
    # The pulled digest is the post-mix state after the last layer root; the
    # mix_felts below resets the draw counter, so no counter fixup is needed
    # (transcript equality with the host loop is pinned by tests/test_fri.py).
    channel.digest = blake2s.digest_to_bytes(pulled[-1])
    arr = pulled[len(layers)]
    last = tuple(int(x) for x in arr[:, 0])
    channel.mix_felts([last])

    proof = FriProof(layer_roots=roots, last_layer_value=last)
    return FriProver(
        proof=proof, layers=layers, layer_evals=layer_evals,
        layer_levels=layer_levels,
        circle_fold_alpha=beta0, max_log=max_log,
    )


@jax.jit
def _gather_vals_jit(mats: tuple, idxs: tuple):
    """All FRI layers' query-value gathers in ONE executable (eager per-layer
    jnp.take costs a compile + relay round trip each on the cold path)."""
    return tuple(jnp.take(m, i, axis=1) for m, i in zip(mats, idxs))


def fri_decommit_async(prover: FriProver, queries: Sequence[int]):
    """Issue every layer's decommitment + value gathers without pulling.
    Returns (positions_list, pendings, val_futs); the caller batches the
    pull (with the 4 main trees' decommitments — air.py sync B) and calls
    fri_decommit_finish."""
    pendings = []
    positions_list = []
    val_mats = []
    val_idxs = []
    n_q = len(queries)
    for tree, evals, m in zip(prover.layers, prover.layer_evals, prover.layer_levels):
        positions = sorted({((q >> (prover.max_log - m)) & ~3) + j
                            for q in queries for j in range(4)})
        # witness hashes only: the layer values travel once, in
        # proof.layer_values (Merkle-checked by fri_verify_queries); a copy
        # inside the decommitment would be ignored bytes (~30 KB/proof)
        pendings.append(merkle.decommit_async(tree, positions, n_queries=n_q,
                                              include_values=False))
        # gather shape pinned by n_q (positions <= 4*n_q), not the draw
        bound = min(1 << m, 1 << max(0, 4 * n_q - 1).bit_length())
        idx, _n = merkle._padded_idx(positions, bound)
        val_mats.append(evals)
        val_idxs.append(idx)
        positions_list.append(positions)
    # every layer's value gather in one executable
    val_futs = list(_gather_vals_jit(tuple(val_mats), tuple(val_idxs)))
    return positions_list, pendings, val_futs


def fri_decommit_finish(prover: FriProver, positions_list, decs,
                        vals_host) -> None:
    """Fill proof.layer_decommitments / layer_values from the pulled
    decommitments and value gathers."""
    for positions, dec, gathered in zip(positions_list, decs, vals_host):
        prover.proof.layer_decommitments.append(dec)
        prover.proof.layer_values.append(
            {p: tuple(int(x) for x in gathered[:, i]) for i, p in enumerate(positions)}
        )


def fri_decommit(prover: FriProver, queries: Sequence[int]) -> None:
    """Decommit each layer at the query fold positions (pairs), filling
    proof.layer_decommitments / layer_values. queries are positions in the
    max circle domain."""
    from ..utils.transfer import pull_all

    positions_list, pendings, val_futs = fri_decommit_async(prover, queries)
    decs = merkle.finalize_many(pendings)
    vals_host = pull_all(val_futs)
    fri_decommit_finish(prover, positions_list, decs, vals_host)


class FriVerificationError(Exception):
    pass


def fri_verify_queries(
    proof: FriProof,
    channel_betas: Tuple[tuple, List[tuple]],
    max_log: int,
    queries: Sequence[int],
    input_values_fn,
) -> None:
    """Walk the folds for each query and check consistency.

    channel_betas: (beta0, [per-layer betas]) re-drawn by the caller in
    transcript order. input_values_fn(log, position) -> QM31 value of the
    combined quotient of circle-size `log` at `position` (computed by the
    caller from decommitted trace values).
    """
    beta0, betas = channel_betas

    # reconstruct the committed layer levels (mirror of fri_commit)
    levels: List[int] = []
    m = max_log - 1
    while m > LOG_LAST_LAYER:
        levels.append(m)
        m -= 1
        if m > LOG_LAST_LAYER:
            m -= 1
    if len(levels) != len(proof.layer_roots):
        raise FriVerificationError("bad layer count")

    # verify layer merkle decommitments and collect values
    layer_vals: List[Dict[int, tuple]] = []
    for li, (root, dec, lvl) in enumerate(
        zip(proof.layer_roots, proof.layer_decommitments, levels)
    ):
        positions = sorted({((q >> (max_log - lvl)) & ~3) + j
                            for q in queries for j in range(4)})
        if dec.column_values:
            # values must travel exactly once (layer_values); a second,
            # unchecked copy would be proof malleability
            raise FriVerificationError(f"layer {li}: unexpected column values")
        vals = proof.layer_values[li]
        if sorted(vals) != positions:
            raise FriVerificationError(f"layer {li}: bad positions")
        cols = [[vals[p][k] for p in positions] for k in range(4)]
        dec_check = merkle.MerkleDecommitment(
            column_values={lvl: cols}, witness_hashes=dec.witness_hashes
        )
        try:
            merkle.verify(root, {lvl: 4}, positions, dec_check, max_log=lvl)
        except merkle.MerkleVerificationError as exc:
            raise FriVerificationError(f"layer {li} merkle: {exc}")
        layer_vals.append(vals)

    # Batched walk: every query's fold chain follows the SAME layer sequence
    # (the per-query control flow depends only on max_log), so the whole walk
    # runs as (4, n_queries) numpy QM31 arrays — the per-query scalar-tuple
    # loop was the largest remaining verify cost (~20 ms on a deep proof).
    # Inputs are reduced mod p up front (the scalar ops reduced at every
    # step, which is equivalent for mod-p arithmetic).
    qs = np.asarray(list(queries), np.int64)
    nq = len(qs)
    if nq == 0:
        return
    beta0_b = qm31.npq_const(tuple(v % P_INT for v in beta0), nq)

    # Proof-supplied values must be CANONICAL (< p): the scalar walk compared
    # them unreduced against always-reduced folds, so a non-canonical alias
    # (v + p) failed the fold-mismatch check — reducing on load would
    # silently accept it (proof malleability). Validate instead of reduce.
    layer_pos: List[np.ndarray] = []
    layer_arr: List[np.ndarray] = []
    for li, vals in enumerate(layer_vals):
        ps = np.array(sorted(vals), np.int64)
        if any(not (0 <= v < P_INT) for p in vals for v in vals[p]):
            raise FriVerificationError(f"layer {li}: non-canonical value")
        layer_pos.append(ps)
        layer_arr.append(np.array(
            [[vals[int(p)][k] for p in ps] for k in range(4)], np.uint64))
    if any(not (0 <= v < P_INT) for v in proof.last_layer_value):
        raise FriVerificationError("non-canonical last layer value")

    def batch_input(m, pos_arr):
        """(4, nq) combined-quotient values of circle-size m, or None."""
        if input_values_fn(m, int(pos_arr[0])) is None:
            return None
        return np.array(
            [[input_values_fn(m, int(p))[k] % P_INT for p in pos_arr]
             for k in range(4)], np.uint64)

    def circ_itw(m, t_arr):
        return np.array([_circle_itw_host(m, int(t)) for t in t_arr],
                        np.uint64)

    def line_itw(m, t_arr):
        return np.array([_line_itw_host(m, int(t)) for t in t_arr],
                        np.uint64)

    def np_fold(a, b, beta, itw_arr):
        s = ((a + b) % P_INT) * _INV2 % P_INT
        d = ((a + (P_INT - b)) % P_INT) * itw_arr % P_INT
        return qm31.npq_add(s, qm31.npq_mul(beta, d))

    def inject(m, pos_arr, cur):
        """Add the circle-size m+1 injections at line positions, if any."""
        if m + 1 == max_log:
            return cur
        a = batch_input(m + 1, 2 * pos_arr)
        if a is None:
            return cur
        b = batch_input(m + 1, 2 * pos_arr + 1)
        return qm31.npq_add(cur, np_fold(a, b, beta0_b,
                                         circ_itw(m + 1, pos_arr)))

    pos = qs & ~np.int64(1)
    a = batch_input(max_log, pos)
    b = batch_input(max_log, pos | 1)
    cur = np_fold(a, b, beta0_b, circ_itw(max_log, pos >> 1))
    m = max_log - 1
    pos = pos >> 1
    li = 0
    while m > LOG_LAST_LAYER:
        cur = inject(m, pos, cur)
        ps, va = layer_pos[li], layer_arr[li]
        idx = np.searchsorted(ps, pos)
        if np.any(idx >= len(ps)) or np.any(ps[np.minimum(idx, len(ps) - 1)]
                                            != pos):
            raise FriVerificationError(f"layer {li}: missing fold position")
        mism = (va[:, idx] != cur).any(axis=0)
        if mism.any():
            bad = int(pos[int(np.nonzero(mism)[0][0])])
            raise FriVerificationError(f"fold mismatch at layer {li} pos {bad}")
        beta = qm31.npq_const(tuple(v % P_INT for v in betas[li]), nq)
        quad = pos & ~np.int64(3)
        iq = np.searchsorted(ps, quad)
        if np.any(iq + 3 >= len(ps)) or np.any(ps[iq] != quad) \
                or np.any(ps[iq + 3] != quad + 3):
            raise FriVerificationError(f"layer {li}: missing quad values")
        a0, a1, a2, a3 = va[:, iq], va[:, iq + 1], va[:, iq + 2], va[:, iq + 3]
        t0 = quad >> 1
        u0 = np_fold(a0, a1, beta, line_itw(m, t0))
        u1 = np_fold(a2, a3, beta, line_itw(m, t0 + 1))
        p1 = pos >> 1
        if m - 1 == LOG_LAST_LAYER:
            # single-fold tail
            cur = np.where(((p1 & 1) == 0)[None, :], u0, u1)
            pos = p1
            m -= 1
            li += 1
            continue
        # mid injection at level m-1 on both half values
        u0 = inject(m - 1, t0, u0)
        u1 = inject(m - 1, t0 + 1, u1)
        beta2 = qm31.npq_mul(beta, beta)
        cur = np_fold(u0, u1, beta2, line_itw(m - 1, t0 >> 1))
        pos = pos >> 2
        m -= 2
        li += 1
    cur = inject(m, pos, cur)
    llv = np.array(list(proof.last_layer_value), np.uint64)[:, None]
    mism = (cur != llv).any(axis=0)
    if mism.any():
        bad = int(qs[int(np.nonzero(mism)[0][0])])
        raise FriVerificationError(f"last layer mismatch at query {bad}")


@lru_cache(maxsize=1 << 14)
def _circle_itw_host(log_size: int, t: int) -> int:
    """inv(2*y_t) for ONE fold pair (verifier): y_t = fwd[0][t] is the y of
    the half-coset point at bit-reversed block t — computed point-wise, so a
    fresh verify-only process never builds the full twiddle stacks (~8 s for
    the big sizes)."""
    from .circle import half_odds
    from .fft import bitrev_int

    y = half_odds(log_size - 1).at(bitrev_int(t, log_size - 1))[1]
    return pow(2 * y % P_INT, P_INT - 2, P_INT)


@lru_cache(maxsize=1 << 14)
def _line_itw_host(line_log: int, t: int) -> int:
    """inv(2*x_t) for ONE line-fold pair (verifier): x_t = fwd[1][t] of the
    size-2^(line_log+1) twiddles = x of the half-coset point at bit-reversed
    block t."""
    from .circle import half_odds
    from .fft import bitrev_int

    x = half_odds(line_log).at(bitrev_int(t, line_log - 1))[0]
    return pow(2 * x % P_INT, P_INT - 2, P_INT)
