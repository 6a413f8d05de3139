"""Proof orchestration: prove_brainfuck / verify_brainfuck.

TPU-native equivalent of the reference's brainfuck_air layer
(crates/brainfuck_prover/src/brainfuck_air/mod.rs:466-797): the 4-phase
pipeline (preprocessed / main / interaction commitments, then composition,
OODS sampling, quotients, FRI, PoW, query decommitment) and its mirror
verifier. Claims and commit order follow the reference
(BrainfuckClaim field order, mod.rs:86-143; commit order :550-562).

Self-consistent protocol deviations from stwo are documented in the
respective core modules; the verifier performs the full set of cryptographic
checks: transcript replay, LogUp sum, OODS composition identity, Merkle
decommitments, FRI folds, and proof of work.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import logging

import numpy as np
import jax.numpy as jnp

from .components import tables as tables_mod
from .components.defs import COMPONENT_CLASSES, ELEMENT_SIZES
from .components.tables import MIN_LOG_SIZE
from .core import fft, fri, m31, merkle, poly, qm31, quotients
from .core.channel import Blake2sChannel
from .core.circle import point_from_t
from .core.fft import rotation_permutation
from .core.m31 import P_INT
from .core.pcs import (
    PcsConfig,
    TreeProver,
    query_positions_by_level,
    shifted_point,
)
from .core.rowref import RowRef
from .framework.component import (
    LookupElements,
    build_interaction_trace,
    composition_contribution,
    evaluate_constraints_at_point,
)
from functools import lru_cache, partial

import jax


@lru_cache(maxsize=64)
def _vanishing_inv(log_size: int, eval_log: int) -> np.ndarray:
    return m31.np_inv(poly.vanishing_on_domain(log_size, eval_log))


# Device copies, cached: re-uploading the (2^22,) vanishing inverse and
# rotation permutation for every component of every prove costs ~60 MB of
# relay transfer per proof. Sizes are bounded by the ladder (<= ~25 entries).
_DEV_VINV: Dict[tuple, jnp.ndarray] = {}
_DEV_ROT: Dict[tuple, jnp.ndarray] = {}


def _dev_vanishing_inv(log_size: int, eval_log: int) -> jnp.ndarray:
    key = (log_size, eval_log)
    if key not in _DEV_VINV:
        _DEV_VINV[key] = jnp.asarray(_vanishing_inv(log_size, eval_log))
    return _DEV_VINV[key]


def _dev_rotation(log_size: int, blow: int, steps: int) -> jnp.ndarray:
    key = (log_size, blow, steps)
    if key not in _DEV_ROT:
        _DEV_ROT[key] = jnp.asarray(rotation_permutation(log_size, blow, steps))
    return _DEV_ROT[key]


def _preproot_cache_path():
    import os

    from . import _cache_dir

    return os.path.join(_cache_dir, "preprocessed_roots.json")


def _root_cache_secret():
    """Per-install MAC key for the preprocessed-root disk cache, created
    0600 on first use. Returns None when the key cannot be read or created
    (the cache is then disabled and every process recomputes the root)."""
    import os

    from . import _cache_dir

    path = os.path.join(_cache_dir, "preprocessed_roots.key")
    try:
        with open(path, "rb") as f:
            key = f.read()
        if len(key) == 32:
            return key
    except OSError:
        pass
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        key = os.urandom(32)
        tmp = f"{path}.{os.getpid()}.tmp"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
        with os.fdopen(fd, "wb") as f:
            f.write(key)
        os.replace(tmp, path)
        return key
    except OSError:
        return None


def _roots_mac(secret: bytes, roots: dict) -> str:
    import hashlib
    import hmac
    import json

    blob = json.dumps(roots, sort_keys=True, separators=(",", ":")).encode()
    return hmac.new(secret, blob, hashlib.sha256).hexdigest()


@lru_cache(maxsize=8)
def _preprocessed_root(ladder: tuple, log_blowup: int) -> bytes:
    """Root of the is_first ladder commitment, cached on DISK across
    processes: the verifier only needs the 32-byte root (witness hashes come
    from the proof), so a fresh verify-only process must not pay the full
    ladder recommit (~2 s of device work) that `_preprocessed_tree` costs.

    SECURITY: this root is the verifier's EXPECTED value for the proof's
    preprocessed commitment (a forged is_first column voids every boundary
    constraint), so cache entries are integrity-protected: the file carries
    an HMAC-SHA256 over the entry map, keyed by a per-install 0600 secret.
    Any tamper — a rewritten root under the proof's exact key, a legacy
    plain-dict file, a non-dict JSON — fails the MAC check and the root is
    RECOMPUTED (fail closed; tests/test_security.py pins this). The residual
    trust boundary is the local user account: an attacker with write access
    to ~/.cache can also read the MAC key — the same boundary as the XLA
    persistent compilation cache (docs/SECURITY.md)."""
    import hmac
    import json
    import os

    key = f"{log_blowup}:" + ",".join(str(lg) for lg in ladder)
    path = _preproot_cache_path()
    secret = _root_cache_secret()
    roots: dict = {}
    if secret is not None:
        try:
            with open(path) as f:
                obj = json.load(f)
            if (isinstance(obj, dict)
                    and isinstance(obj.get("roots"), dict)
                    and isinstance(obj.get("mac"), str)
                    and all(isinstance(k, str) and isinstance(v, str)
                            for k, v in obj["roots"].items())
                    and hmac.compare_digest(
                        obj["mac"], _roots_mac(secret, obj["roots"]))):
                roots = obj["roots"]
        except (OSError, ValueError):
            pass
        if key in roots:
            try:
                return bytes.fromhex(roots[key])
            except ValueError:
                pass
    root = _preprocessed_tree(ladder, log_blowup).root
    roots[key] = root.hex()
    if secret is not None:
        try:
            tmp = f"{path}.{os.getpid()}.tmp"
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
            with os.fdopen(fd, "w") as f:
                json.dump({"roots": roots,
                           "mac": _roots_mac(secret, roots)}, f)
            os.replace(tmp, path)
        except OSError:
            pass
    return root


@lru_cache(maxsize=8)
def _preprocessed_tree(ladder: tuple, log_blowup: int) -> TreeProver:
    """The is_first ladder commitment is a pure function of (ladder, blowup)
    — cache it across proofs and reuse it in the verifier root check.

    Built from the CLOSED FORM of the Lagrange kernel at the first domain
    point (fft.is_first_coeffs/is_first_extended — a Kronecker coefficient
    vector and a product of n elementwise factors), bit-identical to the
    CFFT of the indicator column but without one full CFFT per ladder size
    (~2x the ladder sizes in executables on the cold path)."""
    from .core.pcs import ColumnRecord

    cfg = PcsConfig(log_blowup=log_blowup)
    records = [
        ColumnRecord(lg, fft.is_first_coeffs(lg),
                     fft.is_first_extended(lg, lg + log_blowup))
        for lg in ladder
    ]
    return TreeProver.from_records(records, cfg)

def release_device_caches(min_log: int = 18) -> None:
    """Drop device-resident PROCESS caches at or above 2^min_log: Pallas FFT
    twiddle tables (the n=22-24 set alone is ~1.5 GiB), staged-XLA twiddle
    stacks, quotient domain points, FRI fold twiddles, rotation/vanishing
    arrays, coset permutations, and the cached preprocessed-ladder tree
    (merkle layers + extended columns of the big ladder).

    Why: the TPU chip is time-shared and its free HBM fluctuates with
    co-tenants. A near-capacity prove (big22) that finishes OR dies with
    RESOURCE_EXHAUSTED leaves these caches pinned for the process lifetime;
    measured 2026-08-20, a big22 OOM under co-tenant pressure then cascaded
    RESOURCE_EXHAUSTED through every SMALL program in the same bench process
    (each needs only ~100 MB). bench.py calls this after the big22 attempt
    (either outcome) and after any OOM-failed program. Cost when the big
    sizes are needed again: re-upload/rebuild from cached executables."""
    from .core import fft as _fft_mod, fri as _fri_mod
    from .core import quotients as _q_mod
    from .framework import component as _fw
    from .ops import fft_pallas as _fp

    def drop(d, pred):
        for k in [k for k in d if pred(k)]:
            del d[k]

    drop(_fp._DEV_TABLES, lambda k: k[0] >= min_log)
    drop(_fft_mod._DEV_TW_CACHE, lambda k: k >= min_log)
    drop(_q_mod._DEV_POINTS, lambda k: k >= min_log)
    drop(_fri_mod._DEV_ITW, lambda k: k[1] >= min_log)
    drop(_fw._DEV_PERM_CACHE, lambda k: k >= min_log)
    drop(_DEV_VINV, lambda k: k[1] >= min_log)
    drop(_DEV_ROT, lambda k: k[0] + k[1] >= min_log)
    _preprocessed_tree.cache_clear()


N_TREES = 4  # preprocessed, main, interaction, composition


@partial(jax.jit, static_argnames=("comp_log",))
def _combine_eval_jit(coeffs_list: tuple, fwd_tw, comp_log: int):
    """Zero-pad each per-size coefficient block to 2^comp_log, add them mod p
    (the circle-FFT basis is nested, so padded addition = polynomial
    addition), and evaluate on the composition domain — one executable
    instead of pad/add glue per size plus a separate evaluate."""
    total = jnp.zeros((4, 1 << comp_log), jnp.uint32)
    for coeffs in coeffs_list:
        pad = (1 << comp_log) - coeffs.shape[-1]
        total = m31.add(total, jnp.pad(coeffs, ((0, 0), (0, pad))))
    return fft._evaluate_body(total, fwd_tw, comp_log)


@partial(jax.jit, static_argnames=("comp_log",))
def _combine_eval_pallas_jit(coeffs_list: tuple, tables, comp_log: int):
    """_combine_eval_jit with the top-size evaluate running as the fused
    Pallas transform (inline pallas_calls; still one dispatch)."""
    from .ops import fft_pallas

    total = jnp.zeros((4, 1 << comp_log), jnp.uint32)
    for coeffs in coeffs_list:
        pad = (1 << comp_log) - coeffs.shape[-1]
        total = m31.add(total, jnp.pad(coeffs, ((0, 0), (0, pad))))
    return fft_pallas._transform_body(total, *tables, comp_log, False, False)


def _combine_eval(coeffs_list: tuple, comp_log: int, aot: bool = False):
    """Dispatch the fused pad+add+evaluate, Pallas where supported. With
    aot=True, AOT-loads the executable (coeffs_list may hold
    ShapeDtypeStructs) and returns None."""
    if fft._use_pallas(comp_log):
        from .ops import fft_pallas

        args = (coeffs_list, fft_pallas._dev_tables(comp_log, False))
        if aot:
            _combine_eval_pallas_jit.lower(*args, comp_log).compile()
            return None
        return _combine_eval_pallas_jit(*args, comp_log)
    args = (coeffs_list, fft._device_twiddles(comp_log)[0])
    if aot:
        _combine_eval_jit.lower(*args, comp_log).compile()
        return None
    return _combine_eval_jit(*args, comp_log)


# Successor columns derivable on device from their (padded) cur columns:
# next[i] = cur[i+1], with the table builders' last-element conventions
# (tables.py memory/instruction/processor pairing: "inc" = cur[-1]+1,
# "hold" = cur[-1], "zero"/"one" = constants). Everything else (per-opcode
# e2 columns, d flags, is_mv_zero) carries independent data and uploads.
DERIVED_NEXT = {
    "memory": {"next_clk": ("clk", "inc"), "next_mp": ("mp", "hold"),
               "next_mv": ("mv", "hold"), "next_d": ("d", "one")},
    "instruction": {"next_ip": ("ip", "hold"), "next_ci": ("ci", "zero"),
                    "next_ni": ("ni", "zero"), "next_d": ("d", "one")},
    "processor": {"next_clk": ("clk", "inc")},
}


def main_upload_layout(comps) -> tuple:
    """Static layout for _main_mats_jit: per component
    (offset, kept_cols, full_cols, derive, N). Shared by the prove path and
    warmup (which AOT-loads the executable from the claim alone)."""
    layout = []
    off = 0
    for comp in comps:
        derive = DERIVED_NEXT.get(comp.name, {})
        kept = tuple(c for c in comp.columns if c not in derive)
        n = 1 << comp.log_size
        layout.append((off, kept, tuple(comp.columns),
                       tuple(sorted(derive.items())), n))
        off += len(kept) * n
    return tuple(layout), off


def _main_upload(tabs, comps):
    layout, total = main_upload_layout(comps)
    views = []
    for comp, (_, kept, _, _, _) in zip(comps, layout):
        for c in kept:
            views.append(tabs[comp.name][c])
    buf = jnp.asarray(np.concatenate(views))
    assert buf.size == total
    return buf, layout


@partial(jax.jit, static_argnames=("layout",))
def _main_mats_jit(buf, layout: tuple):
    """Split the single uploaded buffer into per-component (n_cols, N)
    matrices, deriving the next_* rows in-executable."""
    outs = []
    for off, kept, full, derive, n in layout:
        m = jax.lax.slice(buf, (off,), (off + len(kept) * n,)).reshape(
            len(kept), n)
        rows = {name: m[i] for i, name in enumerate(kept)}
        for name, (src, kind) in derive:
            s = rows[src]
            last = {"inc": s[-1] + np.uint32(1), "hold": s[-1],
                    "zero": jnp.uint32(0), "one": jnp.uint32(1)}[kind]
            rows[name] = jnp.roll(s, -1).at[-1].set(last)
        outs.append(jnp.stack([rows[c] for c in full]))
    return tuple(outs)


@jax.jit
def _acc_sum_jit(arrs: tuple):
    """Modular sum of same-size composition contributions in one executable
    (eager per-pair qm31.add costs 4 compiles + dispatches per pair)."""
    out = arrs[0]
    for a in arrs[1:]:
        out = qm31.add(out, a)
    return out


class ProvingError(Exception):
    pass


class VerificationError(Exception):
    pass


# ---------------------------------------------------------------------------
# Shared layout: column structure of each tree, derived from the claim
# ---------------------------------------------------------------------------

@dataclass
class ColumnMeta:
    name: str           # "<component>/<column>" or "is_first/<log>" etc.
    log_size: int       # trace-domain log
    shifts: Tuple[int, ...] = (0,)  # sample points: z - shift * g_{log_size}


@dataclass
class SystemLayout:
    config: PcsConfig
    claim: Dict[str, int]
    ladder: List[int]
    trees: List[List[ColumnMeta]]      # per tree, ordered columns
    components: list                    # instantiated Component objects

    @property
    def composition_log(self) -> int:
        return max(self.claim.values()) + self.config.log_blowup


# Capacity bound: the reference refuses components above 2^24 rows
# (LOG_MAX_ROWS, brainfuck_air/mod.rs:427-428); sierpinski.bf exceeds it in
# both implementations (its memory table's clk-gap fill needs 2^25 rows).
LOG_MAX_ROWS_CAP = 24

# Commitment-domain size at or above which the prover inserts dispatch-queue
# barriers between heavy composition programs (see the composition loop and
# core/pcs._SYNC_COMMIT_LOG): bounds the relay-pinned HBM working set of
# near-capacity proves without touching the normal-size async pipeline.
BIG_SYNC_LOG = 23


# (sorted claim items, config fields) -> SystemLayout. The layout is pure
# structure (ColumnMeta lists + stateless Component instances); rebuilding it
# cost ~6 ms of every verify. Capacity refusals raise before insertion, so
# errors are re-raised fresh each call.
_LAYOUT_CACHE: Dict[tuple, SystemLayout] = {}


def build_layout(claim: Dict[str, int], config: PcsConfig) -> SystemLayout:
    key = (tuple(sorted(claim.items())), config.log_blowup, config.n_queries,
           config.pow_bits, config.log_max_rows)
    cached = _LAYOUT_CACHE.get(key)
    if cached is not None:
        return cached
    layout = _build_layout(claim, config)
    _LAYOUT_CACHE[key] = layout
    return layout


def _build_layout(claim: Dict[str, int], config: PcsConfig) -> SystemLayout:
    comps = [cls(claim[cls.name]) for cls in COMPONENT_CLASSES]
    max_log = max(claim.values())
    top = config.log_max_rows if config.log_max_rows else max_log
    if max_log > LOG_MAX_ROWS_CAP:
        big = {n: lg for n, lg in claim.items() if lg > LOG_MAX_ROWS_CAP}
        raise ProvingError(
            f"program exceeds the 2^{LOG_MAX_ROWS_CAP} rows/component capacity "
            f"(reference LOG_MAX_ROWS): {big}")
    if top < max_log:
        raise ProvingError(f"log_max_rows {top} < max component log {max_log}")
    ladder = list(range(top, MIN_LOG_SIZE - 1, -1))

    # Only the component-size is_first columns are ever used by the OODS
    # identity; the rest of the ladder stays committed (program-independent
    # root) but needs no opening — skipping their samples keeps the FRI
    # input set to the sizes that actually carry constraints.
    used_sizes = set(claim.values())
    tree0 = [
        ColumnMeta(f"is_first/{lg}", lg,
                   shifts=((0,) if lg in used_sizes else ()))
        for lg in ladder
    ]
    tree1: List[ColumnMeta] = []
    for comp in comps:
        for col in comp.columns:
            tree1.append(ColumnMeta(f"{comp.name}/{col}", comp.log_size))
    tree2: List[ColumnMeta] = []
    for comp in comps:
        n_rel = comp.relation_count()
        for k in range(n_rel):
            for c in range(4):
                tree2.append(ColumnMeta(f"{comp.name}/q{k}.{c}", comp.log_size))
        for c in range(4):
            tree2.append(ColumnMeta(f"{comp.name}/s.{c}", comp.log_size, shifts=(0, 1)))
    comp_log = max_log + config.log_blowup
    tree3 = [ColumnMeta(f"composition/{c}", comp_log) for c in range(4)]

    return SystemLayout(config, claim, ladder, [tree0, tree1, tree2, tree3], comps)


def draw_elements(channel: Blake2sChannel) -> Dict[str, LookupElements]:
    """Order matches BrainfuckInteractionElements::draw (mod.rs:158-164)."""
    return {
        "memory": LookupElements.draw(channel, ELEMENT_SIZES["memory"]),
        "instruction": LookupElements.draw(channel, ELEMENT_SIZES["instruction"]),
        "processor": LookupElements.draw(channel, ELEMENT_SIZES["processor"]),
    }


def mix_claim(channel: Blake2sChannel, claim: Dict[str, int]) -> None:
    for cls in COMPONENT_CLASSES:
        channel.mix_u32s([claim[cls.name]])


def mix_interaction_claim(channel: Blake2sChannel, iclaim: Dict[str, tuple]) -> None:
    for cls in COMPONENT_CLASSES:
        channel.mix_felts([iclaim[cls.name]])


def lookup_sum_valid(iclaim: Dict[str, tuple]) -> bool:
    total = qm31.ZERO
    for v in iclaim.values():
        total = qm31.h_add(total, tuple(v))
    return total == qm31.ZERO


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def prove_brainfuck(machine, config: Optional[PcsConfig] = None,
                    mesh=None) -> dict:
    """Generate a proof for an executed Machine. Returns a JSON-able dict
    (the BrainfuckProof equivalent, mod.rs:71-76).

    mesh: optional jax.sharding.Mesh — the multi-device analog of the
    reference's whole-prover `parallel` feature (brainfuck_prover/
    Cargo.toml:13): every heavy phase (FFT extends, Merkle commits, LogUp,
    composition, quotients, FRI folds) runs SPMD over the mesh via
    parallel/prove.py. The proof bytes are identical for any device count."""
    log = logging.getLogger("stwo_brainfuck_tpu")
    log.info("Protocol setup")
    trace = machine.trace()
    program = machine.program()
    log.debug("  trace materialized")
    if mesh is None:
        # device-side table build: the raw padded trace (+ tiny permutation
        # arrays) is the only bulk upload; all 13 matrices are built on-chip
        # in one executable, bit-identical to the host builders
        from .components.device_build import build_meta

        meta = build_meta(trace, program)
        log.debug("  trace meta built")
        return _prove_tables(None, config, mesh,
                             trace_src=(trace, program, meta))
    tabs = tables_mod.all_tables(trace, program)
    log.debug("  tables built")
    return _prove_tables(tabs, config, mesh)


def _prove_tables(tabs, config: Optional[PcsConfig] = None, mesh=None,
                  ghost: bool = False, trace_src=None) -> dict:
    """The prove pipeline from built tables. ghost=True runs the COMPLETE
    pipeline on whatever tables are given without requiring a valid trace
    (the LogUp balance check is skipped) — warmup.ghost_prove uses this with
    zero tables to execute every executable/shape/sharding of a real prove,
    which is the mesh path's warmup (enumerating per-signature AOT loads for
    every shard_map wrapper would duplicate the pipeline's structure)."""
    config = config or PcsConfig(log_max_rows=0)  # 0 = auto ladder top
    ops = None
    if mesh is not None:
        from .parallel.prove import ShardedOps

        ops = ShardedOps(mesh)
    log = logging.getLogger("stwo_brainfuck_tpu")

    if trace_src is not None:
        claim = trace_src[2].claim
    else:
        claim = {name: int(np.log2(len(next(iter(cols.values())))))
                 for name, cols in tabs.items()}
    layout = build_layout(claim, config)
    comps = layout.components

    channel = Blake2sChannel()
    config.mix_into(channel)

    log.info("Phase 0: preprocessed trace")
    tree0 = _preprocessed_tree(tuple(layout.ladder), config.log_blowup)
    _preprocessed_root(tuple(layout.ladder), config.log_blowup)  # seed disk cache
    channel.mix_root(tree0.root)

    log.info("Phase 1: main trace")
    mix_claim(channel, claim)
    # Single-chip path: from here the Fiat-Shamir transcript runs ON DEVICE
    # (core/devchan.py) — root mixes, element/alpha/OODS draws, sampled-value
    # mixes and the FRI chain are all async dispatches against a device
    # digest, and everything the host needs (roots, claimed sums, sampled
    # values, FRI outputs, final digest) comes back in ONE batched pull
    # before the PoW (sync A). The mesh path keeps the host channel (no
    # relay latency to hide there); proof bytes are identical either way.
    dc = None
    if ops is None:
        from .core.devchan import DeviceChannel

        dc = DeviceChannel(channel.digest)
    chan = dc if dc is not None else channel
    # ONE host->device upload RPC for all 13 component matrices (each eager
    # per-component jnp.asarray is a full relay round trip, ~0.1-1 s under
    # load), with the successor columns DERIVED on device: next_* are a
    # roll-by-one of their padded cur columns plus a last-element fixup
    # (tables.py builds them exactly that way), so shipping them wastes
    # ~21 MB of fib19's ~55 MB phase-1 upload. Shared with phase 2.
    if trace_src is not None:
        from .components.device_build import build_device_tables

        by_name = build_device_tables(trace_src[0], trace_src[2])
        dev_mats = [by_name[comp.name] for comp in comps]
        del by_name
    else:
        buf, layout_spec = _main_upload(tabs, comps)
        dev_mats = _main_mats_jit(buf, layout_spec)
        del buf  # the flat upload staging buffer duplicates every column
    dev_tabs: Dict[str, Dict[str, jnp.ndarray]] = {}
    for comp, mat in zip(comps, dev_mats):
        # deferred rows: consumer executables slice the uploaded matrix
        # (eager mat[i] is one lax.slice executable per (shape, row)) —
        # the sharded executables resolve RowRefs in their jit wrappers too
        dev_tabs[comp.name] = {c: RowRef(mat, i)
                               for i, c in enumerate(comp.columns)}
    main_cols: List[Tuple[int, jnp.ndarray]] = []
    for comp in comps:
        for col in comp.columns:
            main_cols.append((comp.log_size, dev_tabs[comp.name][col]))
    log.debug("  main uploads issued")
    tree1 = TreeProver(main_cols, config, chan, ops=ops)
    if dc is not None and layout.composition_log >= BIG_SYNC_LOG:
        jax.block_until_ready(tree1.tree.layers[0])
    log.debug("  main tree committed")

    log.info("Phase 2: interaction trace")
    elements = dc.draw_elements() if dc is not None else draw_elements(channel)
    from .framework.component import build_interaction_trace_async
    from .utils.transfer import pull_all

    inter_cols: List[Tuple[int, jnp.ndarray]] = []
    claimed_futs = []
    for comp in comps:
        cols = dev_tabs[comp.name]
        if ops is not None:
            inter, claimed_dev = ops.interaction(comp, cols, elements)
        else:
            inter, claimed_dev = build_interaction_trace_async(comp, cols, elements)
        claimed_futs.append(claimed_dev)
        for q in inter:
            for c in range(4):
                inter_cols.append((comp.log_size, RowRef(q, c)))
    # Near-capacity queue discipline: the device-transcript path defers all
    # pulls, so the relay would otherwise pin the ENTIRE phase-2..FRI
    # pipeline's args/outputs in HBM at once — big22 (2^22 tables, 2^24
    # composition commit) runtime-OOMs the 15.75 GiB chip that way while
    # every phase fits alone. For claims whose composition domain reaches
    # BIG_SYNC_LOG, drain the dispatch queue at each phase boundary
    # (~45 ms each; never hit by the reference programs — fib19 tops at
    # 2^20).
    big_sync = layout.composition_log >= BIG_SYNC_LOG
    iclaim: Optional[Dict[str, tuple]] = None
    if dc is not None:
        # claimed sums stay on device (pulled in sync A; the LogUp balance
        # check — mod.rs:206-227 — runs there, before the proof is built)
        dc.mix_felt_arrays(claimed_futs)
    else:
        claimed_host = pull_all(claimed_futs)
        iclaim = {
            comp.name: tuple(int(v) for v in arr)
            for comp, arr in zip(comps, claimed_host)
        }
        if not lookup_sum_valid(iclaim) and not ghost:
            raise ProvingError("LogUp sum does not cancel — invalid trace")
        mix_interaction_claim(channel, iclaim)
    tree2 = TreeProver(inter_cols, config, chan, ops=ops)
    if dc is not None and big_sync:
        jax.block_until_ready(tree2.tree.layers[0])
    # Free the trace-domain buffers: the main-table upload matrices (only
    # the interaction build reads them) and the raw interaction QM31 rows
    # (their coeffs/extensions live in tree2.records). Everything after
    # this point works on committed coeffs/extended evaluations. On big22
    # these references pinned ~1 GiB of a 15.75 GiB chip.
    del dev_tabs, dev_mats, main_cols, inter_cols

    log.info("Composition polynomial")
    weights_list = None
    alpha_comp = None
    if dc is not None:
        # draw alpha_comp and build every component's weight matrix on
        # device in one executable (offsets are static per claim)
        from .core.devchan import _comp_weights_jit

        specs = transcript_specs(layout)
        wspec, groups, member_pos, mix_spec, qspec = specs[:5]
        size_order, size_shifts = specs[5:]
        weights_list = _comp_weights_jit(dc.digest, wspec, 0)
        dc.counter = 1
    else:
        alpha_comp = channel.draw_felt()
    tree0_index = {lg: i for i, lg in enumerate(layout.ladder)}
    acc: Dict[int, jnp.ndarray] = {}
    alpha_idx = 0
    t1 = 0
    t2 = 0
    blow = config.log_blowup
    for comp_i, comp in enumerate(comps):
        n = comp.log_size
        ext_main = {}
        for col in comp.columns:
            ext_main[col] = tree1.records[t1].extended
            t1 += 1
        n_inter = comp.relation_count() + 1
        ext_inter = []
        for k in range(n_inter):
            # stack + rotate INSIDE the constraint executable (each eager
            # stack/take is a separate compile + relay round trip); the
            # sharded wrapper (_sharded_constraints_fn) normalizes the same
            # forms before its shard_map
            coords = tuple(tree2.records[t2 + 4 * k + c].extended for c in range(4))
            ext_inter.append(coords)
        t2 += 4 * n_inter
        perm = _dev_rotation(n, blow, 1)
        s_prev = (ext_inter[-1], perm)
        isf_ext = tree0.records[tree0_index[n]].extended
        v_inv = _dev_vanishing_inv(n, n + blow)
        if dc is not None:
            contrib, alpha_idx = composition_contribution(
                comp, ext_main, ext_inter, s_prev, isf_ext,
                claimed_futs[comp_i], elements, None, alpha_idx, v_inv,
                weights=weights_list[comp_i],
            )
        else:
            contribute = (ops.composition_contribution if ops
                          else composition_contribution)
            contrib, alpha_idx = contribute(
                comp, ext_main, ext_inter, s_prev, isf_ext, iclaim[comp.name],
                elements, alpha_comp, alpha_idx, v_inv,
            )
        lg = n + blow
        if ops is None and lg >= BIG_SYNC_LOG:
            # Near-capacity sizes: drain the dispatch queue after each
            # heavy constraint-eval program. The relay pins every queued
            # executable's args/outputs in HBM; big22's three 2^23
            # contributions (each reading the full main + interaction
            # extended matrices) queued together with the composition
            # extend runtime-OOM the chip, while each fits alone. Costs
            # one ~45 ms round trip per big component; sizes below the
            # threshold (all reference programs) never sync.
            jax.block_until_ready(contrib)
        acc.setdefault(lg, []).append(contrib)

    comp_log = layout.composition_log
    if ops is None:
        # per-size contribution sums in one executable each, per-size
        # interpolates (hybrid Pallas/XLA dispatch), then ONE fused
        # executable for zero-pad + modular add + the top-size evaluate
        coeffs_list = tuple(
            fft.interpolate(arrs[0] if len(arrs) == 1
                            else _acc_sum_jit(tuple(arrs)), lg)
            for lg, arrs in sorted(acc.items()))
        comp_evals = _combine_eval(coeffs_list, comp_log)
        del coeffs_list
    else:
        # fused mesh analog: per-size sums + sharded interpolates + pad-add
        # + the composition-domain evaluate in ONE executable
        comp_evals = ops.combine_eval(acc, comp_log)
    tree3 = TreeProver(
        [(comp_log, RowRef(comp_evals, c)) for c in range(4)],
        config, chan, ops=ops)
    # the raw contributions and the trace-domain composition evaluation are
    # consumed by the interpolations / tree3's extend — on big22 they pin
    # ~0.5 GiB through the rest of the prove otherwise
    del acc, comp_evals
    if dc is not None and big_sync:
        jax.block_until_ready(tree3.tree.layers[0])

    trees = [tree0, tree1, tree2, tree3]

    log.info("OODS sampling")
    if dc is not None:
        # draw t, map to z, and build every sampling group's half-bases on
        # device; dispatch the tensor-product samples; mix them in walk
        # order — all without leaving the device
        from .core.devchan import _oods_jit, _quot_consts_jit

        zx, zy, bases = _oods_jit(dc.digest, tuple(groups.keys()))
        dc.counter = 1
        garrs = []
        for members, (b_lo, b_hi) in zip(groups.values(), bases):
            rows = tuple(trees[ti].records[ci].coeffs for ti, ci, _ in members)
            garrs.append(poly._sample_tensor_jit(rows, b_lo, b_hi))
        if big_sync:
            jax.block_until_ready(garrs)
            # the coefficient matrices exist only to be OODS-sampled; on
            # near-capacity claims they pin ~1.3 GiB through quotients/FRI
            # (tree0's are process-cached and stay — every later prove
            # samples them)
            for t in (tree1, tree2, tree3):
                for rec in t.records:
                    rec.coeffs = None
        dc.mix_chain(tuple(garrs), mix_spec)
        sampled = None
    else:
        t_oods = channel.draw_felt()
        z = point_from_t(t_oods)
        sampled = _sample_all_trees(trees, layout, z)
        log.info("  sampled all trees")
        for tvals in sampled:
            for cvals in tvals:
                channel.mix_felts([tuple(v) for v in cvals])

    log.info("Quotients")
    if dc is not None:
        # per-size claim structure is static: alpha_q, beta0 and every
        # size's point-group constants/weights come from one executable
        size_cols: Dict[int, list] = {}
        for ti, metas in enumerate(layout.trees):
            for ci, meta in enumerate(metas):
                if not meta.shifts:
                    continue  # committed but never opened
                size_cols.setdefault(meta.log_size + blow, []).append(
                    trees[ti].records[ci].extended)
        _alpha_q_dev, beta0_dev, consts_w = _quot_consts_jit(
            dc.digest, zx, zy, tuple(garrs), qspec)
        dc.counter = 2
        fri_inputs = {}
        for size, (consts, w) in zip(size_order, consts_w):
            log.info("  quotients size 2^%d (%d columns)", size,
                     len(size_cols[size]))
            g0 = tuple(range(len(size_cols[size])))
            g1 = tuple(i for i, sh in enumerate(size_shifts[size]) if 1 in sh)
            idx_groups = (g0, g1) if g1 else (g0,)
            px, py = quotients._dev_points(size)
            fri_inputs[size] = quotients._accumulate_all_jit(
                tuple(size_cols[size]), consts, w, px, py, idx_groups)
            if big_sync and size >= BIG_SYNC_LOG:
                jax.block_until_ready(fri_inputs[size])
    else:
        alpha_q = channel.draw_felt()
        claims_by_size: Dict[int, List[Tuple[jnp.ndarray, List[quotients.QuotientClaim]]]] = {}
        aidx = 0
        for tree, metas, tvals in zip(trees, layout.trees, sampled):
            for rec, meta, cvals in zip(tree.records, metas, tvals):
                if not meta.shifts:
                    continue  # committed but never opened (unused ladder sizes)
                size = rec.log_size + blow
                cl = []
                for s, v in zip(meta.shifts, cvals):
                    cl.append(quotients.QuotientClaim(
                        point=shifted_point(z, meta.log_size, s), value=v, alpha_index=aidx))
                    aidx += 1
                claims_by_size.setdefault(size, []).append((rec.extended, cl))
        fri_inputs = {}
        for size, pairs in claims_by_size.items():
            log.info("  quotients size 2^%d (%d columns)", size, len(pairs))
            fri_inputs[size] = quotients.accumulate_quotients(
                size, [p[0] for p in pairs], [p[1] for p in pairs], alpha_q,
                ops=ops,
            )

    log.info("FRI")
    s_max = max(fri_inputs)
    if dc is not None:
        from .core import blake2s
        from .utils.transfer import pull_all

        fri_prover, fri_roots, fri_cur, digest = fri.fri_commit_async(
            fri_inputs, beta0_dev, dc.digest,
            sync_log=(BIG_SYNC_LOG - 2 if big_sync else None))
        if big_sync:
            fri_inputs = None  # injected/folded; frees ~0.5 GiB on big22

        # ---- sync A: the ONE mid-prove pull — phase roots, claimed sums,
        # sampled values, FRI layer roots + last value, final digest ----
        futs = ([tree1.tree.layers[0], tree2.tree.layers[0],
                 tree3.tree.layers[0]]
                + list(claimed_futs) + list(garrs) + list(fri_roots)
                + [fri_cur, digest])
        host = pull_all(futs)
        nc = len(claimed_futs)
        ng = len(garrs)
        for t, rw in zip((tree1, tree2, tree3), host[:3]):
            t.tree.root = blake2s.digest_to_bytes(
                np.asarray(rw).reshape(8))
        iclaim = {
            comp.name: tuple(int(v) for v in arr)
            for comp, arr in zip(comps, host[3:3 + nc])
        }
        if not lookup_sum_valid(iclaim) and not ghost:
            raise ProvingError("LogUp sum does not cancel — invalid trace")
        sampled = _remap_sampled(groups, host[3 + nc:3 + nc + ng], layout)
        fri.fri_commit_finish(fri_prover, host[3 + nc + ng:-2], host[-2])
        channel.digest = blake2s.digest_to_bytes(host[-1])
        channel._counter = 0
    else:
        fri_prover = fri.fri_commit(fri_inputs, channel, ops=ops)

    log.info("PoW + queries")
    nonce = channel.grind_pow(config.pow_bits)
    channel.mix_u64(nonce)
    queries = channel.draw_queries(config.n_queries, s_max)

    log.info("Decommitment")
    pending = []
    for tree in trees:
        levels = sorted(tree.column_levels())
        pos = query_positions_by_level(queries, s_max, levels)
        pending.append(merkle.decommit_async(tree.tree, pos,
                                             n_queries=config.n_queries))
    # ---- sync B: the 4 trees' and every FRI layer's decommitments plus the
    # FRI value gathers come back in ONE host transfer ----
    positions_list, fri_pendings, val_futs = fri.fri_decommit_async(
        fri_prover, queries)
    decs_all, vals_host = merkle.finalize_with_extra(
        pending + fri_pendings, val_futs)
    decommitments = decs_all[:len(trees)]
    fri.fri_decommit_finish(fri_prover, positions_list,
                            decs_all[len(trees):], vals_host)
    log.info("  decommitted")

    log.info("  assembling proof")
    return {
        "config": config.to_json(),
        "claim": claim,
        "interaction_claim": {k: list(v) for k, v in iclaim.items()},
        "commitments": [t.root.hex() for t in trees],
        "sampled_values": [
            [[list(v) for v in cvals] for cvals in tvals] for tvals in sampled
        ],
        "fri": fri_prover.proof.to_json(),
        "pow_nonce": nonce,
        "decommitments": [d.to_json() for d in decommitments],
    }


def record_rows(layout: SystemLayout) -> List[List[tuple]]:
    """Per tree, per record: (size-group column count, row index) within the
    tree's per-size (C, N) matrices — mirrors TreeProver's size grouping.
    Warmup uses this to reproduce the exact RowRef structures the prove
    pipeline passes to its executables (jit cache keys include the static
    row index carried as pytree aux data)."""
    out: List[List[tuple]] = []
    for metas in layout.trees:
        counts: Dict[int, int] = {}
        for m in metas:
            counts[m.log_size] = counts.get(m.log_size, 0) + 1
        pos: Dict[int, int] = {}
        rows = []
        for m in metas:
            j = pos.get(m.log_size, 0)
            pos[m.log_size] = j + 1
            rows.append((counts[m.log_size], j))
        out.append(rows)
    return out


def transcript_specs(layout: SystemLayout):
    """Static device-transcript structure for a layout, shared by the prove
    path and warmup (which AOT-loads the devchan executables from the claim
    alone): (wspec, groups, member_pos, mix_spec, qspec, size_order,
    size_shifts).

    - wspec: per-component weight-construction spec (devchan._comp_weights_jit)
    - groups: sampling_plan(layout) (insertion order = walk order)
    - member_pos: (tree, column, point) -> (group index, member index)
    - mix_spec: the sampled-values mix walk (devchan._mix_chain_jit)
    - qspec: per-size point-group spec (devchan._quot_consts_jit)
    - size_order / size_shifts: commitment sizes in first-encounter order
      and each size's per-column shift tuples (the idx_groups structure)

    Pure per layout; cached on the (cached) layout instance — the walk cost
    ~10 ms of every warm prove.
    """
    cached = getattr(layout, "_transcript_specs", None)
    if cached is not None:
        return cached
    from .framework.component import weight_spec

    comps = layout.components
    offs = []
    off = 0
    for comp in comps:
        offs.append(off)
        off += comp.constraint_count()
    wspec = tuple(weight_spec(c, o) for c, o in zip(comps, offs))

    groups = sampling_plan(layout)
    member_pos: Dict[tuple, tuple] = {}
    for gi, members in enumerate(groups.values()):
        for mi, key in enumerate(members):
            member_pos[key] = (gi, mi)
    mix_spec = tuple(
        tuple(member_pos[(ti, ci, pi)] for pi in range(len(meta.shifts)))
        for ti, metas in enumerate(layout.trees)
        for ci, meta in enumerate(metas))

    blow = layout.config.log_blowup
    aidx = 0
    size_order: List[int] = []
    size_shifts: Dict[int, list] = {}
    size_groups: Dict[int, dict] = {}
    for ti, metas in enumerate(layout.trees):
        for ci, meta in enumerate(metas):
            if not meta.shifts:
                continue
            size = meta.log_size + blow
            if size not in size_shifts:
                size_order.append(size)
                size_shifts[size] = []
            size_shifts[size].append(meta.shifts)
            for pi, s in enumerate(meta.shifts):
                gi, _mi = member_pos[(ti, ci, pi)]
                ent = size_groups.setdefault(size, {}).setdefault(s, (gi, []))
                assert ent[0] == gi
                ent[1].append(aidx)
                aidx += 1
    qspec = tuple(
        (size - blow, tuple((s, gi, tuple(idxs))
                            for s, (gi, idxs) in size_groups[size].items()))
        for size in size_order)
    specs = (wspec, groups, member_pos, mix_spec, qspec, size_order,
             size_shifts)
    layout._transcript_specs = specs
    return specs


def sampling_plan(layout: SystemLayout) -> Dict[tuple, list]:
    """(trace log, shift) -> [(tree, column, point index)] in walk order.
    Shared by the prover's sampling dispatch and warmup (which must reproduce
    the group (C, N) shapes to precompile the tensor-product kernels)."""
    groups: Dict[tuple, list] = {}
    for ti, metas in enumerate(layout.trees):
        for ci, meta in enumerate(metas):
            for pi, s in enumerate(meta.shifts):
                groups.setdefault((meta.log_size, s), []).append((ti, ci, pi))
    return groups


def _sample_all_trees(trees, layout: SystemLayout, z) -> List[List[List[tuple]]]:
    """OODS-sample every committed column of every tree at its mask points:
    columns are grouped by (trace log, shift) ACROSS trees; each group is one
    tiny tensor-product contraction (poly._sample_tensor_jit, shared across
    groups with equal (C, N)), all dispatches async, and the whole mask comes
    back in one host transfer. The point's half-bases are built on the host —
    the previous design built the 2^N basis on-device inside one fused
    executable, which lowered to 15 MB of HLO and dominated cold compiles."""
    from .core import poly
    from .utils.transfer import pull_all

    groups = sampling_plan(layout)
    outs = []
    for (log_size, s), members in groups.items():
        rows = tuple(trees[ti].records[ci].coeffs for ti, ci, _ in members)
        pt = shifted_point(z, log_size, s)
        b_lo, b_hi = poly.half_bases_at_point(log_size, pt)
        outs.append(poly._sample_tensor_jit(
            rows, jnp.asarray(b_lo), jnp.asarray(b_hi)))
    host = pull_all(list(outs))
    return _remap_sampled(groups, host, layout)


def _remap_sampled(groups, host_arrs, layout: SystemLayout):
    """Scatter pulled (4, C) sampling-group arrays back into the per-tree
    per-column per-point nested structure of the proof."""
    sampled: List[List[List[Optional[tuple]]]] = [
        [[None] * len(meta.shifts) for meta in metas] for metas in layout.trees
    ]
    for members, arr in zip(groups.values(), host_arrs):
        for (ti, ci, pi), c in zip(members, range(arr.shape[1])):
            sampled[ti][ci][pi] = tuple(int(arr[k, c]) for k in range(4))
    return sampled  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

MIN_SECURITY_CONFIG = PcsConfig(log_blowup=1, n_queries=8, pow_bits=4, log_max_rows=0)


def verify_brainfuck(proof: dict, min_config: Optional[PcsConfig] = None) -> None:
    """Full verification; raises VerificationError on any failure.

    min_config pins the minimum acceptable security parameters (the
    reference pins PcsConfig::default(), mod.rs:744); the proof's embedded
    config must meet or exceed them — otherwise a forger could ship a proof
    "verified" under vacuous parameters (log_blowup=0 makes FRI accept
    everything)."""
    try:
        _verify_brainfuck_inner(proof, min_config)
    except VerificationError:
        raise
    except Exception as exc:  # malformed proofs must never crash the verifier
        raise VerificationError(f"malformed proof ({type(exc).__name__}: {exc})")


def _verify_brainfuck_inner(proof: dict, min_config: Optional[PcsConfig]) -> None:
    try:
        config = PcsConfig.from_json(proof["config"])
        claim = {k: int(v) for k, v in proof["claim"].items()}
        iclaim = {k: tuple(int(x) for x in v) for k, v in proof["interaction_claim"].items()}
        roots = [bytes.fromhex(r) for r in proof["commitments"]]
        sampled = [
            [[tuple(int(x) for x in v) for v in cvals] for cvals in tvals]
            for tvals in proof["sampled_values"]
        ]
        fri_proof = fri.FriProof.from_json(proof["fri"])
        nonce = int(proof["pow_nonce"])
        decs = [merkle.MerkleDecommitment.from_json(d) for d in proof["decommitments"]]
    except (KeyError, ValueError, TypeError) as exc:
        raise VerificationError(f"malformed proof: {exc}")

    floor = min_config or MIN_SECURITY_CONFIG
    # log_max_rows is capped at LOG_MAX_ROWS_CAP (= the prover's capacity
    # bound): accepting larger values would let a hostile proof force the
    # verifier into a 2^(29+)-point preprocessed recommit before any
    # cryptographic check fails (DoS).
    if (config.log_blowup < max(1, floor.log_blowup)
            or config.n_queries < floor.n_queries
            or config.pow_bits < floor.pow_bits
            or not (0 <= config.log_max_rows <= LOG_MAX_ROWS_CAP)):
        raise VerificationError(f"insecure proof parameters: {config}")
    if len(roots) != N_TREES or len(decs) != N_TREES or len(sampled) != N_TREES:
        raise VerificationError("bad tree count")

    if set(claim) != {c.name for c in COMPONENT_CLASSES}:
        raise VerificationError("bad claim components")
    for name, lg in claim.items():
        if not (MIN_LOG_SIZE <= lg <= LOG_MAX_ROWS_CAP):
            raise VerificationError(f"claim log_size out of range: {name}={lg}")
    try:
        layout = build_layout(claim, config)
    except ProvingError as exc:
        raise VerificationError(str(exc))
    comps = layout.components
    blow = config.log_blowup

    # The preprocessed (is_first ladder) tree is a deterministic function of
    # the config/claim — recompute its root instead of trusting the proof.
    # (The reference verifier takes it from the proof, mod.rs:754-758, which
    # would let a prover commit a fake is_first column and void every
    # boundary constraint.)
    # (root disk-cached across processes — a fresh verify-only process checks
    # it in microseconds instead of recommitting the ladder)
    if _preprocessed_root(tuple(layout.ladder), config.log_blowup) != roots[0]:
        raise VerificationError("preprocessed commitment mismatch")

    # transcript replay
    channel = Blake2sChannel()
    config.mix_into(channel)
    channel.mix_root(roots[0])
    mix_claim(channel, claim)
    channel.mix_root(roots[1])
    elements = draw_elements(channel)
    if not lookup_sum_valid(iclaim):
        raise VerificationError("invalid LogUp sum")
    mix_interaction_claim(channel, iclaim)
    channel.mix_root(roots[2])
    alpha_comp = channel.draw_felt()
    channel.mix_root(roots[3])
    t_oods = channel.draw_felt()
    z = point_from_t(t_oods)

    # sampled-value shape check + transcript mix
    for tvals, metas in zip(sampled, layout.trees):
        if len(tvals) != len(metas):
            raise VerificationError("bad sampled value count")
        for cvals, meta in zip(tvals, metas):
            if len(cvals) != len(meta.shifts):
                raise VerificationError("bad sample point count")
    for tvals in sampled:
        for cvals in tvals:
            channel.mix_felts([tuple(v) for v in cvals])

    # OODS composition identity
    _check_composition_identity(layout, sampled, iclaim, elements, alpha_comp, z)

    alpha_q = channel.draw_felt()

    # FRI transcript: beta0, per-layer betas
    beta0 = channel.draw_felt()
    betas = []
    for root in fri_proof.layer_roots:
        channel.mix_root(root)
        betas.append(channel.draw_felt())
    channel.mix_felts([fri_proof.last_layer_value])

    # PoW
    if not channel.check_pow_nonce(config.pow_bits, nonce):
        raise VerificationError("invalid proof of work")
    channel.mix_u64(nonce)

    # queries
    # largest commitment size that actually carries claims (= FRI max);
    # unopened ladder levels may be deeper but are witness-only
    s_max = max(m.log_size + blow
                for metas in layout.trees for m in metas if m.shifts)
    queries = channel.draw_queries(config.n_queries, s_max)

    # Merkle verification of the 4 trees; collect values per level
    values_by_size: Dict[int, List[Tuple[List[int], List[quotients.QuotientClaim]]]] = {}
    positions_by_size: Dict[int, List[int]] = {}
    aidx = 0
    for ti, (root, metas, tvals, dec) in enumerate(zip(roots, layout.trees, sampled, decs)):
        col_levels: Dict[int, int] = {}
        for meta in metas:
            lvl = meta.log_size + blow
            col_levels[lvl] = col_levels.get(lvl, 0) + 1
        levels = sorted(col_levels)
        pos = query_positions_by_level(queries, s_max, levels)
        try:
            got = merkle.verify(root, col_levels, pos, dec, max_log=max(levels))
        except merkle.MerkleVerificationError as exc:
            raise VerificationError(f"tree {ti} merkle: {exc}")
        # map columns back in order, attach quotient claims
        seen_at_level: Dict[int, int] = {}
        for meta, cvals in zip(metas, tvals):
            lvl = meta.log_size + blow
            ci = seen_at_level.get(lvl, 0)
            seen_at_level[lvl] = ci + 1
            if not meta.shifts:
                continue  # committed but never opened
            claims = []
            for s, v in zip(meta.shifts, cvals):
                claims.append(quotients.QuotientClaim(
                    point=shifted_point(z, meta.log_size, s), value=v, alpha_index=aidx))
                aidx += 1
            vals = got[lvl][ci]
            positions_by_size[lvl] = pos[lvl]
            values_by_size.setdefault(lvl, []).append((vals, claims))

    # FRI query verification: every size's combined quotient is reconstructed
    # at ALL its query positions in one vectorized batch (point-group
    # constants prepared once per size; the per-position tuple-math loop
    # dominated verify wall-clock — VERDICT r4 item 5)
    qvals_by_size: Dict[int, dict] = {}
    for size, cols in values_by_size.items():
        prepared = quotients.prepare_point_groups(
            [c[1] for c in cols], alpha_q)
        mat = np.array([c[0] for c in cols], np.uint64)
        qvals_by_size[size] = quotients.quotient_values_batch(
            size, positions_by_size[size], mat, prepared)

    def input_values_fn(size, position):
        d = qvals_by_size.get(size)
        return None if d is None else d[position]

    try:
        fri.fri_verify_queries(fri_proof, (beta0, betas), s_max, queries, input_values_fn)
    except fri.FriVerificationError as exc:
        raise VerificationError(f"FRI: {exc}")


def _check_composition_identity(layout, sampled, iclaim, elements, alpha_comp, z):
    """Recompute the composition value at z from sampled mask values and
    compare against the sampled composition columns."""
    claim = layout.claim
    ladder_index = {lg: i for i, lg in enumerate(layout.ladder)}
    alpha_idx = 0
    total = qm31.ZERO
    t1 = 0
    t2 = 0
    for comp in layout.components:
        n = comp.log_size
        main_vals = {}
        for col in comp.columns:
            main_vals[col] = sampled[1][t1][0]
            t1 += 1
        n_inter = comp.relation_count() + 1
        inter_vals = []
        s_prev = None
        for k in range(n_inter):
            coords = [sampled[2][t2 + 4 * k + c][0] for c in range(4)]
            inter_vals.append(qm31.h_recombine(coords))
        s_prev_coords = [sampled[2][t2 + 4 * (n_inter - 1) + c][1] for c in range(4)]
        s_prev = qm31.h_recombine(s_prev_coords)
        t2 += 4 * n_inter
        isf = sampled[0][ladder_index[n]][0]
        cons = evaluate_constraints_at_point(
            comp, main_vals, inter_vals, s_prev, isf, iclaim[comp.name], elements
        )
        v_inv = qm31.h_inv(poly.vanishing_at_point(n, z))
        for c in cons:
            term = qm31.h_mul(qm31.h_pow(alpha_comp, alpha_idx), qm31.h_mul(c, v_inv))
            total = qm31.h_add(total, term)
            alpha_idx += 1

    comp_val = qm31.h_recombine([sampled[3][c][0] for c in range(4)])
    if comp_val != total:
        raise VerificationError("OODS composition identity failed")
