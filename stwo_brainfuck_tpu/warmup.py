"""Parallel executable warm-up.

Cold proving cost through the axon TPU relay is dominated by XLA compiles,
paid one executable at a time as the (strictly sequential, Fiat-Shamir-
ordered) pipeline first reaches each shape — and the relay's remote-compile
path bypasses jax's persistent cache, so every fresh process pays all of it.

warmup(claim, config) enumerates every executable/shape the prove pipeline
will need for this claim (interaction kernels, union/constraint kernels,
batched FFTs, Merkle level hashes and cascades, quotient kernels, FRI folds,
the PoW batch) and runs each ONCE with zero inputs from a thread pool —
compilation happens inside the dispatch, the GIL is released while the
backend compiles, so independent executables compile concurrently instead of
serializing behind the transcript. The subsequent real prove is then all
cache hits.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

log = logging.getLogger("stwo_brainfuck_tpu")


def _z(*shape) -> jnp.ndarray:
    return jnp.zeros(shape, jnp.uint32)


def _tree_groups(layout) -> Dict[int, int]:
    """tree index -> {trace log_size: column count} merged across trees is
    wrong (separate TreeProver calls) — return per-tree group maps."""
    groups: List[Dict[int, int]] = []
    for metas in layout.trees:
        g: Dict[int, int] = {}
        for meta in metas:
            g[meta.log_size] = g.get(meta.log_size, 0) + 1
        groups.append(g)
    return groups


def warmup_thunks(claim: Dict[str, int], config) -> List:
    """Enumerate zero-input thunks covering the prove pipeline's executables
    for this claim. Each distinct shape appears exactly once."""
    from . import air
    from .components.defs import ELEMENT_SIZES
    from .core import fft, fri, merkle, quotients
    from .framework.component import (
        LookupElements,
        _device_perm,
        _interaction_fn,
        composition_contribution,
    )

    layout = air.build_layout(claim, config)
    blow = config.log_blowup
    thunks = []
    els = {k: LookupElements.dummy(s) for k, s in ELEMENT_SIZES.items()}
    els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
               for k, e in els.items()}

    # --- interaction kernels (one per interaction_key x size) -------------
    seen = set()
    for comp in layout.components:
        cls = type(comp)
        key = (getattr(cls, "interaction_key", cls), comp.log_size)
        if key in seen:
            continue
        seen.add(key)

        def warm_inter(cls=cls, n=comp.log_size):
            c = cls(n)
            fn = _interaction_fn(cls, n)
            main = {name: _z(1 << n) for name in c.columns}
            q, s, cl = fn(main, els_dev, _device_perm(n))
            s.block_until_ready()

        thunks.append(warm_inter)

    # --- constraint / union kernels ---------------------------------------
    seen = set()
    for comp in layout.components:
        cls = type(comp)
        key = (getattr(cls, "union_group", None) or cls, comp.log_size)
        if key in seen:
            continue
        seen.add(key)

        def warm_cons(comp=comp, n=comp.log_size):
            ne = 1 << (n + blow)
            main = {name: _z(ne) for name in comp.columns}
            inter = [_z(4, ne) for _ in range(comp.relation_count() + 1)]
            out, _ = composition_contribution(
                comp, main, inter, _z(4, ne), _z(ne), (0, 0, 0, 0), els,
                (1, 0, 0, 0), 0, _z(ne))
            out.block_until_ready()

        thunks.append(warm_cons)

    # --- FFT shapes (per tree size-group) + whole-tree merkle shapes ------
    fft_shapes = set()       # fused extend: (C, trace log)
    tree_sigs = set()        # tree signatures (warm the shared level kernels)
    for ti, g in enumerate(_tree_groups(layout)):
        by_level = {}
        for lg, cnt in g.items():
            if ti != 0:
                fft_shapes.add((cnt, lg))
            by_level[lg + blow] = cnt
        tree_sigs.add(tuple(sorted(by_level.items())))

    # tree0 (is_first ladder) uses the closed-form kernels, not CFFT
    for lg in layout.ladder:

        def warm_is_first(lg=lg):
            fft.is_first_coeffs(lg)
            fft.is_first_extended(lg, lg + blow).block_until_ready()

        thunks.append(warm_is_first)

    for cnt, lg in sorted(fft_shapes):

        def warm_fft(cnt=cnt, lg=lg):
            _, e = fft.extend_with_coeffs(_z(cnt, 1 << lg), lg, blow)
            e.block_until_ready()

        thunks.append(warm_fft)

    # composition accumulation: interpolate (4, n+blow) per distinct size,
    # then one evaluate at comp_log
    comp_log = layout.composition_log

    def warm_comp_fft():
        sizes = sorted({n + blow for n in claim.values()})
        coeffs_list = tuple(fft.interpolate(_z(4, 1 << s), s) for s in sizes)
        air._combine_eval_jit(
            coeffs_list, fft._device_twiddles(comp_log)[0], comp_log,
        ).block_until_ready()

    thunks.append(warm_comp_fft)

    # --- OODS sampling tensor kernels (one per distinct (C, N) shape) -----
    sample_shapes = sorted({(len(members), lg)
                            for (lg, _s), members
                            in air.sampling_plan(layout).items()})
    for cnt, lg in sample_shapes:

        def warm_sampling(cnt=cnt, lg=lg):
            from .core import poly
            lo = lg // 2
            poly._sample_tensor_jit(
                tuple(_z(1 << lg) for _ in range(cnt)),
                _z(4, 1 << lo), _z(4, 1 << (lg - lo)),
            ).block_until_ready()

        thunks.append(warm_sampling)

    # --- FRI: fold shapes, layer-commit merkle shapes ---------------------
    used_sizes = sorted({m.log_size + blow
                         for metas in layout.trees for m in metas if m.shifts},
                        reverse=True)
    max_log = used_sizes[0]
    input_sizes = set(used_sizes)
    fold_sizes = set(used_sizes)   # circle fold of each injected input
    fold2_sizes = set()            # fused beta/beta^2 double folds
    m = max_log - 1
    layer_levels = []
    while m > fri.LOG_LAST_LAYER:
        layer_levels.append(m)
        if m - 1 > fri.LOG_LAST_LAYER and m not in input_sizes:
            fold2_sizes.add(m)
            m -= 2
            continue
        fold_sizes.add(m)
        m -= 1
        if m > fri.LOG_LAST_LAYER:
            fold_sizes.add(m)
            m -= 1
    for lvl in layer_levels:
        tree_sigs.add(((lvl, 4),))

    def warm_folds():
        one = jnp.ones(4, jnp.uint32)
        for s in sorted(fold_sizes, reverse=True):
            out = fri._fold_jit(_z(4, 1 << s), _z(1 << (s - 1)), one)
        for s in sorted(fold2_sizes, reverse=True):
            out = fri._fold2_jit(_z(4, 1 << s), _z(1 << (s - 1)),
                                 _z(1 << (s - 2)), one, one)
        out.block_until_ready()

    thunks.append(warm_folds)

    # Simulated query set: n_queries distinct spread positions — for typical
    # query counts the padded gather shapes (pow2 buckets) match the real
    # random draw, so the decommit gather executables precompile too.
    from .core.pcs import query_positions_by_level

    step = max(1, (1 << max_log) // (2 * config.n_queries))
    fake_queries = sorted({(2 * i + 1) * step for i in range(config.n_queries)})

    # Per-kernel thunks FIRST (one per distinct level-hash shape, so the
    # thread pool compiles them concurrently); the per-sig commit+decommit
    # thunks after them are then cache-hit dispatches that warm only the
    # decommit gather shapes.
    kernel_steps = set()
    for sig in tree_sigs:
        kernel_steps.update(merkle.level_plan(list(sig)))

    for step in sorted(kernel_steps):

        def warm_mk_kernel(step=step):
            kind, k = step[0], step[1]
            if kind == "leaf":
                out, _ = merkle._leaf_hash_jit(_z(step[2], 1 << k))
            elif kind == "node":
                out, _ = merkle._node_hash_jit(_z(1 << (k + 1), 8),
                                               _z(step[2], 1 << k))
            else:
                out = merkle._chain_hash_jit(_z(1 << (k + 1), 8), step[2])[-1]
            out.block_until_ready()

        thunks.append(warm_mk_kernel)

    for sig in sorted(tree_sigs):

        def warm_merkle(sig=sig):
            tree = merkle.commit({k: _z(c, 1 << k) for k, c in sig})
            levels = [k for k, _ in sig]
            pos = query_positions_by_level(fake_queries, max_log, levels)
            if pos:
                merkle.decommit_async(tree, pos).finalize()

        thunks.append(warm_merkle)

    def warm_fri_decommit():
        # fri_decommit's per-layer evaluation gathers (padded-idx jnp.take)
        for lvl in layer_levels:
            positions = query_positions_by_level(fake_queries, max_log, [lvl])
            idx, _n = merkle._padded_idx(positions[lvl])
            jnp.take(_z(4, 1 << lvl), idx, axis=1).block_until_ready()

    thunks.append(warm_fri_decommit)

    # --- quotient kernels: one fused executable per size ------------------
    # mirror prove's claims_by_size walk exactly (group0 = every opened
    # column at z, group1 = the prefix-sum columns at z - g, in tree order)
    size_shifts: Dict[int, List[tuple]] = {}
    for metas in layout.trees:
        for meta in metas:
            if not meta.shifts:
                continue
            size_shifts.setdefault(meta.log_size + blow, []).append(meta.shifts)

    for s, shift_list in sorted(size_shifts.items(), reverse=True):
        g0 = tuple(range(len(shift_list)))
        g1 = tuple(i for i, sh in enumerate(shift_list) if 1 in sh)
        idx_groups = (g0, g1) if g1 else (g0,)
        n_w = sum(len(g) for g in idx_groups)

        def warm_quot(s=s, c=len(shift_list), idx_groups=idx_groups, n_w=n_w):
            quotients._accumulate_all_jit(
                tuple(_z(1 << s) for _ in range(c)),
                jnp.ones((len(idx_groups), 5, 4), jnp.uint32),
                _z(n_w, 4), _z(1 << s), _z(1 << s), idx_groups,
            ).block_until_ready()

        thunks.append(warm_quot)

    # --- PoW batch --------------------------------------------------------
    def warm_pow():
        from .core import channel as ch

        if config.pow_bits > 13:
            ch._pow_batch(_z(8), jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))

    thunks.append(warm_pow)
    # Longest compiles first (minimizes the thread-pool makespan): the
    # Blake2s level kernels and the FFT/quotient programs dominate; the
    # per-sig merkle walks must come after the kernels they reuse, and the
    # tensor-product sampling kernels are tiny.
    prio = {"warm_mk_kernel": 0, "warm_fft": 1, "warm_quot": 2,
            "warm_is_first": 3, "warm_comp_fft": 4, "warm_folds": 5,
            "warm_inter": 6, "warm_cons": 7, "warm_sampling": 8,
            "warm_merkle": 9, "warm_fri_decommit": 10, "warm_pow": 11}
    thunks.sort(key=lambda t: prio.get(t.__name__, 12))
    return thunks


def warmup(claim: Dict[str, int], config, max_workers: int = 8) -> int:
    """Precompile the pipeline's executables concurrently. Returns the
    number of warm thunks executed. Safe to skip — missing shapes simply
    compile inline during the prove."""
    import time

    thunks = warmup_thunks(claim, config)
    t0 = time.time()
    errors = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(t) for t in thunks]
        for f in futs:
            exc = f.exception()
            if exc is not None:
                errors.append(exc)
    if errors:
        log.warning("warmup: %d/%d thunks failed (first: %r)",
                    len(errors), len(thunks), errors[0])
    log.info("warmup: %d executables in %.1f s", len(thunks), time.time() - t0)
    return len(thunks)
