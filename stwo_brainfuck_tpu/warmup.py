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


def _merkle_shapes(by_level: Dict[int, int]):
    """Mirror merkle.commit's segment walk: the (hash shape / cascade) set."""
    shapes = []
    max_log = max(by_level)
    k = max_log
    have_prev = False
    while k >= 0:
        c = by_level.get(k, 0)
        if c == 0 and have_prev:
            k_end = k
            while k_end > 0 and by_level.get(k_end - 1, 0) == 0:
                k_end -= 1
            shapes.append(("cascade", 1 << (k + 1), k - k_end + 1))
            k = k_end - 1
            continue
        shapes.append(("level" if have_prev else "leaf", 1 << k, c))
        have_prev = True
        k -= 1
    return shapes


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

    # --- FFT shapes (per tree size-group) + merkle level shapes -----------
    fft_shapes = set()       # fused extend: (C, trace log)
    merkle_shapes = set()
    for ti, g in enumerate(_tree_groups(layout)):
        by_level = {}
        for lg, cnt in g.items():
            if ti != 0:
                fft_shapes.add((cnt, lg))
            by_level[lg + blow] = cnt
        for s in _merkle_shapes(by_level):
            merkle_shapes.add(s)

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
        for n in sorted(set(claim.values()), reverse=True):
            c = fft.interpolate(_z(4, 1 << (n + blow)), n + blow)
        fft.evaluate(_z(4, 1 << comp_log), comp_log).block_until_ready()

    thunks.append(warm_comp_fft)

    # --- OODS sampling matvecs (grouped by (trace log, point)) ------------
    sample_groups: Dict[int, List[int]] = {}
    for metas in layout.trees:
        for meta in metas:
            if not meta.shifts:
                continue
            g = sample_groups.setdefault(meta.log_size, [0, 0])
            g[0] += 1
            if 1 in meta.shifts:
                g[1] += 1

    def warm_sampling():
        from .core import poly

        for lg, (n_z, n_zg) in sorted(sample_groups.items(), reverse=True):
            basis = poly.secure_basis_at_point(lg, ((1, 0, 0, 0), (0, 0, 0, 0)))
            for cnt in {n_z, n_zg}:
                if cnt:
                    out = poly._dot_basis(_z(cnt, 1 << lg), basis)
        out.block_until_ready()

    thunks.append(warm_sampling)

    # --- FRI: fold shapes, layer-commit merkle shapes ---------------------
    used_sizes = sorted({m.log_size + blow
                         for metas in layout.trees for m in metas if m.shifts},
                        reverse=True)
    max_log = used_sizes[0]
    fold_sizes = set()
    for s in used_sizes:
        fold_sizes.add(s)          # circle fold of each injected input
    m = max_log - 1
    layer_levels = []
    while m > fri.LOG_LAST_LAYER:
        layer_levels.append(m)
        fold_sizes.add(m)
        m -= 1
        if m > fri.LOG_LAST_LAYER:
            fold_sizes.add(m)
            m -= 1
    for lvl in layer_levels:
        for s in _merkle_shapes({lvl: 4}):
            merkle_shapes.add(s)

    def warm_folds():
        for s in sorted(fold_sizes, reverse=True):
            out = fri._fold(_z(4, 1 << s), np.zeros(1 << (s - 1), np.uint32),
                            (1, 0, 0, 0))
        out.block_until_ready()

    thunks.append(warm_folds)

    for kind, n, x in sorted(merkle_shapes, reverse=True):

        def warm_merkle(kind=kind, n=n, x=x):
            if kind == "leaf":
                merkle._hash_leaf_jit(_z(x, n))[0].block_until_ready()
            elif kind == "level":
                merkle._hash_level_jit(_z(2 * n, 8), _z(x, n))[0].block_until_ready()
            else:
                merkle._cascade_jit(_z(n, 8), x)[-1].block_until_ready()

        thunks.append(warm_merkle)

    # --- quotient kernels per size ----------------------------------------
    cols_at_size: Dict[int, List[int]] = {}
    for metas in layout.trees:
        for meta in metas:
            if not meta.shifts:
                continue
            s = meta.log_size + blow
            g = cols_at_size.setdefault(s, [0, 0])
            g[0] += 1                      # every opened column is sampled at z
            if 1 in meta.shifts:
                g[1] += 1                  # prefix-sum columns also at z - g

    q_shapes = set()
    for s, (n_z, n_zg) in cols_at_size.items():
        for group_n in (n_z, n_zg):
            off = 0
            while off < group_n:
                q_shapes.add((min(quotients._COL_CHUNK, group_n - off), s))
                off += quotients._COL_CHUNK
        q_shapes.add(("pgq", s))

    for item in sorted(q_shapes, key=str):

        def warm_quot(item=item):
            if item[0] == "pgq":
                s = item[1]
                px = _z(1 << s)
                out = quotients._point_group_quotient(
                    _z(4, 1 << s), _z(4), _z(4), _z(4), _z(4),
                    jnp.ones(4, jnp.uint32), px, px)
            else:
                c, s = item
                # includes the eager per-chunk column stack
                out = quotients._weighted_columns(
                    jnp.stack([_z(1 << s)] * c), _z(c, 4))
            out.block_until_ready()

        thunks.append(warm_quot)

    # --- PoW batch --------------------------------------------------------
    def warm_pow():
        from .core import channel as ch

        if config.pow_bits > 13:
            ch._pow_batch(_z(8), jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))

    thunks.append(warm_pow)
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
