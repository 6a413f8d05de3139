"""Executable warm-up: AOT-load the prove pipeline's compiled programs.

Cold proving cost through the axon TPU relay is dominated by executable
DESERIALIZATION: with a hot persistent cache (jax_compilation_cache_dir),
every fresh process re-ships ~150 serialized executables through the relay
at ~1 MB/s (measured: 384 cache reads = 243 s of a 244 s serial warmup).

warmup(claim, config) enumerates every executable/shape the prove pipeline
will need for this claim and loads each one via jit .lower().compile() —
AOT-compiled executables share the jit dispatch cache with later real calls
when the lowered statics match the call's exactly (verified: a dispatch
after an AOT load performs zero extra cache reads; a 5-positional lower vs a
6-positional call recompiles), so nothing is executed and no zero-filled
operands are ever materialized. With the field ops' inline-jit trace caching
(core/m31.py), warmup is bound by the relay's executable-load bandwidth
(~125 MB of serialized executables); load RPCs complete asynchronously, so
the tail exec_root thunk doubles as a drain fence. Host-side numpy
precomputations (batch inverses, domain points, twiddles, permutations) run
on their own lane, overlapping the relay traffic.

STWO_BF_WARMUP_AOT=0 restores the execute-on-zeros warmup;
STWO_BF_WARMUP_WORKERS overrides the AOT pool width (default 1: with
tracing no longer the bottleneck the relay serializes loads, and fan-out
only adds contention — measured 204 s serial vs 306 s at 8 workers on a hot
cache).
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .core.rowref import RowRef

log = logging.getLogger("stwo_brainfuck_tpu")


def _zeros(*shape) -> jnp.ndarray:
    return jnp.zeros(shape, jnp.uint32)


def _sds(*shape) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


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


def warmup_thunks(claim: Dict[str, int], config, aot: bool = True) -> List:
    """Enumerate thunks covering the prove pipeline's executables for this
    claim; each distinct shape appears exactly once. Returns
    (name, key, thunk) triples where name-prefix "exec_" marks thunks that
    must run on real inputs (everything else AOT-loads without executing
    when aot=True). `key` is a hashable identity of the executable-shape
    signature, stable ACROSS claims: callers warming several claims in one
    process (bench.py's suite) pass a shared `seen` set to warmup() and pay
    each shared shape once."""
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
    thunks: List[Tuple[str, object]] = []
    _z = _sds if aot else _zeros

    def load(fn, *args, **kw):
        if aot:
            fn.lower(*args, **kw).compile()
        else:
            jax.block_until_ready(fn(*args, **kw))

    els = {k: LookupElements.dummy(s) for k, s in ELEMENT_SIZES.items()}
    els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
               for k, e in els.items()}

    # --- interaction kernels (one per interaction_key x size) -------------
    # main columns arrive as RowRefs into the per-component upload matrix
    # (rows 0..k-1 — identical aux for every member of an interaction_key
    # group, so the executables still dedupe)
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
            mat = _z(len(c.columns), 1 << n)
            main = {name: RowRef(mat, i) for i, name in enumerate(c.columns)}
            load(fn, main, els_dev, _device_perm(n))

        thunks.append(("inter", ("inter",) + key, warm_inter))

    # --- device table builder -----------------------------------------------
    # prove_brainfuck ships the padded trace + permutations in ONE upload;
    # the on-chip build of all 13 matrices is one executable keyed by the
    # claim (every input shape is claim-derived)
    def warm_table_build():
        from .components import device_build as D

        total = sum(int(np.prod(s)) for _, s in D._layout(claim))
        # positional statics: a keyword static arg keys a DIFFERENT jit
        # cache entry than the prove-time positional call
        load(D._build_tables_jit, _z(total), D.claim_key(claim))

    thunks.append(("table_build",
                   ("table_build", tuple(sorted(claim.items()))),
                   warm_table_build))

    # --- constraint / union kernels ---------------------------------------
    # RowRef row indices are static aux data in the jit key, so union-group
    # members with different start rows compile separately — dedup by
    # (group, size, start rows), exactly like the prove loop's cache keys.
    rec_rows = air.record_rows(layout)
    seen = set()
    t1 = 0
    t2 = 0
    for comp in layout.components:
        cls = type(comp)
        n = comp.log_size
        n_inter = comp.relation_count() + 1
        C1, r1 = rec_rows[1][t1]
        C2, r2 = rec_rows[2][t2]
        t1 += len(comp.columns)
        t2 += 4 * n_inter
        key = (getattr(cls, "union_group", None) or cls, n, r1, r2)
        if key in seen:
            continue
        seen.add(key)

        def warm_cons(comp=comp, n=n, C1=C1, r1=r1, C2=C2, r2=r2,
                      n_inter=n_inter):
            ne = 1 << (n + blow)
            mat1 = _z(C1, ne)
            mat2 = _z(C2, ne)
            # RowRef / coords-tuple / (coords, perm) pytree forms — must
            # match the prove loop exactly (jit keys on pytree structure)
            main = {name: RowRef(mat1, r1 + i)
                    for i, name in enumerate(comp.columns)}
            inter = [tuple(RowRef(mat2, r2 + 4 * k + c) for c in range(4))
                     for k in range(n_inter)]
            out, _ = composition_contribution(
                comp, main, inter, (inter[-1], _z(ne)), _z(ne), (0, 0, 0, 0),
                els, (1, 0, 0, 0), 0, _z(ne), aot=aot)
            if not aot:
                jax.block_until_ready(out)

        thunks.append(("cons", ("cons",) + key + (blow,), warm_cons))

    # --- FFT shapes (per tree size-group) + whole-tree merkle shapes ------
    # tree1's columns arrive as RowRefs into the per-component upload
    # matrices; tree2's as RowRefs into the (4, N) interaction outputs;
    # tree3's as RowRefs into the (4, N) composition evaluation — distinct
    # jit pytree signatures, reproduced via per-tree specs below.
    fft_shapes = set()       # fused extend: (trace log, member spec)
    tree_sigs = set()        # tree signatures (warm the shared level kernels)
    for ti, g in enumerate(_tree_groups(layout)):
        by_level = {}
        for lg, cnt in g.items():
            by_level[lg + blow] = cnt
        tree_sigs.add(tuple(sorted(by_level.items())))

    # Spec entries are (base_key, C, r): base_key tracks WHICH device matrix
    # each RowRef slices so warmup reproduces the prove's base-identity
    # grouping exactly — dedup_jit folds shared bases into one executable
    # parameter, so base sharing is part of the jit cache key now.
    # tree1: per size, columns from per-component built matrices
    by_size1: Dict[int, list] = {}
    for ci_comp, comp in enumerate(layout.components):
        k = len(comp.columns)
        by_size1.setdefault(comp.log_size, []).extend(
            (("c", ci_comp), k, i) for i in range(k))
    for lg, spec in by_size1.items():
        fft_shapes.add((lg, tuple(spec)))
    # tree2: per size, RowRefs into per-(component, relation) (4, N) outputs
    by_size2: Dict[int, list] = {}
    for ci_comp, comp in enumerate(layout.components):
        n_inter = comp.relation_count() + 1
        by_size2.setdefault(comp.log_size, []).extend(
            (("q", ci_comp, q), 4, c) for q in range(n_inter)
            for c in range(4))
    for lg, spec in by_size2.items():
        fft_shapes.add((lg, tuple(spec)))
    # tree3: the 4 coordinate rows of the one composition evaluation
    fft_shapes.add((layout.composition_log,
                    tuple((("t3",), 4, c) for c in range(4))))

    # tree0 (is_first ladder) uses the closed-form kernels, not CFFT —
    # AOT-load them per ladder size (coeffs, extension, level-matrix reshape)
    from .core.pcs import _row_mat_jit

    for lg in layout.ladder:

        def warm_is_first(lg=lg):
            load(fft._is_first_coeffs_jit, _z(lg), lg)
            ne = 1 << (lg + blow)
            load(fft._is_first_ext_jit, _z(ne), _z(ne), _z(lg), lg)
            load(_row_mat_jit, _z(ne))

        thunks.append(("is_first", ("is_first", lg, blow), warm_is_first))

    for lg, spec in sorted(fft_shapes):

        def warm_fft(lg=lg, spec=spec):
            mats = {}
            cols = tuple(RowRef(mats.setdefault(key, _z(C, 1 << lg)), r)
                         for key, C, r in spec)
            out = fft.extend_with_coeffs(cols, lg, blow, aot=aot)
            if not aot:
                jax.block_until_ready(out[1])

        thunks.append(("fft", ("fft", lg, spec, blow), warm_fft))

    # composition accumulation: interpolate (4, n+blow) per distinct size,
    # then one evaluate at comp_log
    comp_log = layout.composition_log
    comp_sizes_blown = sorted({n + blow for n in claim.values()})
    comp_counts: Dict[int, int] = {}
    for c in layout.components:
        lg = c.log_size + blow
        comp_counts[lg] = comp_counts.get(lg, 0) + 1

    def warm_comp_fft():
        coeffs_list = []
        for s in comp_sizes_blown:
            cnt = comp_counts[s]
            if aot:
                if cnt > 1:
                    air._acc_sum_jit.lower(
                        tuple(_sds(4, 1 << s) for _ in range(cnt))).compile()
                arr = _sds(4, 1 << s)
                if fft._use_pallas(s):
                    from .ops import fft_pallas

                    fft_pallas._transform_jit.lower(
                        arr, *fft_pallas._dev_tables(s, True), s, True,
                        False).compile()
                else:
                    fft._interpolate_jit.lower(
                        arr, fft._device_twiddles(s)[1], s).compile()
                coeffs_list.append(_sds(4, 1 << s))
            else:
                arr = (_zeros(4, 1 << s) if cnt == 1
                       else air._acc_sum_jit(tuple(_zeros(4, 1 << s)
                                                   for _ in range(cnt))))
                coeffs_list.append(fft.interpolate(arr, s))
        out = air._combine_eval(tuple(coeffs_list), comp_log, aot=aot)
        if not aot:
            jax.block_until_ready(out)

    thunks.append(("comp_fft",
                   ("comp_fft", tuple(comp_sizes_blown),
                    tuple(sorted(comp_counts.items())), comp_log),
                   warm_comp_fft))

    # --- OODS sampling tensor kernels (one per distinct group structure) --
    # members are RowRefs into the per-tree coeff matrices, except tree0's
    # direct ladder columns; ("a",) marks an array member in the spec
    sample_specs = set()
    for (lg, _s), members in air.sampling_plan(layout).items():
        spec = tuple(("a",) if ti == 0 else (ti,) + rec_rows[ti][ci]
                     for ti, ci, _pi in members)
        sample_specs.add((lg, spec))
    for lg, spec in sorted(sample_specs, key=repr):

        def warm_sampling(lg=lg, spec=spec):
            from .core import poly
            mats = {}
            rows = []
            for s in spec:
                if s == ("a",):
                    rows.append(_z(1 << lg))
                else:
                    ti, C, r = s  # base identity = the per-tree level matrix
                    mats.setdefault(ti, _z(C, 1 << lg))
                    rows.append(RowRef(mats[ti], r))
            lo = lg // 2
            load(poly._sample_tensor_jit, tuple(rows),
                 _z(4, 1 << lo), _z(4, 1 << (lg - lo)))

        thunks.append(("sampling", ("sampling", lg, spec), warm_sampling))

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
    fri_last_log = m  # cur's line log at loop exit (== m throughout)
    # FRI layer trees decommit witness-hash-only (include_values=False):
    # their gather executables differ from the 4 main trees'
    fri_sigs = {((lvl, 4),) for lvl in layer_levels}

    def warm_folds():
        one = _z(4)
        for s in sorted(fold_sizes, reverse=True):
            load(fri._fold_jit, _z(4, 1 << s), _z(1 << (s - 1)), one)
        for s in sorted(input_sizes, reverse=True):
            if s != max_log:  # fused circle-fold + accumulator add
                load(fri._fold_add_jit, _z(4, 1 << s), _z(1 << (s - 1)), one,
                     _z(4, 1 << (s - 1)))
        for s in sorted(fold2_sizes, reverse=True):
            load(fri._fold2_jit, _z(4, 1 << s), _z(1 << (s - 1)),
                 _z(1 << (s - 2)), one, one)
        # device-resident FRI transcript: the per-layer mix+draw step and
        # the last-layer value mix (the batched pull is warmed in "pulls")
        load(fri._mix_draw2_jit, _z(8), _z(8))
        from .core.devchan import _mix_chain_jit

        load(_mix_chain_jit, _z(8), (_z(4, 1 << fri_last_log),),
             (((0, 0),),))

    thunks.append(("folds",
                   ("folds", tuple(sorted(fold_sizes)),
                    tuple(sorted(input_sizes)), tuple(sorted(fold2_sizes)),
                    max_log, fri_last_log, tuple(layer_levels)),
                   warm_folds))

    # Simulated query set: n_queries distinct spread positions — for typical
    # query counts the padded gather shapes (pow2 buckets) match the real
    # random draw, so the decommit gather executables precompile too.
    from .core.pcs import query_positions_by_level

    step = max(1, (1 << max_log) // (2 * config.n_queries))
    fake_queries = sorted({(2 * i + 1) * step for i in range(config.n_queries)})

    # Per-kernel thunks FIRST (one per distinct level-hash shape, so the
    # pool loads them concurrently); the per-sig commit+decommit thunks after
    # them are then cache-hit dispatches that warm only the decommit gathers.
    kernel_steps = set()
    for sig in tree_sigs | fri_sigs:
        kernel_steps.update(merkle.level_plan(list(sig)))

    for step in sorted(kernel_steps):

        def warm_mk_kernel(step=step):
            kind, k = step[0], step[1]
            if kind == "leaf":
                load(merkle._leaf_hash_jit, _z(step[2], 1 << k))
            elif kind == "node":
                load(merkle._node_hash_jit, _z(1 << (k + 1), 8),
                     _z(step[2], 1 << k))
            else:
                load(merkle._chain_hash_jit, _z(1 << (k + 1), 8), step[2])

        thunks.append(("mk_kernel", ("mk_kernel", step), warm_mk_kernel))

    # Decommit gather executables, AOT-loaded from the shape enumeration
    # (the tree walk itself is pure cache-hit dispatches once the level
    # kernels are loaded — replacing the execute-on-zeros tree builds that
    # serialized ~54 s of gather loads behind the load lane)
    for sig, inc in (sorted((s, True) for s in tree_sigs)
                     + sorted((s, False) for s in fri_sigs)):
        levels = [k for k, _ in sig]
        if not query_positions_by_level(fake_queries, max_log, levels):
            continue  # deeper than any FRI input: never decommitted

        def warm_gather(sig=sig, inc=inc):
            mats, idxs, axes = merkle.gather_arg_shapes(
                sig, config.n_queries, include_values=inc)
            load(merkle._gather_rows_jit, tuple(mats), tuple(idxs),
                 axes=axes)

        thunks.append(("gather", ("gather", sig, inc, config.n_queries),
                       warm_gather))

    def warm_root_pull():
        # the root pull (layers[0][0] getitem + host transfer) is the one
        # eager op in commit(); its executables are shape-independent
        # ((1, 8) root layer) — warm the getitem directly (building even a
        # tiny real tree would introduce new leaf/chain kernel shapes, which
        # measured a 204 s one-time compile through the relay)
        np.asarray(_zeros(1, 8)[0])

    thunks.append(("exec_root", ("exec_root",), warm_root_pull))

    def warm_fri_decommit():
        # fri_decommit gathers every layer's values in one executable, with
        # per-layer decommits whose shapes are pinned by n_queries
        b = 1 << max(0, 4 * config.n_queries - 1).bit_length()
        mats = []
        idxs = []
        for lvl in layer_levels:
            positions = query_positions_by_level(fake_queries, max_log, [lvl])
            idx, _n = merkle._padded_idx(positions[lvl], min(1 << lvl, b))
            mats.append(_z(4, 1 << lvl))
            idxs.append(idx)
        load(fri._gather_vals_jit, tuple(mats), tuple(idxs))

    thunks.append(("fri_decommit",
                   ("fri_decommit", tuple(layer_levels), config.n_queries,
                    max_log),
                   warm_fri_decommit))

    # --- device-resident transcript (core/devchan.py) ---------------------
    # The specs are static per claim; shared with the prove path via
    # air.transcript_specs so the enumeration cannot drift.
    wspec, groups, _mp, mix_spec, qspec, _so, _ss = air.transcript_specs(layout)
    group_sizes = tuple(len(m) for m in groups.values())
    n_comps = len(layout.components)

    def warm_devchan():
        from .core.devchan import (
            _comp_weights_jit,
            _els_jit,
            _mix_chain_jit,
            _mix_root_jit,
            _oods_jit,
            _quot_consts_jit,
        )

        load(_mix_root_jit, _z(8), _z(1, 8))
        load(_els_jit, _z(8))
        load(_mix_chain_jit, _z(8), tuple(_z(4) for _ in range(n_comps)),
             tuple(((i, -1),) for i in range(n_comps)))
        load(_comp_weights_jit, _z(8), wspec, 0)
        load(_oods_jit, _z(8), tuple(groups.keys()))
        load(_mix_chain_jit, _z(8), tuple(_z(4, c) for c in group_sizes),
             mix_spec)
        load(_quot_consts_jit, _z(8), _z(4), _z(4),
             tuple(_z(4, c) for c in group_sizes), qspec)

    thunks.append(("devchan",
                   ("devchan", wspec, tuple(groups.keys()), group_sizes,
                    mix_spec, qspec, n_comps),
                   warm_devchan))

    # --- batched host-pull (flatten) signatures, exactly as the prove issues
    # them: sync A (phase roots + claimed sums + sampled groups + FRI
    # outputs + digest) and sync B (4-tree + FRI-layer decommitments + FRI
    # value gathers) -------------------------------------------------------
    tree_order = [tuple(sorted((lg + blow, c) for lg, c in g.items()))
                  for g in _tree_groups(layout)]

    def warm_pulls():
        from .utils import transfer

        nq = config.n_queries
        b = 1 << max(0, 4 * nq - 1).bit_length()
        futs = [_z(1, 8)] * 3
        futs += [_z(4) for _ in layout.components]
        futs += [_z(4, c) for c in group_sizes]
        futs += [_z(1, 8) for _ in layer_levels]
        futs += [_z(4, 1 << fri_last_log), _z(8)]
        load(transfer._flatten_jit, tuple(futs))
        futs = [_z(*s) for sig in tree_order
                for s in merkle.decommit_shapes(sig, nq)]
        futs += [_z(*s) for m in layer_levels
                 for s in merkle.decommit_shapes(((m, 4),), nq,
                                                 include_values=False)]
        futs += [_z(4, min(1 << m, b)) for m in layer_levels]
        load(transfer._flatten_jit, tuple(futs))

    thunks.append(("pulls",
                   ("pulls", tuple(tree_order), tuple(layer_levels),
                    len(layout.components), group_sizes, fri_last_log,
                    config.n_queries),
                   warm_pulls))

    # --- quotient kernels: one fused executable per size ------------------
    # mirror prove's claims_by_size walk exactly (group0 = every opened
    # column at z, group1 = the prefix-sum columns at z - g, in tree order);
    # columns are RowRefs into the per-tree ext matrices except tree0's
    size_members: Dict[int, list] = {}
    for ti, metas in enumerate(layout.trees):
        for ci, meta in enumerate(metas):
            if not meta.shifts:
                continue
            size_members.setdefault(meta.log_size + blow, []).append(
                (("a",) if ti == 0 else (ti,) + rec_rows[ti][ci],
                 meta.shifts))

    for s, members in sorted(size_members.items(), reverse=True):
        g0 = tuple(range(len(members)))
        g1 = tuple(i for i, (_sp, sh) in enumerate(members) if 1 in sh)
        idx_groups = (g0, g1) if g1 else (g0,)
        n_w = sum(len(g) for g in idx_groups)
        specs = tuple(sp for sp, _sh in members)

        def warm_quot(s=s, specs=specs, idx_groups=idx_groups, n_w=n_w):
            mats = {}
            cols = []
            for sp in specs:
                if sp == ("a",):
                    cols.append(_z(1 << s))
                else:
                    ti, C, r = sp  # base identity = the per-tree ext matrix
                    mats.setdefault(ti, _z(C, 1 << s))
                    cols.append(RowRef(mats[ti], r))
            load(quotients._accumulate_all_jit, tuple(cols),
                 jnp.ones((len(idx_groups), 5, 4), jnp.uint32),
                 _z(n_w, 4), _z(1 << s), _z(1 << s), idx_groups)

        thunks.append(("quot", ("quot", s, specs, idx_groups), warm_quot))

    # --- PoW batch --------------------------------------------------------
    def warm_pow():
        from .core import channel as ch

        if config.pow_bits > 13:
            load(ch._pow_batch, _z(8), jnp.uint32(0), jnp.uint32(0),
                 jnp.uint32(1))

    thunks.append(("pow", ("pow", config.pow_bits > 13), warm_pow))

    # --- host-side lru caches + their device copies ------------------------
    # Numpy precomputations (batch inverses, domain points, fold twiddle
    # inverses, rotation permutations) plus EVERY device constant the
    # pipeline needs (twiddle stacks, Pallas FFT tables, interaction
    # permutations) — all shipped in ONE upload RPC + one split dispatch.
    # Measured (2026-08-19): per-array jnp.asarray uploads cost a full relay
    # round trip EACH (~1 s under load); the ~300 constants dominated the
    # warmup wall (340 s of a 380 s warmup) while disk cache reads were
    # only 13 s. They run on a SEPARATE warmup lane: numpy releases the
    # GIL, so the host builds overlap the relay's executable loads.
    comp_sizes = sorted({c.log_size for c in layout.components})
    quot_sizes = sorted({m.log_size + blow
                         for metas in layout.trees for m in metas if m.shifts})
    tw_sizes = sorted({n for c in layout.components
                       for n in (c.log_size, c.log_size + blow)} | {comp_log})
    pallas_keys = []  # (size, inverse) of the fused-transform tables
    for lg in sorted({lg for lg, _spec in fft_shapes} | set(comp_sizes_blown)):
        if fft._use_pallas(lg):
            pallas_keys.append((lg, True))
        if fft._use_pallas(lg + blow):
            pallas_keys.append((lg + blow, False))
    if fft._use_pallas(comp_log):
        pallas_keys.append((comp_log, False))
    pallas_keys = sorted(set(pallas_keys))

    def host_caches():
        from .framework import component as fw
        from .ops import fft_pallas
        from .utils.transfer import upload_many

        arrays: List[np.ndarray] = []
        plan: List[tuple] = []

        def want(arrs, assign):
            plan.append((len(arrays), len(arrs), assign))
            arrays.extend(arrs)

        for n in tw_sizes:
            # sizes the fused Pallas transform handles never touch the
            # staged-XLA twiddle stacks on the prove path — uploading them
            # was ~33 MB of dead constants on TPU
            if n in fft._DEV_TW_CACHE or fft._use_pallas(n):
                continue
            t = fft.get_twiddles(n)
            k = len(t.fwd)
            want(list(t.fwd) + list(t.inv),
                 lambda devs, n=n, k=k: fft._DEV_TW_CACHE.setdefault(
                     n, (tuple(devs[:k]), tuple(devs[k:]))))
        for key in pallas_keys:
            if key in fft_pallas._DEV_TABLES:
                continue
            # compact pieces only: the (A1, 7, A2, 128) lane table (7x the
            # transform bytes) is expanded on device by set_dev_tables
            want(list(fft_pallas._row_tables(*key))
                 + fft_pallas.lane_stage_hosts(*key),
                 lambda devs, key=key: fft_pallas.set_dev_tables(
                     *key, devs[0], devs[1], devs[2:]))
        for n in comp_sizes:
            if (n, blow, 1) not in air._DEV_ROT:
                want([air.rotation_permutation(n, blow, 1)],
                     lambda devs, k=(n, blow, 1):
                     air._DEV_ROT.setdefault(k, devs[0]))
            if (n, n + blow) not in air._DEV_VINV:
                want([air._vanishing_inv(n, n + blow)],
                     lambda devs, k=(n, n + blow):
                     air._DEV_VINV.setdefault(k, devs[0]))
            if n not in fw._DEV_PERM_CACHE:
                want([fft.coset_order_permutation(n)],
                     lambda devs, n=n:
                     fw._DEV_PERM_CACHE.setdefault(n, devs[0]))
        for s in quot_sizes:
            if s not in quotients._DEV_POINTS:
                xs, ys = quotients.domain_points_storage(s)
                want([xs, ys],
                     lambda devs, s=s:
                     quotients._DEV_POINTS.setdefault(s, tuple(devs)))
        itw_keys = [("c", s) for s in sorted(input_sizes, reverse=True)]
        itw_keys += [("l", m_)
                     for m_ in range(max_log - 1, fri.LOG_LAST_LAYER, -1)]
        for kind, s in itw_keys:
            if (kind, s) in fri._DEV_ITW:
                continue
            host = fri._circle_fold_itw(s) if kind == "c" else fri._line_fold_itw(s)
            want([host],
                 lambda devs, k=(kind, s): fri._DEV_ITW.setdefault(k, devs[0]))

        devs = upload_many(arrays)
        for start, cnt, assign in plan:
            assign(devs[start:start + cnt])

    thunks.append(("host_caches",
                   ("host_caches", tuple(sorted(claim.items())), blow),
                   host_caches))
    # Longest loads first (minimizes the pool makespan): the constraint
    # unions, quotient and sampling programs dominate deserialize time; the
    # executing thunks (merkle walks) come after the kernels they reuse.
    prio = {"cons": 0, "quot": 1, "sampling": 2, "inter": 3, "fft": 4,
            "mk_kernel": 5, "gather": 6, "comp_fft": 7, "folds": 8,
            "fri_decommit": 9, "pulls": 10, "is_first": 11, "devchan": 12,
            "pow": 13, "exec_root": 14, "host_caches": 15}
    thunks.sort(key=lambda t: prio.get(t[0], 16))
    return thunks


def ghost_tables(claim: Dict[str, int]) -> Dict[str, Dict[str, np.ndarray]]:
    """Zero tables with the exact column names and sizes of a claim — the
    pipeline's executables/shapes/shardings depend only on (claim, config),
    never on table contents."""
    from .components.defs import COMPONENT_CLASSES

    tabs: Dict[str, Dict[str, np.ndarray]] = {}
    for cls in COMPONENT_CLASSES:
        if cls.name not in claim:
            continue
        comp = cls(claim[cls.name])
        tabs[cls.name] = {c: np.zeros(1 << comp.log_size, np.uint32)
                          for c in comp.columns}
    return tabs


def ghost_prove(claim: Dict[str, int], config, mesh=None) -> None:
    """Warm by running the COMPLETE prove pipeline on zero tables (the LogUp
    balance check is skipped; everything else — transcript, commitments,
    composition, quotients, FRI, PoW, decommitment — runs for real). Every
    executable, pytree structure, and output sharding is then byte-exactly
    the one a real prove of this claim dispatches.

    This is the MESH warmup: under a mesh the executables are shard_map
    wrappers whose input/output shardings chain through the pipeline, so
    AOT-enumerating them per signature would duplicate the pipeline; one
    ghost prove covers them all (tests/test_warmup.py pins zero residual
    compiles). Single-chip warmup keeps the AOT enumeration (loading without
    executing is what the TPU-relay cold path needs)."""
    from . import air

    air._prove_tables(ghost_tables(claim), config, mesh=mesh, ghost=True)


def warmup(claim: Dict[str, int], config, max_workers: int | None = None,
           mesh=None, seen: set | None = None) -> int:
    """Precompile/preload the pipeline's executables. Returns the number of
    warm thunks executed. Safe to skip — missing shapes simply compile
    inline during the prove.

    seen: optional set of thunk keys already warmed in this process; thunks
    whose keys are present are skipped and executed keys are added (bench.py
    warms the suite's UNION of claims this way instead of re-paying shared
    shapes per program).

    Default mode AOT-loads executables serially (the relay serializes load
    RPCs; fan-out only adds contention — see module docstring) without
    executing them; STWO_BF_WARMUP_AOT=0 restores the execute-on-zeros
    warmup."""
    import os
    import time

    if mesh is not None:
        t0 = time.time()
        ghost_prove(claim, config, mesh=mesh)
        log.info("mesh warmup (ghost prove) in %.1f s", time.time() - t0)
        return 1

    aot = os.environ.get("STWO_BF_WARMUP_AOT", "1") != "0"
    if max_workers is None:
        max_workers = 1
    max_workers = int(os.environ.get("STWO_BF_WARMUP_WORKERS", max_workers))

    thunks = warmup_thunks(claim, config, aot=aot)
    if seen is not None:
        thunks = [t for t in thunks if t[1] not in seen]
        seen.update(t[1] for t in thunks)
    t0 = time.time()
    errors = []
    times: List[tuple] = []

    # Per-family instrumentation (VERDICT r4 item 1): attribute every
    # persistent-cache READ (executable deserialize) and real COMPILE to the
    # thunk family that triggered it, so the warmup breakdown in the bench
    # stderr shows WHERE a fresh process pays — loads vs compiles vs the
    # constant-upload lane.
    import threading

    tl = threading.local()
    fam_stats: Dict[str, list] = {}  # family -> [n, secs, reads, compiles]
    try:
        import jax._src.compiler as _jc

        _orig_read = _jc._cache_read
        _orig_compile = _jc._compile_and_write_cache

        def _patched_read(*a, **k):
            fam = getattr(tl, "family", "?")
            fam_stats.setdefault(fam, [0, 0.0, 0, 0])[2] += 1
            return _orig_read(*a, **k)

        def _patched_compile(*a, **k):
            fam = getattr(tl, "family", "?")
            fam_stats.setdefault(fam, [0, 0.0, 0, 0])[3] += 1
            return _orig_compile(*a, **k)

        _jc._cache_read = _patched_read
        _jc._compile_and_write_cache = _patched_compile
        _patched = True
    except Exception:  # pragma: no cover - jax internals moved
        _patched = False

    def run(name, t):
        ts = time.time()
        tl.family = name
        try:
            t()
        except Exception as exc:  # noqa: BLE001 - collected and reported
            errors.append(exc)
        finally:
            dt = time.time() - ts
            times.append((dt, name))
            st = fam_stats.setdefault(name, [0, 0.0, 0, 0])
            st[0] += 1
            st[1] += dt

    host = [(n, t) for n, _k, t in thunks if n == "host_caches"]
    execs = [(n, t) for n, _k, t in thunks if n.startswith("exec_")]
    loads = [(n, t) for n, _k, t in thunks
             if n != "host_caches" and not n.startswith("exec_")]

    def run_lane(lane):
        for n, t in lane:
            run(n, t)

    # host-cache lane (pure numpy, GIL-releasing) overlaps the load lane
    with ThreadPoolExecutor(max_workers=max_workers + 1) as pool:
        hf = pool.submit(run_lane, host)
        if aot and max_workers > 1:
            futs = [pool.submit(run, n, t) for n, t in loads]
            for f in futs:
                f.result()
        else:
            run_lane(loads)
        hf.result()
    # executing thunks last: their kernel dispatches are now cache hits
    run_lane(execs)

    if _patched:
        _jc._cache_read = _orig_read
        _jc._compile_and_write_cache = _orig_compile

    if errors:
        log.warning("warmup: %d/%d thunks failed (first: %r)",
                    len(errors), len(thunks), errors[0])
    if log.isEnabledFor(logging.DEBUG):
        for dt, name in sorted(times, reverse=True)[:40]:
            log.debug("  warmup %-18s %6.1f s", name, dt)
    # family breakdown (always at INFO — the driver bench stderr must show
    # where a fresh process pays: cache loads vs real compiles)
    for fam, (n, secs, reads, compiles) in sorted(
            fam_stats.items(), key=lambda kv: -kv[1][1]):
        if n:
            log.info("  warmup %-12s %3d thunks %6.1f s  "
                     "%3d cache loads  %3d compiles", fam, n, secs,
                     reads, compiles)
    total_reads = sum(s[2] for s in fam_stats.values())
    total_compiles = sum(s[3] for s in fam_stats.values())
    log.info("warmup: %d thunks in %.1f s (aot=%s, %d cache loads, "
             "%d compiles)", len(thunks), time.time() - t0, aot,
             total_reads, total_compiles)
    return len(thunks)
