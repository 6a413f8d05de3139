"""Constraint framework: components, constraint evaluation, LogUp.

TPU-native equivalent of stwo's ``constraint_framework``
(FrameworkComponent/FrameworkEval/EvalAtRow/LogupTraceGenerator, used by all
13 AIR components, e.g.
crates/brainfuck_prover/src/components/memory/component.rs:35-137).

Design differences from stwo (self-consistent, documented):

- Main-trace columns use the reference's "flattened next row" layout, so no
  mask offsets are needed on main columns.
- LogUp layout: for each relation entry k the prover commits a QM31 fraction
  column Q_k = num_k / den_k (constraint: Q_k * den_k - num_k = 0, degree 2),
  plus ONE QM31 prefix-sum column S per component with the cyclic constraint
      S(p) - S(p - g) - sum_k Q_k(p) + is_first(p) * claimed_sum = 0
  which simultaneously enforces the accumulation and S(last) = claimed_sum.
  (stwo instead folds fractions into cumulative columns of higher degree;
  the fraction-column form keeps every constraint at degree <= 3, so a
  single 2x blowup covers the whole system — better for TPU tiling.)
- The only mask offset in the system is S at -1, realized on the prover side
  as a precomputed index permutation of the blown-up evaluation (rotation by
  -g is a permutation of the blowup domain) and on the verifier side as one
  extra sample point z - g.

A component subclass defines `columns` (main trace names) and
`define_constraints(e)` using the evaluator API; the same definition drives
prover-side vectorized evaluation, verifier-side point evaluation, interaction
trace building, and constraint count bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import m31, qm31
from ..core.fft import coset_order_permutation
from ..core.m31 import P_INT
from ..core.rowref import as_row, dedup_jit


# ---------------------------------------------------------------------------
# Lookup elements (drawn from the channel): z and alpha powers
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LookupElements:
    """Combine values as sum_i alpha^i * v_i - z
    (reference: memory/table.rs:443-465)."""

    z: tuple
    alpha: tuple
    size: int

    @staticmethod
    def draw(channel, size: int) -> "LookupElements":
        z = channel.draw_felt()
        alpha = channel.draw_felt()
        return LookupElements(z=z, alpha=alpha, size=size)

    @staticmethod
    def dummy(size: int) -> "LookupElements":
        # z has a nonzero imaginary coordinate so that combine() of
        # M31-valued rows with real alpha powers can never hit zero.
        return LookupElements(z=(7, 1, 0, 0), alpha=(3, 0, 0, 0), size=size)

    @property
    def alpha_powers(self) -> List[tuple]:
        powers = [qm31.ONE]
        for _ in range(self.size - 1):
            powers.append(qm31.h_mul(powers[-1], self.alpha))
        return powers

    def device(self) -> Dict[str, np.ndarray]:
        """Traced-argument form for jitted device code (values as arrays so
        per-proof randomness does not bake into compiled executables)."""
        return {
            "alpha_powers": np.array(self.alpha_powers, np.uint32),
            "z": np.array(self.z, np.uint32),
        }

    # host combine (python QM31 tuples or ints)
    def combine_host(self, values: Sequence) -> tuple:
        acc = qm31.ZERO
        for a, v in zip(self.alpha_powers, values):
            vq = (v % P_INT, 0, 0, 0) if isinstance(v, int) else v
            acc = qm31.h_add(acc, qm31.h_mul(a, vq))
        return qm31.h_sub(acc, self.z)



# ---------------------------------------------------------------------------
# Expression values: device arrays (QM31 stacked) or host QM31 tuples
# ---------------------------------------------------------------------------

class Expr:
    """Lightweight wrapper so constraint definitions read algebraically.

    Host mode wraps QM31 tuples. Device mode tracks the field kind: main
    trace columns stay M31 arrays (shape (N,)) and only promote to QM31
    (shape (4, N)) when combined with extension-field values — base-field
    constraints are ~10x cheaper on the VPU (and compile ~10x faster)."""

    __slots__ = ("v", "host", "qm")

    def __init__(self, v, host: bool, qm: bool = True):
        self.v = v
        self.host = host
        self.qm = qm

    def _lift(self, other) -> "Expr":
        if isinstance(other, Expr):
            return other
        if isinstance(other, int):
            if self.host:
                return Expr((other % P_INT, 0, 0, 0), True)
            return Expr(jnp.uint32(other % P_INT), False, qm=False)
        raise TypeError(type(other))

    def _qm(self) -> "Expr":
        if self.qm:
            return self
        return Expr(qm31.from_m31(jnp.atleast_1d(self.v)), False, True)

    def __add__(self, other):
        o = self._lift(other)
        if self.host:
            return Expr(qm31.h_add(self.v, o.v), True)
        if self.qm or o.qm:
            return Expr(qm31.add(self._qm().v, o._qm().v), False, True)
        return Expr(m31.add(self.v, o.v), False, False)

    def __sub__(self, other):
        o = self._lift(other)
        if self.host:
            return Expr(qm31.h_sub(self.v, o.v), True)
        if self.qm or o.qm:
            return Expr(qm31.sub(self._qm().v, o._qm().v), False, True)
        return Expr(m31.add(self.v, m31.neg(o.v)), False, False)

    def __rsub__(self, other):
        return self._lift(other).__sub__(self)

    def __mul__(self, other):
        o = self._lift(other)
        if self.host:
            return Expr(qm31.h_mul(self.v, o.v), True)
        if self.qm or o.qm:
            return Expr(qm31.mul(self._qm().v, o._qm().v), False, True)
        return Expr(m31.mul(self.v, o.v), False, False)

    __radd__ = __add__
    __rmul__ = __mul__

    def __neg__(self):
        if self.host:
            return Expr(qm31.h_neg(self.v), True)
        return Expr(m31.neg(self.v), False, self.qm)


# ---------------------------------------------------------------------------
# Relation entries and component base
# ---------------------------------------------------------------------------

@dataclass
class RelationEntry:
    elements_name: str      # which LookupElements set ("memory"/"instruction"/"processor")
    numerator: "Expr"       # signed multiplicity (e.g. d - 1, 1 - d, -1)
    values: List["Expr"]    # combined values


class Evaluator:
    """Collects constraints while a component's define_constraints runs.

    Modes:
    - device: columns are M31 arrays on the (blown-up) evaluation domain;
      interaction columns are QM31 arrays; results are QM31 arrays.
    - host (point): columns are sampled QM31 values at the OODS point.
    """

    def __init__(
        self,
        component: "Component",
        main: Dict[str, object],
        interaction: List[object],
        interaction_prev_sum: object,
        is_first: object,
        claimed_sum: object,
        elements: Dict[str, LookupElements],
        host: bool,
    ):
        self.component = component
        self._main = main
        self._interaction = interaction
        self._prev_sum = interaction_prev_sum
        self._is_first = is_first
        self._claimed_sum = claimed_sum
        self._elements = elements
        self.host = host
        self.constraints: List[Expr] = []
        self.relations: List[RelationEntry] = []

    # -- component API -----------------------------------------------------

    def col(self, name: str) -> Expr:
        v = self._main[name]
        if self.host:
            return Expr(v, True)
        return Expr(v, False, qm=False)

    def is_first(self) -> Expr:
        v = self._is_first
        if self.host:
            return Expr(v, True)
        return Expr(v, False, qm=False)

    def add(self, expr: Expr) -> None:
        self.constraints.append(expr)

    def relation(self, elements_name: str, numerator: Expr, values: List[Expr]) -> None:
        self.relations.append(RelationEntry(elements_name, numerator, values))

    # -- framework: turn relations into interaction constraints -------------

    def finalize_logup(self) -> None:
        """Append the LogUp constraints:
        per entry k: Q_k * den_k - num_k = 0;
        cumsum: S - S_prev - sum(Q_k) + is_first * claimed_sum = 0."""
        n = len(self.relations)
        assert len(self._interaction) == n + 1, (len(self._interaction), n)
        q_sum: Optional[Expr] = None
        for k, rel in enumerate(self.relations):
            els = self._elements[rel.elements_name]
            if self.host:
                den = Expr(els.combine_host([v.v for v in rel.values]), True)
            else:
                # device mode: els is {"alpha_powers": (K,4), "z": (4,)}
                # (traced arrays); values are M31 columns
                den = Expr(_device_combine(els, [v.v for v in rel.values]), False)
            q_k = Expr(self._interaction[k], self.host)
            self.add(q_k * den - rel.numerator)
            q_sum = q_k if q_sum is None else q_sum + q_k
        s = Expr(self._interaction[n], self.host)
        s_prev = Expr(self._prev_sum, self.host)
        claimed = Expr(self._claimed_sum, self.host)
        self.add(s - s_prev - q_sum + self.is_first() * claimed)


class Component:
    """Base class for AIR components."""

    name: str = "component"
    columns: Tuple[str, ...] = ()

    def __init__(self, log_size: int):
        self.log_size = log_size

    # subclasses override
    def define_constraints(self, e: Evaluator) -> None:
        raise NotImplementedError

    # -- bookkeeping --------------------------------------------------------

    @property
    def n_main_columns(self) -> int:
        return len(self.columns)

    # (class, log_size) -> (n_relations, n_constraints). The counts are
    # structural, but verify_brainfuck rebuilds the layout per call and the
    # dry-run evaluator costs ~0.4 ms per component — ~10 ms of a ~60 ms
    # verify before this cache.
    _count_cache: Dict[tuple, Tuple[int, int]] = {}

    def _counts(self) -> Tuple[int, int]:
        key = (type(self), self.log_size)
        c = Component._count_cache.get(key)
        if c is None:
            e = self._dry_run()
            c = (len(e.relations), len(e.constraints))
            Component._count_cache[key] = c
        return c

    def relation_count(self) -> int:
        """Number of LogUp relation entries (dry run with dummies)."""
        return self._counts()[0]

    def constraint_count(self) -> int:
        return self._counts()[1]

    @property
    def n_interaction_columns(self) -> int:
        """QM31 interaction columns: one fraction column per relation entry
        plus the prefix sum."""
        return self.relation_count() + 1

    def _dry_run(self) -> Evaluator:
        main = {c: qm31.ZERO for c in self.columns}
        n_rel = getattr(self, "_cached_n_rel", None)
        if n_rel is None:
            # first pass: count relations with a permissive evaluator
            probe = _CountingEvaluator(self)
            self.define_constraints(probe)
            n_rel = len(probe.relations)
            self._cached_n_rel = n_rel
        inter = [qm31.ZERO] * (n_rel + 1)
        e = Evaluator(
            self, main, inter, qm31.ZERO, qm31.ZERO, qm31.ZERO,
            _dummy_elements(), host=True,
        )
        self.define_constraints(e)
        return e


class _CountingEvaluator(Evaluator):
    def __init__(self, component):
        super().__init__(component, {c: qm31.ZERO for c in component.columns},
                         [], qm31.ZERO, qm31.ZERO, qm31.ZERO, _dummy_elements(), host=True)

    def finalize_logup(self) -> None:  # tolerate missing interaction columns
        pass


@lru_cache(maxsize=1)
def _dummy_elements() -> Dict[str, LookupElements]:
    return {
        "memory": LookupElements.dummy(3),
        "instruction": LookupElements.dummy(3),
        "processor": LookupElements.dummy(7),
    }


# ---------------------------------------------------------------------------
# Interaction trace building (prover, device)
# ---------------------------------------------------------------------------

def _device_combine(els_dev, values: List[jnp.ndarray]) -> jnp.ndarray:
    """sum alpha^i * v_i - z with traced element arrays; values are M31."""
    coeffs = els_dev["alpha_powers"]
    acc = None
    for a_idx, v in enumerate(values):
        c = jnp.reshape(coeffs[a_idx], (4,) + (1,) * v.ndim)
        term = m31.mul(c, v[None])
        acc = term if acc is None else qm31.add(acc, term)
    z = jnp.reshape(els_dev["z"], (4,) + (1,) * (acc.ndim - 1))
    return qm31.sub(acc, z)


_INTERACTION_CACHE: dict = {}  # bounded by (interaction structure, size) pairs


def _interaction_fn(cls, log_size: int):
    """Jitted interaction-trace builder, cached per (interaction_key, size):
    components whose relation structure is identical (the 6 opcode components;
    the 2 jump components) share ONE compiled executable — the relation only
    reads columns, never the per-opcode constants, so the traced program is
    the same. Cuts the per-proof executable count (compile latency is the
    dominant cold cost through the TPU relay)."""
    key = (getattr(cls, "interaction_key", cls), log_size)
    cached = _INTERACTION_CACHE.get(key)
    if cached is not None:
        return cached
    fn = _build_interaction_fn(cls, log_size)
    _INTERACTION_CACHE[key] = fn
    return fn


def _build_interaction_fn(cls, log_size: int):
    """The linear-order permutation is a traced argument (constants of this
    size trigger slow XLA constant folding)."""
    comp = cls(log_size)

    @dedup_jit
    def fn(main_cols: Dict[str, jnp.ndarray], elements_dev: Dict[str, dict],
           perm: jnp.ndarray):
        main_cols = {k: as_row(v) for k, v in main_cols.items()}
        n = 1 << log_size
        is_first = jnp.zeros(n, jnp.uint32).at[0].set(1)
        ev = Evaluator(comp, main_cols, [], None, is_first, None,
                       elements_dev, host=False)
        ev.finalize_logup = lambda: None  # type: ignore[method-assign]
        comp.define_constraints(ev)

        q_cols: List[jnp.ndarray] = []
        total = None
        for rel in ev.relations:
            den = _device_combine(elements_dev[rel.elements_name],
                                  [v.v for v in rel.values])
            q = qm31.mul(rel.numerator._qm().v, qm31.inv(den))
            q_cols.append(q)
            total = q if total is None else qm31.add(total, q)

        # prefix sum in coset LINEAR order (where p - g is the previous
        # point), scattered back to bit-reversed storage
        lin = jnp.take(total, perm, axis=1)
        s_lin = _qm31_cumsum(lin)
        s = jnp.zeros_like(s_lin).at[:, perm].set(s_lin)
        return q_cols, s, s_lin[:, -1]

    return fn


_DEV_PERM_CACHE: dict = {}  # keyed by log_size <= 28: naturally bounded


def _device_perm(log_size: int) -> jnp.ndarray:
    if log_size not in _DEV_PERM_CACHE:
        _DEV_PERM_CACHE[log_size] = jnp.asarray(coset_order_permutation(log_size))
    return _DEV_PERM_CACHE[log_size]


def build_interaction_trace_async(
    component: Component,
    main_cols: Dict[str, jnp.ndarray],
    elements: Dict[str, LookupElements],
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Like build_interaction_trace but returns the claimed sum as a DEVICE
    array so callers can batch the host pulls across components."""
    fn = _interaction_fn(type(component), component.log_size)
    if elements and isinstance(next(iter(elements.values())), LookupElements):
        els_dev = {k: e.device() for k, e in elements.items()}
    else:
        els_dev = elements  # already-device dicts (devchan._els_jit)
    q_cols, s, claimed = fn(main_cols, els_dev, _device_perm(component.log_size))
    return list(q_cols) + [s], claimed


def build_interaction_trace(
    component: Component,
    main_cols: Dict[str, jnp.ndarray],
    elements: Dict[str, LookupElements],
) -> Tuple[List[jnp.ndarray], tuple]:
    """Compute the component's interaction columns on the TRACE domain.

    Returns ([(4, N) QM31 arrays: Q_0..Q_{K-1}, S], claimed_sum host tuple)."""
    cols, claimed = build_interaction_trace_async(component, main_cols, elements)
    return cols, tuple(int(v) for v in np.asarray(claimed))


_UNION_CACHE: dict = {}


def _normalize_inter(main_cols, interaction_cols, s_prev):
    """Accept main columns as arrays OR RowRefs (deferred group-matrix rows,
    sliced in-executable), interaction columns as (4, N) arrays OR 4-tuples
    of (N,) coords/RowRefs (stacked in-executable), and s_prev as a (4, N)
    array OR a (coords-4-tuple, permutation) pair rotated in-executable.
    Keeping the slice/stack/rotation inside the jit removes the eager
    per-component slice/stack/take dispatches from the composition loop —
    each eager op is a separate executable + TPU-relay round trip cold."""
    main_cols = {k: as_row(v) for k, v in main_cols.items()}

    def col(c):
        if isinstance(c, tuple):
            return jnp.stack([as_row(x) for x in c])
        return as_row(c)

    interaction_cols = [col(c) for c in interaction_cols]
    if isinstance(s_prev, tuple):
        coords, perm = s_prev
        s_prev = jnp.take(jnp.stack([as_row(x) for x in coords]), perm, axis=1)
    return main_cols, interaction_cols, as_row(s_prev)


def _union_constraints_fn(cls, log_size: int):
    """One executable for a whole UNION GROUP of components (the 6 opcode
    components / the 2 jump components): the union of every member's
    constraints is evaluated once, per-member constants enter as traced
    scalars, and the member's alpha-power weights zero the slots it does not
    use. Numerically identical to the per-member executable (a zero-weighted
    slot contributes nothing), but one compile instead of six."""
    key = (cls.union_group, log_size)
    cached = _UNION_CACHE.get(key)
    if cached is not None:
        return cached
    comp = cls(log_size)  # representative: define_union_constraints lives on
    # the shared base class and reads only traced params, never subclass attrs

    @dedup_jit
    def fn(main_cols, interaction_cols, s_prev, is_first, claimed_sum,
           elements_dev, slot_weights, v_inv, params):
        main_cols, interaction_cols, s_prev = _normalize_inter(
            main_cols, interaction_cols, s_prev)
        claimed = jnp.reshape(claimed_sum, (4, 1))
        ev = Evaluator(comp, main_cols, interaction_cols, s_prev, is_first,
                       claimed, elements_dev, host=False)
        p_expr = {k: Expr(v, False, qm=False) for k, v in params.items()}
        comp.define_union_constraints(ev, p_expr)
        acc = None
        for i, c in enumerate(ev.constraints):
            aw = jnp.reshape(slot_weights[i], (4, 1))
            if c.qm:
                term = qm31.mul(aw, c.v)
            else:
                term = m31.mul(aw, c.v[None])
            acc = term if acc is None else qm31.add(acc, term)
        return qm31.mul_m31(acc, v_inv)

    n_slots = len(_union_dry_run(cls, log_size))
    _UNION_CACHE[key] = (fn, n_slots)
    return fn, n_slots


def _union_dry_run(cls, log_size: int):
    comp = cls(log_size)
    n_rel = comp.relation_count()
    inter = [qm31.ZERO] * (n_rel + 1)
    e = Evaluator(comp, {c: qm31.ZERO for c in comp.columns}, inter,
                  qm31.ZERO, qm31.ZERO, qm31.ZERO, _dummy_elements(), host=True)
    comp.define_union_constraints(
        e, {k: Expr((0, 0, 0, 0), True) for k in comp.union_params()})
    return e.constraints


@lru_cache(maxsize=128)
def _constraints_fn(cls, log_size: int):
    """Jitted constraint evaluator for one component class/size; also applies
    the alpha-power weighting and vanishing division so the whole composition
    contribution is one fused executable."""
    comp = cls(log_size)

    @dedup_jit
    def fn(main_cols, interaction_cols, s_prev, is_first, claimed_sum,
           elements_dev, alpha_powers, v_inv):
        main_cols, interaction_cols, s_prev = _normalize_inter(
            main_cols, interaction_cols, s_prev)
        claimed = jnp.reshape(claimed_sum, (4, 1))
        ev = Evaluator(comp, main_cols, interaction_cols, s_prev, is_first,
                       claimed, elements_dev, host=False)
        comp.define_constraints(ev)
        acc = None
        for i, c in enumerate(ev.constraints):
            aw = jnp.reshape(alpha_powers[i], (4, 1))
            if c.qm:
                term = qm31.mul(aw, c.v)
            else:
                # M31-valued constraint: QM31 weight * M31 value = 4 muls
                term = m31.mul(aw, c.v[None])
            acc = term if acc is None else qm31.add(acc, term)
        return qm31.mul_m31(acc, v_inv)

    return fn, comp.constraint_count()


def evaluate_constraints_device(
    component: Component,
    main_cols: Dict[str, jnp.ndarray],
    interaction_cols: List[jnp.ndarray],
    s_prev: jnp.ndarray,
    is_first: jnp.ndarray,
    claimed_sum: tuple,
    elements: Dict[str, LookupElements],
) -> List[jnp.ndarray]:
    """Evaluate every constraint of `component` pointwise over arrays
    (testing path — unweighted, one output per constraint).

    main_cols: M31 arrays; interaction_cols: QM31 (4, N) arrays
    [Q_0..Q_{K-1}, S]; s_prev: rotated S (value of S at p - g);
    is_first: M31 indicator array."""
    claimed = jnp.reshape(jnp.asarray(np.array(claimed_sum, np.uint32)), (4, 1))
    els_dev = {k: (e.device() if isinstance(e, LookupElements) else e)
               for k, e in elements.items()}
    ev = Evaluator(
        component, main_cols, interaction_cols, s_prev, is_first, claimed,
        els_dev, host=False,
    )
    component.define_constraints(ev)
    return [c.v for c in ev.constraints]


def weight_spec(component: Component, alpha_offset: int) -> tuple:
    """Static weight-construction spec for one component's composition
    contribution — the device channel (core/devchan._comp_weights_jit)
    builds the weight matrices from a drawn alpha with these entries:
    ("dense", offset, n_cons) or ("union", offset, layout, n_slots)."""
    cls = type(component)
    if getattr(cls, "union_group", None):
        _fn, n_slots = _union_constraints_fn(cls, component.log_size)
        return ("union", alpha_offset, tuple(component.union_layout()),
                n_slots)
    return ("dense", alpha_offset, component.constraint_count())


def composition_contribution(
    component: Component,
    main_cols: Dict[str, jnp.ndarray],
    interaction_cols: List[jnp.ndarray],
    s_prev: jnp.ndarray,
    is_first: jnp.ndarray,
    claimed_sum,
    elements: Dict[str, LookupElements],
    alpha,
    alpha_offset: int,
    v_inv: jnp.ndarray,
    aot: bool = False,
    weights: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, int]:
    """Sum_i alpha^(offset+i) * C_i / V over the evaluation domain (fused,
    jitted per component class/size/shape — or per UNION GROUP/size for
    components declaring union_group). Returns (QM31 array, next
    alpha offset).

    Device-channel mode: claimed_sum may be a device (4,) array, elements
    may already be device dicts, and `weights` may carry the device-built
    weight matrix (devchan._comp_weights_jit) — alpha is then unused. All
    operand shapes match the host forms, so the constraint executables are
    identical either way.

    aot=True (warmup): array args may be ShapeDtypeStructs — the executable
    is loaded via .lower().compile() (sharing the jit cache with later real
    dispatches) without executing anything; returns (None, next offset)."""
    cls = type(component)
    if elements and isinstance(next(iter(elements.values())), LookupElements):
        els_dev = {k: e.device() for k, e in elements.items()}
    else:
        els_dev = elements
    claimed_dev = (claimed_sum if not isinstance(claimed_sum, tuple)
                   else jnp.asarray(np.array(claimed_sum, np.uint32)))
    if getattr(cls, "union_group", None):
        fn, n_slots = _union_constraints_fn(cls, component.log_size)
        n_cons = component.constraint_count()
        if weights is None:
            w = np.zeros((n_slots, 4), np.uint32)
            for local, slot in enumerate(component.union_layout()):
                w[slot] = qm31.h_pow(alpha, alpha_offset + local)
            weights = jnp.asarray(w)
        params = {k: jnp.uint32(v % P_INT)
                  for k, v in component.union_params().items()}
        args = (main_cols, interaction_cols, s_prev, is_first, claimed_dev,
                els_dev, weights, v_inv, params)
        if aot:
            fn.lower(*args).compile()
            return None, alpha_offset + n_cons
        out = fn(*args)
        return out, alpha_offset + n_cons
    fn, n_cons = _constraints_fn(cls, component.log_size)
    if weights is None:
        powers = np.empty((n_cons, 4), np.uint32)
        for i in range(n_cons):
            powers[i] = qm31.h_pow(alpha, alpha_offset + i)
        weights = jnp.asarray(powers)
    args = (main_cols, interaction_cols, s_prev, is_first,
            claimed_dev, els_dev, weights, v_inv)
    if aot:
        fn.lower(*args).compile()
        return None, alpha_offset + n_cons
    out = fn(*args)
    return out, alpha_offset + n_cons


def evaluate_constraints_at_point(
    component: Component,
    main_values: Dict[str, tuple],
    interaction_values: List[tuple],
    s_prev_value: tuple,
    is_first_value: tuple,
    claimed_sum: tuple,
    elements: Dict[str, LookupElements],
) -> List[tuple]:
    """Evaluate every constraint at one out-of-domain point from sampled
    column values (verifier side). All values are host QM31 tuples."""
    ev = Evaluator(
        component, main_values, interaction_values, s_prev_value,
        is_first_value, claimed_sum, elements, host=True,
    )
    component.define_constraints(ev)
    return [c.v for c in ev.constraints]


def _qm31_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Modular prefix sum along axis 1 of a (4, N) uint32 array.

    jnp.cumsum would overflow uint32; do log-step doubling adds in M31."""
    n = x.shape[1]
    log = int(n).bit_length() - 1
    acc = x
    for s in range(log):
        shift = 1 << s
        shifted = jnp.concatenate(
            [jnp.zeros((4, shift), jnp.uint32), acc[:, :-shift]], axis=1
        )
        acc = m31.add(acc, shifted)
    return acc
