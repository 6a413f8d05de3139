"""AIR component tests: the assert_constraints equivalent (reference §4.4) —
build all 13 tables from real program runs, evaluate every constraint on the
trace domain (must vanish), check the global LogUp sum cancels, and mutation
tests (negative tests) per the reference's #[should_panic] suite."""

import numpy as np
import jax.numpy as jnp
import pytest

from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.components.defs import COMPONENT_CLASSES, ELEMENT_SIZES
from stwo_brainfuck_tpu.core import qm31
from stwo_brainfuck_tpu.core.fft import rotation_permutation
from stwo_brainfuck_tpu.framework.component import (
    LookupElements,
    build_interaction_trace,
    evaluate_constraints_device,
)
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine


def elements():
    return {k: LookupElements.dummy(v) for k, v in ELEMENT_SIZES.items()}


def run(code, inp=b""):
    m = create_test_machine(compile_program(code), inp)
    m.execute()
    return m


def build_all(m):
    return T.all_tables(m.trace(), m.program())


def check_component(comp_cls, cols, els):
    log_size = int(np.log2(len(next(iter(cols.values())))))
    comp = comp_cls(log_size)
    n = 1 << log_size
    main = {k: jnp.asarray(v) for k, v in cols.items()}
    inter, claimed = build_interaction_trace(comp, main, els)
    s = inter[-1]
    perm = jnp.asarray(rotation_permutation(log_size, 0, 1))
    s_prev = jnp.take(s, perm, axis=1)
    is_first = jnp.zeros(n, jnp.uint32).at[0].set(1)
    out = evaluate_constraints_device(comp, main, inter, s_prev, is_first, claimed, els)
    return comp, out, claimed


PROGRAMS = [
    ("+++>,<[>+.<-]", b"\x01"),      # reference test_proof program
    ("++[-]+.", b""),                # jump into middle
    ("+++><[>+<-]", b""),            # no-input loop
    (",.", b"A"),                    # pure IO
    ("[->+<]", b""),                 # loop.bf: loop body never entered
    (",>,..<.", b"ab"),              # a-bc-like IO mix
    ("-", b""),                      # single underflow step
]


@pytest.mark.parametrize("code,inp", PROGRAMS)
def test_all_constraints_vanish_and_logup_cancels(code, inp):
    m = run(code, inp)
    tabs = build_all(m)
    els = elements()
    total = qm31.ZERO
    for cls in COMPONENT_CLASSES:
        comp, out, claimed = check_component(cls, tabs[cls.name], els)
        for i, c in enumerate(out):
            arr = np.asarray(c)
            assert not arr.any(), f"{cls.name} constraint {i} nonzero: {arr.sum(axis=1)}"
        total = qm31.h_add(total, claimed)
    assert total == qm31.ZERO, f"logup sum {total}"


def test_hello_world_constraints():
    code = ("++++++++++[>+++++++>++++++++++>+++>+<<<<-]>++.>+.+++++++..+++.>++."
            "<<+++++++++++++++.>.+++.------.--------.>+.>.")
    m = run(code)
    tabs = build_all(m)
    els = elements()
    total = qm31.ZERO
    for cls in COMPONENT_CLASSES:
        comp, out, claimed = check_component(cls, tabs[cls.name], els)
        for i, c in enumerate(out):
            assert not np.asarray(c).any(), f"{cls.name} constraint {i}"
        total = qm31.h_add(total, claimed)
    assert total == qm31.ZERO


def _mutate_and_expect_violation(comp_name, col, row, delta=1, expect_idx=None):
    """Mutate one table cell and require a constraint violation. When
    expect_idx is given, THAT constraint must be among the violated ones —
    proving the specific constraint is load-bearing (reference style,
    memory/component.rs:211-609)."""
    m = run("+++>,<[>+.<-]", b"\x01")
    tabs = build_all(m)
    els = elements()
    cols = dict(tabs[comp_name])
    if callable(row):
        row = row(cols)
    mutated = cols[col].copy()
    mutated[row] = (int(mutated[row]) + delta) % (2**31 - 1)
    cols[col] = mutated
    cls = next(c for c in COMPONENT_CLASSES if c.name == comp_name)
    comp, out, _ = check_component(cls, cols, els)
    fired = {i for i, c in enumerate(out) if np.asarray(c).any()}
    assert fired, "mutation not caught"
    if expect_idx is not None:
        assert expect_idx in fired, (
            f"{comp_name}: expected constraint {expect_idx} to fire, got {fired}")


def _first_dummy(cols):
    return int(np.nonzero(np.asarray(cols["d"]) == 1)[0][0])


def _first_where(expr):
    def find(cols):
        mask = expr({k: np.asarray(v).astype(np.int64) for k, v in cols.items()})
        idx = np.nonzero(mask)[0]
        assert len(idx), "no row matches the mutation precondition"
        return int(idx[0])
    return find


# Complete mutation matrix: >= 1 negative test per constraint class per
# component; expected indices follow the e.add() order in components/defs.py.
# Mirrors (and extends to all 13 components) the reference's #[should_panic]
# suite (memory/component.rs:211-609, plus_component.rs, ...).
@pytest.mark.parametrize(
    "comp,col,row,delta,idx",
    [
        # memory: defs.py:30-52 (11 constraints)
        ("memory", "clk", 0, 1, 0),              # boundary clk
        ("memory", "mp", 0, 1, 1),               # boundary mp
        ("memory", "mv", 0, 1, 2),               # boundary mv
        ("memory", "d", 0, 1, 3),                # boundary d
        ("memory", "d", _first_where(lambda c: c["d"] == 0), 5, 4),   # d bool
        ("memory", "next_d", 1, 5, 5),           # next_d bool
        ("memory", "next_mp", 2, 5, 6),          # mp increases by 0/1
        ("memory", "next_clk",                   # same mp => clk + 1
         _first_where(lambda c: c["next_mp"] == c["mp"]), 5, 7),
        ("memory", "next_mv",                    # mp+1 => next_mv = 0
         _first_where(lambda c: c["next_mp"] == c["mp"] + 1), 1, 8),
        ("memory", "next_mp", _first_dummy, 1, 9),   # d => mp frozen
        ("memory", "next_mv",                    # d => mv frozen (mp same)
         _first_where(lambda c: (c["d"] == 1) & (c["next_mp"] == c["mp"])), 1, 10),
        # instruction: defs.py:61-78 (10 constraints)
        ("instruction", "ip", 0, 1, 0),
        ("instruction", "d", _first_where(lambda c: c["d"] == 0), 5, 1),
        ("instruction", "next_d", 1, 5, 2),
        ("instruction", "ci", _first_dummy, 1, 3),
        ("instruction", "ni", _first_dummy, 1, 4),
        ("instruction", "next_ci",
         _first_where(lambda c: c["next_d"] == 1), 1, 5),
        ("instruction", "next_ni",
         _first_where(lambda c: c["next_d"] == 1), 1, 6),
        ("instruction", "next_ip", 3, 5, 7),     # ip +0/1
        ("instruction", "next_ci",               # same ip => ci frozen
         _first_where(lambda c: (c["next_ip"] == c["ip"]) & (c["next_d"] == 0)), 1, 8),
        ("instruction", "next_ni",
         _first_where(lambda c: (c["next_ip"] == c["ip"]) & (c["next_d"] == 0)), 1, 9),
        # program: defs.py:87-93 (4 constraints)
        ("program", "ip", 0, 1, 0),
        ("program", "d", 0, 5, 1),  # delta 5: keep it non-boolean
        ("program", "ci", _first_dummy, 1, 2),
        ("program", "ni", _first_dummy, 1, 3),
        # processor: defs.py:103-115 (7 constraints)
        ("processor", "clk", 0, 1, 0),
        ("processor", "ip", 0, 1, 1),
        ("processor", "mp", 0, 1, 2),
        ("processor", "mv", 0, 1, 3),
        ("processor", "mvi",                     # mv*(mv*mvi - 1)
         _first_where(lambda c: c["mv"] != 0), 1, 4),
        ("processor", "mvi",                     # mvi*(mv*mvi - 1)
         _first_where(lambda c: (c["mv"] == 0) & (c["clk"] > 0)), 1, 5),
        ("processor", "next_clk", 0, 1, 6),
        # jump_if_not_zero: defs.py:129-160 (8 constraints)
        ("jump_if_not_zero", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("jump_if_not_zero", "next_clk", 0, 1, 1),
        ("jump_if_not_zero", "d", _first_where(lambda c: c["d"] == 0), 5, 2),
        ("jump_if_not_zero", "mv", _first_dummy, 1, 3),
        ("jump_if_not_zero", "ci", _first_dummy, 1, 4),
        ("jump_if_not_zero", "next_ip",          # the jump constraint
         _first_where(lambda c: c["d"] == 0), 1, 5),
        ("jump_if_not_zero", "next_mp", 0, 1, 6),
        ("jump_if_not_zero", "next_mv",
         _first_where(lambda c: c["d"] == 0), 1, 7),
        # jump_if_zero: defs.py:171-176
        ("jump_if_zero", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("jump_if_zero", "next_clk", 0, 1, 1),
        ("jump_if_zero", "next_ip",
         _first_where(lambda c: c["d"] == 0), 1, 5),
        # opcode components: defs.py:188-255 (5 shared + extra)
        ("plus_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("plus_instruction", "d", _first_where(lambda c: c["d"] == 0), 5, 1),
        ("plus_instruction", "mv", _first_dummy, 1, 2),
        ("plus_instruction", "ci", _first_dummy, 1, 3),
        ("plus_instruction", "next_ip", _first_where(lambda c: c["d"] == 0), 1, 4),
        ("plus_instruction", "next_mp", 0, 1, 5),
        ("plus_instruction", "next_mv", _first_where(lambda c: c["d"] == 0), 1, 6),
        ("minus_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("minus_instruction", "next_mp", 0, 1, 5),
        ("minus_instruction", "next_mv", _first_where(lambda c: c["d"] == 0), 1, 6),
        ("left_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("left_instruction", "next_ip", _first_where(lambda c: c["d"] == 0), 1, 4),
        ("left_instruction", "next_mp", _first_where(lambda c: c["d"] == 0), 1, 5),
        ("right_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("right_instruction", "next_mp", _first_where(lambda c: c["d"] == 0), 1, 5),
        ("input_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("input_instruction", "next_mp", 0, 1, 5),
        ("output_instruction", "ci", _first_where(lambda c: c["d"] == 0), 1, 0),
        ("output_instruction", "next_mp", 0, 1, 5),
        ("output_instruction", "next_mv", 0, 1, 6),
        # end_of_execution: defs.py:268
        ("end_of_execution", "ci", 0, 1, 0),
    ],
)
def test_mutations_violate_constraints(comp, col, row, delta, idx):
    _mutate_and_expect_violation(comp, col, row, delta, idx)


def _tamper_interaction(comp_name, which, tamper):
    """Evaluate constraints with a tampered interaction trace; returns the
    set of violated constraint indices."""
    m = run("+++>,<[>+.<-]", b"\x01")
    tabs = build_all(m)
    els = elements()
    cols = tabs[comp_name]
    log_size = int(np.log2(len(next(iter(cols.values())))))
    cls = next(c for c in COMPONENT_CLASSES if c.name == comp_name)
    comp = cls(log_size)
    main = {k: jnp.asarray(v) for k, v in cols.items()}
    inter, claimed = build_interaction_trace(comp, main, els)
    inter = [np.asarray(q).copy() for q in inter]
    claimed = list(claimed)
    tamper(inter, claimed)
    inter = [jnp.asarray(q) for q in inter]
    s = inter[-1]
    perm = jnp.asarray(rotation_permutation(log_size, 0, 1))
    s_prev = jnp.take(s, perm, axis=1)
    is_first = jnp.zeros(1 << log_size, jnp.uint32).at[0].set(1)
    out = evaluate_constraints_device(
        comp, main, inter, s_prev, is_first, tuple(claimed), els)
    return {i for i, c in enumerate(out) if np.asarray(c).any()}, comp


# One LogUp tamper per element set: a wrong multiplicity (tampered fraction
# column) must fire the Q*den - num constraint; a wrong claimed sum must fire
# the prefix-sum constraint (reference: the claimed-sum recomputation tests,
# memory/table.rs:810-878).
def test_logup_tamper_memory_fraction():
    fired, comp = _tamper_interaction(
        "memory", 0, lambda inter, cl: inter[0].__setitem__((0, 2), (int(inter[0][0, 2]) + 1) % (2**31 - 1)))
    n_base = comp.constraint_count() - comp.relation_count() - 1
    assert n_base in fired  # Q_0 * den - num


def test_logup_tamper_processor_instruction_entry():
    # processor's 2nd relation entry (InstructionElements)
    fired, comp = _tamper_interaction(
        "processor", 1, lambda inter, cl: inter[1].__setitem__((1, 3), (int(inter[1][1, 3]) + 1) % (2**31 - 1)))
    n_base = comp.constraint_count() - comp.relation_count() - 1
    assert n_base + 1 in fired  # Q_1 * den - num


def test_logup_tamper_claimed_sum():
    fired, comp = _tamper_interaction(
        "memory", 0, lambda inter, cl: cl.__setitem__(0, (cl[0] + 1) % (2**31 - 1)))
    assert comp.constraint_count() - 1 in fired  # prefix-sum constraint


def test_logup_tamper_prefix_sum_column():
    fired, comp = _tamper_interaction(
        "memory", 0, lambda inter, cl: inter[-1].__setitem__((2, 5), (int(inter[-1][2, 5]) + 1) % (2**31 - 1)))
    assert comp.constraint_count() - 1 in fired


def test_logup_wrong_multiplicity_flipped_d():
    """Multiplicity forgery: interaction trace built from a table whose d
    flag was flipped (row claimed as dummy), evaluated against the REAL main
    trace — the fraction constraint must fire."""
    m = run("+++>,<[>+.<-]", b"\x01")
    tabs = build_all(m)
    els = elements()
    cols = tabs["memory"]
    log_size = int(np.log2(len(cols["clk"])))
    comp = COMPONENT_CLASSES[0](log_size)
    forged = dict(cols)
    dcol = forged["d"].copy()
    dcol[0] = 1  # claim the first real row is a dummy (multiplicity 0)
    forged["d"] = dcol
    inter, claimed = build_interaction_trace(
        comp, {k: jnp.asarray(v) for k, v in forged.items()}, els)
    s = inter[-1]
    perm = jnp.asarray(rotation_permutation(log_size, 0, 1))
    s_prev = jnp.take(s, perm, axis=1)
    is_first = jnp.zeros(1 << log_size, jnp.uint32).at[0].set(1)
    out = evaluate_constraints_device(
        comp, {k: jnp.asarray(v) for k, v in cols.items()}, inter, s_prev,
        is_first, claimed, els)
    n_base = comp.constraint_count() - comp.relation_count() - 1
    fired = {i for i, c in enumerate(out) if np.asarray(c).any()}
    assert n_base in fired


def test_interaction_dummy_rows_do_not_affect_sum():
    """Reference memory/table.rs:885-929: dummy rows must not change the
    claimed sum. Compare the memory claimed sum for a trace against the same
    trace with extra padding (doubled table)."""
    m = run("+++>,<[>+.<-]", b"\x01")
    tabs = build_all(m)
    els = elements()
    cls = COMPONENT_CLASSES[0]
    _, _, claimed1 = check_component(cls, tabs["memory"], els)

    # re-pad memory table to twice the size: padding adds only dummies
    cols = tabs["memory"]
    n = len(cols["clk"])
    ext = {}
    last_clk = int(cols["clk"][-1])
    add_clk = (last_clk + 1 + np.arange(n)) % (2**31 - 1)
    ext["clk"] = np.concatenate([cols["clk"], add_clk]).astype(np.uint32)
    ext["mp"] = np.concatenate([cols["mp"], np.full(n, cols["mp"][-1])]).astype(np.uint32)
    ext["mv"] = np.concatenate([cols["mv"], np.full(n, cols["mv"][-1])]).astype(np.uint32)
    ext["d"] = np.concatenate([cols["d"], np.ones(n)]).astype(np.uint32)
    ext["next_clk"] = np.concatenate([ext["clk"][1:], [(int(ext["clk"][-1]) + 1) % (2**31 - 1)]]).astype(np.uint32)
    ext["next_mp"] = np.concatenate([ext["mp"][1:], [ext["mp"][-1]]]).astype(np.uint32)
    ext["next_mv"] = np.concatenate([ext["mv"][1:], [ext["mv"][-1]]]).astype(np.uint32)
    ext["next_d"] = np.concatenate([ext["d"][1:], [1]]).astype(np.uint32)

    comp2, out2, claimed2 = check_component(cls, ext, els)
    for i, c in enumerate(out2):
        assert not np.asarray(c).any(), f"extended memory constraint {i}"
    assert claimed1 == claimed2
