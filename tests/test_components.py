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


def _mutate_and_expect_violation(comp_name, col, row, delta=1):
    m = run("+++>,<[>+.<-]", b"\x01")
    tabs = build_all(m)
    els = elements()
    cols = dict(tabs[comp_name])
    mutated = cols[col].copy()
    mutated[row] = (int(mutated[row]) + delta) % (2**31 - 1)
    cols[col] = mutated
    cls = next(c for c in COMPONENT_CLASSES if c.name == comp_name)
    comp, out, _ = check_component(cls, cols, els)
    assert any(np.asarray(c).any() for c in out), "mutation not caught"


# Mirrors the reference's negative tests (memory/component.rs:211-609 etc.)
@pytest.mark.parametrize(
    "comp,col,row",
    [
        ("memory", "clk", 0),        # invalid boundary clk
        ("memory", "mv", 0),         # invalid boundary mv
        ("memory", "next_mp", 2),    # invalid mp transition
        ("memory", "d", 1),          # d not boolean / wrong flag
        ("processor", "next_clk", 0),
        ("processor", "mvi", 1),
        ("instruction", "next_ip", 3),
        ("program", "d", 0),
        ("jump_if_zero", "next_ip", 0),
        ("plus_instruction", "next_mv", 0),
        ("end_of_execution", "ci", 0),
    ],
)
def test_mutations_violate_constraints(comp, col, row):
    _mutate_and_expect_violation(comp, col, row)


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
