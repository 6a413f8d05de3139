"""Reference-API-parity helpers: small surface functions that exist because
the reference exposes them (SURVEY.md §2.1 instruction conversions,
stwo circle-point ops, TraceColumn::count bookkeeping) — exercised here so
their contracts stay pinned."""

import numpy as np

from stwo_brainfuck_tpu.components.defs import COMPONENT_CLASSES
from stwo_brainfuck_tpu.core import qm31
from stwo_brainfuck_tpu.core.circle import (
    M31_CIRCLE_GEN,
    CanonicCoset,
    point_add,
    point_at_index,
    point_neg,
    secure_point_add,
    secure_point_double,
    secure_point_from_m31,
    secure_point_mul_index,
    secure_point_neg,
)
from stwo_brainfuck_tpu.vm.instruction import (
    VALID_INSTRUCTIONS_BF,
    InstructionError,
    InstructionType,
    from_u8,
    is_instruction,
)


def test_instruction_conversions():
    """instruction.rs:15-127 surface: u8 <-> enum, to_u32, validity
    predicate, TryFrom error path."""
    for ch in "><+-.,[]":
        assert is_instruction(ord(ch))
        ins = from_u8(ord(ch))
        assert ins.to_u32() == ord(ch)
        assert isinstance(ins, InstructionType)
    for ch in "xyz#\n0":
        assert not is_instruction(ord(ch))
        try:
            from_u8(ord(ch))
            assert False, "expected InstructionError"
        except InstructionError as exc:
            assert exc.value == ord(ch)
    assert set(VALID_INSTRUCTIONS_BF) == set("><+-.,[]")


def test_point_group_ops():
    """CirclePoint ops: neg is the group inverse, double = add(self, self),
    mul_index matches repeated addition, all on both M31 and QM31 points."""
    g = M31_CIRCLE_GEN
    assert point_add(g, point_neg(g)) == (1, 0)
    sg = secure_point_from_m31(g)
    dbl = secure_point_double(sg)
    assert dbl == secure_point_add(sg, sg)
    assert secure_point_add(sg, secure_point_neg(sg)) == (
        (1, 0, 0, 0), (0, 0, 0, 0))
    assert secure_point_mul_index(5) == secure_point_from_m31(point_at_index(5))


def test_canonic_coset_step_index():
    """step_index = subgroup generator index of size 2^log (the LogUp
    prefix-sum shifted mask point's step, pcs.shifted_point)."""
    for lg in (4, 7, 12):
        c = CanonicCoset(lg)
        assert c.step_index() == 1 << (31 - lg)
        # stepping the coset by step_index lands on the next coset element
        assert c.coset().index_at(1) == (
            c.coset().index_at(0) + c.step_index()) % (1 << 31)


def test_component_column_counts():
    """TraceColumn::count bookkeeping (components/mod.rs:138-144): main
    column count = len(columns); interaction = relations + prefix sum."""
    for cls in COMPONENT_CLASSES:
        comp = cls(4)
        assert comp.n_main_columns == len(comp.columns)
        assert comp.n_interaction_columns == comp.relation_count() + 1


def test_qm31_pow_const_matches_host():
    import jax.numpy as jnp

    x = jnp.asarray(np.array([3, 1, 4, 1], np.uint32))
    out = np.asarray(qm31.pow_const(x, 13))
    assert tuple(int(v) for v in out) == qm31.h_pow((3, 1, 4, 1), 13)
