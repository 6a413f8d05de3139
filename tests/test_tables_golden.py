"""Golden-vector tests for the table builders, transcribed from the
reference's own unit tests (exact expected table contents authored by the
reference, not recomputed here):

- memory:      memory/table.rs:637-651 (test_sort),
               :662-685 (test_complete_wih_dummy_entries),
               :695-711 (test_pad),
               :713-746 (test_memory_intermediate_table_from_registers)
- program:     program/table.rs:356-381 (test_program_table_from_program_memory)
- instruction: instruction/table.rs:610-740
               (test_instruction_intermediate_table_from_registers_example_program),
               :745-805 (test_instruction_table_program_unused_instruction)
- processor:   processor/table.rs:677-885
               (test_processor_table_from_registers_example_program)
- left:        processor/instructions/table.rs:652-728
               (test_left_table_from_registers_example_program)

Layout note: the reference's "intermediate table" rows map 1:1 onto our
flattened rows (row i = intermediate row i; next_* = intermediate row i+1).
Our minimum table height is 2^MIN_LOG_SIZE rows where the reference instead
broadcasts each row over 16 SIMD lanes (same minimum log_size = 4, README
deviation #1); goldens therefore check the reference-length prefix exactly
and the padding tail against the reference's pad semantics (clk continues,
mp/mv/ip frozen, d = 1).
"""

import numpy as np
import pytest

from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.core.m31 import P_INT
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

INV2 = (P_INT + 1) // 2  # BaseField::from(2).inverse()


def _trace_row(clk=0, ip=0, ci=0, ni=0, mp=0, mv=0, mvi=0):
    return [clk, ip, ci, ni, mp, mv, mvi]


def _cols_rows(cols, names):
    return [tuple(int(cols[n][i]) for n in names) for i in range(len(cols[names[0]]))]


# ---------------------------------------------------------------------------
# Memory
# ---------------------------------------------------------------------------

def test_memory_sort_golden():
    """memory/table.rs:637-651: rows sorted by (mp, clk)."""
    trace = np.array([
        _trace_row(clk=0, mp=1),   # entry_3
        _trace_row(clk=0, mp=0),   # entry_1
        _trace_row(clk=1, mp=0),   # entry_2
    ], np.uint32)
    cols = T.memory_table(trace)
    rows = _cols_rows(cols, ["clk", "mp", "mv", "d"])
    assert rows[:3] == [(0, 0, 0, 0), (1, 0, 0, 0), (0, 1, 0, 0)]


def test_memory_complete_with_dummy_entries_golden():
    """memory/table.rs:662-685: clk gaps filled with dummies carrying the
    previous mv."""
    trace = np.array([
        _trace_row(clk=5, mp=1, mv=1),  # entry_3
        _trace_row(clk=0, mp=0),        # entry_1
        _trace_row(clk=0, mp=1),        # entry_2
    ], np.uint32)
    cols = T.memory_table(trace)
    rows = _cols_rows(cols, ["clk", "mp", "mv", "d"])
    expected = [
        (0, 0, 0, 0),
        (0, 1, 0, 0),
        (1, 1, 0, 1),
        (2, 1, 0, 1),
        (3, 1, 0, 1),
        (4, 1, 0, 1),
        (5, 1, 1, 0),
    ]
    assert rows[: len(expected)] == expected
    # pad tail: clk continues, mp/mv frozen at the last entry, d = 1
    # (memory/table.rs:291-303)
    for i, r in enumerate(rows[len(expected):]):
        assert r == (6 + i, 1, 1, 1)


def test_memory_from_registers_golden():
    """memory/table.rs:713-746: full Registers -> sorted/dummied table."""
    trace = np.array([
        _trace_row(clk=5, mp=1, mv=1),  # reg_3
        _trace_row(),                   # reg_1 (default)
        _trace_row(clk=1, mp=1),        # reg_2
    ], np.uint32)
    cols = T.memory_table(trace)
    rows = _cols_rows(cols, ["clk", "mp", "mv", "d"])
    expected = [
        (0, 0, 0, 0),   # entry_1
        (1, 1, 0, 0),   # entry_2
        (2, 1, 0, 1),   # dummy (clk fill)
        (3, 1, 0, 1),
        (4, 1, 0, 1),
        (5, 1, 1, 0),   # entry_3
        (6, 1, 1, 1),   # dummy_entry_1 (pad)
        (7, 1, 1, 1),   # dummy_entry_2 (pad)
    ]
    assert rows[:8] == expected
    # flattened next_* columns = the following row (memory/table.rs:121-151)
    nxt = _cols_rows(cols, ["next_clk", "next_mp", "next_mv", "next_d"])
    assert nxt[:7] == rows[1:8]


# ---------------------------------------------------------------------------
# Program
# ---------------------------------------------------------------------------

def test_program_table_golden():
    """program/table.rs:356-381: '+>-' listing; dummy pad keeps last ip."""
    code = compile_program("+>-")
    assert code == [43, 62, 45]
    cols = T.program_table(code)
    rows = _cols_rows(cols, ["ip", "ci", "ni", "d"])
    assert rows[:3] == [(0, 43, 62, 0), (1, 62, 45, 0), (2, 45, 0, 0)]
    for r in rows[3:]:
        assert r == (2, 0, 0, 1)  # new_dummy(last ip) (program/table.rs:62-70)


# ---------------------------------------------------------------------------
# Instruction (example program +>,<[>+.<-] with input [1])
# ---------------------------------------------------------------------------

def _example_machine():
    m = create_test_machine(compile_program("+>,<[>+.<-]"), b"\x01")
    m.execute()
    return m


def test_instruction_table_golden():
    """instruction/table.rs:610-740: sorted merge of program and trace."""
    m = _example_machine()
    cols = T.instruction_table(m.trace(), m.program())
    rows = _cols_rows(cols, ["ip", "ci", "ni", "d"])
    ins = [
        (0, 43, 62), (0, 43, 62),
        (1, 62, 44), (1, 62, 44),
        (2, 44, 60), (2, 44, 60),
        (3, 60, 91), (3, 60, 91),
        (4, 91, 12), (4, 91, 12),
        (5, 12, 62),
        (6, 62, 43), (6, 62, 43),
        (7, 43, 46), (7, 43, 46),
        (8, 46, 60), (8, 46, 60),
        (9, 60, 45), (9, 60, 45),
        (10, 45, 93), (10, 45, 93),
        (11, 93, 6), (11, 93, 6),
        (12, 6, 0),
        (13, 0, 0),
    ]
    expected = [(ip, ci, ni, 0) for ip, ci, ni in ins]
    expected += [(13, 0, 0, 1)] * 7  # new_dummy(13) x7
    assert len(rows) == 32
    assert rows == expected


def test_instruction_table_unused_instruction_golden():
    """instruction/table.rs:745-805: '[-]' — never-executed body cells appear
    once (program only)."""
    m = create_test_machine(compile_program("[-]"), b"")
    m.execute()
    cols = T.instruction_table(m.trace(), m.program())
    rows = _cols_rows(cols, ["ip", "ci", "ni", "d"])
    expected = [
        (0, 91, 4, 0), (0, 91, 4, 0),
        (1, 4, 45, 0),
        (2, 45, 93, 0),
        (3, 93, 2, 0),
        (4, 2, 0, 0),
        (5, 0, 0, 0),
        (5, 0, 0, 1),  # new_dummy(5)
    ]
    assert rows[:8] == expected
    for r in rows[8:]:
        assert r == (5, 0, 0, 1)


# ---------------------------------------------------------------------------
# Processor (also a golden test of the VM trace itself)
# ---------------------------------------------------------------------------

PROCESSOR_GOLDEN = [
    # (clk, ip, ci, ni, mp, mv, mvi) — processor/table.rs:696-818
    (0, 0, 43, 62, 0, 0, 0),
    (1, 1, 62, 44, 0, 1, 1),
    (2, 2, 44, 60, 1, 0, 0),
    (3, 3, 60, 91, 1, 1, 1),
    (4, 4, 91, 12, 0, 1, 1),
    (5, 6, 62, 43, 0, 1, 1),
    (6, 7, 43, 46, 1, 1, 1),
    (7, 8, 46, 60, 1, 2, INV2),
    (8, 9, 60, 45, 1, 2, INV2),
    (9, 10, 45, 93, 0, 1, 1),
    (10, 11, 93, 6, 0, 0, 0),
    (11, 13, 0, 0, 0, 0, 0),
]


def test_vm_trace_golden():
    """The raw VM trace equals the reference's expected register sequence."""
    m = _example_machine()
    got = [tuple(int(v) for v in row) for row in m.trace()]
    assert got == PROCESSOR_GOLDEN


def test_processor_table_golden():
    """processor/table.rs:677-885."""
    m = _example_machine()
    cols = T.processor_table(m.trace())
    names = ["clk", "ip", "ci", "ni", "mp", "mv", "mvi"]
    rows = _cols_rows(cols, names)
    assert rows[:12] == PROCESSOR_GOLDEN
    d = [int(v) for v in cols["d"]]
    assert d[:12] == [0] * 12
    # dummy pad: clk increments, ip frozen, rest 0 (processor/table.rs:241-264)
    for i, r in enumerate(rows[12:16]):
        assert r == (12 + i, 13, 0, 0, 0, 0, 0)
    assert d[12:16] == [1, 1, 1, 1]
    # next_clk = clk + 1 for every row
    assert [int(v) for v in cols["next_clk"]] == [r[0] + 1 for r in rows]


def test_left_table_golden():
    """processor/instructions/table.rs:652-728: '<' rows paired with their
    successor."""
    m = _example_machine()
    from stwo_brainfuck_tpu.vm.instruction import InstructionType

    cols = T.opcode_table(m.trace(), int(InstructionType.Left))
    names = ["clk", "ip", "ci", "ni", "mp", "mv", "mvi", "d",
             "next_ip", "next_mp", "next_mv"]
    rows = _cols_rows(cols, names)
    assert rows[0] == (3, 3, 60, 91, 1, 1, 1, 0, 4, 0, 1)
    assert rows[1] == (8, 9, 60, 45, 1, 2, INV2, 0, 10, 0, 1)
    # pad: clk = last_clk + i (i from 0), ip frozen, rest 0, d = 1
    # (instructions/table.rs:293-307)
    last_clk, last_ip = 9, 10
    for i, r in enumerate(rows[2:]):
        even = 2 * i  # interleaved entry index within the pad block
        assert r[7] == 1  # d
        assert r[1] == last_ip
        assert r[0] == last_clk + even


def test_logup_claimed_sum_dummy_invariance_memory():
    """memory/table.rs:885-929: extra dummy rows leave the claimed sum
    unchanged (recomputed here per table.rs:810-878's fraction formula)."""
    import jax.numpy as jnp

    from stwo_brainfuck_tpu.components.defs import MemoryComponent
    from stwo_brainfuck_tpu.core import qm31
    from stwo_brainfuck_tpu.framework.component import (
        LookupElements, build_interaction_trace)

    m = _example_machine()
    cols = T.memory_table(m.trace())
    log_size = int(np.log2(len(cols["clk"])))
    comp = MemoryComponent(log_size)
    els = {"memory": LookupElements.dummy(3),
           "instruction": LookupElements.dummy(3),
           "processor": LookupElements.dummy(7)}
    dev = {k: jnp.asarray(v) for k, v in cols.items()}
    _, claimed = build_interaction_trace(comp, dev, els)

    # expected = sum over REAL rows of -1/combine([clk, mp, mv])
    expected = qm31.ZERO
    for clk, mp, mv, d in zip(cols["clk"], cols["mp"], cols["mv"], cols["d"]):
        if int(d) == 0:
            den = els["memory"].combine_host([int(clk), int(mp), int(mv)])
            expected = qm31.h_add(expected, qm31.h_neg(qm31.h_inv(den)))
    assert tuple(claimed) == expected
