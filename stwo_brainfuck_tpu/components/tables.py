"""Trace table builders for the 13 AIR components.

Each builder maps the VM execution trace (an (n, 7) uint32 array in register
order clk, ip, ci, ni, mp, mv, mvi) to named columns padded to a power of two
(>= 2^MIN_LOG_SIZE rows). Row-construction semantics mirror the reference's
table.rs files exactly (cited per function); the layout difference is that we
do NOT expand rows into 16 SIMD lanes (stwo's LOG_N_LANES broadcast is a CPU
AVX artifact — crates/brainfuck_prover/src/components/memory/table.rs:92-104).

All builders are vectorized numpy (host); the returned dict maps column name
-> uint32 array whose index is the storage position (interpreted as a
bit-reversed circle evaluation, as in the reference's CircleEvaluation::new).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core.m31 import P_INT
from ..vm.instruction import InstructionType

# Minimum table height (2^4 = 16 rows). The is_first preprocessed ladder
# starts here (reference IS_FIRST_LOG_SIZES, brainfuck_air/mod.rs:435-464).
MIN_LOG_SIZE = 4

Columns = Dict[str, np.ndarray]


class TraceError(Exception):
    pass


class InvalidEndOfExecution(TraceError):
    pass


def _next_pow2_len(n: int, bucket: bool = False) -> int:
    """Next power-of-two table height >= n (>= 2^MIN_LOG_SIZE).

    bucket=True rounds the log up to an EVEN value ("shape bucketing"):
    every component height then lands in {2^4, 2^6, ... 2^24}, collapsing the
    set of distinct XLA executable shapes per proof — compile latency through
    the TPU relay is the dominant cold-start cost. Padding rows are ordinary
    dummy rows, so claims/constraints are unaffected (the claim simply
    records the bucketed log)."""
    log = max(MIN_LOG_SIZE, (max(1, n) - 1).bit_length())
    if bucket and log % 2:
        log += 1
    return 1 << log


def _pack(names: List[str], arrays: List[np.ndarray]) -> Columns:
    return {n: np.ascontiguousarray(a, dtype=np.uint32) for n, a in zip(names, arrays)}


# ---------------------------------------------------------------------------
# Memory (reference: components/memory/table.rs)
# ---------------------------------------------------------------------------

def memory_table(trace: np.ndarray, bucket: bool = False) -> Columns:
    """Sort rows by (mp, clk), fill clk gaps with dummies, pad, then flatten
    consecutive entries into (cur, next) rows (table.rs:113-151, 244-318)."""
    clk, mp, mv = trace[:, 0], trace[:, 4], trace[:, 5]
    order = np.lexsort((clk, mp))
    clk_s, mp_s, mv_s = clk[order].astype(np.int64), mp[order].astype(np.int64), mv[order]
    d_s = np.zeros(len(clk_s), np.int64)

    # clk-gap dummies between consecutive same-mp entries (table.rs:259-283)
    if len(clk_s) > 1:
        same = mp_s[1:] == mp_s[:-1]
        gaps = np.where(same, clk_s[1:] - clk_s[:-1] - 1, 0)
        gaps = np.maximum(gaps, 0)
        total = int(gaps.sum())
        if total:
            src = np.repeat(np.arange(len(gaps)), gaps)
            # offset within each gap block: 1..gap
            starts = np.concatenate([[0], np.cumsum(gaps)[:-1]])
            off = np.arange(total) - np.repeat(starts, gaps) + 1
            d_clk = clk_s[src] + off
            d_mp = mp_s[src]
            d_mv = mv_s[src]
            clk_s = np.concatenate([clk_s, d_clk])
            mp_s = np.concatenate([mp_s, d_mp])
            mv_s = np.concatenate([mv_s, d_mv])
            d_s = np.concatenate([d_s, np.ones(total, np.int64)])
            order2 = np.lexsort((d_s, clk_s, mp_s))  # real rows before dummies on ties
            clk_s, mp_s, mv_s, d_s = clk_s[order2], mp_s[order2], mv_s[order2], d_s[order2]

    # pad to power of two continuing the clk series (table.rs:291-303)
    n = len(clk_s)
    target = _next_pow2_len(n, bucket)
    padn = target - n
    if padn:
        clk_s = np.concatenate([clk_s, clk_s[-1] + 1 + np.arange(padn)])
        mp_s = np.concatenate([mp_s, np.full(padn, mp_s[-1])])
        mv_s = np.concatenate([mv_s, np.full(padn, mv_s[-1])])
        d_s = np.concatenate([d_s, np.ones(padn, np.int64)])

    # pair with successor; appended dummy (clk+1, mp, mv) (table.rs:121-151)
    nxt_clk = np.concatenate([clk_s[1:], [clk_s[-1] + 1]])
    nxt_mp = np.concatenate([mp_s[1:], [mp_s[-1]]])
    nxt_mv = np.concatenate([mv_s[1:], [mv_s[-1]]])
    nxt_d = np.concatenate([d_s[1:], [1]])
    return _pack(
        ["clk", "mp", "mv", "d", "next_clk", "next_mp", "next_mv", "next_d"],
        [clk_s % P_INT, mp_s, mv_s, d_s, nxt_clk % P_INT, nxt_mp, nxt_mv, nxt_d],
    )


# ---------------------------------------------------------------------------
# Instruction (reference: components/instruction/table.rs)
# ---------------------------------------------------------------------------

def _program_rows(program: List[int]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    code = np.asarray(program, np.int64)
    ip = np.arange(len(code), dtype=np.int64)
    ni = np.concatenate([code[1:], [0]])
    return ip, code, ni


def instruction_table(trace: np.ndarray, program: List[int], bucket: bool = False) -> Columns:
    """concat(program listing, exec trace) sorted by (ip, clk) — program rows
    first on ties (stable sort, clk=0) — padded, then paired
    (table.rs:251-282, 116-143)."""
    p_ip, p_ci, p_ni = _program_rows(program)
    p_clk = np.zeros(len(p_ip), np.int64)
    t_clk = trace[:, 0].astype(np.int64)
    t_ip = trace[:, 1].astype(np.int64)
    t_ci = trace[:, 2].astype(np.int64)
    t_ni = trace[:, 3].astype(np.int64)

    ip = np.concatenate([p_ip, t_ip])
    ci = np.concatenate([p_ci, t_ci])
    ni = np.concatenate([p_ni, t_ni])
    clk = np.concatenate([p_clk, t_clk])
    order = np.lexsort((clk, ip))  # stable: program entries precede ties
    ip, ci, ni = ip[order], ci[order], ni[order]
    d = np.zeros(len(ip), np.int64)

    n = len(ip)
    target = _next_pow2_len(n, bucket)
    padn = target - n
    if padn:
        ip = np.concatenate([ip, np.full(padn, ip[-1])])
        ci = np.concatenate([ci, np.zeros(padn, np.int64)])
        ni = np.concatenate([ni, np.zeros(padn, np.int64)])
        d = np.concatenate([d, np.ones(padn, np.int64)])

    nxt_ip = np.concatenate([ip[1:], [ip[-1]]])
    nxt_ci = np.concatenate([ci[1:], [0]])
    nxt_ni = np.concatenate([ni[1:], [0]])
    nxt_d = np.concatenate([d[1:], [1]])
    return _pack(
        ["ip", "ci", "ni", "d", "next_ip", "next_ci", "next_ni", "next_d"],
        [ip, ci, ni, d, nxt_ip, nxt_ci, nxt_ni, nxt_d],
    )


# ---------------------------------------------------------------------------
# Program (reference: components/program/table.rs:111-141, 55-70)
# ---------------------------------------------------------------------------

def program_table(program: List[int], bucket: bool = False) -> Columns:
    ip, ci, ni = _program_rows(program)
    d = np.zeros(len(ip), np.int64)
    target = _next_pow2_len(len(ip), bucket)
    padn = target - len(ip)
    if padn:
        ip = np.concatenate([ip, np.full(padn, ip[-1])])
        ci = np.concatenate([ci, np.zeros(padn, np.int64)])
        ni = np.concatenate([ni, np.zeros(padn, np.int64)])
        d = np.concatenate([d, np.ones(padn, np.int64)])
    return _pack(["ip", "ci", "ni", "d"], [ip, ci, ni, d])


# ---------------------------------------------------------------------------
# Processor (reference: components/processor/table.rs:109-145, 209-222)
# ---------------------------------------------------------------------------

def processor_table(trace: np.ndarray, bucket: bool = False) -> Columns:
    cols = [trace[:, i].astype(np.int64) for i in range(7)]
    clk, ip, ci, ni, mp, mv, mvi = cols
    d = np.zeros(len(clk), np.int64)
    target = _next_pow2_len(len(clk), bucket)
    padn = target - len(clk)
    if padn:
        clk = np.concatenate([clk, clk[-1] + 1 + np.arange(padn)])
        ip = np.concatenate([ip, np.full(padn, ip[-1])])
        ci = np.concatenate([ci, np.zeros(padn, np.int64)])
        ni = np.concatenate([ni, np.zeros(padn, np.int64)])
        mp = np.concatenate([mp, np.zeros(padn, np.int64)])
        mv = np.concatenate([mv, np.zeros(padn, np.int64)])
        mvi = np.concatenate([mvi, np.zeros(padn, np.int64)])
        d = np.concatenate([d, np.ones(padn, np.int64)])
    nxt_clk = np.concatenate([clk[1:], [clk[-1] + 1]])
    return _pack(
        ["clk", "ip", "ci", "ni", "mp", "mv", "mvi", "d", "next_clk"],
        [clk % P_INT, ip, ci, ni, mp, mv, mvi, d, nxt_clk % P_INT],
    )


# ---------------------------------------------------------------------------
# Per-opcode tables (reference: processor/instructions/table.rs:303-330,
# 288-308) and jump tables (jump/table.rs:264-297) — same pairing machinery.
# ---------------------------------------------------------------------------

def _opcode_entries(trace: np.ndarray, opcode: int) -> List[np.ndarray]:
    """Interleaved [row_i, row_{i+1}] register entries for rows with
    ci == opcode (zip with successor; the final trace row has ci = 0 so a
    successor always exists)."""
    ci = trace[:-1, 2]
    sel = np.nonzero(ci == opcode)[0]
    ent = np.empty((2 * len(sel), 7), np.int64)
    ent[0::2] = trace[sel].astype(np.int64)
    ent[1::2] = trace[sel + 1].astype(np.int64)
    return ent


def _pad_entries(ent: np.ndarray, bucket: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Pad interleaved entries to a power of two with dummies
    clk = last_clk + i (i = 0..), ip = last_ip, other registers 0, d = 1.
    The FINAL table has target/2 rows, so bucketing rounds the interleaved
    length to an odd log (= even row log)."""
    n = len(ent)
    d = np.zeros(n, np.int64)
    last_clk = ent[-1, 0] if n else 0
    last_ip = ent[-1, 1] if n else 0
    target = 2 * _next_pow2_len(max(1, n) // 2 + (n % 2), bucket)
    padn = target - n
    if padn:
        pad = np.zeros((padn, 7), np.int64)
        pad[:, 0] = last_clk + np.arange(padn)
        pad[:, 1] = last_ip
        ent = np.concatenate([ent, pad]) if n else pad
        d = np.concatenate([d, np.ones(padn, np.int64)])
    return ent, d


def opcode_table(trace: np.ndarray, opcode: int, bucket: bool = False) -> Columns:
    """11-column table for + - < > , . (ProcessorInstructionTable<N>)."""
    ent, d = _pad_entries(_opcode_entries(trace, opcode), bucket)
    e1, e2 = ent[0::2], ent[1::2]
    d1 = d[0::2]
    return _pack(
        ["clk", "ip", "ci", "ni", "mp", "mv", "mvi", "d", "next_ip", "next_mp", "next_mv"],
        [e1[:, 0] % P_INT, e1[:, 1], e1[:, 2], e1[:, 3], e1[:, 4], e1[:, 5], e1[:, 6],
         d1, e2[:, 1], e2[:, 4], e2[:, 5]],
    )


def jump_table(trace: np.ndarray, opcode: int, bucket: bool = False) -> Columns:
    """13-column table for [ and ] (JumpTable<N>), including
    is_mv_zero = 1 - mv*mvi (jump/table.rs:206)."""
    ent, d = _pad_entries(_opcode_entries(trace, opcode), bucket)
    e1, e2 = ent[0::2], ent[1::2]
    d1 = d[0::2]
    mv, mvi = e1[:, 5].astype(np.uint64), e1[:, 6].astype(np.uint64)
    is_mv_zero = (1 + P_INT - (mv * mvi) % P_INT) % P_INT
    return _pack(
        ["clk", "ip", "ci", "ni", "mp", "mv", "mvi", "next_clk", "next_ip",
         "next_mp", "next_mv", "d", "is_mv_zero"],
        [e1[:, 0] % P_INT, e1[:, 1], e1[:, 2], e1[:, 3], e1[:, 4], e1[:, 5], e1[:, 6],
         e2[:, 0] % P_INT, e2[:, 1], e2[:, 4], e2[:, 5], d1, is_mv_zero],
    )


# ---------------------------------------------------------------------------
# End of execution (reference: processor/instructions/end_of_execution/
# table.rs:71-111) — exactly one row with ci = 0, zero-padded.
# ---------------------------------------------------------------------------

def end_of_execution_table(trace: np.ndarray) -> Columns:
    sel = np.nonzero(trace[:, 2] == 0)[0]
    if len(sel) != 1:
        raise InvalidEndOfExecution(f"{len(sel)} end-of-execution rows")
    row = trace[sel[0]].astype(np.int64)
    size = 1 << MIN_LOG_SIZE
    cols = np.zeros((7, size), np.int64)
    cols[:, 0] = row
    return _pack(["clk", "ip", "ci", "ni", "mp", "mv", "mvi"], list(cols))


# ---------------------------------------------------------------------------
# All tables for a machine run
# ---------------------------------------------------------------------------

OPCODES = {
    "plus": InstructionType.Plus,
    "minus": InstructionType.Minus,
    "left": InstructionType.Left,
    "right": InstructionType.Right,
    "input": InstructionType.ReadChar,
    "output": InstructionType.PutChar,
}


def all_tables(trace: np.ndarray, program: List[int],
               bucket: bool = True) -> Dict[str, Columns]:
    """Build every component table (order: brainfuck_air/mod.rs:511-547).

    bucket defaults to True for the proving path (even-log heights — see
    _next_pow2_len); pass False for reference-exact minimal padding."""
    tables = {
        "memory": memory_table(trace, bucket),
        "instruction": instruction_table(trace, program, bucket),
        "program": program_table(program, bucket),
        "processor": processor_table(trace, bucket),
        "jump_if_not_zero": jump_table(trace, int(InstructionType.JumpIfNotZero), bucket),
        "jump_if_zero": jump_table(trace, int(InstructionType.JumpIfZero), bucket),
    }
    for name, op in OPCODES.items():
        tables[f"{name}_instruction"] = opcode_table(trace, int(op), bucket)
    tables["end_of_execution"] = end_of_execution_table(trace)
    return tables
