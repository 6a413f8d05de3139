"""Device-side table building: the raw VM trace is the ONLY bulk upload.

The host table builders (tables.py) materialize ~34 MB of column data per
fib19 prove that then rides the relay at ~110 MB/s. Every one of those
columns is a cheap function of the (steps, 7) trace — gathers through a sort
permutation, clk-gap interleaves, power-of-two pads, successor rolls — so
this module ships the padded trace plus three small permutation/count arrays
(~10 MB total) and rebuilds all 13 component matrices bit-exactly in ONE
device executable.

Shape staticization: every input is padded to a claim-derived power of two
(trace to the processor height, permutations to their table heights), and
the data-dependent lengths (step count, per-opcode match counts) ride a
small scalar vector, so the executable is keyed by the claim alone — warmup
can AOT-load it without the trace.

Semantics mirror tables.py one-for-one (reference: the per-component
table.rs builders); `tests/test_device_build.py` pins bit-identity against
the host builders for every bundled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..core import m31
from ..vm.instruction import InstructionType
from . import tables as T

# scalar vector layout (uint32): [n_steps, n_ins_real, k_jnz, k_jz,
# k_plus, k_minus, k_left, k_right, k_input, k_output] padded to 16
_N_SCALARS = 16

_JUMPS = [("jump_if_not_zero", int(InstructionType.JumpIfNotZero)),
          ("jump_if_zero", int(InstructionType.JumpIfZero))]
_OPS = [(f"{name}_instruction", int(op)) for name, op in T.OPCODES.items()]


@dataclass
class TraceMeta:
    """Host-side quick pass over the trace: the claim plus the permutation /
    count arrays the device builder consumes. No full tables are built."""
    claim: Dict[str, int]
    n_steps: int
    plen: int
    order_mem: np.ndarray    # (Tp,) int32 into trace rows (padded w/ 0)
    counts_mem: np.ndarray   # (Tp,) int32, sum = memory height
    order_ins: np.ndarray    # (N_ins,) int32 global: prog i -> i,
    #                          trace j -> PROG_CAP + j; pad = last real
    sel: Dict[str, np.ndarray]  # per jump/opcode table: (K,) int32 row idx
    k: Dict[str, int]
    prog_cols: np.ndarray    # (4, PROG_CAP) uint32 program table
    eoe_cols: np.ndarray     # (7, 16) uint32


def build_meta(trace: np.ndarray, program: List[int],
               bucket: bool = True) -> TraceMeta:
    n = len(trace)
    clk, ip, ci = trace[:, 0], trace[:, 1], trace[:, 2]
    mp = trace[:, 4]
    plen = len(program)

    # memory: sort by (mp, clk); counts = 1 + clk gap after each sorted row,
    # power-of-two pad folded into the LAST row's count (pad rows continue
    # the clk series with mp/mv frozen — the same pattern as a gap block)
    order_mem = np.lexsort((clk, mp)).astype(np.int32)
    clk_s = clk[order_mem].astype(np.int64)
    mp_s = mp[order_mem].astype(np.int64)
    if n > 1:
        same = mp_s[1:] == mp_s[:-1]
        gaps = np.maximum(np.where(same, clk_s[1:] - clk_s[:-1] - 1, 0), 0)
    else:
        gaps = np.zeros(0, np.int64)
    n_mem_real = n + int(gaps.sum())
    n_mem = T._next_pow2_len(n_mem_real, bucket)
    counts_mem = np.ones(n, np.int64)
    counts_mem[:-1] += gaps
    counts_mem[-1] += n_mem - n_mem_real

    # instruction: concat(program rows, trace rows) sorted by (ip, clk) with
    # program entries first on ties (stable sort, program clk = 0)
    n_ins_real = plen + n
    n_ins = T._next_pow2_len(n_ins_real, bucket)
    cat_ip = np.concatenate([np.arange(plen, dtype=np.int64),
                             ip.astype(np.int64)])
    cat_clk = np.concatenate([np.zeros(plen, np.int64), clk.astype(np.int64)])
    order_i = np.argsort((cat_ip << 32) | cat_clk, kind="stable")
    prog_cap = T._next_pow2_len(plen, bucket)
    glob = np.where(order_i < plen, order_i, prog_cap + order_i - plen)
    order_ins = np.full(n_ins, glob[-1], np.int32)
    order_ins[:n_ins_real] = glob

    claim = {
        "memory": int(np.log2(n_mem)),
        "instruction": int(np.log2(n_ins)),
        "program": int(np.log2(prog_cap)),
        "processor": int(np.log2(T._next_pow2_len(n, bucket))),
        "end_of_execution": T.MIN_LOG_SIZE,
    }

    sel: Dict[str, np.ndarray] = {}
    k: Dict[str, int] = {}
    ci_head = ci[:-1]
    for name, op in _JUMPS + _OPS:
        idx = np.nonzero(ci_head == op)[0].astype(np.int32)
        kk = len(idx)
        # mirror _pad_entries: table rows = target_entries / 2
        rows = T._next_pow2_len(max(1, 2 * kk) // 2 + (2 * kk) % 2, bucket)
        s = np.zeros(rows, np.int32)
        s[:kk] = idx
        sel[name] = s
        k[name] = kk
        claim[name] = int(np.log2(rows))

    return TraceMeta(
        claim=claim, n_steps=n, plen=plen, order_mem=order_mem,
        counts_mem=counts_mem.astype(np.int32), order_ins=order_ins,
        sel=sel, k=k,
        prog_cols=np.stack(list(T.program_table(program, bucket).values())),
        eoe_cols=np.stack(list(T.end_of_execution_table(trace).values())),
    )


def _layout(claim: Dict[str, int]) -> tuple:
    """Static (name, shape) schedule of the single upload buffer — derived
    from the claim alone so warmup can AOT-load the builder executable."""
    tp = 1 << claim["processor"]
    pc = 1 << claim["program"]
    parts = [("trace", (7, tp)), ("order_mem", (tp,)), ("counts_mem", (tp,)),
             ("order_ins", (1 << claim["instruction"],))]
    for name, _ in _JUMPS + _OPS:
        parts.append((f"sel/{name}", (1 << claim[name],)))
    parts.append(("prog", (4, pc)))
    parts.append(("eoe", (7, 1 << T.MIN_LOG_SIZE)))
    parts.append(("scalars", (_N_SCALARS,)))
    return tuple(parts)


def upload_inputs(trace: np.ndarray, meta: TraceMeta) -> jnp.ndarray:
    """Concatenate every builder input into one uint32 buffer (ONE relay
    upload RPC)."""
    tp = 1 << meta.claim["processor"]
    tr = np.zeros((7, tp), np.uint32)
    tr[:, :meta.n_steps] = trace.T
    scalars = np.zeros(_N_SCALARS, np.uint32)
    scalars[0] = meta.n_steps
    scalars[1] = meta.plen + meta.n_steps
    for i, (name, _) in enumerate(_JUMPS + _OPS):
        scalars[2 + i] = meta.k[name]
    views = [tr.ravel(),
             meta.order_mem.astype(np.uint32),
             np.zeros(tp - meta.n_steps, np.uint32),
             meta.counts_mem.astype(np.uint32),
             np.zeros(tp - meta.n_steps, np.uint32),
             meta.order_ins.astype(np.uint32)]
    for name, _ in _JUMPS + _OPS:
        views.append(meta.sel[name].astype(np.uint32))
    views.append(meta.prog_cols.ravel())
    views.append(meta.eoe_cols.ravel())
    views.append(scalars)
    return jnp.asarray(np.concatenate(views))


def _roll_next(col, kind):
    last = {"inc": col[-1] + np.uint32(1), "hold": col[-1],
            "zero": jnp.uint32(0), "one": jnp.uint32(1)}[kind]
    return jnp.roll(col, -1).at[-1].set(last)


@partial(jax.jit, static_argnames=("claim_t",))
def _build_tables_jit(buf: jnp.ndarray, claim_t: tuple):
    """All 13 component matrices from the single input buffer. claim_t is
    the claim as a sorted tuple of (name, log) pairs."""
    claim = dict(claim_t)
    parts = {}
    off = 0
    for name, shape in _layout(claim):
        size = int(np.prod(shape))
        parts[name] = jax.lax.slice(buf, (off,), (off + size,)).reshape(shape)
        off += size
    trace = parts["trace"]
    sc = parts["scalars"]
    n_steps = sc[0]
    tclk, tip, tci, tni, tmp, tmv, tmvi = (trace[i] for i in range(7))

    out: Dict[str, jnp.ndarray] = {}

    # memory -------------------------------------------------------------
    n_mem = 1 << claim["memory"]
    order = parts["order_mem"].astype(np.int32)
    counts = parts["counts_mem"].astype(np.int32)
    src = jnp.repeat(jnp.arange(counts.shape[0], dtype=np.int32), counts,
                     total_repeat_length=n_mem)
    starts = jnp.concatenate([jnp.zeros(1, np.int32),
                              jnp.cumsum(counts, dtype=np.int32)[:-1]])
    within = (jnp.arange(n_mem, dtype=np.int32) - starts[src]).astype(np.uint32)
    clk_o = tclk[order][src] + within
    mp_o = tmp[order][src]
    mv_o = tmv[order][src]
    d_o = (within > 0).astype(np.uint32)
    out["memory"] = jnp.stack([
        clk_o, mp_o, mv_o, d_o, _roll_next(clk_o, "inc"),
        _roll_next(mp_o, "hold"), _roll_next(mv_o, "hold"),
        _roll_next(d_o, "one")])

    # instruction ----------------------------------------------------------
    n_ins = 1 << claim["instruction"]
    prog = parts["prog"]
    gi = parts["order_ins"].astype(np.int32)
    pc = prog.shape[1]
    src_ip = jnp.concatenate([prog[0], tip])
    src_ci = jnp.concatenate([prog[1], tci])
    src_ni = jnp.concatenate([prog[2], tni])
    valid = (jnp.arange(n_ins, dtype=np.uint32) < sc[1])
    ip_o = src_ip[gi]
    ci_o = jnp.where(valid, src_ci[gi], 0)
    ni_o = jnp.where(valid, src_ni[gi], 0)
    di_o = (~valid).astype(np.uint32)
    out["instruction"] = jnp.stack([
        ip_o, ci_o, ni_o, di_o, _roll_next(ip_o, "hold"),
        _roll_next(ci_o, "zero"), _roll_next(ni_o, "zero"),
        _roll_next(di_o, "one")])

    out["program"] = prog

    # processor ------------------------------------------------------------
    tp = trace.shape[1]
    pidx = jnp.arange(tp, dtype=np.uint32)
    pvalid = pidx < n_steps
    last_clk = tclk[n_steps - 1]
    last_ip = tip[n_steps - 1]
    pclk = jnp.where(pvalid, tclk, last_clk + np.uint32(1) + pidx - n_steps)
    pip = jnp.where(pvalid, tip, last_ip)
    z = jnp.zeros(tp, np.uint32)
    pci = jnp.where(pvalid, tci, z)
    pni = jnp.where(pvalid, tni, z)
    pmp = jnp.where(pvalid, tmp, z)
    pmv = jnp.where(pvalid, tmv, z)
    pmvi = jnp.where(pvalid, tmvi, z)
    pd = (~pvalid).astype(np.uint32)
    out["processor"] = jnp.stack([pclk, pip, pci, pni, pmp, pmv, pmvi, pd,
                                  _roll_next(pclk, "inc")])

    # jump + opcode tables ---------------------------------------------------
    for i, (name, _) in enumerate(_JUMPS + _OPS):
        kk = sc[2 + i]
        s = parts[f"sel/{name}"].astype(np.int32)
        rows = s.shape[0]
        r = jnp.arange(rows, dtype=np.uint32)
        v = r < kk
        # last real entry = e2 of the final matched pair (_pad_entries)
        lk = jnp.where(kk > 0, tclk[s[kk - 1] + 1], 0)
        li = jnp.where(kk > 0, tip[s[kk - 1] + 1], 0)
        pad1 = np.uint32(2) * (r - kk)          # e1 pad offset 2(r-k)
        pad2 = pad1 + np.uint32(1)

        def g(col, idx):
            return col[idx]

        e1 = {c: jnp.where(v, g(col, s), 0) for c, col in
              zip("clk ip ci ni mp mv mvi".split(),
                  (tclk, tip, tci, tni, tmp, tmv, tmvi))}
        e2 = {c: jnp.where(v, g(col, s + 1), 0) for c, col in
              zip("clk ip ci ni mp mv mvi".split(),
                  (tclk, tip, tci, tni, tmp, tmv, tmvi))}
        e1["clk"] = jnp.where(v, e1["clk"], lk + pad1)
        e2["clk"] = jnp.where(v, e2["clk"], lk + pad2)
        e1["ip"] = jnp.where(v, e1["ip"], li)
        e2["ip"] = jnp.where(v, e2["ip"], li)
        d1 = (~v).astype(np.uint32)
        if name in ("jump_if_not_zero", "jump_if_zero"):
            is_mv_zero = m31.sub(jnp.ones(rows, np.uint32),
                                 m31.mul(e1["mv"], e1["mvi"]))
            out[name] = jnp.stack([
                e1["clk"], e1["ip"], e1["ci"], e1["ni"], e1["mp"], e1["mv"],
                e1["mvi"], e2["clk"], e2["ip"], e2["mp"], e2["mv"], d1,
                is_mv_zero])
        else:
            out[name] = jnp.stack([
                e1["clk"], e1["ip"], e1["ci"], e1["ni"], e1["mp"], e1["mv"],
                e1["mvi"], d1, e2["ip"], e2["mp"], e2["mv"]])

    out["end_of_execution"] = parts["eoe"]
    return tuple(out[name] for name, _ in sorted(claim.items()))


def claim_key(claim: Dict[str, int]) -> tuple:
    return tuple(sorted(claim.items()))


def build_device_tables(trace: np.ndarray, meta: TraceMeta) -> Dict[str, jnp.ndarray]:
    """(name -> (n_cols, N) device matrix) with ONE upload and ONE dispatch."""
    buf = upload_inputs(trace, meta)
    mats = _build_tables_jit(buf, claim_key(meta.claim))
    return {name: mat for (name, _), mat in
            zip(sorted(meta.claim.items()), mats)}
