"""Driver-bench output contract (VERDICT r3 weak #1 / next #1).

The round driver parses the LAST stdout line of bench.py as JSON and its
capture buffer truncates long lines (BENCH_r02: rc=0 but parsed=null because
the final line embedded the full suite dict). These tests pin the contract:
one final line, valid JSON, compact (< 2000 chars) even with every suite
program present, and emitted exactly once. Plus: warmup()'s cross-claim
thunk-key dedup that keeps the suite's warmup affordable."""

import contextlib
import importlib.util
import io
import json
import os
import sys

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_head():
    return {
        "steps": 199246, "trace_ms": 11.1, "warmup_s": 95.3,
        "first_prove_s": 4.4, "warm_prove_s": 1.47,
        "warm_runs_s": [1.47, 1.52, 1.61], "total_s": 1.481, "khz": 134.53,
        "proof_bytes": 515641, "verified": True,
        "first_verify_s": 0.35, "verify_s": 0.33,
    }


def test_final_line_is_single_compact_json(bench):
    results = {"fib19": _fake_head()}
    for p in bench.SUITE:
        results.setdefault(p, dict(_fake_head(), khz=3.14159))
    results["sierpinski"] = {
        "steps": 257750, "refusal_s": 0.41,
        "error": "ProvingError: program exceeds the 2^24 rows/component "
                 "capacity (reference LOG_MAX_ROWS): {'memory': 26}"}
    results["hello4"] = {"skipped": "budget (12s left, need 90s)"}

    bench._EMITTED = False
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.emit_final(results["fib19"], results, "fib19",
                         partial="skipped: hello4")
        bench.emit_final(results["fib19"], results, "fib19")  # second: no-op
    out = buf.getvalue()
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, "emit_final must print exactly once"
    assert len(lines[0]) < 2000, f"final line too long: {len(lines[0])}"
    parsed = json.loads(lines[0])
    assert parsed["metric"].startswith("fib19.bf")
    assert parsed["value"] == 1.481
    assert parsed["baseline_kind"] == "round1_self"
    assert set(parsed["suite"]) == set(results)
    bench._EMITTED = False


def test_emit_without_headline_is_noop(bench):
    bench._EMITTED = False
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.emit_final(None, {}, "fib19")
    assert buf.getvalue() == ""
    assert bench._EMITTED is False


def test_suite_order_attempts_big22_first(bench):
    """VERDICT r4 item 2: big22 (the near-capacity throughput regime) must
    be attempted IMMEDIATELY after the headline, while its reserve still
    fits the budget — three rounds of small-programs-first ordering starved
    it. Its reserve stays the largest (it is the most expensive attempt)."""
    assert bench.SUITE[0] == "big22"
    assert bench.RESERVE_S["big22"] >= max(
        v for k, v in bench.RESERVE_S.items() if k != "big22")


def test_warmup_thunk_keys_dedup_across_claims():
    """Two claims sharing component sizes must share most thunk keys, and a
    seen-set pass over both claims must enumerate strictly fewer new thunks
    the second time (bench.py warms the suite union this way)."""
    from stwo_brainfuck_tpu import warmup
    from stwo_brainfuck_tpu.air import COMPONENT_CLASSES
    from stwo_brainfuck_tpu.core.pcs import PcsConfig

    cfg = PcsConfig(log_max_rows=0)
    claim_a = {c.name: 4 for c in COMPONENT_CLASSES}
    claim_a["memory"] = 6
    claim_b = dict(claim_a)
    claim_b["processor"] = 5  # one component grows; the rest shared

    ta = warmup.warmup_thunks(claim_a, cfg)
    tb = warmup.warmup_thunks(claim_b, cfg)
    keys_a = {k for _n, k, _t in ta}
    keys_b = {k for _n, k, _t in tb}
    assert len(keys_a) == len(ta), "keys must be unique within a claim"
    # determinism: re-enumeration gives the same keys
    assert keys_a == {k for _n, k, _t in warmup.warmup_thunks(claim_a, cfg)}
    shared = keys_a & keys_b
    assert len(shared) >= len(keys_b) // 3, (len(shared), len(keys_b))
    # union warm: second claim only pays its novel shapes
    novel_b = keys_b - keys_a
    assert len(novel_b) < len(keys_b)
