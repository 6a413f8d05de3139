"""Benchmark: end-to-end proofs of the reference's bundled programs.

Runs on the default JAX platform (the real TPU chip under the driver; set
STWO_BF_PLATFORM=cpu to force CPU). Prints ONE COMPACT JSON line for the
headline program (fib19.bf — the BASELINE.md workload) as the LAST stdout
line; the full per-program suite detail is written to BENCH_SUITE.json and
echoed to stderr.

Budget discipline (round-3 postmortem, VERDICT.md): the driver runs this
under a timeout, and round 3 starved the headline by warming 10 programs
serially and embedding a >4 KB suite dict in the final JSON line (which the
driver's tail parser could not recover even at rc=0 — BENCH_r02 rc=0 /
parsed=null). This version therefore:
  1. runs the HEADLINE first (warmup -> prove -> verify -> warm proves);
  2. walks the suite under a wall-clock budget (BENCH_BUDGET_S, default
     1500 s), skipping programs that no longer fit and gating big22 behind
     the largest reserve;
  3. warms the UNION of suite claims via a shared thunk-key set (each shape
     paid once, warmup(seen=...));
  4. keeps the final JSON line short (< ~2 KB) and prints it exactly once —
     also on SIGTERM/SIGALRM, so even a timeout records the headline.

Baseline semantics: the reference publishes no numbers (BASELINE.md) and the
Rust toolchain is absent from this image, so NO measured Rust baseline
exists. "vs_baseline" is therefore SELF-relative: the ratio against this
framework's own round-1 first build (.bench_baseline.json), duplicated as
"vs_round1_self" and labeled by "baseline_kind" so it cannot be read as a
reference comparison.

Env:
  BENCH_PROGRAM=fib19|collatz|...|m31|fft  headline program (m31/fft = micro)
  BENCH_SUITE=0                            skip the per-program suite
  BENCH_BUDGET_S=1500                      wall-clock budget (seconds)
  BENCH_BIG=0                              skip big22 regardless of budget
"""

import json
import logging
import os
import signal
import sys
import time

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                    stream=sys.stderr)

T_START = time.time()
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1500"))

# Suite order (VERDICT r4 item 2): big22 (repo-local synthetic, 2^22-row
# tables — the near-capacity throughput regime) runs IMMEDIATELY after the
# headline, while its 600 s reserve still fits the budget; the small
# programs follow with whatever is left (round 4 ordered them first and a
# long warmup starved big22 for the third round running). sierpinski is a
# MEASURED capacity refusal.
SUITE = ["big22", "loop", "a-bc", "hello1", "hello2", "hello3", "hello4",
         "hello_kakarot", "collatz"]
INPUTS = {"collatz": b"7\n", "a-bc": b"a"}
# Conservative wall-clock reserve needed to attempt each program (warmup of
# its novel shapes + first prove + 3 warm proves + 2 verifies), hot-cache.
RESERVE_S = {"collatz": 120.0, "big22": 600.0, "sierpinski": 90.0}
DEFAULT_RESERVE_S = 90.0


def remaining() -> float:
    return BUDGET - (time.time() - T_START)


def program_path(program: str) -> str:
    """Bundled reference programs, plus repo-local synthetic workloads
    (programs/big22.bf: 1.32M steps driving 2^22-row memory/instruction/
    processor tables — the near-capacity throughput regime; the reference
    suite never leaves the dispatch-latency regime)."""
    local = os.path.join(os.path.dirname(__file__), "programs", f"{program}.bf")
    if os.path.exists(local):
        return local
    return f"/root/reference/brainfuck_programs/{program}.bf"


def run_program(program, air, warmup_mod, PcsConfig, warm_seen):
    from stwo_brainfuck_tpu.vm.compiler import compile_program
    from stwo_brainfuck_tpu.vm.machine import create_test_machine

    with open(program_path(program)) as f:
        code = compile_program(f.read())

    t0 = time.time()
    machine = create_test_machine(code, INPUTS.get(program, b""))
    machine.execute()
    trace_time = time.time() - t0
    steps = len(machine.trace())

    # claim from the device-build meta (cheap; also what prove will use)
    from stwo_brainfuck_tpu.components.device_build import build_meta

    claim = build_meta(machine.trace(), machine.program()).claim
    t0 = time.time()
    warmup_mod.warmup(claim, PcsConfig(log_max_rows=0), seen=warm_seen)
    warm_s = time.time() - t0

    t0 = time.time()
    proof = air.prove_brainfuck(machine)
    first = time.time() - t0
    t0 = time.time()
    air.verify_brainfuck(proof)
    first_verify = time.time() - t0
    t0 = time.time()
    air.verify_brainfuck(proof)
    verify_s = time.time() - t0

    # Steady-state: best of 3 warm proves. The TPU relay's throughput
    # varies several-fold with ambient load; all runs are reported so the
    # variance is visible, the headline is the machine's capability.
    warm_runs = []
    for _ in range(3):
        t0 = time.time()
        proof = air.prove_brainfuck(machine)
        warm_runs.append(round(time.time() - t0, 2))
    warm = min(warm_runs)
    total = trace_time + warm
    return {
        "steps": steps,
        "trace_ms": round(trace_time * 1e3, 1),
        "warmup_s": round(warm_s, 1),
        "first_prove_s": round(first, 1),
        "warm_prove_s": warm,
        "warm_runs_s": warm_runs,
        "total_s": round(total, 3),
        "khz": round(steps / total / 1e3, 2),
        "proof_bytes": len(json.dumps(proof)),
        "verified": True,
        "first_verify_s": round(first_verify, 2),
        "verify_s": round(verify_s, 2),
    }


def measure_refusal(program, air):
    """Attempt the prove and time the capacity refusal (VERDICT r3 weak #8:
    the sierpinski entry used to be hardcoded; now it is produced by
    execution — VM run + trace meta + the ProvingError from the claim)."""
    from stwo_brainfuck_tpu.vm.compiler import compile_program
    from stwo_brainfuck_tpu.vm.machine import create_test_machine

    with open(program_path(program)) as f:
        code = compile_program(f.read())
    t0 = time.time()
    machine = create_test_machine(code, INPUTS.get(program, b""))
    machine.execute()
    steps = len(machine.trace())
    try:
        air.prove_brainfuck(machine)
    except air.ProvingError as exc:
        return {"steps": steps,
                "error": f"ProvingError: {exc}"[:160],
                "refusal_s": round(time.time() - t0, 2)}
    return {"steps": steps, "error": "expected ProvingError, prove succeeded"}


def fft_benchmark(log_n: int = 18, batch: int = 8, k_lo: int = 8,
                  k_hi: int = 32) -> dict:
    """Sustained CFFT throughput in butterflies/s (a size-2^n transform does
    n * 2^(n-1) butterflies) for the staged-XLA and hybrid-Pallas paths, on
    the dominant fib19 commitment shape (C=8 columns of 2^18).

    All iterations run inside ONE executable (fori_loop) and completion is
    forced by pulling a tiny slice; the reported rate is the slope between
    two loop counts. Through the axon relay, multi-dispatch timing loops
    measure enqueue rate, not compute (see m31_pallas.throughput_benchmark)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stwo_brainfuck_tpu.core import fft
    from stwo_brainfuck_tpu.ops import fft_pallas

    rng = np.random.default_rng(0)
    vals = jnp.asarray(
        rng.integers(0, (1 << 31) - 1, (batch, 1 << log_n), dtype=np.uint32))
    bf = batch * log_n * (1 << (log_n - 1))

    tw_eval, tw_interp = fft._device_twiddles(log_n)  # concrete, outside jit
    paths = {
        "xla": {
            "evaluate": lambda v: fft._evaluate_jit(v, tw_eval, log_n),
            "interpolate": lambda v: fft._interpolate_jit(v, tw_interp, log_n),
        },
    }
    if fft_pallas.available(log_n):
        paths["pallas"] = {
            "evaluate": lambda v: fft_pallas.evaluate(v, log_n),
            "interpolate": lambda v: fft_pallas.interpolate(v, log_n),
        }

    def timed(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    out = {}
    for name, fns in paths.items():
        out[name] = {}
        for op, fn in fns.items():
            run = jax.jit(
                lambda v, k, fn=fn: jax.lax.fori_loop(
                    0, k, lambda i, x: fn(x), v)[:1, :1],
                static_argnames=("k",))
            times = {}
            for k in (k_lo, k_hi):
                np.asarray(run(vals, k))  # compile + warm
                times[k] = min(
                    timed(lambda: np.asarray(run(vals, k)))
                    for _ in range(3))
            out[name][op] = bf * (k_hi - k_lo) / (times[k_hi] - times[k_lo])
    return out


def compact_suite(results: dict) -> dict:
    """Per-program one-liners for the final JSON line (< ~60 chars each);
    full detail lives in BENCH_SUITE.json + stderr."""
    out = {}
    for name, r in results.items():
        if "error" in r:
            out[name] = {"error": r["error"][:80]}
        elif "skipped" in r:
            out[name] = {"skipped": r["skipped"]}
        else:
            out[name] = {"warm_s": r["warm_prove_s"], "khz": r["khz"],
                         "ok": r.get("verified", False)}
    return out


_EMITTED = False


def emit_final(head, results, program, partial=None):
    """Print the one compact machine-readable line — exactly once, as the
    last stdout line."""
    global _EMITTED
    if _EMITTED or head is None:
        return
    _EMITTED = True
    vs_self = 1.0
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               ".bench_baseline.json")) as f:
            base = json.load(f).get(f"{program}_prove_s")
        if base:
            vs_self = base / head["total_s"]
    except (OSError, ValueError):
        pass
    line = json.dumps({
        "metric": f"{program}.bf prove wall-clock (trace+proof, warm)",
        "value": head["total_s"],
        "unit": "s",
        # SELF-relative (vs this framework's round-1 first build) — no Rust
        # baseline can exist in this image; see module docstring.
        "vs_baseline": round(vs_self, 3),
        "baseline_kind": "round1_self",
        "vs_round1_self": round(vs_self, 3),
        "steps": head["steps"],
        "proof_khz": head["khz"],
        "warmup_s": head["warmup_s"],
        "cold_prove_s": round(head["warmup_s"] + head["first_prove_s"], 1),
        "verify_s": head["verify_s"],
        "proof_bytes": head["proof_bytes"],
        "elapsed_s": round(time.time() - T_START, 1),
        "budget_s": BUDGET,
        "partial": partial or "",
        "suite": compact_suite(results),
    })
    print(line, flush=True)


def main() -> int:
    platform = os.environ.get("STWO_BF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from stwo_brainfuck_tpu import air, warmup as warmup_mod
    from stwo_brainfuck_tpu.core.pcs import PcsConfig

    # Cache-seed status (VERDICT r4 item 1): record in the driver-visible
    # stderr whether the persistent cache was seeded for THIS source tree
    # (tools/seed_cache.py); a stale manifest means the warmup below pays
    # real compiles instead of cache loads.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        import seed_cache

        with open(os.path.join(os.path.dirname(__file__),
                               ".cache_manifest.json")) as f:
            manifest = json.load(f)
        fresh = manifest.get("tree_hash") == seed_cache.tree_hash()
        logging.info("cache manifest: seeded=%s tree_match=%s",
                     manifest.get("seeded"), fresh)
    except Exception as exc:
        logging.info("cache manifest: unavailable (%s)", exc)

    program = os.environ.get("BENCH_PROGRAM", "fib19")

    if program == "m31":
        # microbenchmark mode: M31 multiply throughput per chip
        from stwo_brainfuck_tpu.ops.m31_pallas import throughput_benchmark

        r = throughput_benchmark(log_n=24)
        best = max(r.values())
        print(json.dumps({
            "metric": "M31 multiply throughput per chip",
            "value": round(best / 1e9, 2),
            "unit": "Gop/s",
            "vs_baseline": 1.0,
            "paths": {k: round(v / 1e9, 2) for k, v in r.items()},
        }))
        return 0

    if program == "fft":
        # microbenchmark mode: CFFT butterflies/s per chip (PERF.md §2),
        # both the staged-XLA and the hybrid-Pallas paths on fib19 shapes.
        r = fft_benchmark()
        best = max(v for d in r.values() for v in d.values())
        print(json.dumps({
            "metric": "CFFT butterflies per second per chip",
            "value": round(best / 1e9, 2),
            "unit": "Gbutterfly/s",
            "vs_baseline": 1.0,
            "paths": {k: {kk: round(v / 1e9, 2) for kk, v in d.items()}
                      for k, d in r.items()},
        }))
        return 0

    results = {}
    head_box = {"head": None}

    def on_deadline(signum, frame):
        # timeout backstop: record whatever completed, headline included
        if head_box["head"] is None and signum == signal.SIGALRM:
            # the headline itself overran the budget: the only useful move
            # is to keep going (the driver's own timeout is the hard stop —
            # dying now would record nothing)
            signal.alarm(300)
            return
        emit_final(head_box["head"], results, program,
                   partial=f"signal {signum} at {remaining():.0f}s remaining")
        sys.stdout.flush()
        os._exit(0 if head_box["head"] is not None else 1)

    signal.signal(signal.SIGTERM, on_deadline)
    signal.signal(signal.SIGALRM, on_deadline)
    signal.alarm(max(60, int(BUDGET)))

    warm_seen: set = set()
    head = run_program(program, air, warmup_mod, PcsConfig, warm_seen)
    head_box["head"] = head
    results[program] = head
    print(f"# {program}: {head}", file=sys.stderr, flush=True)

    partial = []
    if os.environ.get("BENCH_SUITE", "1") != "0":
        for p in SUITE:
            if p == program or p in results:
                continue
            if p == "big22" and os.environ.get("BENCH_BIG", "1") == "0":
                results[p] = {"skipped": "BENCH_BIG=0"}
                continue
            need = RESERVE_S.get(p, DEFAULT_RESERVE_S)
            if remaining() < need:
                results[p] = {"skipped": f"budget ({remaining():.0f}s left, "
                                         f"need {need:.0f}s)"}
                partial.append(p)
                continue
            try:
                results[p] = run_program(p, air, warmup_mod, PcsConfig,
                                         warm_seen)
            except Exception as exc:  # e.g. capacity refusal
                results[p] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
            # The chip is time-shared: a near-capacity attempt (big22) that
            # finishes or OOMs under co-tenant HBM pressure must not leave
            # ~2 GiB of big twiddle/point/ladder caches pinned while the
            # small programs run (measured 2026-08-20: a big22 OOM cascaded
            # RESOURCE_EXHAUSTED through the whole remaining suite).
            if p == "big22" or "ResourceExhausted" in results[p].get(
                    "error", ""):
                air.release_device_caches()
            print(f"# {p}: {results[p]}", file=sys.stderr, flush=True)
        # capacity refusal, measured by execution (not hardcoded)
        if remaining() >= RESERVE_S["sierpinski"]:
            results["sierpinski"] = measure_refusal("sierpinski", air)
        else:
            results["sierpinski"] = {"skipped": "budget"}
            partial.append("sierpinski")
        print(f"# sierpinski: {results['sierpinski']}", file=sys.stderr,
              flush=True)

    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BENCH_SUITE.json"), "w") as f:
            json.dump(results, f, indent=1)
    except OSError:
        pass

    signal.alarm(0)
    emit_final(head, results, program,
               partial=("skipped: " + ",".join(partial)) if partial else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
