"""Benchmark: end-to-end proof of fib19.bf (the BASELINE.md headline).

Runs on the default JAX platform (the real TPU chip under the driver; set
STWO_BF_PLATFORM=cpu to force CPU). Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no numbers (BASELINE.md) and the Rust
toolchain is absent from this image, so no measured Rust baseline exists;
reported as the ratio against BASELINE_SECONDS if a baseline file
(.bench_baseline.json with {"fib19_prove_s": ...}) is present, else 1.0.
"""

import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                    stream=sys.stderr)


def main() -> int:
    platform = os.environ.get("STWO_BF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from stwo_brainfuck_tpu import air
    from stwo_brainfuck_tpu.vm.compiler import compile_program
    from stwo_brainfuck_tpu.vm.machine import create_test_machine

    program = os.environ.get("BENCH_PROGRAM", "fib19")

    if program == "m31":
        # microbenchmark mode: M31 multiply throughput per chip
        from stwo_brainfuck_tpu.ops.m31_pallas import throughput_benchmark

        r = throughput_benchmark(log_n=24, iters=30)
        best = max(r.values())
        print(json.dumps({
            "metric": "M31 multiply throughput per chip",
            "value": round(best / 1e9, 2),
            "unit": "Gop/s",
            "vs_baseline": 1.0,
            "paths": {k: round(v / 1e9, 2) for k, v in r.items()},
        }))
        return 0
    path = f"/root/reference/brainfuck_programs/{program}.bf"
    inputs = {"collatz": b"7\n", "a-bc": b"a"}.get(program, b"")

    with open(path) as f:
        code = compile_program(f.read())

    t0 = time.time()
    machine = create_test_machine(code, inputs)
    machine.execute()
    trace_time = time.time() - t0
    steps = len(machine.trace())
    print(f"# {program}: {steps} steps, trace {trace_time*1e3:.1f} ms "
          f"({steps/max(trace_time,1e-9)/1e6:.1f} MHz)", file=sys.stderr)

    # warm-up run (pays XLA compiles; persisted to the compilation cache)
    t0 = time.time()
    proof = air.prove_brainfuck(machine)
    cold = time.time() - t0
    print(f"# cold prove: {cold:.1f} s", file=sys.stderr)
    air.verify_brainfuck(proof)
    print("# proof verified", file=sys.stderr)

    # measured run
    t0 = time.time()
    proof = air.prove_brainfuck(machine)
    warm = time.time() - t0
    total = trace_time + warm
    khz = steps / total / 1e3
    print(f"# warm prove: {warm:.2f} s  ({khz:.2f} kHz end-to-end)", file=sys.stderr)

    vs_baseline = 1.0
    try:
        with open(os.path.join(os.path.dirname(__file__), ".bench_baseline.json")) as f:
            base = json.load(f).get(f"{program}_prove_s")
        if base:
            vs_baseline = base / total
    except FileNotFoundError:
        pass

    print(json.dumps({
        "metric": f"{program}.bf prove wall-clock (trace+proof, warm)",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 3),
        "steps": steps,
        "proof_khz": round(khz, 2),
        "cold_prove_s": round(cold, 1),
        "proof_bytes": len(json.dumps(proof)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
