"""Re-seed the persistent XLA compilation cache for the CURRENT source tree.

Round-3 and round-4 postmortem (VERDICT.md): the driver bench runs in a
fresh process against whatever persistent cache exists; if the round's final
code changes landed AFTER the last full warmup run, the driver pays real
compiles (695 s observed) instead of cache loads (~95 s). This script is the
checklist item that prevents that: run it (on the real TPU platform) AFTER
the last code change of a round. It:

1. warms the UNION of the bench suite's claims in THIS fresh process
   (exactly bench.py's shared-seen walk), paying every compile once and
   writing the executables to the persistent cache;
2. writes `.cache_manifest.json` at the repo root with a hash of the source
   tree, which `tests/test_cache_manifest.py` pins: the test FAILS whenever
   the tree changes without a re-seed.

Usage:  python tools/seed_cache.py          (axon/TPU platform — the real cache)
        python tools/seed_cache.py --hash-only   (just refresh the manifest)
"""

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tree_hash() -> str:
    """sha256 over the sorted (relative path, file sha256) list of every
    tracked source file that can influence compiled executables."""
    entries = []
    roots = ["stwo_brainfuck_tpu"]
    files = ["bench.py", "__graft_entry__.py"]
    for root in roots:
        for dirpath, _dirs, names in os.walk(os.path.join(REPO, root)):
            for n in sorted(names):
                if n.endswith(".py"):
                    files.append(os.path.relpath(os.path.join(dirpath, n), REPO))
    h = hashlib.sha256()
    for rel in sorted(set(files)):
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(rel.encode())
            h.update(hashlib.sha256(f.read()).digest())
    return h.hexdigest()


def suite_programs():
    sys.path.insert(0, REPO)
    import bench

    return [os.environ.get("BENCH_PROGRAM", "fib19")] + [
        p for p in bench.SUITE if os.environ.get("SEED_BIG", "1") != "0"
        or p != "big22"], bench


def main() -> int:
    t_start = time.time()
    manifest_path = os.path.join(REPO, ".cache_manifest.json")
    if "--hash-only" in sys.argv:
        payload = {"tree_hash": tree_hash(), "seeded": False}
        with open(manifest_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(payload))
        return 0

    programs, bench = suite_programs()
    import jax

    from stwo_brainfuck_tpu import warmup as warmup_mod
    from stwo_brainfuck_tpu.components.device_build import build_meta
    from stwo_brainfuck_tpu.core.pcs import PcsConfig
    from stwo_brainfuck_tpu.vm.compiler import compile_program
    from stwo_brainfuck_tpu.vm.machine import create_test_machine

    platform = jax.devices()[0].platform
    seen: set = set()
    per_program = {}
    for prog in programs:
        try:
            with open(bench.program_path(prog)) as f:
                code = compile_program(f.read())
            m = create_test_machine(code, bench.INPUTS.get(prog, b""))
            m.execute()
            claim = build_meta(m.trace(), m.program()).claim
            t0 = time.time()
            n = warmup_mod.warmup(claim, PcsConfig(log_max_rows=0), seen=seen)
            per_program[prog] = {"thunks": n,
                                 "warmup_s": round(time.time() - t0, 1)}
            print(f"# seeded {prog}: {per_program[prog]}", file=sys.stderr,
                  flush=True)
        except Exception as exc:  # capacity refusals etc.
            per_program[prog] = {"error": f"{type(exc).__name__}: {exc}"[:120]}
            print(f"# seed {prog} failed: {exc}", file=sys.stderr, flush=True)

    payload = {
        "tree_hash": tree_hash(),
        "seeded": True,
        "platform": str(platform),
        "programs": per_program,
        "total_s": round(time.time() - t_start, 1),
    }
    with open(manifest_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("tree_hash", "seeded", "platform", "total_s")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
