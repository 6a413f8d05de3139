"""Instrumented serial warmup: log every persistent-cache read (name, size, time)."""
import logging, os, sys, time
logging.basicConfig(level=logging.INFO, stream=sys.stderr)
import numpy as np
import jax._src.compiler as comp

_orig = comp._cache_read
LOG = []
def patched(module_name, cache_key, compile_options, backend, *a, **k):
    t0 = time.time()
    r = _orig(module_name, cache_key, compile_options, backend, *a, **k)
    dt = time.time() - t0
    path = os.path.join("/root/.cache/stwo_bf_jax", f"{module_name}-{cache_key}-cache")
    sz = os.path.getsize(path) if os.path.exists(path) else -1
    LOG.append((module_name, sz, dt, r[0] is not None))
    print(f"CACHEREAD {module_name} {sz} {dt:.2f} hit={r[0] is not None}", file=sys.stderr, flush=True)
    return r
comp._cache_read = patched

from stwo_brainfuck_tpu import warmup
from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.core.pcs import PcsConfig
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

with open("/root/reference/brainfuck_programs/fib19.bf") as f:
    m = create_test_machine(compile_program(f.read()), b"")
m.execute()
tabs = T.all_tables(m.trace(), m.program())
claim = {name: int(np.log2(len(next(iter(cols.values())))))
         for name, cols in tabs.items()}
t0 = time.time()
warmup.warmup(claim, PcsConfig(log_max_rows=0), max_workers=1)
total = time.time() - t0
print(f"serial_warmup_s={total:.1f}", file=sys.stderr)
n = len(LOG); tot_sz = sum(x[1] for x in LOG if x[1] > 0); tot_t = sum(x[2] for x in LOG)
print(f"reads={n} bytes={tot_sz/1e6:.1f}MB read_time={tot_t:.1f}s misses={sum(1 for x in LOG if not x[3])}", file=sys.stderr)
