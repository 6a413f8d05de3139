"""Profile the warmup thunk distribution and first-prove residuals on TPU.

Runs warmup(claim) with DEBUG logging (per-thunk times), then one prove with
jax_log_compiles to catch any executable that was not covered, then a warm
prove with per-phase timing.
"""
import logging
import sys
import time

logging.basicConfig(level=logging.DEBUG, format="%(asctime)s %(message)s",
                    stream=sys.stderr)
logging.getLogger("jax").setLevel(logging.WARNING)

import numpy as np

from stwo_brainfuck_tpu import air, warmup as warmup_mod
from stwo_brainfuck_tpu.components import tables as tables_mod
from stwo_brainfuck_tpu.core.pcs import PcsConfig
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

with open("/root/reference/brainfuck_programs/fib19.bf") as f:
    code = compile_program(f.read())
machine = create_test_machine(code, b"")
machine.execute()

tabs = tables_mod.all_tables(machine.trace(), machine.program())
claim = {name: int(np.log2(len(next(iter(cols.values())))))
         for name, cols in tabs.items()}

t0 = time.time()
warmup_mod.warmup(claim, PcsConfig(log_max_rows=0))
print(f"WARMUP {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

import jax
jax.config.update("jax_log_compiles", True)
logging.getLogger("jax").setLevel(logging.DEBUG)

t0 = time.time()
proof = air.prove_brainfuck(machine)
print(f"FIRST_PROVE {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

logging.getLogger("jax").setLevel(logging.WARNING)
t0 = time.time()
proof = air.prove_brainfuck(machine)
print(f"WARM_PROVE {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
