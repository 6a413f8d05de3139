import logging, sys, time
logging.basicConfig(level=logging.INFO, stream=sys.stderr)
import numpy as np
from stwo_brainfuck_tpu import air, warmup
from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.core.pcs import PcsConfig
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

with open("/root/reference/brainfuck_programs/fib19.bf") as f:
    m = create_test_machine(compile_program(f.read()), b"")
m.execute()
tabs = T.all_tables(m.trace(), m.program())
claim = {k: int(np.log2(len(next(iter(v.values()))))) for k, v in tabs.items()}
t0 = time.time()
warmup.warmup(claim, PcsConfig(log_max_rows=0))
print(f"warmup_s={time.time()-t0:.1f}", flush=True)
t0 = time.time()
proof = air.prove_brainfuck(m)
print(f"first_prove_s={time.time()-t0:.1f}", flush=True)
for i in range(3):
    t0 = time.time()
    proof = air.prove_brainfuck(m)
    print(f"warm_prove_s={time.time()-t0:.1f}", flush=True)
air.verify_brainfuck(proof)
print("verified OK")
