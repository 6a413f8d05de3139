import json, os, time, numpy as np
from stwo_brainfuck_tpu import air
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

with open("/root/reference/brainfuck_programs/fib19.bf") as f:
    m = create_test_machine(compile_program(f.read()), b"")
m.execute()
t0 = time.time(); p1 = air.prove_brainfuck(m); t1 = time.time() - t0
t0 = time.time(); p1 = air.prove_brainfuck(m); t2 = time.time() - t0
air.verify_brainfuck(p1)
print(f"pallas-FFT prove: first {t1:.1f}s warm {t2:.1f}s, verified", flush=True)

os.environ["STWO_BF_PALLAS_FFT"] = "0"
t0 = time.time(); p0 = air.prove_brainfuck(m); t3 = time.time() - t0
t0 = time.time(); p0 = air.prove_brainfuck(m); t4 = time.time() - t0
print(f"XLA-FFT prove: first {t3:.1f}s warm {t4:.1f}s", flush=True)
same = json.dumps(p0, sort_keys=True) == json.dumps(p1, sort_keys=True)
print(f"proof byte-identical across FFT paths: {same}")
assert same
