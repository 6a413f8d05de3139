import os, time, numpy as np
from stwo_brainfuck_tpu import air
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

with open("/root/reference/brainfuck_programs/fib19.bf") as f:
    m = create_test_machine(compile_program(f.read()), b"")
m.execute()
# load both paths' executables
os.environ["STWO_BF_PALLAS_FFT"] = "1"; air.prove_brainfuck(m)
os.environ["STWO_BF_PALLAS_FFT"] = "0"; air.prove_brainfuck(m)
for rnd in range(3):
    for mode in ("1", "0"):
        os.environ["STWO_BF_PALLAS_FFT"] = mode
        t0 = time.time(); air.prove_brainfuck(m); dt = time.time() - t0
        print(f"round {rnd} pallas={mode}: {dt:.2f}s", flush=True)
