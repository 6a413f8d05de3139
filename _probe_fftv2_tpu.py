import time, numpy as np, jax, jax.numpy as jnp
from stwo_brainfuck_tpu.core import fft
from stwo_brainfuck_tpu.ops import fft_pallas as fp
from stwo_brainfuck_tpu.core.m31 import P_INT

rng = np.random.default_rng(7)
for log in (12, 17, 20, 21):
    vals = jnp.asarray(rng.integers(0, P_INT, (4, 1 << log), dtype=np.uint32))
    t0 = time.time()
    ev = np.asarray(fp.evaluate(vals, log))
    t1 = time.time()
    ev_ref = np.asarray(fft._evaluate_jit(vals, fft._device_twiddles(log)[0], log))
    assert np.array_equal(ev, ev_ref), f"n={log} evaluate mismatch"
    ip = np.asarray(fp.interpolate(vals, log))
    ip_ref = np.asarray(fft._interpolate_jit(vals, fft._device_twiddles(log)[1], log))
    assert np.array_equal(ip, ip_ref), f"n={log} interpolate mismatch"
    print(f"n={log}: bit-exact on TPU (n1={fp._plan(log)[2]}, first-call {t1-t0:.1f}s)", flush=True)
print("ALL OK")
