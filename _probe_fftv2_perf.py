import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from stwo_brainfuck_tpu.core import fft
from stwo_brainfuck_tpu.ops import fft_pallas as fp
from stwo_brainfuck_tpu.core.m31 import P_INT

rng = np.random.default_rng(0)

def rate(fn, vals, bf, k_lo=4, k_hi=16):
    run = jax.jit(lambda v, k: jax.lax.fori_loop(0, k, lambda i, x: fn(x), v)[:1, :1],
                  static_argnames=("k",))
    ts = {}
    for k in (k_lo, k_hi):
        np.asarray(run(vals, k))
        ts[k] = min(_t(lambda: np.asarray(run(vals, k))) for _ in range(3))
    return bf * (k_hi - k_lo) / (ts[k_hi] - ts[k_lo])

def _t(f):
    t0 = time.time(); f(); return time.time() - t0

for log, C in ((18, 8), (20, 8), (21, 4)):
    vals = jnp.asarray(rng.integers(0, P_INT, (C, 1 << log), dtype=np.uint32))
    bf = C * log * (1 << (log - 1))
    np.asarray(fp.evaluate(vals, log)); np.asarray(fp.interpolate(vals, log))  # build tables eagerly
    tw_e = fft._device_twiddles(log)[0]
    r_x = rate(lambda v: fft._evaluate_jit(v, tw_e, log), vals, bf)
    r_p = rate(lambda v: fp.evaluate(v, log), vals, bf)
    tw_i = fft._device_twiddles(log)[1]
    r_xi = rate(lambda v: fft._interpolate_jit(v, tw_i, log), vals, bf)
    r_pi = rate(lambda v: fp.interpolate(v, log), vals, bf)
    print(f"n={log} C={C}: eval XLA {r_x/1e9:.1f}G vs pallas {r_p/1e9:.1f}G "
          f"({r_p/r_x:.2f}x) | interp XLA {r_xi/1e9:.1f}G vs pallas {r_pi/1e9:.1f}G "
          f"({r_pi/r_xi:.2f}x)", flush=True)
