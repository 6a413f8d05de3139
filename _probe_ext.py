import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from stwo_brainfuck_tpu.core import fft
from stwo_brainfuck_tpu.ops import fft_pallas as fp
from stwo_brainfuck_tpu.core.m31 import P_INT

rng = np.random.default_rng(0)

def _t(f):
    t0 = time.time(); f(); return time.time() - t0

def rate(make_loop, vals, k_lo=2, k_hi=8):
    ts = {}
    for k in (k_lo, k_hi):
        np.asarray(make_loop(vals, k))
        ts[k] = min(_t(lambda: np.asarray(make_loop(vals, k))) for _ in range(3))
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)

for C, n in ((9, 20), (22, 18), (4, 16)):
    vals = jnp.asarray(rng.integers(0, P_INT, (C, 1 << n), dtype=np.uint32))
    ti_x = fft._device_twiddles(n)[1]; tf_x = fft._device_twiddles(n + 1)[0]
    fp.evaluate(vals, n)  # build tables eagerly
    fp.interpolate(vals, n); fp.evaluate(jnp.pad(vals, ((0,0),(0,1 << n))), n + 1)
    ti_p = fp._dev_tables(n, True); tf_p = fp._dev_tables(n + 1, False)

    @partial(jax.jit, static_argnames=("k",))
    def loop_x(v, k):
        def body(i, x):
            c, e = fft._extend_jit(x, ti_x, tf_x, n, 1)
            return e[:, :1 << n]
        return jax.lax.fori_loop(0, k, body, v)[:1, :1]

    @partial(jax.jit, static_argnames=("k",))
    def loop_p(v, k):
        def body(i, x):
            c, e = fp._extend_jit(x, ti_p, tf_p, n, 1)
            return e[:, :1 << n]
        return jax.lax.fori_loop(0, k, body, v)[:1, :1]

    tx = rate(loop_x, vals); tp = rate(loop_p, vals)
    print(f"extend C={C} n={n}->{n+1}: XLA {tx*1e3:.1f}ms  pallas {tp*1e3:.1f}ms  ({tx/tp:.2f}x)", flush=True)
