"""Split one big warmup thunk's cost into trace (lower) vs load (compile).

Hot persistent cache assumed. Run serially — no thread contention.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from stwo_brainfuck_tpu.components.defs import MemoryComponent, ELEMENT_SIZES
from stwo_brainfuck_tpu.core.rowref import RowRef
from stwo_brainfuck_tpu.framework.component import (
    LookupElements, _device_perm, _interaction_fn)

n = 20  # fib19 memory size


def sds(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in LookupElements.dummy(s).device().items()}
           for k, s in ELEMENT_SIZES.items()}

c = MemoryComponent(n)
fn = _interaction_fn(MemoryComponent, n)
mat = sds(len(c.columns), 1 << n)
main = {name: RowRef(mat, i) for i, name in enumerate(c.columns)}

t0 = time.time()
perm = _device_perm(n)
t_perm = time.time() - t0

t0 = time.time()
low = fn.lower(main, els_dev, perm)
t_trace = time.time() - t0

t0 = time.time()
low.compile()
t_load = time.time() - t0

print(f"perm build {t_perm:.1f}s  trace {t_trace:.1f}s  compile/load {t_load:.1f}s")
