"""Verify the fft_pallas.extend_with_coeffs AOT fix: after aot=True, the
real dispatch must not compile or reload (fresh shape C=7, lg=18)."""
import logging
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
jax.config.update("jax_log_compiles", True)

from stwo_brainfuck_tpu.core import fft
from stwo_brainfuck_tpu.core.rowref import RowRef

lg, blow, C = 18, 1, 7

def sds(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.uint32)

cols_w = tuple(RowRef(sds(C, 1 << lg), r) for r in range(C))
t0 = time.time()
fft.extend_with_coeffs(cols_w, lg, blow, aot=True)
print(f"AOT warm {time.time()-t0:.2f}s", flush=True)

mat = jnp.asarray(np.zeros((C, 1 << lg), np.uint32))
cols_r = tuple(RowRef(mat, r) for r in range(C))
t0 = time.time()
out = fft.extend_with_coeffs(cols_r, lg, blow)
jax.block_until_ready(out)
print(f"dispatch after AOT: {time.time()-t0:.3f}s (want <0.05 and no compile)")
