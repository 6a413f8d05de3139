"""Persistent-cache key stability (VERDICT r3 next #2).

Round 3's driver bench regressed 22x because a refactor changed the
jit/persistent cache keys and the disk cache was not re-seeded. The XLA
persistent cache key is a hash of the lowered module (plus compile options
and the jaxlib version), so these tests pin the two properties that keep
keys stable across harmless source edits:

1. the lowered module text is INVARIANT to source line shifts (the package
   sets jax_traceback_in_locations_limit=0 in __init__.py, which strips
   Python source locations from the IR — including the opaque Mosaic
   payload of Pallas kernels that the cache key's strip-debuginfo pass
   cannot reach);
2. the dedup_jit wrapper (core/rowref.py) lowers RowRef arguments to a
   deterministic, line-shift-invariant module, and folds RowRefs sharing a
   base matrix into ONE executable parameter (the phantom-HBM fix).
"""

import textwrap

import jax
import jax.numpy as jnp
import pytest

from stwo_brainfuck_tpu.core.rowref import RowRef, _dedup


def _fn_at_line_offset(pad: int, body: str):
    """Define a function from source shifted down by `pad` blank lines —
    simulating an edit elsewhere in the file that moves definitions."""
    ns: dict = {}
    exec("\n" * pad + textwrap.dedent(body), ns)
    return ns["f"]


PLAIN_BODY = """
from stwo_brainfuck_tpu.core import m31
def f(a, b):
    x = m31.mul(a, b)
    return m31.add(x, a)
"""

DEDUP_BODY = """
from stwo_brainfuck_tpu.core import m31
from stwo_brainfuck_tpu.core.rowref import dedup_jit, as_row
@dedup_jit
def f(a, b):
    return m31.mul(as_row(a), as_row(b))
"""


def test_plain_jit_lowering_invariant_to_line_shift():
    x = jnp.ones((8, 256), jnp.uint32)
    y = jnp.ones((8, 256), jnp.uint32)
    t0 = jax.jit(_fn_at_line_offset(0, PLAIN_BODY)).lower(x, y).as_text()
    t1 = jax.jit(_fn_at_line_offset(37, PLAIN_BODY)).lower(x, y).as_text()
    assert t0 == t1


def test_dedup_jit_lowering_invariant_to_line_shift():
    mat = jnp.ones((4, 256), jnp.uint32)
    a, b = RowRef(mat, 0), RowRef(mat, 2)
    t0 = _fn_at_line_offset(0, DEDUP_BODY).lower(a, b).as_text()
    t1 = _fn_at_line_offset(23, DEDUP_BODY).lower(a, b).as_text()
    assert t0 == t1


def test_dedup_jit_folds_shared_bases_to_one_parameter():
    mat = jnp.ones((4, 256), jnp.uint32)
    other = jnp.ones((2, 256), jnp.uint32)
    arrays, _skel = _dedup((RowRef(mat, 0), RowRef(mat, 3),
                            RowRef(other, 1), mat))
    # two RowRefs into `mat` fold to one parameter; the PLAIN array `mat`
    # stays separate (aliasing it would fork warmup's jit cache keys)
    assert len(arrays) == 3
    # and the lowered module declares exactly the deduped parameters
    lowered = _fn_at_line_offset(0, DEDUP_BODY).lower(
        RowRef(mat, 0), RowRef(mat, 3))
    text = lowered.as_text()
    assert text.count("tensor<4x256xui32>") >= 1
    main_sig = next(line for line in text.splitlines()
                    if "@main" in line and "func" in line)
    assert main_sig.count("tensor<4x256xui32>") == 1, main_sig


def test_pallas_lowering_invariant_to_line_shift():
    """The Mosaic kernel payload embeds source locations unless
    jax_traceback_in_locations_limit=0; a line shift then invalidates every
    cached Pallas executable (~60 s of cold start, __init__.py). TPU-only:
    Mosaic does not lower on the CPU test platform."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("Mosaic lowering needs a TPU backend")
    body = """
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
def _kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)
def f(x):
    return pl.pallas_call(
        _kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
"""
    x = jnp.ones((8, 128), jnp.uint32)
    t0 = jax.jit(_fn_at_line_offset(0, body)).lower(x).as_text()
    t1 = jax.jit(_fn_at_line_offset(31, body)).lower(x).as_text()
    assert t0 == t1
