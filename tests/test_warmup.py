"""AOT warmup completeness: a warmed prove must trigger ZERO further
compilations or persistent-cache reads — every executable the pipeline
dispatches was preloaded by warmup() via .lower().compile() with the exact
jit-cache signature (pytree structure + avals + static args).

This is the invariant that keeps the TPU cold-start bounded: through the
axon relay each missed signature costs a multi-second compile or a
~1 MB/s executable deserialize inside the Fiat-Shamir-serialized prove.
"""

import numpy as np

import jax._src.compiler as comp

from stwo_brainfuck_tpu import air, warmup
from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.core.pcs import PcsConfig
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine


def test_aot_warmup_prove_has_zero_residual_compiles(monkeypatch):
    events = []
    orig_read = comp._cache_read
    orig_write = comp._compile_and_write_cache

    def patched_read(module_name, cache_key, *a, **k):
        events.append(("read", module_name))
        return orig_read(module_name, cache_key, *a, **k)

    def patched_write(backend, computation, *a, **k):
        events.append(("compile", str(getattr(computation, "name", "?"))))
        return orig_write(backend, computation, *a, **k)

    monkeypatch.setattr(comp, "_cache_read", patched_read)
    monkeypatch.setattr(comp, "_compile_and_write_cache", patched_write)

    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    tabs = T.all_tables(m.trace(), m.program())
    claim = {k: int(np.log2(len(next(iter(v.values())))))
             for k, v in tabs.items()}
    warmup.warmup(claim, PcsConfig(log_max_rows=0))

    events.clear()
    proof = air.prove_brainfuck(m)
    assert events == [], (
        f"{len(events)} executables compiled/loaded during a warmed prove: "
        f"{sorted(set(events))[:10]}")
    air.verify_brainfuck(proof)


def test_ghost_prove_mesh_warmup_has_zero_residual_compiles(monkeypatch):
    """Mesh warmup = ghost prove (zero tables through the COMPLETE sharded
    pipeline): a subsequent real mesh prove of the same claim must compile
    or cache-load nothing."""
    from stwo_brainfuck_tpu.parallel.mesh import make_mesh

    events = []
    orig_read = comp._cache_read
    orig_write = comp._compile_and_write_cache

    def patched_read(module_name, cache_key, *a, **k):
        events.append(("read", module_name))
        return orig_read(module_name, cache_key, *a, **k)

    def patched_write(backend, computation, *a, **k):
        events.append(("compile", str(getattr(computation, "name", "?"))))
        return orig_write(backend, computation, *a, **k)

    monkeypatch.setattr(comp, "_cache_read", patched_read)
    monkeypatch.setattr(comp, "_compile_and_write_cache", patched_write)

    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    tabs = T.all_tables(m.trace(), m.program())
    claim = {k: int(np.log2(len(next(iter(v.values())))))
             for k, v in tabs.items()}
    mesh = make_mesh(8)
    cfg = PcsConfig(log_max_rows=0)
    warmup.warmup(claim, cfg, mesh=mesh)

    events.clear()
    proof = air.prove_brainfuck(m, cfg, mesh=mesh)
    assert events == [], (
        f"{len(events)} executables compiled/loaded during a warmed mesh "
        f"prove: {sorted(set(events))[:10]}")
    air.verify_brainfuck(proof)
