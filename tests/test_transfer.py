"""Batched host<->device transfer (utils/transfer.py): round-trips and the
prove-time/warmup spec agreement that keeps the main-trace upload's split
executable warm (a spec mismatch re-compiles inside the Fiat-Shamir-
serialized prove)."""

import numpy as np
import jax.numpy as jnp

from stwo_brainfuck_tpu.utils import transfer


def test_upload_many_round_trip_mixed_shapes_dtypes():
    rng = np.random.default_rng(7)
    arrays = [
        rng.integers(0, 2**31 - 1, (3, 17), dtype=np.uint32),
        np.asarray(rng.standard_normal((5,)), dtype=np.float32),
        rng.integers(-(2**30), 2**30, (2, 2, 4), dtype=np.int32),
        rng.integers(0, 2**31 - 1, (1,), dtype=np.uint32),
    ]
    devs = transfer.upload_many(arrays)
    assert len(devs) == len(arrays)
    for host, dev in zip(arrays, devs):
        assert dev.dtype == host.dtype and dev.shape == host.shape
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_pull_all_round_trip():
    rng = np.random.default_rng(8)
    hosts = [rng.integers(0, 2**31 - 1, s, dtype=np.uint32)
             for s in [(4, 8), (3,), (2, 2, 2)]]
    devs = [jnp.asarray(h) for h in hosts]
    outs = transfer.pull_all(devs)
    for h, o in zip(hosts, outs):
        np.testing.assert_array_equal(o, h)


def test_split_specs_matches_upload_many_layout():
    shapes = [((2, 8), "uint32"), ((3, 4), "float32"), ((5,), "int32")]
    specs, total = transfer.split_specs(shapes)
    assert total == 2 * 8 + 3 * 4 + 5
    off = 0
    for (o, size, shape, dt), (s, name) in zip(specs, shapes):
        assert o == off and shape == tuple(s) and dt == name
        assert size == int(np.prod(s))
        off += size


def test_main_upload_derives_next_columns_exactly():
    """_main_mats_jit must reproduce the host table builders' next_* columns
    bit-exactly from the reduced upload (roll-by-one + last-element fixups,
    tables.py pairing semantics), and warmup's layout must equal the
    prove-time layout or the first prove pays a fresh compile."""
    from stwo_brainfuck_tpu import air
    from stwo_brainfuck_tpu.components import tables as T
    from stwo_brainfuck_tpu.core.pcs import PcsConfig
    from stwo_brainfuck_tpu.vm.compiler import compile_program
    from stwo_brainfuck_tpu.vm.machine import create_test_machine

    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    tabs = T.all_tables(m.trace(), m.program())
    claim = {k: int(np.log2(len(next(iter(v.values())))))
             for k, v in tabs.items()}
    layout = air.build_layout(claim, PcsConfig(log_max_rows=0))

    buf, spec = air._main_upload(tabs, layout.components)
    warm_spec, warm_total = air.main_upload_layout(layout.components)
    assert spec == warm_spec and buf.size == warm_total

    mats = air._main_mats_jit(buf, spec)
    for comp, mat in zip(layout.components, mats):
        host = np.stack([tabs[comp.name][c] for c in comp.columns])
        np.testing.assert_array_equal(np.asarray(mat), host, err_msg=comp.name)
