"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
shard-count invariance of LogUp sums/columns and constraint vanishing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.components.defs import (
    COMPONENT_CLASSES,
    ELEMENT_SIZES,
    MemoryComponent,
    ProcessorComponent,
)
from stwo_brainfuck_tpu.core.fft import coset_order_permutation
from stwo_brainfuck_tpu.framework.component import LookupElements, build_interaction_trace
from stwo_brainfuck_tpu.parallel.mesh import make_mesh
from stwo_brainfuck_tpu.parallel.sharded import sharded_prove_step
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine


def elements():
    return {k: LookupElements.dummy(v) for k, v in ELEMENT_SIZES.items()}


@pytest.fixture(scope="module")
def tabs():
    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    return T.all_tables(m.trace(), m.program())


@pytest.mark.parametrize("n_devices", [1, 2, 8])
@pytest.mark.parametrize("comp_cls", [MemoryComponent, ProcessorComponent])
def test_sharded_matches_single_device(tabs, comp_cls, n_devices):
    assert len(jax.devices()) >= n_devices
    cols = tabs[comp_cls.name]
    log_size = int(np.log2(len(next(iter(cols.values())))))
    els = elements()

    # single-device reference (bit-reversed storage)
    comp = comp_cls(log_size)
    main = {k: jnp.asarray(v) for k, v in cols.items()}
    inter_ref, claimed_ref = build_interaction_trace(comp, main, els)
    s_ref = np.asarray(inter_ref[-1])

    # sharded (linear order)
    perm = coset_order_permutation(log_size)
    mesh = make_mesh(n_devices)
    fn, _ = sharded_prove_step(mesh, comp_cls, log_size)
    main_lin = {k: jnp.asarray(np.asarray(v)[perm]) for k, v in cols.items()}
    els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
               for k, e in els.items()}
    n = 1 << log_size
    is_first_lin = jnp.zeros(n, jnp.uint32).at[0].set(1)
    s_lin, claimed, cons = fn(main_lin, els_dev, is_first_lin)

    assert tuple(int(v) for v in np.asarray(claimed)) == claimed_ref
    # S in linear order == reference S permuted to linear order
    np.testing.assert_array_equal(np.asarray(s_lin), s_ref[:, perm])
    # all constraints vanish on the trace domain
    assert not np.asarray(cons).any()


def test_all_components_shard(tabs):
    """Every component's sharded step compiles and matches its claimed sum."""
    els = elements()
    mesh = make_mesh(4)
    total = (0, 0, 0, 0)
    from stwo_brainfuck_tpu.core import qm31

    for cls in COMPONENT_CLASSES:
        cols = tabs[cls.name]
        log_size = int(np.log2(len(next(iter(cols.values())))))
        perm = coset_order_permutation(log_size)
        fn, _ = sharded_prove_step(mesh, cls, log_size)
        main_lin = {k: jnp.asarray(np.asarray(v)[perm]) for k, v in cols.items()}
        els_dev = {k: {kk: jnp.asarray(vv) for kk, vv in e.device().items()}
                   for k, e in els.items()}
        is_first_lin = jnp.zeros(1 << log_size, jnp.uint32).at[0].set(1)
        _, claimed, cons = fn(main_lin, els_dev, is_first_lin)
        assert not np.asarray(cons).any(), cls.name
        total = qm31.h_add(total, tuple(int(v) for v in np.asarray(claimed)))
    assert total == (0, 0, 0, 0)


@pytest.mark.parametrize("log_size", [6, 10])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_fft_matches_single_device(log_size, n_devices):
    from stwo_brainfuck_tpu.core import fft
    from stwo_brainfuck_tpu.parallel.fft_sharded import make_sharded_evaluate

    rng = np.random.default_rng(11)
    coeffs = rng.integers(0, 2**31 - 1, 1 << log_size, dtype=np.uint32)
    expected = np.asarray(fft.evaluate(jnp.asarray(coeffs), log_size))

    mesh = make_mesh(n_devices)
    fn = make_sharded_evaluate(mesh, log_size)
    got = np.asarray(fn(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_interpolate_roundtrip(n_devices):
    from stwo_brainfuck_tpu.core import fft
    from stwo_brainfuck_tpu.parallel.fft_sharded import (
        make_sharded_evaluate,
        make_sharded_interpolate,
    )

    log_size = 9
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 2**31 - 1, 1 << log_size, dtype=np.uint32)
    expected_coeffs = np.asarray(fft.interpolate(jnp.asarray(vals), log_size))

    mesh = make_mesh(n_devices)
    interp = make_sharded_interpolate(mesh, log_size)
    got = np.asarray(interp(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, expected_coeffs)

    ev = make_sharded_evaluate(mesh, log_size)
    back = np.asarray(ev(jnp.asarray(got)))
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_merkle_root_matches_single_device(n_devices):
    from stwo_brainfuck_tpu.core import merkle
    from stwo_brainfuck_tpu.parallel.merkle_sharded import sharded_commit

    rng = np.random.default_rng(17)
    cols = {
        9: [rng.integers(0, 2**31 - 1, 512, dtype=np.uint32) for _ in range(3)],
        7: [rng.integers(0, 2**31 - 1, 128, dtype=np.uint32) for _ in range(2)],
        # a level below the shard split (handled on host)
        2: [rng.integers(0, 2**31 - 1, 4, dtype=np.uint32)],
    }
    expected = merkle.commit({k: [jnp.asarray(v) for v in vs] for k, vs in cols.items()}).root
    mesh = make_mesh(n_devices)
    got = sharded_commit(mesh, cols)
    assert got == expected


@pytest.mark.parametrize("n_devices", [2, 8])
def test_full_sharded_prove_is_byte_identical(n_devices):
    """VERDICT r1 #1 / SURVEY §7 step 10 acceptance: the COMPLETE prove
    pipeline on an n-device mesh produces a proof byte-identical to the
    single-chip proof (interaction, FFT extends, Merkle commits, composition,
    quotients, and FRI folds all routed through parallel/prove.py)."""
    import json

    from stwo_brainfuck_tpu import air

    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    p_single = air.prove_brainfuck(m)
    air.verify_brainfuck(p_single)
    p_mesh = air.prove_brainfuck(m, mesh=make_mesh(n_devices))
    assert json.dumps(p_mesh, sort_keys=True) == json.dumps(p_single, sort_keys=True)


def test_multihost_single_process_noop():
    """multihost.initialize() is a no-op on one host; global_mesh covers all
    (virtual) devices and drives the same sharded prove path."""
    import jax

    from stwo_brainfuck_tpu.parallel import multihost

    multihost.initialize()  # no coordinator configured -> no-op
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert multihost.is_coordinator()


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_fft_pallas_local_stages(n_devices, monkeypatch):
    """The sharded transform's LOCAL stages routed through the fused Pallas
    kernels (interpret mode on CPU) are byte-identical to the staged-XLA
    sharded path and to the single-chip transform — the mesh path runs the
    same fused kernels as the single-chip prover on real TPUs (VERDICT r2
    weak #4)."""
    from stwo_brainfuck_tpu.core import fft
    from stwo_brainfuck_tpu.parallel.fft_sharded import (
        make_sharded_evaluate,
        make_sharded_interpolate,
    )

    # local_log must be >= fft_pallas.MIN_LOG (11)
    log_size = 11 + int(np.log2(n_devices))
    rng = np.random.default_rng(29)
    coeffs = rng.integers(0, 2**31 - 1, 1 << log_size, dtype=np.uint32)
    expected = np.asarray(fft.evaluate(jnp.asarray(coeffs), log_size))

    monkeypatch.setenv("STWO_BF_SHARDED_PALLAS", "interpret")
    mesh = make_mesh(n_devices)
    got = np.asarray(make_sharded_evaluate(mesh, log_size)(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(got, expected)

    back = np.asarray(make_sharded_interpolate(mesh, log_size)(jnp.asarray(got)))
    np.testing.assert_array_equal(back, coeffs)
