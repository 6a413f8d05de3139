"""Device table builder (components/device_build.py) vs the host builders
(components/tables.py): the single-executable on-chip build must reproduce
every component matrix bit-exactly, for every bundled program — it replaces
the host tables on the prove path."""

import numpy as np
import pytest

from stwo_brainfuck_tpu.components import device_build as D
from stwo_brainfuck_tpu.components import tables as T
from stwo_brainfuck_tpu.components.defs import COMPONENT_CLASSES
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine

PROGRAMS = [
    ("io_loop", "+++>,<[>+.<-]", b"\x01"),
    ("no_jumps", "+++.", b""),
    ("empty_ops", ",.", b"\x05"),  # no + - < > [ ]
    ("fib-ish", "++>+<[->>+>+<<<]", b""),
]


def _machine(code, inp):
    m = create_test_machine(compile_program(code), inp)
    m.execute()
    return m


@pytest.mark.parametrize("name,code,inp", PROGRAMS)
def test_device_tables_bit_identical(name, code, inp):
    m = _machine(code, inp)
    trace, program = m.trace(), m.program()
    tabs = T.all_tables(trace, program)
    meta = D.build_meta(trace, program)

    host_claim = {k: int(np.log2(len(next(iter(v.values())))))
                  for k, v in tabs.items()}
    assert meta.claim == host_claim

    dev = D.build_device_tables(trace, meta)
    comps = {c.name: c for c in
             (cls(meta.claim[cls.name]) for cls in COMPONENT_CLASSES)}
    for cname, comp in comps.items():
        host_mat = np.stack([tabs[cname][col] for col in comp.columns])
        np.testing.assert_array_equal(np.asarray(dev[cname]), host_mat,
                                      err_msg=f"{name}/{cname}")


@pytest.mark.parametrize("prog", ["fib19", "collatz"])
def test_device_tables_bundled_program(prog):
    inp = {"collatz": b"7\n"}.get(prog, b"")
    with open(f"/root/reference/brainfuck_programs/{prog}.bf") as f:
        m = _machine(f.read(), inp)
    trace, program = m.trace(), m.program()
    tabs = T.all_tables(trace, program)
    meta = D.build_meta(trace, program)
    dev = D.build_device_tables(trace, meta)
    for cname, cols in tabs.items():
        host_mat = np.stack(list(cols.values()))
        np.testing.assert_array_equal(np.asarray(dev[cname]), host_mat,
                                      err_msg=f"{prog}/{cname}")
