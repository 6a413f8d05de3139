"""VM tests: compiler backpatching, per-opcode semantics (incl. M31 wrap),
trace contents, and integration runs of the bundled programs, mirroring the
reference's machine.rs unit tests and tests/integration.rs."""

import numpy as np
import pytest

from stwo_brainfuck_tpu.core.m31 import P_INT
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import Machine, MachineError, create_test_machine

PROGRAMS = "/root/reference/brainfuck_programs"


def run_file(name, input_bytes=b"", ram_size=30000):
    with open(f"{PROGRAMS}/{name}") as f:
        code = compile_program(f.read())
    m = Machine(code, input_data=input_bytes, ram_size=ram_size)
    m.execute()
    return m


def test_compile():
    # compiler.rs:63-73 golden
    assert compile_program("++>,<[>+.<-]") == [43, 43, 62, 44, 60, 91, 13, 62, 43, 46, 60, 45, 93, 7]


def test_compile_whitespace():
    assert compile_program(" +  +> , < [> + .< - ]  ") == compile_program("++>,<[>+.<-]")


def test_minus_wraparound():
    # machine.rs test_minus_instruction: 0 - 1 = p - 1 in M31
    m = create_test_machine(compile_program("-"))
    m.execute()
    assert m.memory()[0] == P_INT - 1


def test_plus_minus_roundtrip():
    m = create_test_machine(compile_program("+++--"))
    m.execute()
    assert m.memory()[0] == 1


def test_right_left():
    m = create_test_machine(compile_program("+>++<"))
    m.execute()
    assert m.memory()[0] == 1 and m.memory()[1] == 2
    assert m.registers.mp == 0


def test_input_output():
    m = create_test_machine(compile_program(",."), b"A")
    m.execute()
    assert m.output_bytes() == b"A"


def test_input_eof_errors():
    m = create_test_machine(compile_program(","), b"")
    with pytest.raises(MachineError):
        m.execute()


def test_loop_skip_when_zero():
    # '[' with mv == 0 jumps past the loop
    m = create_test_machine(compile_program("[+]++"))
    m.execute()
    assert m.memory()[0] == 2


def test_trace_structure():
    m = create_test_machine(compile_program("++"))
    m.execute()
    tr = m.trace()
    # 2 steps + final row
    assert tr.shape == (3, 7)
    np.testing.assert_array_equal(tr[:, 0], [0, 1, 2])          # clk
    np.testing.assert_array_equal(tr[:, 1], [0, 1, 2])          # ip
    np.testing.assert_array_equal(tr[:, 2], [43, 43, 0])        # ci (final row 0)
    np.testing.assert_array_equal(tr[:, 3], [43, 0, 0])         # ni
    # mv is recorded *before* the instruction executes
    np.testing.assert_array_equal(tr[:, 5], [0, 1, 2])
    # mvi inverse property
    for mv, mvi in zip(tr[:, 5], tr[:, 6]):
        assert (int(mv) * int(mvi)) % P_INT == (1 if mv else 0)


def test_trace_loop_jump_targets():
    # "++[-]" : verify ip sequencing through a taken/untaken ']'
    code = compile_program("++[-]")
    m = create_test_machine(code)
    m.execute()
    tr = m.trace()
    ips = tr[:, 1].tolist()
    # ip: 0,1 (+,+) then 2 ('['), 4 ('-'), 5 (']' taken -> back to 4), ...
    assert ips[:5] == [0, 1, 2, 4, 5]


def test_a_bc():
    m = run_file("a-bc.bf", b"a")
    assert m.output_bytes() == b"bc"


def test_collatz():
    m = run_file("collatz.bf", bytes([0x37, 10]))
    assert m.output_bytes() == bytes([0x31, 0x36, 10])


@pytest.mark.parametrize(
    "name,expected",
    [
        ("hello1.bf", b"Hello World!\n"),
        ("hello2.bf", b"Hello World!\n"),
        ("hello3.bf", b"Hello, World!\n"),
        ("hello4.bf", b"Hello World!\n"),
        ("hello_kakarot.bf", b"Hello Kakarot World!\n"),
    ],
)
def test_hello(name, expected):
    assert run_file(name).output_bytes() == expected


def test_fib19():
    m = run_file("fib19.bf", ram_size=5)
    assert m.output_bytes() == bytes([85])  # 4181 % 256
    assert m.memory() == [0, 2584, 4181, 0, 0]  # README.md:117-126


def test_mp_out_of_range_python_path():
    import io

    class Stream(io.RawIOBase):
        def read(self, n=-1):
            return b""

    # Python fallback: '<' from cell 0 must raise MachineError, matching native
    m = Machine(compile_program("<"), input_data=Stream())
    with pytest.raises(MachineError, match="memory pointer"):
        m.execute()


def test_mp_out_of_range_native_path():
    m = create_test_machine(compile_program("<"))
    with pytest.raises(MachineError, match="memory pointer"):
        m.execute()


def test_runaway_program_errors_instead_of_hanging():
    from stwo_brainfuck_tpu.vm import native

    if not native.available():
        pytest.skip("native VM unavailable")
    with pytest.raises(RuntimeError, match="maximum step"):
        native.execute(compile_program("+[]"), b"", 10, max_steps=100000)


def test_runaway_program_errors_python_path():
    # The Python fallback honors the same cap as the native path (the
    # reference has a single loop; here both paths must refuse to hang).
    m = Machine(compile_program("+[]"), max_steps=100000)
    with pytest.raises(MachineError, match="maximum step"):
        m._execute_python()


def test_machine_max_steps_reaches_native_path():
    m = Machine(compile_program("+[]"), max_steps=100000)
    with pytest.raises(MachineError, match="maximum step"):
        m.execute()
