"""CLI integration tests (subprocess, CPU-forced): prove -> verify -> tamper
through the real command-line surface, and VM CLI flows."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "STWO_BF_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}


def run_cli(args, input_bytes=b"", timeout=420):
    return subprocess.run(
        [sys.executable, "-m"] + args,
        input=input_bytes, capture_output=True, cwd=REPO, env=ENV, timeout=timeout,
    )


def test_vm_cli_collatz():
    r = run_cli(["stwo_brainfuck_tpu.vm.cli",
                 "/root/reference/brainfuck_programs/collatz.bf"], b"7\n")
    assert r.returncode == 0
    assert r.stdout == b"16\n"


def test_vm_cli_missing_file():
    r = run_cli(["stwo_brainfuck_tpu.vm.cli", "/nonexistent.bf"])
    assert r.returncode == 2
    assert b"no such file" in r.stderr


def test_prove_verify_tamper_roundtrip(tmp_path):
    proof_path = str(tmp_path / "proof.json")
    r = run_cli(["stwo_brainfuck_tpu.cli", "prove", "--code", "+++>,<[>+.<-]",
                 "--input", "\x01", "--output", proof_path])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli(["stwo_brainfuck_tpu.cli", "verify", proof_path])
    assert r.returncode == 0, r.stderr[-2000:]
    assert b"Verification OK" in r.stderr

    with open(proof_path) as f:
        proof = json.load(f)
    proof["interaction_claim"]["memory"][0] ^= 1
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as f:
        json.dump(proof, f)
    r = run_cli(["stwo_brainfuck_tpu.cli", "verify", bad_path])
    assert r.returncode == 1
    assert b"FAILED" in r.stderr
