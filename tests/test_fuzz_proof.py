"""Structure-aware proof fuzzing (VERDICT r3 next #7).

Generalizes the manual tamper tests of test_e2e.py: a seeded mutation loop
walks every path of a valid proof's JSON structure and applies value-,
structure- and type-level mutations. The contract (mirror of the reference
verifier's failure surface, brainfuck_air/mod.rs:737-797):

- SEMANTIC mutations (an int changed, a hex digit flipped, a required key
  deleted, a list truncated/extended) must raise VerificationError — never
  verify, never crash, never hang.
- TYPE mutations (int -> str/list/None/float) must never crash: either
  VerificationError or, for value-preserving coercions like 5 -> "5" that
  json/int() round-trip identically, a clean verify.
"""

import copy
import json
import random

import pytest

from stwo_brainfuck_tpu import air
from stwo_brainfuck_tpu.vm.compiler import compile_program
from stwo_brainfuck_tpu.vm.machine import create_test_machine


@pytest.fixture(scope="module")
def proof():
    m = create_test_machine(compile_program("+++>,<[>+.<-]"), b"\x01")
    m.execute()
    p = air.prove_brainfuck(m)
    air.verify_brainfuck(p)
    return p


def _paths(obj, prefix=()):
    """Every (path, value) pair in the JSON tree; path elements are dict
    keys / list indices."""
    out = [(prefix, obj)]
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.extend(_paths(v, prefix + (k,)))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.extend(_paths(v, prefix + (i,)))
    return out


def _get(obj, path):
    for p in path:
        obj = obj[p]
    return obj


def _set(obj, path, value):
    parent = _get(obj, path[:-1])
    parent[path[-1]] = value


def _delete(obj, path):
    parent = _get(obj, path[:-1])
    del parent[path[-1]]


def _is_hex(s):
    if not isinstance(s, str) or not s:
        return False
    try:
        bytes.fromhex(s)
        return True
    except ValueError:
        return False


def _mutate_semantic(rng, p, path, value):
    """Apply one semantics-changing mutation at path; returns a label."""
    if isinstance(value, bool):
        return None  # no bools in the schema; don't treat as int
    if isinstance(value, int):
        # claim/config sizes feed layout construction: keep perturbations
        # small so a mutated-but-in-range claim never forces a giant
        # preprocessed recommit (the verifier caps log_max_rows, and small
        # sizes are cheap; correctness is identical for any delta)
        _set(p, path, value ^ 1)
        return "int^1"
    if _is_hex(value):
        flipped = hex(int(value[0], 16) ^ 1)[2:] + value[1:]
        _set(p, path, flipped)
        return "hexflip"
    if isinstance(value, list) and value:
        choice = rng.randrange(3)
        if choice == 0 and len(value) > 1:
            _set(p, path, value[:-1])
            return "truncate"
        if choice == 1:
            _set(p, path, value + [value[-1]])
            return "extend"
        _set(p, path, [value[-1]] + value[1:-1] + [value[0]] if len(value) > 1
             else value + value)
        return "swap"
    if isinstance(value, dict) and value:
        k = rng.choice(sorted(value, key=str))
        q = dict(value)
        del q[k]
        _set(p, path, q)
        return "delkey"
    return None


TYPE_REPLACEMENTS = [
    lambda v: str(v),
    lambda v: [v],
    lambda v: None,
    lambda v: {"x": v},
    lambda v: float(v) if isinstance(v, int) else 0.5,
    lambda v: v if not isinstance(v, int) else v + (1 << 70),
    lambda v: "",
    lambda v: -1,
]


def test_fuzz_semantic_mutations_all_rejected(proof):
    rng = random.Random(0xC57A2)
    sites = [(path, v) for path, v in _paths(proof) if path]
    rng.shuffle(sites)
    tried = 0
    for path, _v in sites:
        if tried >= 220:
            break
        p = copy.deepcopy(proof)
        label = _mutate_semantic(rng, p, path, _get(p, path))
        if label is None:
            continue
        if json.dumps(p, sort_keys=True) == json.dumps(proof, sort_keys=True):
            continue  # mutation was a no-op (e.g. swap of equal values)
        tried += 1
        with pytest.raises(air.VerificationError):
            air.verify_brainfuck(p)
    assert tried >= 150, f"only {tried} semantic mutations exercised"


def test_fuzz_type_mutations_never_crash(proof):
    rng = random.Random(0xF00D)
    sites = [(path, v) for path, v in _paths(proof)
             if path and not isinstance(v, (dict, list))]
    rng.shuffle(sites)
    crashes = []
    verified_ok = 0
    for path, _v in sites[:120]:
        repl = rng.choice(TYPE_REPLACEMENTS)
        p = copy.deepcopy(proof)
        try:
            p2 = json.loads(json.dumps(_apply(p, path, repl)))
        except (TypeError, ValueError):
            continue  # not JSON-serializable; out of scope
        try:
            air.verify_brainfuck(p2)
            verified_ok += 1  # value-preserving coercion (e.g. 5 -> "5")
        except air.VerificationError:
            pass
        except Exception as exc:  # noqa: BLE001 - the assertion target
            crashes.append((path, type(exc).__name__, str(exc)[:80]))
    assert not crashes, crashes


def _apply(p, path, repl):
    _set(p, path, repl(_get(p, path)))
    return p


def test_fuzz_top_level_structures(proof):
    """Whole-field replacements: every top-level field swapped for junk."""
    for k in list(proof):
        for junk in (None, [], {}, 0, "zzz", [[]], {"a": 1}):
            p = copy.deepcopy(proof)
            p[k] = junk
            with pytest.raises(air.VerificationError):
                air.verify_brainfuck(p)
    # unknown extra keys are ignored (forward compatibility), not a crash
    p = copy.deepcopy(proof)
    p["unknown_extra"] = {"nested": [1, 2, 3]}
    air.verify_brainfuck(p)
