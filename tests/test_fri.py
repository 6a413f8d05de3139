"""FRI tests: commit/verify roundtrip on genuine low-degree inputs (mixed
sizes), rejection of tampered layers/values."""

import numpy as np
import jax.numpy as jnp
import pytest

from stwo_brainfuck_tpu.core import fft, fri, qm31
from stwo_brainfuck_tpu.core.channel import Blake2sChannel
from stwo_brainfuck_tpu.core.m31 import P_INT

RNG = np.random.default_rng(3)


def low_degree_eval(log_size, rate_log=1):
    """Random QM31 circle evaluation of dim 2^(log_size-rate_log) on the
    domain of size 2^log_size (i.e. rate 1/2 for rate_log=1)."""
    n = 1 << log_size
    coeffs = np.zeros((4, n), np.uint32)
    dim = n >> rate_log
    coeffs[:, :dim] = RNG.integers(0, P_INT, (4, dim), dtype=np.uint32)
    return jnp.stack([fft.evaluate(jnp.asarray(coeffs[k]), log_size) for k in range(4)])


def run_fri(inputs):
    ch = Blake2sChannel()
    ch.mix_u32s([1])
    prover = fri.fri_commit(inputs, ch)
    queries = ch.draw_queries(8, max(inputs))
    fri.fri_decommit(prover, queries)
    return prover, queries


def replay_betas(proof, n_layers):
    ch = Blake2sChannel()
    ch.mix_u32s([1])
    beta0 = ch.draw_felt()
    betas = []
    for root in proof.layer_roots:
        ch.mix_root(root)
        betas.append(ch.draw_felt())
    ch.mix_felts([proof.last_layer_value])
    return beta0, betas, ch


def make_input_fn(inputs):
    host = {k: np.asarray(v) for k, v in inputs.items()}

    def fn(log, pos):
        if log not in host:
            return None
        return tuple(int(x) for x in host[log][:, pos])

    return fn


@pytest.mark.parametrize("logs", [[7], [7, 6], [8, 6, 5]])
def test_fri_roundtrip(logs):
    inputs = {lg: low_degree_eval(lg) for lg in logs}
    prover, queries = run_fri(inputs)
    beta0, betas, ch = replay_betas(prover.proof, len(prover.layers))
    queries2 = ch.draw_queries(8, max(logs))
    assert queries2 == queries
    fri.fri_verify_queries(prover.proof, (beta0, betas), max(logs), queries, make_input_fn(inputs))


def test_fri_rejects_high_degree():
    # full-rate (not low-degree) input must fail verification
    log = 7
    vals = jnp.asarray(RNG.integers(0, P_INT, (4, 1 << log), dtype=np.uint32))
    inputs = {log: vals}
    prover, queries = run_fri(inputs)
    beta0, betas, ch = replay_betas(prover.proof, len(prover.layers))
    with pytest.raises(fri.FriVerificationError):
        fri.fri_verify_queries(prover.proof, (beta0, betas), log, queries, make_input_fn(inputs))


def test_fri_rejects_tampered_layer_value():
    inputs = {7: low_degree_eval(7)}
    prover, queries = run_fri(inputs)
    beta0, betas, ch = replay_betas(prover.proof, len(prover.layers))
    # tamper one decommitted layer value
    lv = prover.proof.layer_values[0]
    k = next(iter(lv))
    lv[k] = tuple((v + 1) % P_INT for v in lv[k])
    with pytest.raises(fri.FriVerificationError):
        fri.fri_verify_queries(prover.proof, (beta0, betas), 7, queries, make_input_fn(inputs))


def test_fri_rejects_wrong_input_value():
    inputs = {7: low_degree_eval(7)}
    prover, queries = run_fri(inputs)
    beta0, betas, ch = replay_betas(prover.proof, len(prover.layers))
    base_fn = make_input_fn(inputs)

    def bad_fn(log, pos):
        v = base_fn(log, pos)
        if pos == (queries[0] & ~1):
            return qm31.h_add(v, (1, 0, 0, 0))
        return v

    with pytest.raises(fri.FriVerificationError):
        fri.fri_verify_queries(prover.proof, (beta0, betas), 7, queries, bad_fn)
