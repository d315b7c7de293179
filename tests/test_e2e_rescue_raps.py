"""E2E test for the Randomized AIR (aux trace segment) path — rescue_raps."""

import random

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.rescue_raps import (
    RapsPublicInputs,
    RescueRapsAir,
    RescueRapsProver,
    build_raps_trace,
    compute_permuted_hash_chains,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.verifier import VerifierError, verify


def _seeds(chain_length, seed=11):
    rng = random.Random(seed)
    seeds = [(rng.randrange(F128.p), rng.randrange(F128.p)) for _ in range(chain_length)]
    permuted = seeds[2:] + seeds[:2]
    return seeds, permuted


@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.QUADRATIC])
def test_rescue_raps_e2e(ext):
    seeds, permuted = _seeds(4)
    trace = build_raps_trace(seeds, permuted)
    result = compute_permuted_hash_chains(seeds, permuted)
    last = trace.length - 1
    assert (trace.get(0, last), trace.get(1, last)) == tuple(result[0])
    assert (trace.get(4, last), trace.get(5, last)) == tuple(result[1])

    options = ProofOptions(28, 8, 0, ext, 4, 7)
    prover = RescueRapsProver(options, Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    assert proof.trace_info.aux_segment_width == 3
    assert len(proof.trace_queries) == 2
    verify(RescueRapsAir, proof, pub, Blake3_256)


def test_rescue_raps_wrong_result_fails():
    seeds, permuted = _seeds(4, seed=12)
    trace = build_raps_trace(seeds, permuted)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = RescueRapsProver(options, Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    bad = RapsPublicInputs(result=(
        (pub.result[0][0], (pub.result[0][1] + 1) % F128.p), pub.result[1]))
    with pytest.raises(VerifierError):
        verify(RescueRapsAir, proof, bad, Blake3_256)


def test_rescue_raps_non_permutation_fails():
    """If the second chain's seeds are NOT a permutation, the aux argument
    cannot terminate at one — the prover's own degree check must trip."""
    seeds, _ = _seeds(4, seed=13)
    rng = random.Random(99)
    not_permuted = [(rng.randrange(F128.p), rng.randrange(F128.p)) for _ in range(4)]
    trace = build_raps_trace(seeds, not_permuted)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = RescueRapsProver(options, Blake3_256)
    with pytest.raises(Exception):
        proof = prover.prove(trace)
        verify(RescueRapsAir, proof, prover.get_pub_inputs(trace), Blake3_256)
