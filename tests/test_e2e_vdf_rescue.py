"""E2E tests: vdf (degree-3, exemptions) and rescue (periodic columns)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.rescue import (
    RescueAir,
    RescueProver,
    build_rescue_trace,
    compute_hash_chain,
    rescue_hash,
)
from winterfell_tpu.examples.vdf import (
    VdfAir,
    VdfExemptAir,
    VdfExemptProver,
    VdfProver,
    build_vdf_trace,
    build_vdf_trace_exempt,
    execute_vdf,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.verifier import VerifierError, verify


def _options(ext=FieldExtension.NONE, blowup=8):
    return ProofOptions(28, blowup, 0, ext, 4, 7)


def test_vdf_regular():
    seed = 123
    n = 64
    trace = build_vdf_trace(F128, seed, n)
    prover = VdfProver(_options(), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    assert pub.result == execute_vdf(F128, seed, n - 1)
    verify(VdfAir, proof, pub, Blake3_256)


def test_vdf_regular_consistency():
    # forward constraint: cur == next^3 + 42
    seed = 55
    trace = build_vdf_trace(F128, seed, 16)
    for i in range(15):
        cur, nxt = trace.get(0, i), trace.get(0, i + 1)
        assert cur == (pow(nxt, 3, F128.p) + 42) % F128.p


def test_vdf_exempt():
    seed = 123
    n = 64
    trace = build_vdf_trace_exempt(F128, seed, n)
    prover = VdfExemptProver(_options(), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    verify(VdfExemptAir, proof, pub, Blake3_256)


def test_vdf_exempt_wrong_result_fails():
    trace = build_vdf_trace_exempt(F128, 123, 32)
    prover = VdfExemptProver(_options(), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    from winterfell_tpu.examples.vdf import VdfInputs
    bad = VdfInputs(pub.seed, (pub.result + 1) % F128.p)
    with pytest.raises(VerifierError):
        verify(VdfExemptAir, proof, bad, Blake3_256)


def test_rescue_hash_chain_consistency():
    seed = (42, 43)
    assert compute_hash_chain(seed, 2) == rescue_hash(rescue_hash(seed))


@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.QUADRATIC])
def test_rescue_chain_e2e(ext):
    seed = (42, 43)
    chain_length = 2
    trace = build_rescue_trace(seed, chain_length)
    # trace ends with the chain result in registers 0,1
    result = compute_hash_chain(seed, chain_length)
    assert (trace.get(0, trace.length - 1), trace.get(1, trace.length - 1)) == result

    prover = RescueProver(_options(ext=ext), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    verify(RescueAir, proof, pub, Blake3_256)
