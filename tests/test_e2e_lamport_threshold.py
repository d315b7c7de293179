"""E2E test: Lamport+ threshold signatures — the reference's largest AIR
(width 28: three signature sponges + in-circuit Merkle membership + counters)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.lamport import PrivateKey, message_to_elements
from winterfell_tpu.examples.lamport_threshold import (
    AggPublicKey,
    LamportThresholdAir,
    LamportThresholdProver,
    ThresholdPublicInputs,
    build_threshold_trace,
)
from winterfell_tpu.verifier import VerifierError, verify


def _setup(num_signers=3, signer_indexes=(0, 2)):
    msg = b"test message"
    keys = [PrivateKey(200 + i) for i in range(num_signers)]
    pub_key = AggPublicKey([k.pub_key() for k in keys])
    # signature index i corresponds to SORTED key order inside AggPublicKey
    sorted_keys = sorted(range(num_signers), key=lambda i: keys[i].pub_key())
    signatures = []
    for si in signer_indexes:
        key_pos = sorted_keys[si]
        signatures.append((si, keys[key_pos].sign(msg)))
    return pub_key, message_to_elements(msg), signatures


def test_threshold_trace_consistency():
    pub_key, message, signatures = _setup()
    trace = build_threshold_trace(pub_key, message, signatures)
    assert trace.length == 4 * 1024 and trace.width == 28
    # final signature count equals the number of provided signatures
    assert trace.get(27, trace.length - 1) == len(signatures)
    # merkle path computations terminate at the aggregated root
    num_cycles = 4
    offset = (2 + 1) * 8  # (log2(4)+1) * HASH_CYCLE_LEN
    for c in range(num_cycles):
        step = c * 1024 + offset
        assert (trace.get(18, step), trace.get(19, step)) == pub_key.root


def test_threshold_e2e():
    pub_key, message, signatures = _setup()
    trace = build_threshold_trace(pub_key, message, signatures)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = LamportThresholdProver(options, Blake3_256, pub_key, message,
                                    len(signatures))
    proof = prover.prove(trace)
    verify(LamportThresholdAir, proof, prover.pub_inputs, Blake3_256)

    bad = ThresholdPublicInputs(pub_key.root, pub_key.num_keys(),
                                len(signatures) + 1, message)
    with pytest.raises(VerifierError):
        verify(LamportThresholdAir, proof, bad, Blake3_256)
