"""E2E test: Lamport+ aggregate signatures (width-22 trace, sequence
assertions, powers-of-two periodic column)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.lamport import (
    LamportAggregateAir,
    LamportAggregateProver,
    LamportPublicInputs,
    PrivateKey,
    build_lamport_trace,
    message_to_elements,
    verify_signature,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.verifier import VerifierError, verify


def _setup(num_signatures=2):
    keys = [PrivateKey(i) for i in range(num_signatures)]
    messages, signatures, pub_keys = [], [], []
    for i, key in enumerate(keys):
        msg = f"test message {i}".encode()
        signatures.append(key.sign(msg))
        messages.append(message_to_elements(msg))
        pub_keys.append(key.pub_key())
        assert verify_signature(pub_keys[-1], msg, signatures[-1])
    return pub_keys, messages, signatures


def test_lamport_aggregate_e2e():
    pub_keys, messages, signatures = _setup(2)
    trace = build_lamport_trace(messages, signatures)
    assert trace.length == 2048
    # trace's public-key hash must equal the out-of-circuit public key
    for i, pk in enumerate(pub_keys):
        last = (i + 1) * 1024 - 1
        assert (trace.get(16, last), trace.get(17, last)) == pk
        assert (trace.get(2, last), trace.get(3, last)) == messages[i]

    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = LamportAggregateProver(options, Blake3_256, pub_keys, messages)
    proof = prover.prove(trace)
    verify(LamportAggregateAir, proof,
           LamportPublicInputs(tuple(pub_keys), tuple(messages)), Blake3_256)


def test_lamport_wrong_pub_key_fails():
    pub_keys, messages, signatures = _setup(2)
    trace = build_lamport_trace(messages, signatures)
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    prover = LamportAggregateProver(options, Blake3_256, pub_keys, messages)
    proof = prover.prove(trace)
    bad_keys = [pub_keys[0], ((pub_keys[1][0] + 1) % F128.p, pub_keys[1][1])]
    with pytest.raises(VerifierError):
        verify(LamportAggregateAir, proof,
               LamportPublicInputs(tuple(bad_keys), tuple(messages)), Blake3_256)
