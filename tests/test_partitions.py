"""Partitioned commitment tests (PartitionOptions, the multi-device hashing
mode — air/src/options.rs:404-445 + row_matrix.rs:184-229)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.rescue import (
    RescueAir,
    RescueProver,
    build_rescue_trace,
)
from winterfell_tpu.verifier import VerifierError, verify


def _options(partitions=1):
    opts = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
    if partitions > 1:
        opts = opts.with_partitions(partitions, 2)
    return opts


def test_partitioned_commitments_prove_verify():
    trace = build_rescue_trace((42, 43), 2)
    prover = RescueProver(_options(partitions=2), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    assert proof.options.partition_options.num_partitions == 2
    verify(RescueAir, proof, pub, Blake3_256)


def test_partitioned_proof_differs_from_unpartitioned():
    trace = build_rescue_trace((42, 43), 2)
    p1 = RescueProver(_options(1), Blake3_256).prove(build_rescue_trace((42, 43), 2))
    p2 = RescueProver(_options(2), Blake3_256).prove(trace)
    # partition count is in the options (and thus the transcript seed):
    # commitments and proof bytes legitimately differ
    assert p1.to_bytes() != p2.to_bytes()


def test_partitioned_proof_wrong_input_fails():
    trace = build_rescue_trace((42, 43), 2)
    prover = RescueProver(_options(partitions=4), Blake3_256)
    proof = prover.prove(trace)
    pub = prover.get_pub_inputs(trace)
    from winterfell_tpu.examples.rescue import RescuePublicInputs
    bad = RescuePublicInputs(pub.seed, (pub.result[0], (pub.result[1] + 1) % (2**128 - 45 * 2**40 + 1)))
    with pytest.raises(VerifierError):
        verify(RescueAir, proof, bad, Blake3_256)
