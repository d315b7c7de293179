"""FRI prove→verify loopback tests (model: fri/src/prover/tests.rs — in-memory
prover↔verifier channel roundtrip over random polynomials)."""

import random

import pytest

from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.crypto.random_coin import DefaultRandomCoin
from winterfell_tpu.fri import (
    DefaultVerifierChannel,
    FriOptions,
    FriProver,
    FriVerifier,
    FriVerifierError,
)
from winterfell_tpu.math import ntt, vecmath as vm
from winterfell_tpu.math.fields import F64, F128, Field


class LoopbackChannel:
    """Minimal fri::ProverChannel: reseed coin on commit, draw alphas."""

    def __init__(self, field):
        self.field = field
        self.coin = DefaultRandomCoin(Blake3_256, [(0,)], Field(field.base, 1))
        self.commitments = []

    def commit_fri_layer(self, root):
        self.commitments.append(root)
        self.coin.reseed(root)

    def draw_fri_alpha(self):
        return self.coin.draw(self.field)


def _run_fri(field, lde_blowup, folding, max_remainder_degree, trace_length, num_queries,
             tamper=None):
    base = field.base
    rng = random.Random(42)
    max_degree = trace_length - 1
    # random polynomial evaluated over the LDE coset
    coeffs = vm.asarray([field.rand(rng) for _ in range(trace_length)])
    offset = base.generator
    evaluations = ntt.evaluate_poly_with_offset(base, coeffs, offset, lde_blowup)
    domain_size = trace_length * lde_blowup

    options = FriOptions(lde_blowup, folding, max_remainder_degree)
    prover = FriProver(field, options, Blake3_256, offset)
    channel = LoopbackChannel(field)
    prover.build_layers(channel, evaluations)

    positions = channel.coin.draw_integers(num_queries, domain_size, nonce=0)
    positions = sorted(set(positions))
    proof = prover.build_proof(positions)

    queried = [vm.totuples(evaluations[p : p + 1])[0] for p in positions]
    if tamper == "evaluation":
        queried[0] = field.add(queried[0], field.one())

    # verifier side: replay the transcript to derive alphas
    vchannel_coin = DefaultRandomCoin(Blake3_256, [(0,)], Field(base, 1))
    alphas = []
    for root in channel.commitments:
        vchannel_coin.reseed(root)
        alphas.append(vchannel_coin.draw(field))

    verifier = FriVerifier(field, options, max_degree, channel.commitments, alphas, offset)
    vchannel = DefaultVerifierChannel(
        proof, channel.commitments, domain_size, folding, field, Blake3_256)
    verifier.verify(vchannel, queried, positions)


@pytest.mark.parametrize("field", [Field(F128, 1), Field(F64, 2), Field(F64, 3)])
@pytest.mark.parametrize("folding", [2, 4, 8])
def test_fri_roundtrip(field, folding):
    _run_fri(field, lde_blowup=8, folding=folding, max_remainder_degree=7,
             trace_length=256, num_queries=32)


def test_fri_small_no_layers():
    """Domain small enough that there are zero folding layers."""
    _run_fri(Field(F64, 1), lde_blowup=4, folding=4, max_remainder_degree=31,
             trace_length=32, num_queries=8)


def test_fri_tampered_evaluation_fails():
    with pytest.raises(FriVerifierError):
        _run_fri(Field(F64, 2), lde_blowup=8, folding=4, max_remainder_degree=7,
                 trace_length=128, num_queries=16, tamper="evaluation")
