"""Example runner CLI — the equivalent of the reference examples binary
(examples/src/main.rs + lib.rs): pick an example, prove, report timing /
proof size / security bits, then verify.

Usage:
    python -m winterfell_tpu.examples.cli fib -n 1024
    python -m winterfell_tpu.examples.cli rescue -n 4 -q 42 -b 4 -H sha3_256
    python -m winterfell_tpu.examples.cli fib_small -n 1024 -e 3 -H rp64_256 --device
"""

from __future__ import annotations

import argparse
import sys
import time

from ..air import BatchingMethod, FieldExtension, ProofOptions
from ..crypto.hashers import HASHERS
from ..math.fields import F64, F128
from ..verifier import AcceptableOptions, verify

EXTENSIONS = {1: FieldExtension.NONE, 2: FieldExtension.QUADRATIC, 3: FieldExtension.CUBIC}


def build_options(args) -> ProofOptions:
    """Defaults mirror examples/src/lib.rs:96-105: FRI folding 8, remainder
    degree 31, Linear batching."""
    return ProofOptions(
        num_queries=args.queries,
        blowup_factor=args.blowup,
        grinding_factor=args.grinding,
        field_extension=EXTENSIONS[args.extension],
        fri_folding_factor=args.folding,
        fri_remainder_max_degree=31,
        batching_constraints=BatchingMethod.LINEAR,
        batching_deep=BatchingMethod.LINEAR,
    )



def _accel_f128(cls, device: bool):
    """Wrap an f128 example prover class with the device F128Prover when
    --device is set (BLAKE3 hashers only — the device row hasher)."""
    if not device:
        return cls
    from ..prover.device_f128 import F128Prover

    return F128Prover.accelerate(cls)


def get_example(name: str, n: int, options: ProofOptions, hasher, device: bool):
    """Returns (prover, trace, air_class, pub_inputs_fn)."""
    if name in ("fib", "fib2"):
        from .fibonacci import FibAir, FibProver, build_fib_trace
        return (_accel_f128(FibProver, device)(options, hasher),
                build_fib_trace(F128, n), FibAir)
    if name == "fib8":
        from .fibonacci import Fib8Air, Fib8Prover, build_fib8_trace
        return (_accel_f128(Fib8Prover, device)(options, hasher),
                build_fib8_trace(F128, n), Fib8Air)
    if name == "fib_small":
        from ..prover.device import GoldilocksProver
        from .fibonacci import FibSmallAir, FibSmallProver, build_fib_trace
        cls = (GoldilocksProver.accelerate(FibSmallProver) if device
               else FibSmallProver)
        return cls(options, hasher), build_fib_trace(F64, n), FibSmallAir
    if name == "mulfib":
        from .fibonacci import MulFib2Air, MulFib2Prover, build_mulfib_trace
        return (_accel_f128(MulFib2Prover, device)(options, hasher),
                build_mulfib_trace(F128, n), MulFib2Air)
    if name == "mulfib8":
        from .fibonacci import MulFib8Air, MulFib8Prover, build_mulfib8_trace
        return (_accel_f128(MulFib8Prover, device)(options, hasher),
                build_mulfib8_trace(F128, n), MulFib8Air)
    if name == "vdf":
        from .vdf import VdfAir, VdfProver, build_vdf_trace
        return (_accel_f128(VdfProver, device)(options, hasher),
                build_vdf_trace(F128, 123, n), VdfAir)
    if name == "vdfx":
        from .vdf import VdfExemptAir, VdfExemptProver, build_vdf_trace_exempt
        return (_accel_f128(VdfExemptProver, device)(options, hasher),
                build_vdf_trace_exempt(F128, 123, n), VdfExemptAir)
    if name == "rescue":
        from .rescue import RescueAir, RescueProver, build_rescue_trace
        return (_accel_f128(RescueProver, device)(options, hasher),
                build_rescue_trace((42, 43), n), RescueAir)
    if name == "rescue_raps":
        from .rescue_raps import (RescueRapsAir, RescueRapsProver,
                                  build_raps_trace)
        seeds = [(i + 1, i + 2) for i in range(n)]
        permuted = seeds[2:] + seeds[:2]
        return (_accel_f128(RescueRapsProver, device)(options, hasher),
                build_raps_trace(seeds, permuted), RescueRapsAir)
    if name == "merkle":
        from .merkle import (MerkleAir, MerkleProver, build_merkle_trace,
                             build_rescue128_merkle_tree, merkle_prove_path)
        value, index = (42, 43), 13 % (1 << n)
        leaves, nodes = build_rescue128_merkle_tree(n, value, index)
        leaf, path = merkle_prove_path(leaves, nodes, index)
        prover = _accel_f128(MerkleProver, device)(options, hasher, nodes[1])
        return prover, build_merkle_trace(value, [leaf] + path, index), MerkleAir
    if name == "lamport":
        from .lamport import (LamportAggregateAir, LamportAggregateProver,
                              PrivateKey, build_lamport_trace,
                              message_to_elements)
        keys = [PrivateKey(i) for i in range(n)]
        msgs = [message_to_elements(f"test message {i}".encode())
                for i in range(n)]
        sigs = [k.sign(f"test message {i}".encode())
                for i, k in enumerate(keys)]
        pks = [k.pub_key() for k in keys]
        prover = _accel_f128(LamportAggregateProver, device)(options, hasher, pks, msgs)
        return prover, build_lamport_trace(msgs, sigs), LamportAggregateAir
    if name == "lamport_threshold":
        # reference examples/src/lamport/threshold/mod.rs:70-92 — n signers
        # (n+1 a power of two), ~2/3 of them sign; here the subset is
        # deterministic (every signer except each third) instead of random.
        from .lamport import PrivateKey, message_to_elements
        from .lamport_threshold import (AggPublicKey, LamportThresholdAir,
                                        LamportThresholdProver,
                                        build_threshold_trace)
        msg = b"test message"
        keys = [PrivateKey(200 + i) for i in range(n)]
        pub_key = AggPublicKey([k.pub_key() for k in keys])
        # signature index refers to the SORTED key order inside AggPublicKey
        sorted_keys = sorted(range(n), key=lambda i: keys[i].pub_key())
        signer_indexes = [i for i in range(n) if i % 3 != 2]
        signatures = [(si, keys[sorted_keys[si]].sign(msg))
                      for si in signer_indexes]
        prover = LamportThresholdProver(options, hasher, pub_key,
                                        message_to_elements(msg),
                                        len(signatures))
        return (prover, build_threshold_trace(pub_key,
                                              message_to_elements(msg),
                                              signatures),
                LamportThresholdAir)
    raise SystemExit(f"unknown example: {name}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="winterfell_tpu example runner")
    parser.add_argument("example", choices=[
        "fib", "fib2", "fib8", "fib_small", "mulfib", "mulfib8", "vdf", "vdfx",
        "rescue", "rescue_raps", "merkle", "lamport", "lamport_threshold"])
    parser.add_argument("-n", type=int, default=1024,
                        help="size parameter (sequence length / chain length / "
                             "tree depth / #signatures)")
    parser.add_argument("-q", "--queries", type=int, default=28)
    parser.add_argument("-b", "--blowup", type=int, default=8)
    parser.add_argument("-g", "--grinding", type=int, default=16)
    parser.add_argument("-e", "--extension", type=int, default=1, choices=[1, 2, 3])
    parser.add_argument("-f", "--folding", type=int, default=8)
    parser.add_argument("-H", "--hash", dest="hash_fn", default="blake3_256",
                        choices=sorted(HASHERS))
    parser.add_argument("--device", action="store_true",
                        help="use the JAX/TPU device prover (f64+rp64_256 via "
                             "GoldilocksProver; f128+blake3 via F128Prover)")
    args = parser.parse_args(argv)

    options = build_options(args)
    hasher = HASHERS[args.hash_fn]

    t0 = time.time()
    prover, trace, air_class = get_example(
        args.example, args.n, options, hasher, args.device)
    print(f"Built execution trace of {trace.info().width}x{trace.length} "
          f"in {1000 * (time.time() - t0):.0f} ms")

    t0 = time.time()
    proof = prover.prove(trace)
    prove_ms = 1000 * (time.time() - t0)
    data = proof.to_bytes()
    conj = proof.conjectured_security(hasher)
    print(f"Proof generated in {prove_ms:.0f} ms")
    print(f"Proof size: {len(data) / 1024:.1f} KB")
    print(f"Conjectured security: {conj.bits} bits")

    pub_inputs = prover.get_pub_inputs(trace)
    t0 = time.time()
    verify(air_class, proof, pub_inputs, hasher,
           AcceptableOptions(option_set=[options]))
    print(f"Proof verified in {1000 * (time.time() - t0):.1f} ms")


if __name__ == "__main__":
    main()
