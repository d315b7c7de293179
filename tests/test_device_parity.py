"""Device-prover feature-parity pins (VERDICT round-1 items):

- split (_FUSE_LIMIT-exceeded) commit pipeline == fused pipeline, byte-exact
- PartitionOptions on the device prover == host prover
- sequence boundary assertions on the device prover == host prover
- f64 aux-segment (Randomized AIR) on the device prover == host prover
"""

import numpy as np
import pytest

from winterfell_tpu.air import (
    Air,
    AirContext,
    Assertion,
    FieldExtension,
    ProofOptions,
    TraceInfo,
    TransitionConstraintDegree,
)
from winterfell_tpu.crypto.hashers import Rp64_256
from winterfell_tpu.examples.fibonacci import (
    FibSmallAir,
    FibSmallProver,
    build_fib_trace,
    compute_fib_term,
)
from winterfell_tpu.math.fields import F64, Field
from winterfell_tpu.prover import Prover, TraceTable
from winterfell_tpu.prover import device as device_mod
from winterfell_tpu.prover.device import GoldilocksProver
from winterfell_tpu.verifier import verify

_P = F64.p


# ================================================================================
# split vs fused commit pipelines (prover/device.py:_FUSE_LIMIT)
# ================================================================================


def test_split_commit_pipeline_matches_fused(monkeypatch):
    """Above _FUSE_LIMIT the commit pipelines run as separate programs; the
    proof bytes must be identical to the fused path."""
    options = ProofOptions(28, 8, 0, FieldExtension.CUBIC, 4, 7)
    prover = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256)
    fused = prover.prove(build_fib_trace(F64, 256))

    monkeypatch.setattr(device_mod, "_FUSE_LIMIT", 1)
    split_prover = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256)
    split = split_prover.prove(build_fib_trace(F64, 256))
    assert split.to_bytes() == fused.to_bytes()


# ================================================================================
# PartitionOptions on the device prover
# ================================================================================


@pytest.mark.parametrize("partitions", [2, 4])
def test_device_partitioned_commitments_match_host(partitions):
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7
                           ).with_partitions(partitions, 2)
    trace = build_fib_trace(F64, 256)
    host = FibSmallProver(options, Rp64_256).prove(trace)
    dev = GoldilocksProver.accelerate(FibSmallProver)(options, Rp64_256).prove(
        build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), Rp64_256)


# ================================================================================
# sequence assertions (boundary value polynomials) on the device prover
# ================================================================================


def build_seqfib_trace(length: int) -> TraceTable:
    trace = TraceTable(F64, 2, length)
    a, b = 1, 1
    trace.update_row(0, [a, b])
    for step in range(length - 1):
        a = (a + b) % _P
        b = (a + b) % _P
        trace.update_row(step + 1, [a, b])
    return trace


class SeqFibAir(Air):
    """Fibonacci main constraints plus a SEQUENCE assertion pinning column 0
    at every trace_length/4 stride — exercises the boundary value-polynomial
    path (air/src/air/boundary/mod.rs:42-144) on both provers."""

    base_field = F64

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(1),
                   TransitionConstraintDegree.new(1)]
        # assertions: 2 singles on column 1 + 1 sequence on column 0
        self.context = AirContext.new(F64, trace_info, degrees, 3, options)
        self.seq_values, self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(v,) for v in self.seq_values] + [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur0, cur1 = frame.current(0), frame.current(1)
        nxt0, nxt1 = frame.next(0), frame.next(1)
        return [
            ops.sub(nxt0, ops.add(cur0, cur1)),
            ops.sub(nxt1, ops.add(cur1, nxt0)),
        ]

    def get_assertions(self):
        n = self.trace_length
        stride = n // 4
        return [
            Assertion.single(1, 0, (1,)),
            Assertion.single(1, n - 1, (self.result,)),
            Assertion.sequence(0, 0, stride, [(v,) for v in self.seq_values]),
        ]


class SeqFibProver(Prover):
    air_class = SeqFibAir

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        n = trace.length
        stride = n // 4
        seq = [int(trace.get(0, i * stride)) for i in range(4)]
        return (tuple(seq), int(trace.get(1, n - 1)))


@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.CUBIC])
def test_device_sequence_assertions_match_host(ext):
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    trace = build_seqfib_trace(256)
    host = SeqFibProver(options, Rp64_256).prove(trace)
    dev = GoldilocksProver.accelerate(SeqFibProver)(options, Rp64_256).prove(
        build_seqfib_trace(256))
    assert dev.to_bytes() == host.to_bytes()
    pub = SeqFibProver(options, Rp64_256).get_pub_inputs(build_seqfib_trace(256))
    verify(SeqFibAir, dev, pub, Rp64_256)


# ================================================================================
# f64 aux segment (Randomized AIR) on the device prover
# ================================================================================

AUX_WIDTH = 1
NUM_AUX_RANDS = 1


def build_auxfib_trace(length: int) -> TraceTable:
    trace = build_seqfib_trace(length)
    trace.set_aux_shape(AUX_WIDTH, NUM_AUX_RANDS)
    return trace


class AuxFibAir(Air):
    """Fibonacci main trace with a 1-column aux segment: a running product
    acc' = acc · (main0 + γ) — a minimal f64 Randomized AIR exercising the
    device aux commit + aux transition path (air/src/air/mod.rs:174-284)."""

    base_field = F64

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        main_degrees = [TransitionConstraintDegree.new(1),
                        TransitionConstraintDegree.new(1)]
        aux_degrees = [TransitionConstraintDegree.new(2)]
        self.context = AirContext.new_multi_segment(
            F64, trace_info, main_degrees, aux_degrees, 3, 1, options)
        self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur0, cur1 = frame.current(0), frame.current(1)
        nxt0, nxt1 = frame.next(0), frame.next(1)
        return [
            ops.sub(nxt0, ops.add(cur0, cur1)),
            ops.sub(nxt1, ops.add(cur1, nxt0)),
        ]

    def evaluate_aux_transition(self, main_frame, aux_frame, periodic_values,
                                aux_rand_elements, ops):
        gamma = ops.lift(aux_rand_elements[0])
        acc = aux_frame.current(0)
        acc_next = aux_frame.next(0)
        term = ops.add(main_frame.current(0), gamma)
        return [ops.sub(acc_next, ops.mul(acc, term))]

    def get_assertions(self):
        n = self.trace_length
        return [
            Assertion.single(0, 0, (1,)),
            Assertion.single(1, 0, (1,)),
            Assertion.single(1, n - 1, (self.result,)),
        ]

    def get_aux_assertions(self, aux_rand_elements):
        return [Assertion.single(0, 0, self.ext_field.one())]


class AuxFibProver(Prover):
    air_class = AuxFibAir

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        return int(trace.get(1, trace.length - 1))

    def build_aux_trace(self, trace, aux_rand_elements) -> np.ndarray:
        ext = Field(F64, self.options.field_extension.degree)
        gamma = aux_rand_elements[0]
        n = trace.length
        main = trace.main_segment()
        aux = np.zeros((n, AUX_WIDTH, ext.degree), dtype=object)
        acc = ext.one()
        aux[0, 0] = list(acc)
        for i in range(1, n):
            term = ext.add(ext.from_base(int(main[i - 1, 0])), gamma)
            acc = ext.mul(acc, term)
            aux[i, 0] = list(acc)
        return aux


@pytest.mark.parametrize("ext", [FieldExtension.QUADRATIC, FieldExtension.CUBIC])
def test_device_aux_segment_matches_host(ext):
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host = AuxFibProver(options, Rp64_256).prove(build_auxfib_trace(128))
    dev = GoldilocksProver.accelerate(AuxFibProver)(options, Rp64_256).prove(
        build_auxfib_trace(128))
    assert dev.to_bytes() == host.to_bytes()
    pub = AuxFibProver(options, Rp64_256).get_pub_inputs(build_auxfib_trace(128))
    verify(AuxFibAir, dev, pub, Rp64_256)
