"""End-to-end proving over the f62 field (no reference example uses f62 as a
base field, but the framework is field-generic — this pins it), including the
Rp62_248 hasher driving the full transcript."""

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
from winterfell_tpu.crypto.hashers import Blake3_256, Rp62_248
from winterfell_tpu.math.fields import F62
from winterfell_tpu.prover import Prover, TraceTable
from winterfell_tpu.verifier import VerifierError, verify


class FibF62Air(Air):
    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(1), TransitionConstraintDegree.new(1)]
        self.context = AirContext.new(F62, trace_info, degrees, 3, options)
        self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        c0, c1 = frame.current(0), frame.current(1)
        n0, n1 = frame.next(0), frame.next(1)
        return [ops.sub(n0, ops.add(c0, c1)), ops.sub(n1, ops.add(c1, n0))]

    def get_assertions(self):
        last = self.trace_length - 1
        return [
            Assertion.single(0, 0, (1,)),
            Assertion.single(1, 0, (1,)),
            Assertion.single(1, last, (self.result,)),
        ]


class FibF62Prover(Prover):
    air_class = FibF62Air

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        return int(trace.get(1, trace.length - 1))


def _trace(n=64):
    p = F62.p
    a, b = 1, 1
    trace = TraceTable(F62, 2, n)
    trace.update_row(0, [a, b])
    for step in range(n - 1):
        a = (a + b) % p
        b = (a + b) % p
        trace.update_row(step + 1, [a, b])
    return trace


@pytest.mark.parametrize("hasher", [Blake3_256, Rp62_248])
@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.QUADRATIC,
                                 FieldExtension.CUBIC])
def test_f62_e2e(hasher, ext):
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    trace = _trace()
    prover = FibF62Prover(options, hasher)
    proof = prover.prove(trace)
    result = prover.get_pub_inputs(trace)
    verify(FibF62Air, proof, result, hasher)
    with pytest.raises(VerifierError):
        verify(FibF62Air, proof, (result + 1) % F62.p, hasher)
