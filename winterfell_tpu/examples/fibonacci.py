"""Fibonacci examples (examples/src/fibonacci/): fib2 (width 2, 2 terms/row)
and fib_small (same AIR over the f64 field)."""

from __future__ import annotations

import numpy as np

from ..air import Air, AirContext, Assertion, TraceInfo, TransitionConstraintDegree
from ..math.fields import F64, F128, BaseField
from ..prover import Prover, TraceTable

TRACE_WIDTH = 2


def compute_fib_term(base: BaseField, n: int) -> int:
    """n-th term of the 2-term-per-row Fibonacci sequence
    (examples/src/fibonacci/utils.rs:8)."""
    t0, t1 = 1, 1
    for _ in range(n - 1):
        t1 = (t0 + t1) % base.p
        t0, t1 = t1, t0
    return t1


def build_fib_trace(base: BaseField, sequence_length: int) -> TraceTable:
    """(examples/src/fibonacci/fib2/prover.rs build_trace): row i holds terms
    (2i, 2i+1)."""
    assert sequence_length & (sequence_length - 1) == 0
    length = sequence_length // 2
    trace = TraceTable(base, TRACE_WIDTH, length)
    a, b = 1, 1
    trace.update_row(0, [a, b])
    for step in range(length - 1):
        a = (a + b) % base.p
        b = (a + b) % base.p
        trace.update_row(step + 1, [a, b])
    return trace


class FibAir(Air):
    """(examples/src/fibonacci/fib2/air.rs:28-68)."""

    base_field: BaseField = F128

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(1), TransitionConstraintDegree.new(1)]
        assert trace_info.width == TRACE_WIDTH
        self.context = AirContext.new(self.base_field, trace_info, degrees, 3, options)
        self.result = pub_inputs  # base int

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur0, cur1 = frame.current(0), frame.current(1)
        nxt0, nxt1 = frame.next(0), frame.next(1)
        # s0' = s0 + s1 ; s1' = s1 + s0'
        r0 = ops.sub(nxt0, ops.add(cur0, cur1))
        r1 = ops.sub(nxt1, ops.add(cur1, nxt0))
        return [r0, r1]

    def get_assertions(self):
        last_step = self.trace_length - 1
        return [
            Assertion.single(0, 0, (1,)),
            Assertion.single(1, 0, (1,)),
            Assertion.single(1, last_step, (self.result,)),
        ]


class FibSmallAir(FibAir):
    """fib_small runs the same AIR over f64
    (examples/src/fibonacci/fib_small/mod.rs:12)."""

    base_field = F64


class FibProver(Prover):
    air_class = FibAir

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        last = trace.length - 1
        return int(trace.get(1, last))


class FibSmallProver(FibProver):
    air_class = FibSmallAir
