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

    if base.p == (1 << 64) - (1 << 32) + 1:  # Goldilocks: native C builder
        from ..crypto import native

        if native.available():
            import numpy as np

            rows = np.empty((length, 2), dtype=np.uint64)
            native._load().wt_fib64_trace(length, rows.ctypes.data)
            trace.set_native_rows(rows)
            return trace

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


# ================================================================================
# fib8: 8 Fibonacci terms per row (examples/src/fibonacci/fib8/)
# ================================================================================


def build_fib8_trace(base: BaseField, sequence_length: int) -> TraceTable:
    """Row i holds terms (8i+6, 8i+7) (fib8/prover.rs:32-62)."""
    assert sequence_length & (sequence_length - 1) == 0
    p = base.p
    terms = [1, 1]
    for _ in range(6):
        terms.append((terms[-2] + terms[-1]) % p)
    reg0, reg1 = [terms[6]], [terms[7]]
    for i in range(sequence_length // 8 - 1):
        a, b = reg0[i], reg1[i]
        for _ in range(4):
            a = (a + b) % p
            b = (a + b) % p
        reg0.append(a)
        reg1.append(b)
    return TraceTable.init(base, [reg0, reg1])


class Fib8Air(Air):
    """(examples/src/fibonacci/fib8/air.rs)."""

    base_field: BaseField = F128

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(1), TransitionConstraintDegree.new(1)]
        assert trace_info.width == TRACE_WIDTH
        self.context = AirContext.new(self.base_field, trace_info, degrees, 3, options)
        self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur0, cur1 = frame.current(0), frame.current(1)
        n = [ops.add(cur0, cur1)]
        n.append(ops.add(cur1, n[0]))
        for k in range(2, 8):
            n.append(ops.add(n[k - 2], n[k - 1]))
        return [
            ops.sub(frame.next(0), n[6]),
            ops.sub(frame.next(1), n[7]),
        ]

    def get_assertions(self):
        p = self.base_field.p
        last_step = self.trace_length - 1
        return [
            Assertion.single(0, 0, (13 % p,)),
            Assertion.single(1, 0, (21 % p,)),
            Assertion.single(1, last_step, (self.result,)),
        ]


class Fib8Prover(FibProver):
    air_class = Fib8Air


# ================================================================================
# mulfib2 / mulfib8: multiplicative Fibonacci (examples/src/fibonacci/mulfib*/)
# ================================================================================


def build_mulfib_trace(base: BaseField, sequence_length: int) -> TraceTable:
    """(mulfib2/prover.rs:32-44)."""
    assert sequence_length & (sequence_length - 1) == 0
    p = base.p
    reg0, reg1 = [1], [2]
    for i in range(sequence_length // 2 - 1):
        reg0.append(reg0[i] * reg1[i] % p)
        reg1.append(reg1[i] * reg0[i + 1] % p)
    return TraceTable.init(base, [reg0, reg1])


def compute_mulfib_term(base: BaseField, n: int) -> int:
    p = base.p
    t0, t1 = 1, 2
    for _ in range(n - 2):
        t0, t1 = t1, t0 * t1 % p
    return t1 if n > 1 else t0


class MulFib2Air(Air):
    """(examples/src/fibonacci/mulfib2/air.rs) — degree-2 constraints."""

    base_field: BaseField = F128

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(2), TransitionConstraintDegree.new(2)]
        assert trace_info.width == TRACE_WIDTH
        self.context = AirContext.new(self.base_field, trace_info, degrees, 3, options)
        self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur0, cur1 = frame.current(0), frame.current(1)
        nxt0, nxt1 = frame.next(0), frame.next(1)
        return [
            ops.sub(nxt0, ops.mul(cur0, cur1)),
            ops.sub(nxt1, ops.mul(cur1, nxt0)),
        ]

    def get_assertions(self):
        last_step = self.trace_length - 1
        return [
            Assertion.single(0, 0, (1,)),
            Assertion.single(1, 0, (2,)),
            Assertion.single(0, last_step, (self.result,)),
        ]


class MulFib2Prover(Prover):
    air_class = MulFib2Air

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        return int(trace.get(0, trace.length - 1))


def build_mulfib8_trace(base: BaseField, sequence_length: int) -> TraceTable:
    """8 registers of the multiplicative sequence (mulfib8/prover.rs)."""
    assert sequence_length & (sequence_length - 1) == 0
    p = base.p
    seq = [1, 2]
    for i in range(sequence_length - 2):
        seq.append(seq[i] * seq[i + 1] % p)
    rows = sequence_length // 8
    cols = [[seq[8 * r + c] for r in range(rows)] for c in range(8)]
    return TraceTable.init(base, cols)


class MulFib8Air(Air):
    """(examples/src/fibonacci/mulfib8/air.rs) — width 8, degree 2."""

    base_field: BaseField = F128

    def __init__(self, trace_info: TraceInfo, pub_inputs, options):
        degrees = [TransitionConstraintDegree.new(2) for _ in range(8)]
        assert trace_info.width == 8
        self.context = AirContext.new(self.base_field, trace_info, degrees, 3, options)
        self.result = pub_inputs

    def pub_inputs_to_elements(self):
        return [(self.result,)]

    def evaluate_transition(self, frame, periodic_values, ops):
        cur = [frame.current(i) for i in range(8)]
        nxt = [frame.next(i) for i in range(8)]
        results = [
            ops.sub(nxt[0], ops.mul(cur[6], cur[7])),
            ops.sub(nxt[1], ops.mul(cur[7], nxt[0])),
        ]
        for k in range(2, 8):
            results.append(ops.sub(nxt[k], ops.mul(nxt[k - 2], nxt[k - 1])))
        return results

    def get_assertions(self):
        last_step = self.trace_length - 1
        return [
            Assertion.single(0, 0, (1,)),
            Assertion.single(1, 0, (2,)),
            Assertion.single(6, last_step, (self.result,)),
        ]


class MulFib8Prover(Prover):
    air_class = MulFib8Air

    def __init__(self, options, hasher):
        super().__init__(options)
        self.hasher = hasher

    def get_pub_inputs(self, trace):
        return int(trace.get(6, trace.length - 1))
