"""Trace validation + fragments tests (model: prover/src/trace tests)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.examples.fibonacci import FibAir, build_fib_trace
from winterfell_tpu.examples.rescue import RescueAir, RescuePublicInputs, build_rescue_trace
from winterfell_tpu.math.fields import F128
from winterfell_tpu.prover import TraceTable


def _options():
    return ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)


def test_validate_accepts_good_trace():
    trace = build_fib_trace(F128, 128)
    air = FibAir(trace.info(), trace.get(1, trace.length - 1), _options())
    trace.validate(air)


def test_validate_rejects_bad_transition():
    trace = build_fib_trace(F128, 128)
    air = FibAir(trace.info(), trace.get(1, trace.length - 1), _options())
    trace.set(0, 5, 999)  # corrupt a mid-trace cell
    with pytest.raises(AssertionError, match="transition constraint"):
        trace.validate(air)


def test_validate_rejects_bad_assertion():
    trace = build_fib_trace(F128, 128)
    air = FibAir(trace.info(), 12345, _options())  # wrong claimed result
    with pytest.raises(AssertionError, match="assertion"):
        trace.validate(air)


def test_validate_with_periodic_columns():
    trace = build_rescue_trace((42, 43), 2)
    last = trace.length - 1
    pub = RescuePublicInputs(seed=(42, 43),
                             result=(trace.get(0, last), trace.get(1, last)))
    air = RescueAir(trace.info(), pub, _options())
    trace.validate(air)


def test_fragments_fill_matches_sequential():
    def build(table):
        def init(state):
            state[0], state[1] = 1, 2

        def update(step, state):
            state[0] = (state[0] + state[1]) % F128.p
            state[1] = (state[0] * 3) % F128.p

        return init, update

    seq = TraceTable(F128, 2, 64)
    seq.fill(*build(seq))

    frag_table = TraceTable(F128, 2, 64)
    for fragment in frag_table.fragments(16):
        # each fragment re-derives its own start state in this toy example:
        # just refill the same recurrence from the same seed per fragment
        fragment.fill(*build(frag_table))
    # fragment 0 of the fragmented fill matches rows 0..16 of sequential
    assert (frag_table.data[:16] == seq.data[:16]).all()
    assert frag_table.fragments(16)[2].index() == 2
