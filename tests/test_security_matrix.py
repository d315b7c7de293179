"""ProvenSecurity estimator matrix — every expected number below is copied
from the reference's own test suite (air/src/proof/security.rs:358-1060,
f64 base field → base_field_bits = 64), so agreement here is direct
reference-sourced evidence that the round-by-round soundness computation
(ePrint 2024/1553 Theorems 2 & 3) matches the Rust implementation."""

import pytest

from winterfell_tpu.air import BatchingMethod, FieldExtension, ProofOptions
from winterfell_tpu.air.security import ProvenSecurity

BITS = 64  # the reference tests use math::fields::f64::BaseElement
CR = 128    # collision resistance
POLYS = 2
CONSTRAINTS = 100


def proven(queries, blowup, grinding, ext, folding, remainder, trace_len,
           batch_c=BatchingMethod.LINEAR, batch_d=BatchingMethod.LINEAR,
           polys=POLYS, constraints=CONSTRAINTS):
    options = ProofOptions(queries, blowup, grinding, ext, folding, remainder,
                           batching_constraints=batch_c, batching_deep=batch_d)
    return ProvenSecurity.compute(options, BITS, trace_len, CR, constraints,
                                  polys)


Q = FieldExtension.QUADRATIC
C = FieldExtension.CUBIC


def test_get_100_bits_security():
    # security.rs:358-443
    s = proven(119, 4, 20, Q, 2, 127, 1 << 20)
    assert s.unique_decoding == 100
    assert s.list_decoding == 69
    # more queries do not help the LDR case
    assert proven(150, 4, 20, Q, 2, 127, 1 << 20).list_decoding == 69
    # a larger extension does: fewer queries reach 100 bits in LDR
    assert proven(81, 4, 20, C, 2, 127, 1 << 20).list_decoding == 100


def test_unique_decoding_folding_factor_effect():
    # security.rs:445-501
    assert proven(123, 8, 16, Q, 2, 7, 1 << 8).unique_decoding == 116
    assert proven(123, 8, 16, Q, 4, 7, 1 << 8).unique_decoding == 115


def test_unique_versus_list_decoding_rate_effect():
    # security.rs:503-617
    assert proven(195, 2, 20, Q, 2, 7, 1 << 8).unique_decoding == 100
    # larger extension: ~16% fewer queries at rate 1/2
    assert proven(163, 2, 20, C, 2, 7, 1 << 8).list_decoding == 100
    # at rate 1/4 the improvement is ~32%
    assert proven(119, 4, 20, Q, 2, 7, 1 << 8).unique_decoding == 100
    assert proven(81, 4, 20, C, 2, 7, 1 << 8).list_decoding == 100


def test_get_96_bits_security():
    # security.rs:619-678
    assert proven(80, 4, 20, C, 8, 127, 1 << 18).list_decoding == 99
    # larger blowup: more bits per query
    assert proven(53, 8, 20, C, 8, 127, 1 << 18).list_decoding == 99


def test_get_128_bits_security():
    # security.rs:680-739
    assert proven(85, 8, 20, C, 8, 127, 1 << 18).list_decoding == 128
    assert proven(65, 16, 20, C, 8, 127, 1 << 18).list_decoding == 128


def test_extension_degree():
    # security.rs:741-800
    assert proven(85, 8, 20, Q, 8, 127, 1 << 18).list_decoding == 70
    # larger extension degree helps
    assert proven(85, 8, 20, C, 8, 127, 1 << 18).list_decoding == 128


def test_trace_length():
    # security.rs:802-863: shorter traces are at least as secure
    s1 = proven(80, 8, 20, C, 8, 127, 1 << 20)
    s2 = proven(80, 8, 20, C, 8, 127, 1 << 16)
    assert s1.list_decoding < s2.list_decoding


def test_num_fri_queries():
    # security.rs:865-926: more queries, more security
    s1 = proven(60, 8, 20, C, 8, 127, 1 << 20)
    s2 = proven(80, 8, 20, C, 8, 127, 1 << 20)
    assert s1.list_decoding < s2.list_decoding


def test_blowup_factor():
    # security.rs:928-989: larger blowup, more security
    s1 = proven(30, 8, 20, C, 8, 127, 1 << 20)
    s2 = proven(30, 16, 20, C, 8, 127, 1 << 20)
    assert s1.list_decoding < s2.list_decoding


def test_deep_batching_method_udr():
    # security.rs:991-1060: algebraic DEEP batching cost is logarithmic in
    # the number of committed polynomials (no UDR change from 2 -> 4)
    s1 = proven(120, 8, 20, Q, 8, 255, 1 << 16,
                batch_d=BatchingMethod.ALGEBRAIC, polys=2)
    assert s1.unique_decoding == 106
    s2 = proven(120, 8, 20, Q, 8, 255, 1 << 16,
                batch_d=BatchingMethod.ALGEBRAIC, polys=4)
    assert s2.unique_decoding == 106
