"""Proof security estimators (air/src/proof/security.rs).

ConjecturedSecurity: Eq. (19) of ePrint 2021/582 (security.rs:30-48).
ProvenSecurity: Theorems 2 and 3 of ePrint 2024/1553 — round-by-round
soundness in the list-decoding and unique-decoding regimes (security.rs:67-284).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .options import BatchingMethod, ProofOptions

GRINDING_CONTRIBUTION_FLOOR = 80
MAX_PROXIMITY_PARAMETER = 1000


@dataclass(frozen=True)
class ConjecturedSecurity:
    bits: int

    @classmethod
    def compute(cls, options: ProofOptions, base_field_bits: int,
                collision_resistance: int) -> "ConjecturedSecurity":
        field_security = base_field_bits * options.field_extension.degree
        security_per_query = options.blowup_factor.bit_length() - 1
        query_security = security_per_query * options.num_queries
        if query_security >= GRINDING_CONTRIBUTION_FLOOR:
            query_security += options.grinding_factor
        return cls(min(min(field_security, query_security) - 1, collision_resistance))

    def is_at_least(self, bits: int) -> bool:
        return self.bits >= bits


@dataclass(frozen=True)
class ProvenSecurity:
    unique_decoding: int
    list_decoding: int

    @classmethod
    def compute(cls, options: ProofOptions, base_field_bits: int,
                trace_domain_size: int, collision_resistance: int,
                num_constraints: int, num_committed_polys: int) -> "ProvenSecurity":
        udr = min(
            _unique_decoding(options, base_field_bits, trace_domain_size,
                             num_constraints, num_committed_polys),
            collision_resistance,
        )
        m_min, m_max = 3, int(_compute_upper_m(trace_domain_size))
        m_optimal = max(
            range(m_min, m_max),
            key=lambda m: _list_decoding(
                options, base_field_bits, trace_domain_size, m,
                num_constraints, num_committed_polys),
        )
        ldr = min(
            _list_decoding(options, base_field_bits, trace_domain_size,
                           m_optimal, num_constraints, num_committed_polys),
            collision_resistance,
        )
        return cls(int(udr), int(ldr))

    def is_at_least(self, bits: int) -> bool:
        return self.list_decoding >= bits or self.unique_decoding >= bits


def _log2(x: float) -> float:
    """Rust f64::log2 semantics: log2(0) = −inf, log2(<0) = NaN (Python's
    math.log2 raises on both, which diverges for the boundary proximity
    parameter m = ρ·n/2 where the list size l is +inf)."""
    if x > 0.0:
        return math.log2(x)
    if x == 0.0:
        return -math.inf
    return math.nan


def _rust_min(values) -> float:
    """f64::min fold: NaN operands are skipped (security.rs:219 fold)."""
    out = math.inf
    for v in values:
        if not math.isnan(v):
            out = min(out, v)
    return out


def _as_u64(x: float) -> int:
    """Rust `as u64` saturating float→int cast (NaN → 0)."""
    if math.isnan(x) or x < 0.0:
        return 0
    if x == math.inf:
        return (1 << 64) - 1
    return int(x)


def _list_decoding(options: ProofOptions, base_field_bits: int,
                   trace_domain_size: int, m: int, num_constraints: int,
                   num_committed_polys: int) -> int:
    """Theorem 2 soundness at proximity parameter m (security.rs:149-221)."""
    ext_bits = float(base_field_bits * options.field_extension.degree)
    num_queries = float(options.num_queries)
    mf = float(m)
    rho = 1.0 / options.blowup_factor
    alpha = (1.0 + 0.5 / mf) * math.sqrt(rho)
    max_deg = options.blowup_factor + 1.0
    lde_domain_size = float(trace_domain_size * options.blowup_factor)
    h = float(trace_domain_size)
    num_openings = 2.0

    eps = []
    den = rho - (2.0 * mf / lde_domain_size)
    l = math.inf if den == 0.0 else mf / den  # list size (may be ±inf/neg)

    bf = (1.0 if options.batching_constraints == BatchingMethod.LINEAR
          else num_constraints - 1.0)
    eps.append(-_log2(l) - _log2(bf) + ext_bits)

    eps.append(-_log2(
        l * l * (max_deg * (h + num_openings - 1.0) + (h - 1.0))) + ext_bits)

    bf = (1.0 if options.batching_deep == BatchingMethod.LINEAR
          else num_committed_polys - 1.0)
    eps.append(ext_bits - _log2(
        (math.pow(mf + 0.5, 7.0) / (3.0 * math.pow(rho, 1.5)))
        * math.pow(lde_domain_size, 2.0) * bf))

    eps.append(options.grinding_factor - _log2(math.pow(alpha, num_queries)))
    return _as_u64(_rust_min(eps))


def _unique_decoding(options: ProofOptions, base_field_bits: int,
                     trace_domain_size: int, num_constraints: int,
                     num_committed_polys: int) -> int:
    """Theorem 3 soundness (security.rs:224-284)."""
    from ..fri import FriOptions

    ext_bits = float(base_field_bits * options.field_extension.degree)
    num_queries = float(options.num_queries)
    lde_domain_size = float(trace_domain_size * options.blowup_factor)
    h = float(trace_domain_size)
    num_openings = 2.0
    rho_plus = (h + num_openings) / lde_domain_size
    alpha = (1.0 + rho_plus) * 0.5
    max_deg = options.blowup_factor + 1.0

    eps = []
    bf = (1.0 if options.batching_constraints == BatchingMethod.LINEAR
          else num_constraints - 1.0)
    eps.append(-math.log2(bf) + ext_bits)

    eps.append(-math.log2(
        max_deg * (h + num_openings - 1.0) + (h - 1.0)) + ext_bits)

    bf = (1.0 if options.batching_deep == BatchingMethod.LINEAR
          else num_committed_polys - 1.0)
    eps.append(ext_bits - math.log2(lde_domain_size * bf))

    fri = FriOptions(options.blowup_factor, options.fri_folding_factor,
                     options.fri_remainder_max_degree)
    folding = float(options.fri_folding_factor)
    if fri.num_fri_layers(int(lde_domain_size)) > 0:
        eps.append(ext_bits - math.log2((folding - 1.0) * (lde_domain_size + 1.0)))

    eps.append(options.grinding_factor - _log2(math.pow(alpha, num_queries)))
    return _as_u64(_rust_min(eps))


def _compute_upper_m(h: int) -> float:
    """(security.rs:291-302)."""
    hf = float(h)
    ratio = (hf + 2.0) / hf
    m_max = math.ceil(1.0 / (2.0 * (math.sqrt(ratio) - 1.0)))
    assert m_max >= hf / 2.0, "the bound in the theorem should be tighter"
    return float(min(int(m_max), MAX_PROXIMITY_PARAMETER))
