"""Constraint divisors (air/src/air/divisor.rs:28-150).

A divisor is Π (x^a − b) / Π (x − e): a sparse numerator product and a list
of exemption points. Transition divisor: (x^n − 1) / Π (x − g^{n−i});
assertion divisor: (x^k − g^{a·k}).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..math.fields import BaseField, Field


@dataclass(frozen=True)
class ConstraintDivisor:
    numerator: Tuple[Tuple[int, int], ...]  # (degree, constant b) pairs, base ints
    exemptions: Tuple[int, ...] = field(default_factory=tuple)  # base ints

    @classmethod
    def from_transition(cls, base: BaseField, ce_domain_size: int,
                        num_exemptions: int) -> "ConstraintDivisor":
        """(x^n − 1) / Π_{i=1..k} (x − g^{n−i}) (divisor.rs:53-62)."""
        g = base.get_root_of_unity(ce_domain_size.bit_length() - 1)
        exemptions = tuple(
            pow(g, step, base.p)
            for step in range(ce_domain_size - num_exemptions, ce_domain_size)
        )
        return cls(((ce_domain_size, 1),), exemptions)

    @classmethod
    def from_assertion(cls, base: BaseField, assertion, trace_length: int
                       ) -> "ConstraintDivisor":
        """x^k − g^{a·k} (divisor.rs:87-100)."""
        num_steps = assertion.get_num_steps(trace_length)
        if assertion.first_step == 0:
            return cls(((num_steps, 1),))
        g = base.get_root_of_unity(trace_length.bit_length() - 1)
        offset = pow(g, num_steps * assertion.first_step, base.p)
        return cls(((num_steps, offset),))

    def degree(self) -> int:
        return sum(d for d, _ in self.numerator) - len(self.exemptions)

    def evaluate_at(self, field_: Field, x: tuple) -> tuple:
        numerator = field_.one()
        for deg, b in self.numerator:
            v = field_.sub(field_.exp(x, deg), field_.from_base(b))
            numerator = field_.mul(numerator, v)
        return field_.div(numerator, self.evaluate_exemptions_at(field_, x))

    def evaluate_exemptions_at(self, field_: Field, x: tuple) -> tuple:
        result = field_.one()
        for e in self.exemptions:
            result = field_.mul(result, field_.sub(x, field_.from_base(e)))
        return result
