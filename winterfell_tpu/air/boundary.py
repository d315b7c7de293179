"""Boundary constraints grouped by divisor (air/src/air/boundary/*.rs).

A boundary constraint is (trace_value − b(x)) · cc where b is the value
polynomial interpolated from the asserted values (constraint.rs:35-137).
Groups share a divisor; group order follows the BTreeMap key
(stride, first_step) of the underlying assertions (mod.rs:157-186).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..math import ntt, polynom, vecmath as vm
from ..math.fields import Field
from .assertions import Assertion, prepare_assertions
from .divisor import ConstraintDivisor


@dataclass
class BoundaryConstraint:
    """`poly` coefficients live in `value_field` (base for main assertions,
    extension for aux); `cc` in the extension field."""

    column: int
    poly: List[tuple]
    poly_offset_step: int
    poly_offset: int  # base-field element by which x is scaled before eval
    cc: tuple

    @classmethod
    def new(cls, value_field: Field, assertion: Assertion, inv_g: int,
            cc: tuple) -> "BoundaryConstraint":
        poly = list(assertion.values)
        offset_step, offset = 0, 1
        if len(poly) > 1:
            # interpolate asserted values into a polynomial over their cycle
            base = value_field.base
            coeffs = ntt.interpolate_poly(base, vm.asarray(poly))
            poly = vm.totuples(coeffs)
            if assertion.first_step != 0:
                # evaluate as b(x·g^{-first_step}) (constraint.rs:77-86)
                offset_step = assertion.first_step
                offset = pow(inv_g, assertion.first_step, base.p)
        return cls(assertion.column, poly, offset_step, offset, cc)

    def evaluate_at(self, ext_field: Field, x: tuple, trace_value: tuple) -> tuple:
        """trace_value − b(x) in the extension field (constraint.rs:125-150)."""
        if len(self.poly) == 1:
            b = self._lift(ext_field, self.poly[0])
        else:
            xs = ext_field.mul_base(x, self.poly_offset)
            b = polynom.eval_poly(ext_field, [self._lift(ext_field, c) for c in self.poly], xs)
        return ext_field.sub(trace_value, b)

    @staticmethod
    def _lift(ext_field: Field, v: tuple) -> tuple:
        """Embed a value-field element into the extension field."""
        if len(v) == ext_field.degree:
            return v
        assert len(v) == 1
        return ext_field.from_base(v[0])


@dataclass
class BoundaryConstraintGroup:
    divisor: ConstraintDivisor
    constraints: List[BoundaryConstraint]

    def add(self, value_field: Field, assertion: Assertion, inv_g: int, cc: tuple) -> None:
        self.constraints.append(BoundaryConstraint.new(value_field, assertion, inv_g, cc))

    def evaluate_at(self, ext_field: Field, x: tuple, trace_values: List[tuple]) -> tuple:
        """Σ cc_i · (trace_value_i − b_i(x)) — numerators only."""
        result = ext_field.zero()
        for c in self.constraints:
            num = c.evaluate_at(ext_field, x, trace_values[c.column])
            result = ext_field.add(result, ext_field.mul(num, c.cc))
        return result


class BoundaryConstraints:
    """main + aux groups (air/src/air/boundary/mod.rs:42-144)."""

    def __init__(self, context, main_assertions: List[Assertion],
                 aux_assertions: List[Assertion], composition_coefficients: List[tuple]):
        assert len(main_assertions) == context.num_main_assertions
        assert len(aux_assertions) == context.num_aux_assertions
        assert len(composition_coefficients) == context.num_assertions

        base = context.base
        trace_length = context.trace_info.length
        main_assertions = prepare_assertions(
            main_assertions, context.trace_info.main_segment_width, trace_length)
        aux_assertions = prepare_assertions(
            aux_assertions, context.trace_info.aux_segment_width, trace_length)

        inv_g = pow(context.trace_domain_generator, base.p - 2, base.p)
        main_ccs = composition_coefficients[: len(main_assertions)]
        aux_ccs = composition_coefficients[len(main_assertions):]

        main_field = Field(base, 1)
        ext_field = context.ext_field
        self.main_groups = self._group(
            context, main_field, main_assertions, main_ccs, inv_g)
        self.aux_groups = self._group(
            context, ext_field, aux_assertions, aux_ccs, inv_g)

    @staticmethod
    def _group(context, value_field: Field, assertions: List[Assertion],
               ccs: List[tuple], inv_g: int) -> List[BoundaryConstraintGroup]:
        groups: Dict[Tuple[int, int], BoundaryConstraintGroup] = {}
        for assertion, cc in zip(assertions, ccs):
            key = (assertion.stride, assertion.first_step)
            if key not in groups:
                divisor = ConstraintDivisor.from_assertion(
                    context.base, assertion, context.trace_info.length)
                groups[key] = BoundaryConstraintGroup(divisor, [])
            groups[key].add(value_field, assertion, inv_g, cc)
        return [groups[k] for k in sorted(groups)]
