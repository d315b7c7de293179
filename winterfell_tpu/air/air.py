"""The Air base class — the user-facing computation description.

Mirrors the reference `Air` trait shape (air/src/air/mod.rs:174-539) with one
TPU-first change: ``evaluate_transition`` is vectorized by construction. It
receives an :class:`EvaluationFrame` whose columns are arrays covering a block
of evaluation rows, plus an engine handle (``ops``) for field arithmetic, and
returns one array per constraint. The same AIR code therefore runs:

- over the full constraint-evaluation domain in the prover (host or TPU engine),
- at a single out-of-domain point in the verifier (1-row arrays).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..math import ntt, vecmath as vm
from ..math.fields import BaseField, Field
from .assertions import Assertion
from .boundary import BoundaryConstraints
from .coefficients import (
    ConstraintCompositionCoefficients,
    DeepCompositionCoefficients,
)
from .context import AirContext
from .divisor import ConstraintDivisor
from .options import ProofOptions
from .trace_info import TraceInfo


class EvaluationFrame:
    """Two adjacent trace rows (or row blocks): current and next
    (air/src/air/transition/frame.rs:19)."""

    __slots__ = ("_current", "_next")

    def __init__(self, current: List[np.ndarray], next_: List[np.ndarray]):
        self._current = current
        self._next = next_

    def current(self, column: int) -> np.ndarray:
        return self._current[column]

    def next(self, column: int) -> np.ndarray:
        return self._next[column]

    @property
    def width(self) -> int:
        return len(self._current)


class TransitionConstraints:
    """Degrees + coefficients + shared divisor (air/src/air/transition/mod.rs:32-153)."""

    def __init__(self, context: AirContext, composition_coefficients: List[tuple]):
        assert context.num_transition_constraints == len(composition_coefficients)
        self.divisor = ConstraintDivisor.from_transition(
            context.base, context.trace_len, context.num_transition_exemptions
        )
        n_main = len(context.main_degrees)
        self.main_degrees = context.main_degrees
        self.aux_degrees = context.aux_degrees
        self.main_coefficients = composition_coefficients[:n_main]
        self.aux_coefficients = composition_coefficients[n_main:]

    def combine_evaluations(self, field_: Field, main_evaluations: List[tuple],
                            aux_evaluations: List[tuple], x: tuple) -> tuple:
        """Σ cc_i·C_i(x) / z(x) (transition/mod.rs:139-170)."""
        result = field_.zero()
        for ev, cc in zip(main_evaluations, self.main_coefficients):
            result = field_.add(result, field_.mul(ev, cc))
        for ev, cc in zip(aux_evaluations, self.aux_coefficients):
            result = field_.add(result, field_.mul(ev, cc))
        return field_.div(result, self.divisor.evaluate_at(field_, x))


class Air:
    """Subclasses must set ``self.context`` in ``__init__`` and implement
    ``evaluate_transition`` and ``get_assertions``; Randomized AIRs also
    implement the aux variants. ``pub_inputs_to_elements`` defines the public
    input contribution to the Fiat–Shamir seed."""

    def __init__(self, trace_info: TraceInfo, pub_inputs, options: ProofOptions):
        raise NotImplementedError

    # -- required interface -------------------------------------------------

    def evaluate_transition(self, frame: EvaluationFrame, periodic_values, ops) -> list:
        raise NotImplementedError

    def get_assertions(self) -> List[Assertion]:
        raise NotImplementedError

    def pub_inputs_to_elements(self) -> List[tuple]:
        """Public inputs as base-field elements (ToElements for the seed)."""
        raise NotImplementedError

    # -- optional Randomized-AIR interface ----------------------------------

    def evaluate_aux_transition(self, main_frame: EvaluationFrame,
                                aux_frame: EvaluationFrame, periodic_values,
                                aux_rand_elements, ops) -> list:
        raise NotImplementedError("evaluate_aux_transition() not implemented")

    def get_aux_assertions(self, aux_rand_elements) -> List[Assertion]:
        return []

    def get_periodic_column_values(self) -> List[List[int]]:
        """Base-field ints per periodic column; lengths are powers of two."""
        return []

    # -- provided methods ---------------------------------------------------

    @property
    def base(self) -> BaseField:
        return self.context.base

    @property
    def options(self) -> ProofOptions:
        return self.context.options

    @property
    def trace_info(self) -> TraceInfo:
        return self.context.trace_info

    @property
    def trace_length(self) -> int:
        return self.context.trace_len

    @property
    def ext_field(self) -> Field:
        return self.context.ext_field

    @property
    def ce_blowup_factor(self) -> int:
        return self.context.ce_blowup_factor

    @property
    def lde_domain_size(self) -> int:
        return self.context.lde_domain_size

    @property
    def trace_domain_generator(self) -> int:
        return self.context.trace_domain_generator

    @property
    def lde_domain_generator(self) -> int:
        return self.context.lde_domain_generator

    @property
    def domain_offset(self) -> int:
        return self.base.generator

    def get_periodic_column_polys(self) -> List[List[int]]:
        """Interpolate periodic values into polynomials (air/mod.rs:321-356)."""
        polys = []
        for column in self.get_periodic_column_values():
            cl = len(column)
            assert cl >= 2 and cl & (cl - 1) == 0, (
                "periodic column length must be a power of two >= 2"
            )
            assert cl <= self.trace_length
            coeffs = ntt.interpolate_poly(self.base, vm.base_asarray(column)[:, None])
            polys.append([int(c) for c in coeffs[:, 0]])
        return polys

    def get_aux_rand_elements(self, public_coin) -> List[tuple]:
        n = self.trace_info.num_aux_segment_rands
        return [public_coin.draw(self.ext_field) for _ in range(n)]

    def get_transition_constraints(self, composition_coefficients: List[tuple]
                                   ) -> TransitionConstraints:
        return TransitionConstraints(self.context, composition_coefficients)

    def get_boundary_constraints(self, aux_rand_elements,
                                 composition_coefficients: List[tuple]
                                 ) -> BoundaryConstraints:
        aux_assertions = (
            self.get_aux_assertions(aux_rand_elements)
            if aux_rand_elements is not None else []
        )
        return BoundaryConstraints(
            self.context, self.get_assertions(), aux_assertions,
            composition_coefficients,
        )

    def get_constraint_composition_coefficients(self, public_coin
                                                ) -> ConstraintCompositionCoefficients:
        return ConstraintCompositionCoefficients.draw(
            public_coin, self.ext_field,
            self.context.num_transition_constraints,
            self.context.num_assertions,
            self.options.batching_constraints,
        )

    def get_deep_composition_coefficients(self, public_coin
                                          ) -> DeepCompositionCoefficients:
        return DeepCompositionCoefficients.draw(
            public_coin, self.ext_field,
            self.trace_info.width,
            self.context.num_constraint_composition_columns(),
            self.options.batching_deep,
        )
