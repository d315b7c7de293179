"""AirContext — derived STARK parameters per AIR instance
(air/src/air/context.rs:17-331)."""

from __future__ import annotations

from typing import List

from ..math.fields import BaseField, Field
from .options import ProofOptions
from .trace_info import TraceInfo
from .transition import TransitionConstraintDegree


class AirContext:
    def __init__(self, base: BaseField, trace_info: TraceInfo,
                 main_degrees: List[TransitionConstraintDegree],
                 aux_degrees: List[TransitionConstraintDegree],
                 num_main_assertions: int, num_aux_assertions: int,
                 options: ProofOptions):
        assert main_degrees, "at least one transition constraint degree must be specified"
        assert num_main_assertions > 0, "at least one assertion must be specified"
        if trace_info.is_multi_segment:
            assert aux_degrees, "aux trace requires aux constraint degrees"
            assert num_aux_assertions > 0, "aux trace requires aux assertions"
        else:
            assert not aux_degrees and num_aux_assertions == 0

        ce_blowup = max(d.min_blowup_factor() for d in main_degrees + aux_degrees)
        assert options.blowup_factor >= ce_blowup, (
            f"blowup factor too small; expected at least {ce_blowup}"
        )

        self.base = base
        self.options = options
        self.trace_info = trace_info
        self.main_degrees = list(main_degrees)
        self.aux_degrees = list(aux_degrees)
        self.num_main_assertions = num_main_assertions
        self.num_aux_assertions = num_aux_assertions
        self.ce_blowup_factor = ce_blowup
        n = trace_info.length
        self.trace_domain_generator = base.get_root_of_unity(n.bit_length() - 1)
        lde = n * options.blowup_factor
        self.lde_domain_generator = base.get_root_of_unity(lde.bit_length() - 1)
        self.num_transition_exemptions = 1

    # -- constructors matching the reference shape --------------------------

    @classmethod
    def new(cls, base: BaseField, trace_info: TraceInfo,
            degrees: List[TransitionConstraintDegree], num_assertions: int,
            options: ProofOptions) -> "AirContext":
        assert not trace_info.is_multi_segment
        return cls(base, trace_info, degrees, [], num_assertions, 0, options)

    @classmethod
    def new_multi_segment(cls, base: BaseField, trace_info: TraceInfo,
                          main_degrees, aux_degrees, num_main_assertions: int,
                          num_aux_assertions: int, options: ProofOptions) -> "AirContext":
        return cls(base, trace_info, main_degrees, aux_degrees,
                   num_main_assertions, num_aux_assertions, options)

    # -- accessors ----------------------------------------------------------

    @property
    def ext_field(self) -> Field:
        return Field(self.base, self.options.field_extension.degree)

    @property
    def trace_len(self) -> int:
        return self.trace_info.length

    @property
    def trace_poly_degree(self) -> int:
        return self.trace_info.length - 1

    @property
    def ce_domain_size(self) -> int:
        return self.trace_info.length * self.ce_blowup_factor

    @property
    def lde_domain_size(self) -> int:
        return self.trace_info.length * self.options.blowup_factor

    @property
    def num_transition_constraints(self) -> int:
        return len(self.main_degrees) + len(self.aux_degrees)

    @property
    def num_assertions(self) -> int:
        return self.num_main_assertions + self.num_aux_assertions

    def num_constraint_composition_columns(self) -> int:
        """ceil((max_eval_degree − (n − k)) / n), at least 1
        (context.rs:265-285)."""
        highest = max(
            d.get_evaluation_degree(self.trace_len)
            for d in self.main_degrees + self.aux_degrees
        )
        n = self.trace_len
        divisor_degree = n - self.num_transition_exemptions
        return max(-(-(highest - divisor_degree) // n), 1)

    def set_num_transition_exemptions(self, k: int) -> "AirContext":
        """(context.rs:299-331)."""
        assert k > 0
        assert k <= self.trace_len // 2 + 1, "too many transition exemptions"
        for d in self.main_degrees + self.aux_degrees:
            eval_degree = d.get_evaluation_degree(self.trace_len)
            max_exemptions = (self.ce_domain_size - 1) + self.trace_len - eval_degree
            assert k <= max_exemptions, "number of transition exemptions too large"
        self.num_transition_exemptions = k
        return self
