"""Boundary assertions (air/src/air/assertions/mod.rs).

Three kinds: single (stride 0), periodic (one value, power-of-two stride),
sequence (many values at power-of-two stride). Natural order — the order in
which composition coefficients are assigned — sorts by (stride, first_step,
column) (assertions/mod.rs:303-315).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Tuple

NO_STRIDE = 0


class AssertionError_(Exception):
    pass


@dataclass(frozen=True)
class Assertion:
    """`values` are element tuples of the field the assertion lives in
    (base field for main-trace assertions, extension for aux)."""

    column: int
    first_step: int
    stride: int
    values: Tuple[tuple, ...] = field(default_factory=tuple)

    # -- constructors (assertions/mod.rs:65-121) ----------------------------

    @classmethod
    def single(cls, column: int, step: int, value: tuple) -> "Assertion":
        return cls(column, step, NO_STRIDE, (value,))

    @classmethod
    def periodic(cls, column: int, first_step: int, stride: int, value: tuple) -> "Assertion":
        cls._validate_stride(stride, first_step, column)
        return cls(column, first_step, stride, (value,))

    @classmethod
    def sequence(cls, column: int, first_step: int, stride: int,
                 values: List[tuple]) -> "Assertion":
        cls._validate_stride(stride, first_step, column)
        n = len(values)
        if n == 0:
            raise AssertionError_(f"column {column}: asserted values must be non-empty")
        if n & (n - 1):
            raise AssertionError_(f"column {column}: number of values must be a power of two")
        return cls(column, first_step, NO_STRIDE if n == 1 else stride, tuple(values))

    @staticmethod
    def _validate_stride(stride: int, first_step: int, column: int) -> None:
        if stride < 2 or stride & (stride - 1):
            raise AssertionError_(f"column {column}: stride must be a power of two >= 2")
        if first_step >= stride:
            raise AssertionError_(f"column {column}: first step must be smaller than stride")

    # -- kind probes --------------------------------------------------------

    @property
    def is_single(self) -> bool:
        return self.stride == NO_STRIDE

    @property
    def is_periodic(self) -> bool:
        return self.stride != NO_STRIDE and len(self.values) == 1

    @property
    def is_sequence(self) -> bool:
        return len(self.values) > 1

    # -- validation (assertions/mod.rs:199-248) -----------------------------

    def validate_trace_width(self, trace_width: int) -> None:
        if self.column >= trace_width:
            raise AssertionError_(
                f"assertion column {self.column} out of bounds for width {trace_width}"
            )

    def validate_trace_length(self, trace_length: int) -> None:
        if trace_length & (trace_length - 1):
            raise AssertionError_("trace length must be a power of two")
        if self.is_single:
            if self.first_step >= trace_length:
                raise AssertionError_("trace too short for single assertion")
        elif self.is_periodic:
            if self.stride > trace_length:
                raise AssertionError_("trace too short for periodic assertion")
        else:
            if len(self.values) * self.stride != trace_length:
                raise AssertionError_("sequence assertion length mismatch")

    # -- iteration ----------------------------------------------------------

    def get_num_steps(self, trace_length: int) -> int:
        self.validate_trace_length(trace_length)
        if self.is_single:
            return 1
        if self.is_periodic:
            return trace_length // self.stride
        return len(self.values)

    def apply(self, trace_length: int, f: Callable[[int, tuple], None]) -> None:
        """Invoke f(step, value) for every asserted step (mod.rs:255-279)."""
        self.validate_trace_length(trace_length)
        if self.is_single:
            f(self.first_step, self.values[0])
        elif self.is_periodic:
            for i in range(trace_length // self.stride):
                f(self.first_step + self.stride * i, self.values[0])
        else:
            for i, v in enumerate(self.values):
                f(self.first_step + self.stride * i, v)

    # -- natural order ------------------------------------------------------

    @property
    def sort_key(self):
        return (self.stride, self.first_step, self.column)


def prepare_assertions(assertions: List[Assertion], trace_width: int,
                       trace_length: int) -> List[Assertion]:
    """Validate, reject (column, step) overlaps, and sort into natural order
    (air/src/air/boundary/mod.rs:190-230)."""
    result: List[Assertion] = []
    seen = set()
    for a in assertions:
        a.validate_trace_width(trace_width)
        a.validate_trace_length(trace_length)
        steps = []
        a.apply(trace_length, lambda step, _v: steps.append(step))
        for s in steps:
            key = (a.column, s)
            if key in seen:
                raise AssertionError_(
                    f"assertion overlap at column {a.column}, step {s}"
                )
            seen.add(key)
        result.append(a)
    result.sort(key=lambda a: a.sort_key)
    return result
