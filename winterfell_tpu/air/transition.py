"""Transition constraint degree descriptors (air/src/air/transition/degree.rs)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

MIN_CYCLE_LENGTH = 2


@dataclass(frozen=True)
class TransitionConstraintDegree:
    """base degree + periodic-column cycle lengths (degree.rs:21-115)."""

    base: int
    cycles: Tuple[int, ...] = field(default_factory=tuple)

    def __post_init__(self):
        assert self.base > 0, "transition constraint degree must be at least one"
        for c in self.cycles:
            assert c >= MIN_CYCLE_LENGTH and c & (c - 1) == 0, (
                "cycle length must be a power of two >= 2"
            )

    @classmethod
    def new(cls, degree: int) -> "TransitionConstraintDegree":
        return cls(degree)

    @classmethod
    def with_cycles(cls, base_degree: int, cycles) -> "TransitionConstraintDegree":
        return cls(base_degree, tuple(cycles))

    def get_evaluation_degree(self, trace_length: int) -> int:
        """b·(n−1) + Σ (n/c)·(c−1) (degree.rs:90-96)."""
        result = self.base * (trace_length - 1)
        for c in self.cycles:
            result += (trace_length // c) * (c - 1)
        return result

    def min_blowup_factor(self) -> int:
        """next_pow2(base + #cycles − 1), at least 2 (degree.rs:101-115)."""
        bound = max(self.base + len(self.cycles) - 1, 1)
        p = 1
        while p < bound:
            p *= 2
        return max(p, 2)
