"""FRI protocol options (fri/src/options.rs:13-97)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FriOptions:
    blowup_factor: int
    folding_factor: int
    remainder_max_degree: int

    def __post_init__(self):
        assert self.folding_factor in (2, 4, 8, 16)
        b = self.blowup_factor
        assert b & (b - 1) == 0 and b > 1

    @property
    def max_remainder_size(self) -> int:
        return (self.remainder_max_degree + 1) * self.blowup_factor

    def num_fri_layers(self, domain_size: int) -> int:
        """(options.rs:85-93)."""
        result = 0
        while domain_size > self.max_remainder_size:
            domain_size //= self.folding_factor
            result += 1
        return result

    def fri_remainder_size(self, domain_size: int) -> int:
        for _ in range(self.num_fri_layers(domain_size)):
            domain_size //= self.folding_factor
        return domain_size
