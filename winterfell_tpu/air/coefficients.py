"""Random composition coefficients (air/src/air/coefficients.rs).

Three draw modes (options.rs BatchingMethod): Linear (independent draws),
Algebraic (powers of a single α), Horner (reversed powers).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..math.fields import Field
from .options import BatchingMethod


def _draw_linear(coin, field_: Field, n: int) -> List[tuple]:
    return [coin.draw(field_) for _ in range(n)]


def _draw_algebraic(coin, field_: Field, n: int) -> List[tuple]:
    alpha = coin.draw(field_)
    out = []
    acc = field_.one()
    for _ in range(n):
        out.append(acc)
        acc = field_.mul(acc, alpha)
    return out


def _draw(coin, field_: Field, n: int, method: BatchingMethod) -> List[tuple]:
    if method == BatchingMethod.LINEAR:
        return _draw_linear(coin, field_, n)
    coeffs = _draw_algebraic(coin, field_, n)
    if method == BatchingMethod.HORNER:
        coeffs.reverse()
    return coeffs


@dataclass
class ConstraintCompositionCoefficients:
    transition: List[tuple]
    boundary: List[tuple]

    @classmethod
    def draw(cls, coin, field_: Field, num_transition: int, num_boundary: int,
             method: BatchingMethod) -> "ConstraintCompositionCoefficients":
        coeffs = _draw(coin, field_, num_transition + num_boundary, method)
        return cls(coeffs[:num_transition], coeffs[num_transition:])


@dataclass
class DeepCompositionCoefficients:
    trace: List[tuple]
    constraints: List[tuple]

    @classmethod
    def draw(cls, coin, field_: Field, trace_width: int, num_composition_columns: int,
             method: BatchingMethod) -> "DeepCompositionCoefficients":
        coeffs = _draw(coin, field_, trace_width + num_composition_columns, method)
        return cls(coeffs[:trace_width], coeffs[trace_width:])
