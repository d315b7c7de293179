"""Polynomial utilities over (extension) field element tuples.

Host-side mirror of math/src/polynom/mod.rs: Horner evaluation, Lagrange
interpolation, batch interpolation (FRI verifier), synthetic division by
(x^a − b) (mod.rs:439-491), degree inference. Coefficients are lists of
element tuples, lowest degree first.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .fields import Field


def eval_poly(field: Field, coeffs: Sequence[tuple], x: tuple) -> tuple:
    """Horner evaluation (polynom/mod.rs:55)."""
    result = field.zero()
    for c in reversed(coeffs):
        result = field.add(field.mul(result, x), c)
    return result


def eval_many(field: Field, coeffs: Sequence[tuple], xs: Sequence[tuple]) -> list:
    return [eval_poly(field, coeffs, x) for x in xs]


def interpolate(field: Field, xs: Sequence[tuple], ys: Sequence[tuple]) -> List[tuple]:
    """Lagrange interpolation returning coefficients (polynom/mod.rs:165)."""
    n = len(xs)
    assert n == len(ys)
    # numerator polynomial prod (x - x_i), then per-point synthetic division
    coeffs = [field.zero()] * n
    roots = poly_from_roots(field, xs)
    for i in range(n):
        # q_i = roots / (x - x_i), scale by y_i / q_i(x_i)
        qi = syn_div(field, roots, 1, xs[i])
        denom = eval_poly(field, qi, xs[i])
        scale = field.mul(ys[i], field.inv(denom))
        for k in range(n):
            coeffs[k] = field.add(coeffs[k], field.mul(qi[k], scale))
    return coeffs


def interpolate_batch(field: Field, xs_rows: Sequence[Sequence[tuple]],
                      ys_rows: Sequence[Sequence[tuple]]) -> List[List[tuple]]:
    """Row-wise interpolation of many small point sets (polynom/mod.rs:165,
    used by the FRI verifier fold check)."""
    return [interpolate(field, xs, ys) for xs, ys in zip(xs_rows, ys_rows)]


def poly_from_roots(field: Field, roots: Sequence[tuple]) -> List[tuple]:
    """Monic polynomial with the given roots (polynom/mod.rs:664)."""
    coeffs = [field.one()]
    for r in roots:
        nr = field.neg(r)
        coeffs = [field.zero()] + coeffs
        for k in range(len(coeffs) - 1):
            coeffs[k] = field.add(coeffs[k], field.mul(coeffs[k + 1], nr))
    return coeffs


def syn_div(field: Field, coeffs: Sequence[tuple], a: int, b: tuple) -> List[tuple]:
    """Divide by (x^a − b), dropping the remainder (polynom/mod.rs:439-491).
    Exact when the polynomial is divisible."""
    result = list(coeffs)
    apos = len(result) - a
    for i in range(len(result) - 1, a - 1, -1):
        result[i - a] = field.add(result[i - a], field.mul(result[i], b))
    # quotient occupies the low len-a slots after the sweep, shifted by a
    return [result[i + a] for i in range(apos)]


def mul(field: Field, a: Sequence[tuple], b: Sequence[tuple]) -> List[tuple]:
    out = [field.zero()] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = field.add(out[i + j], field.mul(ai, bj))
    return out


def add(field: Field, a: Sequence[tuple], b: Sequence[tuple]) -> List[tuple]:
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        x = a[i] if i < len(a) else field.zero()
        y = b[i] if i < len(b) else field.zero()
        out.append(field.add(x, y))
    return out


def degree_of(field: Field, coeffs: Sequence[tuple]) -> int:
    """Index of the highest non-zero coefficient; -1 for the zero poly
    (polynom/mod.rs:608)."""
    for i in range(len(coeffs) - 1, -1, -1):
        if coeffs[i] != field.zero():
            return i
    return -1
