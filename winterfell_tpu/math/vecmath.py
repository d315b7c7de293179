"""Vectorized exact field arithmetic over numpy object arrays.

This is the host compute engine and the correctness oracle for the JAX/Pallas
device kernels in ``winterfell_tpu.ops``. Elements are Python ints held in
``dtype=object`` numpy arrays, so every operation is exact modular integer
arithmetic — there is no reduction-order sensitivity and results are
bit-identical regardless of vectorization shape.

Shape convention: an array of extension-field elements has a trailing axis of
size ``field.degree`` (1 for base-field views). Base-field-only data (twiddle
factors, domain points, trace columns) may be stored without the trailing axis
as plain object arrays of ints; componentwise broadcasting then matches
``FieldElement::mul_base`` semantics (math/src/field/traits.rs:330-346).
"""

from __future__ import annotations

import numpy as np

from .fields import BaseField, Field

# ================================================================================
# Construction / conversion
# ================================================================================


def asarray(elems) -> np.ndarray:
    """List of element tuples -> (n, d) object array."""
    return np.array([list(e) for e in elems], dtype=object)


def totuples(arr: np.ndarray) -> list:
    """(n, d) object array -> list of element tuples."""
    return [tuple(int(x) for x in row) for row in arr]


def base_asarray(values) -> np.ndarray:
    """List of base ints -> (n,) object array."""
    return np.array(list(values), dtype=object)


def zeros(shape) -> np.ndarray:
    return np.zeros(shape, dtype=object)


def base_to_ext(field: Field, a: np.ndarray) -> np.ndarray:
    """(...,) base ints -> (..., d) extension elements with zero high parts."""
    out = np.zeros(a.shape + (field.degree,), dtype=object)
    out[..., 0] = a
    return out


# ================================================================================
# Base-field vector ops (plain object arrays of ints)
# ================================================================================


def badd(base: BaseField, a, b):
    return (a + b) % base.p


def bsub(base: BaseField, a, b):
    return (a - b) % base.p


def bmul(base: BaseField, a, b):
    return a * b % base.p


def bneg(base: BaseField, a):
    return (-a) % base.p


def bpow(base: BaseField, a: np.ndarray, e: int) -> np.ndarray:
    """Elementwise a**e mod p by square-and-multiply on the vector."""
    result = np.ones(a.shape, dtype=object)
    acc = a
    while e > 0:
        if e & 1:
            result = result * acc % base.p
        acc = acc * acc % base.p
        e >>= 1
    return result


def power_series(base: BaseField, b: int, n: int, offset: int = 1) -> np.ndarray:
    """[offset, offset·b, offset·b^2, ...] — math/src/utils/mod.rs:36-102."""
    out = np.empty(n, dtype=object)
    acc = offset % base.p
    for i in range(n):
        out[i] = acc
        acc = acc * b % base.p
    return out


def batch_inversion_base(base: BaseField, a: np.ndarray) -> np.ndarray:
    """Montgomery-trick batch inversion (math/src/utils/mod.rs:169); inv(0)=0."""
    p = base.p
    n = a.shape[0]
    flat = a.reshape(n)
    prefix = np.empty(n, dtype=object)
    acc = 1
    for i in range(n):
        prefix[i] = acc
        v = flat[i]
        if v != 0:
            acc = acc * v % p
    inv_acc = pow(int(acc), p - 2, p)
    out = np.empty(n, dtype=object)
    for i in range(n - 1, -1, -1):
        v = flat[i]
        if v == 0:
            out[i] = 0
        else:
            out[i] = prefix[i] * inv_acc % p
            inv_acc = inv_acc * v % p
    return out.reshape(a.shape)


# ================================================================================
# Extension-field vector ops (object arrays with trailing degree axis)
# ================================================================================


def eadd(field: Field, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + b) % field.p


def esub(field: Field, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a - b) % field.p


def eneg(field: Field, a: np.ndarray) -> np.ndarray:
    return (-a) % field.p


def emul(field: Field, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Full extension multiply; reduction polynomials per field
    (math/src/field/extensions/{quadratic,cubic}.rs semantics)."""
    p = field.p
    d = field.degree
    if d == 1:
        return a * b % p
    if d == 2:
        qa, qb = field.base.quad_x2
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        t2 = a1 * b1
        c0 = (a0 * b0 + qb * t2) % p
        c1 = (a0 * b1 + a1 * b0 + qa * t2) % p
        return np.stack([c0, c1], axis=-1)
    ca0, ca1, ca2 = field.base.cube_x3
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    t0 = a0 * b0
    t1 = a0 * b1 + a1 * b0
    t2 = a0 * b2 + a1 * b1 + a2 * b0
    t3 = a1 * b2 + a2 * b1
    t4 = a2 * b2
    t3 = t3 + t4 * ca2
    t2 = t2 + t4 * ca1
    t1 = t1 + t4 * ca0
    t2 = t2 + t3 * ca2
    t1 = t1 + t3 * ca1
    t0 = t0 + t3 * ca0
    return np.stack([t0 % p, t1 % p, t2 % p], axis=-1)


def emul_base(field: Field, a: np.ndarray, s) -> np.ndarray:
    """Extension array × base scalar/array (componentwise)."""
    if isinstance(s, np.ndarray) and s.ndim == a.ndim - 1:
        s = s[..., None]
    return a * s % field.p


def emul_scalar(field: Field, a: np.ndarray, e: tuple) -> np.ndarray:
    """Extension array × one extension scalar."""
    eb = np.array(list(e), dtype=object)
    return emul(field, a, np.broadcast_to(eb, a.shape))


def esum(field: Field, a: np.ndarray, axis=0) -> np.ndarray:
    return np.sum(a, axis=axis) % field.p


def batch_inversion(field: Field, a: np.ndarray) -> np.ndarray:
    """Batch inversion of extension elements ((n, d) array); inv(0)=0."""
    if field.degree == 1:
        return batch_inversion_base(field.base, a[..., 0])[..., None]
    out = np.empty_like(a)
    for i, e in enumerate(totuples(a)):
        out[i] = list(field.inv(e))
    return out
