"""JaxOps — the device engine handles passed to ``Air.evaluate_transition``.

Same interface as :class:`winterfell_tpu.ops.host.HostOps`, but arrays live
on the accelerator. The same AIR constraint code runs unchanged on any
engine:

- :class:`JaxOps` (Goldilocks): uint64 arrays shaped (n_rows, degree).
- :class:`JaxOpsF128` (f128): uint64 limb arrays shaped (n_rows, degree, 4)
  — 32-bit little-endian digits per element (see ops/f128.py).
"""

from __future__ import annotations

import numpy as np

from ..math.fields import Field
from . import f62
from . import f128 as fd
from . import goldilocks as gl


class JaxOps:
    is_device = True

    def __init__(self, field: Field):
        assert field.base.name == "f64", "JaxOps supports the Goldilocks field"
        self.field = field

    # -- construction -------------------------------------------------------

    def constant(self, v: int):
        d = self.field.degree
        out = np.zeros((1, d), dtype=np.uint64)
        out[0, 0] = v % gl.P
        return gl.jnp.asarray(out)

    def lift(self, e):
        if not isinstance(e, tuple):
            return e  # already a device array (e.g. traced aux randomness)
        d = self.field.degree
        out = np.zeros((1, d), dtype=np.uint64)
        for i, v in enumerate(e):
            out[0, i] = v
        return gl.jnp.asarray(out)

    def zeros(self, n: int):
        return gl.jnp.zeros((n, self.field.degree), dtype=gl.jnp.uint64)

    # -- arithmetic ----------------------------------------------------------

    def add(self, a, b):
        a, b = self._broadcast(a, b)
        return gl.ext_add(a, b)

    def sub(self, a, b):
        a, b = self._broadcast(a, b)
        return gl.ext_sub(a, b)

    def neg(self, a):
        return gl.gl_neg(a)

    def mul(self, a, b):
        a, b = self._broadcast(a, b)
        return gl.ext_mul(a, b)

    def exp(self, a, k: int):
        assert k >= 1
        result = None
        acc = a
        while k > 0:
            if k & 1:
                result = acc if result is None else self.mul(result, acc)
            k >>= 1
            if k:
                acc = self.mul(acc, acc)
        return result

    def mul_base(self, a, s):
        if isinstance(s, int):
            return gl.gl_mul(a, gl.jnp.uint64(s % gl.P))
        if s.ndim == a.ndim - 1:
            s = s[..., None]
        return gl.gl_mul(a, s)

    @staticmethod
    def _broadcast(a, b):
        if a.shape == b.shape:
            return a, b
        shape = gl.jnp.broadcast_shapes(a.shape, b.shape)
        return gl.jnp.broadcast_to(a, shape), gl.jnp.broadcast_to(b, shape)


class JaxOpsLimb:
    """Device engine handle for limb-represented fields: (n, d, NUM_LIMBS)
    uint64 limb arrays. Subclasses bind a concrete limb engine module
    (ops/f128.py or ops/f62.py — identical public interfaces)."""

    is_device = True
    engine = None  # limb engine module, set by subclass

    def __init__(self, field: Field):
        eng = type(self).engine
        assert field.base.p == eng.P, (
            f"{type(self).__name__} supports only its bound field")
        self.field = field

    # -- construction -------------------------------------------------------

    def constant(self, v: int):
        eng = type(self).engine
        d = self.field.degree
        out = np.zeros((1, d), dtype=object)
        out[0, 0] = v % eng.P
        return eng.to_device(out)

    def lift(self, e):
        if not isinstance(e, tuple):
            return e  # already a device limb array
        eng = type(self).engine
        d = self.field.degree
        out = np.zeros((1, d), dtype=object)
        for i, v in enumerate(e):
            out[0, i] = int(v)
        return eng.to_device(out)

    def zeros(self, n: int):
        eng = type(self).engine
        return eng.jnp.zeros((n, self.field.degree, eng.NUM_LIMBS),
                             dtype=eng.jnp.uint64)

    # -- arithmetic ----------------------------------------------------------

    def add(self, a, b):
        a, b = self._broadcast(a, b)
        return type(self).engine.ext_add(a, b)

    def sub(self, a, b):
        a, b = self._broadcast(a, b)
        return type(self).engine.ext_sub(a, b)

    def neg(self, a):
        return type(self).engine.base_neg(a)

    def mul(self, a, b):
        a, b = self._broadcast(a, b)
        return type(self).engine.ext_mul(a, b)

    def exp(self, a, k: int):
        assert k >= 1
        result = None
        acc = a
        while k > 0:
            if k & 1:
                result = acc if result is None else self.mul(result, acc)
            k >>= 1
            if k:
                acc = self.mul(acc, acc)
        return result

    def mul_base(self, a, s):
        eng = type(self).engine
        if isinstance(s, int):
            return eng.base_mul(
                a, eng.jnp.broadcast_to(eng.scalar(s), a.shape))
        if s.ndim == a.ndim - 1:  # (n, L) base scalars under (n, d, L)
            s = s[..., None, :]
        return eng.base_mul(a, eng.jnp.broadcast_to(s, a.shape))

    def _broadcast(self, a, b):
        jnp = type(self).engine.jnp
        if a.shape == b.shape:
            return a, b
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)


class JaxOpsF128(JaxOpsLimb):
    """f128 AIRs: (n, d, 4) uint64 limb arrays."""

    engine = fd


class JaxOpsF62(JaxOpsLimb):
    """f62 AIRs: (n, d, 2) uint64 limb arrays."""

    engine = f62
