"""JaxOps — the device engine handle passed to ``Air.evaluate_transition``.

Same interface as :class:`winterfell_tpu.ops.host.HostOps`, but arrays are
uint64 JAX arrays shaped (n_rows, degree) and all arithmetic runs on the
accelerator. The same AIR constraint code runs unchanged on either engine.
"""

from __future__ import annotations

import numpy as np

from ..math.fields import Field
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
