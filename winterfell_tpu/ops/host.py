"""Host compute engine: exact vectorized field ops over numpy object arrays.

This is the engine handle passed to ``Air.evaluate_transition`` so that AIR
definitions are engine-agnostic: the same constraint code runs vectorized over
the whole constraint-evaluation domain on this host engine, at a single OOD
point during verification, and (when the field is Goldilocks) on the JAX/TPU
engine in ``winterfell_tpu.ops.goldilocks``.

Arrays have shape (n_rows, degree) where degree is the evaluation field's
extension degree.
"""

from __future__ import annotations

import numpy as np

from ..math import vecmath as vm
from ..math.fields import Field


class HostOps:
    """Vectorized exact ops in a fixed (possibly extension) field."""

    is_device = False

    def __init__(self, field: Field):
        self.field = field

    # -- construction -------------------------------------------------------

    def constant(self, v: int) -> np.ndarray:
        out = np.zeros((1, self.field.degree), dtype=object)
        out[0, 0] = v % self.field.p
        return out

    def lift(self, e: tuple) -> np.ndarray:
        """Element tuple (of this field or its base) -> (1, d) array."""
        d = self.field.degree
        if len(e) == d:
            return np.array([list(e)], dtype=object)
        assert len(e) == 1
        out = np.zeros((1, d), dtype=object)
        out[0, 0] = e[0]
        return out

    def zeros(self, n: int) -> np.ndarray:
        return np.zeros((n, self.field.degree), dtype=object)

    # -- arithmetic ----------------------------------------------------------

    def add(self, a, b):
        return vm.eadd(self.field, a, b)

    def sub(self, a, b):
        return vm.esub(self.field, a, b)

    def neg(self, a):
        return vm.eneg(self.field, a)

    def mul(self, a, b):
        return vm.emul(self.field, a, b)

    def exp(self, a, k: int):
        """a ** k for a small constant integer k."""
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
        """Multiply by base-field scalars: s is an int or (n,) int array."""
        return vm.emul_base(self.field, a, s)
