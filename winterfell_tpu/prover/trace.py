"""Execution traces (prover/src/trace/{mod,trace_table}.rs).

TraceTable is the default column-major trace container. Data is stored as an
(n, width) numpy object array of canonical base-field ints — the row-major
view of the reference's ColMatrix; the NTT layer operates on the leading axis
either way so the distinction is only naming.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from ..air.trace_info import TraceInfo
from ..math.fields import BaseField


class Trace:
    """Base trace interface (prover/src/trace/mod.rs:48-228)."""

    def info(self) -> TraceInfo:
        raise NotImplementedError

    def main_segment(self) -> np.ndarray:
        """(n, width) object array of base-field ints."""
        raise NotImplementedError

    def read_main_frame(self, row: int):
        """(current_row, next_row) lists of base ints, next wraps around."""
        seg = self.main_segment()
        n = seg.shape[0]
        return list(seg[row]), list(seg[(row + 1) % n])


class TraceTable(Trace):
    def __init__(self, base: BaseField, width: int, length: int, meta: bytes = b""):
        assert 0 < width <= 255
        assert length >= 8 and length & (length - 1) == 0, (
            "trace length must be a power of two >= 8"
        )
        self.base = base
        self._info = TraceInfo(width, length, meta=meta)
        self.data = np.zeros((length, width), dtype=object)

    # -- construction (trace_table.rs:81-252) -------------------------------

    @classmethod
    def init(cls, base: BaseField, columns: List[List[int]]) -> "TraceTable":
        length = len(columns[0])
        table = cls(base, len(columns), length)
        for c, col in enumerate(columns):
            assert len(col) == length, "all columns must have the same length"
            for r, v in enumerate(col):
                table.data[r, c] = v % base.p
        return table

    def fill(self, init: Callable[[list], None],
             update: Callable[[int, list], None]) -> None:
        """Sequential build: `init(state)` fills row 0; `update(step, state)`
        transforms the state into row step+1 (trace_table.rs:164)."""
        width = self._info.main_segment_width
        state = [0] * width
        init(state)
        self.update_row(0, state)
        for step in range(self._info.length - 1):
            update(step, state)
            self.update_row(step + 1, state)

    def update_row(self, step: int, state: List[int]) -> None:
        p = self.base.p
        for c, v in enumerate(state):
            self.data[step, c] = v % p

    def set(self, column: int, step: int, value: int) -> None:
        self.data[step, column] = value % self.base.p

    def get(self, column: int, step: int) -> int:
        return int(self.data[step, column])

    # -- accessors ----------------------------------------------------------

    @property
    def width(self) -> int:
        return self._info.main_segment_width

    @property
    def length(self) -> int:
        return self._info.length

    def info(self) -> TraceInfo:
        return self._info

    def main_segment(self) -> np.ndarray:
        return self.data

    def with_meta(self, meta: bytes) -> "TraceTable":
        self._info = TraceInfo(
            self._info.main_segment_width, self._info.length, meta=meta)
        return self

    def set_aux_shape(self, aux_width: int, num_rands: int) -> None:
        """Declare the auxiliary segment shape (for Randomized AIRs)."""
        self._info = TraceInfo(
            self._info.main_segment_width, self._info.length,
            aux_segment_width=aux_width, num_aux_segment_rands=num_rands,
            meta=self._info.meta)
