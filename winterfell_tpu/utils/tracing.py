"""Phase tracing — the observability equivalent of the reference's `tracing`
spans (SURVEY §5.1: info_span! around every prover pipeline phase, wired to
a subscriber via the WINTER_LOG env var).

Set ``WINTER_LOG=info`` (or any non-empty value) to get one line per phase
with wall-clock duration; nested spans are indented. Programmatic consumers
can read ``last_spans()`` after a prove() call for structured timings."""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager
from typing import Dict, List

_ENABLED = bool(os.environ.get("WINTER_LOG"))
_depth = 0
_records: List[Dict] = []


def enabled() -> bool:
    return _ENABLED or bool(os.environ.get("WINTER_LOG"))


def reset() -> None:
    _records.clear()


def last_spans() -> List[Dict]:
    """[{name, seconds, depth, **fields}] for the most recent pipeline run."""
    return list(_records)


def _device_mem() -> Dict:
    """Device HBM stats (WINTER_MEMLOG=1): bytes in use + peak, in MiB."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "hbm_mib": stats.get("bytes_in_use", 0) // (1 << 20),
            "hbm_peak_mib": stats.get("peak_bytes_in_use", 0) // (1 << 20),
            "hbm_limit_mib": stats.get("bytes_limit", 0) // (1 << 20),
        }
    except Exception:  # pragma: no cover - stats are backend-dependent
        return {}


# WINTER_PHASE_SYNC=0 lets the prover FREE-RUN: the device-sync barriers the
# provers place at phase boundaries exist only so per-phase wall clock can be
# attributed; without them XLA pipelines adjacent phases' dispatches (each
# barrier costs a tunnel round trip and kills the overlap). Totals stay
# correct either way — only the per-phase split degrades.
_PHASE_SYNC = os.environ.get("WINTER_PHASE_SYNC", "1") not in ("", "0")


def set_phase_sync(on: bool) -> None:
    """Toggle phase-boundary barriers at runtime (bench.py profiles one
    prove WITH barriers for phase attribution, then measures a free-running
    prove without them)."""
    global _PHASE_SYNC
    _PHASE_SYNC = bool(on)


def phase_sync() -> bool:
    return _PHASE_SYNC


def sync(arr):
    """Phase-boundary barrier: block on ``arr`` unless WINTER_PHASE_SYNC=0."""
    if _PHASE_SYNC and hasattr(arr, "block_until_ready"):
        arr.block_until_ready()
    return arr


class Phases:
    """Sequential phase timer: ``mark(name)`` records the time since the
    previous mark. Used by the provers to report per-phase wall clock like the
    reference's span-close timings."""

    def __init__(self, pipeline: str):
        self.pipeline = pipeline
        self._last = time.perf_counter()
        reset()

    def mark(self, name: str, **fields) -> None:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        if os.environ.get("WINTER_MEMLOG"):
            fields.update(_device_mem())
        _records.append({"name": name, "seconds": dt, "depth": 1, **fields})
        if enabled():
            extra = "".join(f" {k}={v}" for k, v in fields.items())
            print(f"  {self.pipeline}.{name}{extra}: {1000 * dt:.1f} ms",
                  file=sys.stderr)


@contextmanager
def span(name: str, **fields):
    """Timed phase span (mirrors info_span!(...).in_scope)."""
    global _depth
    start = time.perf_counter()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        dt = time.perf_counter() - start
        _records.append({"name": name, "seconds": dt, "depth": _depth, **fields})
        if enabled():
            extra = "".join(f" {k}={v}" for k, v in fields.items())
            print(f"{'  ' * _depth}{name}{extra}: {1000 * dt:.1f} ms",
                  file=sys.stderr)
