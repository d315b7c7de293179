"""ctypes bindings to the native host components (native/libwtnative.so).

Builds the shared library on first import if the C toolchain is available;
falls back silently to the pure-Python implementations otherwise. The native
BLAKE3 accelerates the host prover's row hashing and the Fiat–Shamir
transcript for Blake3 configs by ~2 orders of magnitude over pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwtnative.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("blake3.c", "f128.c"):
        path = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(path) and os.path.getmtime(path) > so_mtime:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _stale() and not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wt_blake3.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_char_p]
        lib.wt_blake3.restype = None
        lib.wt_blake3_many.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                       ctypes.c_size_t, ctypes.c_char_p]
        lib.wt_blake3_many.restype = None
        _u64x2 = ctypes.c_uint64 * 2
        lib.wt_f128_ntt.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.c_size_t, _u64x2, ctypes.c_int]
        lib.wt_f128_ntt.restype = None
        lib.wt_f128_scale_powers.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                             ctypes.c_size_t, _u64x2, _u64x2]
        lib.wt_f128_scale_powers.restype = None
        lib.wt_rescue128_trace.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_void_p, _u64x2, ctypes.c_void_p]
        lib.wt_rescue128_trace.restype = None
        lib.wt_fib64_trace.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
        lib.wt_fib64_trace.restype = None
        lib.wt_rescue128w6_sponge.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_void_p, _u64x2, ctypes.c_uint64 * 4]
        lib.wt_rescue128w6_sponge.restype = None
        lib.wt_rescue128w6_hash2_many.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_void_p, _u64x2, ctypes.c_void_p]
        lib.wt_rescue128w6_hash2_many.restype = None
        lib.wt_lamport_trace.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p, _u64x2, ctypes.c_void_p]
        lib.wt_lamport_trace.restype = None
        lib.wt_blake3_grind.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        ctypes.c_uint32, ctypes.c_uint64]
        lib.wt_blake3_grind.restype = ctypes.c_uint64
        _lib = lib
        return lib
    except (OSError, AttributeError):
        # AttributeError: a stale libwtnative.so missing newly added symbols
        # (e.g. after a failed rebuild) must degrade to the Python fallback,
        # not crash callers of available().
        return None


def available() -> bool:
    return _load() is not None


def blake3(data: bytes) -> bytes:
    lib = _load()
    assert lib is not None
    out = ctypes.create_string_buffer(32)
    lib.wt_blake3(data, len(data), out)
    return out.raw


def blake3_grind(seed: bytes, zeros: int, start: int = 1) -> int:
    """Serial first-found grinding nonce (prover/src/channel.rs:169-184):
    smallest nonce >= start with >= `zeros` trailing zero bits in the LE-u64
    head of blake3(seed || LE64(nonce))."""
    lib = _load()
    assert lib is not None
    return int(lib.wt_blake3_grind(seed, len(seed), zeros, start))


def blake3_many(rows: bytes, num_rows: int, row_len: int) -> List[bytes]:
    """Hash `num_rows` equal-length byte rows in one native call."""
    lib = _load()
    assert lib is not None
    out = ctypes.create_string_buffer(32 * num_rows)
    lib.wt_blake3_many(rows, num_rows, row_len, out)
    raw = out.raw
    return [raw[32 * i : 32 * (i + 1)] for i in range(num_rows)]


# ---- f128 host polynomial kernels (native/f128.c) ---------------------------


def _u64_pair(v: int):
    return (ctypes.c_uint64 * 2)(v & 0xFFFFFFFFFFFFFFFF, v >> 64)


def f128_ntt(limbs, n: int, w: int, root: int, inverse: bool) -> None:
    """In-place NTT along axis 0 of an (n, w) element array given as a
    contiguous uint64 numpy array of (lo, hi) limb pairs. ``root`` must be
    the n-th root (pass the inverse root for the iNTT; ``inverse`` also
    scales by 1/n)."""
    lib = _load()
    assert lib is not None
    lib.wt_f128_ntt(limbs.ctypes.data, n, w, _u64_pair(root), int(inverse))


def f128_scale_powers(limbs, n: int, w: int, s: int, scale: int) -> None:
    """In-place data[i][j] *= scale * s^i over the limb-pair array."""
    lib = _load()
    assert lib is not None
    lib.wt_f128_scale_powers(limbs.ctypes.data, n, w, _u64_pair(s),
                             _u64_pair(scale))


def _pairs_np(values) -> "np.ndarray":
    import numpy as np

    m = 0xFFFFFFFFFFFFFFFF
    flat = [int(v) for v in values]
    out = np.empty((len(flat), 2), dtype=np.uint64)
    for i, v in enumerate(flat):
        out[i, 0] = v & m
        out[i, 1] = v >> 64
    return out


def rescue128_trace(seed, iterations: int, mds, ark, inv_alpha: int):
    """Native Rescue-128 hash-chain trace: returns a (16*iterations, 4, 2)
    uint64 array of (lo, hi) element pairs (native/f128.c
    wt_rescue128_trace). ``mds`` is the flat 16-entry MDS matrix and ``ark``
    the 16x8 round-constant schedule, as Python ints."""
    import numpy as np

    lib = _load()
    assert lib is not None
    n = 16 * iterations
    out = np.empty((n, 4, 2), dtype=np.uint64)
    seed_arr = np.ascontiguousarray(_pairs_np(seed))
    mds_arr = np.ascontiguousarray(_pairs_np(mds))
    ark_arr = np.ascontiguousarray(_pairs_np([v for row in ark for v in row]))
    lib.wt_rescue128_trace(seed_arr.ctypes.data, iterations,
                           mds_arr.ctypes.data, ark_arr.ctypes.data,
                           _u64_pair(inv_alpha), out.ctypes.data)
    return out


# ---- Rescue-128 width-6 + lamport trace (native/f128.c) ---------------------


def rescue128w6_sponge(data, mds, ark, inv_alpha: int):
    """Sponge over a flat element list (examples/src/utils/rescue.rs:81-101);
    returns the (state[0], state[1]) digest as Python ints."""
    import ctypes as ct

    lib = _load()
    assert lib is not None
    import numpy as np

    data_arr = np.ascontiguousarray(_pairs_np(data))
    mds_arr = np.ascontiguousarray(_pairs_np(mds))
    ark_arr = np.ascontiguousarray(_pairs_np([v for row in ark for v in row]))
    out = (ct.c_uint64 * 4)()
    lib.wt_rescue128w6_sponge(data_arr.ctypes.data, len(data),
                              mds_arr.ctypes.data, ark_arr.ctypes.data,
                              _u64_pair(inv_alpha), out)
    return (out[0] | (out[1] << 64), out[2] | (out[3] << 64))


def rescue128w6_hash2_many(pairs, mds, ark, inv_alpha: int):
    """Batch digest of n independent 2-element inputs; returns a list of
    (d0, d1) digests (lamport keygen's per-bit public keys)."""
    import numpy as np

    lib = _load()
    assert lib is not None
    n = len(pairs)
    inp = np.ascontiguousarray(
        _pairs_np([v for pair in pairs for v in pair]).reshape(n, 2, 2))
    mds_arr = np.ascontiguousarray(_pairs_np(mds))
    ark_arr = np.ascontiguousarray(_pairs_np([v for row in ark for v in row]))
    out = np.empty((n, 2, 2), dtype=np.uint64)
    lib.wt_rescue128w6_hash2_many(inp.ctypes.data, n, mds_arr.ctypes.data,
                                  ark_arr.ctypes.data, _u64_pair(inv_alpha),
                                  out.ctypes.data)
    return [(int(out[i, 0, 0]) | (int(out[i, 0, 1]) << 64),
             int(out[i, 1, 0]) | (int(out[i, 1, 1]) << 64)) for i in range(n)]


def lamport_trace(msgs, sec1, sec2, pub1, pub2, mds, ark, inv_alpha: int):
    """Native Lamport aggregate trace: returns a (1024*nsig, 22, 2) uint64
    limb-pair array (native/f128.c wt_lamport_trace). ``msgs`` is a list of
    (m0, m1); the four key schedules are nsig x 128 lists of (k0, k1)."""
    import numpy as np

    lib = _load()
    assert lib is not None
    nsig = len(msgs)

    def sched_np(sched):
        flat = [v for sig in sched for pair in sig for v in pair]
        return np.ascontiguousarray(_pairs_np(flat).reshape(nsig, 128, 2, 2))

    msgs_arr = np.ascontiguousarray(
        _pairs_np([v for m in msgs for v in m]).reshape(nsig, 2, 2))
    s1, s2, p1, p2 = map(sched_np, (sec1, sec2, pub1, pub2))
    mds_arr = np.ascontiguousarray(_pairs_np(mds))
    ark_arr = np.ascontiguousarray(_pairs_np([v for row in ark for v in row]))
    out = np.empty((1024 * nsig, 22, 2), dtype=np.uint64)
    lib.wt_lamport_trace(msgs_arr.ctypes.data, s1.ctypes.data, s2.ctypes.data,
                         p1.ctypes.data, p2.ctypes.data, nsig,
                         mds_arr.ctypes.data, ark_arr.ctypes.data,
                         _u64_pair(inv_alpha), out.ctypes.data)
    return out
