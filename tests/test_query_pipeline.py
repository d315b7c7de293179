"""Two-phase query-gather machinery (prover/device.py): start/finish must
equal the synchronous paths byte-for-byte on every view branch — flat-heap
gather, by-size fallback (tok=None), host-pulled digest levels — since the
proof assembly now dispatches all gathers before awaiting any."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from winterfell_tpu.prover import device as dv  # noqa: E402


def _view_bytes(view, idx):
    return [view.fetch({i: None for i in idx}.keys())[i] for i in idx]


def test_digest_view_start_finish_matches_fetch():
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(0, 1 << 62, size=(1 << 8, 4),
                                   dtype=np.uint64))
    view = dv._DigestView(arr)
    idx = [0, 3, 9, 255]
    tok = view.fetch_start(idx)
    got = view.fetch_finish(tok, idx)
    want = dv._DigestView(arr).fetch(idx)
    assert got == want


def test_digest_view_gather_branch(monkeypatch):
    # force the padded-gather branch (arr larger than the pull threshold)
    monkeypatch.setattr(dv, "_PULL_THRESHOLD", 16)
    rng = np.random.default_rng(1)
    arr = jnp.asarray(rng.integers(0, 1 << 62, size=(64, 4),
                                   dtype=np.uint64))
    view = dv._DigestView(arr)
    idx = [5, 17, 63]
    tok = view.fetch_start(idx)
    assert tok is not None  # really took the gather branch
    got = view.fetch_finish(tok, idx)
    host = np.asarray(arr).astype("<u8")
    want = {i: host[i].tobytes() for i in idx}
    assert got == want


def _heap_views(num_leaves, monkeypatch=None, flat_limit=None):
    rng = np.random.default_rng(2)
    levels = {}
    size = 1
    while size < num_leaves:
        levels[size] = jnp.asarray(
            rng.integers(0, 1 << 62, size=(size, 4), dtype=np.uint64))
        size *= 2
    if flat_limit is not None:
        monkeypatch.setattr(dv, "_HEAP_FLAT_LIMIT", flat_limit)
    return dv._HeapNodesView(dict(levels), num_leaves), levels


def test_heap_view_flat_branch():
    view, levels = _heap_views(64)
    nodes = [1, 2, 5, 17, 33, 63]
    tok = view.fetch_start(nodes)
    assert tok is not None
    got = view.fetch_finish(tok, nodes)
    for i in nodes:
        size = 1 << (i.bit_length() - 1)
        want = np.asarray(levels[size]).astype("<u8")[i - size].tobytes()
        assert got[i] == want


def test_heap_view_bysize_fallback(monkeypatch):
    # _HEAP_FLAT_LIMIT below the leaf count forces the by-size path, which
    # returns a per-level token: big levels get a pre-dispatched padded
    # gather, small levels resolve from host pulls at finish time
    view, levels = _heap_views(64, monkeypatch, flat_limit=16)
    monkeypatch.setattr(dv, "_PULL_THRESHOLD", 8)
    nodes = [1, 2, 5, 17, 33, 63]
    tok = view.fetch_start(nodes)
    assert isinstance(tok, tuple) and tok[0] == "levels"
    assert 16 in tok[2] and 32 in tok[2]  # big levels really dispatched
    got = view.fetch_finish(tok, nodes)
    for i in nodes:
        size = 1 << (i.bit_length() - 1)
        want = np.asarray(levels[size]).astype("<u8")[i - size].tobytes()
        assert got[i] == want


def test_heap_view_bysize_batched(monkeypatch):
    # same per-level route but folded into the shared one-program batch
    view, levels = _heap_views(64, monkeypatch, flat_limit=16)
    monkeypatch.setattr(dv, "_PULL_THRESHOLD", 8)
    gb = dv._GatherBatch()
    nodes = [1, 2, 5, 17, 33, 63]
    tok = view.fetch_start(nodes, gb)
    assert isinstance(tok, tuple) and tok[0] == "levels"
    assert all(isinstance(t, dv._BatchTok) for t in tok[2].values())
    got = view.fetch_finish(tok, nodes)
    for i in nodes:
        size = 1 << (i.bit_length() - 1)
        want = np.asarray(levels[size]).astype("<u8")[i - size].tobytes()
        assert got[i] == want


def test_heap_view_small_fetch_stays_synchronous(monkeypatch):
    # <= 4 nodes keep the tok=None synchronous fallback (not worth a
    # dispatch round)
    view, levels = _heap_views(64, monkeypatch, flat_limit=16)
    nodes = [1, 33]
    tok = view.fetch_start(nodes)
    assert tok is None
    got = view.fetch_finish(tok, nodes)
    for i in nodes:
        size = 1 << (i.bit_length() - 1)
        want = np.asarray(levels[size]).astype("<u8")[i - size].tobytes()
        assert got[i] == want


def test_padded_take_start_finish():
    rng = np.random.default_rng(3)
    arr = jnp.asarray(rng.integers(0, 1 << 62, size=(128, 8, 3),
                                   dtype=np.uint64))
    idx = [0, 7, 127, 64]
    tok = dv._padded_take_start(arr, idx)
    got = dv._padded_take_finish(tok, len(idx), arr.shape[1:])
    want = np.asarray(arr)[idx]
    assert np.array_equal(got, want)


def test_trace_device_cache_invalidation():
    from winterfell_tpu.math.fields import F64
    from winterfell_tpu.prover.trace import TraceTable

    t = TraceTable(F64, 2, 8)
    t.device_cache()["k"] = "sentinel"
    t.set(0, 3, 5)
    assert t.device_cache() == {}
    t.device_cache()["k"] = "sentinel"
    t.update_row(1, [1, 2])
    assert t.device_cache() == {}
    t.device_cache()["k"] = "sentinel"
    t.data = np.zeros((8, 2), dtype=object)
    assert t.device_cache() == {}
