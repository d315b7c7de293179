"""GoldilocksProver — the device-resident prove() pipeline for f64 configs.

Same 8-step protocol as the host :class:`winterfell_tpu.prover.Prover`
(prover/src/lib.rs:282-492), but every hot step runs on the accelerator via
``winterfell_tpu.ops.goldilocks``:

- trace/aux/composition interpolation + coset LDE: device NTT
- row hashing + Merkle layer reduction: vectorized Rescue-Prime
  (PartitionOptions column-chunked hashing included —
  prover/src/matrix/row_matrix.rs:184-229)
- constraint evaluation: the AIR's own ``evaluate_transition`` traced with
  :class:`JaxOps` over the whole CE domain in one jit; sequence boundary
  assertions evaluate their value polynomials with one batched in-graph NTT
  (mirroring prover/src/constraints/evaluator/boundary.rs:29-445)
- DEEP composition: pointwise rational evaluation over the LDE domain —
  C_z(x)/(x−z) + C_gz(x)/(x−z·g) with batched extension inversion. This is
  mathematically identical to the reference's coefficient-space synthetic
  division (prover/src/composer/mod.rs:186-199) because the numerators vanish
  at z and z·g, so the produced evaluations — and therefore the proof bytes —
  are bit-identical.
- FRI folding: device ``fri_fold``

Only digests, OOD scalars, and queried rows cross to the host; the
Fiat–Shamir transcript stays in the host channel, mirroring the reference's
channel/compute split.

Every domain-sized constant (NTT plans, offset power series, divisor
inverses, periodic tables) is device-built once and passed into the jitted
programs as a runtime ARGUMENT — executables stay small and warm-cache loads
stay fast (the round-1 lesson).

Proof bytes are asserted identical to the host prover in
tests/test_device_prover.py — the two pipelines are pinned together.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional

import numpy as np

import jax

from ..air.air import EvaluationFrame
from ..air.divisor import ConstraintDivisor
from ..air.proof import FriProof, FriProofLayer, Proof, Queries
from ..crypto.hashers import Rp64_256
from ..crypto.merkle import MerkleTree
from ..fri import FriOptions, fold_positions
from ..math.fields import F64, Field
from ..utils import tracing
from ..ops import goldilocks as gl

import os as _os_mod

_MEMLOG = bool(_os_mod.environ.get("WINTER_MEMLOG"))
from ..ops.jax_ops import JaxOps
from . import Prover
from .channel import ProverChannel

jnp = gl.jnp


# words per flatten slab: bounds the lane-padded relayout temp that a
# narrow-trailing-dim reshape materializes (e.g. (m, 8, 3) u64 pads 3 → 128
# lanes, a 42× copy — 16 GB for one 2^22-proof FRI layer)
_FLAT_SLAB = 1 << 22


@jax.jit
def _reshape_flat(chunk):
    return chunk.reshape(-1)


@partial(jax.jit, static_argnums=(1,))
def _to_flat_program(arr, slab: int):
    """Slab-flatten inside ONE program: each slab's lane-padded relayout
    temp stays bounded (~64 MB) and is freed before the next (XLA liveness),
    while the host loop of per-slab dispatches it replaces cost one remote
    roundtrip each."""
    n = arr.shape[0]
    parts = [arr[i : i + slab].reshape(-1) for i in range(0, n, slab)]
    return jnp.concatenate(parts)


def _to_flat(arr):
    """Device array -> 1-D device array, flattened in row slabs: slicing a
    big resident array is cheap, but a single whole-array reshape pads the
    trailing dims up to the (8, 128) tile inside the program — the slabs
    bound that temp to ~64 MB regardless of array size."""
    if arr.ndim == 1:
        return arr
    n = arr.shape[0]
    rw = int(np.prod(arr.shape[1:], dtype=np.int64))
    slab = max(1, _FLAT_SLAB // rw)
    slab = 1 << (slab.bit_length() - 1)  # pow2 rows -> even pow2 slabs
    if n <= slab:
        return _reshape_flat(arr)
    if n * rw <= (1 << 25):
        return _to_flat_program(arr, slab)
    # huge arrays: eager per-slab dispatches guarantee only one padded
    # relayout temp is live at a time (XLA liveness inside one program is
    # not guaranteed to free slab temps before the concat)
    parts = [_reshape_flat(arr[i : i + slab]) for i in range(0, n, slab)]
    return jnp.concatenate(parts)


@jax.jit
def _multi_take_jit(flats, idxs):
    """Every query-phase gather of one proof as ONE program (the per-gather
    dispatch costs a tunnel round trip each; the union is a handful of
    1-D takes XLA runs back-to-back)."""
    return tuple(jnp.take(f, i, axis=0) for f, i in zip(flats, idxs))


class _GatherBatch:
    """Collects (flat array, padded index) gathers across all trees/LDEs of
    the query phase, then executes them in one jitted multi-take and starts
    the device→host copies of every result together."""

    __slots__ = ("flats", "idxs", "results")

    def __init__(self):
        self.flats, self.idxs, self.results = [], [], None

    def add(self, flat, padded_idx: np.ndarray) -> int:
        assert self.results is None, "gather batch already executed"
        self.flats.append(flat)
        self.idxs.append(jnp.asarray(padded_idx))
        return len(self.flats) - 1

    def get(self, slot: int):
        if self.results is None:
            self.results = _multi_take_jit(tuple(self.flats),
                                           tuple(self.idxs))
            for out in self.results:
                if hasattr(out, "copy_to_host_async"):
                    out.copy_to_host_async()
        return self.results[slot]


class _BatchTok:
    """Deferred gather handle: resolves from the shared _GatherBatch."""

    __slots__ = ("batch", "slot")

    def __init__(self, batch: "_GatherBatch", slot: int):
        self.batch = batch
        self.slot = slot

    def resolve(self):
        return self.batch.get(self.slot)


def _pad_pow2(word_idx: np.ndarray) -> np.ndarray:
    k = word_idx.shape[0]
    cap = 1
    while cap < k:
        cap *= 2
    return np.concatenate(
        [word_idx, np.full(cap - k, word_idx[0], dtype=np.int64)])


def _flat_take_start(flat, word_idx: np.ndarray, batch=None):
    """Dispatch (async) a padded gather; returns the on-device result — or,
    with ``batch``, enqueue it in the shared one-program gather batch."""
    padded = _pad_pow2(word_idx)
    if batch is not None:
        return _BatchTok(batch, batch.add(flat, padded))
    return jnp.take(flat, jnp.asarray(padded), axis=0)


def _flat_take(flat, word_idx: np.ndarray) -> np.ndarray:
    """Gather words from a 1-D device array at host-computed indexes, padded
    to the next power of two so distinct index COUNTS reuse the same
    compiled gather (variable lengths would compile one program per count)."""
    k = word_idx.shape[0]
    return np.asarray(_flat_take_start(flat, word_idx))[:k]


# above this many words, a row gather takes each row by a shared
# dynamic-slice program instead of building a flat copy of the whole array:
# the flat copy of a 2^25-point LDE (plus its relayout temps) is what
# OOMed the 2^22-trace proof (r4_fib22.err); single-row slices cost zero
# extra residency and ~a dispatch per row (irrelevant at that scale)
_TAKE_SLICE_LIMIT = 1 << 26


@jax.jit
def _row_slice(arr, idx):
    return jax.lax.dynamic_index_in_dim(arr, idx, axis=0, keepdims=False)


def _padded_take_start(arr, indexes, batch=None):
    """Dispatch (async) the row gather of :func:`_padded_take`; returns the
    on-device padded result (finish with :func:`_padded_take_finish`)."""
    row_shape = arr.shape[1:]
    rw = int(np.prod(row_shape, dtype=np.int64)) if row_shape else 1
    if arr.shape[0] * rw > _TAKE_SLICE_LIMIT:
        rows = [_row_slice(arr, np.int32(i)) for i in indexes]
        for r in rows:
            if hasattr(r, "copy_to_host_async"):
                r.copy_to_host_async()
        return ("rows", rows)
    word_idx = (np.asarray(indexes, dtype=np.int64)[:, None] * rw
                + np.arange(rw, dtype=np.int64)[None, :]).reshape(-1)
    return _flat_take_start(_to_flat(arr), word_idx, batch)


def _padded_take_finish(dev, k: int, row_shape) -> np.ndarray:
    if isinstance(dev, _BatchTok):
        dev = dev.resolve()
    if isinstance(dev, tuple) and dev[0] == "rows":
        return np.stack([np.asarray(r) for r in dev[1]])[:k]
    rw = int(np.prod(row_shape, dtype=np.int64)) if row_shape else 1
    return np.asarray(dev)[: k * rw].reshape((k,) + tuple(row_shape))


def _padded_take(arr, indexes):
    """Gather rows at python-int indexes (pow2-padded shared gathers).

    The gather runs over a flattened 1-D view with host-computed word
    indexes: gathering rows of a narrow (n, w) operand makes XLA copy it
    into a lane-padded T(8,128) layout first (w=4 → 32× the bytes, a
    32 GiB allocation at 2^25 rows); a flat vector gathers in place."""
    return _padded_take_finish(
        _padded_take_start(arr, indexes), len(indexes), arr.shape[1:])


# every XLA program — even a one-row gather — costs a slow remote compile on
# the axon tunnel, while plain device→host transfers compile nothing. Digest
# reads therefore pull whole arrays once (cached on the view) below this row
# count, and use a pow2-padded gather only for the few largest arrays.
_PULL_THRESHOLD = 1 << 16

# trees at or below this leaf count keep a single flat copy of all internal
# levels for one-gather batch node fetches; above it the extra residency
# (32 B/leaf) and the flatten relayout temps matter more than roundtrips,
# so fetches fall back to per-level gathers/pulls
_HEAP_FLAT_LIMIT = 1 << 22

# ...but only PRE-build the flat heap at tree-commit time for trees at or
# below this leaf count (larger heaps build lazily at query time, when the
# commit/DEEP/FRI temporaries are already freed — peak-memory discipline)
_FLAT_PREDISPATCH = 1 << 20


class _DigestView:
    """List-of-bytes view over an (n, w) word-array of digests: (n, 4) uint64
    rows (Rescue ElementDigest) or (n, 8)/(n, 6) uint32 rows (BLAKE3) — the
    LE word rows are exactly the digest byte layouts."""

    __slots__ = ("arr", "_n", "_host", "_wdtype", "_nbytes", "_prefetched")

    def __init__(self, arr, nbytes: Optional[int] = None):
        self.arr = arr
        self._n = arr.shape[0]
        self._host = None
        self._wdtype = "<u4" if arr.dtype == np.uint32 else "<u8"
        # digest byte length when shorter than the word row (Rp62_248 packs
        # 248 bits into 8 words — the 32nd byte is a pad the host trims)
        self._nbytes = nbytes
        self._prefetched = False

    def prefetch_async(self) -> None:
        """Start the device→host copy of ALL digests now (non-blocking);
        queries then resolve from the host copy with zero device dispatches
        (see PrehashedMerkleTree.prefetch_async)."""
        if hasattr(self.arr, "copy_to_host_async"):
            self.arr.copy_to_host_async()
        self._prefetched = True

    def __len__(self) -> int:
        return self._n

    def _host_all(self) -> np.ndarray:
        if self._host is None:
            self._host = np.ascontiguousarray(
                np.asarray(self.arr).astype(self._wdtype))
        return self._host

    def __getitem__(self, i) -> bytes:
        if (self._host is not None or self._prefetched
                or self._n <= _PULL_THRESHOLD):
            return self._host_all()[int(i)].tobytes()[: self._nbytes]
        row = _padded_take(self.arr, [int(i)])
        return np.ascontiguousarray(
            row.astype(self._wdtype))[0].tobytes()[: self._nbytes]

    def fetch_start(self, indexes, batch=None):
        """Dispatch the device work of :meth:`fetch` without waiting —
        lets callers pipeline many fetches' gathers/transfers over the
        link before converting any of them."""
        if not indexes:
            return None
        if (self._host is not None or self._prefetched
                or self._n <= _PULL_THRESHOLD):
            if self._host is None and hasattr(self.arr, "copy_to_host_async"):
                self.arr.copy_to_host_async()
            return None
        return _padded_take_start(self.arr, list(indexes), batch)

    def fetch_finish(self, tok, indexes) -> dict:
        if not indexes:
            return {}
        indexes = list(indexes)
        nb = self._nbytes
        if tok is None:
            host = self._host_all()
            return {i: host[int(i)].tobytes()[:nb] for i in indexes}
        rows = _padded_take_finish(tok, len(indexes), self.arr.shape[1:])
        rows = np.ascontiguousarray(rows.astype(self._wdtype))
        return {i: rows[k].tobytes()[:nb] for k, i in enumerate(indexes)}

    def fetch(self, indexes) -> dict:
        """Batched read of the requested digests."""
        indexes = list(indexes)
        return self.fetch_finish(self.fetch_start(indexes), indexes)


class _HeapNodesView:
    """Heap-indexed digest view over the per-level device arrays produced by
    the Merkle kernels (node i lives in the level of size 2^⌊log2 i⌋ at
    offset i − 2^⌊log2 i⌋). Levels are kept SEPARATE on purpose: concatenating
    them into one heap array doubles tree residency and the concat's
    relayout transients OOM huge domains (2^25-leaf trees hold 1 GiB of
    internal nodes). Small levels (≤ _PULL_THRESHOLD nodes) are pulled to the
    host wholesale — plain transfers compile nothing on the remote-compile
    tunnel — while the few big bottom levels use the pow2-padded flat gather;
    level sizes repeat across the trace/constraint/FRI trees of one proof, so
    the handful of per-level-size gather programs is shared."""

    __slots__ = ("levels", "_n", "_w", "_host_levels", "_wdtype", "_nbytes",
                 "_flat", "_prefetched")

    def __init__(self, levels: dict, num_leaves: int,
                 nbytes: Optional[int] = None):
        first = next(iter(levels.values()))
        self._w = first.shape[1]
        self.levels = levels
        self._n = num_leaves
        self._host_levels = {}
        self._wdtype = "<u4" if first.dtype == np.uint32 else "<u8"
        self._nbytes = nbytes
        self._flat = None
        self._prefetched = False

    def prefetch_async(self) -> None:
        """Start device→host copies of EVERY level now (non-blocking);
        node reads then resolve entirely from the host copies."""
        for lvl in self.levels.values():
            if hasattr(lvl, "copy_to_host_async"):
                lvl.copy_to_host_async()
        self._prefetched = True

    def __len__(self) -> int:
        return self._n

    def _host_level(self, size: int) -> np.ndarray:
        lvl = self._host_levels.get(size)
        if lvl is None:
            lvl = np.ascontiguousarray(
                np.asarray(self.levels[size]).astype(self._wdtype))
            self._host_levels[size] = lvl
        return lvl

    def _flat_nodes(self):
        """All internal levels as ONE flat device vector, ascending level
        sizes: heap node i lands at word (i − 1)·w. Built lazily by 1-D
        per-level flattens (shared _reshape_flat programs, slab-bounded
        relayout temps) + one 1-D concatenate — so a batch node fetch is a
        single device gather + single transfer, instead of one whole-level
        transfer per small level and one gather per big level (each
        roundtrip on the remote tunnel costs ~10-30 ms, and the Octopus
        proof pass touches every level)."""
        if self._flat is None:
            self._flat = jnp.concatenate(
                [_to_flat(self.levels[s]) for s in sorted(self.levels)])
        return self._flat

    def _take_start(self, nodes, batch=None):
        """Dispatch the flat-heap gather asynchronously (None = the by-size
        fallback path, resolved synchronously at finish — free when the
        levels were prefetched to host at tree-build time)."""
        if self._prefetched:
            return None
        w = self._w
        if self._n <= _HEAP_FLAT_LIMIT and len(nodes) > 4:
            word_idx = ((np.asarray(nodes, dtype=np.int64) - 1)[:, None] * w
                        + np.arange(w, dtype=np.int64)).reshape(-1)
            return _flat_take_start(self._flat_nodes(), word_idx, batch)
        if len(nodes) > 4:
            # huge trees (> _HEAP_FLAT_LIMIT leaves): no whole-heap flat copy
            # (its relayout temps OOM 2^25-leaf domains) — instead dispatch
            # ONE padded gather per big level now (folding into the shared
            # query-phase batch when given) and start async host copies of
            # the small levels, so finish-time work is pure conversion
            by_size = {}
            for k, i in enumerate(nodes):
                size = 1 << (int(i).bit_length() - 1)
                by_size.setdefault(size, []).append((k, int(i) - size))
            toks = {}
            for size, entries in by_size.items():
                if size <= _PULL_THRESHOLD:
                    lvl = self.levels[size]
                    if (size not in self._host_levels
                            and hasattr(lvl, "copy_to_host_async")):
                        lvl.copy_to_host_async()
                else:
                    toks[size] = _padded_take_start(
                        self.levels[size], [off for _, off in entries],
                        batch)
            return ("levels", by_size, toks)
        return None

    def _take_finish(self, tok, nodes) -> np.ndarray:
        w = self._w
        if isinstance(tok, _BatchTok):
            tok = tok.resolve()
        if isinstance(tok, tuple) and tok[0] == "levels":
            _, by_size, toks = tok
            out = np.empty((len(nodes), w), dtype=self._wdtype)
            for size, entries in by_size.items():
                lvl_tok = toks.get(size)
                if lvl_tok is None:
                    host = self._host_level(size)
                    for k, off in entries:
                        out[k] = host[off]
                else:
                    rows = _padded_take_finish(
                        lvl_tok, len(entries), self.levels[size].shape[1:])
                    rows = np.ascontiguousarray(rows.astype(self._wdtype))
                    for j, (k, _) in enumerate(entries):
                        out[k] = rows[j]
            return out
        if tok is not None:
            rows = np.asarray(tok)[: len(nodes) * w]
            return np.ascontiguousarray(
                rows.reshape(len(nodes), w).astype(self._wdtype))
        out = np.empty((len(nodes), w), dtype=self._wdtype)
        by_size = {}
        for k, i in enumerate(nodes):
            size = 1 << (int(i).bit_length() - 1)
            by_size.setdefault(size, []).append((k, int(i) - size))
        for size, entries in by_size.items():
            if self._prefetched or size <= _PULL_THRESHOLD:
                host = self._host_level(size)
                for k, off in entries:
                    out[k] = host[off]
            else:
                rows = _padded_take(self.levels[size],
                                    [off for _, off in entries])
                rows = np.ascontiguousarray(rows.astype(self._wdtype))
                for j, (k, _) in enumerate(entries):
                    out[k] = rows[j]
        return out

    def _take_nodes(self, nodes) -> np.ndarray:
        return self._take_finish(self._take_start(nodes), nodes)

    def __getitem__(self, i) -> bytes:
        return self._take_nodes([int(i)])[0].tobytes()[: self._nbytes]

    def fetch_start(self, indexes, batch=None):
        return self._take_start([int(i) for i in indexes], batch) \
            if indexes else None

    def fetch_finish(self, tok, indexes) -> dict:
        indexes = [int(i) for i in indexes]
        if not indexes:
            return {}
        rows = self._take_finish(tok, indexes)
        nb = self._nbytes
        return {i: rows[k].tobytes()[:nb] for k, i in enumerate(indexes)}

    def fetch(self, indexes) -> dict:
        indexes = [int(i) for i in indexes]
        return self.fetch_finish(self.fetch_start(indexes), indexes)


class _RecordingView:
    """Index-recording stand-in: logs which digests a proof pass touches."""

    __slots__ = ("indexes", "_n")

    def __init__(self, n: int):
        self.indexes = set()
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i) -> bytes:
        self.indexes.add(int(i))
        return b""


class _DictView:
    __slots__ = ("data", "_n")

    def __init__(self, data: dict, n: int):
        self.data = data
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i) -> bytes:
        return self.data[int(i)]


# Trees at or below this leaf count are copied to the host IN FULL, with
# async transfers started at tree-BUILD time: by the query phase every
# digest is host-resident and proof assembly costs ZERO device dispatches.
# Above this the per-query flat gather wins. Sized for the tunnel: the
# link moves ~12 MB/s (measured r4 rescue chain-2^12 — 2^18-leaf prefetch
# clogged it for 1.4 s/commit), so cap the whole-tree copies at ~2 MB
# (2^16 leaves × 32 B) per array.
_TREE_PREFETCH = 1 << 16


class PrehashedMerkleTree(MerkleTree):
    """MerkleTree over digests hashed on-device; reuses the host proof logic.

    ``prove_batch`` runs in two passes: a recording pass to learn which leaf
    and node digests the Octopus algorithm touches (the access pattern depends
    only on indexes, not values), then ONE batched device gather per array,
    then the real pass over the prefetched bytes. This turns thousands of
    per-digest tunnel roundtrips into a handful. Small-to-medium trees skip
    even that: ``prefetch_async`` (called at build time) streams the whole
    tree to the host in the background, so the query phase is pure host
    work."""

    def __init__(self, leaves_view, nodes_view, hasher):
        self.leaves = leaves_view
        self.hasher = hasher
        self.nodes = nodes_view

    def prefetch_async(self) -> None:
        if hasattr(self.leaves, "prefetch_async"):
            self.leaves.prefetch_async()
        if hasattr(self.nodes, "prefetch_async"):
            self.nodes.prefetch_async()

    def prove_batch_start(self, indexes, batch=None):
        """Recording pass + async dispatch of the digest gathers. Callers
        with several trees to prove (FRI layers, trace/constraint queries)
        start them ALL first so the gathers and device→host transfers
        pipeline over the link instead of paying one roundtrip each (or,
        with ``batch``, fold into the proof-wide one-program gather)."""
        real_leaves, real_nodes = self.leaves, self.nodes
        rec_leaves = _RecordingView(len(real_leaves))
        rec_nodes = _RecordingView(len(real_nodes))
        self.leaves, self.nodes = rec_leaves, rec_nodes
        try:
            super().prove_batch(indexes)
        finally:
            self.leaves, self.nodes = real_leaves, real_nodes
        leaf_idx = sorted(rec_leaves.indexes)
        node_idx = sorted(rec_nodes.indexes)
        return (list(indexes), leaf_idx, node_idx,
                real_leaves.fetch_start(leaf_idx, batch),
                real_nodes.fetch_start(node_idx, batch))

    def prove_batch_finish(self, state):
        indexes, leaf_idx, node_idx, leaf_tok, node_tok = state
        real_leaves, real_nodes = self.leaves, self.nodes
        leaf_map = real_leaves.fetch_finish(leaf_tok, leaf_idx)
        node_map = real_nodes.fetch_finish(node_tok, node_idx)
        self.leaves = _DictView(leaf_map, len(real_leaves))
        self.nodes = _DictView(node_map, len(real_nodes))
        try:
            return super().prove_batch(indexes)
        finally:
            self.leaves, self.nodes = real_leaves, real_nodes

    def prove_batch(self, indexes):
        return self.prove_batch_finish(self.prove_batch_start(indexes))


def _gl_sum(arr, axis: int = 0):
    """Tree-structured modular sum along a power-of-two axis."""
    arr = jnp.moveaxis(arr, axis, 0)
    while arr.shape[0] > 1:
        half = arr.shape[0] // 2
        arr = gl.gl_add(arr[:half], arr[half : 2 * half])
    return arr[0]


@partial(jax.jit, static_argnums=(1,))
def _pow_table_from_jumps(jumps, n: int):
    """(n, d) table of z^k from host-computed jumps z^(2^j) ((logn, d) array);
    one compile per n, reused across proofs."""
    d = jumps.shape[1]
    one = np.zeros((1, d), dtype=np.uint64)
    one[0, 0] = 1
    cur = jnp.asarray(one)
    j = 0
    length = 1
    while length < n:
        zl = jumps[j][None, :]
        cur = jnp.concatenate(
            [cur, gl.ext_mul(cur, jnp.broadcast_to(zl, cur.shape))], axis=0)
        j += 1
        length *= 2
    return cur


def _z_power_table(ext: Field, z: tuple, n: int):
    """(n, d) device table of z^k, built by log-doubling."""
    logn = max((n - 1).bit_length(), 1)
    jumps = np.zeros((logn, ext.degree), dtype=np.uint64)
    acc = z
    for j in range(logn):
        jumps[j] = list(acc)
        acc = ext.mul(acc, acc)
    return _pow_table_from_jumps(jnp.asarray(jumps), n)


@jax.jit
def _eval_cols_base(polys, pows):
    """Σ_k coeff[k]·z^k per base column: polys (n, k), pows (n, d) → (k, d)."""
    prod = gl.gl_mul(polys[:, :, None], pows[:, None, :])
    return _gl_sum(prod, axis=0)


@jax.jit
def _eval_cols_ext(polys, pows):
    """polys (n, k, d) ext columns → (k, d)."""
    prod = gl.ext_mul(polys, jnp.broadcast_to(pows[:, None, :], polys.shape))
    return _gl_sum(prod, axis=0)


@jax.jit
def _eval_cols_pair(polys, pows2):
    """Both OOD points in one program: pows2 (n, 2, d) stacks the z and z·g
    power tables; returns (k, 2, d). Halves OOD dispatches and pulls."""
    if polys.ndim == 2:  # base columns (n, k)
        prod = gl.gl_mul(polys[:, :, None, None], pows2[:, None, :, :])
    else:  # ext columns (n, k, d)
        prod = gl.ext_mul(
            polys[:, :, None, :],
            jnp.broadcast_to(pows2[:, None],
                             polys.shape[:2] + pows2.shape[1:]))
    return _gl_sum(prod, axis=0)


def _ext_scalar(e: tuple):
    return jnp.asarray(np.array([list(e)], dtype=np.uint64))


@partial(jax.jit, static_argnums=(1, 2))
def _transition_divisor_inv(xs, n: int, exemptions: tuple):
    """1/(x^n − 1) · Π(x − e) over the CE domain. xs is a traced argument so
    the pow/inv chains stay runtime ops (not constant-folded)."""
    num = gl.gl_sub(gl.gl_pow_const(xs, n), jnp.uint64(1))
    inv_num = gl.gl_inv(num)
    exempt = jnp.ones(xs.shape[0], dtype=jnp.uint64)
    for e in exemptions:
        exempt = gl.gl_mul(exempt, gl.gl_sub(xs, jnp.uint64(e)))
    return gl.gl_mul(inv_num, exempt)


@partial(jax.jit, static_argnums=(1, 2))
def _boundary_divisor_inv(xs, a: int, b0: int):
    """1/(x^a − b0) over the CE domain (traced xs — no folding)."""
    return gl.gl_inv(gl.gl_sub(gl.gl_pow_const(xs, a), jnp.uint64(b0)))


def _hash_rows_bytes(rows_2d, psize_base: int, hash_words_fn, dwords: int):
    """Byte-hasher (BLAKE3/SHA3) row hashing of (m, k) canonical u64 element
    rows, with PartitionOptions column chunking: chunk digests are combined
    with merge_many = hash over the concatenated digest bytes
    (row_matrix.rs:221-228)."""
    from ..ops.blake3_device import rows_from_u64

    m, k = rows_2d.shape
    words, byte_len = rows_from_u64(rows_2d)
    if psize_base >= k:
        return hash_words_fn(words, byte_len, dwords)
    digests = []
    for i in range(0, 2 * k, 2 * psize_base):
        chunk = words[:, i : i + 2 * psize_base]
        digests.append(hash_words_fn(chunk, 4 * chunk.shape[1], dwords))
    joined = jnp.concatenate(digests, axis=1)
    return hash_words_fn(joined, 4 * joined.shape[1], dwords)


def _f64_hasher_entry(hasher):
    """(kind, row-hash fn, merkle-levels fn, digest words) for every device
    hasher of the f64 prover. kind "field" hashes element rows in-field
    (digests are (m, 4) u64); kind "bytes" hashes the canonical LE element
    bytes as u32 words (BLAKE3/SHA3)."""
    from ..crypto.hashers import (Blake3_192, Blake3_256, RpJive64_256,
                                  Sha3_256)
    from ..ops import blake3_device as b3
    from ..ops import jive_device as jive
    from ..ops import sha3_device as s3

    return {
        Rp64_256: ("field", gl.rp64_hash_rows, gl._merkle_levels_impl, 4),
        RpJive64_256: ("field", jive.jive_hash_rows,
                       jive.merkle_levels_jive, 4),
        Blake3_256: ("bytes", b3.blake3_hash_words,
                     b3.merkle_levels_blake3, 8),
        Blake3_192: ("bytes", b3.blake3_hash_words,
                     b3.merkle_levels_blake3, 6),
        Sha3_256: ("bytes", s3.sha3_hash_words, s3.merkle_levels_sha3, 8),
    }[hasher]


def _hash_rows_part(rows_2d, psize_base: int, hasher=Rp64_256):
    """Row hashing with PartitionOptions column chunking: each chunk of
    psize_base base columns is hashed separately, then the chunk digests are
    combined with merge_many — identical bytes to the host `_hash_rows`
    (reference row_matrix.rs:184-229)."""
    kind, hash_fn, _, dwords = _f64_hasher_entry(hasher)
    if kind == "bytes":
        return _hash_rows_bytes(rows_2d, psize_base, hash_fn, dwords)
    m, k = rows_2d.shape
    if psize_base >= k:
        return hash_fn(rows_2d)
    digests = [hash_fn(rows_2d[:, i : i + psize_base])
               for i in range(0, k, psize_base)]
    return hash_fn(jnp.concatenate(digests, axis=1))


# above this LDE size the fused commit program exceeds single-chip HBM
# (XLA holds the NTT stage intermediates of all fused steps concurrently);
# run the steps as separate programs so buffers are freed between them
_FUSE_LIMIT = 1 << 24


# f64 row counts at or below this fuse the Merkle level reduction into the
# commit/FRI programs (saves one ~10-30 ms tunnel dispatch per level; the
# fori-loop Pallas Rescue keeps the per-merge code ~2 MB)
_LEVEL_FUSE_F64 = 1 << 16


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _commit_pipeline_fused(matrix, inv_plan, off_pows, fwd_plan,
                           n: int, blowup: int, psize: int, hasher=Rp64_256,
                           shard=None, fuse_levels: bool = False):
    """Interpolate → coset LDE → row hash, ONE program per matrix shape
    (fuses three dispatches — fewer remote compiles, fewer roundtrips).
    NTT plans and offset powers are runtime arguments (small executables).
    ``shard`` (mesh, axes) pins the six-step NTT intermediates' shardings
    on a 2-D (host × chip) mesh (gl._shard_six_step)."""
    polys = gl.ntt_interpolate_body(matrix, inv_plan, n, shard)
    lde = gl.ntt_lde_body(polys, off_pows, fwd_plan, n, blowup, shard)
    rows_2d = lde.reshape(lde.shape[0], -1)
    leaves = _hash_rows_part(rows_2d, psize, hasher)
    levels = (_f64_hasher_entry(hasher)[2](leaves) if fuse_levels else None)
    return polys, lde, leaves, levels


def _lane_interp_lde(matrix, n: int, offset: int, blowup: int):
    """Interpolate + coset-LDE one flattened column lane at a time. Above
    _FUSE_LIMIT the whole-matrix NTT's transient buffers (several copies of
    the padded (n·blowup, w, d) array inside the six-step stages) dominate
    HBM; per-lane programs cap the peak at ~a few copies of ONE (n·blowup,)
    lane while the finished lanes hold only their results."""
    rest = matrix.shape[1:]
    flat = matrix.reshape(n, -1)
    polys_lanes, lde_lanes = [], []
    for j in range(flat.shape[1]):
        polys_j = gl.ntt_interpolate(flat[:, j : j + 1], n)
        lde_j = gl.ntt_evaluate_with_offset(polys_j, n, offset, blowup)
        polys_lanes.append(polys_j)
        lde_lanes.append(lde_j)
    polys = jnp.concatenate(polys_lanes, axis=1).reshape((n,) + rest)
    lde = jnp.concatenate(lde_lanes, axis=1).reshape((n * blowup,) + rest)
    return polys, lde


def _commit_pipeline(matrix, n: int, offset: int, blowup: int, psize: int,
                     hasher=Rp64_256, shard=None):
    inv_plan = gl.ntt_plan(n, True)
    fwd_plan = gl.ntt_plan(n * blowup, False)
    off_pows = gl._power_series_dev(offset, n)
    if n * blowup < _FUSE_LIMIT:
        return _commit_pipeline_fused(matrix, inv_plan, off_pows, fwd_plan,
                                      n, blowup, psize, hasher, shard,
                                      n * blowup <= _LEVEL_FUSE_F64)
    polys, lde = _lane_interp_lde(matrix, n, offset, blowup)
    leaves = _hash_rows_slabbed(lde, psize, hasher)
    return polys, lde, leaves, None


@partial(jax.jit, static_argnums=(1, 2))
def _hash_rows_split(rows_2d, psize: int, hasher=Rp64_256):
    return _hash_rows_part(rows_2d, psize, hasher)


# Rescue row hashing holds ~8 live state copies per row in XLA fusion temps
# (the inv-S-box chain); above this row count one program exceeds single-chip
# HBM (2^25x12 OOMed at 26G / 15.75G), so hash in fixed-size slabs through
# ONE compiled program reused per slab.
_HASH_SLAB = 1 << 21


@partial(jax.jit, static_argnums=(1, 2))
def _hash_rows_scan(lde, psize: int, hasher=Rp64_256):
    """Slab loop as one lax.scan program: same per-slab peak memory, one
    remote dispatch instead of m/_HASH_SLAB."""
    m = lde.shape[0]
    blocks = lde.reshape((m // _HASH_SLAB, _HASH_SLAB) + lde.shape[1:])

    def body(_, slab):
        return None, _hash_rows_part(slab.reshape(_HASH_SLAB, -1), psize,
                                     hasher)

    _, parts = jax.lax.scan(body, None, blocks)
    return parts.reshape(m, -1)


def _hash_rows_slabbed(lde, psize: int, hasher=Rp64_256):
    """Row-hash an (m, ...) LDE in slabs, flattening each slab's trailing
    dims as part of the slab program: a whole-array (m, k) reshape copy of a
    2^25-row LDE is 1.5 GB of extra residency for the entire hash phase."""
    m = lde.shape[0]
    if m <= _HASH_SLAB:
        return _hash_rows_split(lde.reshape(m, -1), psize, hasher)
    if m % _HASH_SLAB == 0:
        return _hash_rows_scan(lde, psize, hasher)
    parts = [
        _hash_rows_split(lde[i : i + _HASH_SLAB].reshape(_HASH_SLAB, -1),
                         psize, hasher)
        for i in range(0, m, _HASH_SLAB)]
    return jnp.concatenate(parts, axis=0)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _comp_commit_pipeline_fused(ce_column, interp_pows, inv_plan, off_pows,
                                fwd_plan, ce: int, n: int, blowup: int,
                                num_cols: int, psize: int, hasher=Rp64_256,
                                shard=None, fuse_levels: bool = False):
    """Composition commitment: iFFT the CE column, segment the first num_cols
    trace-length coefficient chunks (composition_poly.rs:55-85), LDE + hash —
    one program."""
    coeffs = gl.ntt_interp_offset_body(ce_column, interp_pows, inv_plan, ce,
                                       shard)
    d = ce_column.shape[-1]
    comp_columns = jnp.swapaxes(
        coeffs[: num_cols * n].reshape(num_cols, n, d), 0, 1)
    lde = gl.ntt_lde_body(comp_columns, off_pows, fwd_plan, n, blowup, shard)
    rows_2d = lde.reshape(lde.shape[0], -1)
    leaves = _hash_rows_part(rows_2d, psize, hasher)
    levels = (_f64_hasher_entry(hasher)[2](leaves) if fuse_levels else None)
    return comp_columns, lde, leaves, levels


@partial(jax.jit, static_argnums=(3, 4, 5))
def _comp_segment(ce_column, interp_pows, inv_plan, ce: int, num_cols: int,
                  n: int):
    coeffs = gl.ntt_interp_offset_body(ce_column, interp_pows, inv_plan, ce)
    d = ce_column.shape[-1]
    return jnp.swapaxes(coeffs[: num_cols * n].reshape(num_cols, n, d), 0, 1)


def _comp_commit_pipeline(ce_column, ce: int, n: int, offset: int, blowup: int,
                          num_cols: int, psize: int, hasher=Rp64_256,
                          shard=None):
    interp_pows = gl.interp_offset_powers(ce, offset)
    inv_plan = gl.ntt_plan(ce, True)
    if n * blowup < _FUSE_LIMIT:
        return _comp_commit_pipeline_fused(
            ce_column, interp_pows, inv_plan, gl._power_series_dev(offset, n),
            gl.ntt_plan(n * blowup, False), ce, n, blowup, num_cols, psize,
            hasher, shard, n * blowup <= _LEVEL_FUSE_F64)
    comp_columns = _comp_segment(ce_column, interp_pows, inv_plan, ce,
                                 num_cols, n)
    rest = comp_columns.shape[1:]
    flat = comp_columns.reshape(n, -1)
    lde_lanes = [gl.ntt_evaluate_with_offset(flat[:, j : j + 1], n, offset,
                                             blowup)
                 for j in range(flat.shape[1])]
    lde = jnp.concatenate(lde_lanes, axis=1).reshape((n * blowup,) + rest)
    leaves = _hash_rows_slabbed(lde, psize, hasher)
    return comp_columns, lde, leaves, None


def _deep_term_update(comp_z, comp_gz, term, adj_z_i, adj_gz_i):
    comp_z = gl.ext_add(comp_z, gl.ext_sub(
        term, jnp.broadcast_to(adj_z_i[None, :], term.shape)))
    comp_gz = gl.ext_add(comp_gz, gl.ext_sub(
        term, jnp.broadcast_to(adj_gz_i[None, :], term.shape)))
    return comp_z, comp_gz


@partial(jax.jit, donate_argnums=(0, 1))
def _deep_acc_base(comp_z, comp_gz, col, cc, adj_z_i, adj_gz_i):
    """Fold one BASE trace column into the running DEEP numerators (the
    huge-domain column-at-a-time path; donated sums — no buffer growth)."""
    term = gl.gl_mul(col[:, None], cc[None, :])
    return _deep_term_update(comp_z, comp_gz, term, adj_z_i, adj_gz_i)


@partial(jax.jit, donate_argnums=(0, 1))
def _deep_acc_ext(comp_z, comp_gz, col, cc, adj_z_i, adj_gz_i):
    """Fold one EXTENSION column (aux trace or composition) into the sums."""
    term = gl.ext_mul(col, jnp.broadcast_to(cc[None, :], col.shape))
    return _deep_term_update(comp_z, comp_gz, term, adj_z_i, adj_gz_i)


@jax.jit
def _deep_combine(comp_z, comp_gz, z_arr, zg_arr, xs):
    """comp_z/(x−z) + comp_gz/(x−z·g) with one paired extension inversion."""
    d = comp_z.shape[1]
    xs_ext = jnp.pad(xs[:, None], ((0, 0), (0, d - 1)))
    den_z = gl.ext_sub(xs_ext, jnp.broadcast_to(z_arr, xs_ext.shape))
    den_gz = gl.ext_sub(xs_ext, jnp.broadcast_to(zg_arr, xs_ext.shape))
    inv_prod = gl.ext_batch_inv(gl.ext_mul(den_z, den_gz))
    inv_z = gl.ext_mul(inv_prod, den_gz)
    inv_gz = gl.ext_mul(inv_prod, den_z)
    return gl.ext_add(
        gl.ext_mul(comp_z, inv_z), gl.ext_mul(comp_gz, inv_gz))


# DEEP combine is pointwise over the domain, so huge domains run it in row
# slabs: the one-program form's extension-inversion temps alone exceed HBM at
# a 2^25-point domain (16 GB of HLO temp for the fused program)
_DEEP_SLAB = 1 << 22


@jax.jit
def _deep_combine_scan(comp_z, comp_gz, z_arr, zg_arr, xs):
    n = comp_z.shape[0]
    B = n // _DEEP_SLAB
    shp = lambda a: a.reshape((B, _DEEP_SLAB) + a.shape[1:])

    def body(_, slabs):
        cz, cgz, x = slabs
        return None, _deep_combine(cz, cgz, z_arr, zg_arr, x)

    _, parts = jax.lax.scan(body, None, (shp(comp_z), shp(comp_gz), shp(xs)))
    return parts.reshape((n,) + parts.shape[2:])


def _deep_combine_slabbed(comp_z, comp_gz, z_arr, zg_arr, xs):
    n = comp_z.shape[0]
    if n <= _DEEP_SLAB:
        return _deep_combine(comp_z, comp_gz, z_arr, zg_arr, xs)
    if n % _DEEP_SLAB == 0:
        # one scanned program: per-slab peak memory, one remote dispatch
        return _deep_combine_scan(comp_z, comp_gz, z_arr, zg_arr, xs)
    parts = [
        _deep_combine(comp_z[i : i + _DEEP_SLAB], comp_gz[i : i + _DEEP_SLAB],
                      z_arr, zg_arr, xs[i : i + _DEEP_SLAB])
        for i in range(0, n, _DEEP_SLAB)]
    return jnp.concatenate(parts, axis=0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _fri_layer_commit(evaluations, n_fold: int, hasher=Rp64_256,
                      fuse_levels: bool = False):
    """Transpose a FRI layer into N-value rows, hash, Merkle-reduce — one
    program per layer shape (fri/src/prover/mod.rs:202-222)."""
    n, d = evaluations.shape
    rows = n // n_fold
    transposed = jnp.swapaxes(evaluations.reshape(n_fold, rows, d), 0, 1)
    rows_2d = transposed.reshape(rows, n_fold * d)
    leaves = _hash_rows_part(rows_2d, rows_2d.shape[1], hasher)
    levels = (_f64_hasher_entry(hasher)[2](leaves) if fuse_levels else None)
    return transposed, leaves, levels


# Fused FRI commit phase (single-device only): the Fiat-Shamir coin runs on
# device (ops/device_coin.py) so the whole build_layers loop — transpose,
# hash, Merkle-reduce, reseed, draw alpha, fold, per layer, plus the
# remainder interpolation (fri/src/prover/mod.rs:179-239) — is ONE program
# instead of ~3 host round trips per layer.
_FRI_COIN_KINDS_F64 = {Rp64_256: "rp64_256"}
_FRI_FUSE_LIMIT_F64 = 1 << 22
# WINTER_FUSED_FRI=0 forces the per-layer host-coin path (A/B harness)
_FUSED_FRI_ON = _os_mod.environ.get("WINTER_FUSED_FRI", "1") not in ("", "0")
# WINTER_RESIDENT=0 disables the whole-proof resident program (A/B harness)
_RESIDENT_ON_F64 = _os_mod.environ.get(
    "WINTER_RESIDENT", "1") not in ("", "0")
# BatchingMethod -> device draw mode (air/src/options.rs:479-505)
_BATCH_NAMES_F64 = {0: "linear", 1: "algebraic", 2: "horner"}
# resident keeps every Merkle level in-graph; cap the whole-proof program's
# resident set (fib 2^18/2^19 LDEs qualify, 2^20+ falls back to phases)
_RESIDENT_LIMIT_F64 = 1 << 22


def _init_f64_coin_kinds():
    from ..crypto.hashers import Blake3_192, Blake3_256, Sha3_256

    _FRI_COIN_KINDS_F64.update({Blake3_256: "blake3_256",
                                Blake3_192: "blake3_192",
                                Sha3_256: "sha3_256"})


_init_f64_coin_kinds()


def _fri_phase_body_f64(deep_evals, seed, inv_pows, merge, draw, hasher,
                        n_fold: int, n_layers: int, offset: int):
    """Traced FRI commit phase with the coin in-graph: shared by the
    standalone fused-FRI program and the whole-proof resident program."""
    evaluations = deep_evals
    outs = []
    for i in range(n_layers):
        transposed, leaves, levels = _fri_layer_commit(
            evaluations, n_fold, hasher, True)
        seed = merge(seed, levels[-1][0])
        alpha, _ = draw(seed, jnp.uint64(0))
        evaluations = gl.fri_fold_body(
            evaluations, inv_pows[i], alpha, n_fold)
        outs.append((transposed, leaves, levels))
    rem = gl.ntt_interpolate_with_offset(
        evaluations, evaluations.shape[0], offset)
    return tuple(outs), rem, seed


@lru_cache(maxsize=None)
def _fused_fri_fn_f64(hasher, d: int, n_fold: int, n_layers: int,
                      offset: int):
    from ..ops import device_coin as dc

    merge, draw = dc.coin_bundle(_FRI_COIN_KINDS_F64[hasher], d, "f64")

    def run(deep_evals, seed, inv_pows):
        return _fri_phase_body_f64(deep_evals, seed, inv_pows, merge, draw,
                                   hasher, n_fold, n_layers, offset)

    return jax.jit(run)


class GoldilocksProver(Prover):
    """Drop-in Prover for f64 AIRs with Rp64_256, BLAKE3 or SHA3 commitments
    (any-hasher support mirrors prover/src/lib.rs:125). Subclass or wrap an
    existing prover class via ``accelerate``.

    Setting ``mesh`` (a ``jax.sharding.Mesh``) makes the whole pipeline run
    SPMD over the mesh: the domain-sized arrays (trace, LDEs, CE column, DEEP
    evaluations, FRI layers) are row-sharded at each phase boundary and XLA
    partitions every jitted program, inserting the ICI collectives (the
    all-to-all inside the six-step NTT reshape/transpose, all-gathers for row
    hashing) automatically. Exact integer arithmetic means sharding cannot
    change a proof byte — tests pin mesh-sharded bytes to the single-device
    prover's (the TPU answer to the reference's rayon parallelism +
    PartitionOptions, air/src/options.rs:404-445)."""

    mesh = None
    mesh_axis = "x"

    @classmethod
    def accelerate(cls, prover_cls):
        """Builds a device-accelerated subclass of a host Prover class."""
        return type(f"Goldilocks{prover_cls.__name__}", (cls, prover_cls), {})

    def with_mesh(self, mesh, axis=None):
        """Enable SPMD proving over ``mesh`` (returns self for chaining).

        A 1-D mesh row-shards every domain-sized array over its single
        axis. A 2-D (host × chip) mesh (parallel.make_mesh_2d) row-shards
        over BOTH axes flattened AND pins the six-step NTT intermediates'
        shardings so each transform is two batches of device-local
        sub-NTTs around ONE transposing all-to-all whose host-axis
        component is the only DCN traffic (SCALING.md's distributed-NTT
        recipe, the TPU answer to math/src/fft/concurrent.rs:132-171)."""
        self.mesh = mesh
        if axis is None:
            axis = (mesh.axis_names[0] if len(mesh.axis_names) == 1
                    else tuple(mesh.axis_names))
        self.mesh_axis = axis
        return self

    @property
    def _ntt_shard(self):
        """(mesh, axes) for gl._shard_six_step on a 2-D mesh, else None."""
        if self.mesh is not None and isinstance(self.mesh_axis, tuple):
            return (self.mesh, self.mesh_axis)
        return None

    def _shard_rows(self, arr):
        """Row-shard a device array over the prover mesh (no-op without a
        mesh, or when the row count doesn't divide across the devices)."""
        if self.mesh is None:
            return arr
        n_dev = self.mesh.devices.size
        if arr.shape[0] % n_dev != 0:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec(self.mesh_axis, *(None,) * (arr.ndim - 1))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def prove(self, trace) -> Proof:
        pub_inputs = self.get_pub_inputs(trace)
        air = self.air_class(trace.info(), pub_inputs, self.options)
        assert air.base is F64, "GoldilocksProver requires the f64 base field"
        try:
            hentry = _f64_hasher_entry(self.hasher)
        except KeyError:
            raise AssertionError(
                "GoldilocksProver requires a Rp64_256, RpJive64_256, BLAKE3 "
                "or SHA3 hasher (device row hashing)") from None
        self._levels_fn = hentry[2]
        channel = ProverChannel(air, air.pub_inputs_to_elements(), self.hasher)
        phases = tracing.Phases("device_prove")

        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        blowup = air.options.blowup_factor
        offset = air.domain_offset
        lde_size = air.lde_domain_size
        ce_blowup = air.ce_blowup_factor
        ce = air.context.ce_domain_size
        part = air.options.partition_options

        fri_opts = FriOptions(blowup, air.options.fri_folding_factor,
                              air.options.fri_remainder_max_degree)
        nl_all = fri_opts.num_fri_layers(lde_size)
        rem_all = lde_size // fri_opts.folding_factor**nl_all
        res_kind = _FRI_COIN_KINDS_F64.get(self.hasher)
        ood_bytes = (2 * (air.trace_info.width
                          + air.context.num_constraint_composition_columns())
                     * d * 8)
        if (_RESIDENT_ON_F64 and res_kind is not None
                and not air.trace_info.is_multi_segment
                and self.mesh is None and nl_all > 0 and rem_all >= 2
                and lde_size <= _RESIDENT_LIMIT_F64
                and (_f64_hasher_entry(self.hasher)[0] == "field"
                     or ood_bytes <= 1024)):
            return self._prove_resident(air, trace, channel, phases,
                                        res_kind, fri_opts, nl_all, rem_all)

        # 1 ----- trace commitment ------------------------------------------
        dev_cache = trace.device_cache() if hasattr(trace, "device_cache") \
            else {}
        main_dev = dev_cache.get((F64.p, self.mesh))
        if main_dev is None:
            native_rows = trace.native_rows() \
                if hasattr(trace, "native_rows") else None
            if native_rows is not None and native_rows.ndim == 2:
                main_dev = self._shard_rows(jnp.asarray(native_rows))
            else:
                main_dev = self._shard_rows(
                    gl.to_device(trace.main_segment()))
            dev_cache[(F64.p, self.mesh)] = main_dev
        tracing.sync(main_dev)
        phases.mark("commit_main_upload")
        w = main_dev.shape[1]
        main_polys, main_lde, leaves, levels = _commit_pipeline(
            main_dev, n, offset, blowup, part.partition_size(w, 1),
            self.hasher, self._ntt_shard)
        main_lde = self._shard_rows(main_lde)
        main_tree = self._make_tree(
            leaves, levels if levels is not None else self._levels_fn(leaves))
        channel.commit_trace(main_tree.root)
        phases.mark("commit_to_main_trace_segment", lde_domain_size=lde_size)

        aux_polys = None
        aux_lde = None
        aux_tree = None
        aux_rand_elements = None
        if air.trace_info.is_multi_segment:
            aux_rand_elements = air.get_aux_rand_elements(channel.public_coin)
            aux_obj = self.build_aux_trace(trace, aux_rand_elements)
            aux_dev = self._shard_rows(gl.to_device(aux_obj))  # (n, w_aux, d)
            w_aux = aux_dev.shape[1]
            aux_polys, aux_lde, leaves, levels = _commit_pipeline(
                aux_dev, n, offset, blowup,
                part.partition_size(w_aux, d) * d, self.hasher,
                self._ntt_shard)
            aux_lde = self._shard_rows(aux_lde)
            aux_tree = self._make_tree(
                leaves,
                levels if levels is not None else self._levels_fn(leaves))
            channel.commit_trace(aux_tree.root)

        # 2 ----- constraint evaluation -------------------------------------
        ccs = channel.get_constraint_composition_coeffs()
        ce_column = self._shard_rows(self._evaluate_constraints(
            air, main_lde, aux_lde, aux_rand_elements, ccs))  # (ce, d)
        tracing.sync(ce_column)
        phases.mark("evaluate_constraints", ce_domain_size=ce)

        # 3 ----- composition commitment ------------------------------------
        num_cols = air.context.num_constraint_composition_columns()
        comp_columns, comp_lde, leaves, fused_levels = _comp_commit_pipeline(
            ce_column, ce, n, offset, blowup, num_cols,
            part.partition_size(num_cols, d) * d, self.hasher,
            self._ntt_shard)
        del ce_column  # (ce, d) — dead from here; frees HBM at huge sizes
        comp_lde = self._shard_rows(comp_lde)
        if _MEMLOG:
            tracing.sync(leaves)
            phases.mark("memlog_comp_pipeline")
        comp_levels = (fused_levels if fused_levels is not None
                       else self._levels_fn(leaves))
        if _MEMLOG:
            tracing.sync(comp_levels[-1])
            phases.mark("memlog_comp_merkle_levels")
        comp_tree = self._make_tree(leaves, comp_levels)
        del comp_levels
        channel.commit_constraints(comp_tree.root)
        phases.mark("commit_to_constraint_evaluations")

        # 4 ----- OOD evaluations + DEEP ------------------------------------
        z = channel.get_ood_point()
        g_trace = F64.get_root_of_unity(n.bit_length() - 1)
        zg = ext.mul_base(z, g_trace)
        z_pows = _z_power_table(ext, z, n)     # (n, d)
        zg_pows = _z_power_table(ext, zg, n)
        pows2 = jnp.stack([z_pows, zg_pows], axis=1)  # (n, 2, d)

        # ONE program + ONE pull per matrix evaluates both OOD points
        # (z and z·g stacked); dispatch all before converting any so the
        # device→host pulls overlap the remaining evaluations' compute
        def eval_cols_conv(dev):
            res = np.asarray(dev)  # (k, 2, d)
            cur = [tuple(int(x) for x in row[0]) for row in res]
            nxt = [tuple(int(x) for x in row[1]) for row in res]
            return cur, nxt

        started = [_eval_cols_pair(main_polys, pows2)]
        if aux_polys is not None:
            started.append(_eval_cols_pair(aux_polys, pows2))
        started.append(_eval_cols_pair(comp_columns, pows2))
        conv = [eval_cols_conv(dev) for dev in started]
        trace_cur, trace_nxt = conv[0]
        if aux_polys is not None:
            trace_cur = trace_cur + conv[1][0]
            trace_nxt = trace_nxt + conv[1][1]
        quot_cur, quot_nxt = conv[-1]

        channel.send_ood_evaluations(trace_cur, trace_nxt, quot_cur, quot_nxt)
        phases.mark("ood_evaluations")
        deep_ccs = channel.get_deep_composition_coeffs()

        deep_evaluations = self._deep_evaluations(
            air, ext, main_lde, aux_lde, comp_lde, z, zg,
            trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs)  # (lde, d)
        deep_evaluations = self._shard_rows(deep_evaluations)
        tracing.sync(deep_evaluations)
        phases.mark("build_deep_composition_poly")

        # 6 ----- FRI layers -------------------------------------------------
        fri_options = FriOptions(
            blowup, air.options.fri_folding_factor,
            air.options.fri_remainder_max_degree)
        n_fold = fri_options.folding_factor
        fri_layers = []  # (tree, transposed_np (rows, N, d))
        n_layers = fri_options.num_fri_layers(lde_size)
        rem_n = lde_size // n_fold**n_layers
        coin_kind = _FRI_COIN_KINDS_F64.get(self.hasher)
        if (_FUSED_FRI_ON and n_layers > 0 and coin_kind is not None
                and rem_n >= 2 and lde_size <= _FRI_FUSE_LIMIT_F64
                and self.mesh is None):
            # whole FRI commit phase (+ remainder interpolation) as ONE
            # program: the coin lives on device (ops/device_coin.py)
            from ..ops import device_coin as dc

            fn = _fused_fri_fn_f64(self.hasher, d, n_fold, n_layers, offset)
            inv_pows = tuple(
                gl.fri_inv_offset_powers(lde_size // n_fold**i, n_fold,
                                         offset % gl.P)
                for i in range(n_layers))
            if coin_kind == "rp64_256":
                seed_dev = jnp.asarray(dc.seed_to_u64(
                    channel.public_coin.seed))
            else:
                seed_dev = jnp.asarray(dc.seed_to_words(
                    channel.public_coin.seed))
            outs, rem_coeffs, seed_out = fn(deep_evaluations, seed_dev,
                                            inv_pows)
            for transposed, leaves, levels in outs:
                tree = self._make_tree(leaves, levels)
                channel.commitments.raw += tree.root  # reseed ran on device
                fri_layers.append((tree, transposed))
            channel.public_coin.seed = (
                dc.u64_to_seed(seed_out) if coin_kind == "rp64_256"
                else dc.words_to_seed(seed_out))
            channel.public_coin.counter = 0
        else:
            evaluations = deep_evaluations
            for _ in range(n_layers):
                rows = evaluations.shape[0] // n_fold
                transposed, leaves, levels = _fri_layer_commit(
                    evaluations, n_fold, self.hasher,
                    1 < rows <= _LEVEL_FUSE_F64)
                tree = self._make_tree(
                    leaves,
                    levels if levels is not None else self._levels_fn(leaves))
                channel.commit_fri_layer(tree.root)
                alpha = channel.draw_fri_alpha()
                evaluations = self._shard_rows(gl.fri_fold(
                    evaluations, n_fold, offset, jnp.asarray(
                        np.array(list(alpha), dtype=np.uint64))))
                fri_layers.append((tree, transposed))
            rem_coeffs = gl.ntt_interpolate_with_offset(evaluations, rem_n,
                                                        offset)
        return self._finish_proof(air, channel, phases, rem_n, rem_coeffs,
                                  fri_layers, main_tree, main_lde, aux_tree,
                                  aux_lde, comp_tree, comp_lde)

    def _finish_proof(self, air, channel, phases, rem_n: int, rem_coeffs,
                      fri_layers, main_tree, main_lde, aux_tree, aux_lde,
                      comp_tree, comp_lde) -> Proof:
        """Steps 6b-8 shared by the phased and resident pipelines: remainder
        commit, grinding, query positions, and the batched query gathers +
        proof assembly."""
        ext = air.ext_field
        d = ext.degree
        blowup = air.options.blowup_factor
        lde_size = air.lde_domain_size
        n_fold = air.options.fri_folding_factor

        keep = rem_n // blowup
        rem_np = np.asarray(rem_coeffs[:keep])[::-1]
        remainder_poly = [tuple(int(x) for x in row) for row in rem_np]
        channel.commit_fri_layer(self.hasher.hash_elements(remainder_poly, ext))
        phases.mark("compute_fri_layers")

        # 7 ----- query positions -------------------------------------------
        channel.grind_query_seed()
        query_positions = channel.get_query_positions()
        phases.mark("determine_query_positions")

        # 8 ----- proof assembly --------------------------------------------
        # enqueue EVERY query gather (all positions are host-known) into one
        # shared batch: the whole phase's device work executes as a single
        # program on the first resolve, and all device→host transfers start
        # together — instead of one dispatch round trip per tree/array
        gb = _GatherBatch()
        layer_starts = []
        positions = list(query_positions)
        domain_size = lde_size
        for tree, transposed in fri_layers:
            positions = fold_positions(positions, domain_size, n_fold)
            layer_starts.append(
                (tree, transposed, positions,
                 tree.prove_batch_start(positions, gb),
                 _padded_take_start(transposed, positions, gb)))
            domain_size //= n_fold
        base_field = Field(F64, 1)
        q_starts = [(main_tree, main_lde, base_field, 1,
                     self._query_start(main_tree, main_lde, query_positions,
                                       gb))]
        if aux_tree is not None:
            q_starts.append((aux_tree, aux_lde, ext, d,
                             self._query_start(aux_tree, aux_lde,
                                               query_positions, gb)))
        q_starts.append((comp_tree, comp_lde, ext, d,
                         self._query_start(comp_tree, comp_lde,
                                           query_positions, gb)))

        proof_layers = []
        for tree, transposed, positions, st, rows_tok in layer_starts:
            _, batch_proof = tree.prove_batch_finish(st)
            rows_np = _padded_take_finish(rows_tok, len(positions),
                                          transposed.shape[1:])
            query_values = [
                [tuple(int(x) for x in row[j]) for j in range(n_fold)]
                for row in rows_np
            ]
            proof_layers.append(
                FriProofLayer.new(ext, query_values, batch_proof.to_bytes()))
        fri_proof = FriProof.new(ext, proof_layers, remainder_poly, 1)

        queries = [
            self._query_finish(tree, lde, query_positions, st, field, dd)
            for tree, lde, field, dd, st in q_starts]
        trace_queries = queries[:-1]
        constraint_queries = queries[-1]

        proof = channel.build_proof(
            trace_queries, constraint_queries, fri_proof, len(query_positions))
        phases.mark("build_proof_object")
        return proof

    # ------------------------------------------------------------------
    # whole-proof resident pipeline (single device, no aux segment)
    # ------------------------------------------------------------------

    def _prove_resident(self, air, trace, channel, phases, coin_kind: str,
                        fri_opts, n_layers: int, rem_n: int) -> Proof:
        """Steps 1-6 (trace commit, coefficient draws, constraint
        evaluation, composition commit, OOD, DEEP, every FRI layer) as ONE
        XLA program with the Fiat-Shamir coin in-graph (ops/device_coin.py);
        the host does the trace upload, the program's output pulls, the
        grinding scan and the batched query gather — two device dispatches
        per proof (see LimbFieldProver._prove_resident for the limb-engine
        twin)."""
        from ..air.proof import OodFrame
        from ..ops import device_coin as dc

        ext = air.ext_field
        n_b = air.context.num_assertions
        lde_size = air.lde_domain_size
        field_coin = coin_kind == "rp64_256"

        dev_cache = trace.device_cache() if hasattr(trace, "device_cache") \
            else {}
        main_dev = dev_cache.get((F64.p, None))
        if main_dev is None:
            native_rows = trace.native_rows() \
                if hasattr(trace, "native_rows") else None
            if native_rows is not None and native_rows.ndim == 2:
                main_dev = jnp.asarray(native_rows)
            else:
                main_dev = gl.to_device(trace.main_segment())
            dev_cache[(F64.p, None)] = main_dev
        tracing.sync(main_dev)
        phases.mark("commit_main_upload")

        boundary = air.get_boundary_constraints(None, list(range(n_b)))
        run, make_consts = self._resident_bundle(air, boundary, coin_kind,
                                                 fri_opts, n_layers)
        consts = make_consts(boundary)
        seed0 = jnp.asarray(dc.seed_to_u64(channel.public_coin.seed)
                            if field_coin
                            else dc.seed_to_words(channel.public_coin.seed))
        (main_lde, m_leaves, m_levels, comp_lde, c_leaves, c_levels,
         main_pair, comp_pair, fri_outs, rem_coeffs, seed_out) = run(
            main_dev, seed0, consts)

        main_tree = self._make_tree(m_leaves, m_levels)
        channel.commitments.raw += main_tree.root  # reseeds ran on device
        comp_tree = self._make_tree(c_leaves, c_levels)
        channel.commitments.raw += comp_tree.root

        def conv(dev):
            res = np.asarray(dev)  # (k, 2, d)
            cur = [tuple(int(x) for x in row[0]) for row in res]
            nxt = [tuple(int(x) for x in row[1]) for row in res]
            return cur, nxt

        trace_cur, trace_nxt = conv(main_pair)
        quot_cur, quot_nxt = conv(comp_pair)
        channel.ood_frame = OodFrame.new(ext, trace_cur, trace_nxt,
                                         quot_cur, quot_nxt)

        fri_layers = []
        for transposed, leaves, levels in fri_outs:
            tree = self._make_tree(leaves, levels)
            channel.commitments.raw += tree.root
            fri_layers.append((tree, transposed))
        channel.public_coin.seed = (dc.u64_to_seed(seed_out) if field_coin
                                    else dc.words_to_seed(seed_out))
        channel.public_coin.counter = 0
        phases.mark("resident_pipeline", lde_domain_size=lde_size)

        return self._finish_proof(air, channel, phases, rem_n, rem_coeffs,
                                  fri_layers, main_tree, main_lde, None,
                                  None, comp_tree, comp_lde)

    def _resident_bundle(self, air, boundary, coin_kind: str, fri_opts,
                         n_layers: int):
        """(jitted run, make_consts) for the resident program, cached per
        proof structure; ``make_consts(boundary)`` packs the per-proof
        runtime arguments so data stays out of the executable."""
        from ..ops import device_coin as dc
        from ..ops import blake3_device as b3

        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        w = air.trace_info.width
        blowup = air.options.blowup_factor
        offset = air.domain_offset
        lde_size = air.lde_domain_size
        ce = air.context.ce_domain_size
        ce_blowup = air.ce_blowup_factor
        part = air.options.partition_options
        num_cols = air.context.num_constraint_composition_columns()
        n_fold = fri_opts.folding_factor
        n_t = air.context.num_transition_constraints
        n_b = air.context.num_assertions
        kind, row_hash_fn, levels_fn, dw = _f64_hasher_entry(self.hasher)
        method_c = _BATCH_NAMES_F64[int(air.options.batching_constraints)]
        method_d = _BATCH_NAMES_F64[int(air.options.batching_deep)]
        psize_main = part.partition_size(w, 1)
        psize_comp = part.partition_size(num_cols, d) * d
        hasher = self.hasher

        ce_fn, ce_consts = self._get_ce_fn(air, boundary)
        key = ("resident", type(air), n, ce, d, lde_size, n_layers, n_fold,
               coin_kind, method_c, method_d, num_cols, w, n_t, n_b,
               psize_main, psize_comp)
        cache = getattr(self, "_resident_cache", None)
        if cache is None:
            cache = self._resident_cache = {}
        if key in cache:
            return cache[key]

        def group_meta(groups):
            meta = []
            for g in groups:
                singles = [c for c in g.constraints if len(c.poly) == 1]
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                meta.append((np.asarray([c.cc for c in singles],
                                        dtype=np.int64),
                             np.asarray([c.cc for c in seqs],
                                        dtype=np.int64)))
            return meta

        main_meta = group_meta(boundary.main_groups)

        merge, draw = dc.coin_bundle(coin_kind, d, "f64")
        one_np = np.zeros((d,), dtype=np.uint64)
        one_np[0] = 1
        draw_k = dc.make_draw_k(draw, gl.ext_mul, one_np)
        g_trace = F64.get_root_of_unity(n.bit_length() - 1)
        h_lde = F64.get_root_of_unity(lde_size.bit_length() - 1)
        logn = n.bit_length() - 1
        deep_acc = self._get_deep_fn(d, lde_size, 0)

        def ood_digest_of(merged):
            flat = merged.reshape(1, -1)  # (1, K*d) canonical u64 elements
            if kind == "field":
                return gl.rp64_hash_rows(flat)[0]
            words, byte_len = b3.rows_from_u64(flat)
            return row_hash_fn(words, byte_len, dw)[0]

        def run(main_dev, seed0, C):
            # 1 -- trace commit (interpolate + LDE + hash + Merkle levels)
            polys, main_lde, m_leaves, m_levels = _commit_pipeline_fused(
                main_dev, C["inv_n"], C["offp_n"], C["fwd_lde"], n, blowup,
                psize_main, hasher, None, True)
            seed = merge(seed0, m_levels[-1][0])
            # 2 -- constraint composition coefficients
            ccs_all, _ = draw_k(seed, n_t + n_b, method_c)
            t_ccs = ccs_all[:n_t]
            b_ccs = ccs_all[n_t:]
            main_packed = []
            for (s_idx, q_idx), (s_vals, q_coeffs) in zip(main_meta,
                                                          C["bvals"]):
                s_ccs = b_ccs[jnp.asarray(s_idx)] if s_idx.size else \
                    jnp.zeros((0, d), dtype=jnp.uint64)
                q_ccs = b_ccs[jnp.asarray(q_idx)] if q_idx.size else \
                    jnp.zeros((0, d), dtype=jnp.uint64)
                main_packed.append((s_ccs, s_vals, q_ccs, q_coeffs))
            # 3 -- constraint evaluation over the CE domain
            stride = blowup // ce_blowup
            main_ce = main_lde[::stride]
            main_ce_next = jnp.roll(main_ce, -ce_blowup, axis=0)
            ce_col = ce_fn(main_ce, main_ce_next, None, None, t_ccs, None,
                           main_packed, [], C["ce_consts"])
            # 4 -- composition commitment
            comp_columns, comp_lde, c_leaves, c_levels = \
                _comp_commit_pipeline_fused(
                    ce_col, C["interp_ce"], C["inv_ce"], C["offp_n"],
                    C["fwd_lde"], ce, n, blowup, num_cols, psize_comp,
                    hasher, None, True)
            seed = merge(seed, c_levels[-1][0])
            # 5 -- OOD point + evaluations + reseed
            z, _ = draw(seed, jnp.uint64(0))
            zg = gl.gl_mul(z, jnp.uint64(g_trace))

            def jumps_of(e):
                js = []
                acc = e
                for _ in range(logn):
                    js.append(acc)
                    acc = gl.ext_mul(acc, acc)
                return jnp.stack(js)

            z_pows = _pow_table_from_jumps(jumps_of(z), n)
            zg_pows = _pow_table_from_jumps(jumps_of(zg), n)
            pows2 = jnp.stack([z_pows, zg_pows], axis=1)  # (n, 2, d)
            main_pair = _eval_cols_pair(polys, pows2)  # (w, 2, d)
            comp_pair = _eval_cols_pair(comp_columns, pows2)
            merged = jnp.concatenate([main_pair[:, 0], comp_pair[:, 0],
                                      main_pair[:, 1], comp_pair[:, 1]])
            seed = merge(seed, ood_digest_of(merged))
            # 6 -- DEEP composition + FRI
            deep_all, _ = draw_k(seed, w + num_cols, method_d)
            all_cur = jnp.concatenate([main_pair[:, 0], comp_pair[:, 0]])
            all_nxt = jnp.concatenate([main_pair[:, 1], comp_pair[:, 1]])
            adj_z = gl.ext_mul(all_cur, deep_all)
            adj_gz = gl.ext_mul(all_nxt, deep_all)
            deep_evals = deep_acc(main_lde, None, comp_lde, deep_all, adj_z,
                                  adj_gz, z[None], zg[None], C["xs"])
            fri_outs, rem, seed = _fri_phase_body_f64(
                deep_evals, seed, C["fri_inv"], merge, draw, hasher, n_fold,
                n_layers, offset)
            return (main_lde, m_leaves, m_levels, comp_lde, c_leaves,
                    c_levels, main_pair, comp_pair, fri_outs, rem, seed)

        run_jit = jax.jit(run)

        def make_consts(boundary_now):
            bvals = []
            for g in boundary_now.main_groups:
                singles = [c for c in g.constraints if len(c.poly) == 1]
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                s_vals = np.zeros((len(singles), 1), dtype=np.uint64)
                for j, c in enumerate(singles):
                    s_vals[j, : len(c.poly[0])] = list(c.poly[0])
                if seqs:
                    L = len(seqs[0].poly)
                    q_coeffs = np.zeros((L, len(seqs), 1), dtype=np.uint64)
                    for j, c in enumerate(seqs):
                        for i, v in enumerate(c.poly):
                            q_coeffs[i, j, : len(v)] = list(v)
                    q_coeffs = jnp.asarray(q_coeffs)
                else:
                    q_coeffs = jnp.zeros((0, 0, 1), dtype=jnp.uint64)
                bvals.append((jnp.asarray(s_vals), q_coeffs))
            return {
                "inv_n": gl.ntt_plan(n, True),
                "offp_n": gl._power_series_dev(offset, n),
                "fwd_lde": gl.ntt_plan(lde_size, False),
                "interp_ce": gl.interp_offset_powers(ce, offset),
                "inv_ce": gl.ntt_plan(ce, True),
                "xs": gl._power_series_dev(h_lde, lde_size, offset),
                "fri_inv": tuple(
                    gl.fri_inv_offset_powers(lde_size // n_fold**i, n_fold,
                                             offset % gl.P)
                    for i in range(n_layers)),
                "ce_consts": ce_consts,
                "bvals": bvals,
            }

        cache[key] = (run_jit, make_consts)
        return cache[key]

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _make_tree(self, leaves, levels_tuple) -> PrehashedMerkleTree:
        levels = {lvl.shape[0]: lvl for lvl in levels_tuple}
        tree = PrehashedMerkleTree(
            _DigestView(leaves),
            _HeapNodesView(levels, leaves.shape[0]),
            self.hasher)
        if leaves.shape[0] <= _TREE_PREFETCH:
            tree.prefetch_async()
        elif leaves.shape[0] <= _FLAT_PREDISPATCH:
            # pre-dispatch the flat-heap concat now so its ~log(m) small
            # programs overlap the remaining prove compute instead of
            # serializing into the query phase. Gated tighter than
            # _HEAP_FLAT_LIMIT: pre-building 2^22-leaf heaps during the
            # commit phases cost the residency margin that OOMed the
            # 2^22-trace proof (r4_fib22.err) — big heaps build lazily at
            # query time instead, after the DEEP/FRI temps are freed.
            tree.nodes._flat_nodes()
        return tree

    @staticmethod
    def _query_start(tree, lde, positions: List[int], batch=None):
        return (tree.prove_batch_start(positions, batch),
                _padded_take_start(lde, positions, batch))

    @staticmethod
    def _query_finish(tree, lde, positions: List[int], start, field: Field,
                      d: int) -> Queries:
        st, rows_tok = start
        _, proof = tree.prove_batch_finish(st)
        rows_np = _padded_take_finish(rows_tok, len(positions), lde.shape[1:])
        rows = []
        for row in rows_np:
            if row.ndim == 1:  # base field row (w,)
                rows.append([(int(v),) for v in row])
            else:  # (w, d)
                rows.append([tuple(int(x) for x in e) for e in row])
        return Queries.new(proof.to_bytes(), rows, field)

    @classmethod
    def _query(cls, tree, lde, positions: List[int], field: Field,
               d: int) -> Queries:
        return cls._query_finish(
            tree, lde, positions, cls._query_start(tree, lde, positions),
            field, d)

    # ------------------------------------------------------------------

    def _evaluate_constraints(self, air, main_lde, aux_lde, aux_rand_elements,
                              ccs):
        """Device mirror of prover/evaluator.py: one jitted program over the
        CE domain. Per-proof values (composition coefficients, aux randomness,
        boundary values, sequence-assertion value polynomials) are traced
        arguments, so repeated proofs of the same AIR shape reuse the
        compiled executable."""
        d = air.ext_field.degree
        blowup = air.options.blowup_factor
        ce_blowup = air.ce_blowup_factor
        stride = blowup // ce_blowup

        main_ce = main_lde[::stride]
        main_ce_next = jnp.roll(main_ce, -ce_blowup, axis=0)
        aux_ce = aux_ce_next = None
        if aux_lde is not None:
            aux_ce = aux_lde[::stride]
            aux_ce_next = jnp.roll(aux_ce, -ce_blowup, axis=0)

        boundary = air.get_boundary_constraints(aux_rand_elements, ccs.boundary)

        # traced per-proof inputs
        t_ccs_arr = jnp.asarray(
            np.array([list(cc) for cc in ccs.transition], dtype=np.uint64))
        aux_rand_arr = None
        if aux_rand_elements is not None:
            aux_rand_arr = jnp.asarray(
                np.array([list(e) for e in aux_rand_elements], dtype=np.uint64))

        def pack_groups(groups, val_d: int):
            """Per group: (single cc array, single value array, sequence cc
            array, sequence coeff array). Value arrays are padded to the
            group's static shape; all are traced per-proof inputs."""
            packed = []
            for g in groups:
                singles = [c for c in g.constraints if len(c.poly) == 1]
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                s_ccs = jnp.asarray(np.array(
                    [list(c.cc) for c in singles], dtype=np.uint64).reshape(
                        len(singles), d))
                s_vals = np.zeros((len(singles), val_d), dtype=np.uint64)
                for j, c in enumerate(singles):
                    s_vals[j, : len(c.poly[0])] = list(c.poly[0])
                q_ccs = jnp.asarray(np.array(
                    [list(c.cc) for c in seqs], dtype=np.uint64).reshape(
                        len(seqs), d))
                if seqs:
                    L = len(seqs[0].poly)
                    q_coeffs = np.zeros((L, len(seqs), val_d), dtype=np.uint64)
                    for j, c in enumerate(seqs):
                        for i, v in enumerate(c.poly):
                            q_coeffs[i, j, : len(v)] = list(v)
                    q_coeffs = jnp.asarray(q_coeffs)
                else:
                    q_coeffs = jnp.zeros((0, 0, val_d), dtype=jnp.uint64)
                packed.append((s_ccs, jnp.asarray(s_vals), q_ccs, q_coeffs))
            return packed

        main_packed = pack_groups(boundary.main_groups, 1)
        aux_packed = pack_groups(boundary.aux_groups, d)

        fn, consts = self._get_ce_fn(air, boundary)
        return fn(main_ce, main_ce_next, aux_ce, aux_ce_next, t_ccs_arr,
                  aux_rand_arr, main_packed, aux_packed, consts)

    def _get_ce_fn(self, air, boundary):
        """Builds (and caches) the jitted CE-domain evaluation program plus
        its device-resident per-structure constant pytree.

        The cache key covers everything the compiled program bakes in:
        the AIR type (whose evaluate_transition code is traced), domain
        geometry, exemption count, per-group (divisor, columns, poly shapes,
        poly offsets), and the periodic column polynomials. AIRs whose
        ``evaluate_transition`` closes over public-input-derived constants
        must expose them via ``device_transition_key()`` so distinct values
        do not share a compiled program."""
        ce = air.context.ce_domain_size
        n = air.trace_length
        offset = air.domain_offset
        ce_blowup = air.ce_blowup_factor
        ext = air.ext_field
        d = ext.degree
        p = gl.P
        n_main = len(air.context.main_degrees)

        def group_key(groups):
            return tuple(
                (tuple(g.divisor.numerator),
                 tuple((c.column, len(c.poly), c.poly_offset)
                       for c in g.constraints))
                for g in groups)

        extra = ()
        if hasattr(air, "device_transition_key"):
            extra = air.device_transition_key()
        periodic_polys = air.get_periodic_column_polys()
        key = (type(air), n, ce, d, air.context.num_transition_exemptions,
               group_key(boundary.main_groups), group_key(boundary.aux_groups),
               tuple(tuple(poly) for poly in periodic_polys), extra)
        cache = getattr(self, "_ce_cache", None)
        if cache is None:
            cache = self._ce_cache = {}
        if key in cache:
            return cache[key]

        # ---- device-resident per-structure constants (passed as ARGS) ----
        from ..math import ntt as host_ntt

        periodic_dev = []
        for poly in periodic_polys:
            c = len(poly)
            coeffs = np.array(poly, dtype=np.uint64)[:, None]
            vals = host_ntt.evaluate_poly_with_offset(
                F64, coeffs.astype(object), pow(offset, n // c, p), ce_blowup)
            arr = jnp.asarray(vals.astype(np.uint64))
            periodic_dev.append(jnp.tile(arr, (ce // arr.shape[0], 1)))

        xs = gl._power_series_dev(F64.get_root_of_unity(ce.bit_length() - 1),
                                  ce, offset)
        divisor = ConstraintDivisor.from_transition(
            F64, n, air.context.num_transition_exemptions)
        # divisor inverses computed once per structure via small jits with xs
        # traced (keeps the pow/inv chains out of XLA's constant folder)
        t_div_inv = _transition_divisor_inv(xs, n, tuple(divisor.exemptions))

        plan_ce = gl.ntt_plan(ce, False)

        def group_consts(groups):
            out = []
            for g in groups:
                div_inv = _boundary_divisor_inv(xs, *g.divisor.numerator[0])
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                if seqs:
                    # per-column scale series (offset·poly_offset)^i for the
                    # batched value-poly NTT (evaluator.py:162-189 on host)
                    scales = jnp.stack(
                        [gl._power_series_dev(offset * c.poly_offset % p, ce)
                         for c in seqs], axis=1)  # (ce, n_seq)
                else:
                    scales = jnp.zeros((ce, 0), dtype=jnp.uint64)
                out.append((div_inv, scales))
            return out

        consts = (t_div_inv, group_consts(boundary.main_groups),
                  group_consts(boundary.aux_groups), periodic_dev, plan_ce)

        main_cols = [
            ([c.column for c in g.constraints if len(c.poly) == 1],
             [c.column for c in g.constraints if len(c.poly) > 1])
            for g in boundary.main_groups]
        aux_cols = [
            ([c.column for c in g.constraints if len(c.poly) == 1],
             [c.column for c in g.constraints if len(c.poly) > 1])
            for g in boundary.aux_groups]

        def run(main_ce, main_ce_next, aux_ce, aux_ce_next, t_ccs,
                aux_rands, main_packed, aux_packed, consts):
            t_div_inv, main_consts, aux_consts, periodic_dev, plan_ce = consts
            base_ops = JaxOps(Field(F64, 1))
            frame = EvaluationFrame(
                [main_ce[:, c : c + 1] for c in range(main_ce.shape[1])],
                [main_ce_next[:, c : c + 1] for c in range(main_ce.shape[1])])
            main_evals = air.evaluate_transition(frame, periodic_dev, base_ops)

            combined = jnp.zeros((ce, d), dtype=jnp.uint64)
            for i, ev in enumerate(main_evals):
                combined = gl.ext_add(
                    combined, gl.gl_mul(ev, t_ccs[i][None, :]))

            if aux_ce is not None:
                ext_ops = JaxOps(ext)
                lift = lambda a: jnp.pad(a, ((0, 0), (0, d - 1)))
                main_frame_ext = EvaluationFrame(
                    [lift(main_ce[:, c : c + 1]) for c in range(main_ce.shape[1])],
                    [lift(main_ce_next[:, c : c + 1])
                     for c in range(main_ce.shape[1])])
                periodic_ext = [lift(pv) for pv in periodic_dev]
                aux_frame = EvaluationFrame(
                    [aux_ce[:, c] for c in range(aux_ce.shape[1])],
                    [aux_ce_next[:, c] for c in range(aux_ce.shape[1])])
                rand_list = [aux_rands[i][None, :]
                             for i in range(aux_rands.shape[0])]
                aux_evals = air.evaluate_aux_transition(
                    main_frame_ext, aux_frame, periodic_ext, rand_list, ext_ops)
                for i, ev in enumerate(aux_evals):
                    combined = gl.ext_add(
                        combined,
                        gl.ext_mul(ev, jnp.broadcast_to(
                            t_ccs[n_main + i][None, :], ev.shape)))

            result = gl.ext_mul_base(combined, t_div_inv)

            def add_groups(cols, group_consts_l, packed, trace, is_ext):
                nonlocal result
                for (s_cols, q_cols), (div_inv, scales), \
                        (s_ccs, s_vals, q_ccs, q_coeffs) in zip(
                            cols, group_consts_l, packed):
                    numer = jnp.zeros((ce, d), dtype=jnp.uint64)
                    for j, col in enumerate(s_cols):
                        if is_ext:
                            diff = gl.ext_sub(
                                trace[:, col],
                                jnp.broadcast_to(s_vals[j][None, :], (ce, d)))
                            numer = gl.ext_add(numer, gl.ext_mul(
                                diff, jnp.broadcast_to(s_ccs[j][None, :],
                                                       diff.shape)))
                        else:
                            diff = gl.gl_sub(trace[:, col], s_vals[j][0])
                            numer = gl.ext_add(
                                numer, gl.gl_mul(diff[:, None], s_ccs[j][None, :]))
                    if q_cols:
                        # batched sequence value polys: zero-pad the (L, k)
                        # coefficient block to the CE size, scale each column
                        # by its (offset·poly_offset)^i series, one NTT
                        L, k, vd = q_coeffs.shape
                        padded = jnp.concatenate(
                            [q_coeffs,
                             jnp.zeros((ce - L, k, vd), dtype=jnp.uint64)],
                            axis=0)
                        scaled = gl.gl_mul(padded, scales[:, :, None])
                        b_vals = gl.ntt_evaluate_body(scaled, plan_ce, ce)
                        for j, col in enumerate(q_cols):
                            if is_ext:
                                diff = gl.ext_sub(trace[:, col], b_vals[:, j])
                                numer = gl.ext_add(numer, gl.ext_mul(
                                    diff, jnp.broadcast_to(q_ccs[j][None, :],
                                                           diff.shape)))
                            else:
                                diff = gl.gl_sub(trace[:, col], b_vals[:, j, 0])
                                numer = gl.ext_add(
                                    numer,
                                    gl.gl_mul(diff[:, None], q_ccs[j][None, :]))
                    result = gl.ext_add(result, gl.ext_mul_base(numer, div_inv))

            add_groups(main_cols, main_consts, main_packed, main_ce, False)
            if aux_ce is not None:
                add_groups(aux_cols, aux_consts, aux_packed, aux_ce, True)
            return result

        fn = jax.jit(run)
        cache[key] = (fn, consts)
        return cache[key]

    # ------------------------------------------------------------------

    def _deep_evaluations(self, air, ext, main_lde, aux_lde, comp_lde, z, zg,
                          trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs):
        """DEEP over the LDE domain: (C_z(x))/(x−z) + (C_gz(x))/(x−z·g).

        All per-proof scalars (z, OOD values, DEEP coefficients) enter as
        traced arrays; the compiled program is reused across proofs."""
        d = ext.degree
        lde_size = main_lde.shape[0]
        offset = air.domain_offset
        h = F64.get_root_of_unity(lde_size.bit_length() - 1)
        xs = gl._power_series_dev(h, lde_size, offset)  # (lde,)

        n_trace = len(trace_cur)
        # adjusted OOD constants: cc_i · T_i(z), cc_i · T_i(z·g)
        all_ccs = list(deep_ccs.trace) + list(deep_ccs.constraints)
        all_cur = trace_cur + quot_cur
        all_nxt = trace_nxt + quot_nxt
        cc_arr = jnp.asarray(np.array([list(c) for c in all_ccs], dtype=np.uint64))
        adj_z = jnp.asarray(np.array(
            [list(ext.mul(v, c)) for v, c in zip(all_cur, all_ccs)],
            dtype=np.uint64))
        adj_gz = jnp.asarray(np.array(
            [list(ext.mul(v, c)) for v, c in zip(all_nxt, all_ccs)],
            dtype=np.uint64))
        z_arr = jnp.asarray(np.array([list(z)], dtype=np.uint64))
        zg_arr = jnp.asarray(np.array([list(zg)], dtype=np.uint64))

        if lde_size >= _FUSE_LIMIT:
            # huge domains: accumulate column by column through small donated
            # programs so only the two running sums + one column's temps are
            # live (the one-program form holds every column's term at once)
            comp_z = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            comp_gz = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            idx = 0
            for c in range(main_lde.shape[1]):
                comp_z, comp_gz = _deep_acc_base(
                    comp_z, comp_gz, main_lde[:, c], cc_arr[idx],
                    adj_z[idx], adj_gz[idx])
                idx += 1
            if aux_lde is not None:
                for c in range(aux_lde.shape[1]):
                    comp_z, comp_gz = _deep_acc_ext(
                        comp_z, comp_gz, aux_lde[:, c], cc_arr[idx],
                        adj_z[idx], adj_gz[idx])
                    idx += 1
            for j in range(comp_lde.shape[1]):
                comp_z, comp_gz = _deep_acc_ext(
                    comp_z, comp_gz, comp_lde[:, j], cc_arr[idx],
                    adj_z[idx], adj_gz[idx])
                idx += 1
            return _deep_combine_slabbed(comp_z, comp_gz, z_arr, zg_arr, xs)

        fn = self._get_deep_fn(d, lde_size,
                               aux_width=0 if aux_lde is None else aux_lde.shape[1])
        return fn(main_lde, aux_lde, comp_lde, cc_arr, adj_z, adj_gz,
                  z_arr, zg_arr, xs)

    def _get_deep_fn(self, d: int, lde_size: int, aux_width: int):
        key = (d, lde_size, aux_width)
        cache = getattr(self, "_deep_cache", None)
        if cache is None:
            cache = self._deep_cache = {}
        if key in cache:
            return cache[key]

        def accumulate(main_lde, aux_lde, comp_lde, cc_arr, adj_z, adj_gz,
                       z_arr, zg_arr, xs):
            comp_z = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            comp_gz = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            idx = 0

            def add_term(term, idx):
                nonlocal comp_z, comp_gz
                comp_z = gl.ext_add(comp_z, gl.ext_sub(
                    term, jnp.broadcast_to(adj_z[idx][None, :], term.shape)))
                comp_gz = gl.ext_add(comp_gz, gl.ext_sub(
                    term, jnp.broadcast_to(adj_gz[idx][None, :], term.shape)))

            for c in range(main_lde.shape[1]):
                add_term(gl.gl_mul(main_lde[:, c : c + 1], cc_arr[idx][None, :]),
                         idx)
                idx += 1
            if aux_lde is not None:
                for c in range(aux_lde.shape[1]):
                    add_term(gl.ext_mul(
                        aux_lde[:, c],
                        jnp.broadcast_to(cc_arr[idx][None, :],
                                         aux_lde[:, c].shape)), idx)
                    idx += 1
            for j in range(comp_lde.shape[1]):
                add_term(gl.ext_mul(
                    comp_lde[:, j],
                    jnp.broadcast_to(cc_arr[idx][None, :],
                                     comp_lde[:, j].shape)), idx)
                idx += 1

            xs_ext = jnp.pad(xs[:, None], ((0, 0), (0, d - 1)))  # x as ext
            den_z = gl.ext_sub(xs_ext, jnp.broadcast_to(z_arr, xs_ext.shape))
            den_gz = gl.ext_sub(xs_ext, jnp.broadcast_to(zg_arr, xs_ext.shape))
            # one inversion instead of two (Montgomery pair trick):
            # 1/a = inv(ab)·b, 1/b = inv(ab)·a
            inv_prod = gl.ext_batch_inv(gl.ext_mul(den_z, den_gz))
            inv_z = gl.ext_mul(inv_prod, den_gz)
            inv_gz = gl.ext_mul(inv_prod, den_z)
            return gl.ext_add(
                gl.ext_mul(comp_z, inv_z),
                gl.ext_mul(comp_gz, inv_gz))

        fn = jax.jit(accumulate)
        cache[key] = fn
        return fn
