"""LimbFieldProver — the device-resident prove() pipeline for limb-engine
fields (f128 and f62), with BLAKE3/SHA3 commitments.

The reference defaults 7 of its 8 examples to the f128 base field with BLAKE3
commitments (examples/src/lib.rs:8-10, 86-93); this prover moves that whole
path onto the accelerator, for any base field whose device engine speaks the
shared limb interface (ops/f128.py, ops/f62.py — 32-bit digits in u64 lanes,
trailing limb axis of ``NUM_LIMBS``):

- trace/aux/composition interpolation + coset LDE: the engine's limb NTT
- row hashing + Merkle layer reduction: vectorized u32-native BLAKE3
  (winterfell_tpu.ops.blake3_device) or SHA3-256
  (winterfell_tpu.ops.sha3_device), PartitionOptions column chunking
  included (row_matrix.rs:184-229)
- constraint evaluation: the AIR's own ``evaluate_transition`` traced with
  :class:`JaxOpsLimb` over the whole CE domain in one jit (sequence boundary
  value polynomials evaluated by one batched in-graph NTT — mirroring
  prover/src/constraints/evaluator/boundary.rs:29-445)
- DEEP composition: pointwise rational C_z(x)/(x−z) + C_gz(x)/(x−z·g) with a
  paired extension inversion — value-identical to the reference's
  coefficient-space synthetic division (prover/src/composer/mod.rs:186-199)
- FRI folding: the engine's ``fri_fold``

Transcript, proof assembly and grinding stay in the host channel; only
digests, OOD scalars and queried rows cross the link. Every domain-sized
constant is device-built and passed as a runtime argument (small
executables). Proof bytes are pinned to the host prover in
tests/test_device_f128_prover.py and tests/test_device_f62_prover.py.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List

import numpy as np

import jax

from ..air.air import EvaluationFrame
from ..air.divisor import ConstraintDivisor
from ..air.proof import FriProof, FriProofLayer, Proof, Queries
from ..crypto.hashers import Blake3_192, Blake3_256, Rp62_248, Sha3_256
from ..fri import FriOptions, fold_positions
from ..math.fields import Field
from ..utils import tracing
from ..ops import blake3_device as b3
from ..ops import f62 as f62_eng
from ..ops import f128 as f128_eng
from ..ops import rp62_device as rp62
from ..ops import sha3_device as s3
from ..ops.jax_ops import JaxOpsF62, JaxOpsF128
from . import Prover
from .channel import ProverChannel
from .device import (
    PrehashedMerkleTree,
    _DigestView,
    _GatherBatch,
    _HeapNodesView,
    _padded_take_finish,
    _padded_take_start,
)

jnp = f128_eng.jnp


def _combine_words(digests, digest_words: int, hash_fn):
    """Default partitioned-commitment combine for byte hashers: merge_many =
    hash over the concatenated chunk-digest bytes (row_matrix.rs:221-228)."""
    joined = jnp.concatenate(digests, axis=1)
    return hash_fn(joined, 4 * joined.shape[1], digest_words)


# hasher -> (row-hash fn, merkle-levels fn, digest words, partition combine,
# fuse_levels); the hash modules share the words-in/words-out interface.
# fuse_levels: the Merkle level reduction may be traced INTO the commit
# programs at small sizes (one dispatch instead of one per level) — cheap
# for the compact BLAKE3/SHA3 compression bodies, gated off for the
# Rescue-based Rp62 whose unrolled merge chain would bloat executables.
_DEVICE_HASHERS = {
    Blake3_256: (b3.blake3_hash_words, b3.merkle_levels_blake3, 8,
                 _combine_words, True),
    Blake3_192: (b3.blake3_hash_words, b3.merkle_levels_blake3, 6,
                 _combine_words, True),
    Sha3_256: (s3.sha3_hash_words, s3.merkle_levels_sha3, 8, _combine_words,
               True),
    Rp62_248: (rp62.rp62_hash_words, rp62.merkle_levels_rp62, 8,
               rp62.rp62_combine, False),
}

# LDE row counts at or below this fuse the whole Merkle level reduction into
# the commit/FRI programs (every level is a couple of compact hash calls;
# the saved per-level dispatches are ~10-30 ms each on the remote tunnel —
# 17 unfused levels cost ~0.4 s at lde 2^18, measured r4 rescue chain-2^12).
# Covers the headline rescue chain 2^14 (trace 2^18 → lde 2^20).
_LEVEL_FUSE = 1 << 20


def _base_sum(eng, arr, axis: int = 0):
    """Tree-structured modular sum along a power-of-two axis (limb arrays)."""
    arr = jnp.moveaxis(arr, axis, 0)
    while arr.shape[0] > 1:
        half = arr.shape[0] // 2
        arr = eng.base_add(arr[:half], arr[half : 2 * half])
    return arr[0]


@partial(jax.jit, static_argnums=(1, 2))
def _pow_table_from_jumps(jumps, n: int, eng):
    """(n, d, L) table of z^k from host-computed jumps z^(2^j)."""
    d = jumps.shape[1]
    one = np.zeros((1, d, eng.NUM_LIMBS), dtype=np.uint64)
    one[0, 0, 0] = 1
    cur = jnp.asarray(one)
    j = 0
    length = 1
    while length < n:
        zl = jumps[j][None]
        cur = jnp.concatenate(
            [cur, eng.ext_mul(cur, jnp.broadcast_to(zl, cur.shape))], axis=0)
        j += 1
        length *= 2
    return cur


def _z_power_table(eng, ext: Field, z: tuple, n: int):
    logn = max((n - 1).bit_length(), 1)
    jumps = np.zeros((logn, ext.degree), dtype=object)
    acc = z
    for j in range(logn):
        jumps[j] = list(acc)
        acc = ext.mul(acc, acc)
    return _pow_table_from_jumps(eng.to_device(jumps), n, eng)


@partial(jax.jit, static_argnums=(2,))
def _eval_cols_base(polys, pows, eng):
    """Σ_k coeff[k]·z^k per base column: polys (n, k, L), pows (n, d, L) →
    (k, d, L)."""
    prod = eng.base_mul(polys[:, :, None, :], pows[:, None, :, :])
    return _base_sum(eng, prod, axis=0)


@partial(jax.jit, static_argnums=(2,))
def _eval_cols_ext(polys, pows, eng):
    """polys (n, k, d, L) ext columns → (k, d, L)."""
    prod = eng.ext_mul(polys, jnp.broadcast_to(pows[:, None], polys.shape))
    return _base_sum(eng, prod, axis=0)


@partial(jax.jit, static_argnums=(2,))
def _ext_add_jit(a, b, eng):
    return eng.ext_add(a, b)


# rows per OOD-evaluation slab: the (slab, k, d, L) product temp a single
# whole-trace program materializes gets lane-padded (narrow trailing dims →
# (8, 128) tiles), which exhausts HBM at 2^20-row traces
_EVAL_SLAB = 1 << 16


@partial(jax.jit, static_argnums=(2,))
def _eval_cols_scan(polys, pows, eng):
    """Slab loop as ONE program (lax.scan): same per-slab peak memory, but a
    2^22-row trace costs 1 dispatch instead of 64 (each remote dispatch is
    ~10-30 ms on the axon tunnel). Slab partials are added in the same
    order as the old Python loop — field addition is exact, so the result
    is bit-identical either way."""
    fn = _eval_cols_base if polys.ndim == 3 else _eval_cols_ext
    n = polys.shape[0]
    B = n // _EVAL_SLAB
    pb = polys.reshape((B, _EVAL_SLAB) + polys.shape[1:])
    wb = pows.reshape((B, _EVAL_SLAB) + pows.shape[1:])

    def body(acc, xs):
        pslab, wslab = xs
        return eng.ext_add(acc, fn(pslab, wslab, eng)), None

    k = polys.shape[1]
    d = pows.shape[1]
    acc0 = jnp.zeros((k, d, eng.NUM_LIMBS), dtype=jnp.uint64)
    acc, _ = jax.lax.scan(body, acc0, (pb, wb))
    return acc


def _eval_cols_at(polys, pows, eng):
    """OOD evaluation, slabbed for memory (see _EVAL_SLAB)."""
    n = polys.shape[0]
    if n % _EVAL_SLAB or n == _EVAL_SLAB:
        fn = _eval_cols_base if polys.ndim == 3 else _eval_cols_ext
        acc = None
        for i in range(0, n, _EVAL_SLAB):
            part = fn(polys[i : i + _EVAL_SLAB], pows[i : i + _EVAL_SLAB],
                      eng)
            acc = part if acc is None else _ext_add_jit(acc, part, eng)
        return acc
    return _eval_cols_scan(polys, pows, eng)


@partial(jax.jit, static_argnums=(2,))
def _eval_cols_pair(polys, pows2, eng):
    """Evaluate every column at BOTH OOD points in one program:
    pows2 (n, 2, d, L) stacks the z and z·g power tables; result
    (k, 2, d, L). Halves the OOD dispatches and device→host pulls."""
    if polys.ndim == 3:  # base columns (n, k, L)
        prod = eng.base_mul(polys[:, :, None, None, :],
                            pows2[:, None, :, :, :])
    else:  # ext columns (n, k, d, L)
        prod = eng.ext_mul(
            polys[:, :, None, :, :],
            jnp.broadcast_to(pows2[:, None],
                             polys.shape[:2] + pows2.shape[1:]))
    return _base_sum(eng, prod, axis=0)


@partial(jax.jit, static_argnums=(2,))
def _eval_cols_pair_scan(polys, pows2, eng):
    n = polys.shape[0]
    B = n // _EVAL_SLAB
    pb = polys.reshape((B, _EVAL_SLAB) + polys.shape[1:])
    wb = pows2.reshape((B, _EVAL_SLAB) + pows2.shape[1:])

    def body(acc, xs):
        pslab, wslab = xs
        return eng.ext_add(acc, _eval_cols_pair(pslab, wslab, eng)), None

    k = polys.shape[1]
    d = pows2.shape[2]
    acc0 = jnp.zeros((k, 2, d, eng.NUM_LIMBS), dtype=jnp.uint64)
    acc, _ = jax.lax.scan(body, acc0, (pb, wb))
    return acc


def _eval_cols_pair_at(polys, pows2, eng):
    n = polys.shape[0]
    if n % _EVAL_SLAB or n == _EVAL_SLAB:
        acc = None
        for i in range(0, n, _EVAL_SLAB):
            part = _eval_cols_pair(polys[i : i + _EVAL_SLAB],
                                   pows2[i : i + _EVAL_SLAB], eng)
            acc = part if acc is None else _ext_add_jit(acc, part, eng)
        return acc
    return _eval_cols_pair_scan(polys, pows2, eng)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _transition_divisor_inv(xs, n: int, exemptions: tuple, eng):
    """1/(x^n − 1) · Π(x − e) over the CE domain (xs traced — no folding)."""
    one = np.zeros((1, eng.NUM_LIMBS), dtype=np.uint64)
    one[0, 0] = 1
    num = eng.base_sub(eng.base_pow_const(xs, n),
                       jnp.broadcast_to(jnp.asarray(one), xs.shape))
    inv_num = eng.base_inv(num)
    exempt = jnp.broadcast_to(jnp.asarray(one), xs.shape)
    for e in exemptions:
        exempt = eng.base_mul(
            exempt, eng.base_sub(xs, jnp.broadcast_to(eng.scalar(e), xs.shape)))
    return eng.base_mul(inv_num, exempt)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _boundary_divisor_inv(xs, a: int, b0: int, eng):
    return eng.base_inv(
        eng.base_sub(eng.base_pow_const(xs, a),
                     jnp.broadcast_to(eng.scalar(b0), xs.shape)))


# ================================================================================
# Commit pipelines
# ================================================================================


def _hash_rows_words(words_2d, byte_len: int, psize_elems: int,
                     digest_words: int, hash_fn, wpe: int,
                     combine=_combine_words):
    """Partitioned row hashing over word-layout rows: chunks of psize_elems
    base elements (wpe u32 words each) hashed separately, chunk digests
    combined with merge_many — identical bytes to the host row hashing
    (row_matrix.rs:184-229)."""
    W = words_2d.shape[1]
    pw = psize_elems * wpe
    if pw >= W:
        return hash_fn(words_2d, byte_len, digest_words)
    digests = []
    for i in range(0, W, pw):
        chunk = words_2d[:, i : i + pw]
        digests.append(hash_fn(chunk, 4 * chunk.shape[1], digest_words))
    return combine(digests, digest_words, hash_fn)


# above this LDE size run interpolate/LDE/hash as separate programs (frees
# NTT intermediates between steps — the limb layout doubles f64's footprint)
_FUSE_LIMIT = 1 << 22


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _commit_pipeline_fused(matrix, inv_plan, off_pows, fwd_plan, n: int,
                           blowup: int, psize: int, digest_words: int,
                           hash_fn, eng, combine, levels_fn=None):
    polys = eng.ntt_interpolate_body(matrix, inv_plan, n)
    lde = eng.ntt_lde_body(polys, off_pows, fwd_plan, n, blowup)
    m = lde.shape[0]
    words = lde.astype(jnp.uint32).reshape(m, -1)
    byte_len = 4 * words.shape[1]
    leaves = _hash_rows_words(words, byte_len, psize, digest_words, hash_fn,
                              eng.NUM_LIMBS, combine)
    levels = levels_fn(leaves) if levels_fn is not None else None
    return polys, lde, leaves, levels


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _hash_rows_split(words_2d, psize: int, digest_words: int, hash_fn,
                     wpe: int, combine):
    return _hash_rows_words(words_2d, 4 * words_2d.shape[1], psize,
                            digest_words, hash_fn, wpe, combine)


_HASH_SLAB = 1 << 21


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _hash_lde_rows_scan(lde, psize: int, digest_words: int, hash_fn,
                        wpe: int, combine):
    """Slab row-hashing as ONE scanned program (one remote dispatch)."""
    m = lde.shape[0]
    blocks = lde.reshape((m // _HASH_SLAB, _HASH_SLAB) + lde.shape[1:])

    def body(_, slab):
        words = slab.astype(jnp.uint32).reshape(_HASH_SLAB, -1)
        return None, _hash_rows_words(words, 4 * words.shape[1], psize,
                                      digest_words, hash_fn, wpe, combine)

    _, parts = jax.lax.scan(body, None, blocks)
    return parts.reshape(m, -1)


def _hash_lde_rows(lde, psize: int, digest_words: int, hash_fn, wpe: int,
                   combine=_combine_words):
    m = lde.shape[0]
    if m <= _HASH_SLAB:
        return _hash_rows_split(lde.astype(jnp.uint32).reshape(m, -1),
                                psize, digest_words, hash_fn, wpe, combine)
    if m % _HASH_SLAB == 0:
        return _hash_lde_rows_scan(lde, psize, digest_words, hash_fn, wpe,
                                   combine)
    parts = [
        _hash_rows_split(
            lde[i : i + _HASH_SLAB].astype(jnp.uint32).reshape(_HASH_SLAB, -1),
            psize, digest_words, hash_fn, wpe, combine)
        for i in range(0, m, _HASH_SLAB)]
    return jnp.concatenate(parts, axis=0)


def _lde_per_column(polys, n: int, offset: int, blowup: int, eng):
    """Huge-domain LDE one column at a time: the limb-engine NTT butterfly
    materializes ~16 full-size partial-product temporaries per mul, so a
    whole-matrix 2^22-point f128 NTT alone wants several GB of HLO temps.
    Per-column runs shrink them by the width (and share one compiled
    program across columns)."""
    w = polys.shape[1]
    if w == 1:
        return eng.ntt_evaluate_with_offset(polys, n, offset, blowup)
    parts = [
        eng.ntt_evaluate_with_offset(polys[:, c : c + 1], n, offset, blowup)
        for c in range(w)]
    return jnp.concatenate(parts, axis=1)


def _commit_pipeline(matrix, n: int, offset: int, blowup: int, psize: int,
                     digest_words: int, hash_fn, eng,
                     combine=_combine_words, levels_fn=None):
    inv_plan = eng.ntt_plan(n, True)
    fwd_plan = eng.ntt_plan(n * blowup, False)
    off_pows = eng._power_series_dev(offset, n)
    if n * blowup < _FUSE_LIMIT:
        fuse_lv = levels_fn if n * blowup <= _LEVEL_FUSE else None
        return _commit_pipeline_fused(matrix, inv_plan, off_pows, fwd_plan,
                                      n, blowup, psize, digest_words, hash_fn,
                                      eng, combine, fuse_lv)
    polys = eng.ntt_interpolate(matrix, n)
    lde = _lde_per_column(polys, n, offset, blowup, eng)
    leaves = _hash_lde_rows(lde, psize, digest_words, hash_fn, eng.NUM_LIMBS,
                            combine)
    return polys, lde, leaves, None


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def _comp_commit_pipeline_fused(ce_column, interp_pows, inv_plan, off_pows,
                                fwd_plan, ce: int, n: int, blowup: int,
                                num_cols: int, psize: int, digest_words: int,
                                hash_fn, eng, combine, levels_fn=None):
    """iFFT the CE column, segment trace-length coefficient chunks
    (composition_poly.rs:55-85), LDE + hash — one program."""
    coeffs = eng.ntt_interp_offset_body(ce_column, interp_pows, inv_plan, ce)
    d = ce_column.shape[-2]
    comp_columns = jnp.swapaxes(
        coeffs[: num_cols * n].reshape(num_cols, n, d, eng.NUM_LIMBS), 0, 1)
    lde = eng.ntt_lde_body(comp_columns, off_pows, fwd_plan, n, blowup)
    m = lde.shape[0]
    words = lde.astype(jnp.uint32).reshape(m, -1)
    leaves = _hash_rows_words(words, 4 * words.shape[1], psize, digest_words,
                              hash_fn, eng.NUM_LIMBS, combine)
    levels = levels_fn(leaves) if levels_fn is not None else None
    return comp_columns, lde, leaves, levels


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _comp_segment(ce_column, interp_pows, inv_plan, ce: int, num_cols: int,
                  n: int, eng):
    coeffs = eng.ntt_interp_offset_body(ce_column, interp_pows, inv_plan, ce)
    d = ce_column.shape[-2]
    return jnp.swapaxes(
        coeffs[: num_cols * n].reshape(num_cols, n, d, eng.NUM_LIMBS), 0, 1)


def _comp_commit_pipeline(ce_column, ce: int, n: int, offset: int, blowup: int,
                          num_cols: int, psize: int, digest_words: int,
                          hash_fn, eng, combine=_combine_words,
                          levels_fn=None):
    interp_pows = eng.interp_offset_powers(ce, offset)
    inv_plan = eng.ntt_plan(ce, True)
    if n * blowup < _FUSE_LIMIT:
        fuse_lv = levels_fn if n * blowup <= _LEVEL_FUSE else None
        return _comp_commit_pipeline_fused(
            ce_column, interp_pows, inv_plan, eng._power_series_dev(offset, n),
            eng.ntt_plan(n * blowup, False), ce, n, blowup, num_cols, psize,
            digest_words, hash_fn, eng, combine, fuse_lv)
    comp_columns = _comp_segment(ce_column, interp_pows, inv_plan, ce,
                                 num_cols, n, eng)
    lde = _lde_per_column(comp_columns, n, offset, blowup, eng)
    leaves = _hash_lde_rows(lde, psize, digest_words, hash_fn, eng.NUM_LIMBS,
                            combine)
    return comp_columns, lde, leaves, None


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _fri_layer_commit(evaluations, n_fold: int, digest_words: int, hash_fn,
                      eng, levels_fn=None):
    """Transpose a FRI layer into N-value rows, hash, ready for the Merkle
    reduce (fri/src/prover/mod.rs:202-222). With ``levels_fn`` the whole
    Merkle level reduction is traced into the same program."""
    n, d = evaluations.shape[0], evaluations.shape[1]
    rows = n // n_fold
    transposed = jnp.swapaxes(
        evaluations.reshape(n_fold, rows, d, eng.NUM_LIMBS), 0, 1)
    words = transposed.astype(jnp.uint32).reshape(rows, -1)
    leaves = hash_fn(words, 4 * words.shape[1], digest_words)
    levels = levels_fn(leaves) if levels_fn is not None else None
    return transposed, leaves, levels


# Fused FRI commit phase: with the Fiat-Shamir coin resident on device
# (ops/device_coin.py) the whole build_layers loop — transpose, hash,
# Merkle-reduce, reseed, draw alpha, fold, per layer, plus the remainder
# interpolation (fri/src/prover/mod.rs:179-239) — runs as ONE program,
# replacing ~3 host round trips per layer with a single dispatch.
_FRI_COIN_KINDS = {Blake3_256: "blake3_256", Blake3_192: "blake3_192",
                   Sha3_256: "sha3_256", Rp62_248: "rp62_248"}
_FRI_FUSE_LIMIT = 1 << 22  # whole-phase resident set; fall back above
# WINTER_FUSED_FRI=0 forces the per-layer host-coin path (A/B harness)
_FUSED_FRI_ON = __import__("os").environ.get(
    "WINTER_FUSED_FRI", "1") not in ("", "0")
# WINTER_RESIDENT=0 disables the whole-proof resident program (A/B harness)
_RESIDENT_ON = __import__("os").environ.get(
    "WINTER_RESIDENT", "1") not in ("", "0")
# BatchingMethod -> device draw mode (air/src/options.rs:479-505)
_BATCH_NAMES = {0: "linear", 1: "algebraic", 2: "horner"}


def _limb_eng_name(eng) -> str:
    return "f128" if eng.NUM_LIMBS == 4 else "f62"


def _fri_phase_body(deep_evals, seed, inv_pows, merge, draw, eng, hash_fn,
                    levels_fn, dw: int, n_fold: int, n_layers: int,
                    offset: int):
    """Traced FRI commit phase with the coin in-graph: shared by the
    standalone fused-FRI program and the whole-proof resident program."""
    evaluations = deep_evals
    outs = []
    for i in range(n_layers):
        transposed, leaves, levels = _fri_layer_commit(
            evaluations, n_fold, dw, hash_fn, eng, levels_fn)
        seed = merge(seed, levels[-1][0])
        alpha, _ = draw(seed, jnp.uint64(0))
        evaluations = eng.fri_fold_body(
            evaluations, inv_pows[i], alpha, n_fold)
        outs.append((transposed, leaves, levels))
    rem = eng.ntt_interpolate_with_offset(
        evaluations, evaluations.shape[0], offset)
    return tuple(outs), rem, seed


@lru_cache(maxsize=None)
def _fused_fri_fn(eng, hash_fn, levels_fn, dw: int, coin_kind: str, d: int,
                  n_fold: int, n_layers: int, offset: int):
    from ..ops import device_coin as dc

    merge, draw = dc.coin_bundle(coin_kind, d, _limb_eng_name(eng))

    def run(deep_evals, seed_w, inv_pows):
        return _fri_phase_body(deep_evals, seed_w, inv_pows, merge, draw,
                               eng, hash_fn, levels_fn, dw, n_fold, n_layers,
                               offset)

    return jax.jit(run)


# above this LDE size the DEEP composition runs as a whole-array numerator
# accumulation + row-slabbed inversion/combine programs (see _deep_evaluations)
_DEEP_SLAB_LIMB = 1 << 21

# CE programs whose pointwise working set exceeds _CE_SLAB_BUDGET limb-words
# compile as a lax.scan over row slabs of _CE_SLAB_ROWS: wide AIRs (lamport's
# 22 columns over a multi-million-point CE domain) otherwise hold hundreds of
# domain-sized temporaries live at once, which OOM-killed the remote compile
# helper (.tpu_logs/r4_lamport256.err). The scan body compiles ONCE at slab
# shapes; sequence-boundary value-poly NTTs stay whole-domain outside the
# scan. Results are bit-identical (exact integer field arithmetic).
_CE_SLAB_ROWS = int(
    __import__("os").environ.get("WINTER_CE_SLAB", str(1 << 15)))
_CE_SLAB_BUDGET = int(
    __import__("os").environ.get("WINTER_CE_BUDGET", str(1 << 26)))


@partial(jax.jit, static_argnums=(5,))
def _deep_combine_limb_scan(comp_z, comp_gz, z_arr, zg_arr, xs, eng):
    """Huge-domain DEEP combine as ONE scanned program over _DEEP_SLAB_LIMB
    row slabs (same peak memory as the per-slab dispatch loop, one remote
    dispatch)."""
    n = comp_z.shape[0]
    B = n // _DEEP_SLAB_LIMB
    shp = lambda a: a.reshape((B, _DEEP_SLAB_LIMB) + a.shape[1:])

    def body(_, slabs):
        cz, cgz, x = slabs
        return None, _deep_combine_limb(cz, cgz, z_arr, zg_arr, x, eng)

    _, parts = jax.lax.scan(body, None, (shp(comp_z), shp(comp_gz), shp(xs)))
    return parts.reshape((n,) + parts.shape[2:])


@partial(jax.jit, static_argnums=(5,))
def _deep_combine_limb(comp_z, comp_gz, z_arr, zg_arr, xs, eng):
    """Per-slab DEEP divide-and-combine: (num - adj)/(x - z) terms with one
    paired inversion (prover/src/composer/mod.rs DEEP combine)."""
    d = comp_z.shape[1]
    xs_ext = jnp.pad(xs[:, None, :], ((0, 0), (0, d - 1), (0, 0)))
    den_z = eng.ext_sub(xs_ext, jnp.broadcast_to(z_arr, xs_ext.shape))
    den_gz = eng.ext_sub(xs_ext, jnp.broadcast_to(zg_arr, xs_ext.shape))
    inv_prod = eng.ext_batch_inv(eng.ext_mul(den_z, den_gz))
    inv_z = eng.ext_mul(inv_prod, den_gz)
    inv_gz = eng.ext_mul(inv_prod, den_z)
    return eng.ext_add(
        eng.ext_mul(comp_z, inv_z),
        eng.ext_mul(comp_gz, inv_gz))


# ================================================================================
# The prover
# ================================================================================


class LimbFieldProver(Prover):
    """Drop-in Prover for limb-engine fields with BLAKE3/SHA3 commitments.
    Wrap an existing host prover class via ``accelerate`` on a concrete
    subclass (:class:`F128Prover`, :class:`F62Prover`)."""

    engine = None  # limb engine module (ops/f128.py | ops/f62.py)
    jax_ops_cls = None  # matching JaxOpsLimb subclass

    @classmethod
    def accelerate(cls, prover_cls):
        return type(f"{cls.__name__[:-6]}{prover_cls.__name__}",
                    (cls, prover_cls), {})

    def prove(self, trace) -> Proof:
        eng = type(self).engine
        pub_inputs = self.get_pub_inputs(trace)
        air = self.air_class(trace.info(), pub_inputs, self.options)
        assert air.base.p == eng.P, (
            f"{type(self).__name__} requires the {air.base.name} base field")
        assert self.hasher in _DEVICE_HASHERS, (
            f"{type(self).__name__} requires a BLAKE3, SHA3 or Rp62_248 "
            "hasher (device row hashing)")
        assert self.hasher is not Rp62_248 or eng is f62_eng, (
            "Rp62_248 hashes f62 elements — pair it with F62Prover")
        hash_fn, self._levels_fn, dw, combine, fuse_levels = \
            _DEVICE_HASHERS[self.hasher]
        channel = ProverChannel(air, air.pub_inputs_to_elements(), self.hasher)
        phases = tracing.Phases(f"device_prove_{air.base.name}")

        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        blowup = air.options.blowup_factor
        offset = air.domain_offset
        lde_size = air.lde_domain_size
        ce = air.context.ce_domain_size
        part = air.options.partition_options

        fri_opts = FriOptions(blowup, air.options.fri_folding_factor,
                              air.options.fri_remainder_max_degree)
        n_layers = fri_opts.num_fri_layers(lde_size)
        rem_n = lde_size // fri_opts.folding_factor**n_layers
        coin_kind = _FRI_COIN_KINDS.get(self.hasher)
        num_cols = air.context.num_constraint_composition_columns()
        ood_bytes = (2 * (air.trace_info.width + num_cols)
                     * d * eng.NUM_LIMBS * 4)
        if (_RESIDENT_ON and coin_kind is not None
                and not air.trace_info.is_multi_segment
                and n_layers > 0 and rem_n >= 2
                and lde_size <= _LEVEL_FUSE and lde_size < _FUSE_LIMIT
                and ood_bytes <= 1024):
            return self._prove_resident(air, trace, channel, phases,
                                        coin_kind, fri_opts, n_layers, rem_n)

        # 1 ----- trace commitment ------------------------------------------
        main_dev = self._upload_trace(trace)
        phases.mark("commit_main_upload")
        w = main_dev.shape[1]
        lv_fn = self._levels_fn if fuse_levels else None
        main_polys, main_lde, leaves, levels = _commit_pipeline(
            main_dev, n, offset, blowup, part.partition_size(w, 1), dw,
            hash_fn, eng, combine, lv_fn)
        tracing.sync(leaves)
        phases.mark("commit_main_lde_hash")
        main_tree = self._make_tree(leaves, levels)
        channel.commit_trace(main_tree.root)
        phases.mark("commit_to_main_trace_segment", lde_domain_size=lde_size)

        aux_polys = aux_lde = aux_tree = aux_rand_elements = None
        if air.trace_info.is_multi_segment:
            aux_rand_elements = air.get_aux_rand_elements(channel.public_coin)
            aux_obj = self.build_aux_trace(trace, aux_rand_elements)
            aux_dev = eng.to_device(aux_obj)  # (n, w_aux, d, L)
            w_aux = aux_dev.shape[1]
            aux_polys, aux_lde, leaves, levels = _commit_pipeline(
                aux_dev, n, offset, blowup,
                part.partition_size(w_aux, d) * d, dw, hash_fn, eng, combine,
                lv_fn)
            aux_tree = self._make_tree(leaves, levels)
            channel.commit_trace(aux_tree.root)

        # 2 ----- constraint evaluation -------------------------------------
        ccs = channel.get_constraint_composition_coeffs()
        ce_column = self._evaluate_constraints(
            air, main_lde, aux_lde, aux_rand_elements, ccs)  # (ce, d, L)
        tracing.sync(ce_column)
        phases.mark("evaluate_constraints", ce_domain_size=ce)

        # 3 ----- composition commitment ------------------------------------
        num_cols = air.context.num_constraint_composition_columns()
        comp_columns, comp_lde, leaves, levels = _comp_commit_pipeline(
            ce_column, ce, n, offset, blowup, num_cols,
            part.partition_size(num_cols, d) * d, dw, hash_fn, eng, combine,
            lv_fn)
        comp_tree = self._make_tree(leaves, levels)
        channel.commit_constraints(comp_tree.root)
        phases.mark("commit_to_constraint_evaluations")

        # 4 ----- OOD evaluations + DEEP ------------------------------------
        z = channel.get_ood_point()
        g_trace = air.base.get_root_of_unity(n.bit_length() - 1)
        zg = ext.mul_base(z, g_trace)
        z_pows = _z_power_table(eng, ext, z, n)
        zg_pows = _z_power_table(eng, ext, zg, n)
        pows2 = jnp.stack([z_pows, zg_pows], axis=1)  # (n, 2, d, L)

        # ONE program + ONE pull per matrix evaluates both OOD points
        # (z and z·g stacked); dispatch all before converting any so the
        # device→host pulls overlap the remaining evaluations' compute
        def eval_cols_conv(dev):
            res = eng.to_host(dev)  # (k, 2, d) object array
            cur = [tuple(int(x) for x in row[0]) for row in res]
            nxt = [tuple(int(x) for x in row[1]) for row in res]
            return cur, nxt

        started = [_eval_cols_pair_at(main_polys, pows2, eng)]
        if aux_polys is not None:
            started.append(_eval_cols_pair_at(aux_polys, pows2, eng))
        started.append(_eval_cols_pair_at(comp_columns, pows2, eng))
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
            trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs)  # (lde, d, L)
        tracing.sync(deep_evaluations)
        phases.mark("build_deep_composition_poly")

        # 6 ----- FRI layers -------------------------------------------------
        fri_options = FriOptions(
            blowup, air.options.fri_folding_factor,
            air.options.fri_remainder_max_degree)
        n_fold = fri_options.folding_factor
        fri_layers = []
        n_layers = fri_options.num_fri_layers(lde_size)
        rem_n = lde_size // n_fold**n_layers
        coin_kind = _FRI_COIN_KINDS.get(self.hasher)
        if (_FUSED_FRI_ON and n_layers > 0 and coin_kind is not None
                and rem_n >= 2 and lde_size <= _FRI_FUSE_LIMIT):
            # whole FRI commit phase (+ remainder interpolation) as ONE
            # program: the coin lives on device (ops/device_coin.py)
            from ..ops import device_coin as dc

            fn = _fused_fri_fn(eng, hash_fn, self._levels_fn, dw, coin_kind,
                               d, n_fold, n_layers, offset)
            inv_pows = tuple(
                eng.fri_inv_offset_powers(lde_size // n_fold**i, n_fold,
                                          offset % eng.P)
                for i in range(n_layers))
            seed_w = jnp.asarray(
                dc.seed_to_state(coin_kind, channel.public_coin.seed))
            outs, rem_coeffs, seed_out = fn(deep_evaluations, seed_w,
                                            inv_pows)
            for transposed, leaves, levels in outs:
                tree = self._make_tree(leaves, levels)
                channel.commitments.raw += tree.root  # reseed ran on device
                fri_layers.append((tree, transposed))
            channel.public_coin.seed = dc.state_to_seed(coin_kind, seed_out)
            channel.public_coin.counter = 0
        else:
            evaluations = deep_evaluations
            for _ in range(n_layers):
                rows = evaluations.shape[0] // n_fold
                fl = lv_fn if (lv_fn is not None and rows <= _LEVEL_FUSE
                               and rows > 1) else None
                transposed, leaves, levels = _fri_layer_commit(
                    evaluations, n_fold, dw, hash_fn, eng, fl)
                tree = self._make_tree(leaves, levels)
                channel.commit_fri_layer(tree.root)
                alpha = channel.draw_fri_alpha()
                evaluations = eng.fri_fold(
                    evaluations, n_fold, offset,
                    eng.to_device(np.array(list(alpha), dtype=object)))
                fri_layers.append((tree, transposed))
            rem_coeffs = eng.ntt_interpolate_with_offset(evaluations, rem_n,
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
        eng = type(self).engine
        ext = air.ext_field
        d = ext.degree
        blowup = air.options.blowup_factor
        lde_size = air.lde_domain_size
        n_fold = air.options.fri_folding_factor

        keep = rem_n // blowup
        rem_host = eng.to_host(rem_coeffs[:keep])[::-1]
        remainder_poly = [tuple(int(x) for x in row) for row in rem_host]
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
        base_field = Field(air.base, 1)
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
            rows_obj = eng.from_limbs_np(_padded_take_finish(
                rows_tok, len(positions), transposed.shape[1:]))
            query_values = [
                [tuple(int(x) for x in row[j]) for j in range(n_fold)]
                for row in rows_obj
            ]
            proof_layers.append(
                FriProofLayer.new(ext, query_values, batch_proof.to_bytes()))
        fri_proof = FriProof.new(ext, proof_layers, remainder_poly, 1)
        phases.mark("queries_fri_layers")

        queries = [
            self._query_finish(tree, lde, query_positions, st, field, dd)
            for tree, lde, field, dd, st in q_starts]
        trace_queries = queries[:-1]
        constraint_queries = queries[-1]
        phases.mark("queries_trace_and_constraints")

        proof = channel.build_proof(
            trace_queries, constraint_queries, fri_proof, len(query_positions))
        phases.mark("build_proof_object")
        return proof

    # ------------------------------------------------------------------
    # whole-proof resident pipeline
    # ------------------------------------------------------------------

    def _prove_resident(self, air, trace, channel, phases, coin_kind: str,
                        fri_opts, n_layers: int, rem_n: int) -> Proof:
        """Steps 1-6 (trace commit, coefficient draws, constraint
        evaluation, composition commit, OOD, DEEP, every FRI layer) as ONE
        XLA program with the Fiat-Shamir coin in-graph (ops/device_coin.py).
        The host sees only the trace upload, the program's outputs (trees,
        OOD values, remainder, final seed), the grinding scan, and the
        batched query gather — two device dispatches per proof. Single
        main-segment AIRs only; proof bytes are pinned to the host prover
        by the same tests as the phased path."""
        from ..air.proof import OodFrame
        from ..ops import device_coin as dc

        eng = type(self).engine
        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        w = air.trace_info.width
        n_b = air.context.num_assertions
        lde_size = air.lde_domain_size

        main_dev = self._upload_trace(trace)
        phases.mark("commit_main_upload")

        # per-proof boundary VALUES (public-input-derived); the ccs slots
        # carry draw-order indices — the actual coefficients are drawn on
        # device and gathered by these indices inside the program
        boundary = air.get_boundary_constraints(None, list(range(n_b)))
        run, make_consts = self._resident_bundle(air, boundary, coin_kind,
                                                 fri_opts, n_layers)
        consts = make_consts(boundary)
        seed_w = jnp.asarray(
            dc.seed_to_state(coin_kind, channel.public_coin.seed))
        (main_lde, m_leaves, m_levels, comp_lde, c_leaves, c_levels,
         main_pair, comp_pair, fri_outs, rem_coeffs, seed_out) = run(
            main_dev, seed_w, consts)

        m_tree = self._make_tree(m_leaves, m_levels)
        channel.commitments.raw += m_tree.root  # reseeds ran on device
        c_tree = self._make_tree(c_leaves, c_levels)
        channel.commitments.raw += c_tree.root

        def conv(dev):
            res = eng.to_host(dev)  # (k, 2, d) object array
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
        channel.public_coin.seed = dc.state_to_seed(coin_kind, seed_out)
        channel.public_coin.counter = 0
        phases.mark("resident_pipeline", lde_domain_size=lde_size)

        return self._finish_proof(air, channel, phases, rem_n, rem_coeffs,
                                  fri_layers, m_tree, main_lde, None, None,
                                  c_tree, comp_lde)

    def _resident_bundle(self, air, boundary, coin_kind: str, fri_opts,
                         n_layers: int):
        """(jitted run, make_consts) for the resident program, cached per
        proof structure. ``make_consts(boundary)`` packs the per-proof
        runtime arguments (NTT plans/power series, CE constants, boundary
        assertion values) — data stays out of the executable."""
        from ..ops import device_coin as dc

        eng = type(self).engine
        NL = eng.NUM_LIMBS
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
        hash_fn, levels_fn, dw, combine, _fl = _DEVICE_HASHERS[self.hasher]
        method_c = _BATCH_NAMES[int(air.options.batching_constraints)]
        method_d = _BATCH_NAMES[int(air.options.batching_deep)]
        psize_main = part.partition_size(w, 1)
        psize_comp = part.partition_size(num_cols, d) * d

        ce_fn, ce_consts = self._get_ce_fn(air, boundary)
        key = ("resident", type(air), n, ce, d, lde_size, n_layers, n_fold,
               coin_kind, method_c, method_d, num_cols, w, n_t, n_b,
               psize_main, psize_comp)
        cache = getattr(self, "_resident_cache", None)
        if cache is None:
            cache = self._resident_cache = {}
        if key in cache:
            return cache[key]

        # draw-order index maps per boundary group (structure-static)
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

        merge, draw = dc.coin_bundle(coin_kind, d, _limb_eng_name(eng))
        one_np = np.zeros((d, NL), dtype=np.uint64)
        one_np[0, 0] = 1
        draw_k = dc.make_draw_k(draw, eng.ext_mul, one_np)
        g_trace = air.base.get_root_of_unity(n.bit_length() - 1)
        g_elem_np = np.zeros((d, NL), dtype=np.uint64)
        g_elem_np[0] = np.asarray(eng._int_to_limbs(g_trace))
        h_lde = air.base.get_root_of_unity(lde_size.bit_length() - 1)
        logn = n.bit_length() - 1
        deep_acc = self._get_deep_fn(d, lde_size, 0)

        def run(main_dev, seed_w, C):
            # 1 -- trace commit (interpolate + LDE + hash + Merkle levels)
            polys, main_lde, m_leaves, m_levels = _commit_pipeline_fused(
                main_dev, C["inv_n"], C["offp_n"], C["fwd_lde"], n, blowup,
                psize_main, dw, hash_fn, eng, combine, levels_fn)
            seed = merge(seed_w, m_levels[-1][0])
            # 2 -- constraint composition coefficients
            ccs_all, _ = draw_k(seed, n_t + n_b, method_c)
            t_ccs = ccs_all[:n_t]
            b_ccs = ccs_all[n_t:]
            main_packed = []
            for (s_idx, q_idx), (s_vals, q_coeffs) in zip(main_meta,
                                                          C["bvals"]):
                s_ccs = b_ccs[jnp.asarray(s_idx)] if s_idx.size else \
                    jnp.zeros((0, d, NL), dtype=jnp.uint64)
                q_ccs = b_ccs[jnp.asarray(q_idx)] if q_idx.size else \
                    jnp.zeros((0, d, NL), dtype=jnp.uint64)
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
                    C["fwd_lde"], ce, n, blowup, num_cols, psize_comp, dw,
                    hash_fn, eng, combine, levels_fn)
            seed = merge(seed, c_levels[-1][0])
            # 5 -- OOD point + evaluations + reseed
            z, _ = draw(seed, jnp.uint64(0))
            zg = eng.ext_mul(z, jnp.asarray(g_elem_np))

            def jumps_of(e):
                js = []
                acc = e
                for _ in range(logn):
                    js.append(acc)
                    acc = eng.ext_mul(acc, acc)
                return jnp.stack(js)

            z_pows = _pow_table_from_jumps(jumps_of(z), n, eng)
            zg_pows = _pow_table_from_jumps(jumps_of(zg), n, eng)
            pows2 = jnp.stack([z_pows, zg_pows], axis=1)  # (n, 2, d, L)
            main_pair = _eval_cols_pair_at(polys, pows2, eng)  # (w, 2, d, L)
            comp_pair = _eval_cols_pair_at(comp_columns, pows2, eng)
            merged = jnp.concatenate([main_pair[:, 0], comp_pair[:, 0],
                                      main_pair[:, 1], comp_pair[:, 1]])
            ood_words = merged.astype(jnp.uint32).reshape(1, -1)
            ood_digest = hash_fn(ood_words, 4 * ood_words.shape[1], dw)[0]
            seed = merge(seed, ood_digest)
            # 6 -- DEEP composition + FRI
            deep_all, _ = draw_k(seed, w + num_cols, method_d)
            all_cur = jnp.concatenate([main_pair[:, 0], comp_pair[:, 0]])
            all_nxt = jnp.concatenate([main_pair[:, 1], comp_pair[:, 1]])
            adj_z = eng.ext_mul(all_cur, deep_all)
            adj_gz = eng.ext_mul(all_nxt, deep_all)
            deep_evals = deep_acc(main_lde, None, comp_lde, deep_all, adj_z,
                                  adj_gz, z[None], zg[None], C["xs"])
            fri_outs, rem, seed = _fri_phase_body(
                deep_evals, seed, C["fri_inv"], merge, draw, eng, hash_fn,
                levels_fn, dw, n_fold, n_layers, offset)
            return (main_lde, m_leaves, m_levels, comp_lde, c_leaves,
                    c_levels, main_pair, comp_pair, fri_outs, rem, seed)

        run_jit = jax.jit(run)

        def make_consts(boundary_now):
            bvals = []
            for g in boundary_now.main_groups:
                singles = [c for c in g.constraints if len(c.poly) == 1]
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                s_vals = np.zeros((len(singles), 1), dtype=object)
                for j, c in enumerate(singles):
                    for t, v in enumerate(c.poly[0]):
                        s_vals[j, t] = int(v)
                if seqs:
                    L = len(seqs[0].poly)
                    q_coeffs = np.zeros((L, len(seqs), 1), dtype=object)
                    for j, c in enumerate(seqs):
                        for i, v in enumerate(c.poly):
                            for t, x in enumerate(v):
                                q_coeffs[i, j, t] = int(x)
                    q_coeffs = eng.to_device(q_coeffs)
                else:
                    q_coeffs = jnp.zeros((0, 0, 1, NL), dtype=jnp.uint64)
                bvals.append((eng.to_device(s_vals), q_coeffs))
            return {
                "inv_n": eng.ntt_plan(n, True),
                "offp_n": eng._power_series_dev(offset, n),
                "fwd_lde": eng.ntt_plan(lde_size, False),
                "interp_ce": eng.interp_offset_powers(ce, offset),
                "inv_ce": eng.ntt_plan(ce, True),
                "xs": eng._power_series_dev(h_lde, lde_size, offset),
                "fri_inv": tuple(
                    eng.fri_inv_offset_powers(lde_size // n_fold**i, n_fold,
                                              offset % eng.P)
                    for i in range(n_layers)),
                "ce_consts": ce_consts,
                "bvals": bvals,
            }

        cache[key] = (run_jit, make_consts)
        return cache[key]

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _upload_trace(self, trace):
        eng = type(self).engine
        dev_cache = trace.device_cache() if hasattr(trace, "device_cache") \
            else {}
        main_dev = dev_cache.get(eng.P)
        if main_dev is None:
            native_rows = trace.native_rows() \
                if hasattr(trace, "native_rows") else None
            if native_rows is not None and hasattr(eng, "to_device_native") \
                    and native_rows.ndim == 3:
                main_dev = eng.to_device_native(native_rows)  # (n, w, L) view
            else:
                main_dev = eng.to_device(trace.main_segment())  # (n, w, L)
            tracing.sync(main_dev)
            dev_cache[eng.P] = main_dev
        return main_dev

    def _make_tree(self, leaves, levels_tuple=None) -> PrehashedMerkleTree:
        from .device import _TREE_PREFETCH

        if levels_tuple is None:
            levels_tuple = self._levels_fn(leaves)
        levels = {lvl.shape[0]: lvl for lvl in levels_tuple}
        nb = self.hasher.digest_size  # 31 for Rp62_248 (trailing pad byte)
        tree = PrehashedMerkleTree(
            _DigestView(leaves, nbytes=nb),
            _HeapNodesView(levels, leaves.shape[0], nbytes=nb),
            self.hasher)
        if leaves.shape[0] <= _TREE_PREFETCH:
            tree.prefetch_async()
        else:
            from .device import _FLAT_PREDISPATCH

            if leaves.shape[0] <= _FLAT_PREDISPATCH:
                # pre-dispatch the flat-heap concat to overlap compute
                # (gated below _HEAP_FLAT_LIMIT — see device.py._make_tree)
                tree.nodes._flat_nodes()
        return tree

    def _query_start(self, tree, lde, positions: List[int], batch=None):
        return (tree.prove_batch_start(positions, batch),
                _padded_take_start(lde, positions, batch))

    def _query_finish(self, tree, lde, positions: List[int], start,
                      field: Field, d: int) -> Queries:
        st, rows_tok = start
        _, proof = tree.prove_batch_finish(st)
        rows_obj = type(self).engine.from_limbs_np(
            _padded_take_finish(rows_tok, len(positions), lde.shape[1:]))
        rows = []
        for row in rows_obj:
            if row.ndim == 1:  # base field row (w,)
                rows.append([(int(v),) for v in row])
            else:  # (w, d)
                rows.append([tuple(int(x) for x in e) for e in row])
        return Queries.new(proof.to_bytes(), rows, field)

    def _query(self, tree, lde, positions: List[int], field: Field,
               d: int) -> Queries:
        return self._query_finish(
            tree, lde, positions, self._query_start(tree, lde, positions),
            field, d)

    # ------------------------------------------------------------------
    # constraint evaluation (device mirror of prover/evaluator.py)
    # ------------------------------------------------------------------

    def _evaluate_constraints(self, air, main_lde, aux_lde, aux_rand_elements,
                              ccs):
        eng = type(self).engine
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
        t_ccs_arr = eng.to_device(
            np.array([list(cc) for cc in ccs.transition], dtype=object))
        aux_rand_arr = None
        if aux_rand_elements is not None:
            aux_rand_arr = eng.to_device(
                np.array([list(e) for e in aux_rand_elements], dtype=object))

        def pack_groups(groups, val_d: int):
            """Per group: (single ccs, single values, sequence ccs, sequence
            coeff blocks) as traced limb arrays padded to static shapes."""
            packed = []
            for g in groups:
                singles = [c for c in g.constraints if len(c.poly) == 1]
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                s_ccs = eng.to_device(np.array(
                    [list(c.cc) for c in singles], dtype=object).reshape(
                        len(singles), d))
                s_vals = np.zeros((len(singles), val_d), dtype=object)
                for j, c in enumerate(singles):
                    for t, v in enumerate(c.poly[0]):
                        s_vals[j, t] = int(v)
                q_ccs = eng.to_device(np.array(
                    [list(c.cc) for c in seqs], dtype=object).reshape(
                        len(seqs), d))
                if seqs:
                    L = len(seqs[0].poly)
                    q_coeffs = np.zeros((L, len(seqs), val_d), dtype=object)
                    for j, c in enumerate(seqs):
                        for i, v in enumerate(c.poly):
                            for t, x in enumerate(v):
                                q_coeffs[i, j, t] = int(x)
                    q_coeffs = eng.to_device(q_coeffs)
                else:
                    q_coeffs = jnp.zeros((0, 0, val_d, eng.NUM_LIMBS),
                                         dtype=jnp.uint64)
                packed.append((s_ccs, eng.to_device(s_vals), q_ccs, q_coeffs))
            return packed

        main_packed = pack_groups(boundary.main_groups, 1)
        aux_packed = pack_groups(boundary.aux_groups, d)

        fn, consts = self._get_ce_fn(air, boundary)
        return fn(main_ce, main_ce_next, aux_ce, aux_ce_next, t_ccs_arr,
                  aux_rand_arr, main_packed, aux_packed, consts)

    def _get_ce_fn(self, air, boundary):
        """Builds (and caches) the jitted CE program plus its device-resident
        per-structure constants. The cache key covers everything the compiled
        program bakes in (see GoldilocksProver._get_ce_fn)."""
        eng = type(self).engine
        NL = eng.NUM_LIMBS
        jax_ops_cls = type(self).jax_ops_cls
        ce = air.context.ce_domain_size
        n = air.trace_length
        offset = air.domain_offset
        ce_blowup = air.ce_blowup_factor
        base = air.base
        ext = air.ext_field
        d = ext.degree
        p = eng.P
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

        # ---- device-resident per-structure constants (ARGS) ----
        from ..math import ntt as host_ntt

        periodic_dev = []
        for poly in periodic_polys:
            c = len(poly)
            coeffs = np.array(poly, dtype=object)[:, None]
            vals = host_ntt.evaluate_poly_with_offset(
                base, coeffs, pow(offset, n // c, p), ce_blowup)
            arr = eng.to_device(vals)  # (c·ce_blowup, 1, L)
            periodic_dev.append(jnp.tile(arr, (ce // arr.shape[0], 1, 1)))

        xs = eng._power_series_dev(base.get_root_of_unity(ce.bit_length() - 1),
                                   ce, offset)  # (ce, L)
        divisor = ConstraintDivisor.from_transition(
            base, n, air.context.num_transition_exemptions)
        t_div_inv = _transition_divisor_inv(xs, n, tuple(divisor.exemptions),
                                            eng)

        plan_ce = eng.ntt_plan(ce, False)

        def group_consts(groups):
            out = []
            for g in groups:
                div_inv = _boundary_divisor_inv(xs, *g.divisor.numerator[0],
                                                eng)
                seqs = [c for c in g.constraints if len(c.poly) > 1]
                if seqs:
                    scales = jnp.stack(
                        [eng._power_series_dev(offset * c.poly_offset % p, ce)
                         for c in seqs], axis=1)  # (ce, n_seq, L)
                else:
                    scales = jnp.zeros((ce, 0, NL), dtype=jnp.uint64)
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

        # wide AIRs over big CE domains scan the pointwise evaluation in row
        # slabs (see _CE_SLAB_ROWS); the sequence-boundary value-poly NTTs
        # stay whole-domain, computed once before the scan
        main_w = air.trace_info.main_segment_width
        aux_w = air.trace_info.aux_segment_width
        n_slabs = 1
        if (ce * (main_w + max(aux_w, 1) * d) * NL > _CE_SLAB_BUDGET
                and ce > _CE_SLAB_ROWS):
            n_slabs = ce // _CE_SLAB_ROWS

        def run(main_ce, main_ce_next, aux_ce, aux_ce_next, t_ccs,
                aux_rands, main_packed, aux_packed, consts):
            t_div_inv, main_consts, aux_consts, periodic_dev, plan_ce = consts

            def group_bvals(packed, gconsts):
                """Per group: sequence value polys evaluated over the whole
                CE domain — zero-pad the (L, k) coefficient block, scale by
                the per-column (offset·poly_offset)^i series, one NTT."""
                out = []
                for (_, _, _, q_coeffs), (_, scales) in zip(packed, gconsts):
                    if q_coeffs.shape[1]:
                        L, k, vd = q_coeffs.shape[:3]
                        padded = jnp.concatenate(
                            [q_coeffs,
                             jnp.zeros((ce - L, k, vd, NL),
                                       dtype=jnp.uint64)],
                            axis=0)
                        scaled = eng.base_mul(padded, scales[:, :, None, :])
                        out.append(eng.ntt_evaluate_body(scaled, plan_ce, ce))
                    else:
                        out.append(None)
                return out

            main_bvals = group_bvals(main_packed, main_consts)
            aux_bvals = group_bvals(aux_packed, aux_consts)

            def pointwise(m_ce, m_next, a_ce, a_next, div_t, periodic,
                          m_divs, m_bvals, a_divs, a_bvals):
                rows = m_ce.shape[0]
                base_ops = jax_ops_cls(Field(base, 1))
                frame = EvaluationFrame(
                    [m_ce[:, c : c + 1] for c in range(m_ce.shape[1])],
                    [m_next[:, c : c + 1] for c in range(m_ce.shape[1])])
                main_evals = air.evaluate_transition(frame, periodic,
                                                     base_ops)

                combined = jnp.zeros((rows, d, NL), dtype=jnp.uint64)
                for i, ev in enumerate(main_evals):
                    combined = eng.ext_add(
                        combined, eng.base_mul(ev, t_ccs[i][None]))

                if a_ce is not None:
                    ext_ops = jax_ops_cls(ext)
                    lift = lambda a: jnp.pad(a, ((0, 0), (0, d - 1), (0, 0)))
                    main_frame_ext = EvaluationFrame(
                        [lift(m_ce[:, c : c + 1])
                         for c in range(m_ce.shape[1])],
                        [lift(m_next[:, c : c + 1])
                         for c in range(m_ce.shape[1])])
                    periodic_ext = [lift(pv) for pv in periodic]
                    aux_frame = EvaluationFrame(
                        [a_ce[:, c] for c in range(a_ce.shape[1])],
                        [a_next[:, c] for c in range(a_ce.shape[1])])
                    rand_list = [aux_rands[i][None]
                                 for i in range(aux_rands.shape[0])]
                    aux_evals = air.evaluate_aux_transition(
                        main_frame_ext, aux_frame, periodic_ext, rand_list,
                        ext_ops)
                    for i, ev in enumerate(aux_evals):
                        combined = eng.ext_add(
                            combined,
                            eng.ext_mul(ev, jnp.broadcast_to(
                                t_ccs[n_main + i][None], ev.shape)))

                result = eng.ext_mul_base(combined, div_t)

                def add_groups(cols, divs, bvals, packed, trace, is_ext):
                    nonlocal result
                    for (s_cols, q_cols), div_inv, b_vals, \
                            (s_ccs, s_vals, q_ccs, _) in zip(
                                cols, divs, bvals, packed):
                        numer = jnp.zeros((rows, d, NL), dtype=jnp.uint64)
                        for j, col in enumerate(s_cols):
                            if is_ext:
                                diff = eng.ext_sub(
                                    trace[:, col],
                                    jnp.broadcast_to(s_vals[j][None],
                                                     (rows, d, NL)))
                                numer = eng.ext_add(numer, eng.ext_mul(
                                    diff, jnp.broadcast_to(s_ccs[j][None],
                                                           diff.shape)))
                            else:
                                col_vals = trace[:, col : col + 1]
                                diff = eng.base_sub(
                                    col_vals,
                                    jnp.broadcast_to(s_vals[j][None],
                                                     col_vals.shape))
                                numer = eng.ext_add(
                                    numer,
                                    eng.base_mul(diff, s_ccs[j][None]))
                        for j, col in enumerate(q_cols):
                            if is_ext:
                                diff = eng.ext_sub(trace[:, col],
                                                   b_vals[:, j])
                                numer = eng.ext_add(numer, eng.ext_mul(
                                    diff, jnp.broadcast_to(q_ccs[j][None],
                                                           diff.shape)))
                            else:
                                diff = eng.base_sub(trace[:, col : col + 1],
                                                    b_vals[:, j])
                                numer = eng.ext_add(
                                    numer,
                                    eng.base_mul(diff, q_ccs[j][None]))
                        result = eng.ext_add(
                            result, eng.ext_mul_base(numer, div_inv))

                add_groups(main_cols, m_divs, m_bvals, main_packed, m_ce,
                           False)
                if a_ce is not None:
                    add_groups(aux_cols, a_divs, a_bvals, aux_packed, a_ce,
                               True)
                return result

            m_divs = [dv for dv, _ in main_consts]
            a_divs = [dv for dv, _ in aux_consts]
            if n_slabs == 1:
                return pointwise(main_ce, main_ce_next, aux_ce, aux_ce_next,
                                 t_div_inv, periodic_dev, m_divs, main_bvals,
                                 a_divs, aux_bvals)

            def sl(a):
                return a.reshape((n_slabs, ce // n_slabs) + a.shape[1:])

            def sl_opt(a):
                return None if a is None else sl(a)

            xs = (sl(main_ce), sl(main_ce_next), sl_opt(aux_ce),
                  sl_opt(aux_ce_next), sl(t_div_inv),
                  [sl(p) for p in periodic_dev],
                  [sl(dv) for dv in m_divs],
                  [sl_opt(bv) for bv in main_bvals],
                  [sl(dv) for dv in a_divs],
                  [sl_opt(bv) for bv in aux_bvals])

            def body(carry, x):
                (m_ce, m_next, a_ce, a_next, div_t, periodic, mdv, mbv,
                 adv, abv) = x
                return carry, pointwise(m_ce, m_next, a_ce, a_next, div_t,
                                        periodic, mdv, mbv, adv, abv)

            _, out = jax.lax.scan(body, 0, xs)
            return out.reshape((ce,) + out.shape[2:])

        fn = jax.jit(run)
        cache[key] = (fn, consts)
        return cache[key]

    # ------------------------------------------------------------------
    # DEEP composition (pointwise rational — see module docstring)
    # ------------------------------------------------------------------

    def _deep_evaluations(self, air, ext, main_lde, aux_lde, comp_lde, z, zg,
                          trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs):
        eng = type(self).engine
        d = ext.degree
        lde_size = main_lde.shape[0]
        offset = air.domain_offset
        h = air.base.get_root_of_unity(lde_size.bit_length() - 1)
        xs = eng._power_series_dev(h, lde_size, offset)  # (lde, L)

        all_ccs = list(deep_ccs.trace) + list(deep_ccs.constraints)
        all_cur = trace_cur + quot_cur
        all_nxt = trace_nxt + quot_nxt
        cc_arr = eng.to_device(
            np.array([list(c) for c in all_ccs], dtype=object))
        adj_z = eng.to_device(np.array(
            [list(ext.mul(v, c)) for v, c in zip(all_cur, all_ccs)],
            dtype=object))
        adj_gz = eng.to_device(np.array(
            [list(ext.mul(v, c)) for v, c in zip(all_nxt, all_ccs)],
            dtype=object))
        z_arr = eng.to_device(np.array([list(z)], dtype=object))
        zg_arr = eng.to_device(np.array([list(zg)], dtype=object))

        aux_width = 0 if aux_lde is None else aux_lde.shape[1]
        if lde_size <= _DEEP_SLAB_LIMB:
            fn = self._get_deep_fn(d, lde_size, aux_width)
            return fn(main_lde, aux_lde, comp_lde, cc_arr, adj_z, adj_gz,
                      z_arr, zg_arr, xs)
        # huge domains: accumulate the numerators whole-array (cheap temps),
        # run the extension-inversion combine in row slabs — the f128 Fermat
        # inversion chain (~127 sqr/mul steps) otherwise wants GBs of
        # full-domain HLO temporaries (same rule as prover/device.py _DEEP_SLAB)
        acc = self._get_deep_acc_fn(d, lde_size, aux_width)
        comp_z, comp_gz = acc(main_lde, aux_lde, comp_lde, cc_arr, adj_z,
                              adj_gz)
        S = _DEEP_SLAB_LIMB
        if lde_size % S == 0:
            return _deep_combine_limb_scan(comp_z, comp_gz, z_arr, zg_arr,
                                           xs, eng)
        parts = [
            _deep_combine_limb(comp_z[i : i + S], comp_gz[i : i + S],
                               z_arr, zg_arr, xs[i : i + S], eng)
            for i in range(0, lde_size, S)]
        return jnp.concatenate(parts, axis=0)

    def _get_deep_acc_fn(self, d: int, lde_size: int, aux_width: int):
        """Numerator accumulation only (comp_z, comp_gz) — the huge-domain
        half of the DEEP split. Mirrors the first part of ``_get_deep_fn``,
        which is kept intact so <=_DEEP_SLAB_LIMB sizes keep their cached
        fused executables."""
        eng = type(self).engine
        NL = eng.NUM_LIMBS
        key = ("acc", d, lde_size, aux_width)
        cache = getattr(self, "_deep_cache", None)
        if cache is None:
            cache = self._deep_cache = {}
        if key in cache:
            return cache[key]

        def accumulate(main_lde, aux_lde, comp_lde, cc_arr, adj_z, adj_gz):
            comp_z = jnp.zeros((lde_size, d, NL), dtype=jnp.uint64)
            comp_gz = jnp.zeros((lde_size, d, NL), dtype=jnp.uint64)
            idx = 0

            def add_term(term, idx):
                nonlocal comp_z, comp_gz
                comp_z = eng.ext_add(comp_z, eng.ext_sub(
                    term, jnp.broadcast_to(adj_z[idx][None], term.shape)))
                comp_gz = eng.ext_add(comp_gz, eng.ext_sub(
                    term, jnp.broadcast_to(adj_gz[idx][None], term.shape)))

            for c in range(main_lde.shape[1]):
                add_term(
                    eng.base_mul(main_lde[:, c : c + 1, :], cc_arr[idx][None]),
                    idx)
                idx += 1
            if aux_lde is not None:
                for c in range(aux_lde.shape[1]):
                    add_term(eng.ext_mul(
                        aux_lde[:, c],
                        jnp.broadcast_to(cc_arr[idx][None],
                                         aux_lde[:, c].shape)), idx)
                    idx += 1
            for j in range(comp_lde.shape[1]):
                add_term(eng.ext_mul(
                    comp_lde[:, j],
                    jnp.broadcast_to(cc_arr[idx][None],
                                     comp_lde[:, j].shape)), idx)
                idx += 1
            return comp_z, comp_gz

        fn = jax.jit(accumulate)
        cache[key] = fn
        return fn

    def _get_deep_fn(self, d: int, lde_size: int, aux_width: int):
        eng = type(self).engine
        NL = eng.NUM_LIMBS
        key = (d, lde_size, aux_width)
        cache = getattr(self, "_deep_cache", None)
        if cache is None:
            cache = self._deep_cache = {}
        if key in cache:
            return cache[key]

        def accumulate(main_lde, aux_lde, comp_lde, cc_arr, adj_z, adj_gz,
                       z_arr, zg_arr, xs):
            comp_z = jnp.zeros((lde_size, d, NL), dtype=jnp.uint64)
            comp_gz = jnp.zeros((lde_size, d, NL), dtype=jnp.uint64)
            idx = 0

            def add_term(term, idx):
                nonlocal comp_z, comp_gz
                comp_z = eng.ext_add(comp_z, eng.ext_sub(
                    term, jnp.broadcast_to(adj_z[idx][None], term.shape)))
                comp_gz = eng.ext_add(comp_gz, eng.ext_sub(
                    term, jnp.broadcast_to(adj_gz[idx][None], term.shape)))

            for c in range(main_lde.shape[1]):
                add_term(
                    eng.base_mul(main_lde[:, c : c + 1, :], cc_arr[idx][None]),
                    idx)
                idx += 1
            if aux_lde is not None:
                for c in range(aux_lde.shape[1]):
                    add_term(eng.ext_mul(
                        aux_lde[:, c],
                        jnp.broadcast_to(cc_arr[idx][None],
                                         aux_lde[:, c].shape)), idx)
                    idx += 1
            for j in range(comp_lde.shape[1]):
                add_term(eng.ext_mul(
                    comp_lde[:, j],
                    jnp.broadcast_to(cc_arr[idx][None],
                                     comp_lde[:, j].shape)), idx)
                idx += 1

            # x embedded into the extension: (x, 0, ...)
            xs_ext = jnp.pad(xs[:, None, :], ((0, 0), (0, d - 1), (0, 0)))
            den_z = eng.ext_sub(xs_ext, jnp.broadcast_to(z_arr, xs_ext.shape))
            den_gz = eng.ext_sub(xs_ext,
                                 jnp.broadcast_to(zg_arr, xs_ext.shape))
            # one inversion instead of two (Montgomery pair trick)
            inv_prod = eng.ext_batch_inv(eng.ext_mul(den_z, den_gz))
            inv_z = eng.ext_mul(inv_prod, den_gz)
            inv_gz = eng.ext_mul(inv_prod, den_z)
            return eng.ext_add(
                eng.ext_mul(comp_z, inv_z),
                eng.ext_mul(comp_gz, inv_gz))

        fn = jax.jit(accumulate)
        cache[key] = fn
        return fn


class F128Prover(LimbFieldProver):
    """Drop-in Prover for f128 AIRs (the reference default field)."""

    engine = f128_eng
    jax_ops_cls = JaxOpsF128


class F62Prover(LimbFieldProver):
    """Drop-in Prover for f62 AIRs with BLAKE3/SHA3 commitments."""

    engine = f62_eng
    jax_ops_cls = JaxOpsF62
