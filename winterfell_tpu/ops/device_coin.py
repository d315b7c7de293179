"""Device-resident Fiat-Shamir coin ops (DefaultRandomCoin on the chip).

The host :class:`~winterfell_tpu.crypto.random_coin.DefaultRandomCoin`
(crypto/src/random/default.rs:82-247) forces a host round trip at every
commit->reseed->draw boundary.  For the FRI commit phase that is 3 round
trips per layer (root pull, alpha upload, fold dispatch).  These ops move
the coin INTO the traced program so a whole multi-layer phase becomes one
XLA dispatch: reseed is a single in-graph hash compression, and ``draw`` is
a ``lax.while_loop`` that replicates the reference's rejection sampling
bit-for-bit (default.rs:120-139).

Seed state layouts (exactly the digest byte layout, so the host coin can be
resumed from a pulled seed with a plain bytes() view):

- byte hashers (BLAKE3_256/192, SHA3_256): ``(digest_words,)`` uint32 -
  little-endian digest words;
- Rp64_256: ``(4,)`` uint64 - the digest field elements.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

__all__ = [
    "byte_coin_ops",
    "rp64_coin_ops",
    "limb_ext_decoder",
    "u64_ext_decoder",
    "seed_to_words",
    "words_to_seed",
]


# ================================================================================
# Seed conversion helpers (host side)
# ================================================================================


def seed_to_words(seed: bytes) -> np.ndarray:
    """Digest bytes -> little-endian uint32 word vector."""
    return np.frombuffer(seed, dtype="<u4").copy()


def words_to_seed(words) -> bytes:
    """Device/np uint32 word vector -> digest bytes."""
    return np.ascontiguousarray(np.asarray(words).astype("<u4")).tobytes()


def seed_to_u64(seed: bytes) -> np.ndarray:
    """Digest bytes -> little-endian uint64 vector (Rp64 element digests)."""
    return np.frombuffer(seed, dtype="<u8").copy()


def u64_to_seed(vals) -> bytes:
    return np.ascontiguousarray(np.asarray(vals).astype("<u8")).tobytes()


def rp62_seed_to_limbs(seed: bytes) -> np.ndarray:
    """31-byte packed Rp62_248 digest -> (4, 2) uint64 32-bit-limb digest
    elements (digest.rs:36-50 unpacking)."""
    v = int.from_bytes(seed + b"\x00" * (32 - len(seed)), "little")
    mask = (1 << 62) - 1
    elems = [(v >> (62 * i)) & mask for i in range(4)]
    return np.array([[e & 0xFFFFFFFF, e >> 32] for e in elems],
                    dtype=np.uint64)


def rp62_limbs_to_seed(limbs) -> bytes:
    """(4, 2) uint64 limb digest elements -> 31 packed digest bytes."""
    arr = np.asarray(limbs).astype(np.uint64)
    v = 0
    for i in range(4):
        v |= (int(arr[i, 0]) | (int(arr[i, 1]) << 32)) << (62 * i)
    return v.to_bytes(32, "little")[:31]


def seed_to_state(kind: str, seed: bytes) -> np.ndarray:
    """Host coin seed bytes -> the device coin-state layout for ``kind``."""
    if kind == "rp62_248":
        return rp62_seed_to_limbs(seed)
    if kind == "rp64_256":
        return seed_to_u64(seed)
    return seed_to_words(seed)


def state_to_seed(kind: str, state) -> bytes:
    """Device coin state -> host coin seed bytes (inverse of seed_to_state)."""
    if kind == "rp62_248":
        return rp62_limbs_to_seed(state)
    if kind == "rp64_256":
        return u64_to_seed(state)
    return words_to_seed(state)


# ================================================================================
# Byte-hasher coin ops (BLAKE3_256/192, SHA3_256)
# ================================================================================


def byte_coin_ops(hash_fn, digest_words: int):
    """Coin primitives over a device row hasher ``hash_fn(words, byte_len,
    digest_words)`` (ops.blake3_device.blake3_hash_words /
    ops.sha3_device.sha3_hash_words).

    Returns ``(merge, next_candidate)``:

    - ``merge(seed_w, other_w)``: hash(seed || other), truncated - the
      ``reseed`` step (crypto/src/hash/blake/mod.rs:33-39);
    - ``next_candidate(seed_w, counter)``: hash(seed || LE64(counter)) -
      ``merge_with_int`` (blake/mod.rs:41-46).  ``counter`` is a traced
      uint64 scalar.
    """
    dw = digest_words

    def merge(seed_w, other_w):
        msg = jnp.concatenate([seed_w, other_w])[None, :]
        return hash_fn(msg, 8 * dw, dw)[0]

    def next_candidate(seed_w, counter):
        counter = counter.astype(jnp.uint64)
        lo = (counter & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (counter >> jnp.uint64(32)).astype(jnp.uint32)
        msg = jnp.concatenate([seed_w, lo[None], hi[None]])[None, :]
        return hash_fn(msg, 4 * dw + 8, dw)[0]

    return merge, next_candidate


# ================================================================================
# Rp64_256 coin ops (seed state = (4,) uint64 digest elements)
# ================================================================================


def rp64_coin_ops():
    """Coin primitives for the Rescue-Prime sponge coin
    (rp64_256/mod.rs:208-254): one permutation per merge/merge_with_int."""
    from . import goldilocks as gl

    def merge(seed_e, other_e):
        cap = jnp.asarray(np.array([8, 0, 0, 0], dtype=np.uint64))
        state = jnp.concatenate([cap, seed_e, other_e])[None, :]
        return gl.rp64_permutation_rows(state)[0, 4:8]

    def next_candidate(seed_e, counter):
        # state[0] = 5 (or 6), state[4:8] = seed, state[8] = value % p,
        # state[9] = value // p (rp64_256/mod.rs merge_with_int)
        counter = counter.astype(jnp.uint64)
        p = jnp.uint64(gl.P)
        hi = jnp.where(counter >= p, jnp.uint64(1), jnp.uint64(0))
        lo = jnp.where(counter >= p, counter - p, counter)
        zero = jnp.uint64(0)
        state = jnp.stack(
            [jnp.uint64(5) + hi, zero, zero, zero,
             seed_e[0], seed_e[1], seed_e[2], seed_e[3],
             lo, hi, zero, zero])[None, :]
        return gl.rp64_permutation_rows(state)[0, 4:8]

    return merge, next_candidate


# ================================================================================
# Rp62_248 coin ops (seed state = (4, 2) uint64 limb digest elements)
# ================================================================================


def rp62_coin_ops():
    """Coin primitives for the Rp62_248 sponge (rp62_248/mod.rs merge /
    merge_with_int): one permutation each. The seed travels as (4, 2)
    32-bit-limb digest elements; ``other`` in merge is a tree-root row in
    the packed (8,) uint32 word layout the Merkle kernels emit."""
    from . import rp62_device as rp62

    def merge(seed_l, root_words):
        other = rp62._unpack_digest(root_words[None])[0]  # (4, 2)
        tail = jnp.asarray(np.array(
            [[0, 0], [0, 0], [0, 0], [8, 0]], dtype=np.uint64))
        state = jnp.concatenate([seed_l, other, tail])[None]  # (1, 12, 2)
        return rp62.rp62_permutation_rows(state)[0, :4]

    def next_candidate(seed_l, counter):
        # state[0..4) = seed, state[4] = value % p, state[5] = value // p,
        # state[11] = 5 (or 6 when value >= p) — rp62_248 merge_with_int
        counter = counter.astype(jnp.uint64)
        p = jnp.uint64(rp62.P)
        hi = counter // p
        lo = counter - hi * p
        m32 = jnp.uint64(0xFFFFFFFF)
        s32 = jnp.uint64(32)
        z = jnp.uint64(0)
        cnt = jnp.uint64(5) + jnp.where(hi > z, jnp.uint64(1), z)
        state = jnp.stack([
            seed_l[0, 0], seed_l[0, 1], seed_l[1, 0], seed_l[1, 1],
            seed_l[2, 0], seed_l[2, 1], seed_l[3, 0], seed_l[3, 1],
            lo & m32, lo >> s32, hi & m32, hi >> s32,
            z, z, z, z, z, z, z, z, z, z,
            cnt & m32, cnt >> s32,
        ]).reshape(12, 2)[None]
        return rp62.rp62_permutation_rows(state)[0, :4]

    return merge, next_candidate


def rp62_ext_decoder(degree: int):
    """Decoder for Rp62_248 candidates: the digest elements are re-PACKED to
    the 31-byte wire layout, whose first ``8·degree`` bytes are the LE u64
    base components the host's try_from_random_bytes reads; ok iff every
    component is canonical (< P62)."""
    from . import f62 as eng

    def decode(dig):  # (4, 2) limb digest elements
        v = dig[:, 0] | (dig[:, 1] << jnp.uint64(32))  # (4,) 62-bit values
        w0 = v[0] | (v[1] << jnp.uint64(62))
        w1 = (v[1] >> jnp.uint64(2)) | (v[2] << jnp.uint64(60))
        w2 = (v[2] >> jnp.uint64(4)) | (v[3] << jnp.uint64(58))
        ws = jnp.stack([w0, w1, w2])[:degree]
        ok = jnp.all(ws < jnp.uint64(eng.P))
        elems = jnp.stack([ws & jnp.uint64(0xFFFFFFFF),
                           ws >> jnp.uint64(32)], axis=-1)  # (degree, 2)
        return ok, elems

    return decode


# ================================================================================
# Candidate decoders (Randomizable::from_random_bytes on device)
# ================================================================================


def _limbs_lt(words_u64, mod_limbs):
    """Lexicographic `value < modulus` over little-endian 32-bit limbs.
    words_u64: (..., L) uint64 (32-bit values); mod_limbs: (L,) np.uint64."""
    L = words_u64.shape[-1]
    lt = jnp.zeros(words_u64.shape[:-1], dtype=bool)
    eq = jnp.ones(words_u64.shape[:-1], dtype=bool)
    for k in range(L - 1, -1, -1):
        m = jnp.uint64(int(mod_limbs[k]))
        lt = lt | (eq & (words_u64[..., k] < m))
        eq = eq & (words_u64[..., k] == m)
    return lt


def limb_ext_decoder(eng, degree: int):
    """Decoder for limb engines (ops.f128/ops.f62): candidate digest words ->
    ``(ok, elem (degree, NUM_LIMBS) uint64)``; ok iff every base component is
    canonical (< P), mirroring Field.try_from_random_bytes."""
    L = eng.NUM_LIMBS
    mod_limbs = np.array(
        [(eng.P >> (32 * k)) & 0xFFFFFFFF for k in range(L)], dtype=np.uint64)

    def decode(cand_w):
        # truncated digests (Blake3_192) are zero-padded to the element byte
        # width, mirroring Digest::as_bytes() -> [u8; 32] (the reference's
        # ByteDigest<24> pads with zeros before E::from_random_bytes)
        need = degree * L
        if cand_w.shape[0] < need:
            cand_w = jnp.concatenate(
                [cand_w,
                 jnp.zeros(need - cand_w.shape[0], dtype=cand_w.dtype)])
        words = cand_w[:need].astype(jnp.uint64).reshape(degree, L)
        ok = jnp.all(_limbs_lt(words, mod_limbs))
        return ok, words

    return decode


def u64_ext_decoder(p: int, degree: int, from_words: bool):
    """Decoder for the f64 engine: candidate -> ``(ok, elem (degree,)
    uint64)``.  ``from_words=True`` decodes a uint32 word digest (byte
    hashers); ``False`` takes uint64 element digests (Rp64 - whose digest
    elements are canonical by construction, so ok is always True there but
    the check is kept for exactness)."""

    def decode(cand):
        if from_words:
            # zero-pad truncated digests (see limb_ext_decoder)
            need = 2 * degree
            if cand.shape[0] < need:
                cand = jnp.concatenate(
                    [cand, jnp.zeros(need - cand.shape[0], dtype=cand.dtype)])
            lo = cand[0 : 2 * degree : 2].astype(jnp.uint64)
            hi = cand[1 : 2 * degree : 2].astype(jnp.uint64)
            vals = lo | (hi << jnp.uint64(32))
        else:
            vals = cand[:degree].astype(jnp.uint64)
        ok = jnp.all(vals < jnp.uint64(p))
        return ok, vals

    return decode


# ================================================================================
# draw — rejection sampling loop (default.rs:120-139)
# ================================================================================


def make_draw(next_candidate, decode, elem_shape, elem_dtype=jnp.uint64):
    """Build ``draw(seed, counter) -> (elem, counter)`` with the host coin's
    counter semantics: counter increments BEFORE each candidate; the first
    canonical candidate wins.  Runs as a lax.while_loop (expected 1 trip for
    128-bit digests; up to a handful for f62's ~24% acceptance)."""

    def draw(seed, counter):
        counter = jnp.asarray(counter, dtype=jnp.uint64)
        zero_elem = jnp.zeros(elem_shape, dtype=elem_dtype)

        def cond(st):
            _, ok, _ = st
            return jnp.logical_not(ok)

        def body(st):
            c, _, _ = st
            c = c + jnp.uint64(1)
            cand = next_candidate(seed, c)
            ok, elem = decode(cand)
            return c, ok, elem

        c, _, elem = jax.lax.while_loop(
            cond, body, (counter, jnp.asarray(False), zero_elem))
        return elem, c

    return draw


def make_draw_k(draw, ext_mul, one_elem):
    """Build ``draw_k(seed, k, method) -> (elems (k, ...), counter)`` -- the
    composition-coefficient draw (air/src/air/coefficients.rs): 'linear' = k
    independent draws, 'algebraic' = powers 1, a, a^2, ... of ONE draw,
    'horner' = those powers reversed.  ``one_elem`` is the field's one in
    the element layout; ``ext_mul`` multiplies two elements."""

    def draw_k(seed, k: int, method: str = "linear"):
        if method == "linear":
            def body(counter, _):
                e, c2 = draw(seed, counter)
                return c2, e

            counter, elems = jax.lax.scan(
                body, jnp.uint64(0), None, length=k)
            return elems, counter
        alpha, counter = draw(seed, jnp.uint64(0))

        def body(acc, _):
            return ext_mul(acc, alpha), acc

        _, elems = jax.lax.scan(body, jnp.asarray(one_elem), None, length=k)
        if method == "horner":
            elems = elems[::-1]
        return elems, counter

    return draw_k


# ================================================================================
# Per-config coin bundles (cached)
# ================================================================================


@lru_cache(maxsize=None)
def coin_bundle(kind: str, degree: int, eng_name: str = ""):
    """(merge, draw) for a prover configuration.

    kind: 'blake3_256' | 'blake3_192' | 'sha3_256' | 'rp64_256' | 'rp62_248'
    degree: extension degree of the draw field
    eng_name: 'f128' | 'f62' | 'f64' - selects the element limb layout
    """
    if kind == "rp64_256":
        merge, nxt = rp64_coin_ops()
        decode = u64_ext_decoder((1 << 64) - (1 << 32) + 1, degree, False)
        return merge, make_draw(nxt, decode, (degree,))
    if kind == "rp62_248":
        merge, nxt = rp62_coin_ops()
        return merge, make_draw(nxt, rp62_ext_decoder(degree), (degree, 2))
    if kind in ("blake3_256", "blake3_192"):
        from . import blake3_device as b3

        dw = 8 if kind == "blake3_256" else 6
        merge, nxt = byte_coin_ops(b3.blake3_hash_words, dw)
    elif kind == "sha3_256":
        from . import sha3_device as s3

        merge, nxt = byte_coin_ops(s3.sha3_hash_words, 8)
    else:
        raise ValueError(f"no device coin for hasher kind {kind!r}")

    if eng_name == "f128":
        from . import f128 as eng
    elif eng_name == "f62":
        from . import f62 as eng
    elif eng_name == "f64":
        decode = u64_ext_decoder((1 << 64) - (1 << 32) + 1, degree, True)
        return merge, make_draw(nxt, decode, (degree,))
    else:
        raise ValueError(f"unknown engine {eng_name!r}")
    decode = limb_ext_decoder(eng, degree)
    return merge, make_draw(nxt, decode, (degree, eng.NUM_LIMBS))
