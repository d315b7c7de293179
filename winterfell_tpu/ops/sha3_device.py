"""Vectorized SHA3-256 row hashing on JAX/XLA — the device commitment hasher
for Sha3_256 proof configs (reference crypto/src/hash/mod.rs:122-158 wraps the
sha3 crate; this is the TPU-native equivalent, mirroring ops.blake3_device).

Keccak-f[1600] runs as (m,)-wide u64 lane ops: the state is a (25, m) uint64
array, each round is θ/ρ+π/χ/ι on the 25 lanes, and the 24 rounds run in a
fori_loop (one traced round body — compiles fast everywhere). Row messages
arrive as uint32 WORD arrays exactly like blake3_device (both device element
layouts are already little-endian 32-bit words), get packed into u64 lanes,
and absorb at the SHA3-256 rate of 136 bytes with 0x06…0x80 padding.

Oracle: hashlib.sha3_256 (tests/test_sha3_device.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

_RATE_BYTES = 136  # SHA3-256: 1600/8 − 2·32
_RATE_LANES = _RATE_BYTES // 8

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)

# rotation offsets r[x][y] (FIPS 202 Table 2); lane (x, y) lives at 5y + x
_ROT = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)


def _rotl(v, n: int):
    if n == 0:
        return v
    return (v << jnp.uint64(n)) | (v >> jnp.uint64(64 - n))


def _keccak_f(state):
    """state: (25, m) uint64 → (25, m) after 24 rounds."""
    rc = jnp.asarray(_RC)

    def round_body(r, a):
        lanes = [a[i] for i in range(25)]

        # θ
        c = [lanes[x] ^ lanes[x + 5] ^ lanes[x + 10] ^ lanes[x + 15]
             ^ lanes[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        lanes = [lanes[5 * y + x] ^ d[x]
                 for y in range(5) for x in range(5)]
        lanes = [lanes[i] for i in range(25)]

        # ρ + π: B[y, 2x+3y] = rot(A[x, y], r[x][y])
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[5 * ((2 * x + 3 * y) % 5) + y] = _rotl(
                    lanes[5 * y + x], _ROT[x][y])

        # χ
        lanes = [b[5 * y + x]
                 ^ (~b[5 * y + (x + 1) % 5] & b[5 * y + (x + 2) % 5])
                 for y in range(5) for x in range(5)]

        # ι
        lanes[0] = lanes[0] ^ rc[r]
        return jnp.stack(lanes)

    return jax.lax.fori_loop(0, 24, round_body, state)


@partial(jax.jit, static_argnums=(1, 2))
def sha3_hash_words(words, byte_len: int, digest_words: int = 8):
    """words: (m, W) uint32 — each row's little-endian message words, padded
    with zeros past byte_len (byte_len % 4 == 0 — element and digest sizes
    always are). Returns (m, 8) uint32 digests (the SHA3-256 digest as LE
    words; digest_words kept for interface parity with blake3_device)."""
    m, W = words.shape
    need = -(-byte_len // 4)
    assert W >= need

    # pack u32 word pairs into u64 lanes, zero-padded to whole blocks + pad
    n_blocks = byte_len // _RATE_BYTES + 1  # always room for the 0x06 pad
    total_lanes = n_blocks * _RATE_LANES
    w64 = words.astype(jnp.uint64)
    pad_words = 2 * total_lanes - W
    if pad_words > 0:
        w64 = jnp.concatenate(
            [w64, jnp.zeros((m, pad_words), dtype=jnp.uint64)], axis=1)
    else:
        w64 = w64[:, : 2 * total_lanes]
    lanes_all = w64[:, 0::2] | (w64[:, 1::2] << jnp.uint64(32))  # (m, lanes)

    # SHA3 padding: 0x06 at byte_len, 0x80 at the final rate block's last byte
    pad_lane = byte_len // 8
    pad_shift = 8 * (byte_len % 8)
    lanes_all = lanes_all.at[:, pad_lane].set(
        lanes_all[:, pad_lane] ^ (jnp.uint64(0x06) << jnp.uint64(pad_shift)))
    lanes_all = lanes_all.at[:, total_lanes - 1].set(
        lanes_all[:, total_lanes - 1] ^ jnp.uint64(0x80) << jnp.uint64(56))

    state = jnp.zeros((25, m), dtype=jnp.uint64)
    for blk in range(n_blocks):
        block = lanes_all[:, blk * _RATE_LANES : (blk + 1) * _RATE_LANES].T
        state = state.at[:_RATE_LANES].set(state[:_RATE_LANES] ^ block)
        state = _keccak_f(state)

    # digest = first 32 bytes of the state, as LE u32 words
    out64 = state[:4].T  # (m, 4)
    lo = (out64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (out64 >> jnp.uint64(32)).astype(jnp.uint32)
    return jnp.stack([lo, hi], axis=-1).reshape(m, 8)[:, :digest_words]


@jax.jit
def sha3_merge_rows(left, right):
    """merge(d0, d1) = sha3_256(d0 ‖ d1): (m, 8), (m, 8) uint32 → (m, 8)."""
    msg = jnp.concatenate([left, right], axis=1)
    return sha3_hash_words(msg, 64, 8)


@jax.jit
def _merge_level(level):
    return sha3_merge_rows(level[0::2], level[1::2])


_MERKLE_TAIL = 1 << 10


@jax.jit
def _merkle_tail_impl(leaves):
    levels = []
    current = sha3_merge_rows(leaves[0::2], leaves[1::2])
    levels.append(current)
    while current.shape[0] > 1:
        current = sha3_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def merkle_levels_sha3(leaves):
    """Merkle internal levels from leaf digests (m, 8) uint32 (mirrors
    blake3_device.merkle_levels_blake3)."""
    levels = []
    current = leaves
    while current.shape[0] > _MERKLE_TAIL:
        current = _merge_level(current)
        levels.append(current)
    if current.shape[0] > 1:
        levels.extend(_merkle_tail_impl(current))
    return tuple(levels)
