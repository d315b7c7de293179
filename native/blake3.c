/* BLAKE3 (hash mode, 256-bit output) — C implementation from the public
 * BLAKE3 specification, built as a shared library and loaded via ctypes.
 *
 * This is the native host-side hashing engine of winterfell_tpu: the
 * Fiat–Shamir transcript and the host prover's row hashing for
 * Blake3_256/Blake3_192 configs call into it (the pure-Python
 * implementation in crypto/blake3_host.py remains the oracle and fallback).
 *
 * Exported API:
 *   void wt_blake3(const uint8_t* input, size_t len, uint8_t out[32]);
 *   void wt_blake3_many(const uint8_t* rows, size_t num_rows,
 *                       size_t row_len, uint8_t* out);   // out: 32*num_rows
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

static const uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

static const uint8_t MSG_PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13,
                                     1, 11, 12, 5, 9, 14, 15, 8};

enum {
    CHUNK_START = 1,
    CHUNK_END = 2,
    PARENT = 4,
    ROOT = 8,
};

#define BLOCK_LEN 64
#define CHUNK_LEN 1024

static inline uint32_t rotr32(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

static inline void g(uint32_t* s, int a, int b, int c, int d,
                     uint32_t mx, uint32_t my) {
    s[a] = s[a] + s[b] + mx;
    s[d] = rotr32(s[d] ^ s[a], 16);
    s[c] = s[c] + s[d];
    s[b] = rotr32(s[b] ^ s[c], 12);
    s[a] = s[a] + s[b] + my;
    s[d] = rotr32(s[d] ^ s[a], 8);
    s[c] = s[c] + s[d];
    s[b] = rotr32(s[b] ^ s[c], 7);
}

static void compress(const uint32_t cv[8], const uint32_t block[16],
                     uint64_t counter, uint32_t block_len, uint32_t flags,
                     uint32_t out[16]) {
    uint32_t s[16];
    uint32_t m[16];
    uint32_t perm[16];
    int r, i;

    memcpy(s, cv, 8 * sizeof(uint32_t));
    memcpy(s + 8, IV, 4 * sizeof(uint32_t));
    s[12] = (uint32_t)counter;
    s[13] = (uint32_t)(counter >> 32);
    s[14] = block_len;
    s[15] = flags;
    memcpy(m, block, 16 * sizeof(uint32_t));

    for (r = 0; r < 7; r++) {
        g(s, 0, 4, 8, 12, m[0], m[1]);
        g(s, 1, 5, 9, 13, m[2], m[3]);
        g(s, 2, 6, 10, 14, m[4], m[5]);
        g(s, 3, 7, 11, 15, m[6], m[7]);
        g(s, 0, 5, 10, 15, m[8], m[9]);
        g(s, 1, 6, 11, 12, m[10], m[11]);
        g(s, 2, 7, 8, 13, m[12], m[13]);
        g(s, 3, 4, 9, 14, m[14], m[15]);
        if (r < 6) {
            for (i = 0; i < 16; i++) perm[i] = m[MSG_PERM[i]];
            memcpy(m, perm, sizeof(m));
        }
    }
    for (i = 0; i < 8; i++) {
        out[i] = s[i] ^ s[i + 8];
        out[i + 8] = s[i + 8] ^ cv[i];
    }
}

static void words_from_le(const uint8_t* bytes, size_t len, uint32_t block[16]) {
    uint8_t buf[BLOCK_LEN];
    int i;
    memset(buf, 0, BLOCK_LEN);
    memcpy(buf, bytes, len);
    for (i = 0; i < 16; i++) {
        block[i] = (uint32_t)buf[4 * i] | ((uint32_t)buf[4 * i + 1] << 8) |
                   ((uint32_t)buf[4 * i + 2] << 16) |
                   ((uint32_t)buf[4 * i + 3] << 24);
    }
}

/* Hash one chunk (<= 1024 bytes) into a chaining value; the ROOT flag is
 * applied by the caller when appropriate. */
static void chunk_cv(const uint8_t* input, size_t len, uint64_t chunk_counter,
                     uint32_t root_if_last, uint32_t cv_out[8]) {
    uint32_t cv[8];
    uint32_t out16[16];
    uint32_t block[16];
    size_t off = 0;
    size_t nblocks = (len + BLOCK_LEN - 1) / BLOCK_LEN;
    size_t b;
    if (nblocks == 0) nblocks = 1;

    memcpy(cv, IV, sizeof(cv));
    for (b = 0; b < nblocks; b++) {
        size_t blen = len - off > BLOCK_LEN ? BLOCK_LEN : len - off;
        uint32_t flags = 0;
        if (b == 0) flags |= CHUNK_START;
        if (b == nblocks - 1) flags |= CHUNK_END | root_if_last;
        words_from_le(input + off, blen, block);
        compress(cv, block, chunk_counter, (uint32_t)blen, flags, out16);
        memcpy(cv, out16, sizeof(cv));
        off += BLOCK_LEN;
    }
    memcpy(cv_out, cv, sizeof(cv));
}

static void parent_cv(const uint32_t left[8], const uint32_t right[8],
                      uint32_t flags, uint32_t out[8]) {
    uint32_t block[16];
    uint32_t out16[16];
    memcpy(block, left, 8 * sizeof(uint32_t));
    memcpy(block + 8, right, 8 * sizeof(uint32_t));
    compress(IV, block, 0, BLOCK_LEN, PARENT | flags, out16);
    memcpy(out, out16, 8 * sizeof(uint32_t));
}

void wt_blake3(const uint8_t* input, size_t len, uint8_t out[32]) {
    /* chaining-value stack for the binary tree over 1024-byte chunks */
    uint32_t stack[54][8];
    int stack_len = 0;
    uint64_t nchunks = (len + CHUNK_LEN - 1) / CHUNK_LEN;
    uint64_t c;
    uint32_t cv[8];
    int i;

    if (nchunks <= 1) {
        chunk_cv(input, len, 0, ROOT, cv);
        for (i = 0; i < 8; i++) {
            out[4 * i] = (uint8_t)cv[i];
            out[4 * i + 1] = (uint8_t)(cv[i] >> 8);
            out[4 * i + 2] = (uint8_t)(cv[i] >> 16);
            out[4 * i + 3] = (uint8_t)(cv[i] >> 24);
        }
        return;
    }

    for (c = 0; c < nchunks; c++) {
        size_t off = (size_t)c * CHUNK_LEN;
        size_t clen = len - off > CHUNK_LEN ? CHUNK_LEN : len - off;
        uint64_t total;
        chunk_cv(input + off, clen, c, 0, cv);
        /* merge completed left subtrees (by trailing zeros of the chunk
         * count) for every chunk except the last; the last chunk is pushed
         * unmerged so the final fold can apply the ROOT flag */
        if (c < nchunks - 1) {
            total = c + 1;
            while ((total & 1) == 0 && stack_len > 0) {
                stack_len--;
                parent_cv(stack[stack_len], cv, 0, cv);
                total >>= 1;
            }
        }
        memcpy(stack[stack_len], cv, sizeof(cv));
        stack_len++;
    }

    /* final merge chain; topmost merge carries the ROOT flag */
    memcpy(cv, stack[stack_len - 1], sizeof(cv));
    for (i = stack_len - 2; i >= 0; i--) {
        parent_cv(stack[i], cv, i == 0 ? ROOT : 0, cv);
    }
    for (i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)cv[i];
        out[4 * i + 1] = (uint8_t)(cv[i] >> 8);
        out[4 * i + 2] = (uint8_t)(cv[i] >> 16);
        out[4 * i + 3] = (uint8_t)(cv[i] >> 24);
    }
}

void wt_blake3_many(const uint8_t* rows, size_t num_rows, size_t row_len,
                    uint8_t* out) {
    size_t r;
    for (r = 0; r < num_rows; r++) {
        wt_blake3(rows + r * row_len, row_len, out + r * 32);
    }
}

/* Grinding scan (prover/src/channel.rs:169-184 serial path): find the
 * smallest nonce >= start whose merge_with_int(seed, nonce) digest head
 * (first 8 bytes, little-endian u64) has >= zeros trailing zero bits.
 * seed_len is the digest size (32 for Blake3_256, 24 for Blake3_192);
 * the message is seed || LE64(nonce), always a single block. */
uint64_t wt_blake3_grind(const uint8_t* seed, size_t seed_len,
                         uint32_t zeros, uint64_t start) {
    uint8_t msg[40];
    uint8_t out[32];
    uint64_t nonce = start;
    uint64_t head;
    int i;
    memcpy(msg, seed, seed_len);
    for (;;) {
        for (i = 0; i < 8; i++) {
            msg[seed_len + i] = (uint8_t)(nonce >> (8 * i));
        }
        wt_blake3(msg, seed_len + 8, out);
        head = 0;
        for (i = 0; i < 8; i++) {
            head |= (uint64_t)out[i] << (8 * i);
        }
        if (head == 0 ? zeros <= 64
                      : (uint32_t)__builtin_ctzll(head) >= zeros) {
            return nonce;
        }
        nonce++;
    }
}
