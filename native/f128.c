/* f128 host field kernels: NTT / coset scaling over p = 2^128 − 45·2^40 + 1.
 *
 * The host prover's f128 math layer is object-dtype Python ints (the exact
 * oracle); these C kernels give the HOST pipeline a fast path for the
 * O(n log n) polynomial work, ~two orders of magnitude over big-int Python.
 * The reduction mirrors the proven limb-fold schedule of the device engine
 * (winterfell_tpu/ops/f128.py): 2^128 ≡ 45·2^40 − 1 =: PHI (mod p), two
 * folds then a conditional subtract. Reference semantics:
 * /root/reference/math/src/field/f128/mod.rs:429 (Barrett) — same canonical
 * results, different reduction.
 *
 * Elements are (lo, hi) pairs of uint64 little-endian; arrays are row-major
 * (n, w) with the transform along axis 0.
 */

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

/* p = 2^128 - 45*2^40 + 1 */
static const u64 P_LO = 0xffffd30000000001ULL; /* low 64 bits of p */
static const u64 P_HI = 0xffffffffffffffffULL; /* high 64 bits of p */
/* PHI = 45*2^40 - 1 = 2^128 mod p (fits in 46 bits) */
static const u64 PHI = (45ULL << 40) - 1ULL;

typedef struct {
    u64 lo, hi;
} f128;

static inline int geq_p(f128 a) {
    return a.hi > P_HI || (a.hi == P_HI && a.lo >= P_LO);
}

static inline f128 sub_p(f128 a) {
    f128 r;
    r.lo = a.lo - P_LO;
    r.hi = a.hi - P_HI - (a.lo < P_LO);
    return r;
}

static inline f128 f128_add(f128 a, f128 b) {
    f128 r;
    r.lo = a.lo + b.lo;
    u64 c = r.lo < a.lo;
    r.hi = a.hi + b.hi + c;
    int carry_out = r.hi < a.hi || (c && r.hi == a.hi);
    if (carry_out) { /* value = 2^128 + r ≡ r + PHI */
        u64 lo = r.lo + PHI;
        r.hi += (lo < r.lo);
        r.lo = lo;
    }
    if (geq_p(r))
        r = sub_p(r);
    return r;
}

static inline f128 f128_sub(f128 a, f128 b) {
    f128 r;
    int borrow = a.hi < b.hi || (a.hi == b.hi && a.lo < b.lo);
    r.lo = a.lo - b.lo;
    r.hi = a.hi - b.hi - (a.lo < b.lo);
    if (borrow) { /* add p back */
        u64 lo = r.lo + P_LO;
        r.hi += P_HI + (lo < r.lo);
        r.lo = lo;
    }
    return r;
}

/* full 128×128 → 256-bit product, then two PHI folds (ops/f128.py:_fold_256) */
static inline f128 f128_mul(f128 a, f128 b) {
    u128 p00 = (u128)a.lo * b.lo;
    u128 p01 = (u128)a.lo * b.hi;
    u128 p10 = (u128)a.hi * b.lo;
    u128 p11 = (u128)a.hi * b.hi;

    u64 r0 = (u64)p00;
    u128 mid = (p00 >> 64) + (u64)p01 + (u64)p10;
    u64 r1 = (u64)mid;
    u128 hi = (mid >> 64) + (p01 >> 64) + (p10 >> 64) + (u64)p11;
    u64 r2 = (u64)hi;
    u64 r3 = (u64)(hi >> 64) + (u64)(p11 >> 64);

    /* fold 1: (r3·2^64 + r2)·PHI + (r1·2^64 + r0); PHI < 2^46 */
    u128 t0 = (u128)r2 * PHI + r0;
    u128 t1 = (u128)r3 * PHI + r1 + (u64)(t0 >> 64);
    u64 s0 = (u64)t0;
    u64 s1 = (u64)t1;
    u64 s2 = (u64)(t1 >> 64); /* < 2^47 */

    /* fold 2: s2·PHI + (s1·2^64 + s0); s2·PHI < 2^93 */
    u128 u0 = (u128)s2 * PHI + s0;
    u64 v0 = (u64)u0;
    u128 u1 = (u128)s1 + (u64)(u0 >> 64);
    u64 v1 = (u64)u1;
    if (u1 >> 64) { /* wrapped past 2^128: add PHI once more */
        u64 lo = v0 + PHI;
        v1 += (lo < v0);
        v0 = lo;
    }
    f128 r = {v0, v1};
    if (geq_p(r))
        r = sub_p(r);
    return r;
}

static f128 f128_pow(f128 a, u128 e) {
    f128 r = {1, 0};
    while (e) {
        if (e & 1)
            r = f128_mul(r, a);
        a = f128_mul(a, a);
        e >>= 1;
    }
    return r;
}

static inline f128 f128_inv(f128 a) {
    /* p - 2 */
    u128 p = (((u128)P_HI) << 64) | P_LO;
    return f128_pow(a, p - 2);
}

/* ---- NTT (radix-2 DIT, natural order in/out, along axis 0 of (n, w)) ---- */

static void bit_reverse(f128 *data, size_t n, size_t w) {
    for (size_t i = 1, j = 0; i < n; i++) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1)
            j ^= bit;
        j ^= bit;
        if (i < j)
            for (size_t c = 0; c < w; c++) {
                f128 t = data[i * w + c];
                data[i * w + c] = data[j * w + c];
                data[j * w + c] = t;
            }
    }
}

/* root must be a primitive n-th root of unity (inverse root for the iNTT) */
void wt_f128_ntt(u64 *raw, size_t n, size_t w, const u64 root_limbs[2],
                 int inverse) {
    f128 *data = (f128 *)raw;
    f128 root = {root_limbs[0], root_limbs[1]};

    bit_reverse(data, n, w);

    f128 *tw = malloc((n / 2 > 0 ? n / 2 : 1) * sizeof(f128));
    for (size_t m = 2; m <= n; m <<= 1) {
        size_t half = m >> 1;
        f128 w_m = f128_pow(root, n / m);
        tw[0] = (f128){1, 0};
        for (size_t j = 1; j < half; j++)
            tw[j] = f128_mul(tw[j - 1], w_m);
        for (size_t k = 0; k < n; k += m)
            for (size_t j = 0; j < half; j++)
                for (size_t c = 0; c < w; c++) {
                    f128 *u = &data[(k + j) * w + c];
                    f128 *v = &data[(k + j + half) * w + c];
                    f128 t = f128_mul(*v, tw[j]);
                    *v = f128_sub(*u, t);
                    *u = f128_add(*u, t);
                }
    }
    free(tw);

    if (inverse) {
        f128 inv_n = f128_inv((f128){(u64)n, 0});
        for (size_t i = 0; i < n * w; i++)
            data[i] = f128_mul(data[i], inv_n);
    }
}

/* data[i][j] *= scale · s^i  (coset scaling / offset interpolation) */
void wt_f128_scale_powers(u64 *raw, size_t n, size_t w, const u64 s_limbs[2],
                          const u64 scale_limbs[2]) {
    f128 *data = (f128 *)raw;
    f128 s = {s_limbs[0], s_limbs[1]};
    f128 acc = {scale_limbs[0], scale_limbs[1]};
    for (size_t i = 0; i < n; i++) {
        for (size_t c = 0; c < w; c++)
            data[i * w + c] = f128_mul(data[i * w + c], acc);
        acc = f128_mul(acc, s);
    }
}

/* ---- Rescue-Prime (width 4) trace generation -----------------------------
 *
 * Native builder for the reference's headline benchmark computation
 * (examples/src/rescue/prover.rs build_trace): a chain of `iterations`
 * Rescue hashes, 16 trace rows per hash (14 rounds + 2 copy steps). The
 * chain is inherently serial (each hash seeds the next); the win over the
 * Python builder is the ~100x faster per-element f128 pow.
 *
 * Output rows are (lo, hi) u64 pairs — on a little-endian host they view
 * directly as the device engine's 32-bit limb layout, so the device prover
 * uploads the trace without materializing Python ints.
 */

static void rescue128_mds(const f128 mds[16], f128 st[4]) {
    f128 out[4];
    for (int i = 0; i < 4; i++) {
        f128 acc = f128_mul(mds[i * 4], st[0]);
        for (int j = 1; j < 4; j++)
            acc = f128_add(acc, f128_mul(mds[i * 4 + j], st[j]));
        out[i] = acc;
    }
    memcpy(st, out, sizeof out);
}

void wt_rescue128_trace(const u64 *seed /* 2 elems x (lo,hi) */,
                        size_t iterations, const u64 *mds_raw /* 16 x 2 */,
                        const u64 *ark_raw /* 16 x 8 x 2 */,
                        const u64 inv_alpha[2], u64 *out /* n x 4 x 2 */) {
    const f128 *mds = (const f128 *)mds_raw;
    const f128 *ark = (const f128 *)ark_raw;
    u128 ia = (((u128)inv_alpha[1]) << 64) | inv_alpha[0];
    f128 *rows = (f128 *)out;
    size_t n = iterations * 16;
    f128 st[4] = {{seed[0], seed[1]}, {seed[2], seed[3]}, {0, 0}, {0, 0}};
    memcpy(rows, st, sizeof st);
    for (size_t step = 0; step + 1 < n; step++) {
        size_t r = step & 15;
        if (r < 14) { /* apply_round(state, step) */
            const f128 *k = &ark[r * 8];
            for (int i = 0; i < 4; i++) { /* sbox: x^3 */
                f128 sq = f128_mul(st[i], st[i]);
                st[i] = f128_mul(sq, st[i]);
            }
            rescue128_mds(mds, st);
            for (int i = 0; i < 4; i++)
                st[i] = f128_add(st[i], k[i]);
            for (int i = 0; i < 4; i++) /* inv-sbox: x^INV_ALPHA */
                st[i] = f128_pow(st[i], ia);
            rescue128_mds(mds, st);
            for (int i = 0; i < 4; i++)
                st[i] = f128_add(st[i], k[4 + i]);
        } else { /* copy step */
            st[2] = (f128){0, 0};
            st[3] = (f128){0, 0};
        }
        memcpy(&rows[(step + 1) * 4], st, sizeof st);
    }
}

/* ---- Goldilocks (f64) fibonacci trace builder ----------------------------
 * (examples/src/fibonacci/fib2/prover.rs build_trace semantics): row i
 * holds terms (2i, 2i+1) of the fib sequence starting 1, 1. Sequential by
 * nature; native adds beat the Python object-int loop ~1000x. */

static const u64 GL_P = 0xFFFFFFFF00000001ULL;

static inline u64 gl_add64(u64 a, u64 b) {
    u64 s = a + b;
    int carry = s < a;
    if (carry)
        s += 0xFFFFFFFFULL; /* 2^64 mod p */
    if (s >= GL_P)
        s -= GL_P;
    return s;
}

void wt_fib64_trace(size_t length, u64 *out /* length x 2 */) {
    u64 a = 1, b = 1;
    out[0] = a;
    out[1] = b;
    for (size_t i = 1; i < length; i++) {
        a = gl_add64(a, b);
        b = gl_add64(a, b);
        out[2 * i] = a;
        out[2 * i + 1] = b;
    }
}

/* batch modular ops used by hot host paths: out = a*b mod p, elementwise */
void wt_f128_mul_arrays(const u64 *a, const u64 *b, u64 *out, size_t count) {
    const f128 *fa = (const f128 *)a;
    const f128 *fb = (const f128 *)b;
    f128 *fo = (f128 *)out;
    for (size_t i = 0; i < count; i++)
        fo[i] = f128_mul(fa[i], fb[i]);
}

/* ---- Rescue-128 width-6 (examples/src/utils/rescue.rs) --------------------
 * State 6, rate 4, 7 rounds; round = MDS(sbox) + ark[0..6], MDS(inv_sbox)
 * + ark[6..12]. Used by the merkle and lamport examples; the native builder
 * exists because the lamport aggregate trace runs three of these sponges
 * per row for 1024 rows per signature (examples/src/lamport/aggregate/
 * prover.rs build_trace) — hours of big-int Python at benchable sizes. */

static void rescue128w6_mds(const f128 mds[36], f128 st[6]) {
    f128 out[6];
    for (int i = 0; i < 6; i++) {
        f128 acc = f128_mul(mds[i * 6], st[0]);
        for (int j = 1; j < 6; j++)
            acc = f128_add(acc, f128_mul(mds[i * 6 + j], st[j]));
        out[i] = acc;
    }
    memcpy(st, out, sizeof out);
}

static void rescue128w6_round(const f128 mds[36], const f128 *ark12,
                              u128 inv_alpha, f128 st[6]) {
    for (int i = 0; i < 6; i++) { /* sbox x^3 */
        f128 sq = f128_mul(st[i], st[i]);
        st[i] = f128_mul(sq, st[i]);
    }
    rescue128w6_mds(mds, st);
    for (int i = 0; i < 6; i++)
        st[i] = f128_add(st[i], ark12[i]);
    for (int i = 0; i < 6; i++) /* inv-sbox x^INV_ALPHA */
        st[i] = f128_pow(st[i], inv_alpha);
    rescue128w6_mds(mds, st);
    for (int i = 0; i < 6; i++)
        st[i] = f128_add(st[i], ark12[6 + i]);
}

static void rescue128w6_permute(const f128 mds[36], const f128 *ark /* 8x12 */,
                                u128 ia, f128 st[6]) {
    for (int r = 0; r < 7; r++)
        rescue128w6_round(mds, &ark[r * 12], ia, st);
}

/* Sponge over `len` elements, rate 4 (rescue.rs:81-101). out = state[0..2]. */
void wt_rescue128w6_sponge(const u64 *data_raw, size_t len,
                           const u64 *mds_raw, const u64 *ark_raw,
                           const u64 inv_alpha[2], u64 out[4]) {
    const f128 *data = (const f128 *)data_raw;
    const f128 *mds = (const f128 *)mds_raw;
    const f128 *ark = (const f128 *)ark_raw;
    u128 ia = (((u128)inv_alpha[1]) << 64) | inv_alpha[0];
    f128 st[6] = {{0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}};
    size_t i = 0;
    for (size_t k = 0; k < len; k++) {
        st[i] = f128_add(st[i], data[k]);
        if (++i == 4) {
            rescue128w6_permute(mds, ark, ia, st);
            i = 0;
        }
    }
    if (i > 0)
        rescue128w6_permute(mds, ark, ia, st);
    memcpy(out, st, 2 * sizeof(f128));
}

/* Batch digest of n independent 2-element inputs (lamport keygen: the 254
 * per-bit public keys are rescue(sec_key) — signature.rs:60-78). */
void wt_rescue128w6_hash2_many(const u64 *inputs_raw /* n x 2 x 2 */, size_t n,
                               const u64 *mds_raw, const u64 *ark_raw,
                               const u64 inv_alpha[2],
                               u64 *out_raw /* n x 2 x 2 */) {
    const f128 *inputs = (const f128 *)inputs_raw;
    const f128 *mds = (const f128 *)mds_raw;
    const f128 *ark = (const f128 *)ark_raw;
    f128 *out = (f128 *)out_raw;
    u128 ia = (((u128)inv_alpha[1]) << 64) | inv_alpha[0];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (size_t k = 0; k < n; k++) {
        f128 st[6] = {inputs[2 * k], inputs[2 * k + 1],
                      {0, 0}, {0, 0}, {0, 0}, {0, 0}};
        rescue128w6_permute(mds, ark, ia, st);
        out[2 * k] = st[0];
        out[2 * k + 1] = st[1];
    }
}

/* ---- Lamport aggregate trace (examples/src/lamport/aggregate/prover.rs) --
 *
 * Width-22 state machine, 1024 rows per signature: 128 hash cycles of 8
 * steps — 7 Rescue rounds applied to three parallel width-6 sponges
 * (columns 4-9, 10-15, 16-21), then an update step that aggregates the
 * revealed key into the public-key sponge, loads the next secret keys, and
 * accumulates message bits (columns 0-3). Key schedules (sec/pub per bit)
 * are precomputed by the Python caller; signatures are independent, so rows
 * parallelize over OpenMP threads. */

void wt_lamport_trace(const u64 *msgs_raw /* nsig x 2 x 2 */,
                      const u64 *sec1_raw, const u64 *sec2_raw,
                      const u64 *pub1_raw, const u64 *pub2_raw,
                      /* each: nsig x 128 x 2 x 2 */
                      size_t nsig, const u64 *mds_raw, const u64 *ark_raw,
                      const u64 inv_alpha[2],
                      u64 *out_raw /* (nsig*1024) x 22 x 2 */) {
    const f128 *mds = (const f128 *)mds_raw;
    const f128 *ark = (const f128 *)ark_raw;
    u128 ia = (((u128)inv_alpha[1]) << 64) | inv_alpha[0];
    f128 *rows = (f128 *)out_raw;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (size_t s = 0; s < nsig; s++) {
        const f128 *m = (const f128 *)msgs_raw + 2 * s;
        u128 m0 = (((u128)m[0].hi) << 64) | m[0].lo;
        u128 m1 = (((u128)m[1].hi) << 64) | m[1].lo;
        const f128 *sec1 = (const f128 *)sec1_raw + s * 256;
        const f128 *sec2 = (const f128 *)sec2_raw + s * 256;
        const f128 *pub1 = (const f128 *)pub1_raw + s * 256;
        const f128 *pub2 = (const f128 *)pub2_raw + s * 256;
        f128 *base = rows + s * 1024 * 22;

        f128 st[22];
        memset(st, 0, sizeof st);
        st[0] = (f128){(u64)(m0 & 1), 0};
        st[1] = (f128){(u64)(m1 & 1), 0};
        st[4] = sec1[0];
        st[5] = sec1[1];
        st[10] = sec2[0];
        st[11] = sec2[1];
        memcpy(base, st, sizeof st);

        for (size_t step = 0; step + 1 < 1024; step++) {
            size_t cycle_num = step >> 3, cycle_step = step & 7;
            if (cycle_step < 7) {
                rescue128w6_round(mds, &ark[cycle_step * 12], ia, &st[4]);
                rescue128w6_round(mds, &ark[cycle_step * 12], ia, &st[10]);
                rescue128w6_round(mds, &ark[cycle_step * 12], ia, &st[16]);
            } else {
                int m0_bit = st[0].lo == 1, m1_bit = st[1].lo == 1;
                /* public key aggregation (prover.rs update_pub_key_hash) */
                f128 k1a = m0_bit ? st[4] : pub1[2 * cycle_num];
                f128 k1b = m0_bit ? st[5] : pub1[2 * cycle_num + 1];
                f128 k2a = m1_bit ? st[10] : pub2[2 * cycle_num];
                f128 k2b = m1_bit ? st[11] : pub2[2 * cycle_num + 1];
                st[16] = f128_add(st[16], k1a);
                st[17] = f128_add(st[17], k1b);
                st[18] = f128_add(st[18], k2a);
                st[19] = f128_add(st[19], k2b);
                /* next secret keys */
                st[4] = sec1[2 * (cycle_num + 1)];
                st[5] = sec1[2 * (cycle_num + 1) + 1];
                st[6] = st[7] = st[8] = st[9] = (f128){0, 0};
                st[10] = sec2[2 * (cycle_num + 1)];
                st[11] = sec2[2 * (cycle_num + 1) + 1];
                st[12] = st[13] = st[14] = st[15] = (f128){0, 0};
                /* message accumulation: 2^cycle_num < 2^127 < p */
                st[0] = (f128){(u64)((m0 >> (cycle_num + 1)) & 1), 0};
                st[1] = (f128){(u64)((m1 >> (cycle_num + 1)) & 1), 0};
                u128 p2 = ((u128)1) << cycle_num;
                f128 pw = {(u64)p2, (u64)(p2 >> 64)};
                if (m0_bit)
                    st[2] = f128_add(st[2], pw);
                if (m1_bit)
                    st[3] = f128_add(st[3], pw);
            }
            memcpy(base + (step + 1) * 22, st, sizeof st);
        }
    }
}
