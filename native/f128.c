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
