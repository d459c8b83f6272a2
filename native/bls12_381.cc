// Native BLS12-381 host oracle: Fq tower, G1/G2 group law, ate pairing.
//
// This is the C++ counterpart of curves/host_curve.py — the framework's
// verifier-side engine (pairing checks in PCS verification,
// cf. reference dpoly_comm.rs:466-484) and test oracle.  The reference's
// native performance layer is arkworks' Rust bigint arithmetic; here the
// host-side native layer is this library (the device hot path is
// JAX/Pallas — see curves/g1.py).  Exposed via a C ABI consumed with
// ctypes (native/__init__.py); the Python implementation remains as a
// pure fallback and cross-check.
//
// Representation: Fq = 6x64-bit little-endian limbs in Montgomery form
// (R = 2^384).  Points are affine with explicit infinity flags.  All
// public entry points take/return *standard-form* (non-Montgomery) limbs.

#include <cstdint>
#include <cstring>
#include <cstddef>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr int NL = 6;  // Fq limbs

struct Fq { u64 v[NL]; };

static const Fq Q = {{0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                      0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                      0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
constexpr u64 N0INV = 0x89f3fffcfffcfffdULL;
static const Fq R2 = {{0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                       0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                       0x9a793e85b519952dULL, 0x11988fe592cae3aaULL}};
static const Fq ONE_M = {{0x760900000002fffdULL, 0xebf4000bc40c0002ULL,
                          0x5f48985753c758baULL, 0x77ce585370525745ULL,
                          0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL}};
static const Fq ZERO = {{0, 0, 0, 0, 0, 0}};

inline bool fq_is_zero(const Fq &a) {
  u64 o = 0;
  for (int i = 0; i < NL; i++) o |= a.v[i];
  return o == 0;
}

inline bool fq_eq(const Fq &a, const Fq &b) {
  u64 o = 0;
  for (int i = 0; i < NL; i++) o |= a.v[i] ^ b.v[i];
  return o == 0;
}

inline bool fq_geq_q(const Fq &a) {
  for (int i = NL - 1; i >= 0; i--) {
    if (a.v[i] > Q.v[i]) return true;
    if (a.v[i] < Q.v[i]) return false;
  }
  return true;  // equal
}

inline void fq_sub_q(Fq &a) {
  u128 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 d = (u128)a.v[i] - Q.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

inline Fq fq_add(const Fq &a, const Fq &b) {
  Fq r;
  u128 carry = 0;
  for (int i = 0; i < NL; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || fq_geq_q(r)) fq_sub_q(r);
  return r;
}

inline Fq fq_sub(const Fq &a, const Fq &b) {
  Fq r;
  u128 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {  // add q back
    u128 carry = 0;
    for (int i = 0; i < NL; i++) {
      u128 s = (u128)r.v[i] + Q.v[i] + carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

inline Fq fq_neg(const Fq &a) { return fq_is_zero(a) ? a : fq_sub(ZERO, a); }

// Montgomery CIOS multiply.
inline Fq fq_mul(const Fq &a, const Fq &b) {
  u64 t[NL + 2] = {0};
  for (int i = 0; i < NL; i++) {
    u128 carry = 0;
    for (int j = 0; j < NL; j++) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[NL] + carry;
    t[NL] = (u64)s;
    t[NL + 1] = (u64)(s >> 64);
    u64 m = t[0] * N0INV;
    carry = ((u128)t[0] + (u128)m * Q.v[0]) >> 64;
    for (int j = 1; j < NL; j++) {
      u128 s2 = (u128)t[j] + (u128)m * Q.v[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[NL] + carry;
    t[NL - 1] = (u64)s;
    t[NL] = t[NL + 1] + (u64)(s >> 64);
    t[NL + 1] = 0;
  }
  Fq r;
  std::memcpy(r.v, t, sizeof(r.v));
  if (t[NL] || fq_geq_q(r)) fq_sub_q(r);
  return r;
}

inline Fq fq_sqr(const Fq &a) { return fq_mul(a, a); }

// a^e with e given as big-endian bit scan over a limb array.
inline Fq fq_pow(const Fq &a, const u64 *e, int elimbs) {
  Fq result = ONE_M;
  bool started = false;
  for (int i = elimbs - 1; i >= 0; i--) {
    for (int b = 63; b >= 0; b--) {
      if (started) result = fq_sqr(result);
      if ((e[i] >> b) & 1) {
        if (!started) { result = a; started = true; }
        else result = fq_mul(result, a);
      }
    }
  }
  return result;
}

inline Fq fq_inv(const Fq &a) {
  // Fermat: a^(q-2)
  u64 e[NL];
  u128 borrow = 2;
  for (int i = 0; i < NL; i++) {
    u128 d = (u128)Q.v[i] - (u64)borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) & 1 ? 1 : 0;
    if (i == 0 && ((u128)Q.v[0] < 2)) borrow = 1;  // never: q[0] >= 2
  }
  return fq_pow(a, e, NL);
}

inline Fq fq_from_std(const u64 *std) {
  Fq s;
  std::memcpy(s.v, std, sizeof(s.v));
  return fq_mul(s, R2);  // to Montgomery
}

inline void fq_to_std(const Fq &m, u64 *out) {
  // multiply by 1 (Montgomery reduce)
  Fq one = {{1, 0, 0, 0, 0, 0}};
  Fq s = fq_mul(m, one);
  std::memcpy(out, s.v, sizeof(s.v));
}

// ---------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (u+1)); Fq12 = Fq6[w]/(w^2-v)
// ---------------------------------------------------------------------
struct Fq2 { Fq c0, c1; };
struct Fq6 { Fq2 c0, c1, c2; };
struct Fq12 { Fq6 c0, c1; };

static const Fq2 F2_ZERO = {ZERO, ZERO};
static const Fq2 F2_ONE = {ONE_M, ZERO};
static const Fq2 XI = {ONE_M, ONE_M};  // 1 + u

inline Fq2 f2_add(const Fq2 &a, const Fq2 &b) { return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)}; }
inline Fq2 f2_sub(const Fq2 &a, const Fq2 &b) { return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)}; }
inline Fq2 f2_neg(const Fq2 &a) { return {fq_neg(a.c0), fq_neg(a.c1)}; }
inline bool f2_is_zero(const Fq2 &a) { return fq_is_zero(a.c0) && fq_is_zero(a.c1); }
inline bool f2_eq(const Fq2 &a, const Fq2 &b) { return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1); }

inline Fq2 f2_mul(const Fq2 &a, const Fq2 &b) {
  Fq t0 = fq_mul(a.c0, b.c0);
  Fq t1 = fq_mul(a.c1, b.c1);
  Fq t2 = fq_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
  return {fq_sub(t0, t1), fq_sub(fq_sub(t2, t0), t1)};
}

inline Fq2 f2_sqr(const Fq2 &a) { return f2_mul(a, a); }

inline Fq2 f2_dbl(const Fq2 &a) { return f2_add(a, a); }

inline Fq2 f2_tpl(const Fq2 &a) { return f2_add(f2_dbl(a), a); }

inline Fq2 f2_inv(const Fq2 &a) {
  Fq n = fq_add(fq_mul(a.c0, a.c0), fq_mul(a.c1, a.c1));
  Fq ninv = fq_inv(n);
  return {fq_mul(a.c0, ninv), fq_neg(fq_mul(a.c1, ninv))};
}

inline Fq2 f2_mul_xi(const Fq2 &a) { return f2_mul(a, XI); }

inline Fq6 f6_add(const Fq6 &a, const Fq6 &b) {
  return {f2_add(a.c0, b.c0), f2_add(a.c1, b.c1), f2_add(a.c2, b.c2)};
}
inline Fq6 f6_sub(const Fq6 &a, const Fq6 &b) {
  return {f2_sub(a.c0, b.c0), f2_sub(a.c1, b.c1), f2_sub(a.c2, b.c2)};
}
inline Fq6 f6_neg(const Fq6 &a) { return {f2_neg(a.c0), f2_neg(a.c1), f2_neg(a.c2)}; }

inline Fq6 f6_mul(const Fq6 &a, const Fq6 &b) {
  Fq2 t0 = f2_mul(a.c0, b.c0);
  Fq2 t1 = f2_mul(a.c1, b.c1);
  Fq2 t2 = f2_mul(a.c2, b.c2);
  Fq2 c0 = f2_add(t0, f2_mul_xi(f2_sub(
      f2_mul(f2_add(a.c1, a.c2), f2_add(b.c1, b.c2)), f2_add(t1, t2))));
  Fq2 c1 = f2_add(f2_sub(f2_mul(f2_add(a.c0, a.c1), f2_add(b.c0, b.c1)),
                         f2_add(t0, t1)),
                  f2_mul_xi(t2));
  Fq2 c2 = f2_add(f2_sub(f2_mul(f2_add(a.c0, a.c2), f2_add(b.c0, b.c2)),
                         f2_add(t0, t2)),
                  t1);
  return {c0, c1, c2};
}

inline Fq6 f6_inv(const Fq6 &a) {
  Fq2 c0 = f2_sub(f2_sqr(a.c0), f2_mul_xi(f2_mul(a.c1, a.c2)));
  Fq2 c1 = f2_sub(f2_mul_xi(f2_sqr(a.c2)), f2_mul(a.c0, a.c1));
  Fq2 c2 = f2_sub(f2_sqr(a.c1), f2_mul(a.c0, a.c2));
  Fq2 t = f2_add(f2_mul(a.c2, c1), f2_mul(a.c1, c2));
  t = f2_add(f2_mul_xi(t), f2_mul(a.c0, c0));
  Fq2 tinv = f2_inv(t);
  return {f2_mul(c0, tinv), f2_mul(c1, tinv), f2_mul(c2, tinv)};
}

static const Fq6 F6_ZERO = {F2_ZERO, F2_ZERO, F2_ZERO};
static const Fq6 F6_ONE = {F2_ONE, F2_ZERO, F2_ZERO};

inline Fq6 f6_mul_v(const Fq6 &a) {  // (c0,c1,c2)*v = (xi*c2, c0, c1)
  return {f2_mul_xi(a.c2), a.c0, a.c1};
}

inline Fq12 f12_mul(const Fq12 &a, const Fq12 &b) {
  Fq6 t0 = f6_mul(a.c0, b.c0);
  Fq6 t1 = f6_mul(a.c1, b.c1);
  Fq6 c0 = f6_add(t0, f6_mul_v(t1));
  Fq6 c1 = f6_sub(f6_mul(f6_add(a.c0, a.c1), f6_add(b.c0, b.c1)),
                  f6_add(t0, t1));
  return {c0, c1};
}

inline Fq12 f12_sqr(const Fq12 &a) { return f12_mul(a, a); }
inline Fq12 f12_conj(const Fq12 &a) { return {a.c0, f6_neg(a.c1)}; }

static const Fq12 F12_ONE_C = {F6_ONE, F6_ZERO};

inline bool f12_is_one(const Fq12 &a) {
  return fq_eq(a.c0.c0.c0, ONE_M) && fq_is_zero(a.c0.c0.c1) &&
         f2_is_zero(a.c0.c1) && f2_is_zero(a.c0.c2) &&
         f2_is_zero(a.c1.c0) && f2_is_zero(a.c1.c1) && f2_is_zero(a.c1.c2);
}

// f^e, exponent as little-endian bytes.
inline Fq12 f12_pow_bytes(const Fq12 &a, const uint8_t *e, size_t n) {
  Fq12 result = F12_ONE_C;
  Fq12 base = a;
  for (size_t i = 0; i < n; i++) {
    uint8_t byte = e[i];
    for (int b = 0; b < 8; b++) {
      if ((byte >> b) & 1) result = f12_mul(result, base);
      base = f12_sqr(base);
    }
  }
  return result;
}

// ---------------------------------------------------------------------
// Curve (affine with infinity flags; formulas mirror host_curve.py)
// ---------------------------------------------------------------------
struct G1 { Fq x, y; bool inf; };
struct G2 { Fq2 x, y; bool inf; };

inline G1 g1_add(const G1 &p1, const G1 &p2) {
  if (p1.inf) return p2;
  if (p2.inf) return p1;
  Fq lam;
  if (fq_eq(p1.x, p2.x)) {
    if (fq_is_zero(fq_add(p1.y, p2.y))) return {ZERO, ONE_M, true};
    Fq three_x2 = fq_mul(fq_add(fq_add(p1.x, p1.x), p1.x), p1.x);
    lam = fq_mul(three_x2, fq_inv(fq_add(p1.y, p1.y)));
  } else {
    lam = fq_mul(fq_sub(p2.y, p1.y), fq_inv(fq_sub(p2.x, p1.x)));
  }
  Fq x3 = fq_sub(fq_sub(fq_mul(lam, lam), p1.x), p2.x);
  Fq y3 = fq_sub(fq_mul(lam, fq_sub(p1.x, x3)), p1.y);
  return {x3, y3, false};
}

inline G1 g1_scalar(const G1 &p, const uint8_t *k, size_t kn) {
  G1 acc = {ZERO, ONE_M, true};
  G1 add = p;
  for (size_t i = 0; i < kn; i++) {
    uint8_t byte = k[i];
    for (int b = 0; b < 8; b++) {
      if ((byte >> b) & 1) acc = g1_add(acc, add);
      add = g1_add(add, add);
    }
  }
  return acc;
}

inline G2 g2_add(const G2 &p1, const G2 &p2) {
  if (p1.inf) return p2;
  if (p2.inf) return p1;
  Fq2 lam;
  if (f2_eq(p1.x, p2.x)) {
    if (f2_is_zero(f2_add(p1.y, p2.y))) return {F2_ZERO, F2_ONE, true};
    lam = f2_mul(f2_tpl(f2_sqr(p1.x)), f2_inv(f2_dbl(p1.y)));
  } else {
    lam = f2_mul(f2_sub(p2.y, p1.y), f2_inv(f2_sub(p2.x, p1.x)));
  }
  Fq2 x3 = f2_sub(f2_sub(f2_sqr(lam), p1.x), p2.x);
  Fq2 y3 = f2_sub(f2_mul(lam, f2_sub(p1.x, x3)), p1.y);
  return {x3, y3, false};
}

inline G2 g2_scalar(const G2 &p, const uint8_t *k, size_t kn) {
  G2 acc = {F2_ZERO, F2_ONE, true};
  G2 add = p;
  for (size_t i = 0; i < kn; i++) {
    uint8_t byte = k[i];
    for (int b = 0; b < 8; b++) {
      if ((byte >> b) & 1) acc = g2_add(acc, add);
      add = g2_add(add, add);
    }
  }
  return acc;
}

// ---------------------------------------------------------------------
// Pairing: Miller loop (mirrors host_curve.py:_miller_loop) over
// |x| = 0xD201000000010000, then caller-supplied final exponentiation.
// ---------------------------------------------------------------------
constexpr u64 BLS_X = 0xD201000000010000ULL;

inline Fq12 untwist_line(const Fq2 &lam, const Fq2 &c, const Fq &px, const Fq &py) {
  // a = (xi*py, 0, 0); b = (0, -c, -lam*px)   (see host_curve.py:266)
  Fq2 py2 = {py, ZERO};
  Fq2 px2 = {px, ZERO};
  Fq6 a = {f2_mul_xi(py2), F2_ZERO, F2_ZERO};
  Fq6 b = {F2_ZERO, f2_neg(c), f2_neg(f2_mul(lam, px2))};
  return {a, b};
}

inline Fq12 miller_loop(const G1 &p1, const G2 &p2) {
  Fq12 f = F12_ONE_C;
  G2 t = p2;
  int top = 63;
  while (!((BLS_X >> top) & 1)) top--;
  for (int i = top - 1; i >= 0; i--) {
    // doubling step
    Fq2 lam = f2_mul(f2_tpl(f2_sqr(t.x)), f2_inv(f2_dbl(t.y)));
    Fq2 c = f2_sub(t.y, f2_mul(lam, t.x));
    Fq2 x3 = f2_sub(f2_sqr(lam), f2_dbl(t.x));
    Fq2 y3 = f2_sub(f2_mul(lam, f2_sub(t.x, x3)), t.y);
    t = {x3, y3, false};
    f = f12_mul(f12_sqr(f), untwist_line(lam, c, p1.x, p1.y));
    if ((BLS_X >> i) & 1) {
      // addition step T + Q
      Fq2 lam2;
      if (f2_eq(t.x, p2.x)) {
        lam2 = f2_mul(f2_tpl(f2_sqr(t.x)), f2_inv(f2_dbl(t.y)));
      } else {
        lam2 = f2_mul(f2_sub(p2.y, t.y), f2_inv(f2_sub(p2.x, t.x)));
      }
      Fq2 c2 = f2_sub(t.y, f2_mul(lam2, t.x));
      Fq2 x4 = f2_sub(f2_sub(f2_sqr(lam2), t.x), p2.x);
      Fq2 y4 = f2_sub(f2_mul(lam2, f2_sub(t.x, x4)), t.y);
      t = {x4, y4, false};
      f = f12_mul(f, untwist_line(lam2, c2, p1.x, p1.y));
    }
  }
  return f12_conj(f);  // BLS x is negative
}

// ---------------------------------------------------------------------
// (De)serialization: standard-form u64 limbs <-> Montgomery structs
// ---------------------------------------------------------------------
inline G1 g1_load(const u64 *xy, uint8_t inf) {
  if (inf) return {ZERO, ONE_M, true};
  return {fq_from_std(xy), fq_from_std(xy + NL), false};
}

inline void g1_store(const G1 &p, u64 *xy, uint8_t *inf) {
  *inf = p.inf ? 1 : 0;
  if (p.inf) { std::memset(xy, 0, 2 * NL * 8); return; }
  fq_to_std(p.x, xy);
  fq_to_std(p.y, xy + NL);
}

inline Fq2 f2_load(const u64 *c) { return {fq_from_std(c), fq_from_std(c + NL)}; }

inline void f2_store(const Fq2 &a, u64 *c) {
  fq_to_std(a.c0, c);
  fq_to_std(a.c1, c + NL);
}

inline G2 g2_load(const u64 *xy, uint8_t inf) {
  if (inf) return {F2_ZERO, F2_ONE, true};
  return {f2_load(xy), f2_load(xy + 2 * NL), false};
}

inline void g2_store(const G2 &p, u64 *xy, uint8_t *inf) {
  *inf = p.inf ? 1 : 0;
  if (p.inf) { std::memset(xy, 0, 4 * NL * 8); return; }
  f2_store(p.x, xy);
  f2_store(p.y, xy + 2 * NL);
}

}  // namespace

extern "C" {

// prod_i e(P_i, Q_i) == 1?  exp = (q^12-1)/r as little-endian bytes.
int sczk_pairing_product_is_one(size_t n, const u64 *g1s, const uint8_t *g1_inf,
                                const u64 *g2s, const uint8_t *g2_inf,
                                const uint8_t *exp_le, size_t exp_n) {
  Fq12 f = F12_ONE_C;
  for (size_t i = 0; i < n; i++) {
    G1 p = g1_load(g1s + i * 2 * NL, g1_inf[i]);
    G2 q = g2_load(g2s + i * 4 * NL, g2_inf[i]);
    if (p.inf || q.inf) continue;
    f = f12_mul(f, miller_loop(p, q));
  }
  Fq12 e = f12_pow_bytes(f, exp_le, exp_n);
  return f12_is_one(e) ? 1 : 0;
}

void sczk_g1_add(const u64 *a, uint8_t a_inf, const u64 *b, uint8_t b_inf,
                 u64 *out, uint8_t *out_inf) {
  G1 r = g1_add(g1_load(a, a_inf), g1_load(b, b_inf));
  g1_store(r, out, out_inf);
}

void sczk_g1_scalar_mul(const u64 *p, uint8_t p_inf, const uint8_t *k_le,
                        size_t k_n, u64 *out, uint8_t *out_inf) {
  G1 r = g1_scalar(g1_load(p, p_inf), k_le, k_n);
  g1_store(r, out, out_inf);
}

void sczk_g2_add(const u64 *a, uint8_t a_inf, const u64 *b, uint8_t b_inf,
                 u64 *out, uint8_t *out_inf) {
  G2 r = g2_add(g2_load(a, a_inf), g2_load(b, b_inf));
  g2_store(r, out, out_inf);
}

void sczk_g2_scalar_mul(const u64 *p, uint8_t p_inf, const uint8_t *k_le,
                        size_t k_n, u64 *out, uint8_t *out_inf) {
  G2 r = g2_scalar(g2_load(p, p_inf), k_le, k_n);
  g2_store(r, out, out_inf);
}

// MSM oracle: sum_i k_i * P_i with 32-byte scalars.
void sczk_g1_msm(size_t n, const u64 *pts, const uint8_t *infs,
                 const uint8_t *ks_le, u64 *out, uint8_t *out_inf) {
  G1 acc = {ZERO, ONE_M, true};
  for (size_t i = 0; i < n; i++) {
    G1 p = g1_load(pts + i * 2 * NL, infs[i]);
    acc = g1_add(acc, g1_scalar(p, ks_le + 32 * i, 32));
  }
  g1_store(acc, out, out_inf);
}

}  // extern "C"
