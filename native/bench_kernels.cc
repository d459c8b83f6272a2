// Standalone microbenchmark for the native field/curve kernels.
// Build+run:  g++ -O3 -funroll-loops -march=native -std=c++17 \
//               -o build/bench_kernels bench_kernels.cc && build/bench_kernels
//
// Measures the primitive costs that bound the MSM (the framework's #1
// CPU hotspot): Montgomery mul (4- and 6-word), Jacobian mixed/full
// adds, and the batched-affine add (the target formulation).  Chained
// (latency) and independent (throughput) variants are both reported —
// Pippenger bucket accumulation exposes ~bucket-count-way ILP, so the
// throughput number is the relevant bound.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

// BLS12-381 Fq modulus (6 words little-endian)
static const u64 FQ_P[6] = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                            0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                            0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
// BLS12-381 Fr modulus (4 words)
static const u64 FR_P[4] = {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
                            0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

template <int NW>
struct Fp {
  u64 p[NW];
  u64 n0inv;
  void init(const u64 *mod) {
    std::memcpy(p, mod, sizeof(p));
    u64 inv = p[0];
    for (int k = 0; k < 6; k++) inv *= 2 - p[0] * inv;
    n0inv = 0 - inv;
  }
  inline bool geq_p(const u64 *a) const {
    for (int i = NW - 1; i >= 0; i--) {
      if (a[i] > p[i]) return true;
      if (a[i] < p[i]) return false;
    }
    return true;
  }
  inline void sub_p(u64 *a) const {
    u128 borrow = 0;
    for (int i = 0; i < NW; i++) {
      u128 d = (u128)a[i] - p[i] - borrow;
      a[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
  }
  inline void add(const u64 *a, const u64 *b, u64 *r) const {
    u128 carry = 0;
    for (int i = 0; i < NW; i++) {
      u128 s = (u128)a[i] + b[i] + carry;
      r[i] = (u64)s;
      carry = s >> 64;
    }
    if (carry || geq_p(r)) sub_p(r);
  }
  inline void sub(const u64 *a, const u64 *b, u64 *r) const {
    u128 borrow = 0;
    for (int i = 0; i < NW; i++) {
      u128 d = (u128)a[i] - b[i] - borrow;
      r[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
    if (borrow) {
      u128 carry = 0;
      for (int i = 0; i < NW; i++) {
        u128 s = (u128)r[i] + p[i] + carry;
        r[i] = (u64)s;
        carry = s >> 64;
      }
    }
  }
  inline void mul(const u64 *a, const u64 *b, u64 *out) const {
    u64 t[NW + 2] = {0};
    for (int i = 0; i < NW; i++) {
      u128 carry = 0;
      for (int j = 0; j < NW; j++) {
        u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
        t[j] = (u64)s;
        carry = s >> 64;
      }
      u128 s = (u128)t[NW] + carry;
      t[NW] = (u64)s;
      t[NW + 1] = (u64)(s >> 64);
      u64 m = t[0] * n0inv;
      carry = ((u128)t[0] + (u128)m * p[0]) >> 64;
      for (int j = 1; j < NW; j++) {
        u128 s2 = (u128)t[j] + (u128)m * p[j] + carry;
        t[j - 1] = (u64)s2;
        carry = s2 >> 64;
      }
      s = (u128)t[NW] + carry;
      t[NW - 1] = (u64)s;
      t[NW] = t[NW + 1] + (u64)(s >> 64);
      t[NW + 1] = 0;
    }
    std::memcpy(out, t, NW * sizeof(u64));
    if (t[NW] || geq_p(out)) sub_p(out);
  }
};

static inline double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

template <int NW, class F>
void bench_mul(const F &f, const char *tag) {
  // latency: dependent squaring chain
  u64 x[NW];
  for (int i = 0; i < NW; i++) x[i] = 0x123456789abcdefULL * (i + 1) + 7;
  if (f.geq_p(x)) f.sub_p(x);
  const int iters = 3'000'000;
  double t0 = now_s();
  for (int i = 0; i < iters; i++) f.mul(x, x, x);
  double lat = (now_s() - t0) / iters * 1e9;
  // throughput: 8 independent chains
  u64 xs[8][NW];
  for (int k = 0; k < 8; k++) {
    for (int i = 0; i < NW; i++) xs[k][i] = x[i] + k + 1;
    if (f.geq_p(xs[k])) f.sub_p(xs[k]);
  }
  t0 = now_s();
  for (int i = 0; i < iters / 8; i++)
    for (int k = 0; k < 8; k++) f.mul(xs[k], xs[k], xs[k]);
  double thr = (now_s() - t0) / iters * 1e9;
  volatile u64 sink = x[0] ^ xs[0][0];
  (void)sink;
  std::printf("%-12s latency %6.1f ns   throughput %6.1f ns\n", tag, lat, thr);
}

struct Jac {
  u64 x[6], y[6], z[6];
};

// mixed add (madd-2007-bl), Z2 == 1
static Fp<6> FQ;
static inline void jac_add_mixed(const Jac &p1, const u64 *x2, const u64 *y2,
                                 Jac &r) {
  u64 Z1Z1[6], U2[6], S2[6], t[6];
  FQ.mul(p1.z, p1.z, Z1Z1);
  FQ.mul(x2, Z1Z1, U2);
  FQ.mul(y2, p1.z, t);
  FQ.mul(t, Z1Z1, S2);
  u64 H[6], rr[6];
  FQ.sub(U2, p1.x, H);
  FQ.sub(S2, p1.y, rr);
  u64 HH[6], I[6], J[6], r2[6], V[6];
  FQ.mul(H, H, HH);
  FQ.add(HH, HH, I);
  FQ.add(I, I, I);
  FQ.mul(H, I, J);
  FQ.add(rr, rr, r2);
  FQ.mul(p1.x, I, V);
  u64 X3[6], Y3[6], Z3[6];
  FQ.mul(r2, r2, t);
  FQ.sub(t, J, t);
  FQ.sub(t, V, t);
  FQ.sub(t, V, X3);
  FQ.sub(V, X3, t);
  FQ.mul(r2, t, t);
  u64 sj[6];
  FQ.mul(p1.y, J, sj);
  FQ.add(sj, sj, sj);
  FQ.sub(t, sj, Y3);
  FQ.mul(p1.z, H, t);
  FQ.add(t, t, Z3);
  std::memcpy(r.x, X3, 48);
  std::memcpy(r.y, Y3, 48);
  std::memcpy(r.z, Z3, 48);
}

// batched-affine add core: given precomputed lambda = (y2-y1)/(x2-x1)
// (the inversion amortized by the Montgomery batch), the per-add cost is
//   x3 = l^2 - x1 - x2 ; y3 = l (x1 - x3) - y1       (1S + 1M + 3 sub)
// plus ~3 muls/element for the shared batch inversion.
static inline void aff_add_with_lambda(const u64 *l, const u64 *x1,
                                       const u64 *y1, const u64 *x2, u64 *x3,
                                       u64 *y3) {
  u64 t[6];
  FQ.mul(l, l, t);
  FQ.sub(t, x1, t);
  FQ.sub(t, x2, x3);
  u64 d[6];
  FQ.sub(x1, x3, d);
  FQ.mul(l, d, t);
  FQ.sub(t, y1, y3);
}

int main() {
  Fp<4> fr;
  fr.init(FR_P);
  FQ.init(FQ_P);
  bench_mul<4>(fr, "fr.mul(4w)");
  bench_mul<6>(FQ, "fq.mul(6w)");

  // point add benchmarks on pseudo-points (field-valid garbage — the
  // group law formulas execute identically on any residues)
  const int N = 1 << 14;
  std::vector<Jac> pts(N);
  for (int i = 0; i < N; i++) {
    for (int k = 0; k < 6; k++) {
      pts[i].x[k] = 0x9e3779b97f4a7c15ULL * (i + k + 1);
      pts[i].y[k] = 0xc2b2ae3d27d4eb4fULL * (i + 2 * k + 3);
      pts[i].z[k] = 0x165667b19e3779f9ULL * (i + 3 * k + 7);
    }
    if (FQ.geq_p(pts[i].x)) FQ.sub_p(pts[i].x);
    if (FQ.geq_p(pts[i].y)) FQ.sub_p(pts[i].y);
    if (FQ.geq_p(pts[i].z)) FQ.sub_p(pts[i].z);
  }
  {
    Jac acc = pts[0];
    const int iters = 400'000;
    double t0 = now_s();
    for (int i = 0; i < iters; i++)
      jac_add_mixed(acc, pts[i % N].x, pts[i % N].y, acc);
    double dt = (now_s() - t0) / iters * 1e9;
    std::printf("jac_add_mixed (8M+3S chained)      %7.1f ns\n", dt);
  }
  {
    // 8 independent accumulators (bucket-style ILP)
    Jac accs[8];
    for (int k = 0; k < 8; k++) accs[k] = pts[k];
    const int iters = 400'000;
    double t0 = now_s();
    for (int i = 0; i < iters / 8; i++)
      for (int k = 0; k < 8; k++)
        jac_add_mixed(accs[k], pts[(i * 8 + k) % N].x, pts[(i * 8 + k) % N].y,
                      accs[k]);
    double dt = (now_s() - t0) / iters * 1e9;
    std::printf("jac_add_mixed (8-way independent)  %7.1f ns\n", dt);
  }
  {
    // batched-affine wave: batch-invert 256 denominators, then apply
    const int B = 256, iters = 100'000;
    std::vector<u64> den(B * 6), pre(B * 6), lam(B * 6);
    std::vector<Jac> acc(B);
    for (int i = 0; i < B; i++) acc[i] = pts[i];
    double t0 = now_s();
    for (int it = 0; it < iters / B; it++) {
      // forward product pass
      u64 run[6] = {1, 0, 0, 0, 0, 0};
      for (int i = 0; i < B; i++) {
        const u64 *d = pts[(it * B + i) % N].x;
        std::memcpy(pre.data() + i * 6, run, 48);
        FQ.mul(run, d, run);
      }
      // one inversion stand-in: ~380 muls (Fermat) — amortized over B
      u64 rinv[6];
      std::memcpy(rinv, run, 48);
      for (int k = 0; k < 380; k++) FQ.mul(rinv, rinv, rinv);
      // backward pass + affine add application
      for (int i = B - 1; i >= 0; i--) {
        const u64 *d = pts[(it * B + i) % N].x;
        FQ.mul(rinv, pre.data() + i * 6, lam.data() + i * 6);
        FQ.mul(rinv, d, rinv);
        aff_add_with_lambda(lam.data() + i * 6, acc[i % B].x, acc[i % B].y,
                            pts[(it * B + i) % N].x, acc[i % B].x,
                            acc[i % B].y);
      }
    }
    double dt = (now_s() - t0) / ((iters / B) * B) * 1e9;
    std::printf("batched-affine add (B=256 waves)   %7.1f ns\n", dt);
  }
  return 0;
}
