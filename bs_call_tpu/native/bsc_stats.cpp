// bsc_stats: batched statistics kernels for the emit path.
//
// Fisher 2x2 exact test (two-sided, both-diagonal walk) matching the
// reference algorithm (stats_utils.c:25-91) bit-for-bit: the log-factorial
// memo table is built with the same serial accumulation of log(i), and all
// transcendentals are glibc libm, the same functions the C binary links.
// The Python scalar twin is bs_call_tpu/ops/oracle.py::fisher; randomized
// parity between the two is enforced by tests/test_native.py.

#include <cmath>
#include <cstdint>

namespace {

constexpr int kLfactSize = 256;  // bs_call.h:335 analogue
double g_lfact[kLfactSize];
bool g_lfact_ready = false;

void lfact_init() {
    if (g_lfact_ready) return;
    double l = 0.0;
    g_lfact[0] = 0.0;
    if (kLfactSize > 1) g_lfact[1] = 0.0;
    for (int i = 2; i < kLfactSize; i++) {
        l += log((double)i);
        g_lfact[i] = l;
    }
    g_lfact_ready = true;
}

inline double lfact(long long x) {
    if (x < kLfactSize) return g_lfact[x];
    return lgamma((double)x + 1.0);
}

double fisher2x2(long long c0, long long c1, long long c2, long long c3) {
    long long row0 = c0 + c1, row1 = c2 + c3;
    long long col0 = c0 + c2, col1 = c1 + c3;
    long long n = row0 + row1;
    if (n == 0) return 1.0;
    double delta = (double)c0 - (double)(row0 * col0) / (double)n;
    double knst =
        lfact(col0) + lfact(col1) + lfact(row0) + lfact(row1) - lfact(n);
    double l =
        exp(knst - lfact(c0) - lfact(c1) - lfact(c2) - lfact(c3));
    double p = l;
    if (delta > 0.0) {
        long long mn = c1 < c2 ? c1 : c2;
        for (long long i = 0; i < mn; i++) {
            l *= (double)((c1 - i) * (c2 - i)) /
                 (double)((c0 + i + 1) * (c3 + i + 1));
            p += l;
        }
        mn = c0 < c3 ? c0 : c3;
        long long k = (long long)ceil(2.0 * delta);
        if (k <= mn) {
            c0 -= k;
            c3 -= k;
            c1 += k;
            c2 += k;
            l = exp(knst - lfact(c0) - lfact(c1) - lfact(c2) - lfact(c3));
            p += l;
            for (long long i = 0; i < mn - k; i++) {
                l *= (double)((c0 - i) * (c3 - i)) /
                     (double)((c1 + i + 1) * (c2 + i + 1));
                p += l;
            }
        }
    } else {
        long long mn = c0 < c3 ? c0 : c3;
        for (long long i = 0; i < mn; i++) {
            l *= (double)((c0 - i) * (c3 - i)) /
                 (double)((c1 + i + 1) * (c2 + i + 1));
            p += l;
        }
        mn = c1 < c2 ? c1 : c2;
        long long k = (long long)ceil(-2.0 * delta);
        if (!k) k = 1;
        if (k <= mn) {
            c0 += k;
            c3 += k;
            c1 -= k;
            c2 -= k;
            l = exp(knst - lfact(c0) - lfact(c1) - lfact(c2) - lfact(c3));
            p += l;
            for (long long i = 0; i < mn - k; i++) {
                l *= (double)((c1 - i) * (c2 - i)) /
                     (double)((c0 + i + 1) * (c3 + i + 1));
                p += l;
            }
        }
    }
    return p;
}

}  // namespace

extern "C" {

// ftab: [n,4] int64 2x2 tables; out: [n] f64 phred-ready log10 p-values
// (log(p)/log(10), clamped below at log10(1e-20) like call_genotypes.c).
void bsc_fisher_batch(int64_t n, const int64_t *ftab, double *out) {
    lfact_init();
    const double kLog10 = 2.30258509299404568402;  // bs_call.h:36
    for (int64_t i = 0; i < n; i++) {
        double z = fisher2x2(ftab[i * 4], ftab[i * 4 + 1], ftab[i * 4 + 2],
                             ftab[i * 4 + 3]);
        if (z < 1.0e-20) z = 1.0e-20;
        out[i] = log(z) / kLog10;
    }
}

}  // extern "C"
