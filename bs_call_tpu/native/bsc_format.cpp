// bsc_format: native VCF text row assembly.
//
// The block-vectorized emitter computes all output fields as arrays
// (output/vector_site.py); this function turns them into VCF text rows in
// one pass, replacing the per-row Python formatting loop (the analogue of
// print_vcf.c's record encoding, but for text output). String-valued
// lookup tables are passed in from Python so the two paths share one
// source of truth.

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

inline char *put_str(char *p, const char *s) {
    while (*s) *p++ = *s++;
    return p;
}

inline char *put_int(char *p, long long v) {
    if (v < 0) {
        *p++ = '-';
        v = -v;
    }
    char tmp[20];
    int n = 0;
    do {
        tmp[n++] = '0' + (v % 10);
        v /= 10;
    } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}

}  // namespace

extern "C" {

// Returns bytes written, or -1 if out_cap is insufficient.
// LUT blobs: fixed-stride char arrays, NUL-terminated entries.
int64_t bsc_format_rows(
    int64_t n, const char *ctg_name,
    const int64_t *pos, const int32_t *g, const int32_t *r,
    const int64_t *flt, const uint8_t *mac1, const int64_t *phred,
    const int64_t *dp1, const int32_t *mq, const int64_t *qd,
    const int64_t *fs_int, const uint8_t *het,
    const float *gl_vals, const int32_t *gl_len,
    const int32_t *counts, const int32_t *quals,
    const uint8_t *is_cg, const int64_t *cg_code,
    const char *prf, const char *ctx,
    const int64_t *rs_off, const char *rs_blob,
    const char *gt_lut, int gt_stride,
    const char *alt_lut, int alt_stride,
    const char *cs_lut, int cs_stride,
    const char *ft_lut, int ft_stride,
    const char *pbase,
    char *out, int64_t out_cap) {
    char *p = out;
    char *end = out + out_cap - 512;  // per-row safety margin
    for (int64_t i = 0; i < n; i++) {
        if (p >= end) return -1;
        int gi = g[i];
        int ri = r[i];
        const char *filt;
        const char *ft;
        if (flt[i]) {
            filt = "fail";
            ft = ft_lut + (flt[i] & 15) * ft_stride;
        } else if (mac1[i]) {
            filt = "mac1";
            ft = ft_lut;  // "PASS"
        } else {
            filt = "PASS";
            ft = ft_lut;
        }
        p = put_str(p, ctg_name);
        *p++ = '\t';
        p = put_int(p, pos[i]);
        *p++ = '\t';
        if (rs_off && rs_off[i + 1] > rs_off[i]) {
            memcpy(p, rs_blob + rs_off[i], rs_off[i + 1] - rs_off[i]);
            p += rs_off[i + 1] - rs_off[i];
        } else *p++ = '.';
        *p++ = '\t';
        *p++ = pbase[ri];
        *p++ = '\t';
        p = put_str(p, alt_lut + (gi * 5 + ri) * alt_stride);
        *p++ = '\t';
        p = put_int(p, phred[i]);
        *p++ = '\t';
        p = put_str(p, filt);
        p = put_str(p, "\tCX=");
        memcpy(p, prf + i * 5, 5);
        p += 5;
        p = put_str(p, het[i]
                        ? "\tGT:FT:DP:MQ:GQ:QD:GL:MC8:AMQ:CS:CG:CX:FS\t"
                        : "\tGT:FT:DP:MQ:GQ:QD:GL:MC8:AMQ:CS:CG:CX\t");
        p = put_str(p, gt_lut + (gi * 5 + ri) * gt_stride);
        *p++ = ':';
        p = put_str(p, ft);
        *p++ = ':';
        p = put_int(p, dp1[i]);
        *p++ = ':';
        p = put_int(p, mq[i]);
        *p++ = ':';
        p = put_int(p, phred[i]);
        *p++ = ':';
        p = put_int(p, qd[i]);
        *p++ = ':';
        for (int k = 0; k < gl_len[i]; k++) {
            if (k) *p++ = ',';
            p += sprintf(p, "%g", (double)gl_vals[i * 5 + k]);
        }
        *p++ = ':';
        for (int k = 0; k < 8; k++) {
            if (k) *p++ = ',';
            p = put_int(p, counts[i * 8 + k]);
        }
        *p++ = ':';
        bool first = true;
        for (int k = 0; k < 8; k++) {
            if (counts[i * 8 + k] > 0) {
                if (!first) *p++ = ',';
                p = put_int(p, quals[i * 8 + k]);
                first = false;
            }
        }
        *p++ = ':';
        p = put_str(p, cs_lut + gi * cs_stride);
        *p++ = ':';
        if (is_cg[i]) {
            *p++ = 'C';
            *p++ = 'G';
        } else {
            *p++ = (char)cg_code[i];
        }
        *p++ = ':';
        memcpy(p, ctx + i * 5, 5);
        p += 5;
        if (het[i]) {
            *p++ = ':';
            p = put_int(p, fs_int[i]);
        }
        *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
