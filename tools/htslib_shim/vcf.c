/* VCF/BCF writing for the htslib shim (see README.md).
 *
 * bs_call encodes records as BCF2 typed streams (print_vcf.c:160-380:
 * shared = ID, alleles, FILTER, INFO pairs; indiv = n_fmt (key, value)
 * pairs for one sample) and pokes the header dictionaries directly, so
 * bcf_hdr_t here keeps the layout print_vcf.c:745-766 expects and
 * bcf_hdr_append maintains a khash(vdict) of bcf_idinfo_t over a
 * single shared FILTER/INFO/FORMAT id space with PASS seeded at id 0
 * (htslib semantics). bcf_write decodes the typed streams back to VCF
 * text; float formatting is %g of the float32 value, matching both
 * htslib's behavior and the bs_call_tpu emitters
 * (output/vcf_writer.py:fmt_float). */

#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/khash.h"
#include "htslib/kstring.h"
#include "htslib/vcf.h"

KHASH_MAP_INIT_STR(vdict, bcf_idinfo_t)

/* ---------- header ---------- */

static void hdr_add_id(bcf_hdr_t *h, int dt, const char *key,
                       uint32_t ctg_len) {
    khash_t(vdict) *d = (khash_t(vdict) *)h->dict[dt];
    khint_t k = kh_get(vdict, d, key);
    if (k != kh_end(d)) return;
    char *owned = strdup(key);
    int ret;
    k = kh_put(vdict, d, owned, &ret);
    bcf_idinfo_t vi;
    memset(&vi, 0, sizeof vi);
    vi.id = h->n[dt];
    kh_val(d, k) = vi;
    if (h->n[dt] == h->m[dt]) {
        h->m[dt] = h->m[dt] ? h->m[dt] * 2 : 16;
        h->id[dt] = (bcf_idpair_t *)realloc(
            h->id[dt], (size_t)h->m[dt] * sizeof(bcf_idpair_t));
        if (dt == BCF_DT_CTG)
            h->ctg_len = (uint32_t *)realloc(
                h->ctg_len, (size_t)h->m[dt] * sizeof(uint32_t));
    }
    h->id[dt][h->n[dt]].key = owned;
    h->id[dt][h->n[dt]].val = &kh_val(d, k);
    if (dt == BCF_DT_CTG) h->ctg_len[h->n[dt]] = ctg_len;
    h->n[dt]++;
}

bcf_hdr_t *bcf_hdr_init(const char *mode) {
    (void)mode;
    bcf_hdr_t *h = (bcf_hdr_t *)calloc(1, sizeof(bcf_hdr_t));
    if (!h) return NULL;
    for (int i = 0; i < 3; i++) h->dict[i] = kh_init(vdict);
    hdr_add_id(h, BCF_DT_ID, "PASS", 0);
    return h;
}

void bcf_hdr_destroy(bcf_hdr_t *h) {
    if (!h) return;
    for (int i = 0; i < 3; i++) {
        /* keys are owned by the id arrays (same pointers in the dict) */
        for (int j = 0; j < h->n[i]; j++) free((char *)h->id[i][j].key);
        kh_destroy(vdict, (khash_t(vdict) *)h->dict[i]);
        free(h->id[i]);
    }
    for (int i = 0; i < h->n_samples; i++) free(h->samples[i]);
    free(h->samples);
    free(h->ctg_len);
    free(h->text.s);
    free(h);
}

/* Extract the ID=... value from a ##TYPE=<...> header line. */
static int parse_hdr_id(const char *line, char *out, size_t cap,
                        uint32_t *ctg_len) {
    const char *p = strchr(line, '<');
    if (!p) return -1;
    const char *idp = strstr(p, "ID=");
    if (!idp) return -1;
    idp += 3;
    size_t n = 0;
    while (idp[n] && idp[n] != ',' && idp[n] != '>' && n < cap - 1) n++;
    memcpy(out, idp, n);
    out[n] = 0;
    if (ctg_len) {
        const char *lp = strstr(p, "length=");
        *ctg_len = lp ? (uint32_t)strtoul(lp + 7, NULL, 10) : 0;
    }
    return n ? 0 : -1;
}

int bcf_hdr_append(bcf_hdr_t *h, const char *line) {
    kputs(line, &h->text);
    /* htslib parses structured lines into hrecs and regenerates them
     * closed; emulate for lines missing the trailing '>' (the
     * reference's FS FORMAT line, print_vcf.c:741) */
    int structured =
        !strncmp(line, "##FILTER=<", 10) || !strncmp(line, "##INFO=<", 8) ||
        !strncmp(line, "##FORMAT=<", 10) || !strncmp(line, "##contig=<", 10);
    while (h->text.l &&
           (h->text.s[h->text.l - 1] == '\n' ||
            h->text.s[h->text.l - 1] == '\r'))
        h->text.l--;
    if (structured && h->text.l && h->text.s[h->text.l - 1] != '>')
        kputc('>', &h->text);
    kputc('\n', &h->text);
    char id[1024];
    uint32_t len = 0;
    if (!strncmp(line, "##FILTER=", 9) || !strncmp(line, "##INFO=", 7) ||
        !strncmp(line, "##FORMAT=", 9)) {
        if (!parse_hdr_id(line, id, sizeof id, NULL))
            hdr_add_id(h, BCF_DT_ID, id, 0);
    } else if (!strncmp(line, "##contig=", 9)) {
        if (!parse_hdr_id(line, id, sizeof id, &len))
            hdr_add_id(h, BCF_DT_CTG, id, len);
    }
    return 0;
}

int bcf_hdr_printf(bcf_hdr_t *h, const char *fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    char *buf = NULL;
    int n = vasprintf(&buf, fmt, ap);
    va_end(ap);
    if (n < 0) return -1;
    int ret = bcf_hdr_append(h, buf);
    free(buf);
    return ret;
}

const char *bcf_hdr_get_version(const bcf_hdr_t *h) {
    (void)h;
    return "VCFv4.2";
}

int bcf_hdr_add_sample(bcf_hdr_t *h, const char *sample) {
    if (!sample) return 0;
    if (h->n_samples == h->m_samples) {
        h->m_samples = h->m_samples ? h->m_samples * 2 : 4;
        h->samples = (char **)realloc(
            h->samples, (size_t)h->m_samples * sizeof(char *));
    }
    h->samples[h->n_samples++] = strdup(sample);
    hdr_add_id(h, BCF_DT_SAMPLE, sample, 0);
    return 0;
}

static int hts_emit(htsFile *fp, const char *s, size_t l) {
    if (fp->is_bgzf) return bgzf_write(fp->bgzf, s, l) == (ssize_t)l ? 0 : -1;
    return fwrite(s, 1, l, fp->fp) == l ? 0 : -1;
}

int bcf_hdr_write(htsFile *fp, bcf_hdr_t *h) {
    kstring_t out = {0, 0, NULL};
    kputsn(h->text.s ? h->text.s : "", h->text.l, &out);
    kputs("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO", &out);
    if (h->n_samples) {
        kputs("\tFORMAT", &out);
        for (int i = 0; i < h->n_samples; i++) {
            kputc('\t', &out);
            kputs(h->samples[i], &out);
        }
    }
    kputc('\n', &out);
    int ret;
    if (fp->is_bin) {
        /* BCF2.2 header block (htslib bcf_hdr_write): magic, l_text
         * (including the trailing NUL), text */
        kputc('\0', &out);
        kstring_t head = {0, 0, NULL};
        kputsn("BCF\2\2", 5, &head);
        uint32_t l_text = (uint32_t)out.l;
        kputsn_((char *)&l_text, 4, &head);
        ret = hts_emit(fp, head.s, head.l);
        if (ret == 0) ret = hts_emit(fp, out.s, out.l);
        free(head.s);
    } else {
        ret = hts_emit(fp, out.s, out.l);
    }
    free(out.s);
    return ret;
}

/* ---------- records ---------- */

bcf1_t *bcf_init(void) { return (bcf1_t *)calloc(1, sizeof(bcf1_t)); }

void bcf_destroy(bcf1_t *v) {
    if (v) {
        free(v->shared.s);
        free(v->indiv.s);
        free(v);
    }
}

void bcf_clear(bcf1_t *v) {
    v->shared.l = 0;
    v->indiv.l = 0;
    v->rid = 0;
    v->pos = 0;
    v->rlen = 0;
    v->qual = 0;
    v->n_info = v->n_allele = v->n_fmt = v->n_sample = 0;
}

/* BCF2 typed-value encoders (spec section 6.3). */

void bcf_enc_size(kstring_t *s, int size, int type) {
    if (size < 15) {
        kputc_((size << 4) | type, s);
    } else {
        kputc_((15 << 4) | type, s);
        if (size < 128) {
            kputc_((1 << 4) | BCF_BT_INT8, s);
            kputc_(size, s);
        } else if (size < 32768) {
            int16_t x = (int16_t)size;
            kputc_((1 << 4) | BCF_BT_INT16, s);
            kputsn_((char *)&x, 2, s);
        } else {
            int32_t x = size;
            kputc_((1 << 4) | BCF_BT_INT32, s);
            kputsn_((char *)&x, 4, s);
        }
    }
}

static void enc_int_body(kstring_t *s, int32_t x, int type) {
    if (type == BCF_BT_INT8) {
        kputc_(x & 0xff, s);
    } else if (type == BCF_BT_INT16) {
        int16_t v = (int16_t)x;
        kputsn_((char *)&v, 2, s);
    } else {
        int32_t v = x;
        kputsn_((char *)&v, 4, s);
    }
}

static int int_type(int32_t x) {
    if (x >= -120 && x <= 127) return BCF_BT_INT8;
    if (x >= -32760 && x <= 32767) return BCF_BT_INT16;
    return BCF_BT_INT32;
}

void bcf_enc_int1(kstring_t *s, int32_t x) {
    int t = int_type(x);
    bcf_enc_size(s, 1, t);
    enc_int_body(s, x, t);
}

void bcf_enc_vint(kstring_t *s, int n, int32_t *a, int wsize) {
    (void)wsize;
    if (n == 0) {
        bcf_enc_size(s, 0, BCF_BT_INT8);
        return;
    }
    int t = BCF_BT_INT8;
    for (int i = 0; i < n; i++) {
        int ti = int_type(a[i]);
        if (ti > t) t = ti;
    }
    bcf_enc_size(s, n, t);
    for (int i = 0; i < n; i++) enc_int_body(s, a[i], t);
}

void bcf_enc_vchar(kstring_t *s, int l, const char *a) {
    bcf_enc_size(s, l, BCF_BT_CHAR);
    kputsn_(a, (size_t)l, s);
}

void bcf_enc_vfloat(kstring_t *s, int n, float *a) {
    bcf_enc_size(s, n, BCF_BT_FLOAT);
    kputsn_((char *)a, (size_t)n * 4, s);
}

/* Typed-value decoder. */
typedef struct {
    int type, size;
    const uint8_t *body;
} tval_t;

static const uint8_t *dec_typed(const uint8_t *p, tval_t *out) {
    int b = *p++;
    out->type = b & 0xf;
    out->size = b >> 4;
    if (out->size == 15) {
        tval_t n;
        p = dec_typed(p, &n);
        int32_t v = 0;
        if (n.type == BCF_BT_INT8) v = *(int8_t *)n.body;
        else if (n.type == BCF_BT_INT16) memcpy(&v, n.body, 2), v = (int16_t)v;
        else memcpy(&v, n.body, 4);
        out->size = v;
    }
    out->body = p;
    int w = out->type == BCF_BT_INT16   ? 2
            : out->type == BCF_BT_INT32 ? 4
            : out->type == BCF_BT_FLOAT ? 4
                                        : 1;
    if (out->type == BCF_BT_NULL) w = 0;
    return p + w * out->size;
}

static int32_t tval_int(const tval_t *t, int i) {
    if (t->type == BCF_BT_INT8) return ((int8_t *)t->body)[i];
    if (t->type == BCF_BT_INT16) {
        int16_t v;
        memcpy(&v, t->body + 2 * i, 2);
        return v;
    }
    int32_t v;
    memcpy(&v, t->body + 4 * i, 4);
    return v;
}

/* %g of the float32 value (htslib float style; matches
 * bs_call_tpu/output/vcf_writer.py fmt_float). */
static void put_float(kstring_t *s, float f) { ksprintf(s, "%g", f); }

static void put_quoted_chars(kstring_t *s, const tval_t *t) {
    kputsn((const char *)t->body, (size_t)t->size, s);
}

int bcf_write(htsFile *fp, bcf_hdr_t *h, bcf1_t *v) {
    if (fp->is_bin) {
        /* BCF2.2 record framing (htslib bcf_write core): l_shared
         * counts the six fixed 32-bit fields plus the shared typed
         * stream; the streams themselves were already encoded by the
         * caller through bcf_enc_* above */
        uint32_t x[8];
        x[0] = (uint32_t)(v->shared.l + 24);
        x[1] = (uint32_t)v->indiv.l;
        x[2] = (uint32_t)v->rid;
        x[3] = (uint32_t)v->pos;
        x[4] = (uint32_t)v->rlen;
        memcpy(&x[5], &v->qual, 4);
        x[6] = ((uint32_t)v->n_allele << 16) | (uint32_t)v->n_info;
        x[7] = ((uint32_t)v->n_fmt << 24) | (uint32_t)v->n_sample;
        if (hts_emit(fp, (const char *)x, 32)) return -1;
        if (v->shared.l &&
            hts_emit(fp, v->shared.s, v->shared.l))
            return -1;
        if (v->indiv.l && hts_emit(fp, v->indiv.s, v->indiv.l))
            return -1;
        return 0;
    }
    kstring_t out = {0, 0, NULL};
    /* CHROM POS */
    const char *chrom =
        v->rid >= 0 && v->rid < h->n[BCF_DT_CTG] ? h->id[BCF_DT_CTG][v->rid].key
                                                 : "?";
    ksprintf(&out, "%s\t%lld\t", chrom, (long long)(v->pos + 1));
    const uint8_t *p = (const uint8_t *)v->shared.s;
    tval_t t;
    /* ID */
    p = dec_typed(p, &t);
    if (t.size == 0) kputc('.', &out);
    else put_quoted_chars(&out, &t);
    kputc('\t', &out);
    /* REF + ALTs */
    for (int i = 0; i < v->n_allele; i++) {
        p = dec_typed(p, &t);
        if (i == 1) kputc('\t', &out);
        else if (i > 1) kputc(',', &out);
        put_quoted_chars(&out, &t);
    }
    if (v->n_allele == 1) kputs("\t.", &out);
    kputc('\t', &out);
    /* QUAL */
    put_float(&out, v->qual);
    kputc('\t', &out);
    /* FILTER */
    p = dec_typed(p, &t);
    if (t.size == 0) kputc('.', &out);
    for (int i = 0; i < t.size; i++) {
        if (i) kputc(';', &out);
        int32_t fid = tval_int(&t, i);
        kputs(fid >= 0 && fid < h->n[BCF_DT_ID] ? h->id[BCF_DT_ID][fid].key
                                                : "?",
              &out);
    }
    kputc('\t', &out);
    /* INFO */
    if (v->n_info == 0) kputc('.', &out);
    for (int i = 0; i < v->n_info; i++) {
        tval_t key, val;
        p = dec_typed(p, &key);
        int32_t kid = tval_int(&key, 0);
        p = dec_typed(p, &val);
        if (i) kputc(';', &out);
        kputs(kid >= 0 && kid < h->n[BCF_DT_ID] ? h->id[BCF_DT_ID][kid].key
                                                : "?",
              &out);
        if (val.type == BCF_BT_CHAR) {
            kputc('=', &out);
            put_quoted_chars(&out, &val);
        } else if (val.size > 0) {
            kputc('=', &out);
            for (int j = 0; j < val.size; j++) {
                if (j) kputc(',', &out);
                if (val.type == BCF_BT_FLOAT) {
                    float f;
                    memcpy(&f, val.body + 4 * j, 4);
                    put_float(&out, f);
                } else {
                    kputw(tval_int(&val, j), &out);
                }
            }
        }
    }
    /* FORMAT + one sample (bs_call always writes n_sample==1) */
    if (v->n_fmt > 0) {
        kstring_t names = {0, 0, NULL}, vals = {0, 0, NULL};
        const uint8_t *q = (const uint8_t *)v->indiv.s;
        for (int i = 0; i < v->n_fmt; i++) {
            tval_t key, val;
            q = dec_typed(q, &key);
            int32_t kid = tval_int(&key, 0);
            q = dec_typed(q, &val);
            const char *kname = kid >= 0 && kid < h->n[BCF_DT_ID]
                                    ? h->id[BCF_DT_ID][kid].key
                                    : "?";
            if (i) {
                kputc(':', &names);
                kputc(':', &vals);
            }
            kputs(kname, &names);
            if (!strcmp(kname, "GT")) {
                for (int j = 0; j < val.size; j++) {
                    int32_t g = tval_int(&val, j);
                    if (j) kputc((g & 1) ? '|' : '/', &vals);
                    if (g >> 1 == 0) kputc('.', &vals);
                    else kputw((g >> 1) - 1, &vals);
                }
            } else if (val.type == BCF_BT_CHAR) {
                put_quoted_chars(&vals, &val);
            } else {
                for (int j = 0; j < val.size; j++) {
                    if (j) kputc(',', &vals);
                    if (val.type == BCF_BT_FLOAT) {
                        float f;
                        memcpy(&f, val.body + 4 * j, 4);
                        put_float(&vals, f);
                    } else {
                        kputw(tval_int(&val, j), &vals);
                    }
                }
            }
        }
        kputc('\t', &out);
        kputsn(names.s, names.l, &out);
        kputc('\t', &out);
        kputsn(vals.s, vals.l, &out);
        free(names.s);
        free(vals.s);
    }
    kputc('\n', &out);
    int ret = hts_emit(fp, out.s, out.l);
    free(out.s);
    return ret;
}
