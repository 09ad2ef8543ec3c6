/* faidx for the htslib shim (see README.md).
 *
 * LAYOUT CONTRACT: read_reference.c:17-33 in the reference redeclares
 * `faidx1_t` / `struct __faidx_t` and walks them directly (kh_get on
 * idx->hash, bgzf_useek on idx->bgzf at v.seq_offset), so the structs
 * here must keep exactly that shape. The .fai is loaded if present and
 * built by scanning the FASTA otherwise (plain-text files only). */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"
#include "htslib/faidx.h"
#include "htslib/khash.h"

typedef struct {
    int id;
    uint32_t line_len, line_blen;
    uint64_t len;
    uint64_t seq_offset;
    uint64_t qual_offset;
} faidx1_t;
KHASH_MAP_INIT_STR(s, faidx1_t)

struct __faidx_t {
    BGZF *bgzf;
    int n, m;
    char **name;
    khash_t(s) *hash;
    enum fai_format_options format;
};

static void fai_insert(struct __faidx_t *f, const char *name, uint64_t len,
                       uint64_t off, uint32_t blen, uint32_t llen) {
    if (f->n == f->m) {
        f->m = f->m ? f->m * 2 : 16;
        f->name = (char **)realloc(f->name, (size_t)f->m * sizeof(char *));
    }
    char *nm = strdup(name);
    f->name[f->n] = nm;
    int ret;
    khint_t k = kh_put(s, f->hash, nm, &ret);
    faidx1_t v;
    v.id = f->n;
    v.line_blen = blen;
    v.line_len = llen;
    v.len = len;
    v.seq_offset = off;
    v.qual_offset = 0;
    kh_val(f->hash, k) = v;
    f->n++;
}

static int fai_read_index(struct __faidx_t *f, const char *fn_fai) {
    FILE *fp = fopen(fn_fai, "r");
    if (!fp) return -1;
    char line[4096];
    while (fgets(line, sizeof line, fp)) {
        char name[2048];
        unsigned long long len, off;
        unsigned blen, llen;
        if (sscanf(line, "%2047s %llu %llu %u %u", name, &len, &off, &blen,
                   &llen) == 5)
            fai_insert(f, name, (uint64_t)len, (uint64_t)off, blen, llen);
    }
    fclose(fp);
    return 0;
}

/* Build the index by scanning a plain-text FASTA (and write fn.fai,
 * matching `samtools faidx` behavior on first use). */
static int fai_scan(struct __faidx_t *f, const char *fn,
                    const char *fn_fai) {
    FILE *fp = fopen(fn, "rb");
    if (!fp) return -1;
    char *line = NULL;
    size_t cap = 0;
    ssize_t n;
    char name[2048] = "";
    uint64_t off = 0, seq_off = 0, len = 0;
    uint32_t blen = 0, llen = 0;
    int have = 0;
    while ((n = getline(&line, &cap, fp)) > 0) {
        if (line[0] == '>') {
            if (have) fai_insert(f, name, len, seq_off, blen, llen);
            size_t e = 1;
            while (line[e] && line[e] != ' ' && line[e] != '\t' &&
                   line[e] != '\n' && e - 1 < sizeof name - 1)
                e++;
            memcpy(name, line + 1, e - 1);
            name[e - 1] = 0;
            off += (uint64_t)n;
            seq_off = off;
            len = 0;
            blen = llen = 0;
            have = 1;
        } else {
            size_t bases = (size_t)n;
            while (bases && (line[bases - 1] == '\n' ||
                             line[bases - 1] == '\r'))
                bases--;
            if (!blen) {
                blen = (uint32_t)bases;
                llen = (uint32_t)n;
            }
            len += bases;
            off += (uint64_t)n;
        }
    }
    if (have) fai_insert(f, name, len, seq_off, blen, llen);
    free(line);
    fclose(fp);
    FILE *out = fopen(fn_fai, "w");
    if (out) {
        for (int i = 0; i < f->n; i++) {
            khint_t k = kh_get(s, f->hash, f->name[i]);
            faidx1_t *v = &kh_val(f->hash, k);
            fprintf(out, "%s\t%llu\t%llu\t%u\t%u\n", f->name[i],
                    (unsigned long long)v->len,
                    (unsigned long long)v->seq_offset, v->line_blen,
                    v->line_len);
        }
        fclose(out);
    }
    return 0;
}

faidx_t *fai_load(const char *fn) {
    struct __faidx_t *f =
        (struct __faidx_t *)calloc(1, sizeof(struct __faidx_t));
    if (!f) return NULL;
    f->hash = kh_init(s);
    f->format = FAI_FASTA;
    char fn_fai[4096];
    snprintf(fn_fai, sizeof fn_fai, "%s.fai", fn);
    if (fai_read_index(f, fn_fai) < 0 && fai_scan(f, fn, fn_fai) < 0) {
        fai_destroy((faidx_t *)f);
        return NULL;
    }
    f->bgzf = bgzf_open(fn, "r");
    if (!f->bgzf || bgzf_compression(f->bgzf)) {
        fprintf(stderr, "[htslib shim] %s: only plain-text FASTA is "
                        "supported by the benchmark shim\n",
                fn);
        fai_destroy((faidx_t *)f);
        return NULL;
    }
    return (faidx_t *)f;
}

void fai_destroy(faidx_t *fai) {
    struct __faidx_t *f = (struct __faidx_t *)fai;
    if (!f) return;
    for (int i = 0; i < f->n; i++) free(f->name[i]);
    free(f->name);
    if (f->hash) kh_destroy(s, f->hash);
    if (f->bgzf) bgzf_close(f->bgzf);
    free(f);
}

int fai_build(const char *fn) {
    faidx_t *f = fai_load(fn);
    if (!f) return -1;
    fai_destroy(f);
    return 0;
}

int faidx_nseq(const faidx_t *fai) {
    return ((const struct __faidx_t *)fai)->n;
}

const char *faidx_iseq(const faidx_t *fai, int i) {
    const struct __faidx_t *f = (const struct __faidx_t *)fai;
    return i >= 0 && i < f->n ? f->name[i] : NULL;
}

int faidx_seq_len(const faidx_t *fai, const char *seq) {
    const struct __faidx_t *f = (const struct __faidx_t *)fai;
    khint_t k = kh_get(s, f->hash, seq);
    return k == kh_end(f->hash) ? -1 : (int)kh_val(f->hash, k).len;
}
