/* BGZF layer of the htslib shim (see README.md).
 *
 * Read side: parses standard BGZF members (gzip header with the BC
 * extra subfield giving the compressed block size), inflates the raw
 * deflate payload with zlib, verifies CRC32. `bgzf_mt` starts a reader
 * thread + n inflate workers over an ordered ring so hts_set_threads
 * gives the reference binary real multi-threaded decompression, as
 * htslib would. Plain (non-gzip) files pass bytes through, which is how
 * faidx reads a plain-text FASTA.
 *
 * Write side: buffers 64 KiB logical blocks, deflates each into one
 * BGZF member, appends the spec's 28-byte EOF member on close. */

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#include "htslib/bgzf.h"

#define BGZF_BLOCK 0x10000
#define BGZF_MAX_CDATA (BGZF_BLOCK + 1024)
#define RING_SLOTS 64

static const uint8_t BGZF_EOF[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0,    0,    0,    0,    0,   0xff, 0x06, 0,
    0x42, 0x43, 0x02, 0,    0x1b, 0,    0x03, 0,    0,   0,    0,    0,
    0,    0,    0,    0};

typedef struct {
    uint8_t cdata[BGZF_MAX_CDATA];
    uint8_t udata[BGZF_BLOCK];
    int clen, ulen;
    int state; /* 0 empty, 1 filled(compressed), 2 inflated, 3 eof/err */
    int err;
} slot_t;

struct BGZF {
    FILE *fp;
    int is_write;
    int is_plain;
    int owns_fp;
    /* single-threaded read state */
    uint8_t ublock[BGZF_BLOCK];
    int ulen, upos;
    int at_eof;
    /* bytes sniffed from an unseekable stream, to re-serve first */
    uint8_t pending[2];
    int n_pending, pend_pos;
    /* write state */
    uint8_t wbuf[BGZF_BLOCK];
    int wlen;
    int compress_level;
    /* MT read state */
    int n_threads;
    pthread_t reader, *workers;
    slot_t *ring;
    long head, tail; /* head = next slot to hand out, tail = next to fill */
    long next_work;  /* next slot index needing inflation */
    int shutting_down;
    pthread_mutex_t mu;
    pthread_cond_t cv_filled, cv_inflated, cv_space;
};

/* ---------- block-level IO ---------- */

/* fread that first drains bytes sniffed from an unseekable stream. */
static size_t raw_read(BGZF *fp, uint8_t *buf, size_t n) {
    size_t got = 0;
    while (fp->pend_pos < fp->n_pending && got < n)
        buf[got++] = fp->pending[fp->pend_pos++];
    if (got < n) got += fread(buf + got, 1, n - got, fp->fp);
    return got;
}

/* Reads one compressed member into cdata; returns clen (0 on EOF,
 * -1 on error). */
static int read_member(BGZF *bf, uint8_t *cdata) {
    FILE *f = bf->fp;
    uint8_t hdr[18];
    size_t n = raw_read(bf, hdr, 18);
    if (n == 0) return 0;
    if (n < 18 || hdr[0] != 0x1f || hdr[1] != 0x8b || hdr[3] != 4)
        return -1;
    int xlen = hdr[10] | (hdr[11] << 8);
    int bsize = -1;
    /* scan extra subfields for BC */
    int off = 12, remaining = xlen;
    memcpy(cdata, hdr, 18);
    if (18 + xlen > BGZF_MAX_CDATA) return -1;
    if (fread(cdata + 18, 1, xlen - 6 > 0 ? (size_t)(xlen - 6) : 0, f) !=
        (size_t)(xlen - 6 > 0 ? xlen - 6 : 0))
        return -1;
    /* hdr[12..17] already holds the first subfield (if xlen >= 6) */
    const uint8_t *x = hdr + 12;
    while (remaining >= 4) {
        int si1 = x[0], si2 = x[1], slen = x[2] | (x[3] << 8);
        if (si1 == 'B' && si2 == 'C' && slen == 2 && remaining >= 6) {
            bsize = (x[4] | (x[5] << 8)) + 1;
            break;
        }
        /* other subfields: only the first one is in hdr; bail out */
        (void)off;
        break;
    }
    if (bsize < 0 || bsize > BGZF_MAX_CDATA || bsize < 18 + xlen - 12)
        return -1;
    int body = bsize - 18 - (xlen - 6);
    if (body < 0) return -1;
    if (fread(cdata + 18 + (xlen - 6), 1, (size_t)body, f) != (size_t)body)
        return -1;
    return bsize;
}

/* Inflate one member (cdata, clen) into udata; returns ulen or -1. */
static int inflate_member(const uint8_t *cdata, int clen, uint8_t *udata) {
    int xlen = cdata[10] | (cdata[11] << 8);
    const uint8_t *payload = cdata + 12 + xlen;
    int payload_len = clen - 12 - xlen - 8;
    if (payload_len < 0) return -1;
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (inflateInit2(&zs, -15) != Z_OK) return -1;
    zs.next_in = (uint8_t *)payload;
    zs.avail_in = (unsigned)payload_len;
    zs.next_out = udata;
    zs.avail_out = BGZF_BLOCK;
    int r = inflate(&zs, Z_FINISH);
    int ulen = (int)(BGZF_BLOCK - zs.avail_out);
    inflateEnd(&zs);
    if (r != Z_STREAM_END) return -1;
    const uint8_t *tr = cdata + clen - 8;
    uint32_t want_crc =
        tr[0] | (tr[1] << 8) | ((uint32_t)tr[2] << 16) | ((uint32_t)tr[3] << 24);
    uint32_t want_len =
        tr[4] | (tr[5] << 8) | ((uint32_t)tr[6] << 16) | ((uint32_t)tr[7] << 24);
    if (want_len != (uint32_t)ulen) return -1;
    if (crc32(0, udata, (unsigned)ulen) != want_crc) return -1;
    return ulen;
}

/* ---------- MT pipeline ---------- */

static void *reader_main(void *arg) {
    BGZF *fp = (BGZF *)arg;
    for (;;) {
        pthread_mutex_lock(&fp->mu);
        while (!fp->shutting_down && fp->tail - fp->head >= RING_SLOTS)
            pthread_cond_wait(&fp->cv_space, &fp->mu);
        if (fp->shutting_down) {
            pthread_mutex_unlock(&fp->mu);
            return NULL;
        }
        slot_t *s = &fp->ring[fp->tail % RING_SLOTS];
        pthread_mutex_unlock(&fp->mu);
        int clen = read_member(fp, s->cdata);
        pthread_mutex_lock(&fp->mu);
        if (clen <= 0) {
            s->state = 3;
            s->err = clen < 0;
            fp->tail++;
            pthread_cond_broadcast(&fp->cv_filled);
            pthread_cond_broadcast(&fp->cv_inflated);
            pthread_mutex_unlock(&fp->mu);
            return NULL;
        }
        s->clen = clen;
        s->state = 1;
        fp->tail++;
        pthread_cond_broadcast(&fp->cv_filled);
        pthread_mutex_unlock(&fp->mu);
    }
}

static void *worker_main(void *arg) {
    BGZF *fp = (BGZF *)arg;
    for (;;) {
        pthread_mutex_lock(&fp->mu);
        while (!fp->shutting_down && fp->next_work >= fp->tail)
            pthread_cond_wait(&fp->cv_filled, &fp->mu);
        if (fp->shutting_down) {
            pthread_mutex_unlock(&fp->mu);
            return NULL;
        }
        long idx = fp->next_work;
        slot_t *s = &fp->ring[idx % RING_SLOTS];
        if (s->state == 3) { /* eof sentinel: leave for consumer */
            pthread_cond_broadcast(&fp->cv_inflated);
            pthread_mutex_unlock(&fp->mu);
            return NULL;
        }
        fp->next_work++;
        pthread_mutex_unlock(&fp->mu);
        int ulen = inflate_member(s->cdata, s->clen, s->udata);
        pthread_mutex_lock(&fp->mu);
        if (ulen < 0) {
            s->state = 3;
            s->err = 1;
        } else {
            s->ulen = ulen;
            s->state = 2;
        }
        pthread_cond_broadcast(&fp->cv_inflated);
        pthread_mutex_unlock(&fp->mu);
    }
}

int bgzf_mt(BGZF *fp, int n_threads, int n_sub_blks) {
    (void)n_sub_blks;
    if (fp->is_write || fp->is_plain || n_threads < 1 || fp->n_threads)
        return 0;
    fp->ring = (slot_t *)calloc(RING_SLOTS, sizeof(slot_t));
    if (!fp->ring) return -1;
    /* If a block was already read single-threaded, the consumer drains
     * ublock first; the reader thread continues from the current file
     * offset. */
    fp->n_threads = n_threads;
    pthread_mutex_init(&fp->mu, NULL);
    pthread_cond_init(&fp->cv_filled, NULL);
    pthread_cond_init(&fp->cv_inflated, NULL);
    pthread_cond_init(&fp->cv_space, NULL);
    fp->workers = (pthread_t *)calloc((size_t)n_threads, sizeof(pthread_t));
    pthread_create(&fp->reader, NULL, reader_main, fp);
    for (int i = 0; i < n_threads; i++)
        pthread_create(&fp->workers[i], NULL, worker_main, fp);
    return 0;
}

static void mt_shutdown(BGZF *fp) {
    if (!fp->n_threads) return;
    pthread_mutex_lock(&fp->mu);
    fp->shutting_down = 1;
    pthread_cond_broadcast(&fp->cv_filled);
    pthread_cond_broadcast(&fp->cv_space);
    pthread_mutex_unlock(&fp->mu);
    pthread_join(fp->reader, NULL);
    for (int i = 0; i < fp->n_threads; i++)
        pthread_join(fp->workers[i], NULL);
    free(fp->workers);
    free(fp->ring);
    fp->n_threads = 0;
}

/* Pull the next inflated block into ublock. Returns ulen, 0 on EOF,
 * -1 on error. */
static int mt_next_block(BGZF *fp) {
    pthread_mutex_lock(&fp->mu);
    while (fp->head >= fp->tail ||
           (fp->ring[fp->head % RING_SLOTS].state != 2 &&
            fp->ring[fp->head % RING_SLOTS].state != 3))
        pthread_cond_wait(&fp->cv_inflated, &fp->mu);
    slot_t *s = &fp->ring[fp->head % RING_SLOTS];
    if (s->state == 3) {
        int err = s->err;
        pthread_mutex_unlock(&fp->mu);
        return err ? -1 : 0;
    }
    memcpy(fp->ublock, s->udata, (size_t)s->ulen);
    int ulen = s->ulen;
    s->state = 0;
    fp->head++;
    pthread_cond_signal(&fp->cv_space);
    pthread_mutex_unlock(&fp->mu);
    return ulen;
}

/* ---------- public API ---------- */

static BGZF *bgzf_new(FILE *f, const char *mode, int owns) {
    BGZF *fp = (BGZF *)calloc(1, sizeof(BGZF));
    if (!fp) return NULL;
    fp->fp = f;
    fp->owns_fp = owns;
    fp->compress_level = -1;
    if (mode[0] == 'w' || mode[0] == 'a') {
        fp->is_write = 1;
        if (strchr(mode, 'u')) fp->compress_level = 0;
    } else {
        int c0 = fgetc(f), c1 = fgetc(f);
        if (c0 != EOF) ungetc(c1, f);
        /* NB: two ungetc calls aren't portable; re-seek instead */
        fseek(f, 0, SEEK_SET);
        fp->is_plain = !(c0 == 0x1f && c1 == 0x8b);
    }
    return fp;
}

BGZF *bgzf_open(const char *path, const char *mode) {
    FILE *f = fopen(path, mode[0] == 'w' ? "wb" : "rb");
    if (!f) return NULL;
    return bgzf_new(f, mode, 1);
}

BGZF *bgzf_dopen(int fd, const char *mode) {
    FILE *f = fdopen(fd, mode[0] == 'w' ? "wb" : "rb");
    if (!f) return NULL;
    BGZF *fp = (BGZF *)calloc(1, sizeof(BGZF));
    if (!fp) return NULL;
    fp->fp = f;
    fp->owns_fp = 1;
    fp->compress_level = -1;
    if (mode[0] == 'w' || mode[0] == 'a') {
        fp->is_write = 1;
    } else {
        /* unseekable (pipe): sniff two bytes, re-serve them via the
         * pending buffer on the next raw_read */
        int c0 = fgetc(f);
        int c1 = fgetc(f);
        fp->is_plain = !(c0 == 0x1f && c1 == 0x8b);
        if (c0 != EOF) fp->pending[fp->n_pending++] = (uint8_t)c0;
        if (c1 != EOF) fp->pending[fp->n_pending++] = (uint8_t)c1;
    }
    return fp;
}

int bgzf_compression(BGZF *fp) { return fp->is_plain ? 0 : 2; }

static int next_block(BGZF *fp) {
    if (fp->n_threads) return mt_next_block(fp);
    uint8_t cdata[BGZF_MAX_CDATA];
    int clen = read_member(fp, cdata);
    if (clen <= 0) return clen;
    return inflate_member(cdata, clen, fp->ublock);
}

ssize_t bgzf_read(BGZF *fp, void *data, size_t length) {
    if (fp->is_write) return -1;
    uint8_t *out = (uint8_t *)data;
    size_t got = 0;
    if (fp->is_plain) {
        got = raw_read(fp, out, length);
        return (ssize_t)got;
    }
    while (got < length) {
        if (fp->upos >= fp->ulen) {
            if (fp->at_eof) break;
            int ulen = next_block(fp);
            if (ulen < 0) return -1;
            if (ulen == 0) {
                fp->at_eof = 1;
                break;
            }
            fp->ulen = ulen;
            fp->upos = 0;
        }
        size_t take = (size_t)(fp->ulen - fp->upos);
        if (take > length - got) take = length - got;
        memcpy(out + got, fp->ublock + fp->upos, take);
        fp->upos += (int)take;
        got += take;
    }
    return (ssize_t)got;
}

int bgzf_getc(BGZF *fp) {
    uint8_t c;
    ssize_t n = bgzf_read(fp, &c, 1);
    return n == 1 ? (int)c : (n == 0 ? -1 : -2);
}

/* Seek to an htslib VIRTUAL offset (coffset<<16 | uoffset) on a
 * compressed read handle — the primitive behind region iterators. A
 * running multithreaded readahead is torn down, the target block is
 * loaded single-threaded, and readahead restarts from the following
 * block so post-seek streaming keeps its decompression parallelism. */
int bgzf_seek_virtual(BGZF *fp, uint64_t voff) {
    if (fp->is_write || fp->is_plain) return -1;
    int threads = fp->n_threads;
    if (threads) mt_shutdown(fp);
    fp->head = fp->tail = fp->next_work = 0;
    fp->shutting_down = 0;
    fp->n_pending = fp->pend_pos = 0;
    fp->at_eof = 0;
    off_t coff = (off_t)(voff >> 16);
    int uoff = (int)(voff & 0xffff);
    if (fseeko(fp->fp, coff, SEEK_SET)) return -1;
    fp->ulen = fp->upos = 0;
    int ulen = 0;
    {
        uint8_t cdata[BGZF_MAX_CDATA];
        int clen = read_member(fp, cdata);
        if (clen < 0) return -1;
        if (clen > 0) ulen = inflate_member(cdata, clen, fp->ublock);
        if (ulen < 0) return -1;
    }
    fp->ulen = ulen;
    fp->upos = uoff > ulen ? ulen : uoff;
    if (ulen == 0) fp->at_eof = 1;
    if (threads) bgzf_mt(fp, threads, 64);
    return 0;
}

int bgzf_useek(BGZF *fp, off_t uoffset, int whence) {
    if (fp->is_plain && !fp->n_threads) {
        fp->n_pending = fp->pend_pos = 0; /* discard sniffed bytes */
        return fseeko(fp->fp, uoffset, whence) ? -1 : 0;
    }
    return -1; /* compressed useek needs a .gzi; unused by the bench */
}

/* ---------- write side ---------- */

static int flush_block(BGZF *fp) {
    if (fp->wlen == 0) return 0;
    uint8_t cbuf[BGZF_MAX_CDATA];
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (deflateInit2(&zs, fp->compress_level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = fp->wbuf;
    zs.avail_in = (unsigned)fp->wlen;
    zs.next_out = cbuf;
    zs.avail_out = sizeof cbuf;
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
        deflateEnd(&zs);
        return -1;
    }
    int clen = (int)(sizeof cbuf - zs.avail_out);
    deflateEnd(&zs);
    uint32_t crc = crc32(0, fp->wbuf, (unsigned)fp->wlen);
    int bsize = clen + 26;
    uint8_t hdr[18] = {0x1f, 0x8b, 8,    4,    0, 0, 0, 0, 0,
                       0xff, 6,    0,    0x42, 0x43, 2, 0, 0, 0};
    hdr[16] = (uint8_t)((bsize - 1) & 0xff);
    hdr[17] = (uint8_t)(((bsize - 1) >> 8) & 0xff);
    uint8_t tr[8];
    tr[0] = crc & 0xff;
    tr[1] = (crc >> 8) & 0xff;
    tr[2] = (crc >> 16) & 0xff;
    tr[3] = (crc >> 24) & 0xff;
    uint32_t ul = (uint32_t)fp->wlen;
    tr[4] = ul & 0xff;
    tr[5] = (ul >> 8) & 0xff;
    tr[6] = (ul >> 16) & 0xff;
    tr[7] = (ul >> 24) & 0xff;
    if (fwrite(hdr, 1, 18, fp->fp) != 18 ||
        fwrite(cbuf, 1, (size_t)clen, fp->fp) != (size_t)clen ||
        fwrite(tr, 1, 8, fp->fp) != 8)
        return -1;
    fp->wlen = 0;
    return 0;
}

ssize_t bgzf_write(BGZF *fp, const void *data, size_t length) {
    if (!fp->is_write) return -1;
    const uint8_t *in = (const uint8_t *)data;
    size_t put = 0;
    while (put < length) {
        size_t take = (size_t)(BGZF_BLOCK - fp->wlen);
        if (take > length - put) take = length - put;
        memcpy(fp->wbuf + fp->wlen, in + put, take);
        fp->wlen += (int)take;
        put += take;
        if (fp->wlen == BGZF_BLOCK && flush_block(fp) < 0) return -1;
    }
    return (ssize_t)put;
}

int bgzf_flush(BGZF *fp) { return fp->is_write ? flush_block(fp) : 0; }

int bgzf_close(BGZF *fp) {
    if (!fp) return 0;
    int ret = 0;
    if (fp->is_write) {
        if (flush_block(fp) < 0) ret = -1;
        if (fwrite(BGZF_EOF, 1, sizeof BGZF_EOF, fp->fp) != sizeof BGZF_EOF)
            ret = -1;
    }
    mt_shutdown(fp);
    if (fp->owns_fp && fp->fp) fclose(fp->fp);
    free(fp);
    return ret;
}
