/* Minimal kstring-compatible dynamic string (htslib API shim; see
 * tools/htslib_shim/README.md). Independent implementation of the
 * subset the reference bs_call sources and this shim use. */
#ifndef BSC_SHIM_KSTRING_H
#define BSC_SHIM_KSTRING_H

#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct kstring_t {
    size_t l, m;
    char *s;
} kstring_t;

static inline int ks_resize(kstring_t *s, size_t cap) {
    if (s->m >= cap) return 0;
    size_t m = s->m ? s->m : 16;
    while (m < cap) m <<= 1;
    char *p = (char *)realloc(s->s, m);
    if (!p) return -1;
    s->s = p;
    s->m = m;
    return 0;
}

/* kputsn_ / kputc_: no trailing NUL (binary append); kputsn / kputs /
 * kputc: keep s NUL-terminated like htslib. */
static inline int kputsn_(const void *p, size_t l, kstring_t *s) {
    if (ks_resize(s, s->l + l) < 0) return EOF;
    memcpy(s->s + s->l, p, l);
    s->l += l;
    return (int)l;
}

static inline int kputc_(int c, kstring_t *s) {
    if (ks_resize(s, s->l + 1) < 0) return EOF;
    s->s[s->l++] = (char)c;
    return c;
}

static inline int kputsn(const char *p, size_t l, kstring_t *s) {
    if (ks_resize(s, s->l + l + 1) < 0) return EOF;
    memcpy(s->s + s->l, p, l);
    s->l += l;
    s->s[s->l] = 0;
    return (int)l;
}

static inline int kputs(const char *p, kstring_t *s) {
    return kputsn(p, strlen(p), s);
}

static inline int kputc(int c, kstring_t *s) {
    if (ks_resize(s, s->l + 2) < 0) return EOF;
    s->s[s->l++] = (char)c;
    s->s[s->l] = 0;
    return c;
}

static inline int kputw(int x, kstring_t *s) {
    char buf[16];
    int n = snprintf(buf, sizeof buf, "%d", x);
    return kputsn(buf, (size_t)n, s);
}

static inline int kputl(long x, kstring_t *s) {
    char buf[24];
    int n = snprintf(buf, sizeof buf, "%ld", x);
    return kputsn(buf, (size_t)n, s);
}

static inline int ksprintf(kstring_t *s, const char *fmt, ...)
    __attribute__((format(printf, 2, 3)));
static inline int ksprintf(kstring_t *s, const char *fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    va_list ap2;
    va_copy(ap2, ap);
    int n = vsnprintf(NULL, 0, fmt, ap);
    va_end(ap);
    if (n < 0 || ks_resize(s, s->l + (size_t)n + 1) < 0) {
        va_end(ap2);
        return -1;
    }
    vsnprintf(s->s + s->l, (size_t)n + 1, fmt, ap2);
    va_end(ap2);
    s->l += (size_t)n;
    return n;
}

#define ks_str(s) ((s)->s)
#define ks_len(s) ((s)->l)

static inline void ks_free(kstring_t *s) {
    if (s) {
        free(s->s);
        s->s = NULL;
        s->l = s->m = 0;
    }
}

#endif /* BSC_SHIM_KSTRING_H */
