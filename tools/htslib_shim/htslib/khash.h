/* Minimal khash-compatible hash table (macro-generated, header-only).
 *
 * Part of the htslib API shim used ONLY to compile and benchmark the
 * reference bs_call C sources (see tools/htslib_shim/README.md). It is
 * an independent implementation of the khash.h macro API that the
 * reference includes (dbSNP_bins.c:14, read_reference.c:11,
 * print_vcf.c:15): open addressing with linear probing over a
 * power-of-two table, one state byte per slot (empty/used/tombstone).
 * Source-compatible subset: KHASH_MAP_INIT_STR / KHASH_SET_INIT_STR /
 * KHASH_MAP_INIT_INT, kh_init/destroy/get/put/del, kh_end, kh_exist,
 * kh_key, kh_val(ue), kh_size, kh_begin, khiter_t.
 *
 * Layout note: read_reference.c and print_vcf.c instantiate maps over
 * structs they define and then cast pointers produced by this shim's
 * fai_load()/bcf_hdr_append(); both sides use THIS header, so the
 * instantiated layouts agree by construction.
 */
#ifndef BSC_SHIM_KHASH_H
#define BSC_SHIM_KHASH_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint32_t khint_t;
typedef khint_t khiter_t;
typedef khint_t khint32_t;
typedef uint64_t khint64_t;

#define kh_str_hash(s) bsc_kh_str_hash(s)
static inline khint_t bsc_kh_str_hash(const char *s) {
    khint_t h = 5381;
    while (*s) h = (h << 5) + h + (unsigned char)*s++;
    return h;
}
#define kh_int_hash(x) ((khint_t)(x))
#define kh_str_eq(a, b) (strcmp((a), (b)) == 0)
#define kh_int_eq(a, b) ((a) == (b))

#define __BSC_KHASH_TYPE(name, khkey_t, khval_t)                          \
    typedef struct kh_##name##_s {                                        \
        khint_t n_buckets, size, occupied;                                \
        unsigned char *state; /* 0 empty, 1 used, 2 tombstone */          \
        khkey_t *keys;                                                    \
        khval_t *vals;                                                    \
    } kh_##name##_t;

#define __BSC_KHASH_IMPL(name, SCOPE, khkey_t, khval_t, kh_is_map,        \
                         hash_f, eq_f)                                    \
    SCOPE kh_##name##_t *kh_init_##name(void) {                           \
        return (kh_##name##_t *)calloc(1, sizeof(kh_##name##_t));         \
    }                                                                     \
    SCOPE void kh_destroy_##name(kh_##name##_t *h) {                      \
        if (h) {                                                          \
            free(h->state);                                               \
            free(h->keys);                                                \
            free(h->vals);                                                \
            free(h);                                                      \
        }                                                                 \
    }                                                                     \
    SCOPE khint_t kh_get_##name(const kh_##name##_t *h, khkey_t key) {    \
        if (!h->n_buckets) return 0;                                      \
        khint_t mask = h->n_buckets - 1;                                  \
        khint_t i = hash_f(key) & mask;                                   \
        while (h->state[i]) {                                             \
            if (h->state[i] == 1 && eq_f(h->keys[i], key)) return i;      \
            i = (i + 1) & mask;                                           \
        }                                                                 \
        return h->n_buckets;                                              \
    }                                                                     \
    SCOPE void kh_resize_##name(kh_##name##_t *h, khint_t req) {          \
        khint_t nb = 4;                                                   \
        while (nb < req) nb <<= 1;                                        \
        unsigned char *ns = (unsigned char *)calloc(nb, 1);               \
        khkey_t *nk = (khkey_t *)malloc(nb * sizeof(khkey_t));            \
        khval_t *nv =                                                     \
            kh_is_map ? (khval_t *)malloc(nb * sizeof(khval_t)) : NULL;   \
        khint_t mask = nb - 1;                                            \
        for (khint_t j = 0; j < h->n_buckets; j++) {                      \
            if (h->state[j] != 1) continue;                               \
            khint_t i = hash_f(h->keys[j]) & mask;                        \
            while (ns[i]) i = (i + 1) & mask;                             \
            ns[i] = 1;                                                    \
            nk[i] = h->keys[j];                                           \
            if (kh_is_map) nv[i] = h->vals[j];                            \
        }                                                                 \
        free(h->state);                                                   \
        free(h->keys);                                                    \
        free(h->vals);                                                    \
        h->state = ns;                                                    \
        h->keys = nk;                                                     \
        h->vals = nv;                                                     \
        h->n_buckets = nb;                                                \
        h->occupied = h->size;                                            \
    }                                                                     \
    SCOPE khint_t kh_put_##name(kh_##name##_t *h, khkey_t key,            \
                                int *ret) {                               \
        if (h->occupied * 4 >= h->n_buckets * 3)                          \
            kh_resize_##name(h, h->n_buckets ? h->n_buckets * 2 : 4);     \
        khint_t mask = h->n_buckets - 1;                                  \
        khint_t i = hash_f(key) & mask;                                   \
        khint_t grave = h->n_buckets;                                     \
        while (h->state[i]) {                                             \
            if (h->state[i] == 1 && eq_f(h->keys[i], key)) {              \
                if (ret) *ret = 0;                                        \
                return i;                                                 \
            }                                                             \
            if (h->state[i] == 2 && grave == h->n_buckets) grave = i;     \
            i = (i + 1) & mask;                                           \
        }                                                                 \
        if (grave != h->n_buckets) i = grave;                             \
        else h->occupied++;                                               \
        h->state[i] = 1;                                                  \
        h->keys[i] = key;                                                 \
        h->size++;                                                        \
        if (ret) *ret = 1;                                                \
        return i;                                                         \
    }                                                                     \
    SCOPE void kh_del_##name(kh_##name##_t *h, khint_t i) {               \
        if (i < h->n_buckets && h->state[i] == 1) {                       \
            h->state[i] = 2;                                              \
            h->size--;                                                    \
        }                                                                 \
    }

#define KHASH_INIT(name, khkey_t, khval_t, kh_is_map, hash_f, eq_f)       \
    __BSC_KHASH_TYPE(name, khkey_t, khval_t)                              \
    __BSC_KHASH_IMPL(name, static inline __attribute__((unused)),         \
                     khkey_t, khval_t, kh_is_map, hash_f, eq_f)

#define KHASH_MAP_INIT_STR(name, khval_t)                                 \
    KHASH_INIT(name, const char *, khval_t, 1, kh_str_hash, kh_str_eq)
#define KHASH_SET_INIT_STR(name)                                          \
    KHASH_INIT(name, const char *, char, 0, kh_str_hash, kh_str_eq)
#define KHASH_MAP_INIT_INT(name, khval_t)                                 \
    KHASH_INIT(name, khint32_t, khval_t, 1, kh_int_hash, kh_int_eq)
#define KHASH_SET_INIT_INT(name)                                          \
    KHASH_INIT(name, khint32_t, char, 0, kh_int_hash, kh_int_eq)
#define KHASH_MAP_INIT_INT64(name, khval_t)                               \
    KHASH_INIT(name, khint64_t, khval_t, 1, kh_int_hash, kh_int_eq)

#define khash_t(name) kh_##name##_t
#define kh_init(name) kh_init_##name()
#define kh_destroy(name, h) kh_destroy_##name(h)
#define kh_get(name, h, k) kh_get_##name(h, k)
#define kh_put(name, h, k, r) kh_put_##name(h, k, r)
#define kh_del(name, h, i) kh_del_##name(h, i)
#define kh_resize(name, h, s) kh_resize_##name(h, s)
#define kh_clear(name, h)                                                 \
    do {                                                                  \
        if ((h) && (h)->state)                                            \
            memset((h)->state, 0, (h)->n_buckets), (h)->size = 0,         \
                (h)->occupied = 0;                                        \
    } while (0)
#define kh_end(h) ((h)->n_buckets)
#define kh_begin(h) ((khint_t)0)
#define kh_exist(h, i) ((h)->state[i] == 1)
#define kh_key(h, i) ((h)->keys[i])
#define kh_val(h, i) ((h)->vals[i])
#define kh_value(h, i) ((h)->vals[i])
#define kh_size(h) ((h)->size)

#endif /* BSC_SHIM_KHASH_H */
