/* Minimal VCF/BCF writing API (htslib API shim; see
 * tools/htslib_shim/README.md).
 *
 * The reference constructs real BCF2-typed shared/indiv streams with
 * bcf_enc_* (print_vcf.c:160-380) and pokes the header dictionaries
 * directly (bh->n[BCF_DT_CTG], bh->id[BCF_DT_CTG][i].key,
 * bh->dict[BCF_DT_ID] as khash(vdict) of bcf_idinfo_t with .id;
 * print_vcf.c:745-766), so those members are laid out here exactly as
 * that code expects. bcf_write decodes the typed streams back to VCF
 * text ('w'/'wz' modes) or writes BCF2.2 binary ('wb'/'wbu'). */
#ifndef BSC_SHIM_VCF_H
#define BSC_SHIM_VCF_H

#include <stdint.h>

#include "htslib/hts.h"
#include "htslib/kstring.h"

#ifdef __cplusplus
extern "C" {
#endif

#define BCF_DT_ID 0
#define BCF_DT_CTG 1
#define BCF_DT_SAMPLE 2

#define BCF_BT_NULL 0
#define BCF_BT_INT8 1
#define BCF_BT_INT16 2
#define BCF_BT_INT32 3
#define BCF_BT_FLOAT 5
#define BCF_BT_CHAR 7

#define BCF_HL_FLT 0
#define BCF_HL_INFO 1
#define BCF_HL_FMT 2
#define BCF_HL_CTG 3
#define BCF_HL_GEN 4

typedef struct bcf_idinfo_t {
    uint64_t info[3]; /* unused by the shim; present for layout parity */
    int id;
} bcf_idinfo_t;

typedef struct bcf_idpair_t {
    const char *key;
    const bcf_idinfo_t *val;
} bcf_idpair_t;

typedef struct bcf_hdr_t {
    int32_t n[3];         /* n[BCF_DT_*]: entries in each dictionary */
    bcf_idpair_t *id[3];  /* id[type][int_id] -> key/val */
    void *dict[3];        /* khash(vdict) of bcf_idinfo_t per type */
    char **samples;
    kstring_t text;       /* accumulated "##..." lines, in order */
    int32_t m[3];         /* capacity of id[] arrays */
    int32_t n_samples, m_samples;
    uint32_t *ctg_len;    /* per-contig length (m[BCF_DT_CTG] cap) */
} bcf_hdr_t;

typedef struct bcf1_t {
    hts_pos_t pos;
    hts_pos_t rlen;
    int32_t rid;
    float qual;
    int32_t n_info, n_allele;
    int32_t n_fmt, n_sample;
    kstring_t shared, indiv;
} bcf1_t;

bcf_hdr_t *bcf_hdr_init(const char *mode);
void bcf_hdr_destroy(bcf_hdr_t *h);
int bcf_hdr_append(bcf_hdr_t *h, const char *line);
int bcf_hdr_printf(bcf_hdr_t *h, const char *fmt, ...)
    __attribute__((format(printf, 2, 3)));
const char *bcf_hdr_get_version(const bcf_hdr_t *h);
int bcf_hdr_add_sample(bcf_hdr_t *h, const char *sample);
int bcf_hdr_write(htsFile *fp, bcf_hdr_t *h);

bcf1_t *bcf_init(void);
void bcf_destroy(bcf1_t *v);
void bcf_clear(bcf1_t *v);
int bcf_write(htsFile *fp, bcf_hdr_t *h, bcf1_t *v);

void bcf_enc_size(kstring_t *s, int size, int type);
void bcf_enc_int1(kstring_t *s, int32_t x);
void bcf_enc_vint(kstring_t *s, int n, int32_t *a, int wsize);
void bcf_enc_vchar(kstring_t *s, int l, const char *a);
void bcf_enc_vfloat(kstring_t *s, int n, float *a);

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_VCF_H */
