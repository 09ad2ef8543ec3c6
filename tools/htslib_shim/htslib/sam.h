/* Minimal SAM/BAM API (htslib API shim; see
 * tools/htslib_shim/README.md). bam1_t keeps the standard on-disk BAM
 * record body in `data` (qname+NUL, cigar u32s, packed seq nibbles,
 * qual, aux), so the usual accessor macros hold. Source-compatible with
 * the reference's use in input_sam.c / get_template_vector.c /
 * process_sam_header.c / print_vcf.c. */
#ifndef BSC_SHIM_SAM_H
#define BSC_SHIM_SAM_H

#include <stdint.h>

#include "htslib/hts.h"

#ifdef __cplusplus
extern "C" {
#endif

#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048

#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6
#define BAM_CEQUAL 7
#define BAM_CDIFF 8
#define BAM_CBACK 9

#define BAM_CIGAR_STR "MIDNSHP=XB"
#define bam_cigar_op(c) ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
#define bam_cigar_opchr(c) (BAM_CIGAR_STR[bam_cigar_op(c)])

typedef struct bam_hdr_t {
    int32_t n_targets;
    uint32_t *target_len;
    char **target_name;
    uint32_t l_text;
    char *text;
    void *sdict; /* lazy name -> tid map */
} bam_hdr_t;
typedef bam_hdr_t sam_hdr_t;

typedef struct bam1_core_t {
    hts_pos_t pos;
    int32_t tid;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul;
    uint16_t flag;
    uint16_t l_qname; /* includes the trailing NUL (BAM l_read_name) */
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    hts_pos_t mpos;
    hts_pos_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    int l_data, m_data;
    uint8_t *data;
} bam1_t;

#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) ((uint32_t *)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)                                                    \
    ((b)->data + (b)->core.l_qname + ((b)->core.n_cigar << 2))
#define bam_get_qual(b)                                                   \
    (bam_get_seq(b) + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b) (bam_get_qual(b) + (b)->core.l_qseq)
#define bam_get_l_aux(b)                                                  \
    ((b)->l_data - ((b)->core.l_qname + ((b)->core.n_cigar << 2) +        \
                    (((b)->core.l_qseq + 1) >> 1) + (b)->core.l_qseq))
#define bam_seqi(s, i) ((s)[(i) >> 1] >> ((~(i) & 1) << 2) & 0xf)
#define bam_is_rev(b) (((b)->core.flag & BAM_FREVERSE) != 0)

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
bam_hdr_t *sam_hdr_read(htsFile *fp);
void bam_hdr_destroy(bam_hdr_t *h);
#define sam_hdr_destroy bam_hdr_destroy
int bam_name2id(bam_hdr_t *h, const char *ref);
int sam_read1(htsFile *fp, bam_hdr_t *h, bam1_t *b);

hts_idx_t *sam_index_load(htsFile *fp, const char *fn);
hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, hts_pos_t beg,
                          hts_pos_t end);
int sam_itr_next(htsFile *fp, hts_itr_t *itr, bam1_t *b);

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_SAM_H */
