/* Minimal htsFile + index/iterator types (htslib API shim; see
 * tools/htslib_shim/README.md). Covers the surface the reference
 * bs_call sources use: hts_open/hts_hopen/hts_close, hts_set_threads,
 * hts_set_fai_filename, hts_idx_t/hts_itr_t lifecycle
 * (process.c:112-145, get_template_vector.c:68-95). */
#ifndef BSC_SHIM_HTS_H
#define BSC_SHIM_HTS_H

#include <stdint.h>
#include <stdio.h>

#include "htslib/bgzf.h"
#include "htslib/hfile.h"
#include "htslib/kstring.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t hts_pos_t;

/* htslib names: the reference tests fp->format.compression == bgzf and
 * fp->format.format == cram (parse_args.c:196-197). */
enum htsFormatCategory {
    unknown_category,
    sequence_data,
    variant_data,
    index_file,
    region_list
};
enum htsExactFormat {
    unknown_format,
    binary_format,
    text_format,
    sam,
    bam,
    bai,
    cram,
    crai,
    vcf,
    bcf,
    csi,
    gzi,
    tbi,
    bed
};
enum htsCompression { no_compression, gzip, bgzf, custom };

typedef struct htsFormat {
    enum htsFormatCategory category;
    enum htsExactFormat format;
    enum htsCompression compression;
} htsFormat;

typedef struct htsFile {
    char *fn;
    int is_write;
    int is_bin;  /* BAM in / BCF out */
    int is_bgzf; /* payload goes through the BGZF layer */
    htsFormat format;
    BGZF *bgzf;  /* compressed path (BAM in, 'z' out) */
    FILE *fp;    /* plain path (text VCF out, SAM text in) */
    kstring_t line;
} htsFile;

/* Output-type bits (pre-1.10 htslib-era defines the reference uses:
 * parse_args.c:174-189, print_vcf.c:632-637). */
#define FT_UNKN 0
#define FT_GZ 1
#define FT_VCF 2
#define FT_VCF_GZ (FT_GZ | FT_VCF)
#define FT_BCF (1 << 2)
#define FT_BCF_GZ (FT_GZ | FT_BCF)
#define FT_STDIN (1 << 3)

/* BAI index: one loaded struct per target. */
typedef struct hts_idx_t hts_idx_t;

typedef struct hts_itr_t {
    int tid;
    hts_pos_t beg, end;
    int finished;
    int n_off, cur_off;
    uint64_t *off_beg, *off_end; /* virtual-offset chunks */
    uint64_t curr_voff;
} hts_itr_t;

htsFile *hts_open(const char *fn, const char *mode);
htsFile *hts_hopen(hFILE *hf, const char *fn, const char *mode);
int hts_close(htsFile *fp);
int hts_set_threads(htsFile *fp, int n);
int hts_set_fai_filename(htsFile *fp, const char *fn_aux);

void hts_idx_destroy(hts_idx_t *idx);
void hts_itr_destroy(hts_itr_t *itr);

#define HTS_IDX_NOCOOR (-2)
#define HTS_IDX_START (-3)
#define HTS_IDX_REST (-4)
#define HTS_IDX_NONE (-5)

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_HTS_H */
