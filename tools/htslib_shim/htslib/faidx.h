/* Minimal faidx API (htslib API shim; see tools/htslib_shim/README.md).
 *
 * LAYOUT CONTRACT: the reference's read_reference.c:17-33 redeclares
 * the private `struct __faidx_t` / `faidx1_t` layouts and reads them
 * directly, so this shim's fai_load must populate structs with exactly
 * that shape (BGZF*, n, m, name[], khash(s) of faidx1_t, format). Both
 * sides instantiate the hash with this shim's khash.h, so the layouts
 * agree by construction. */
#ifndef BSC_SHIM_FAIDX_H
#define BSC_SHIM_FAIDX_H

#ifdef __cplusplus
extern "C" {
#endif

enum fai_format_options { FAI_NONE, FAI_FASTA, FAI_FASTQ };

typedef struct __faidx_t faidx_t;

faidx_t *fai_load(const char *fn);
void fai_destroy(faidx_t *fai);
int fai_build(const char *fn);
int faidx_nseq(const faidx_t *fai);
const char *faidx_iseq(const faidx_t *fai, int i);
int faidx_seq_len(const faidx_t *fai, const char *seq);

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_FAIDX_H */
