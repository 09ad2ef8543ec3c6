/* Minimal BGZF reader/writer (htslib API shim; see
 * tools/htslib_shim/README.md). Supports BGZF-compressed streams
 * (RFC1952 gzip members with the BC extra field, raw-deflate payload,
 * 64 KiB logical blocks) and, for reading, transparent plain
 * (uncompressed) files — which is how the reference reads a plain-text
 * FASTA through its faidx (read_reference.c:60-87). Multi-threaded
 * block inflation backs hts_set_threads (a reader thread keeps an
 * ordered ring of compressed blocks; n workers inflate). */
#ifndef BSC_SHIM_BGZF_H
#define BSC_SHIM_BGZF_H

#include <stdint.h>
#include <stdio.h>
#include <sys/types.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct BGZF BGZF; /* opaque; no reference source pokes inside */

BGZF *bgzf_open(const char *path, const char *mode); /* "r" | "w" */
BGZF *bgzf_dopen(int fd, const char *mode);
int bgzf_close(BGZF *fp);
ssize_t bgzf_read(BGZF *fp, void *data, size_t length);
ssize_t bgzf_write(BGZF *fp, const void *data, size_t length);
int bgzf_getc(BGZF *fp);
int bgzf_flush(BGZF *fp);
/* Seek to an UNCOMPRESSED offset (htslib semantics for non-virtual
 * seeks used by faidx; only supported on plain files and on BGZF files
 * opened with a preloaded block index). */
int bgzf_useek(BGZF *fp, off_t uoffset, int whence);
/* Seek to an htslib virtual offset (coffset<<16 | uoffset); read side
 * of compressed files only. */
int bgzf_seek_virtual(BGZF *fp, uint64_t voff);
int bgzf_mt(BGZF *fp, int n_threads, int n_sub_blks);
/* Nonzero when the underlying file is BGZF-compressed. */
int bgzf_compression(BGZF *fp);

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_BGZF_H */
