/* Minimal hFILE (htslib API shim; see tools/htslib_shim/README.md).
 * The reference only uses hdopen(STDIN_FILENO) + hts_hopen
 * (process.c:128-129). */
#ifndef BSC_SHIM_HFILE_H
#define BSC_SHIM_HFILE_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct hFILE {
    int fd;
} hFILE;

hFILE *hdopen(int fd, const char *mode);
int hclose(hFILE *fp);

#ifdef __cplusplus
}
#endif

#endif /* BSC_SHIM_HFILE_H */
