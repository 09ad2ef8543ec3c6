"""Per-position pileup aggregation and Fisher-strand preparation.

Reference semantics: call_genotypes.c:43-115 (call_thread). The C code
accumulates per-category quality sums and mapq^2 in float32 and rounds with
float32 arithmetic; we reproduce exactly that so integer outputs (AMQ, MQ,
average quality) are bit-identical on any backend.
"""

from __future__ import annotations

import numpy as np

from bs_call_tpu.constants import GT_HET, LOG10
from bs_call_tpu.ops import oracle

# Fisher 2x2 table construction per heterozygous genotype
# (call_genotypes.c:63-104). Rows: genotype index; the table is built as
#   ftab[0] = sum counts[0][cats_a], ftab[1] = sum counts[0][cats_b]
#   ftab[2] = sum counts[1][cats_a], ftab[3] = sum counts[1][cats_b]
# EXCEPT genotype 8 (GT), where the reference has a quirk: ftab[2] uses
# counts[0][6] instead of counts[1][6] (call_genotypes.c:98). We reproduce
# output-parity by default and expose fix_reference_quirks to disable it.
_FTAB_CATS = {
    1: ((0, 4), (1, 5, 7)),        # AC
    2: ((0,), (2, 6)),             # AG
    3: ((0, 4), (3, 7)),           # AT
    5: ((1, 5, 7), (2, 4, 6)),     # CG
    6: ((1, 5), (3,)),             # CT
    8: ((2, 4, 6), (3, 7)),        # GT
}


def aggregate_pileup(counts2, qual_sum, mapq2_sum):
    """Aggregate raw pileup accumulators into per-position stats.

    counts2:   [N, 2, 8] int  (orientation-split category counts)
    qual_sum:  [N, 8] float32 (per-category summed base quality)
    mapq2_sum: [N] float32    (summed squared mapping quality)
    Returns dict with counts [N,8], quals [N,8], aq [N], mq [N], n [N].
    Matches call_genotypes.c:45-59 with float32 arithmetic.
    """
    counts2 = np.asarray(counts2)
    qual_sum = np.asarray(qual_sum, dtype=np.float32)
    mapq2_sum = np.asarray(mapq2_sum, dtype=np.float32)
    counts = counts2.sum(axis=1).astype(np.int64)  # [N, 8]
    n = counts.sum(axis=1).astype(np.int64)
    nn = counts.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = qual_sum / np.where(nn > 0, nn, np.float32(1))  # f32 div as in C
    quals = np.where(counts > 0, np.floor(np.float32(0.5) + avg), 0).astype(
        np.int32
    )
    tot_qual = np.where(counts > 0, qual_sum, np.float32(0)).sum(
        axis=1, dtype=np.float32
    )
    nf = np.where(n > 0, n, 1).astype(np.float32)
    aq = np.where(n > 0, np.floor(np.float32(0.5) + tot_qual / nf), 0).astype(
        np.int32
    )
    # C: (int)(0.5 + sqrt(mapq2 / (float)n)) — division in f32, sqrt in f64
    mq = np.where(
        n > 0,
        (0.5 + np.sqrt((mapq2_sum / nf).astype(np.float64))).astype(np.int64),
        0,
    ).astype(np.int32)
    return {
        "counts": counts,
        "quals": quals.astype(np.int32),
        "aq": aq,
        "mq": mq,
        "n": n,
    }


def fisher_strand(counts2, max_gt, fix_reference_quirks: bool = False):
    """Phred-scaled Fisher strand-bias log10 p-value per position.

    counts2: [N, 2, 8]; max_gt: [N]. Only heterozygous calls get a test
    (call_genotypes.c:62-108); homozygous positions return 0.0.
    """
    counts2 = np.asarray(counts2)
    max_gt = np.asarray(max_gt)
    fs = np.zeros(len(max_gt), dtype=np.float64)
    het_idx = np.nonzero(GT_HET[max_gt])[0]
    for i in het_idx:
        g = int(max_gt[i])
        cats_a, cats_b = _FTAB_CATS[g]
        c = counts2[i]
        ftab = [
            int(c[0, list(cats_a)].sum()),
            int(c[0, list(cats_b)].sum()),
            int(c[1, list(cats_a)].sum()),
            int(c[1, list(cats_b)].sum()),
        ]
        if g == 8 and not fix_reference_quirks:
            # call_genotypes.c:98 uses counts[0][6] in the reverse-strand row
            ftab[2] = int(c[1, 2] + c[1, 4] + c[0, 6])
        z = oracle.fisher(ftab)
        if z < 1.0e-20:
            z = 1.0e-20
        fs[i] = np.log(z) / LOG10
    return fs


def phred_scores(gt_prob, max_gt):
    """GQ phred from the winning genotype posterior (print_vcf.c:140-148).

    phred = 255 if posterior >= 1 else min(255, int(-10*log10(1-p))).
    Computed per element with libm to match the C binary exactly.
    """
    import math

    gt_prob = np.asarray(gt_prob)
    max_gt = np.asarray(max_gt)
    out = np.zeros(len(max_gt), dtype=np.int32)
    for i in range(len(max_gt)):
        z = gt_prob[i, max_gt[i]]
        z1 = math.exp(z * LOG10)
        if z1 >= 1.0:
            out[i] = 255
        else:
            p = int(-10.0 * math.log(1.0 - z1) / LOG10)
            out[i] = 255 if p > 255 else p
    return out
