"""Pileup tensorization.

Converts a block of normalized (indel-free, reference-coordinate) reads into
dense per-position accumulators:
    counts2   [sz, 2, 8] int32   orientation x strand/base category
    qual_sum  [sz, 8]    float32 per-category summed base quality
    mapq2_sum [sz]       float32 summed squared mapping quality

Reference semantics: call_genotypes.c:180-226. Accumulation order follows
the C loop (templates in list order, segment 0 then 1, positions ascending)
so the float32 sums are bit-identical.

The host path (build_pileup) produces a flat observation stream which is
also the input format for the device scatter-add kernel.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from bs_call_tpu.constants import BASE_TAB_ST, FLT_QUAL
from bs_call_tpu.pipeline.alignments import AlignDetails


def flatten_block(
    align_list: List[AlignDetails], x: int, y: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a block of templates into parallel observation arrays.

    Returns (pos_off, cat, qual, ori, mapq) — one entry per base observation
    that passes the leading/trailing mask trim (call_genotypes.c:196-213).
    pos_off is the position offset relative to x; entries beyond y are
    dropped (the C loop stops at pos > y)."""
    pos_l, cat_l, q_l, ori_l, mq_l = [], [], [], [], []
    for al in align_list:
        x1 = al.forward_position
        if x1 == 0:
            x1 = al.reverse_position
        elif al.reverse_position > 0 and al.reverse_position < x1:
            x1 = al.reverse_position
        ori = al.orientation
        st = al.bs_strand
        for k in range(2):
            rd = al.read[k]
            if rd is None or len(rd) == 0:
                ori ^= 1
                continue
            q = (rd >> 2).astype(np.int32)
            base = (rd & 3).astype(np.int32)
            live = (q > 0) & (q != FLT_QUAL)
            idx = np.nonzero(live)[0]
            if len(idx) == 0:
                ori ^= 1
                continue
            read_start, read_end = int(idx[0]), int(idx[-1])
            pos = (al.reverse_position if k else al.forward_position) + read_start
            j = np.arange(read_start, read_end + 1)
            positions = pos + (j - read_start)
            keep = positions <= y
            j = j[keep]
            positions = positions[keep]
            pos_l.append(positions - x)
            cat_l.append(BASE_TAB_ST[st, base[j]])
            q_l.append(q[j])
            ori_l.append(np.full(len(j), ori, dtype=np.int32))
            mq_l.append(np.full(len(j), al.mapq[k], dtype=np.int32))
            ori ^= 1
    if not pos_l:
        z = np.zeros(0, dtype=np.int32)
        return z, z, z, z, z
    return (
        np.concatenate(pos_l).astype(np.int32),
        np.concatenate(cat_l).astype(np.int32),
        np.concatenate(q_l).astype(np.int32),
        np.concatenate(ori_l).astype(np.int32),
        np.concatenate(mq_l).astype(np.int32),
    )


def build_pileup(
    align_list: List[AlignDetails], x: int, y: int, min_qual: int
):
    """Host scatter-add pileup for positions x..y inclusive."""
    sz = y - x + 1
    counts2 = np.zeros((sz, 2, 8), dtype=np.int32)
    qual_sum = np.zeros((sz, 8), dtype=np.float32)
    mapq2_sum = np.zeros(sz, dtype=np.float32)
    pos, cat, q, ori, mapq = flatten_block(align_list, x, y)
    sel = (q >= min_qual) & (q != FLT_QUAL)
    pos, cat, q, ori, mapq = pos[sel], cat[sel], q[sel], ori[sel], mapq[sel]
    np.add.at(counts2, (pos, ori, cat), 1)
    np.add.at(qual_sum, (pos, cat), q.astype(np.float32))
    np.add.at(mapq2_sum, pos, (mapq * mapq).astype(np.float32))
    return counts2, qual_sum, mapq2_sum
