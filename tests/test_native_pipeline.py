"""Native C++ pipeline parity vs the Python reference path: block metadata,
pileup tensors (bit-exact incl. float32 sums), stats counters and meth
profile on a randomized mixed workload."""

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import (
    BamHeader,
    BamWriter,
    BamReader,
    FDUP,
    FMREVERSE,
    FPAIRED,
    FPROPER_PAIR,
    FREAD1,
    FREAD2,
    FREVERSE,
    aux_tag,
)
from bs_call_tpu.io.fasta import FastaIndex, sequence_window
from bs_call_tpu.native import load
from bs_call_tpu.ops.pileup import build_pileup
from bs_call_tpu.pipeline.blocks import read_blocks
from bs_call_tpu.pipeline.contigs import reconcile_contigs
from bs_call_tpu.pipeline.template import process_template
from bs_call_tpu.stats.collect import BsStats
from bs_call_tpu.stats.meth_profile import meth_profile

pytestmark = pytest.mark.skipif(
    load() is None, reason="native toolchain unavailable"
)


def random_bam(tmp_path, n_pairs=300, seed=0):
    rng = np.random.default_rng(seed)
    ctg_len = 5000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    recs = []
    tags = [b"", aux_tag("XB", "A", "C"), aux_tag("XB", "A", "G")]
    for n in range(n_pairs):
        pos1 = int(rng.integers(0, ctg_len - 400))
        rlen = int(rng.integers(30, 80))
        tag = tags[n % 3]
        mapq = int(rng.integers(0, 60))
        kind = rng.random()
        if kind < 0.55:
            # proper pair, possibly overlapping
            gap = int(rng.integers(-rlen + 5, 60))
            pos2 = pos1 + rlen + gap
            isize = pos2 + rlen - pos1
            q1 = rng.integers(0, 44, rlen).astype(np.uint8)
            q2 = rng.integers(0, 44, rlen).astype(np.uint8)
            f1 = FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD1
            f2 = FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2
            if rng.random() < 0.05:
                f1 |= FDUP
                f2 |= FDUP
            recs.append(
                (pos1, f"p{n}", f1, 0, pos1, mapq, [(rlen, 0)], 0, pos2,
                 isize, seq[pos1 : pos1 + rlen], q1, tag)
            )
            recs.append(
                (pos2, f"p{n}", f2, 0, pos2, mapq, [(rlen, 0)], 0, pos1,
                 -isize, seq[pos2 : pos2 + rlen], q2, tag)
            )
        elif kind < 0.8:
            # single read, sometimes with clip or indel
            q = rng.integers(0, 44, rlen).astype(np.uint8)
            r = rng.random()
            if r < 0.3 and rlen > 12:
                cigar = [(4, 4), (rlen - 4, 0)]
                s = "AAAA" + seq[pos1 : pos1 + rlen - 4]
            elif r < 0.5 and rlen > 16:
                half = rlen // 2
                cigar = [(half, 0), (2, 2), (rlen - half, 0)]
                s = seq[pos1 : pos1 + half] + seq[
                    pos1 + half + 2 : pos1 + half + 2 + rlen - half
                ]
            elif r < 0.7 and rlen > 16:
                half = rlen // 2
                cigar = [(half, 0), (2, 1), (rlen - half - 2, 0)]
                s = seq[pos1 : pos1 + half] + "TT" + seq[
                    pos1 + half : pos1 + half + rlen - half - 2
                ]
            else:
                cigar = [(rlen, 0)]
                s = seq[pos1 : pos1 + rlen]
            flag = 16 if rng.random() < 0.5 else 0
            recs.append(
                (pos1, f"s{n}", flag, 0, pos1, mapq, cigar, -1, -1, 0, s,
                 q[: len(s)], tag)
            )
        else:
            # duplicate single at same position as previous-ish
            q = rng.integers(0, 44, rlen).astype(np.uint8)
            recs.append(
                (pos1, f"d{n}", 0, 0, pos1, mapq, [(rlen, 0)], -1, -1, 0,
                 seq[pos1 : pos1 + rlen], q, tag)
            )
            recs.append(
                (pos1, f"d{n}x", 0, 0, pos1, mapq, [(rlen, 0)], -1, -1, 0,
                 seq[pos1 : pos1 + rlen],
                 rng.integers(0, 44, rlen).astype(np.uint8), tag)
            )
    recs.sort(key=lambda r: r[0])
    w = BamWriter(str(bam), hdr)
    for r in recs:
        w.write(*r[1:])
    w.close()
    return str(ref), str(bam)


def python_blocks(ref, bam, cfg, with_stats=True):
    stats = BsStats() if with_stats else None
    reader = BamReader(bam)
    fasta = FastaIndex(ref)
    table = reconcile_contigs(fasta, reader.header, make_stats=False)
    ctg_seq = fasta.load_contig("chr1")
    out = []
    for block in read_blocks(iter(reader), table, cfg, stats=stats):
        y = block.y
        first = block.align_list[0]
        x = first.forward_position or first.reverse_position
        x = x - 2 if x > 2 else 1
        sz = y - x + 1
        ref_window = sequence_window(ctg_seq, x, sz + 2)
        max_pos_all = 0
        for al in block.align_list:
            orig_pos, max_pos = process_template(
                al, cfg.left_trim, cfg.right_trim, stats=stats,
                min_qual=cfg.min_qual,
            )
            if stats is not None:
                meth_profile(al, x, orig_pos, max_pos, ref_window, stats)
            max_pos_all = max(max_pos_all, max_pos)
        c2, qs, mq2 = build_pileup(block.align_list, x, y, cfg.min_qual)
        out.append(
            {
                "x": x,
                "y": y,
                "n": len(block.align_list),
                "max_pos": max_pos_all,
                "counts2": c2,
                "qual_sum": qs,
                "mapq2_sum": mq2,
                "ref_window": ref_window,
            }
        )
    return out, stats


@pytest.mark.parametrize("trims", [((0, 0), (0, 0)), ((3, 2), (2, 1))])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_pipeline_parity(tmp_path, seed, trims):
    ref, bam = random_bam(tmp_path, seed=seed)
    cfg = CallerConfig(left_trim=trims[0], right_trim=trims[1])
    py_blocks, py_stats = python_blocks(ref, bam, cfg)

    from bs_call_tpu.native.pipeline import NativePipeline

    tid_keep = np.ones(1, np.int8)
    npipe = NativePipeline(bam, cfg, tid_keep, collect_stats=True)
    mprof = np.zeros((512, 4), np.int64)
    i = 0
    while True:
        blk = npipe.next_block()
        if blk is None:
            break
        pb = py_blocks[i]
        assert blk["x"] == pb["x"] and blk["y"] == pb["y"], i
        assert blk["n_templates"] == pb["n"], i
        assert blk["max_pos"] == pb["max_pos"], i
        np.testing.assert_array_equal(blk["counts2"], pb["counts2"])
        np.testing.assert_array_equal(blk["qual_sum"], pb["qual_sum"])
        np.testing.assert_array_equal(blk["mapq2_sum"], pb["mapq2_sum"])
        npipe.block_meth_profile(pb["ref_window"], mprof)
        i += 1
    assert i == len(py_blocks)
    fc, fb, bf = npipe.get_stats()
    np.testing.assert_array_equal(fc, py_stats.filter_cts)
    np.testing.assert_array_equal(fb, py_stats.filter_bases)
    np.testing.assert_array_equal(bf, py_stats.base_filter)
    rows = len(py_stats.meth_profile)
    np.testing.assert_array_equal(mprof[:rows], py_stats.meth_profile)
    assert mprof[rows:].sum() == 0
    npipe.close()
