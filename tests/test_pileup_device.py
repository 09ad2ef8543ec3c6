"""Device pileup kernel parity vs the host scatter-add (ops/pileup.py):
counts bit-exact, f32 sums bit-exact in accumulation order, fused step's
genotype outputs equal to the unfused chain (VERDICT r1 item 6)."""

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamReader
from bs_call_tpu.io.fasta import FastaIndex
from bs_call_tpu.ops.kernels.pileup_device import (
    device_pileup,
    fused_pileup_call,
    pack_reads,
)
from bs_call_tpu.ops.pileup import build_pileup
from bs_call_tpu.pipeline.blocks import read_blocks
from bs_call_tpu.pipeline.contigs import reconcile_contigs
from bs_call_tpu.pipeline.template import process_template

from test_native_pipeline import random_bam


def blocks_of(ref, bam, cfg):
    reader = BamReader(bam)
    fasta = FastaIndex(ref)
    table = reconcile_contigs(fasta, reader.header, make_stats=False)
    for block in read_blocks(iter(reader), table, cfg, stats=None):
        first = block.align_list[0]
        x = first.forward_position or first.reverse_position
        x = x - 2 if x > 2 else 1
        for al in block.align_list:
            process_template(
                al, cfg.left_trim, cfg.right_trim, stats=None,
                min_qual=cfg.min_qual,
            )
        yield block, x, block.y


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_device_pileup_matches_host(tmp_path, seed):
    ref, bam = random_bam(tmp_path, n_pairs=250, seed=seed)
    cfg = CallerConfig(left_trim=(1, 0), right_trim=(0, 1))
    n_blocks = 0
    for block, x, y in blocks_of(ref, bam, cfg):
        sz = y - x + 1
        want_c2, want_qs, want_m2 = build_pileup(
            block.align_list, x, y, cfg.min_qual
        )
        rd, starts, ori, strand, mapq = pack_reads(block.align_list, x)
        c2, qs, m2 = device_pileup(
            rd, starts, ori, strand, mapq, sz, cfg.min_qual
        )
        np.testing.assert_array_equal(np.asarray(c2), want_c2)
        # f32 sums accumulate in the same (read, base) order
        np.testing.assert_array_equal(np.asarray(qs), want_qs)
        np.testing.assert_array_equal(np.asarray(m2), want_m2)
        n_blocks += 1
    assert n_blocks > 0


def test_fused_call_matches_unfused(tmp_path):
    import jax.numpy as jnp

    from bs_call_tpu.io.fasta import sequence_window
    from bs_call_tpu.ops.genotype import ModelParams, call_genotypes

    ref, bam = random_bam(tmp_path, n_pairs=200, seed=3)
    cfg = CallerConfig()
    fasta = FastaIndex(ref)
    pseq = fasta.load_contig("chr1")
    params = ModelParams()
    checked = 0
    for block, x, y in blocks_of(ref, bam, cfg):
        sz = y - x + 1
        rd, starts, ori, strand, mapq = pack_reads(block.align_list, x)
        refw = sequence_window(pseq, x, sz).astype(np.int32)
        gp, mg, mr, off, c2, qs, m2 = fused_pileup_call(
            rd, starts, ori, strand, mapq, refw, sz, cfg.min_qual,
            params, dtype=jnp.float32,
        )
        # unfused: host pileup -> aggregate quals (f32) -> device call
        want_c2, want_qs, _ = build_pileup(
            block.align_list, x, y, cfg.min_qual
        )
        counts = want_c2.sum(axis=1)
        nn = counts.astype(np.float32)
        avg = want_qs / np.where(nn > 0, nn, np.float32(1))
        quals = np.where(
            counts > 0, np.floor(np.float32(0.5) + avg), 0
        ).astype(np.int32)
        wgp, wmg, wmr, woff = call_genotypes(
            counts, quals, refw, params, dtype=jnp.float32
        )
        np.testing.assert_array_equal(np.asarray(c2), want_c2)
        np.testing.assert_array_equal(np.asarray(mg), np.asarray(wmg))
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wgp))
        checked += 1
    assert checked > 0
