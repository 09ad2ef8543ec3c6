"""Vectorized emitter parity: byte-identical VCF text vs the scalar path
on randomized workloads (with N bases in the reference to exercise the
strncpy-truncation windows and block-edge fixups)."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller


def make_fixture(tmp_path, seed, with_n=True, mismatch_rate=0.05):
    rng = np.random.default_rng(seed)
    ctg_len = 3000
    bases = list("ACGT")
    seq = rng.choice(bases, ctg_len)
    if with_n:
        nmask = rng.random(ctg_len) < 0.01
        seq[nmask] = "N"
    seq = "".join(seq)
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
    w = BamWriter(str(bam), hdr)
    starts = np.sort(rng.integers(0, ctg_len - 80, 600))
    for n, pos in enumerate(starts):
        pos = int(pos)
        rlen = int(rng.integers(30, 70))
        rseq = list(seq[pos : pos + rlen].replace("N", "A"))
        mm = rng.random(rlen) < mismatch_rate
        for i in np.nonzero(mm)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, rlen).astype(np.uint8)
        w.write(
            f"r{n}", 0, 0, pos, int(rng.integers(30, 60)), [(rlen, 0)],
            -1, -1, 0, "".join(rseq), q,
        )
    w.close()
    return str(ref), str(bam)


def _stats_equal(a, b):
    np.testing.assert_array_equal(a.qual, b.qual)
    np.testing.assert_array_equal(a.mut_counts, b.mut_counts)
    np.testing.assert_array_equal(a.dbSNP_mut_counts, b.dbSNP_mut_counts)
    np.testing.assert_array_equal(a.filter_counts, b.filter_counts)
    assert a.snps == b.snps and a.multi == b.multi
    assert a.CpG_ref == b.CpG_ref and a.CpG_nonref == b.CpG_nonref
    assert a.dbSNP_sites == b.dbSNP_sites
    assert a.dbSNP_var == b.dbSNP_var
    assert dict(a.fs_stats) == dict(b.fs_stats)
    assert dict(a.qd_stats) == dict(b.qd_stats)
    assert dict(a.mq_stats) == dict(b.mq_stats)
    ka = {k: (v.all, v.var, tuple(v.CpG), tuple(v.CpG_inf),
              tuple(v.gc_pcent)) for k, v in a.cov_stats.items()}
    kb = {k: (v.all, v.var, tuple(v.CpG), tuple(v.CpG_inf),
              tuple(v.gc_pcent)) for k, v in b.cov_stats.items()}
    assert ka == kb
    np.testing.assert_allclose(
        a.CpG_ref_meth, b.CpG_ref_meth, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        a.CpG_nonref_meth, b.CpG_nonref_meth, rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_vector_stats_dbsnp_matches_scalar(tmp_path, seed):
    from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder
    from bs_call_tpu.stats.collect import BsStats

    d = tmp_path / f"sd{seed}"
    d.mkdir()
    ref, bam = make_fixture(d, seed)
    # dbSNP index over some positions, a few maf-selected
    b = DbSnpIndexBuilder(maf_limit=0.1)
    rng = np.random.default_rng(seed + 99)
    for p in sorted(rng.choice(2900, 150, replace=False)):
        maf = 0.3 if p % 3 == 0 else -1.0
        b.add_snp("chr1", int(p) + 1, f"rs{p}", maf=maf)
    idxp = d / "dbsnp.bin"
    b.write(str(idxp))
    outs = []
    stats_list = []
    for use_vector in (False, True):
        cfg = CallerConfig(
            input_file=bam,
            reference_file=ref,
            benchmark_mode=True,
            dbsnp_file=str(idxp),
        )
        if not use_vector:
            cfg.out_file_type = -1
        out = io.BytesIO()
        st = BsStats()
        run_caller(cfg, out_fileobj=out, stats=st)
        outs.append(out.getvalue())
        stats_list.append(st)
    recs = [
        [l for l in o.decode().splitlines() if not l.startswith("#")]
        for o in outs
    ]
    assert len(recs[0]) == len(recs[1])
    for a, bb in zip(recs[0], recs[1]):
        assert a == bb
    _stats_equal(stats_list[0], stats_list[1])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("all_positions", [False, True])
def test_vector_matches_scalar(tmp_path, seed, all_positions):
    d = tmp_path / f"s{seed}{all_positions}"
    d.mkdir()
    ref, bam = make_fixture(d, seed)
    outs = []
    for use_vector in (False, True):
        cfg = CallerConfig(
            input_file=bam,
            reference_file=ref,
            benchmark_mode=True,
            all_positions=all_positions,
        )
        out = io.BytesIO()
        if not use_vector:
            # out_file_type outside (FT_VCF, FT_UNKN) keeps the text writer
            # but disables the vectorized gate in run_caller
            cfg.out_file_type = -1
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    # drop header (identical anyway) and compare records
    recs = [
        [l for l in o.decode().splitlines() if not l.startswith("#")]
        for o in outs
    ]
    assert len(recs[0]) == len(recs[1])
    for a, b in zip(recs[0], recs[1]):
        assert a == b


def _run_pair(ref, bam, collect=True, **cfg_kw):
    """(records, stats) for scalar and vector emitters on one input."""
    from bs_call_tpu.stats.collect import BsStats

    outs, stats_list = [], []
    for use_vector in (False, True):
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            **cfg_kw,
        )
        if not use_vector:
            cfg.out_file_type = -1
        out = io.BytesIO()
        st = BsStats() if collect else None
        run_caller(cfg, out_fileobj=out, stats=st)
        outs.append(
            [l for l in out.getvalue().decode().splitlines()
             if not l.startswith("#")]
        )
        stats_list.append(st)
    return outs, stats_list


def test_deep_pileup_beyond_4096(tmp_path):
    """Depth > 4096 at one site (mito/rRNA-style stack): scalar/vector
    byte parity, the >4096 coverage key in the stats, and an exact
    collective merge of those stats (the round-2 dense fold clipped
    this, parallel/distributed.py)."""
    ctg_len = 400
    seq = ("ACGT" * 100)[:ctg_len]
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + seq + "\n")
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"], ref_lens=[ctg_len],
    )
    bam = tmp_path / "deep.bam"
    w = BamWriter(str(bam), hdr)
    rng = np.random.default_rng(0)
    n_reads = 5000
    for i in range(n_reads):
        rseq = list(seq[100:160])
        if i % 2 == 0:
            rseq[30] = "T"  # het-ish variant under extreme depth
        q = rng.integers(25, 44, 60).astype(np.uint8)
        # alternate strands but keep positions identical: positional
        # dedup must NOT collapse these (they differ in qname only)
        w.write(f"d{i}", 16 if i % 3 == 0 else 0, 0, 100,
                50, [(60, 0)], -1, -1, 0, "".join(rseq), q)
    w.close()
    # -d: the stack IS the point — positional dedup would collapse it
    outs, stats_list = _run_pair(str(ref), str(bam),
                                 keep_duplicates=True)
    assert outs[0] == outs[1]
    deep_keys = [k for k in stats_list[1].cov_stats if k > 4096]
    assert deep_keys, "fixture failed to produce depth > 4096"
    from bs_call_tpu.parallel.distributed import merge_stats_collective

    merged = merge_stats_collective(stats_list[1])
    assert {k: v.all for k, v in merged.cov_stats.items()} == {
        k: v.all for k, v in stats_list[1].cov_stats.items()
    }
    assert dict(merged.fs_stats) == dict(stats_list[1].fs_stats)


def test_contig_start_tiny_blocks(tmp_path):
    """Blocks shorter than the 2-position lag window at a contig start
    (a 3bp read at pos 0, nothing else nearby) — the lag pipeline's
    nastiest corner (flush_vcf_entries, print_vcf.c:563-570): scalar
    and vector emitters must agree byte for byte across contigs."""
    lens = [300, 300, 300]
    names = ["chr1", "chr2", "chr3"]
    seqs = [("ACGT" * 75)[:300], ("CGTA" * 75)[:300], ("GTAC" * 75)[:300]]
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n"
        + "".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(names, lens)),
        ref_names=names, ref_lens=lens,
    )
    bam = tmp_path / "tiny.bam"
    w = BamWriter(str(bam), hdr)
    rng = np.random.default_rng(1)
    # chr1: ONLY a 3bp read at position 0
    w.write("t0", 0, 0, 0, 40, [(3, 0)], -1, -1, 0,
            seqs[0][:3], np.full(3, 35, np.uint8))
    # chr2: 1bp and 4bp islands at the start, then a distant island
    w.write("t1", 0, 1, 0, 40, [(1, 0)], -1, -1, 0,
            seqs[1][0], np.full(1, 30, np.uint8))
    w.write("t2", 16, 1, 2, 40, [(4, 0)], -1, -1, 0,
            seqs[1][2:6], np.full(4, 30, np.uint8))
    w.write("t3", 0, 1, 200, 40, [(5, 0)], -1, -1, 0,
            "T" + seqs[1][201:205], np.full(5, 38, np.uint8))
    # chr3: normal coverage so the pipeline keeps flowing after the
    # degenerate contigs
    for i, pos in enumerate(sorted(rng.integers(0, 240, 40))):
        pos = int(pos)
        rseq = list(seqs[2][pos : pos + 30])
        if rng.random() < 0.3:
            rseq[10] = "ACGT"[int(rng.integers(4))]
        w.write(f"n{i}", 0, 2, pos, 45, [(30, 0)], -1, -1, 0,
                "".join(rseq), rng.integers(20, 44, 30).astype(np.uint8))
    w.close()
    outs, stats_list = _run_pair(str(ref), str(bam))
    assert outs[0] == outs[1]
    _stats_equal(stats_list[0], stats_list[1])


def test_extreme_strand_bias_fs_keys(tmp_path):
    """All-forward variant stacks push the Fisher-strand phred far past
    the round-2 QC fold bound (512): scalar/vector parity plus an exact
    collective merge of the fs/qd distributions."""
    ctg_len = 500
    seq = ("AC" * 250)[:ctg_len]
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + seq + "\n")
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"], ref_lens=[ctg_len],
    )
    bam = tmp_path / "fs.bam"
    w = BamWriter(str(bam), hdr)
    rng = np.random.default_rng(2)
    for i in range(900):
        rseq = list(seq[50:110])
        if i % 2 == 0:
            rseq[25] = "G"
        rev = i % 2 == 1  # variant only ever on the forward strand
        q = rng.integers(30, 44, 60).astype(np.uint8)
        w.write(f"f{i}", 16 if rev else 0, 0, 50, 55, [(60, 0)],
                -1, -1, 0, "".join(rseq), q)
    w.close()
    outs, stats_list = _run_pair(str(ref), str(bam))
    assert outs[0] == outs[1]
    _stats_equal(stats_list[0], stats_list[1])
    from bs_call_tpu.parallel.distributed import merge_stats_collective

    merged = merge_stats_collective(stats_list[1])
    assert dict(merged.fs_stats) == dict(stats_list[1].fs_stats)
    assert dict(merged.qd_stats) == dict(stats_list[1].qd_stats)
