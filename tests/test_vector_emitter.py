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
