"""Native parallel BGZF deflate: byte identity with the serial writer,
and the .vcf.gz pipeline path (vector emitter through BgzfWriter)."""

import gzip
import io

import numpy as np
import pytest

from bs_call_tpu.io.bgzf import BgzfWriter, BGZF_EOF


def test_native_deflate_matches_serial():
    from bs_call_tpu.native import load

    if load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    data = (
        b"ACGT" * 50_000
        + rng.integers(0, 256, 700_001, dtype=np.uint8).tobytes()
        + b"tail" * 12_345
    )
    a, b = io.BytesIO(), io.BytesIO()
    w = BgzfWriter(a, threads=1)
    for i in range(0, len(data), 37_777):
        w.write(data[i : i + 37_777])
    w.close()
    w = BgzfWriter(b, threads=4)
    assert w._native is not None
    for i in range(0, len(data), 37_777):
        w.write(data[i : i + 37_777])
    w.close()
    assert a.getvalue() == b.getvalue()
    assert gzip.decompress(b.getvalue()) == data
    assert b.getvalue().endswith(BGZF_EOF)


def test_vcf_gz_output_matches_plain(tmp_path):
    from bs_call_tpu import constants as C
    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bam import BamHeader, BamWriter
    from bs_call_tpu.pipeline.runner import run_caller

    rng = np.random.default_rng(5)
    ctg_len = 20_000
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
    w = BamWriter(str(bam), hdr)
    bases = "ACGT"
    for k, p in enumerate(np.sort(rng.integers(0, ctg_len - 160, 2000))):
        p = int(p)
        rseq = list(seq[p : p + 150])
        for i in np.nonzero(rng.random(150) < 0.03)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, 150).astype(np.uint8)
        w.write(
            f"r{k}", 0, 0, p, 50, [(150, 0)], -1, -1, 0,
            "".join(rseq), q,
        )
    w.close()
    outs = {}
    for ft in (C.FT_VCF, C.FT_VCF_GZ):
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True,
        )
        cfg.out_file_type = ft
        o = io.BytesIO()
        run_caller(cfg, out_fileobj=o)
        outs[ft] = o.getvalue()
    assert gzip.decompress(outs[C.FT_VCF_GZ]) == outs[C.FT_VCF]
    assert outs[C.FT_VCF_GZ].endswith(BGZF_EOF)
