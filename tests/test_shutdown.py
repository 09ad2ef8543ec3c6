"""Error-path shutdown of the threaded native driver: an emitter failure
mid-run must surface as a prompt exception (no hang, no native-pipeline
use-after-free) and leave the process healthy."""

import io
import time

import numpy as np

import bs_call_tpu.output.vector_site as vs
from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller


def _fixture(tmp_path):
    ctg_len = 60_000
    rng = np.random.default_rng(1)
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
    q = rng.integers(20, 44, 150).astype(np.uint8)
    for k, pos in enumerate(np.sort(rng.integers(0, ctg_len - 150, 8000))):
        pos = int(pos)
        w.write(
            f"r{k}", 0, 0, pos, 60, [(150, 0)], -1, -1, 0,
            seq[pos : pos + 150], q,
        )
    w.close()
    return str(bam), str(ref)


def test_emitter_failure_shuts_down_cleanly(tmp_path):
    bam, ref = _fixture(tmp_path)
    orig = vs.VectorBlockEmitter.emit_block
    calls = [0]

    def boom(self, *a, **k):
        calls[0] += 1
        if calls[0] >= 2:
            raise RuntimeError("synthetic emitter failure")
        return orig(self, *a, **k)

    vs.VectorBlockEmitter.emit_block = boom
    try:
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True
        )
        t0 = time.perf_counter()
        try:
            run_caller(cfg, out_fileobj=io.BytesIO())
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "synthetic" in str(e)
        assert time.perf_counter() - t0 < 30
    finally:
        vs.VectorBlockEmitter.emit_block = orig
    # process still healthy afterwards
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    assert out.getvalue().count(b"\n") > 100
