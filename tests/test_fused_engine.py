"""Fused device tier (reads cross H2D; pileup + aggregation + df32 model
in one program): byte identity vs the host engines, mesh engagement on
the 8-virtual-device backend, and the quals-mismatch rescue contract
(VERDICT r2 item 1)."""

import io
import tempfile
import pathlib

import jax
import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.native import load
from bs_call_tpu.pipeline.engine import CallEngine
from bs_call_tpu.pipeline.runner import run_caller

from test_native_pipeline import random_bam

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        load() is None, reason="native toolchain unavailable"
    ),
]


@pytest.fixture()
def spy_engine(monkeypatch):
    """Count fused-tier engagements/fallbacks across a run."""
    calls = {"fused": 0, "fallback": 0, "mesh": 0}
    orig_call = CallEngine._call_fused
    orig_fn = CallEngine._fused_fn

    def spy_call(self, *a, **k):
        r = orig_call(self, *a, **k)
        calls["fused" if r is not None else "fallback"] += 1
        return r

    def spy_fn(self, *a, **k):
        mesh, fn = orig_fn(self, *a, **k)
        if mesh is not None:
            calls["mesh"] += 1
        return mesh, fn

    monkeypatch.setattr(CallEngine, "_call_fused", spy_call)
    monkeypatch.setattr(CallEngine, "_fused_fn", spy_fn)
    return calls


def _run(bam, ref, device, **kw):
    kw.setdefault("batch_positions", 1 << 12)
    cfg = CallerConfig(
        input_file=str(bam), reference_file=str(ref),
        benchmark_mode=True, device=device, all_positions=True, **kw,
    )
    buf = io.BytesIO()
    run_caller(cfg, out_fileobj=buf)
    return buf.getvalue()


@pytest.mark.parametrize("seed", [3, 11])
def test_fused_mesh_byte_identity(tmp_path, spy_engine, seed):
    """device=tpu (forced fused) over the 8-device mesh must reproduce
    the numpy engine's bytes exactly, with zero fused fallbacks."""
    ref, bam = random_bam(tmp_path, n_pairs=1500, seed=seed)
    want = _run(bam, ref, "numpy")
    got = _run(bam, ref, "tpu")
    assert got == want
    assert spy_engine["fused"] > 0 and spy_engine["fallback"] == 0
    # the 8-virtual-device backend must engage the sharded fused kernel
    assert spy_engine["mesh"] > 0


def test_fused_partial_staging_identity(tmp_path, spy_engine):
    """Small batch_positions force partial-range staging (negative
    starts in the read export); fused output must stay byte-identical."""
    ref, bam = random_bam(tmp_path, n_pairs=2500, seed=7)
    want = _run(bam, ref, "numpy", batch_positions=512)
    got = _run(bam, ref, "tpu", batch_positions=512)
    assert got == want
    assert spy_engine["fused"] > 0 and spy_engine["fallback"] == 0


def test_quals_mismatch_rescues_to_oracle(tmp_path):
    """A position where the device aggregate disagrees with the host
    aggregate must be recomputed from HOST inputs via the oracle (the
    f32-boundary safety net): perturb the host quals and check the
    fused result equals the host engines on the perturbed values."""
    ref, bam = random_bam(tmp_path, n_pairs=400, seed=5)
    from bs_call_tpu.native.pipeline import NativePipeline

    cfg = CallerConfig(device="tpu", batch_positions=1 << 12)
    p = NativePipeline(str(bam), cfg, np.ones(1, np.int8))
    blk = p.next_block()
    reads = p.block_reads()
    p.close()
    sz = blk["y"] - blk["x"] + 1
    agg = blk["agg"]
    covered = np.nonzero(agg["n"] > 0)[0]
    # perturb one covered position's host quals
    j = covered[len(covered) // 2]
    cat = int(np.argmax(agg["counts"][j]))
    agg["quals"][j, cat] += 1
    rng = np.random.default_rng(0)
    ref_codes = rng.integers(0, 5, sz).astype(np.int32)

    eng = CallEngine(cfg)
    res = eng._call_fused(reads, 0, sz - 1, ref_codes, agg, covered)
    assert res is not None
    gt_prob, max_gt, margin, off = eng._finish_exact(
        *res[:4],
        agg["counts"][covered].astype(np.int32),
        agg["quals"][covered],
        ref_codes[covered],
    )
    # ground truth: the oracle on the (perturbed) host inputs
    from bs_call_tpu.ops import oracle

    jj = int(np.nonzero(covered == j)[0][0])
    want_prob, want_gt = oracle.calc_gt_prob(
        agg["counts"][j], agg["quals"][j], int(ref_codes[j]),
        cfg.under_conv, cfg.over_conv, cfg.ref_bias,
    )
    assert max_gt[jj] == want_gt
    np.testing.assert_allclose(gt_prob[jj], want_prob, rtol=0, atol=0)


def test_fused_declines_oversize_reads(tmp_path):
    """Reads longer than the fused L cap must fall back (None), not
    truncate."""
    ref, bam = random_bam(tmp_path, n_pairs=50, seed=1)
    from bs_call_tpu.native.pipeline import NativePipeline

    cfg = CallerConfig(device="tpu", batch_positions=1 << 12)
    p = NativePipeline(str(bam), cfg, np.ones(1, np.int8))
    blk = p.next_block()
    reads = p.block_reads()
    p.close()
    sz = blk["y"] - blk["x"] + 1
    covered = np.nonzero(blk["agg"]["n"] > 0)[0]
    wide = {
        **reads,
        "rd": np.zeros((len(reads["starts"]), 4096), np.uint8),
    }
    wide["rd"][:, : reads["rd"].shape[1]] = reads["rd"]
    eng = CallEngine(cfg)
    ref_codes = np.ones(sz, np.int32)
    assert (
        eng._call_fused(wide, 0, sz - 1, ref_codes, blk["agg"], covered)
        is None
    )
    assert not eng._fused_broken


def test_auto_gate_waits_for_race(tmp_path):
    """device=auto runs f64 until the 2M-position race; with no
    accelerator on this host the gate stays closed."""
    ref, bam = random_bam(tmp_path, n_pairs=100, seed=2)
    cfg = CallerConfig(device="auto", batch_positions=1 << 12)
    eng = CallEngine(cfg)
    assert not eng._fused_gate(None, 0, 0, None, None, np.arange(10))
    eng._exact_engine = "fused"
    assert eng._fused_gate(None, 0, 0, None, None, np.arange(10))
    assert eng.wants_reads()
    eng._exact_engine = "f64"
    assert not eng.wants_reads()


@pytest.mark.parametrize("mesh", [False, True])
def test_emit_tier_byte_identity(tmp_path, monkeypatch, spy_engine,
                                 mesh):
    """BS_CALL_EMIT_TIER=1 routes emit prep through the device kernel
    (fused_ll_emit single-device; sharded_fused_ll_emit with the
    genotype halo when the mesh engages) with per-row host rescue; VCF
    AND report bytes must equal the numpy engine's."""
    import io

    from bs_call_tpu.stats.collect import BsStats
    from bs_call_tpu.stats.report import write_report

    def run_with_report(device, **kw):
        kw.setdefault("batch_positions", 1 << 12)
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, device=device, all_positions=True,
            report_file="x.json", **kw,
        )
        buf = io.BytesIO()
        stats = BsStats()
        stats, table = run_caller(cfg, out_fileobj=buf, stats=stats)
        rep = io.StringIO()
        write_report(rep, cfg, stats, table)
        return buf.getvalue(), rep.getvalue()

    ref, bam = random_bam(tmp_path, n_pairs=1500, seed=13)
    want, want_rep = run_with_report("numpy")

    import bs_call_tpu.output.vector_site as vs

    hits = {"n": 0}
    orig = vs._splice_dev_prep

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            hits["n"] += 1
        return r

    monkeypatch.setattr(vs, "_splice_dev_prep", spy)
    monkeypatch.setenv("BS_CALL_EMIT_TIER", "1")
    got, got_rep = run_with_report("tpu", use_mesh=mesh)
    assert got == want
    assert hits["n"] > 0, "device emit prep never engaged"
    assert got_rep == want_rep
    if mesh:
        assert spy_engine["mesh"] > 0, "mesh never engaged"


def test_emit_tier_reference_with_N(tmp_path, monkeypatch):
    """The emitter's reference code is context-TRUNCATED after an N
    (strncpy semantics, print_vcf.c:563-580) while the device kernel
    uses raw codes — those rows must rescue to the host, keeping bytes
    identical on N-holed references (found by review: unflagged GL
    layout divergence)."""
    import io

    import numpy as np

    from bs_call_tpu.io.bam import BamHeader, BamWriter

    rng = np.random.default_rng(3)
    L = 4000
    seq = rng.choice(list("ACGT"), L)
    # pepper Ns so many covered sites sit 1-2 positions after one
    for p in range(50, L - 3, 37):
        seq[p] = "N"
    ref = tmp_path / "n.fa"
    ref.write_text(
        ">chr1\n" + "\n".join(
            "".join(seq[i:i + 60]) for i in range(0, L, 60)
        ) + "\n"
    )
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{L}\n",
        ref_names=["chr1"], ref_lens=[L],
    )
    bam = tmp_path / "n.bam"
    w = BamWriter(str(bam), hdr)
    bases = "ACGT"
    k = 0
    for pos in range(0, L - 80, 3):
        rl = 60
        rseq = ["A" if b == "N" else b for b in seq[pos:pos + rl]]
        for i in np.nonzero(rng.random(rl) < 0.03)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(20, 44, rl).astype(np.uint8)
        w.write(f"r{k:05d}", 0, 0, pos, 57, [(rl, 0)], -1, -1, 0,
                "".join(rseq), q)
        k += 1
    w.close()
    want = _run(bam, ref, "numpy")
    monkeypatch.setenv("BS_CALL_EMIT_TIER", "1")
    got = _run(bam, ref, "tpu", use_mesh=False)
    assert got == want
