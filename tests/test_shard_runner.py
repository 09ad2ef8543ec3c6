"""Sharded execution invariant: per-contig shards produce the same records
and merged stats as a single-process run (SURVEY §4.3)."""

import io
import os

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.parallel.shard_runner import partition_contigs, run_sharded
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.stats.collect import BsStats


def make_fixture(tmp_path, n_contigs=3, seed=0):
    rng = np.random.default_rng(seed)
    lens = [2000, 1500, 1000][:n_contigs]
    seqs = ["".join(rng.choice(list("ACGT"), ln)) for ln in lens]
    names = [f"chr{i+1}" for i in range(n_contigs)]
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        for name, seq in zip(names, seqs):
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i : i + 60] + "\n")
    bam = tmp_path / "in.bam"
    hdr_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(names, lens)
    )
    hdr = BamHeader(text=hdr_text, ref_names=names, ref_lens=lens)
    w = BamWriter(str(bam), hdr)
    rn = 0
    for tid, (seq, ln) in enumerate(zip(seqs, lens)):
        starts = np.sort(rng.integers(0, ln - 80, 150))
        for pos in starts:
            pos = int(pos)
            rlen = int(rng.integers(40, 70))
            rseq = list(seq[pos : pos + rlen])
            mm = rng.random(rlen) < 0.03
            bases = "ACGT"
            for i in np.nonzero(mm)[0]:
                rseq[i] = bases[int(rng.integers(0, 4))]
            q = rng.integers(15, 44, rlen).astype(np.uint8)
            w.write(
                f"r{rn}", 0, tid, pos, int(rng.integers(30, 60)),
                [(rlen, 0)], -1, -1, 0, "".join(rseq), q,
            )
            rn += 1
    w.close()
    return str(ref), str(bam)


def test_partition_balance():
    shards = partition_contigs(
        [("a", 100), ("b", 90), ("c", 50), ("d", 40)], 2
    )
    assert len(shards) == 2
    assert {n for s in shards for n in s} == {"a", "b", "c", "d"}


def records_of(path_or_bytes):
    if isinstance(path_or_bytes, bytes):
        text = path_or_bytes.decode()
    else:
        text = open(path_or_bytes).read()
    return [l for l in text.splitlines() if not l.startswith("#")]


def test_sharded_matches_single(tmp_path):
    ref, bam = make_fixture(tmp_path)
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True
    )
    out = io.BytesIO()
    single_stats = BsStats()
    run_caller(cfg, out_fileobj=out, stats=single_stats)
    single = records_of(out.getvalue())

    out_path = str(tmp_path / "merged.vcf")
    # workers use the numpy float64 engine: avoids spawned processes
    # touching the (single) accelerator and cross-validates the tiered
    # exactness scheme against pure float64
    cfg2 = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        device="numpy",
    )
    merged_stats, ctg_stats = run_sharded(
        cfg2, 3, out_path, collect_stats=True
    )
    sharded = records_of(out_path)
    assert len(single) == len(sharded)
    assert single == sharded
    # stats merge invariant
    np.testing.assert_array_equal(
        merged_stats.qual, single_stats.qual
    )
    np.testing.assert_array_equal(
        merged_stats.mut_counts, single_stats.mut_counts
    )
    assert merged_stats.snps == single_stats.snps
    assert merged_stats.CpG_ref == single_stats.CpG_ref
    np.testing.assert_array_equal(
        merged_stats.filter_counts, single_stats.filter_counts
    )
    cov_m = {k: v.all for k, v in merged_stats.cov_stats.items()}
    cov_s = {k: v.all for k, v in single_stats.cov_stats.items()}
    assert cov_m == cov_s
    used = min(
        merged_stats.meth_profile_used, single_stats.meth_profile_used
    )
    np.testing.assert_array_equal(
        merged_stats.meth_profile[:used], single_stats.meth_profile[:used]
    )


def test_sharded_compressed_outputs_match_single(tmp_path):
    """--shards with -O z/b/u: shard files are written in a uniform
    concatenatable encoding and the final stream is encoded at concat
    time; payload must equal the single-process run."""
    import gzip

    from bs_call_tpu import constants as C

    ref, bam = make_fixture(tmp_path)
    for ft in (C.FT_VCF_GZ, C.FT_BCF_GZ, C.FT_BCF):
        single = tmp_path / f"single_{ft}"
        shard = tmp_path / f"shard_{ft}"
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            out_file_type=ft,
        )
        with open(single, "wb") as f:
            run_caller(cfg, out_fileobj=f)
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            out_file_type=ft,
        )
        run_sharded(cfg, 2, str(shard), collect_stats=False)
        a = single.read_bytes()
        b = shard.read_bytes()
        if ft == C.FT_BCF:
            assert a == b
        else:
            assert gzip.decompress(a) == gzip.decompress(b)


def test_failed_shard_retries_once(tmp_path, monkeypatch):
    """Kill-a-worker fault injection: the first attempt of every shard
    os._exit(137)s (the BS_CALL_TEST_SHARD_CRASH hook), the retry pass
    re-runs them, and the final output is identical to a clean run —
    the reference's external re-run-a-contig recovery unit made
    automatic (SURVEY §5 failure detection)."""
    ref, bam = make_fixture(tmp_path)
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        device="numpy",
    )
    clean = str(tmp_path / "clean.vcf")
    run_sharded(cfg, 2, clean, collect_stats=False)

    crash_dir = tmp_path / "crash"
    crash_dir.mkdir()
    monkeypatch.setenv("BS_CALL_TEST_SHARD_CRASH", str(crash_dir))
    retried = str(tmp_path / "retried.vcf")
    run_sharded(cfg, 2, retried, collect_stats=False)
    # every shard crashed exactly once
    assert len(list(crash_dir.iterdir())) >= 1
    assert open(clean, "rb").read() == open(retried, "rb").read()


def test_failed_shard_gives_up_after_retry(tmp_path, monkeypatch):
    """A shard that keeps dying fails the run with a clear error."""
    from bs_call_tpu.parallel.shard_runner import _run_jobs_with_retry

    ref, bam = make_fixture(tmp_path)
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        device="numpy",
    )
    crash_dir = tmp_path / "crash2"
    crash_dir.mkdir()
    monkeypatch.setenv("BS_CALL_TEST_SHARD_CRASH", str(crash_dir))
    # max_retries=0: the injected first-attempt crash is fatal
    import pytest as _pytest

    cfg_dict = {
        k: getattr(cfg, k) for k in CallerConfig.__dataclass_fields__
    }
    sizes = tmp_path / "sizes.txt"
    sizes.write_text("chr1\t4000\n")
    job = (cfg_dict, ["chr1"], str(sizes), str(tmp_path / "s0.vcf"),
           False, None)
    with _pytest.raises(RuntimeError, match="failed after 1 attempts"):
        _run_jobs_with_retry([job], max_retries=0)


def test_shards_auto_degrade_gate(monkeypatch):
    """--shards must never be a pessimization (VERDICT r04 item 4): on a
    small-core host the CLI degrades to the single-process pipeline
    (same bytes), and BS_CALL_FORCE_SHARDS=1 forces real sharding."""
    from bs_call_tpu.parallel.shard_runner import shards_degrade_reason

    monkeypatch.delenv("BS_CALL_FORCE_SHARDS", raising=False)
    monkeypatch.setenv("BS_CALL_SHARD_MIN_CORES", "9999")
    assert shards_degrade_reason(4) is not None
    monkeypatch.setenv("BS_CALL_SHARD_MIN_CORES", "1")
    assert shards_degrade_reason(4) is None
    monkeypatch.setenv("BS_CALL_SHARD_MIN_CORES", "9999")
    monkeypatch.setenv("BS_CALL_FORCE_SHARDS", "1")
    assert shards_degrade_reason(4) is None


def test_shards_degraded_cli_bytes_match(tmp_path, monkeypatch):
    """A degraded --shards CLI run produces byte-identical output to a
    plain single-process run (it IS one), with the note on stderr."""
    import subprocess
    import sys

    ref, bam = make_fixture(tmp_path)
    env = {**os.environ, "BS_CALL_SHARD_MIN_CORES": "9999"}
    env.pop("BS_CALL_FORCE_SHARDS", None)
    outs = {}
    for tag, extra in (("single", []), ("degraded", ["--shards", "4"])):
        out = tmp_path / f"{tag}.vcf"
        r = subprocess.run(
            [sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
             "-o", str(out), "--benchmark-mode", "--device", "numpy",
             *extra],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = out.read_bytes()
        if tag == "degraded":
            assert "running single-process" in r.stderr
    assert outs["single"] == outs["degraded"]
