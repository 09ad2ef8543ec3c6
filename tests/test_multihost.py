"""Multi-host end-to-end: two OS processes with a jax.distributed local
coordinator, each calling its contig assignment; the concatenated output
and host-0's collectively-merged report must be byte-identical to the
single-process run (VERDICT r1 item 2)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from bs_call_tpu.io.bam import BamHeader, BamWriter

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


CTG_LEN = 4000


def _fixture(tmp_path, n_contigs=4):
    """Rich WGBS fixture (bs_call_tpu.utils.synth — the bench
    generator): pairs with overlaps, indels, soft clips, duplicates,
    three bisulfite strands, mixed qualities, plus a dbSNP index
    (VERDICT r04 item 5: multi-host identity must be shown on inputs
    that exercise the pipeline's real state space)."""
    from bs_call_tpu.utils.synth import make_dbsnp_index, make_wgbs_fixture

    ref, bam, _n = make_wgbs_fixture(
        str(tmp_path), 600, CTG_LEN, seed=11, n_contigs=n_contigs
    )
    dbsnp = make_dbsnp_index(
        str(tmp_path / "dbsnp.bin"),
        [f"chr{i + 1}" for i in range(n_contigs)],
        CTG_LEN,
        every=101,
    )
    return ref, bam, dbsnp


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_host_run_matches_single(tmp_path):
    ref, bam, dbsnp = _fixture(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH")) if p
    )
    env["BS_CALL_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    # single-process reference run
    single_vcf = tmp_path / "single.vcf"
    single_rep = tmp_path / "single.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
            "-o", str(single_vcf), "--benchmark-mode", "--device", "numpy",
            "-D", dbsnp, "--report-file", str(single_rep),
            # match the multihost header universe (-s from the universe)
            "-s", _sizes_file(tmp_path, ref),
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # two CLI processes with a local coordinator
    port = _free_port()
    procs = []
    outs = []
    for hid in range(2):
        out = tmp_path / f"host{hid}.vcf"
        rep = tmp_path / f"host{hid}.json"
        outs.append((out, rep))
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "bs_call_tpu.cli", bam,
                    "-r", ref, "-o", str(out), "--benchmark-mode",
                    "--device", "numpy", "-D", dbsnp,
                    "--report-file", str(rep),
                    "--num-hosts", "2", "--host-id", str(hid),
                    "--coordinator", f"localhost:{port}",
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]

    # concatenate per-host outputs in header contig order
    from bs_call_tpu.parallel.shard_runner import concat_vcfs

    order = [f"chr{i + 1}" for i in range(4)]
    cat = tmp_path / "cat.vcf"
    # host files in order of their first contig
    files = sorted(
        [str(o) for o, _ in outs],
        key=lambda p: min(
            order.index(l.split("\t")[0])
            for l in open(p)
            if not l.startswith("#")
        ),
    )
    concat_vcfs(files, str(cat), contig_order=order)
    assert cat.read_bytes() == single_vcf.read_bytes()

    # host 0 wrote the globally merged report == single-process report
    rep0 = json.loads((tmp_path / "host0.json").read_text())
    want = json.loads(single_rep.read_text())
    rep0.pop("date", None)
    want.pop("date", None)
    assert rep0 == want
    # host 1 must NOT write a report (merge happens once, on host 0)
    assert not (tmp_path / "host1.json").exists()


def _sizes_file(tmp_path, ref):
    p = tmp_path / "sizes.txt"
    with open(p, "w") as f:
        for i in range(4):
            f.write(f"chr{i + 1}\t{CTG_LEN}\n")
    return str(p)


def test_concat_cli(tmp_path):
    """python -m bs_call_tpu.concat merges per-host outputs into the
    single-process bytes (VCF and BCF), regardless of argument order."""
    ref, bam, dbsnp = _fixture(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH")) if p
    )
    env["BS_CALL_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)

    for ext, otype in (("vcf", "v"), ("bcf", "u")):
        single = tmp_path / f"single.{ext}"
        r = subprocess.run(
            [
                sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
                "-o", str(single), "--benchmark-mode", "--device",
                "numpy", "-O", otype,
                "-s", _sizes_file(tmp_path, ref),
            ],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        host_files = []
        for hid in range(2):
            out = tmp_path / f"h{hid}.{ext}"
            host_files.append(str(out))
            r = subprocess.run(
                [
                    sys.executable, "-m", "bs_call_tpu.cli", bam,
                    "-r", ref, "-o", str(out), "--benchmark-mode",
                    "--device", "numpy", "-O", otype,
                    "--num-hosts", "2", "--host-id", str(hid),
                ],
                env=env, capture_output=True, text=True, timeout=300,
            )
            assert r.returncode == 0, r.stderr[-1500:]
        merged = tmp_path / f"merged.{ext}"
        r = subprocess.run(
            [
                sys.executable, "-m", "bs_call_tpu.concat",
                host_files[1], host_files[0],  # deliberately reversed
                "-o", str(merged), "-O", otype,
            ],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        assert merged.read_bytes() == single.read_bytes()
