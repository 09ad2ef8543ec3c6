"""Fine-grained e2e profile of the caller on a fixture.

Monkeypatch-times the pipeline's hot functions (wall + CPU per call
site, any thread) and prints a table after N in-process runs. Usage:

    PYTHONPATH=/root/repo python tools/profile_e2e.py BAM REF [runs]

This is a builder tool, not a test: it answers "where does the wall
time go" (VERDICT round-3 item 1) without py-spy/perf, neither of
which exists in this image.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict

_acc = defaultdict(lambda: [0.0, 0.0, 0])  # name -> [wall, cpu, calls]
_lock = threading.Lock()


def _wrap(obj, name, label):
    fn = getattr(obj, name)

    def timed(*a, **k):
        w0 = time.perf_counter()
        c0 = time.thread_time()
        try:
            return fn(*a, **k)
        finally:
            w = time.perf_counter() - w0
            c = time.thread_time() - c0
            with _lock:
                s = _acc[label]
                s[0] += w
                s[1] += c
                s[2] += 1

    setattr(obj, name, timed)
    return fn


def main():
    bam, ref = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.pipeline import engine as eng
    from bs_call_tpu.pipeline import runner
    from bs_call_tpu.output import vector_site as vs
    from bs_call_tpu.native import pipeline as npipe
    from bs_call_tpu.ops import genotype_native as gn
    from bs_call_tpu.ops import postprocess as pp

    _wrap(eng.CallEngine, "call_block_soa", "engine.call_block_soa")
    _wrap(eng.CallEngine, "_call_native_f64", "  native_f64_model")
    _wrap(eng.CallEngine, "_finish_exact", "  finish_exact")
    _wrap(pp, "fisher_strand", "  fisher_strand")
    _wrap(vs.VectorBlockEmitter, "emit_block", "emit.emit_block")
    _wrap(vs, "_native_emit_prep", "  native_emit_prep")
    _wrap(vs, "_native_format", "  native_format+write")
    if hasattr(vs.VectorBlockEmitter, "_collect_stats"):
        _wrap(vs.VectorBlockEmitter, "_collect_stats", "  emit_stats")
    _wrap(npipe.NativePipeline, "next_block", "ingest.next_block")
    _wrap(npipe.NativePipeline, "_collect_block", "  collect_block")
    _wrap(gn.NativeGtModel, "call", "  gt_model.call(C++)")
    if hasattr(npipe.NativePipeline, "next_block_meta"):
        _wrap(npipe.NativePipeline, "next_block_meta", "ingest.next_meta")
    try:
        from bs_call_tpu.native import rowengine as rwe

        _wrap(rwe.HostRowEngine, "load", "row.load")
        _wrap(rwe.HostRowEngine, "model", "row.model")
        _wrap(rwe.HostRowEngine, "emit", "row.emit")
    except ImportError:
        pass

    wall = []
    for i in range(runs):
        with _lock:
            _acc.clear()
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            sample_name="S",
        )
        if threads:
            cfg.threads = threads
            cfg.input_threads = threads
            cfg.output_threads = threads
        out = open(os.devnull, "wb")
        t0 = time.perf_counter()
        runner.run_caller(cfg, out_fileobj=out)
        dt = time.perf_counter() - t0
        wall.append(dt)
        print(f"-- run {i}: wall {dt:.2f}s --", file=sys.stderr)
        rows = sorted(_acc.items(), key=lambda kv: -kv[1][1])
        for name, (w, c, n) in _acc.items() if False else rows:
            print(
                f"{name:28s} wall {w:7.2f}s  cpu {c:7.2f}s  x{n}",
                file=sys.stderr,
            )
    print(f"best wall: {min(wall):.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
