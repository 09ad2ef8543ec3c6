"""Forced --device tpu throughput watchdog (VERDICT r03 item 3, reworked
r05 per ADVICE r04): a device path that demonstrably sustains far below
the host-f64 engine must degrade the rest of the run to the host engines
(bytes unchanged) instead of crawling or appearing hung, with
BS_CALL_DEVICE_STRICT=1 as the opt-out. Compile calls are exempted per
(kernel, shape) key, steady samples live in a trailing window whose
largest sample is discarded, cumulative compile time is bounded, and the
FIRST device touch is gated by a killable child probe."""

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.pipeline.engine import CallEngine


def _batch(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 20, size=(n, 8)).astype(np.int32)
    quals = np.where(counts > 0, 30, 0).astype(np.int32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    return counts, quals, ref


def _armed_engine(**kw):
    eng = CallEngine(CallerConfig(device="tpu", **kw))
    # strictness resolved to "watchdog active" (on real hardware this
    # happens after the first live device call proves a non-cpu
    # backend); the default key's compile call already consumed
    eng._forced_strict = False
    eng._forced_calls = 1
    eng._forced_keys.add(None)
    eng._forced_ok = True  # first-touch gate passed
    return eng


def test_slow_device_bails_to_host():
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    # simulate a tunneled chip: 4096 positions in 3 wall seconds, twice
    # (a single slow sample is never judged — could be a stray pause)
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    assert not eng._forced_bailed
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    assert eng._forced_bailed
    # both forced gates must now refuse the device
    assert eng.wants_reads() is False
    assert (
        eng._fused_gate({}, 0, 0, ref, {"counts": counts}, np.arange(4))
        is False
    )


def test_fast_device_never_bails():
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    # a healthy co-located chip: 4096 positions in 200 us
    for _ in range(50):
        eng._forced_feed(2e-4, len(ref), counts, quals, ref)
    assert not eng._forced_bailed


def test_compile_calls_are_exempt_per_shape():
    """A new (kernel, shape) key's first sample measures the XLA
    compiler, not the device: multi-second compiles must not bail a
    healthy run (ADVICE r04 medium #1)."""
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    for r_pad in (1024, 2048, 4096, 8192):
        # each new emit shape compiles for 8 seconds...
        eng._forced_feed(
            8.0, len(ref), counts, quals, ref,
            key=("fused", 1088, r_pad, 128, True),
        )
        # ...then sustains healthy steady-state throughput
        for _ in range(4):
            eng._forced_feed(
                2e-4, len(ref), counts, quals, ref,
                key=("fused", 1088, r_pad, 128, True),
            )
    assert not eng._forced_bailed


def test_one_stray_pause_is_discarded():
    """The trailing window drops its largest sample: one GC pause or
    unexpected recompile cannot poison the steady-state estimate."""
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    eng._forced_feed(2e-4, len(ref), counts, quals, ref)
    eng._forced_feed(2e-4, len(ref), counts, quals, ref)
    eng._forced_feed(6.0, len(ref), counts, quals, ref)  # stray pause
    for _ in range(8):
        eng._forced_feed(2e-4, len(ref), counts, quals, ref)
    assert not eng._forced_bailed


def test_compile_budget_bails(monkeypatch):
    """Serial per-shape compiles over a wedged tunnel were the observed
    600 s bench timeouts: cumulative compile wall time past the budget
    bails to the host even though no steady sample ever ran."""
    monkeypatch.setenv("BS_CALL_DEVICE_COMPILE_BUDGET", "20")
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    for i, r_pad in enumerate((1024, 2048, 4096)):
        eng._forced_feed(
            9.0, len(ref), counts, quals, ref,
            key=("fused", 1088, r_pad, 128, True),
        )
    assert eng._forced_bailed


def test_strict_env_keeps_forcing(monkeypatch):
    monkeypatch.setenv("BS_CALL_DEVICE_STRICT", "1")
    eng = CallEngine(CallerConfig(device="tpu", batch_positions=1024))
    counts, quals, ref = _batch()
    # first call resolves strictness from the env var
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    assert eng._forced_strict
    assert not eng._forced_bailed


def test_host_floor_falls_back_to_xla_f64(monkeypatch):
    """When the native kernel is unavailable the XLA f64 CPU kernel —
    the engine a bail degrades to — provides the host floor instead of
    silently disabling the watchdog (ADVICE r04 low #4)."""
    eng = _armed_engine(batch_positions=1024)
    monkeypatch.setattr(eng, "_call_native_f64", lambda *a: None)
    counts, quals, ref = _batch()
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    eng._forced_feed(3.0, len(ref), counts, quals, ref)
    assert eng._forced_host_rate is not None
    assert eng._forced_bailed
    assert not eng._forced_strict


def test_first_touch_gate_short_circuits_on_cpu(monkeypatch):
    """JAX_PLATFORMS=cpu (the test harness, cpu-pinned workers): the
    'device' IS the host — the gate passes without spawning a probe."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    eng = CallEngine(CallerConfig(device="tpu", batch_positions=1024))
    assert eng._forced_device_ok() is True
    assert not eng._forced_bailed


def test_first_touch_gate_strict_skips_probe(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # pretend accelerator
    monkeypatch.setenv("BS_CALL_DEVICE_STRICT", "1")
    eng = CallEngine(CallerConfig(device="tpu", batch_positions=1024))
    assert eng._forced_device_ok() is True


def test_first_touch_gate_bails_on_dead_probe(monkeypatch):
    """A probe child that exits without proving a jitted device program
    ran means the accelerator is unreachable/wedged: the run must bail
    to the host BEFORE any in-process device call (VERDICT r04 item 3)."""
    import subprocess
    import sys

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("BS_CALL_DEVICE_STRICT", raising=False)
    eng = CallEngine(CallerConfig(device="tpu", batch_positions=1024))
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    eng._probe_proc = proc
    eng._probe_file = "/nonexistent/bsc_probe"
    monkeypatch.setattr(eng, "_start_probe", lambda: proc)
    assert eng._forced_device_ok() is False
    assert eng._forced_bailed
    # and the forced batch path now lands on the host engines
    counts, quals, ref = _batch(512, seed=3)
    got = eng._call_batch(counts, quals, ref)
    want = CallEngine(CallerConfig(device="cpu"))._call_batch(
        counts, quals, ref
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_first_touch_gate_passes_on_live_probe(monkeypatch):
    """A probe child that writes the jit line proves the device can
    compile+run: the gate passes and caches the transfer verdict."""
    import os
    import subprocess
    import sys
    import tempfile

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("BS_CALL_DEVICE_STRICT", raising=False)
    eng = CallEngine(CallerConfig(device="tpu", batch_positions=1024))
    fd, path = tempfile.mkstemp(prefix="bsc_probe_test_")
    with os.fdopen(fd, "w") as f:
        f.write("init 1.0\nrt 0.002\njit 0.5\n")
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        eng._probe_proc = proc
        eng._probe_file = path
        eng._probe_key = "test:key:1024"
        monkeypatch.setattr(eng, "_start_probe", lambda: proc)
        assert eng._forced_device_ok() is True
        assert not eng._forced_bailed
        assert proc.poll() is not None  # probe child was reaped
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_bailed_batch_matches_host_bytes():
    """After a bailout the batch path must produce the host engines'
    exact results (it IS the host path)."""
    counts, quals, ref = _batch(512, seed=3)
    eng = _armed_engine(batch_positions=256)
    eng._forced_feed(3.0, 4096, counts, quals, ref)
    eng._forced_feed(3.0, 4096, counts, quals, ref)
    assert eng._forced_bailed
    got = eng._call_batch(counts, quals, ref)
    want = CallEngine(CallerConfig(device="cpu"))._call_batch(
        counts, quals, ref
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
