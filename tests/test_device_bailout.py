"""Forced --device tpu throughput watchdog (VERDICT r03 item 3): a
device path that demonstrably sustains far below the host-f64 engine
must degrade the rest of the run to the host engines (bytes unchanged)
instead of crawling or appearing hung, with BS_CALL_DEVICE_STRICT=1 as
the opt-out."""

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
    # the compile call has been consumed and strictness resolved to
    # "watchdog active" (on real hardware this happens after the first
    # live device call proves a non-cpu backend)
    eng._forced_strict = False
    eng._forced_calls = 1
    return eng


def test_slow_device_bails_to_host():
    eng = _armed_engine(batch_positions=1024)
    counts, quals, ref = _batch()
    # simulate a tunneled chip: 4096 positions in 3 wall seconds
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


def test_bailed_batch_matches_host_bytes():
    """After a bailout the batch path must produce the host engines'
    exact results (it IS the host path)."""
    counts, quals, ref = _batch(512, seed=3)
    eng = _armed_engine(batch_positions=256)
    eng._forced_feed(3.0, 4096, counts, quals, ref)
    assert eng._forced_bailed
    got = eng._call_batch(counts, quals, ref)
    want = CallEngine(CallerConfig(device="cpu"))._call_batch(
        counts, quals, ref
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
