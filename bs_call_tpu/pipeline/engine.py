"""Calling engine: batches pileup positions onto the accelerator and applies
the float64 libm rescue for boundary cases.

Design: the device kernel (ops/genotype.py) runs in float32 and returns the
top-2 log-likelihood margin per position. Positions whose margin is below a
magnitude-scaled threshold — where XLA-vs-libm ulp differences or float32
rounding could flip the argmax, the GQ integer, or a GL value — are
recomputed with the scalar float64 oracle, which uses the same libm as the
C reference. In real WGBS data this is a small fraction of positions, so
the device does the heavy lifting while outputs stay exact.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.constants import LOG10
from bs_call_tpu.ops import oracle
from bs_call_tpu.ops.postprocess import aggregate_pileup, fisher_strand
from bs_call_tpu.output.site import SiteCall


_UNSET = object()

# _accel_transfer_time result when the probe child could not acquire a
# device (e.g. a co-located TPU holds a per-process lock): the transfer
# cost is unknowable from outside, so callers skip the precheck and race
# the compiled engine directly, as before the probe existed.
_PROBE_UNKNOWN = object()

# Transfer probe, run in a CHILD process so a stalled transfer can be
# killed: a blocking device_put cannot be interrupted in a thread, and a
# daemon thread still inside the PJRT client when CPython finalizes
# aborts the whole process (pthread_exit unwinding through C++). The
# child writes progress lines to argv[1] so the parent can distinguish
# "device acquired, transfers slow" from "never got a device".
_PROBE_SRC = """\
import sys, time
out = open(sys.argv[1], "w", buffering=1)
bp = int(sys.argv[2])
import numpy as np
import jax
accel = [d for d in jax.devices() if d.platform != "cpu"]
if not accel:
    out.write("none\\n")
    sys.exit(0)
out.write("init %r\\n" % time.time())
h2d = [np.zeros((bp, 8), np.int32), np.zeros((bp, 8), np.int32),
       np.zeros(bp, np.int32)]
d2h = jax.device_put(np.zeros((bp, 20), np.float32), accel[0])
d2h.block_until_ready()
for a in h2d:
    jax.device_put(a, accel[0]).block_until_ready()
t0 = time.perf_counter()
for a in h2d:
    jax.device_put(a, accel[0]).block_until_ready()
np.asarray(d2h)
out.write("rt %r\\n" % (time.perf_counter() - t0))
f = jax.jit(lambda x: (x @ x).sum())
t0 = time.perf_counter()
f(jax.device_put(np.zeros((256, 256), np.float32), accel[0])
  ).block_until_ready()
out.write("jit %r\\n" % (time.perf_counter() - t0))
"""


def _devices_first_touch(jax_mod, timeout: float = 20.0):
    """First in-process device enumeration, on a DAEMON thread with a
    deadline: initializing a hung accelerator runtime otherwise blocks
    the main thread forever inside the PJRT client (observed live with
    a wedged tunnel). Returns the device list, or None when
    unavailable/hung (a leaked daemon thread stuck in C dies with the
    process)."""
    import threading

    box = {}

    def go():
        try:
            box["devs"] = jax_mod.devices()
        except Exception:
            box["devs"] = None

    t = threading.Thread(target=go, daemon=True, name="bsc-dev-touch")
    t.start()
    t.join(timeout)
    return box.get("devs")


def _probe_env_key(bp: int) -> str:
    """Per-host device fingerprint that does NOT initialize any jax
    backend: consulting the cache must never touch the accelerator —
    initializing a tunneled client mid-run has been observed to block
    for seconds while the tunnel is busy."""
    import os

    return (
        f"{os.uname().nodename}:{os.environ.get('JAX_PLATFORMS', '')}:"
        f"{bp}"
    )


def _probe_cache_path(key: str) -> str:
    import hashlib
    import tempfile

    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    return f"{tempfile.gettempdir()}/bsc_probe_cache_{h}.json"


def _probe_cache_read(key: str):
    """Cached transfer verdict for this device fingerprint, or None.
    Finite measurements live 24h; an 'inf' (transfers disqualify)
    verdict lives 1h — a congested tunnel may recover."""
    import json
    import os
    import time

    try:
        with open(_probe_cache_path(key)) as f:
            d = json.load(f)
        age = time.time() - d["t"]
        rt = float(d["rt"])
        if age < (3600 if rt == float("inf") else 86400):
            return rt
    except (OSError, ValueError, KeyError):
        pass
    return None


def _probe_cache_write(key: str, rt: float) -> None:
    import json
    import os
    import time

    path = _probe_cache_path(key)
    try:
        tmp = f"{path}.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"t": time.time(), "rt": repr(rt) if rt ==
                       float("inf") else rt}, f)
        os.replace(tmp, path)
    except OSError:
        pass


def _probe_cleanup(proc, path):
    """Kill a still-running probe child and remove its result file
    (idempotent; registered with atexit so no child outlives the run)."""
    import os

    try:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=5)
    except Exception:
        pass
    try:
        os.unlink(path)
    except OSError:
        pass


def _ms(t) -> str:
    if t is None:
        return "n/a"
    if t is _PROBE_UNKNOWN:
        return "unknown"
    if t == float("inf"):
        return ">grace"
    return f"{1e3 * t:.1f}ms"


def _cpu_device(jax):
    """The host CPU jax device, or None.

    When JAX_PLATFORMS pins a platform whose plugin never registered
    (e.g. a sitecustomize-registered accelerator dropped by a clobbered
    PYTHONPATH), every backend lookup raises — but the CPU plugin is
    always linked in. If no backend at all is initializable, re-pin the
    platform to cpu and retry once: an XLA CPU engine is strictly better
    than the silent NumPy degradation this used to cause."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        pass
    try:
        jax.devices()  # some backend works, just no cpu: leave it be
        return None
    except RuntimeError:
        try:
            jax.config.update("jax_platforms", "cpu")
            return jax.devices("cpu")[0]
        except Exception:
            return None


def _enable_compilation_cache(jax) -> None:
    """Opt-in persistent XLA compilation cache (BS_CALL_XLA_CACHE=dir or
    =1 for the default location): repeated CLI invocations skip the
    ~1-3s kernel compile. Opt-in because XLA:CPU AOT artifacts bake in
    host CPU features — a cache shared across heterogeneous machines can
    SIGILL (observed feature-mismatch warnings on this fleet)."""
    try:
        import os

        want = os.environ.get("BS_CALL_XLA_CACHE")
        if not want or jax.config.jax_compilation_cache_dir:
            return
        cache = want if want not in ("1", "true") else os.path.join(
            os.path.expanduser("~"), ".cache", "bs_call_tpu", "xla"
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


class CallEngine:
    """Maps (counts2, qual_sum, mapq2_sum, ref) blocks to per-position
    SiteCall results."""

    def __init__(self, cfg: CallerConfig):
        self.cfg = cfg
        self._params = None
        self._jax_state = _UNSET  # lazily imported, see _jax
        self._prefer_xla = None  # virtual-mesh f64 preference (cached)
        self._fast_broken = False
        self._sharded = {}  # (kind, backend) -> (mesh, jitted fn) | None
        self._exact_engine = None  # auto exact engine ("f64"|"dd"|"fused")
        self._fast_engine = None  # auto non-exact backend ("accel"|"cpu")
        self._exact_pos = 0  # positions processed before the race
        self._chunk_pool = None  # chunk-dispatch thread pool (lazy)
        self._fused_broken = False
        self._fused_fns = {}  # (n_pos, r_pad, l_cap) -> (mesh|None, fn)
        self._fused_pos = 0  # positions seen with reads (race gating)
        # device emit tier (SURVEY §7.4): the fused call also computes
        # the emit fields on device. Default ON wherever the fused tier
        # engages (device=tpu forces it; device=auto reaches it only
        # when the engine race picks "fused", and the race times the
        # fused+emit program, so a host that loses with the tier on
        # simply stays on f64) — byte-safety does not depend on device
        # float behavior (guard-banded risk bits + host rescue, plus
        # the quals/lag-code/margin compares). BS_CALL_EMIT_TIER=0
        # opts out (fused tier without device emit fields).
        from bs_call_tpu.utils import env_flag

        self._emit_tier = env_flag("BS_CALL_EMIT_TIER", default=True)
        self._emit_fns = {}  # (n_pos, r_pad, l_cap) -> sharded emit fn
        # forced --device tpu throughput watchdog (VERDICT r03 item 3;
        # reworked r05 per ADVICE r04: per-kernel/shape compile
        # exemption + trailing window + compile-time budget + bounded
        # first touch via _forced_device_ok)
        self._forced_bailed = False  # degraded to host for the rest
        self._forced_strict = None  # resolved at first device sample
        self._forced_calls = 0  # device calls seen (first = compile)
        self._forced_keys = set()  # kernel/shape keys already compiled
        self._forced_compile_t = 0.0  # wall seconds spent in compiles
        self._forced_window = []  # trailing (dt, n_pos) steady samples
        self._forced_host_rate = None  # measured host-f64 positions/s
        self._forced_ok = None  # first-touch gate verdict (cached)
        self._last_fused_key = None  # (kernel, shape) of last fused call
        self._probe_rt = _UNSET  # accelerator transfer probe (cached)
        self._probe_proc = _UNSET  # background probe child process
        self._probe_file = None  # the child's result file
        self._probe_key = ""  # device fingerprint for the disk cache
        self.tracer = None  # set by the runner for -v observability

    @property
    def _jax(self):
        """(jax, jnp, call_genotypes) or None — imported on FIRST USE,
        not at engine construction: the default exact path is the
        native C++ host kernel (_call_native_f64), so a cpu-pinned
        process (shard workers, report-only reruns) never pays the jax
        import or backend init at all. Reading this property past the
        cheap gates below is what triggers the import."""
        if self._jax_state is _UNSET:
            self._jax_state = None
            if self.cfg.device != "numpy":
                try:
                    import jax
                    import jax.numpy as jnp

                    from bs_call_tpu.ops.genotype import (
                        ModelParams,
                        call_genotypes,
                    )

                    _enable_compilation_cache(jax)
                    self._params = ModelParams(
                        under_conv=self.cfg.under_conv,
                        over_conv=self.cfg.over_conv,
                        ref_bias=self.cfg.ref_bias,
                    )
                    self._jax_state = (jax, jnp, call_genotypes)
                except Exception:
                    self._jax_state = None
        return self._jax_state

    # ------------------------------------------------------------------

    def _call_batch(self, counts, quals, ref):
        """Three-tier batch call. Returns (gt_prob [N,10] f64, max_gt [N],
        margin [N] f64, off_sum [N] f64).

        gt_prob's argmax entry is set C-style to -log(1+off)/LOG10 (f64,
        with the 1+off absorption the reference's double arithmetic has,
        genotype_model.c:240-244), so the emitter's phred chain reproduces
        the reference's GQ quantization exactly.
        """
        from bs_call_tpu.ops.genotype_np import call_genotypes_np

        n = len(ref)
        if n == 0:
            return (
                np.zeros((0, 10)),
                np.zeros(0, np.int32),
                np.zeros(0),
                np.zeros(0),
            )
        if self.cfg.exact or self._jax is None:
            # Exact mode needs float64-grade likelihoods (printed GL
            # fields carry ~6 significant digits; a plain f32 device
            # result has ~1e-4 relative ll error). Two engines provide
            # that: the df32 (double-float32) kernel on the accelerator
            # (device="tpu"), or XLA-jitted float64 on the host CPU
            # (default; NumPy fallback). Both land within ~1e-9 of
            # float64, below the scalar-oracle tie threshold.
            res = None
            use_dd = (
                self.cfg.device == "tpu" and not self._forced_bailed
            ) or (
                self.cfg.device == "auto" and self._auto_engine(n) == "dd"
            )
            if use_dd and self._jax is not None:
                if self.cfg.device == "tpu":
                    if self._forced_device_ok():
                        import time as _time

                        t0 = _time.perf_counter()
                        res = self._call_dd(counts, quals, ref)
                        if res is not None:
                            self._forced_feed(
                                _time.perf_counter() - t0, len(ref),
                                counts, quals, ref, key="dd",
                            )
                else:
                    res = self._call_dd(counts, quals, ref)
            if res is None and self._prefer_xla_f64():
                res = self._call_f64_cpu(counts, quals, ref)
            if res is None:
                res = self._call_native_f64(counts, quals, ref)
            if res is None:
                res = self._call_f64_cpu(counts, quals, ref)
            if res is not None:
                gt_prob, max_gt, margin, off = res
            else:
                gt_prob, max_gt, margin, off = call_genotypes_np(
                    counts, quals, ref,
                    self.cfg.under_conv, self.cfg.over_conv,
                    self.cfg.ref_bias,
                )
        else:
            jax, jnp, _ = self._jax
            res = None
            if not self._fast_broken:
                try:
                    if self.cfg.device == "tpu":
                        # forced non-exact path: same first-touch gate
                        # and watchdog as exact mode (ADVICE r04) — a
                        # slow accelerator link crawls here too
                        if self._forced_bailed or not (
                            self._forced_device_ok()
                        ):
                            res = self._chunked_call(
                                counts, quals, ref, jnp.float32,
                                backend="cpu",
                            )
                        else:
                            import time as _time

                            t0 = _time.perf_counter()
                            res = self._chunked_call(
                                counts, quals, ref, jnp.float32,
                                backend=None,
                            )
                            if res is not None:
                                self._forced_feed(
                                    _time.perf_counter() - t0,
                                    len(ref), counts, quals, ref,
                                    key="f32",
                                )
                    else:
                        res = self._chunked_call(
                            counts, quals, ref, jnp.float32,
                            backend=self._fast_backend(),
                        )
                except Exception:
                    # default backend unusable (e.g. accelerator plugin
                    # fails to initialize): degrade to the host engines
                    # rather than dying, once
                    self._fast_broken = True
            if res is None:
                res = self._call_host_f64(counts, quals, ref)
            if res is None:
                res = call_genotypes_np(
                    counts, quals, ref,
                    self.cfg.under_conv, self.cfg.over_conv,
                    self.cfg.ref_bias,
                )
            gt_prob, max_gt, margin, off = res
        return self._finish_exact(
            gt_prob, max_gt, margin, off, counts, quals, ref
        )

    def _finish_exact(self, gt_prob, max_gt, margin, off, counts, quals,
                      ref):
        """C-style max-entry replacement (absorbing 1+off) so the GQ
        phred chain reproduces the reference's double-precision
        quantization, plus (exact mode) the scalar-oracle rescue of true
        ties / libm-ulp boundaries (same libm as the C binary); the
        oracle's gt_prob is already C-style."""
        idx = np.arange(len(max_gt))
        gt_prob[idx, max_gt] = -np.log(1.0 + off) / LOG10
        if self.cfg.exact:
            ties = margin < 1e-9
            for j in np.nonzero(ties)[0]:
                gt_prob[j], max_gt[j] = oracle.calc_gt_prob(
                    counts[j], quals[j], int(ref[j]),
                    self.cfg.under_conv, self.cfg.over_conv,
                    self.cfg.ref_bias,
                )
        return gt_prob, max_gt, margin, off


    # ------------------------------------------------------------------
    # Fused device tier: the normalized read batch crosses H2D once and
    # pileup + aggregation + df32 model run in ONE compiled program
    # (ops/kernels/pileup_device.py) — the TPU-native replacement of the
    # reference's pileup + calc_gt_prob hot loops
    # (call_genotypes.c:180-226). Exactness contract: device quals are
    # shipped back (uint8) and compared against the host C++ aggregate;
    # any f32-boundary mismatch — and every ll tie — rescues through the
    # f64/oracle tiers, so output bytes are identical to the host
    # engines regardless of device float behavior.

    # extra padded positions beyond batch_positions: runner tail chunks
    # carry up to 16 overlap rows; 64 keeps the padded width divisible
    # by any power-of-two mesh up to 16 devices
    _FUSED_PAD = 64

    def wants_reads(self) -> bool:
        """Should the runner export per-block read batches? True when
        the fused tier could engage: exact mode with a JAX backend and
        either device=tpu (forced) or device=auto with an accelerator
        visible (the race decides later)."""
        cfg = self.cfg
        if not cfg.exact or self._fused_broken:
            return False
        if cfg.device == "tpu":
            return (
                self._jax is not None
                and not self._forced_bailed
                and self._forced_device_ok()
            )
        if cfg.device != "auto":
            return False
        if self._exact_engine is not None:
            return self._exact_engine == "fused"
        try:
            # a cached transfer verdict decides WITHOUT initializing the
            # accelerator client (a tunneled init mid-run can block for
            # seconds): transfers that lose to the f64 host chunk mean
            # the fused tier can never engage, so skip the read exports
            cached = _probe_cache_read(
                _probe_env_key(max(self.cfg.batch_positions, 1024))
            )
            if cached is not None:
                return cached != float("inf") and self._jax is not None
            import os as _os
            import sys as _sys

            if (
                "jax" not in _sys.modules
                and _os.environ.get("JAX_PLATFORMS", "").strip()
                == "cpu"
            ):
                return False  # cpu-pinned, jax never loaded: no accel
            if self._jax is None:
                return False
            # NEVER enumerate devices in-process here: jax.devices()
            # initializes every registered platform, and a hung
            # accelerator runtime (wedged tunnel) blocks indefinitely.
            # The killable probe child answers visibility with a
            # bounded wait; until it resolves, export reads
            # optimistically — the fused gate decides with the probe's
            # verdict before any device compile happens.
            self._start_probe()
            rt = self._probe_rt
            if rt is _UNSET or rt is _PROBE_UNKNOWN:
                return True
            if rt is None or rt == float("inf"):
                return False
            return True
        except Exception:
            return False

    def _fused_fn(self, n_pos: int, r_pad: int, l_cap: int):
        """Compiled fused kernel for one padded shape; position-sharded
        over the default backend's mesh when it has >1 usable device
        (reads data-parallel + one counts psum, sharding.py design)."""
        key = (n_pos, r_pad, l_cap)
        hit = self._fused_fns.get(key)
        if hit is not None:
            return hit
        import functools

        from bs_call_tpu.ops.kernels.pileup_device import (
            fused_ll_dd,
            sharded_fused_ll_dd,
        )
        from bs_call_tpu.parallel.sharding import usable_device_count

        jax = self._jax[0]
        mesh = None
        fn = None
        try:
            devs = jax.devices()
            nd = usable_device_count(len(devs), n_pos)
            if nd >= 2 and r_pad % nd == 0 and self.cfg.use_mesh:
                from jax.sharding import Mesh

                mesh = Mesh(np.array(devs[:nd]), ("pos",))
                fn = sharded_fused_ll_dd(
                    mesh, self._params, n_pos, self.cfg.min_qual
                )
        except Exception:
            mesh = None
            fn = None
        if fn is None:
            fn = functools.partial(
                fused_ll_dd,
                n_pos=n_pos,
                min_qual=self.cfg.min_qual,
                params=self._params,
            )

            def single(rd, starts, ori, strand, mapq, ref):
                return fn(rd, starts, ori, strand, mapq, ref)

            res = (None, single)
        else:
            res = (mesh, fn)
        self._fused_fns[key] = res
        return res

    @staticmethod
    def _pow2(n: int, lo: int) -> int:
        p = lo
        while p < n:
            p *= 2
        return p

    def _call_fused(self, reads: dict, lo: int, hi: int, ref_codes,
                    agg, covered_idx):
        """Fused-tier chunk call over block-relative window [lo, hi].
        Returns (gt_prob, max_gt, margin, off, dev_prep) for the covered
        subset (pre-absorption; mismatched-quals rows carry margin=0 so
        _finish_exact's oracle rescue recomputes them from host inputs;
        dev_prep is the emit tier's window-aligned field dict or None —
        returned, not stashed, because chunks dispatch from a thread
        pool), or None to fall back to the column engines."""
        if self._fused_broken or self._jax is None:
            return None
        sz = hi - lo + 1
        # runner chunk width is max(batch_positions, 1024) (+16 overlap
        # on tail chunks) — runner.py CHUNK
        n_pos = max(self.cfg.batch_positions, 1024) + self._FUSED_PAD
        if sz > n_pos:
            return None
        try:
            from bs_call_tpu.ops.kernels.pileup_device import (
                pad_read_batch,
            )

            L = reads["rd"].shape[1]
            if L > 2048:
                return None
            l_cap = self._pow2(L, 64)
            starts = reads["starts"]
            n_rows = int(
                ((starts <= hi) & (starts + reads["lens"] - 1 >= lo)).sum()
            )
            r_pad = self._pow2(max(n_rows, 1), 1024)
            padded = pad_read_batch(reads, lo, hi, r_pad, l_cap)
            if padded is None:
                return None
            ref_pad = np.zeros(n_pos, np.int32)
            ref_pad[:sz] = np.asarray(ref_codes, dtype=np.int32)
            # each padded shape compiles its own XLA program (emit tier
            # included): the forced watchdog exempts the first call per
            # key from its throughput estimate (ADVICE r04)
            self._last_fused_key = (
                "fused", n_pos, r_pad, l_cap, bool(self._emit_tier)
            )
            mesh, fn = self._fused_fn(n_pos, r_pad, l_cap)
            fields = None
            if mesh is not None:
                from bs_call_tpu.parallel.sharding import shard_positions

                args = shard_positions(mesh, *padded, ref_pad)
            else:
                args = (*padded, ref_pad)
            if self._emit_tier and mesh is None:
                from bs_call_tpu.ops.kernels.emit_device import (
                    fused_ll_emit,
                )

                hi_p, lo_p, dev_q, fields = fused_ll_emit(
                    *args, n_pos=n_pos, min_qual=self.cfg.min_qual,
                    params=self._params,
                    quirk=self.cfg.reference_quirks,
                )
            elif self._emit_tier:
                key = (n_pos, r_pad, l_cap)
                fe = self._emit_fns.get(key)
                if fe is None:
                    from bs_call_tpu.ops.kernels.emit_device import (
                        sharded_fused_ll_emit,
                    )

                    fe = sharded_fused_ll_emit(
                        mesh, self._params, n_pos, self.cfg.min_qual,
                        quirk=self.cfg.reference_quirks,
                    )
                    self._emit_fns[key] = fe
                hi_p, lo_p, dev_q, fields = fe(*args)
            else:
                hi_p, lo_p, dev_q = fn(*args)
            from bs_call_tpu.ops.genotype_dd import dd_finish

            hi_p = np.asarray(hi_p)[covered_idx]
            lo_p = np.asarray(lo_p)[covered_idx]
            dev_q = np.asarray(dev_q)[covered_idx].astype(np.int32)
            gt_prob, max_gt, margin, off = dd_finish(hi_p, lo_p)
            host_q = agg["quals"][covered_idx]
            mism = (dev_q != host_q).any(axis=1)
            n_mism = int(mism.sum())
            if n_mism > max(16, len(covered_idx) // 100):
                # systematic divergence (should never happen): let the
                # column engines carry this chunk rather than walking
                # the oracle over it
                return None
            if n_mism:
                margin = margin.copy()
                margin[mism] = 0.0  # forces the oracle rescue
            prep = None
            if fields is not None:
                # window-aligned emit columns for the emitter splice;
                # quals-mismatch rows are stale on device (margin=0
                # already routes them to the oracle, and the caller
                # risk-flags rescued rows by comparing final codes)
                prep = {
                    k: np.asarray(v)[:sz] for k, v in fields.items()
                }
                if n_mism:
                    risk = prep["risk"].copy()
                    risk[covered_idx[mism]] = True
                    prep["risk"] = risk
            return gt_prob, max_gt, margin, off, prep
        except Exception:
            self._fused_broken = True
            return None

    def _fused_gate(self, reads, lo, hi, ref_codes, agg, covered_idx):
        """Decide whether this chunk runs the fused tier. device=tpu
        forces it; device=auto races one warm real chunk through fused
        vs the f64 host engine after 2M positions (never changing
        output bytes — both land below the oracle tie threshold)."""
        cfg = self.cfg
        if not cfg.exact or self._fused_broken:
            return False
        if cfg.device == "tpu":
            return (
                self._jax is not None
                and not self._forced_bailed
                and self._forced_device_ok()
            )
        if cfg.device != "auto":
            return False
        if self._exact_engine is not None:
            return self._exact_engine == "fused"
        self._fused_pos += len(covered_idx)
        if self._fused_pos < 2_000_000:
            if self._fused_pos >= 500_000:
                self._start_probe()  # background runway before the race
            return False
        try:
            import time

            def clock(fn):
                if fn() is None:
                    return float("inf")
                t0 = time.perf_counter()
                if fn() is None:
                    return float("inf")
                return time.perf_counter() - t0

            counts = agg["counts"][covered_idx].astype(np.int32)
            quals = agg["quals"][covered_idx]
            cref = np.asarray(ref_codes, dtype=np.int32)[covered_idx]
            t_f64 = clock(
                lambda: self._call_host_f64(counts, quals, cref)
            )
            # same transfer-only precheck as _auto_engine: the fused
            # tier moves a comparable volume (reads in, 3 position
            # tensors out); if the round-trip alone loses to the f64
            # chunk, skip the fused compile entirely (UNKNOWN = the
            # probe couldn't see the device: race the real engine)
            rt = self._accel_transfer_time(t_f64)
            if rt is None or (
                rt is not _PROBE_UNKNOWN and rt >= 0.8 * t_f64
            ):
                self._exact_engine = "f64"
                self._trace_decision(
                    f"exact engine: f64 (accel transfer "
                    f"{_ms(rt)} vs f64 chunk {_ms(t_f64)})"
                )
                return False
            # racing the real engine is this process's FIRST device
            # touch: bound it (a hung runtime would block forever; a
            # healthy one inits in ~1-2 s, so 8 s only misses the
            # accelerator when it was never going to answer)
            if _devices_first_touch(self._jax[0], timeout=8.0) is None:
                self._exact_engine = "f64"
                self._trace_decision(
                    "exact engine: f64 (device init unavailable)"
                )
                return False
            t_fused = clock(
                lambda: self._call_fused(
                    reads, lo, hi, ref_codes, agg, covered_idx
                )
            )
            self._exact_engine = (
                "fused" if t_fused < 0.8 * t_f64 else "f64"
            )
            self._trace_decision(
                f"exact engine: {self._exact_engine} (fused "
                f"{_ms(t_fused)} vs f64 {_ms(t_f64)}, transfer {_ms(rt)})"
            )
        except Exception:
            self._exact_engine = "f64"
        return self._exact_engine == "fused"

    def _forced_feed(self, dt, n_pos, counts, quals, ref, key=None):
        """Forced --device tpu throughput watchdog (VERDICT r03 item 3).

        The user forced the accelerator, but over a tunneled/remote
        chip per-chunk transfers can make the device path hundreds of
        times slower than the host engines (387 reads/s vs 107k
        observed in BENCH_r03) — indistinguishable from a hang on real
        inputs. Once the device path has demonstrably sustained < 1/2
        the measured host-f64 rate, degrade the REST of the run to the
        host engines with a stderr warning. Output bytes are unchanged
        (every exact tier lands below the oracle tie threshold, same
        guarantee as the auto race). BS_CALL_DEVICE_STRICT=1 keeps
        forcing regardless; a CPU default backend never bails (the
        "device" IS the host there — nothing faster to degrade to).

        Compile accounting (ADVICE r04): every NEW (kernel, shape) key
        compiles a fresh XLA program — the fused/emit tiers compile one
        per (n_pos, r_pad, l_cap), and r_pad varies per chunk — so the
        first sample of each key is excluded from the throughput
        estimate (it measures the compiler, not the device). Steady
        samples go into a bounded trailing window whose largest sample
        is discarded, so one stray pause can never permanently bail a
        healthy run. Compile time is still bounded: when cumulative
        compile wall time alone exceeds BS_CALL_DEVICE_COMPILE_BUDGET
        (default 150 s — the observed 600 s bench timeouts were exactly
        serial per-shape compiles over a wedged tunnel), the run bails
        to the host engines.
        """
        if self._forced_bailed or self._forced_strict:
            return
        self._forced_calls += 1
        if self._forced_calls == 1:
            # resolve strictness at the first sample, AFTER a device
            # call proved the backend is alive (jax.default_backend()
            # inits backends — unsafe before the engine touched it)
            try:
                from bs_call_tpu.utils import env_flag

                jax = self._jax[0]
                self._forced_strict = (
                    env_flag("BS_CALL_DEVICE_STRICT")
                    or jax.default_backend() == "cpu"
                )
            except Exception:
                self._forced_strict = True
            if self._forced_strict:
                return
        if key not in self._forced_keys:
            # this key's compile call: exclude from the rate, but bound
            # the total wall time spent compiling
            self._forced_keys.add(key)
            self._forced_compile_t += dt
            import os as _os

            try:
                budget = float(
                    _os.environ.get("BS_CALL_DEVICE_COMPILE_BUDGET", "150")
                )
            except ValueError:
                budget = 150.0
            if self._forced_compile_t > budget:
                self._forced_bail(
                    f"spent {self._forced_compile_t:.0f}s compiling "
                    f"device programs (budget {budget:.0f}s — slow "
                    "accelerator link?)"
                )
            return
        self._forced_window.append((float(dt), int(n_pos)))
        if len(self._forced_window) > 32:
            del self._forced_window[0]
        samples = self._forced_window
        if len(samples) >= 3:
            # discard the largest sample: a stray unexpected compile or
            # GC pause must not poison the steady-state estimate
            drop = max(range(len(samples)), key=lambda i: samples[i][0])
            samples = [s for i, s in enumerate(samples) if i != drop]
        dev_t = sum(s[0] for s in samples)
        dev_n = sum(s[1] for s in samples)
        if dev_t < 2.0 and dev_n < 4 * max(self.cfg.batch_positions, 1024):
            return  # not enough signal yet
        if len(samples) < 2 and dev_t < 6.0:
            return  # never judge on a single (possibly anomalous) sample
        dev_rate = dev_n / max(dev_t, 1e-9)
        if self._forced_host_rate is None:
            import time as _time

            m = min(len(ref), 4096)
            # warm call first: the native library may compile on first
            # use (~15 s of g++) — that must not pollute the host floor.
            # When the native kernel is unavailable, the XLA f64 CPU
            # kernel (the very engine a bail degrades to) IS the floor.
            for floor_fn in (self._call_native_f64, self._call_f64_cpu):
                if floor_fn(counts[:1], quals[:1], ref[:1]) is None:
                    continue
                t0 = _time.perf_counter()
                r = floor_fn(counts[:m], quals[:m], ref[:m])
                th = _time.perf_counter() - t0
                if r is not None and th > 0:
                    self._forced_host_rate = m / th
                    break
            if self._forced_host_rate is None:
                self._forced_strict = True  # no host floor to compare
                return
        if dev_rate < 0.5 * self._forced_host_rate:
            self._forced_bail(
                f"sustained {dev_rate:.0f} positions/s vs "
                f"{self._forced_host_rate:.0f} on the host f64 engine "
                "(slow accelerator link?)"
            )

    def _forced_bail(self, why: str) -> None:
        self._forced_bailed = True
        import sys as _sys

        msg = (
            f"bs_call: --device tpu {why}; degrading the rest of the "
            "run to the host engines (bytes unchanged). Set "
            "BS_CALL_DEVICE_STRICT=1 to keep forcing the device."
        )
        print(msg, file=_sys.stderr)
        self._trace_decision(msg)

    def _forced_device_ok(self) -> bool:
        """Bounded first-touch health gate for --device tpu (VERDICT
        r04 item 3): _forced_feed can only act after a device call
        RETURNS, so a wedged accelerator runtime hanging the first
        compile/transfer was unbounded (observed as 600 s bench
        timeouts). Before the process commits to its first in-process
        device call, a KILLABLE probe child must prove the device can
        transfer AND compile+run a jitted program within
        BS_CALL_DEVICE_PROBE_TIMEOUT (default 120 s). On failure the
        whole run degrades to the host engines with a warning (bytes
        unchanged). Short-circuits True when the platform is pinned to
        cpu (the 'device' is the host — nothing to gate) and under
        BS_CALL_DEVICE_STRICT=1 (the user accepts hangs)."""
        if self._forced_ok is not None:
            return self._forced_ok
        if self._forced_bailed:
            self._forced_ok = False
            return False
        import os
        import time

        from bs_call_tpu.utils import env_flag

        if env_flag("BS_CALL_DEVICE_STRICT"):
            self._forced_ok = True
            return True
        plats = [
            p.strip()
            for p in os.environ.get("JAX_PLATFORMS", "").split(",")
            if p.strip()
        ]
        if plats and all(p == "cpu" for p in plats):
            self._forced_ok = True
            return True
        try:
            deadline = float(
                os.environ.get("BS_CALL_DEVICE_PROBE_TIMEOUT", "120")
            )
        except ValueError:
            deadline = 120.0
        proc = self._start_probe()
        if proc is None:
            # verdict already resolved (disk cache / no accelerator
            # visible): a finite cached transfer time means the device
            # answered recently; inf/unknown means it did not
            rt = self._probe_rt
            self._forced_ok = rt is None or (
                rt is not _PROBE_UNKNOWN and rt != float("inf")
            )
        else:
            t_end = time.time() + deadline
            verdict = None
            while True:
                measured, _init, saw_none, jit_t = self._read_probe_file()
                if saw_none:
                    # no accelerator devices: the default backend is the
                    # host cpu — device calls are safe (and strictness
                    # resolves to 'never bail' at the first sample)
                    verdict = True
                    break
                if jit_t is not None:
                    verdict = True
                    if measured is not None:
                        _probe_cache_write(self._probe_key, measured)
                    break
                if proc.poll() is not None:
                    verdict = False  # crashed / device denied
                    break
                if time.time() > t_end:
                    verdict = False  # hung: kill it from outside
                    # cache the disqualification (1h TTL) so repeat
                    # runs on this host skip the bounded wait too
                    if self._probe_key:
                        _probe_cache_write(
                            self._probe_key, float("inf")
                        )
                    break
                time.sleep(0.05)
            if measured is not None and self._probe_rt is _UNSET:
                self._probe_rt = measured
            _probe_cleanup(proc, self._probe_file)
            self._forced_ok = verdict
        if not self._forced_ok:
            self._forced_bail(
                "accelerator probe could not compile+run a device "
                f"program within {deadline:.0f}s"
            )
        return self._forced_ok

    def _mesh_kernel(self, kind, backend):
        """(mesh, jitted sharded kernel) for the active backend, or None
        when it exposes <2 usable devices. kind: 'f32' | 'f64' | 'dd'.

        This is the production multi-chip path: whenever the selected
        backend is a multi-device mesh (a TPU slice, or the virtual CPU
        mesh in tests), the fixed-shape chunk is position-sharded over
        all devices with shard_map. The model is a pure per-position map,
        so sharded outputs are bitwise equal to the single-device kernel
        and the exactness tiers are untouched."""
        key = (kind, backend)
        if key in self._sharded:
            return self._sharded[key]
        res = None
        try:
            jax = self._jax[0]
            devs = jax.devices(backend) if backend else jax.devices()
            from bs_call_tpu.parallel.sharding import (
                sharded_call_genotypes,
                sharded_ll_dd,
                usable_device_count,
            )

            nd = usable_device_count(len(devs), self.cfg.batch_positions)
            if nd >= 2 and self.cfg.use_mesh:
                from jax.sharding import Mesh

                mesh = Mesh(np.array(devs[:nd]), ("pos",))
                if kind == "dd":
                    fn = sharded_ll_dd(mesh, self._params)
                else:
                    jnp = self._jax[1]
                    dtype = jnp.float64 if kind == "f64" else jnp.float32
                    fn = sharded_call_genotypes(mesh, self._params, dtype)
                res = (mesh, fn)
        except Exception:
            res = None
        self._sharded[key] = res
        return res

    def _trace_decision(self, msg: str) -> None:
        t = getattr(self, "tracer", None)
        if t is not None:
            t.progress(msg)

    def _read_probe_file(self):
        """(measured_rt | None, init_walltime | None, saw_none,
        jit_t | None)."""
        txt = ""
        try:
            with open(self._probe_file) as f:
                txt = f.read()
        except OSError:
            pass
        measured = init_t = jit_t = None
        saw_none = False
        for line in txt.splitlines():
            try:
                if line.startswith("rt "):
                    measured = float(line[3:])
                elif line.startswith("init "):
                    init_t = float(line[5:])
                elif line.startswith("jit "):
                    jit_t = float(line[4:])
                elif line.strip() == "none":
                    saw_none = True
            except ValueError:
                pass
        return measured, init_t, saw_none, jit_t

    def _accel_transfer_time(self, t_f64):
        """Measured H2D+D2H round-trip for one exact-mode chunk's data
        volume on the first non-CPU device (cached in-process and on
        disk). Returns None when there is no accelerator, a float in
        seconds (inf = transfers alone disqualify), or _PROBE_UNKNOWN
        when the probe child could not acquire a device — then the
        caller races the compiled engine directly, as before the probe
        existed. t_f64 is the measured per-chunk cost of the f64 host
        engine: the decision threshold the bound below is scaled by.

        This is a compile-free lower bound on any accelerator engine's
        per-chunk cost: the dd/fused kernels compute a 32k-position
        chunk in microseconds, so transfer decides the race. Probing
        transfer BEFORE compiling means a tunneled/remote chip — whose
        round-trip alone exceeds the whole f64 chunk — never triggers
        the (minutes-long over a tunnel) accelerator compile at all.

        The wait is adaptive, never a fixed stall: the child timestamps
        the moment it acquired the device ('init'); once its transfers
        have been in flight longer than max(0.5s, 20 * t_f64) they
        cannot win the 0.8 * t_f64 threshold, so the verdict is 'inf'
        without waiting for the (possibly minutes-long) round-trip to
        finish. Verdicts are cached on disk so repeat runs on the same
        host skip even that bounded wait."""
        import time

        proc = self._start_probe()
        if self._probe_rt is not _UNSET:
            return self._probe_rt
        if proc is None:  # unreachable guard: no child and no verdict
            self._probe_rt = _PROBE_UNKNOWN
            return self._probe_rt
        bound = max(0.5, 20.0 * t_f64)
        deadline_init = time.time() + 3.0  # child may still import jax
        verdict = _UNSET
        while verdict is _UNSET:
            measured, init_t, saw_none, _jit = self._read_probe_file()
            now = time.time()
            if measured is not None:
                verdict = measured
            elif saw_none:
                verdict = None
            elif proc.poll() is not None:
                # exited without a measurement: crashed or device denied
                verdict = _PROBE_UNKNOWN
            elif init_t is not None:
                if now - init_t > bound:
                    verdict = float("inf")  # in-flight > bound: can't win
                else:
                    time.sleep(0.05)
            elif now > deadline_init:
                # never acquired a device (e.g. a per-process TPU lock
                # blocks the child): cost unknowable from outside
                verdict = _PROBE_UNKNOWN
            else:
                time.sleep(0.05)
        self._probe_rt = verdict
        if verdict is not None and verdict is not _PROBE_UNKNOWN:
            _probe_cache_write(self._probe_key, verdict)
        _probe_cleanup(proc, self._probe_file)
        return self._probe_rt

    def _start_probe(self):
        """Launch the accelerator transfer probe child (idempotent).
        Returns the Popen, or None when there is nothing to probe (then
        self._probe_rt is already resolved)."""
        if self._probe_proc is not _UNSET:
            return self._probe_proc
        self._probe_proc = None
        try:
            import atexit
            import os
            import subprocess
            import sys
            import tempfile

            bp = max(self.cfg.batch_positions, 1024)
            self._probe_key = _probe_env_key(bp)
            cached = _probe_cache_read(self._probe_key)
            if cached is not None:
                # cache first, devices second: a cache hit must not
                # initialize the accelerator client at all
                self._probe_rt = cached
                return None
            import sys as _sys

            if (
                "jax" not in _sys.modules
                and os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
            ):
                # the platform is pinned to cpu and jax was never even
                # loaded: no accelerator is reachable from this process;
                # decide without paying the jax import (the cpu-pinned
                # shard-worker fast path)
                self._probe_rt = None
                return None
            jx = self._jax
            if jx is None:
                self._probe_rt = None
                return None
            # no in-process device enumeration (it can block forever on
            # a hung runtime): the child reports "none" when only CPU
            # devices exist and the bounded wait handles the rest
            fd, path = tempfile.mkstemp(prefix="bsc_probe_")
            os.close(fd)
            proc = subprocess.Popen(
                [sys.executable, "-c", _PROBE_SRC, path, str(bp)],
                stdin=subprocess.DEVNULL,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            atexit.register(_probe_cleanup, proc, path)
            self._probe_file = path
            self._probe_proc = proc
        except Exception:
            self._probe_rt = _PROBE_UNKNOWN
        return self._probe_proc

    def _auto_engine(self, n_batch: int) -> str:
        """Exact-mode engine selection for device=auto: default to the
        f64 host path, then — once enough positions have flowed to
        amortize a calibration — race one warm chunk through the df32
        accelerator path vs the f64 path and switch if the accelerator
        clearly wins. On a co-located TPU host dd wins easily; over a
        tunneled chip the transfer dominates and f64 stays. The decision
        never affects output bytes (both engines land below the
        scalar-oracle tie threshold)."""
        if self._exact_engine is not None:
            return self._exact_engine
        # NOTE: self._jax must not be touched before the transfer
        # verdict below — reading it imports jax, which a cpu-pinned
        # worker skips entirely (the probe resolves to 'no accelerator'
        # without it)
        self._exact_pos += n_batch
        if self._exact_pos < 2_000_000:
            if self._exact_pos >= 500_000:
                self._start_probe()  # background runway before the race
            return "f64"
        try:
            import time

            bp = self.cfg.batch_positions
            counts, quals, ref = (
                np.zeros((bp, 8), np.int32),
                np.zeros((bp, 8), np.int32),
                np.zeros(bp, np.int32),
            )

            def clock(fn):
                if fn() is None:  # engine unavailable: never select it
                    return float("inf")
                t0 = time.perf_counter()
                if fn() is None:
                    return float("inf")
                return time.perf_counter() - t0

            t_f64 = clock(lambda: self._call_host_f64(counts, quals, ref))
            # transfer-only precheck: if moving one chunk's data to the
            # accelerator and back already costs >= 0.8x the whole f64
            # chunk, no accelerator engine can win — and we never pay
            # its compile (minutes over a tunneled chip). UNKNOWN = the
            # probe couldn't see the device: race the real engine.
            rt = self._accel_transfer_time(t_f64)
            if rt is None or (
                rt is not _PROBE_UNKNOWN and rt >= 0.8 * t_f64
            ):
                self._exact_engine = "f64"
                self._trace_decision(
                    f"exact engine: f64 (accel transfer "
                    f"{_ms(rt)} vs f64 chunk {_ms(t_f64)})"
                )
                return "f64"
            if self._jax is None:  # accel plausible but no jax: host
                self._exact_engine = "f64"
                return "f64"
            if _devices_first_touch(self._jax[0], timeout=8.0) is None:
                self._exact_engine = "f64"
                self._trace_decision(
                    "exact engine: f64 (device init unavailable)"
                )
                return "f64"
            t_dd = clock(lambda: self._call_dd(counts, quals, ref))
            self._exact_engine = (
                "dd" if t_dd < 0.8 * t_f64 else "f64"
            )
            self._trace_decision(
                f"exact engine: {self._exact_engine} (dd {_ms(t_dd)} "
                f"vs f64 {_ms(t_f64)}, transfer {_ms(rt)})"
            )
        except Exception:
            self._exact_engine = "f64"
        return self._exact_engine

    def _pipe_chunks(self, counts, quals, ref, dispatch, finish,
                     window: int = 3):
        """Chunked engine driver with device pipelining: up to `window`
        chunks are in flight, dispatched from a small thread pool —
        JAX's async dispatch overlaps H2D/compute/D2H on accelerators,
        and on the CPU backend two concurrently-executing chunk programs
        use ~1.6x the cores one does (XLA:CPU does not fully parallelize
        this elementwise graph internally). In-order drain; fixed chunk
        shape = one compiled executable."""
        bp = self.cfg.batch_positions
        n = len(ref)
        gt_prob = np.empty((n, 10), dtype=np.float64)
        max_gt = np.empty(n, dtype=np.int32)
        margin = np.empty(n, dtype=np.float64)
        off = np.empty(n, dtype=np.float64)
        from collections import deque

        if self._chunk_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._chunk_pool = ThreadPoolExecutor(max_workers=2)
        pool = self._chunk_pool
        inflight = deque()

        def drain():
            s, e, fut = inflight.popleft()
            gp, mg, mr, of = finish(fut.result())
            m = e - s
            gt_prob[s:e] = gp[:m]
            max_gt[s:e] = mg[:m]
            margin[s:e] = mr[:m]
            off[s:e] = of[:m]

        for s in range(0, n, bp):
            e = min(s + bp, n)
            ck, qk, rk = counts[s:e], quals[s:e], ref[s:e]
            pad = bp - (e - s)
            if pad:
                ck = np.concatenate([ck, np.zeros((pad, 8), ck.dtype)])
                qk = np.concatenate([qk, np.zeros((pad, 8), qk.dtype)])
                rk = np.concatenate([rk, np.zeros(pad, rk.dtype)])
            inflight.append((s, e, pool.submit(dispatch, ck, qk, rk)))
            if len(inflight) >= window:
                drain()
        while inflight:
            drain()
        return gt_prob, max_gt, margin, off

    def _fast_backend(self):
        """Backend for the non-exact f32 path under device=auto: the
        same transfer verdict as exact mode decides whether per-chunk
        transfers to the default accelerator can beat the host CPU at
        all. A tunneled/remote chip (round-trip >> chunk compute) makes
        the accelerated fast path pathologically slow — observed 14x
        slower than the CPU backend — so chunks run on the CPU until a
        measured verdict says the accelerator link is fast (< 50 ms per
        chunk round-trip). Returns None for the default backend, or
        "cpu"."""
        if self.cfg.device != "auto" or self._jax is None:
            return None
        if self._fast_engine is None:
            try:
                rt = self._accel_transfer_time(0.025)
            except Exception:
                rt = _PROBE_UNKNOWN
            if rt is None or rt is _PROBE_UNKNOWN:
                # no accelerator (default backend IS the cpu) / probe
                # child could not see the device: old behavior
                self._fast_engine = "accel"
            else:
                self._fast_engine = "accel" if rt < 0.05 else "cpu"
            self._trace_decision(
                f"fast engine: {self._fast_engine} "
                f"(accel transfer {_ms(rt)})"
            )
        return None if self._fast_engine == "accel" else "cpu"

    def _chunked_call(self, counts, quals, ref, dtype, backend=None):
        """Run the jitted kernel over fixed-size chunks so exactly one
        shape is ever compiled per dtype; chunks are position-sharded
        over the backend's device mesh when it has more than one chip."""
        jax, jnp, call_genotypes = self._jax
        kind = "f64" if dtype == jnp.float64 else "f32"
        sharded = self._mesh_kernel(kind, backend)
        if sharded is not None:
            from bs_call_tpu.parallel.sharding import shard_positions

            mesh, fn = sharded

            def dispatch(ck, qk, rk):
                # shard_positions pins placement explicitly, so this is
                # safe from the dispatch pool threads
                return fn(*shard_positions(mesh, ck, qk, rk))
        else:
            # pin the device explicitly: dispatch runs on pool threads,
            # which do NOT inherit the caller's thread-local
            # jax.default_device (the f64 path must never land on a TPU
            # backend — f64 hangs there)
            dev = jax.devices(backend)[0] if backend else None

            def dispatch(ck, qk, rk):
                if dev is not None:
                    args = (
                        jax.device_put(ck, dev),
                        jax.device_put(qk, dev),
                        jax.device_put(rk, dev),
                    )
                else:
                    args = (
                        jnp.asarray(ck), jnp.asarray(qk), jnp.asarray(rk)
                    )
                return call_genotypes(*args, self._params, dtype=dtype)

        def finish(fut):
            return tuple(np.asarray(a) for a in fut)

        return self._pipe_chunks(counts, quals, ref, dispatch, finish)

    def _call_dd(self, counts, quals, ref):
        """Double-float32 batch on the accelerator; None on failure.
        Pads to fixed batch_positions-sized chunks so exactly one device
        shape is ever compiled (covered-position counts vary per block;
        unpadded calls recompiled per shape — catastrophic over a
        tunneled TPU)."""
        try:
            from bs_call_tpu.ops.genotype_dd import dd_finish
        except ImportError:
            return None
        try:
            import jax.numpy as jnp

            from bs_call_tpu.ops.genotype_dd import genotype_ll_dd

            sharded = self._mesh_kernel("dd", None)
            if sharded is not None:
                from bs_call_tpu.parallel.sharding import shard_positions

                mesh, fn = sharded

                def dispatch(ck, qk, rk):
                    return fn(*shard_positions(mesh, ck, qk, rk))
            else:

                def dispatch(ck, qk, rk):
                    return genotype_ll_dd(
                        jnp.asarray(ck), jnp.asarray(qk),
                        jnp.asarray(rk), self._params,
                    )

            def finish(fut):
                return dd_finish(*fut)

            # 3 chunks in flight: H2D + device df32 compute of chunk k+1
            # overlap the D2H + host f64 finish of chunk k (the finish is
            # real host work here, so pipelining pays even over a slow
            # transport)
            return self._pipe_chunks(counts, quals, ref, dispatch, finish)
        except Exception:
            return None

    def _prefer_xla_f64(self) -> bool:
        """True only on a single-process multi-device CPU backend (the
        virtual test mesh, XLA_FLAGS=--xla_force_host_platform_device_
        count): there the XLA mesh f64 kernel IS the multi-chip
        machinery being validated, so it outranks the native
        single-host kernel. Decided without importing jax (free False
        in jax-less shard workers) and without initializing non-cpu
        backends (the platform must already be pinned to cpu). Real
        hosts expose one CPU device, multi-host cpu backends expose
        remote devices — both get the native kernel."""
        if self._prefer_xla is None:
            import sys

            self._prefer_xla = False
            if "jax" in sys.modules:
                jm = sys.modules["jax"]
                try:
                    plats = jm.config.jax_platforms
                    # ONLY cpu may be listed: jm.devices("cpu")
                    # initializes every registered platform, and a
                    # hung accelerator runtime (wedged tunnel) then
                    # blocks this host-only decision indefinitely
                    names = [
                        p.strip() for p in str(plats or "").split(",")
                        if p.strip()
                    ]
                    if names and all(p == "cpu" for p in names):
                        devs = jm.devices("cpu")
                        local = jm.local_devices(backend="cpu")
                        if len(local) == len(devs):
                            from bs_call_tpu.parallel.sharding import (
                                usable_device_count,
                            )

                            self._prefer_xla = usable_device_count(
                                len(devs), self.cfg.batch_positions
                            ) >= 2
                except Exception:
                    self._prefer_xla = False
        return self._prefer_xla

    def _call_native_f64(self, counts, quals, ref):
        """Batched float64 model in native C++/glibc-libm
        (bsc_model.cpp) — the default exact engine on the host: no jax
        import, no XLA compile, threads follow CPU affinity. Returns
        None when the native library is unavailable (then the XLA f64
        kernel or numpy twin carries the batch)."""
        try:
            from bs_call_tpu.ops.genotype_native import native_model

            m = native_model(
                self.cfg.under_conv, self.cfg.over_conv,
                self.cfg.ref_bias,
            )
        except Exception:
            return None
        if m is None:
            return None
        return m.call(counts, quals, ref)

    def _call_host_f64(self, counts, quals, ref):
        """The production host-side f64 engine: native kernel, XLA CPU
        fallback. This (not _call_f64_cpu) is what the accelerator
        races must beat."""
        res = self._call_native_f64(counts, quals, ref)
        if res is None:
            res = self._call_f64_cpu(counts, quals, ref)
        return res

    def _call_f64_cpu(self, counts, quals, ref):
        """Float64 batch on the host CPU backend (XLA-jitted); None if
        unavailable."""
        if self._jax is None:
            return None
        jax, jnp, call_genotypes = self._jax
        cpu = _cpu_device(jax)
        if cpu is None:
            return None
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        with jax.default_device(cpu):
            return self._chunked_call(
                counts, quals, ref, jnp.float64, backend="cpu"
            )

    def call_block_soa(self, counts2, qual_sum, mapq2_sum, ref_codes,
                       agg=None, reads=None):
        """counts2 [sz,2,8], qual_sum [sz,8], mapq2_sum [sz],
        ref_codes [sz]. Returns a dict of position-major arrays:
        covered [sz] bool; counts [sz,8]; quals [sz,8]; mq, aq [sz];
        gt_prob [sz,10] f64; max_gt [sz]; fs [sz] f64.
        `agg` may carry natively precomputed aggregates. `reads`, when
        given, is (read_batch_dict, lo) with lo the block-relative
        offset of this window's first position — it enables the fused
        device tier (reads cross H2D instead of pileup columns)."""
        if agg is None:
            agg = aggregate_pileup(counts2, qual_sum, mapq2_sum)
        counts = agg["counts"]
        n = agg["n"]
        sz = len(n)
        covered_mask = n > 0
        covered = np.nonzero(covered_mask)[0]
        gt_prob_full = np.zeros((sz, 10), dtype=np.float64)
        max_gt_full = np.zeros(sz, dtype=np.int32)
        fs_full = np.zeros(sz, dtype=np.float64)
        if len(covered):
            ccounts = counts[covered]
            cquals = agg["quals"][covered]
            cref = np.asarray(ref_codes, dtype=np.int32)[covered]
            res = None
            prep = None
            if reads is not None:
                rd_dict, lo = reads
                hi = lo + sz - 1
                if self._fused_gate(
                    rd_dict, lo, hi, ref_codes, agg, covered
                ):
                    if self.cfg.device == "tpu":
                        import time as _time

                        t0 = _time.perf_counter()
                        res = self._call_fused(
                            rd_dict, lo, hi, ref_codes, agg, covered
                        )
                        if res is not None:
                            self._forced_feed(
                                _time.perf_counter() - t0,
                                len(covered), ccounts.astype(np.int32),
                                cquals, cref,
                                key=getattr(
                                    self, "_last_fused_key", None
                                ),
                            )
                    else:
                        res = self._call_fused(
                            rd_dict, lo, hi, ref_codes, agg, covered
                        )
                    if res is not None:
                        prep = res[4]
                        res = self._finish_exact(
                            *res[:4], ccounts.astype(np.int32), cquals,
                            cref,
                        )
            if res is not None:
                gt_prob, max_gt, margin, _off = res
            else:
                gt_prob, max_gt, margin, _off = self._call_batch(
                    ccounts.astype(np.int32), cquals, cref
                )
            gt_prob_full[covered] = gt_prob
            max_gt_full[covered] = max_gt
            if prep is not None:
                # host-side staleness: any row the exact tiers rescued
                # (ll tie / quals mismatch -> margin 0, or a changed
                # winner) invalidates its own prep AND its neighbours'
                # CG context; the device fs then carries only rows the
                # guard bands certify, the native kernel the rest
                risk = prep["risk"].copy()
                final_gt1 = np.where(
                    covered_mask, max_gt_full + 1, 0
                ).astype(prep["gt1"].dtype)
                changed = prep["gt1"] != final_gt1
                risk |= changed
                risk[:-1] |= changed[1:]
                risk[1:] |= changed[:-1]
                mfull = np.full(sz, np.inf)
                mfull[covered] = margin
                risk |= covered_mask & (mfull < 1e-8)
                prep["risk"] = risk
                fs_w = (prep["fs_hi"].astype(np.float64)
                        + prep["fs_lo"].astype(np.float64))
                fs_w[~covered_mask] = 0.0
                rc = np.nonzero(covered_mask & risk)[0]
                if len(rc):
                    fs_w[rc] = fisher_strand(
                        counts2[rc], max_gt_full[rc],
                        not self.cfg.reference_quirks,
                    )
                fs_full[:] = fs_w
            else:
                fs = fisher_strand(
                    counts2[covered], max_gt,
                    not self.cfg.reference_quirks,
                )
                fs_full[covered] = fs
        else:
            prep = None
        soa = {
            "covered": covered_mask,
            "counts": counts,
            "quals": agg["quals"],
            "mq": agg["mq"],
            "aq": agg["aq"],
            "gt_prob": gt_prob_full,
            "max_gt": max_gt_full,
            "fs": fs_full,
        }
        if prep is not None:
            soa["dev_prep"] = prep
        return soa

    def call_block(self, counts2, qual_sum, mapq2_sum, ref_codes, agg=None):
        """Object view of call_block_soa for the scalar emitter path."""
        soa = self.call_block_soa(
            counts2, qual_sum, mapq2_sum, ref_codes, agg=agg
        )
        return soa_to_calls(soa)


def soa_to_calls(soa) -> List[Optional[SiteCall]]:
    """Materialize per-position SiteCall objects from a call_block_soa
    result (the scalar emitter's input shape)."""
    out: List[Optional[SiteCall]] = [None] * len(soa["covered"])
    for j in np.nonzero(soa["covered"])[0]:
        out[j] = SiteCall(
            counts=soa["counts"][j],
            quals=soa["quals"][j],
            gt_prob=soa["gt_prob"][j],
            fisher_strand=soa["fs"][j],
            mq=int(soa["mq"][j]),
            aq=int(soa["aq"][j]),
            max_gt=int(soa["max_gt"][j]),
        )
    return out
