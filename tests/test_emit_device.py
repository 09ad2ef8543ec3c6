"""Parity tests for the device-side emit post-processing tier
(ops/kernels/emit_device.py) against the production host emit prep.

Contract under test (the same one every accelerator tier obeys): every
row the device does NOT flag as risky must be bit-identical to the host
path (bsc_emit.cpp via _native_emit_prep, f64 Fisher via bsc_stats.cpp,
f64 finish via dd_finish), and the risky fraction must stay small
enough for the tier to be worth running. Reference semantics:
print_vcf.c:140-266 (phred/filters/CG), call_genotypes.c:62-108 +
stats_utils.c:25-91 (Fisher)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow

import jax.numpy as jnp  # noqa: E402

from bs_call_tpu.ops.genotype import ModelParams  # noqa: E402
from bs_call_tpu.ops import oracle  # noqa: E402
from bs_call_tpu.ops.genotype_dd import dd_finish, genotype_ll_dd  # noqa: E402
from bs_call_tpu.ops import ddmath as dd  # noqa: E402
from bs_call_tpu.ops.kernels.emit_device import (  # noqa: E402
    _fisher_dd,
    _lfact_split,
    compact_emitted,
    emit_fields_dd,
    emit_fields_jit,
)
from bs_call_tpu.ops.postprocess import (  # noqa: E402
    aggregate_pileup,
    fisher_strand,
)


def _oracle_fs(tab):
    z = oracle.fisher([int(v) for v in tab])
    if z < 1e-20:
        z = 1e-20
    return math.log(z) / math.log(10.0) if sum(tab) else 0.0


def test_fisher_dd_matches_oracle():
    rng = np.random.default_rng(7)
    tabs = [rng.integers(0, 40, size=4) for _ in range(300)]
    tabs += [rng.integers(0, 300, size=4) for _ in range(100)]
    tabs += [
        [0, 0, 0, 0], [1, 0, 0, 0], [0, 5, 7, 0], [100, 1, 1, 100],
        [3, 3, 3, 3], [0, 0, 50, 50], [1, 1, 0, 0],
    ]
    tabs = np.array(tabs, dtype=np.int32)
    fs, over = dd.dd_jit(lambda t: _fisher_dd(t, _lfact_split()))(
        jnp.asarray(tabs)
    )
    y = np.asarray(fs[0], np.float64) + np.asarray(fs[1], np.float64)
    over = np.asarray(over)
    for i, t in enumerate(tabs):
        if over[i]:
            continue
        ref = _oracle_fs(t)
        assert abs(y[i] - ref) <= 1e-9 + 1e-9 * abs(ref), (t, y[i], ref)
    assert not over.any()


def test_fisher_dd_flags_long_walks():
    # min(b, c) beyond the device iteration bound must raise the
    # overflow flag (host rescue), never return an unflagged wrong p
    # delta>0 with min(b,c)=600 steps: the first-tail walk exceeds 512
    tabs = np.array(
        [[900, 600, 600, 900], [2000, 1, 1, 2000], [5, 600, 20, 5]],
        dtype=np.int32,
    )
    fs, over = dd.dd_jit(lambda t: _fisher_dd(t, _lfact_split()))(
        jnp.asarray(tabs)
    )
    y = np.asarray(fs[0], np.float64) + np.asarray(fs[1], np.float64)
    over = np.asarray(over)
    for i, t in enumerate(tabs):
        if not over[i]:
            ref = _oracle_fs(t)
            assert abs(y[i] - ref) <= 1e-9 + 1e-9 * abs(ref)
    assert over[0]  # 700-step walk exceeds the 512 bound


def _random_pileup(rng, n, deep=False):
    """Random per-position accumulators shaped like the fused tier's
    device_pileup outputs, including uncovered rows and het-rich mixes."""
    hi = 400 if deep else 30
    counts2 = rng.integers(0, hi, size=(n, 2, 8)).astype(np.int64)
    # sparsify: most positions see 1-3 categories; some are uncovered
    keep = rng.random((n, 2, 8)) < 0.35
    counts2 *= keep
    counts2[rng.random(n) < 0.15] = 0
    counts = counts2.sum(axis=1)
    avgq = rng.uniform(10.0, 43.0, size=(n, 8)).astype(np.float32)
    qual_sum = (counts.astype(np.float32) * avgq).astype(np.float32)
    ntot = counts.sum(axis=1).astype(np.float32)
    mapq2_sum = (ntot * rng.uniform(100.0, 3600.0, size=n).astype(
        np.float32
    )).astype(np.float32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    return counts2, qual_sum, mapq2_sum, ref


def _host_prep(counts2, qual_sum, mapq2_sum, ref, params):
    """The production host path on the same inputs: C++ aggregate
    semantics, df32 ll planes, f64 finish, f64 Fisher, bsc_emit prep."""
    from bs_call_tpu.output.vector_site import _native_emit_prep

    agg = aggregate_pileup(counts2, qual_sum, mapq2_sum)
    hi, lo = genotype_ll_dd(
        jnp.asarray(agg["counts"]), jnp.asarray(agg["quals"]),
        jnp.asarray(ref), params,
    )
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    gt_prob, mx, margin, off = dd_finish(hi, lo)
    fs = fisher_strand(counts2, mx)
    covered = agg["n"] > 0
    gt1 = np.where(covered, mx + 1, 0).astype(np.int32)
    g1 = np.concatenate([[0], gt1[:-1]]).astype(np.int32)
    g3 = np.concatenate([gt1[1:], [0]]).astype(np.int32)
    r = np.clip(ref, 0, 4).astype(np.int32)
    prep = _native_emit_prep(
        len(mx), agg["counts"].astype(np.int32), gt_prob, mx, r,
        agg["mq"], fs, g1, gt1, g3,
    )
    if prep is None:
        pytest.skip("native library unavailable")
    return (hi, lo), agg, mx, prep


@pytest.mark.parametrize("deep", [False, True])
def test_emit_fields_parity(deep):
    rng = np.random.default_rng(11 + deep)
    n = 1024
    params = ModelParams()
    counts2, qual_sum, mapq2_sum, ref = _random_pileup(rng, n, deep)
    (hi, lo), agg, mx_h, prep = _host_prep(
        counts2, qual_sum, mapq2_sum, ref, params
    )
    (phred, dp1, qd, fs_int, flt, mac1, gl_vals, gl_len, cg_code,
     cond_cg, het) = prep

    f = emit_fields_jit(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts2),
        jnp.asarray(qual_sum), jnp.asarray(mapq2_sum), jnp.asarray(ref),
    )
    f = {k: np.asarray(v) for k, v in f.items()}

    covered = agg["n"] > 0
    np.testing.assert_array_equal(f["covered"], covered)
    risk = f["risk"]
    ok = ~risk
    frac = risk[covered].mean() if covered.any() else 0.0
    assert frac < 0.10, f"risky fraction too high: {frac:.3f}"

    # integer quantities must be bit-identical on every non-risky row
    np.testing.assert_array_equal(f["max_gt"][ok], mx_h[ok])
    np.testing.assert_array_equal(f["counts"][ok], agg["counts"][ok])
    np.testing.assert_array_equal(f["quals"][ok], agg["quals"][ok])
    np.testing.assert_array_equal(f["mq"][ok], agg["mq"][ok])
    np.testing.assert_array_equal(f["phred"][ok], phred[ok])
    np.testing.assert_array_equal(f["dp1"][ok], dp1[ok])
    np.testing.assert_array_equal(f["qd"][ok], qd[ok])
    np.testing.assert_array_equal(f["fs_int"][ok], fs_int[ok])
    np.testing.assert_array_equal(f["flt"][ok], flt[ok])
    np.testing.assert_array_equal(f["mac1"][ok], mac1[ok])
    np.testing.assert_array_equal(f["gl_len"][ok], gl_len[ok])
    np.testing.assert_array_equal(f["gl_vals"][ok], gl_vals[ok])
    np.testing.assert_array_equal(f["cg_code"][ok], cg_code[ok])
    np.testing.assert_array_equal(f["cond_cg"][ok], cond_cg[ok])
    cov_ok = ok & covered
    np.testing.assert_array_equal(f["het"][cov_ok], het[cov_ok])
    # chunk edges must always be flagged (CG context crosses chunks)
    assert risk[0] and risk[-1]


def test_emit_fields_uncovered_and_ties():
    # all-zero pileups and exact ll ties must be risk-flagged or match
    params = ModelParams()
    n = 8
    counts2 = np.zeros((n, 2, 8), np.int64)
    counts2[3, 0, 1] = 5
    counts2[3, 1, 2] = 5
    qual_sum = np.zeros((n, 8), np.float32)
    qual_sum[3, 1] = 150.0
    qual_sum[3, 2] = 150.0
    mapq2_sum = np.zeros(n, np.float32)
    mapq2_sum[3] = 10 * 900.0
    ref = np.full(n, 2, np.int32)
    (hi, lo), agg, mx_h, prep = _host_prep(
        counts2, qual_sum, mapq2_sum, ref, params
    )
    f = emit_fields_dd(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts2),
        jnp.asarray(qual_sum), jnp.asarray(mapq2_sum), jnp.asarray(ref),
    )
    covered = np.asarray(f["covered"])
    assert covered[3] and covered.sum() == 1
    ok = ~np.asarray(f["risk"])
    np.testing.assert_array_equal(
        np.asarray(f["phred"])[ok], prep[0][ok]
    )


def test_compact_emitted_roundtrip():
    rng = np.random.default_rng(3)
    n = 256
    covered = rng.random(n) < 0.3
    vals = rng.integers(0, 100, size=n).astype(np.int32)
    mat = rng.integers(0, 9, size=(n, 5)).astype(np.int32)
    fields = {
        "covered": jnp.asarray(covered),
        "v": jnp.asarray(vals),
        "m": jnp.asarray(mat),
    }
    cap = int(covered.sum()) + 4
    n_emit, out = jax.jit(
        lambda f: compact_emitted(f, cap)
    )(fields)
    n_emit = int(n_emit)
    assert n_emit == covered.sum()
    idx = np.nonzero(covered)[0]
    np.testing.assert_array_equal(np.asarray(out["pos"])[:n_emit], idx)
    np.testing.assert_array_equal(
        np.asarray(out["v"])[:n_emit], vals[idx]
    )
    np.testing.assert_array_equal(
        np.asarray(out["m"])[:n_emit], mat[idx]
    )
    # overflow: cap smaller than emitted count is detectable
    n_over, _ = compact_emitted(fields, max(n_emit - 2, 1))
    assert int(n_over) == n_emit  # caller sees n_emit > cap


def test_dd_jit_preserves_error_free_transforms():
    """Plain jit on XLA:CPU contracts mul+add chains inside fused loops
    and degrades composite dd ops to f32 accuracy; dd_jit must keep the
    jitted result bit-identical to the eager (per-op) execution."""
    import math

    rng = np.random.default_rng(5)
    xh = jnp.asarray(rng.uniform(-100, 0, 4096).astype(np.float32))
    xl = jnp.asarray(
        (rng.uniform(-1, 1, 4096) * 3e-8 * np.abs(np.asarray(xh)))
        .astype(np.float32)
    )
    c = 1.0 / math.log(10.0)
    yh = jnp.full_like(xh, np.float32(c))
    yl = jnp.full_like(
        xh, np.float32(np.float64(c) - np.float64(np.float32(c)))
    )

    def f(a, b, u, v):
        return dd.mul((a, b), (u, v))

    eager = f(xh, xl, yh, yl)
    jitted = dd.dd_jit(f)(xh, xl, yh, yl)
    np.testing.assert_array_equal(np.asarray(eager[0]), np.asarray(jitted[0]))
    np.testing.assert_array_equal(np.asarray(eager[1]), np.asarray(jitted[1]))


def test_fused_emit_chunk_end_to_end():
    """Read batch -> pileup -> model -> emit fields -> compaction in one
    compiled program; non-risky compacted rows must be bit-identical to
    the host path run on the same (device-built) pileup accumulators."""
    from bs_call_tpu.ops.genotype import ModelParams
    from bs_call_tpu.ops.kernels.emit_device import fused_emit_chunk
    from bs_call_tpu.ops.kernels.pileup_device import device_pileup

    rng = np.random.default_rng(21)
    n_pos, R, L = 256, 64, 32
    rd = np.zeros((R, L), np.uint8)
    for i in range(R):
        ln = rng.integers(10, L + 1)
        base = rng.integers(0, 4, size=ln).astype(np.uint8)
        qual = rng.integers(5, 44, size=ln).astype(np.uint8)
        rd[i, :ln] = base | (qual << 2)
    starts = rng.integers(0, n_pos - L, size=R).astype(np.int32)
    ori = rng.integers(0, 2, size=R).astype(np.int32)
    strand = rng.integers(0, 3, size=R).astype(np.int32)
    mapq = rng.integers(10, 61, size=R).astype(np.int32)
    ref = rng.integers(0, 5, size=n_pos).astype(np.int32)
    params = ModelParams()

    cap = n_pos
    n_emit, out = fused_emit_chunk(
        jnp.asarray(rd), jnp.asarray(starts), jnp.asarray(ori),
        jnp.asarray(strand), jnp.asarray(mapq), jnp.asarray(ref),
        n_pos=n_pos, min_qual=13, params=params, cap=cap,
    )
    n_emit = int(n_emit)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert 0 < n_emit <= cap

    # host path on the device-built accumulators
    c2, qs, m2 = (np.asarray(a) for a in device_pileup(
        jnp.asarray(rd), jnp.asarray(starts), jnp.asarray(ori),
        jnp.asarray(strand), jnp.asarray(mapq), n_pos, 13,
    ))
    (hi, lo), agg, mx_h, prep = _host_prep(c2, qs, m2, ref, params)
    covered = agg["n"] > 0
    np.testing.assert_array_equal(
        out["pos"][:n_emit], np.nonzero(covered)[0]
    )
    sel = out["pos"][:n_emit]
    ok = ~out["risk"][:n_emit]
    (phred, dp1, qd, fs_int, flt, mac1, gl_vals, gl_len, cg_code,
     cond_cg, het) = prep
    np.testing.assert_array_equal(out["phred"][:n_emit][ok],
                                  phred[sel][ok])
    np.testing.assert_array_equal(out["fs_int"][:n_emit][ok],
                                  fs_int[sel][ok])
    np.testing.assert_array_equal(out["flt"][:n_emit][ok], flt[sel][ok])
    np.testing.assert_array_equal(out["gl_vals"][:n_emit][ok],
                                  gl_vals[sel][ok])
    np.testing.assert_array_equal(out["cg_code"][:n_emit][ok],
                                  cg_code[sel][ok])
    np.testing.assert_array_equal(out["mq"][:n_emit][ok],
                                  agg["mq"][sel][ok])
    np.testing.assert_array_equal(out["max_gt"][:n_emit][ok],
                                  mx_h[sel][ok])


def test_het_cap_overflow_flags_excess():
    """With a tiny het buffer, rows beyond the cap must be risk-flagged
    (host Fisher rescue) and rows inside it still match bit-exactly."""
    from bs_call_tpu.ops.genotype import ModelParams

    rng = np.random.default_rng(33)
    n = 512
    params = ModelParams()
    counts2, qual_sum, mapq2_sum, ref = _random_pileup(rng, n)
    (hi, lo), agg, mx_h, prep = _host_prep(
        counts2, qual_sum, mapq2_sum, ref, params
    )
    fs_int = prep[3]
    full = emit_fields_jit(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts2),
        jnp.asarray(qual_sum), jnp.asarray(mapq2_sum), jnp.asarray(ref),
    )
    capped = emit_fields_jit(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts2),
        jnp.asarray(qual_sum), jnp.asarray(mapq2_sum), jnp.asarray(ref),
        het_cap=64,
    )
    het = np.asarray(full["het"])
    risk_c = np.asarray(capped["risk"])
    # het rows past the 64th must all be flagged under the small cap
    order = np.cumsum(het) - 1
    overflow = het & (order >= 64)
    assert overflow.any()
    assert risk_c[overflow].all()
    ok = ~risk_c
    np.testing.assert_array_equal(
        np.asarray(capped["fs_int"])[ok], fs_int[ok]
    )


def test_sharded_emit_fields_bitwise_equal():
    """The mesh variant (ppermute halo for CG context) must reproduce
    the single-device kernel BIT-FOR-BIT: interior slab borders get
    their true neighbours via the halo, so even the risk bits match
    (only global chunk edges stay flagged)."""
    from jax.sharding import Mesh

    from bs_call_tpu.ops.genotype import ModelParams
    from bs_call_tpu.ops.kernels.emit_device import sharded_emit_fields

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    mesh = Mesh(np.array(devs[:4]), ("pos",))

    rng = np.random.default_rng(17)
    n = 512
    params = ModelParams()
    counts2, qual_sum, mapq2_sum, ref = _random_pileup(rng, n)
    (hi, lo), agg, mx_h, prep = _host_prep(
        counts2, qual_sum, mapq2_sum, ref, params
    )
    args = (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts2),
            jnp.asarray(qual_sum), jnp.asarray(mapq2_sum),
            jnp.asarray(ref))
    single = emit_fields_jit(*args)
    sharded = sharded_emit_fields(mesh)(*args)
    for k in single:
        np.testing.assert_array_equal(
            np.asarray(single[k]), np.asarray(sharded[k]),
            err_msg=f"field {k} differs between mesh and single device",
        )
    # sanity: interior borders are unflagged, global edges flagged
    risk = np.asarray(sharded["risk"])
    assert risk[0] and risk[-1]
