"""df32 (double-float32) arithmetic and genotype model parity vs float64.

These tests also guard against compiler rewrites of the error-free
transforms: if a backend change breaks the optimization barriers, the
precision assertions fail."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bs_call_tpu.ops import ddmath as dd
from bs_call_tpu.ops.genotype import ModelParams
from bs_call_tpu.ops.genotype_dd import call_genotypes_dd, genotype_ll_dd
from bs_call_tpu.ops.genotype_np import call_genotypes_np, genotype_ll_np


def _dd_from_f64(v):
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(hi), jnp.asarray(lo))


def test_primitives():
    rng = np.random.default_rng(0)
    a64 = rng.uniform(-50, 50, 5000)
    b64 = rng.uniform(0.5, 3, 5000)
    a = _dd_from_f64(a64)
    b = _dd_from_f64(b64)
    np.testing.assert_allclose(
        dd.to_f64(dd.add(a, b)), a64 + b64, rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        dd.to_f64(dd.mul(a, b)), a64 * b64, rtol=1e-13, atol=1e-13
    )
    np.testing.assert_allclose(
        dd.to_f64(dd.div(a, b)), a64 / b64, rtol=1e-13, atol=1e-13
    )


def test_exp_log_jit():
    rng = np.random.default_rng(1)
    x64 = rng.uniform(-40, 40, 5000)
    x = _dd_from_f64(x64)
    x64 = dd.to_f64(x)
    e = jax.jit(dd.exp)(x)
    np.testing.assert_allclose(
        dd.to_f64(e), np.exp(x64), rtol=1e-10, atol=0
    )
    y64 = rng.uniform(1e-5, 10, 5000)
    y = _dd_from_f64(y64)
    y64 = dd.to_f64(y)
    l = jax.jit(dd.log)(y)
    np.testing.assert_allclose(
        dd.to_f64(l), np.log(y64), rtol=0, atol=1e-10
    )


def test_genotype_dd_matches_f64():
    rng = np.random.default_rng(2)
    n = 4096
    counts = rng.integers(0, 40, size=(n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < 0.45] = 0
    quals = np.where(
        counts > 0, rng.integers(1, 44, size=(n, 8)), 0
    ).astype(np.int32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    P = ModelParams()
    hi, lo = genotype_ll_dd(
        jnp.asarray(counts), jnp.asarray(quals), jnp.asarray(ref), P
    )
    ll_dd = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    ll_np = genotype_ll_np(counts, quals, ref, 0.01, 0.05, 2.0)
    assert np.abs(ll_dd - ll_np).max() < 1e-9

    gp_d, mx_d, mg_d, off_d = call_genotypes_dd(counts, quals, ref, P)
    gp_n, mx_n, mg_n, off_n = call_genotypes_np(
        counts, quals, ref, 0.01, 0.05, 2.0
    )
    ties = np.minimum(mg_d, mg_n) < 1e-9
    np.testing.assert_array_equal(mx_d[~ties], mx_n[~ties])
    assert np.abs(gp_d - gp_n).max() < 1e-8


@pytest.mark.slow
def test_engine_dd_device_mode(tmp_path):
    """device='tpu' exact mode routes through the dd kernel and matches
    the f64 engine end-to-end."""
    import io

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bam import BamHeader, BamWriter
    from bs_call_tpu.pipeline.runner import run_caller

    rng = np.random.default_rng(3)
    ctg_len = 2000
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
    starts = np.sort(rng.integers(0, ctg_len - 80, 400))
    for k, pos in enumerate(starts):
        pos = int(pos)
        rlen = 60
        rseq = list(seq[pos : pos + rlen])
        for i in np.nonzero(rng.random(rlen) < 0.05)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, rlen).astype(np.uint8)
        w.write(
            f"r{k}", 0, 0, pos, 50, [(rlen, 0)], -1, -1, 0,
            "".join(rseq), q,
        )
    w.close()
    outs = []
    for device in ("auto", "tpu"):
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, device=device,
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
