"""Genotype model in double-float32 on the device.

Computes the 10-genotype log-likelihoods in df32 (ops/ddmath.py) so that
float64-grade precision — required for the printed GL/GQ fields — runs on
TPUs without native f64. The device returns the (hi, lo) planes; the tiny
[N,10] normalization (argmax, C-style 1+off absorption) finishes in f64 on
the host, identical to the other engines.

Residual error vs float64 is ~1e-11 absolute in ll units (validated in
tests), far below the 1e-9 tie-rescue threshold of the engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bs_call_tpu.constants import LOG10
from bs_call_tpu.ops import ddmath as dd
from bs_call_tpu.ops.genotype import ModelParams
from bs_call_tpu.ops.tables import NONINF_SEL, ref_prior_matrix
from bs_call_tpu.constants import MAX_QUAL


def _dd_tables():
    """Quality tables as (hi, lo) f32 pairs computed from float64."""
    q = np.arange(MAX_QUAL + 1, dtype=np.float64)
    e = np.minimum(np.exp(-0.1 * q * LOG10), 0.5)
    k = e / (3.0 - 4.0 * e)
    vals = {
        "k": k,
        "ln_k": np.log(k),
        "ln_k_half": np.log(0.5 + k),
        "ln_k_one": np.log(1.0 + k),
    }
    out = {}
    for name, v in vals.items():
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        out[name] = (hi, lo)
    return out


_TABLES = _dd_tables()


def _prior_dd(ref_bias):
    p = ref_prior_matrix(ref_bias, np.float64)
    hi = p.astype(np.float32)
    lo = (p - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _gather(tab, quals):
    hi = jnp.asarray(tab[0])[quals]
    lo = jnp.asarray(tab[1])[quals]
    return (hi, lo)


def _get_z_dd(x1, x2, k1, k2, l: float, t: float):
    lpt = l + t
    lmt = l - t
    lmt_c = dd.const(lmt)  # not representable in f32; keep the dd tail
    d = dd.mul(dd.add(x1, x2), lmt_c)
    d = (jnp.where(d[0] == 0, 1.0, d[0]), jnp.where(d[0] == 0, 0.0, d[1]))
    zs = []
    # coefficients: (a1 = c1 + m1*k2, a2 = c2 + m2*k1)
    specs = [
        (lpt, 2.0, 2.0 - lpt, 2.0),
        (2.0 + lpt, 4.0, 2.0 - lpt, 4.0),
        (lpt, 4.0, 2.0 - lpt, 4.0),
    ]
    for c1, m1, c2, m2 in specs:
        a1 = dd.add(dd.const(c1), dd.mul_f32(k2, np.float32(m1)))
        a2 = dd.add(dd.const(c2), dd.mul_f32(k1, np.float32(m2)))
        num = dd.sub(dd.mul(x1, a1), dd.mul(x2, a2))
        sinm = dd.div(num, d)
        # clamp to [-1, 1] exactly
        clamp_hi = sinm[0] > 1.0
        clamp_lo = sinm[0] < -1.0
        shi = jnp.where(clamp_hi, 1.0, jnp.where(clamp_lo, -1.0, sinm[0]))
        slo = jnp.where(clamp_hi | clamp_lo, 0.0, sinm[1])
        z = dd.add(
            dd.mul((shi, slo), lmt_c),
            dd.const(2.0 - lpt),
        )
        zs.append(dd.mul_f32(z, np.float32(0.5)))
    return zs


@functools.partial(jax.jit, static_argnames=("params",))
def genotype_ll_dd(counts, quals, ref, params: ModelParams):
    """ll planes (hi [N,10] f32, lo [N,10] f32)."""
    n32 = counts.astype(jnp.float32)
    quals = quals.astype(jnp.int32)
    k = _gather(_TABLES["k"], quals)
    lnk = _gather(_TABLES["ln_k"], quals)
    lnkh = _gather(_TABLES["ln_k_half"], quals)
    lnk1 = _gather(_TABLES["ln_k_one"], quals)
    phi, plo = _prior_dd(params.ref_bias)
    ll = (jnp.asarray(phi)[ref], jnp.asarray(plo)[ref])

    def col(tab, i):
        return (tab[0][:, i], tab[1][:, i])

    def acc(ll, ni, cols):
        """ll += ni * coef per genotype (ni == 0 contributes 0)."""
        hi = jnp.stack([c[0] for c in cols], axis=-1)
        lo = jnp.stack([c[1] for c in cols], axis=-1)
        term = dd.mul_f32((hi, lo), ni[:, None])
        zero = ni[:, None] <= 0
        term = (
            jnp.where(zero, 0.0, term[0]),
            jnp.where(zero, 0.0, term[1]),
        )
        return dd.add(ll, term)

    for i in range(4):
        sel = NONINF_SEL[i]
        cols = []
        for g in range(10):
            src = lnk1 if sel[g] == 2 else (lnkh if sel[g] == 1 else lnk)
            cols.append(col(src, i))
        ll = acc(ll, n32[:, i], cols)

    l = 1.0 - params.under_conv
    t = params.over_conv
    n5 = (n32[:, 5], jnp.zeros_like(n32[:, 5]))
    n7 = (n32[:, 7], jnp.zeros_like(n32[:, 7]))
    n6 = (n32[:, 6], jnp.zeros_like(n32[:, 6]))
    n4 = (n32[:, 4], jnp.zeros_like(n32[:, 4]))
    Z0, Z1, Z2 = _get_z_dd(n5, n7, col(k, 5), col(k, 7), l, t)
    Z3, Z4, Z5 = _get_z_dd(n6, n4, col(k, 6), col(k, 4), l, t)

    one = dd.const(1.0)

    def lg(x):
        xhi = jnp.maximum(x[0], 1e-38)
        return dd.log((xhi, jnp.where(x[0] > 0, x[1], 0.0)))

    def half(x):
        return dd.mul_f32(x, np.float32(0.5))

    k4, k5, k6, k7 = col(k, 4), col(k, 5), col(k, 6), col(k, 7)
    # category 4 (A informative)
    t58 = lg(dd.add(half(dd.sub(one, Z5)), k4))
    ll = acc(ll, n32[:, 4], [
        col(lnk1, 4), col(lnkh, 4),
        lg(dd.add(dd.sub(one, half(Z4)), k4)), col(lnkh, 4),
        col(lnk, 4), t58, col(lnk, 4),
        lg(dd.add(dd.sub(one, Z3), k4)), t58, col(lnk, 4),
    ])
    # category 5 (C informative)
    t15 = lg(dd.add(half(Z2), k5))
    ll = acc(ll, n32[:, 5], [
        col(lnk, 5), t15, col(lnk, 5), col(lnk, 5),
        lg(dd.add(Z0, k5)), t15, lg(dd.add(half(Z1), k5)),
        col(lnk, 5), col(lnk, 5), col(lnk, 5),
    ])
    # category 6 (G informative)
    t58b = lg(dd.add(half(Z5), k6))
    ll = acc(ll, n32[:, 6], [
        col(lnk, 6), col(lnk, 6), lg(dd.add(half(Z4), k6)),
        col(lnk, 6), col(lnk, 6), t58b, col(lnk, 6),
        lg(dd.add(Z3, k6)), t58b, col(lnk, 6),
    ])
    # category 7 (T informative)
    t15b = lg(dd.add(half(dd.sub(one, Z2)), k7))
    ll = acc(ll, n32[:, 7], [
        col(lnk, 7), t15b, col(lnk, 7), col(lnkh, 7),
        lg(dd.add(dd.sub(one, Z0), k7)), t15b,
        lg(dd.add(dd.sub(one, half(Z1)), k7)),
        col(lnk, 7), col(lnkh, 7), col(lnk1, 7),
    ])
    return ll


def call_genotypes_dd(counts, quals, ref, params: ModelParams):
    """Same output contract as call_genotypes_np, with the heavy ll math
    on the device in df32 and the [N,10] finish in host float64."""
    hi, lo = genotype_ll_dd(
        jnp.asarray(counts), jnp.asarray(quals), jnp.asarray(ref), params
    )
    return dd_finish(hi, lo)


def dd_finish(hi, lo):
    """Host float64 finish of the df32 ll planes: argmax, margin, off-max
    exponent sum, C-style log10 posteriors (genotype_model.c:231-245)."""
    ll = np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)
    mx = np.argmax(ll, axis=-1).astype(np.int32)
    mval = ll[np.arange(len(ll)), mx][:, None]
    onehot = np.zeros_like(ll, dtype=bool)
    onehot[np.arange(len(ll)), mx] = True
    masked = np.where(onehot, -np.inf, ll)
    margin = mval[:, 0] - masked.max(axis=-1)
    off_sum = np.where(onehot, 0.0, np.exp(ll - mval)).sum(axis=-1)
    gt_prob = (ll - mval - np.log1p(off_sum)[:, None]) / LOG10
    return gt_prob, mx, margin, off_sum
