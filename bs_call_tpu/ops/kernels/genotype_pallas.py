"""Pallas TPU kernel for the 10-genotype bisulfite likelihood model.

Same math as ops/genotype.py, expressed as a tiled TPU kernel:
  - per-quality table terms (k, ln k, ln(.5+k), ln(1+k)) are fetched with
    one-hot matmuls against a [44, 4] table — a gather rephrased for the
    MXU instead of relying on vector-gather lowering;
  - the per-category/per-genotype coefficient assembly is pure VPU
    elementwise code over [TILE, 10] blocks;
  - outputs: ll [N, 10] float32 (callers compute argmax/margins/posteriors
    with ordinary XLA ops, which fuse into the surrounding program).

The kernel is validated against the jnp implementation in tests (interpret
mode on CPU, compiled on TPU).

Measured on TPU v5e: this kernel reaches ~1.1B positions/s, while the
fused XLA lowering of ops/genotype.py reaches ~22B positions/s — the
8 one-hot [256,44]x[44,4] matmuls per tile underutilize the MXU and the
elementwise chain is exactly what XLA fuses well on its own. The jnp
implementation is therefore the production path; this kernel is kept as
the hand-written reference point for future tile-level fusion work (e.g.
folding the pileup scatter and the aggregation into the same kernel,
where Pallas buys control XLA cannot express).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bs_call_tpu.constants import MAX_QUAL
from bs_call_tpu.ops.genotype import ModelParams
from bs_call_tpu.ops.tables import NONINF_SEL, qual_tables, ref_prior_matrix

TILE = 256
NQ = MAX_QUAL + 1  # 44


def _tables_f32():
    qt = qual_tables(np.float32)
    # [NQ, 4]: k, ln_k, ln_k_half, ln_k_one
    return np.stack([qt.k, qt.ln_k, qt.ln_k_half, qt.ln_k_one], axis=1)


def _kernel(counts_ref, quals_ref, prior_ref, tab_ref, consts_ref, ll_ref):
    """counts [TILE, 8] f32; quals [TILE, 8] i32; prior [TILE, 10] f32
    (prior already gathered per-position on the host side of the jit);
    tab [NQ, 4] f32; consts [1, 2] f32 = (l, t)."""
    counts = counts_ref[:]
    quals = quals_ref[:]
    tab = tab_ref[:]

    # one-hot gather via MXU, one [TILE, NQ] @ [NQ, 4] matmul per quality
    # column (a cross-lane reshape of the whole [TILE, 8] block is not
    # supported by Mosaic)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, NQ), 1)
    kc, lnkc, lnkhc, lnk1c = [], [], [], []
    for i in range(8):
        onehot = (iota == quals[:, i : i + 1]).astype(jnp.float32)
        terms = jnp.dot(onehot, tab, preferred_element_type=jnp.float32)
        kc.append(terms[:, 0])
        lnkc.append(terms[:, 1])
        lnkhc.append(terms[:, 2])
        lnk1c.append(terms[:, 3])
    k = jnp.stack(kc, axis=-1)
    lnk = jnp.stack(lnkc, axis=-1)
    lnkh = jnp.stack(lnkhc, axis=-1)
    lnk1 = jnp.stack(lnk1c, axis=-1)

    l = consts_ref[0, 0]
    t = consts_ref[0, 1]
    n = counts

    ll = prior_ref[:]

    # non-informative categories: selector codes baked in as constants
    for i in range(4):
        sel = NONINF_SEL[i]
        cols = []
        for g in range(10):
            if sel[g] == 2:
                cols.append(lnk1[:, i])
            elif sel[g] == 1:
                cols.append(lnkh[:, i])
            else:
                cols.append(lnk[:, i])
        coef = jnp.stack(cols, axis=-1)
        ll = ll + jnp.where(n[:, i : i + 1] > 0, n[:, i : i + 1] * coef, 0.0)

    lpt = l + t
    lmt = l - t

    def get_z(x1, x2, k1, k2):
        d = (x1 + x2) * lmt
        d = jnp.where(d == 0, 1.0, d)
        zs = []
        for a1, a2 in (
            (lpt + 2.0 * k2, 2.0 - lpt + 2.0 * k1),
            (2.0 + lpt + 4.0 * k2, 2.0 - lpt + 4.0 * k1),
            (lpt + 4.0 * k2, 2.0 - lpt + 4.0 * k1),
        ):
            sinm = jnp.clip((x1 * a1 - x2 * a2) / d, -1.0, 1.0)
            zs.append(0.5 * (lmt * sinm + 2.0 - lpt))
        return zs

    Z0, Z1, Z2 = get_z(n[:, 5], n[:, 7], k[:, 5], k[:, 7])
    Z3, Z4, Z5 = get_z(n[:, 6], n[:, 4], k[:, 6], k[:, 4])

    tiny = jnp.float32(1e-38)

    def lg(x):
        return jnp.log(jnp.maximum(x, tiny))

    def add_cat(ll, ni, cols):
        coef = jnp.stack(cols, axis=-1)
        return ll + jnp.where(ni[:, None] > 0, ni[:, None] * coef, 0.0)

    k4, k5, k6, k7 = k[:, 4], k[:, 5], k[:, 6], k[:, 7]
    t58 = lg(0.5 * (1.0 - Z5) + k4)
    ll = add_cat(ll, n[:, 4], [
        lnk1[:, 4], lnkh[:, 4], lg(1.0 - 0.5 * Z4 + k4), lnkh[:, 4],
        lnk[:, 4], t58, lnk[:, 4], lg(1.0 - Z3 + k4), t58, lnk[:, 4],
    ])
    t15 = lg(0.5 * Z2 + k5)
    ll = add_cat(ll, n[:, 5], [
        lnk[:, 5], t15, lnk[:, 5], lnk[:, 5], lg(Z0 + k5), t15,
        lg(0.5 * Z1 + k5), lnk[:, 5], lnk[:, 5], lnk[:, 5],
    ])
    t58b = lg(0.5 * Z5 + k6)
    ll = add_cat(ll, n[:, 6], [
        lnk[:, 6], lnk[:, 6], lg(0.5 * Z4 + k6), lnk[:, 6], lnk[:, 6],
        t58b, lnk[:, 6], lg(Z3 + k6), t58b, lnk[:, 6],
    ])
    t15b = lg(0.5 * (1.0 - Z2) + k7)
    ll = add_cat(ll, n[:, 7], [
        lnk[:, 7], t15b, lnk[:, 7], lnkh[:, 7], lg(1.0 - Z0 + k7), t15b,
        lg(1.0 - 0.5 * Z1 + k7), lnk[:, 7], lnkh[:, 7], lnk1[:, 7],
    ])
    ll_ref[:] = ll


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def genotype_ll_pallas(counts, quals, ref, params: ModelParams,
                       interpret: bool = False):
    """ll [N, 10] float32 via the Pallas kernel. N must be a multiple of
    TILE (callers pad)."""
    n = counts.shape[0]
    assert n % TILE == 0, n
    tab = jnp.asarray(_tables_f32())
    prior_tab = jnp.asarray(ref_prior_matrix(params.ref_bias, np.float32))
    prior = prior_tab[ref]  # [N, 10] gather outside the kernel
    consts = jnp.array(
        [[1.0 - params.under_conv, params.over_conv]], dtype=jnp.float32
    )
    grid = (n // TILE,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, 10), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 10), lambda i: (i, 0)),
            pl.BlockSpec((NQ, 4), lambda i: (0, 0)),
            pl.BlockSpec((1, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, 10), lambda i: (i, 0)),
        interpret=interpret,
    )(
        counts.astype(jnp.float32),
        quals.astype(jnp.int32),
        prior,
        tab,
        consts,
    )


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def call_genotypes_pallas(counts, quals, ref, params: ModelParams,
                          interpret: bool = False):
    """Same outputs as ops.genotype.call_genotypes (f32): gt_prob, max_gt,
    margin, off_sum."""
    from bs_call_tpu.constants import LOG10

    ll = genotype_ll_pallas(counts, quals, ref, params, interpret)
    mx = jnp.argmax(ll, axis=-1).astype(jnp.int32)
    mval = jnp.max(ll, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(mx, 10, dtype=bool)
    masked = jnp.where(onehot, -jnp.inf, ll)
    margin = mval[:, 0] - jnp.max(masked, axis=-1)
    off_sum = jnp.sum(jnp.where(onehot, 0, jnp.exp(ll - mval)), axis=-1)
    s = jnp.log1p(off_sum)
    gt_prob = (ll - mval - s[:, None]) / LOG10
    return gt_prob, mx, margin, off_sum
