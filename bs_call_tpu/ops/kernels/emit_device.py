"""Device-side emit post-processing for the fused tier (SURVEY §7.4).

Everything between the genotype likelihood planes and the text formatter
runs ON DEVICE in one compiled program: the df32 finish (argmax /
margin / off-sum / C-style log10 posteriors), the Fisher strand test,
the GQ/QD/MQ quantizations, the q20/qd2/fs60/mq40/mac1 filter bits, the
GL compaction, the CG-status automaton (elementwise over ±1-neighbour
genotype codes — the sharded variant exchanges a 1-position halo), and
emitted-site compaction, so D2H shrinks from per-position tensors to
compacted per-emitted-row records. Reference semantics:
print_vcf.c:140-266 (phred/filters/CG), print_vcf.c:318-347 (GL),
call_genotypes.c:62-108 + stats_utils.c:25-91 (Fisher),
call_genotypes.c:45-59 (aggregation).

Exactness contract (same design as every other accelerator tier): all
integer quantizations are computed in df32 and each row carries a RISK
bit — set whenever a quantized value sits within a guard band of its
rounding boundary, the Fisher walk exceeds the device iteration bound,
or the row needs cross-chunk CG context (first/last row). Risky rows
are recomputed by the host emit-prep (bsc_emit.cpp); non-risky rows are
bit-identical to it (tests/test_emit_device.py), so output bytes never
depend on which tier ran.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from bs_call_tpu.constants import GT_HET
from bs_call_tpu.ops import ddmath as dd
from bs_call_tpu.ops.postprocess import (
    _FTAB_MASK_A,
    _FTAB_MASK_B,
    MAC_MASK_A as _MAC_A,
    MAC_MASK_B as _MAC_B,
    MAC_VALID as _MAC_VALID,
)

F32 = jnp.float32

_FISHER_IMAX = 512  # device tail-walk bound; longer walks -> host rescue
_LFACT_N = 1 << 14  # lfact table size; deeper tables -> host rescue


@functools.lru_cache(maxsize=1)
def _lfact_split():
    """lfact[0..N) as an (hi, lo) float32 split of the float64 table —
    the df32 twin of the reference's log-factorial table
    (stats_utils.c lfact_store)."""
    lf = np.zeros(_LFACT_N, dtype=np.float64)
    lf[1:] = np.cumsum(np.log(np.arange(1, _LFACT_N, dtype=np.float64)))
    hi = lf.astype(np.float32)
    lo = (lf - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _lf(idx, tab):
    """df32 lfact gather; idx is clamped (the caller flags overflow)."""
    hi, lo = tab
    idx = jnp.clip(idx, 0, _LFACT_N - 1)
    return (jnp.asarray(hi)[idx], jnp.asarray(lo)[idx])


def _dd_y(x):
    """Collapse a df32 pair to one float32 value."""
    return x[0] + x[1]


def _near_int_boundary(y, eps=F32(1e-3)):
    """True where floor/trunc of y could flip under a tiny perturbation."""
    f = y - jnp.floor(y)
    return (f < eps) | (f > F32(1.0) - eps)


def _dd_sqrt(x):
    """df32 sqrt: f32 seed + one dd Newton step s <- (s + x/s)/2."""
    s0 = jnp.sqrt(jnp.maximum(x[0], F32(0)))
    s = dd.from_f32(s0)
    safe = dd.add_f32(s, jnp.where(s0 > 0, F32(0), F32(1)))
    s = dd.mul_f32(dd.add(safe, dd.div(x, safe)), F32(0.5))
    return (jnp.where(s0 > 0, s[0], F32(0)),
            jnp.where(s0 > 0, s[1], F32(0)))


def _fisher_dd(ftab, lftab):
    """Two-sided Fisher exact test of [n,4] tables in df32, transcribing
    the reference's two-tail mirror walk (stats_utils.c:25-91;
    ops/oracle.py fisher) with exp-per-term tails instead of the scalar
    multiplicative carry. Returns (log10_p (dd), overflow_flag)."""
    a, b, c, cc = (ftab[:, 0], ftab[:, 1], ftab[:, 2], ftab[:, 3])
    r0 = a + b
    r1 = c + cc
    c0 = a + c
    c1 = b + cc
    n = r0 + r1
    nz = n > 0
    # delta's SIGN and ceil(2|delta|) must be exact: delta = a - r0*c0/n
    # is a rational with denominator n, so integer arithmetic reproduces
    # the reference's f64 ceil bit-for-bit (f32 would round r0*c0 above
    # 2^24 and could shift the mirror start by a whole pmf term).
    # |num| <= n^2 < 2^28 fits int32.
    n1 = jnp.maximum(n, 1)
    num = a * n - r0 * c0
    pos = num > 0
    knst = dd.add(
        dd.add(_lf(c0, lftab), _lf(c1, lftab)),
        dd.sub(dd.add(_lf(r0, lftab), _lf(r1, lftab)), _lf(n, lftab)),
    )

    def pmf(aa, bb, ccv, dd_):
        t = dd.add(
            dd.add(_lf(aa, lftab), _lf(bb, lftab)),
            dd.add(_lf(ccv, lftab), _lf(dd_, lftab)),
        )
        return dd.exp(dd.sub(knst, t))

    def tail(aa, bb, ccv, dd_, steps):
        """sum_{i=0..steps} pmf of the table walked i steps in the
        aa+=1/dd_+=1 (bb-=1/ccv-=1) direction, starting at i=1 — the
        i=0 term is added by the caller."""
        i = jnp.arange(1, _FISHER_IMAX + 1, dtype=jnp.int32)[:, None]
        live = i <= steps[None, :]
        terms = pmf(
            aa[None, :] + i, jnp.maximum(bb[None, :] - i, 0),
            jnp.maximum(ccv[None, :] - i, 0), dd_[None, :] + i,
        )
        th = jnp.where(live, terms[0], F32(0))
        tl = jnp.where(live, terms[1], F32(0))
        # dd-accumulate down the walk axis (sequential semantics via
        # associative add is fine: each term is non-negative and the
        # guard band absorbs ulp-order reassociation differences)
        acc = (jnp.zeros_like(aa, F32), jnp.zeros_like(aa, F32))
        hi_t, lo_t = th, tl

        def body(k, acc):
            return dd.add(acc, (hi_t[k], lo_t[k]))

        acc = jax.lax.fori_loop(0, _FISHER_IMAX, body, acc)
        return acc

    p = pmf(a, b, c, cc)
    # delta > 0: right tail from (a,b,c,d), mirror-left from k=ceil(2d)
    steps_r = jnp.where(pos, jnp.minimum(b, c), jnp.minimum(a, cc))
    # the walk direction differs per branch: express both as the
    # "increase a" walk by swapping operands for the delta>0 right tail
    # (which walks a UP via the b/c-decreasing recurrence)
    tail_r = tail(a, b, c, cc, jnp.where(pos, steps_r, -1))
    # delta <= 0 main tail walks a DOWN: equivalent to walking the
    # transposed table (b, a, d, c) UP
    tail_l = tail(b, a, cc, c, jnp.where(pos, -1, steps_r))
    p = dd.add(p, dd.add(tail_r, tail_l))
    two = 2 * num
    k = jnp.where(
        pos,
        (two + n1 - 1) // n1,
        jnp.maximum((-two + n1 - 1) // n1, 1),
    )
    mn2 = jnp.where(pos, jnp.minimum(a, cc), jnp.minimum(b, c))
    have2 = k <= mn2
    # mirrored start table
    a2 = jnp.where(pos, a - k, a + k)
    b2 = jnp.where(pos, b + k, b - k)
    c2 = jnp.where(pos, c + k, c - k)
    d2 = jnp.where(pos, cc - k, cc + k)
    a2c = jnp.maximum(a2, 0)
    b2c = jnp.maximum(b2, 0)
    c2c = jnp.maximum(c2, 0)
    d2c = jnp.maximum(d2, 0)
    p2 = pmf(a2c, b2c, c2c, d2c)
    steps2 = mn2 - k
    # second tail walks AWAY from the observed table: for delta>0 that
    # is a2 DOWN (transposed-up), for delta<=0 a2 UP
    t2_down = tail(b2c, a2c, d2c, c2c, jnp.where(pos & have2, steps2, -1))
    t2_up = tail(a2c, b2c, c2c, d2c,
                 jnp.where((~pos) & have2, steps2, -1))
    p_mirror = dd.add(p2, dd.add(t2_down, t2_up))
    zero = (jnp.zeros_like(p[0]), jnp.zeros_like(p[1]))
    p = dd.add(
        p,
        (jnp.where(have2, p_mirror[0], zero[0]),
         jnp.where(have2, p_mirror[1], zero[1])),
    )
    # clamp at 1e-20 (call_genotypes.c FS floor) and take log10
    lo_clamp = _dd_y(p) < F32(1e-20)
    p = (jnp.where(lo_clamp, F32(1e-20), p[0]),
         jnp.where(lo_clamp, F32(0), p[1]))
    log_p = dd.mul(dd.log(p), dd.const(1.0 / math.log(10.0)))
    log_p = (jnp.where(nz, log_p[0], F32(0)),
             jnp.where(nz, log_p[1], F32(0)))
    overflow = (steps_r > _FISHER_IMAX) | (
        have2 & (steps2 > _FISHER_IMAX)
    ) | (n >= _LFACT_N - _FISHER_IMAX - 2)
    return log_p, overflow


def _dd_log1p(off, lse_y):
    """df32 log1p(off) accurate to ~2^-48 RELATIVE even for tiny off.
    dd.log(1+off) loses off below the f32 ulp of 1.0, so small offs use
    the series off*(1 - off/2 + off^2/3 - off^3/4); lse_y = log(off)
    routes the branch without touching denormal territory."""
    small = lse_y < F32(-9.2)  # off < 1e-4
    poly = dd.add_f32(dd.mul_f32(off, F32(-0.25)), F32(1.0 / 3.0))
    poly = dd.add_f32(dd.mul(off, poly), F32(-0.5))
    poly = dd.add_f32(dd.mul(off, poly), F32(1.0))
    ser = dd.mul(off, poly)
    big = dd.log(dd.add_f32(off, F32(1.0)))
    return (jnp.where(small, ser[0], big[0]),
            jnp.where(small, ser[1], big[1]))


def _finish_dd(hi, lo):
    """Device df32 finish: argmax (first max wins, lexicographic on the
    (hi, lo) planes), runner-up margin, off-max exponent sum, the
    competitors' log-sum-exp (no-underflow form of off), and C-style
    log10 posteriors (genotype_model.c:231-245; the host twin is
    ops/genotype_dd.py dd_finish)."""
    mhi = jnp.max(hi, axis=-1, keepdims=True)
    top_hi = hi == mhi
    lo_m = jnp.where(top_hi, lo, -jnp.inf)
    mlo = jnp.max(lo_m, axis=-1, keepdims=True)
    winner = top_hi & (lo_m == mlo)
    mx = jnp.argmax(winner, axis=-1).astype(jnp.int32)
    mval = (mhi[:, 0], mlo[:, 0])
    d = dd.sub((hi, lo), (mval[0][:, None], mval[1][:, None]))
    onehot = jax.nn.one_hot(mx, 10, dtype=bool)
    dh = jnp.where(onehot, -jnp.inf, d[0])
    m2 = jnp.max(dh, axis=-1)  # runner-up (f32 shift is enough)
    margin = -m2
    # lse = m2 + log(sum exp(d - m2)) over the 9 competitors: off
    # without underflow — f32 exp alone dies below e^-87 while the host
    # f64 keeps going to e^-745 (and prints the difference in GL)
    s = (jnp.zeros_like(m2), jnp.zeros_like(m2))
    for g in range(10):
        dg = dd.add_f32((d[0][:, g], d[1][:, g]), -m2)
        eg = dd.exp(dg)
        keep = ~onehot[:, g]
        s = dd.add(s, (jnp.where(keep, eg[0], F32(0)),
                       jnp.where(keep, eg[1], F32(0))))
    lse = dd.add_f32(dd.log(s), m2)
    off = dd.exp(lse)  # f32-underflows below ~e^-87: callers route by lse
    l1p = _dd_log1p(off, _dd_y(lse))
    inv_l10 = dd.const(1.0 / math.log(10.0))
    gp = dd.mul(
        dd.sub(d, (l1p[0][:, None], l1p[1][:, None])),
        (jnp.full_like(d[0], inv_l10[0]),
         jnp.full_like(d[0], inv_l10[1])),
    )
    return gp, mx, margin, off, lse, l1p


def emit_fields_dd(hi, lo, counts2, qual_sum, mapq2_sum, ref_codes,
                   quirk: bool = True, het_cap: int | None = None,
                   prev_ctx=None, next_ctx=None):
    """Per-position emit fields on device. Inputs are the fused tier's
    ll planes + raw pileup accumulators; outputs mirror bsc_emit_prep
    column for column, plus covered/gt codes/risk. All [n]-shaped.

    prev_ctx / next_ctx: optional (known_bool, gt1_code) scalars giving
    the 1-based genotype codes just outside this chunk (a sharded
    caller's ppermute halo). Known edges compute the CG automaton
    exactly; unknown edges are risk-flagged for host rescue."""
    counts = counts2.sum(axis=1).astype(jnp.int32)
    n_all = counts.sum(axis=-1)
    covered = n_all > 0
    nn = counts.astype(F32)
    avg = qual_sum / jnp.where(counts > 0, nn, F32(1))
    quals = jnp.where(
        counts > 0, jnp.floor(F32(0.5) + avg), F32(0)
    ).astype(jnp.int32)
    gp, mx, margin, off, lse, l1p = _finish_dd(hi, lo)
    lse_y = _dd_y(lse)
    # MQ: f32 division, f64-grade sqrt (call_genotypes.c:57 quirk)
    nf = jnp.where(n_all > 0, n_all, 1).astype(F32)
    mq_dd = _dd_sqrt(dd.from_f32(mapq2_sum / nf))
    mq_y = _dd_y(mq_dd) + F32(0.5)
    mq = jnp.where(n_all > 0, mq_y.astype(jnp.int32), 0)
    risk = _near_int_boundary(mq_y) & (n_all > 0)
    # GQ phred (print_vcf.c:140-148): z1 = exp(gp_max*ln10) = 1/(1+off).
    # The host computes z1 in FLOAT64, so om = 1-z1 lands on the 2^-53
    # grid near 1: a tiny off rounds z1 to exactly 1.0 (phred 255)
    # and small om is quantized in whole grid units. The dd pipeline is
    # MORE precise than that, so we emulate the host grid wherever its
    # effect exceeds the guard band (om < ~2160*2^-53, phred > ~126) and
    # risk-flag half-grid rows where round-to-even could differ.
    ln10 = dd.const(math.log(10.0))
    one = dd.const(1.0)
    z1 = dd.exp(dd.neg(l1p))
    om = dd.sub((jnp.broadcast_to(one[0], off[0].shape),
                 jnp.broadcast_to(one[1], off[0].shape)), z1)
    m_dd = dd.mul_f32(l1p, F32(2.0**53))  # exact power-of-two scale
    m_y = _dd_y(m_dd)
    emulate = m_y < F32(2160.0)
    m_r = jnp.round(m_y)  # round-half-even, as f64 does
    half = jnp.abs(m_y - jnp.floor(m_y) - F32(0.5)) < F32(1e-3)
    om_q = m_r * F32(2.0**-53)
    om = (jnp.where(emulate, om_q, om[0]),
          jnp.where(emulate, F32(0), om[1]))
    sat = _dd_y(om) <= F32(0)
    om_safe = (jnp.where(sat, F32(1), om[0]), jnp.where(sat, F32(0), om[1]))
    ph_dd = dd.mul_f32(dd.div(dd.log(om_safe), ln10), F32(-10.0))
    ph_y = _dd_y(ph_dd)
    ph = jnp.where(sat | (ph_y > 255), 255, ph_y.astype(jnp.int32))
    risk |= (~sat) & (ph_y <= 255) & _near_int_boundary(ph_y)
    # half-grid: round-to-even here may not match the host's f64 exp
    # rounding (including the m 0<->1 flip between 255 and ~153)
    risk |= emulate & half
    dp1 = counts[:, :4].sum(axis=-1)
    qd = jnp.where(dp1 > 0, ph // jnp.maximum(dp1, 1), ph)
    # Fisher strand (het rows only)
    het_tab = jnp.asarray(GT_HET.astype(np.bool_))
    is_het = het_tab[mx] & covered
    ma = jnp.asarray(_FTAB_MASK_A.astype(np.int32))[mx]
    mb = jnp.asarray(_FTAB_MASK_B.astype(np.int32))[mx]
    f0 = (counts2[:, 0] * ma).sum(axis=-1)
    f1 = (counts2[:, 0] * mb).sum(axis=-1)
    f2 = (counts2[:, 1] * ma).sum(axis=-1)
    f3 = (counts2[:, 1] * mb).sum(axis=-1)
    if quirk:  # call_genotypes.c:98 counts[0][6] in the GT reverse row
        gt8 = mx == 8
        f2 = jnp.where(
            gt8,
            counts2[:, 1, 2] + counts2[:, 1, 4] + counts2[:, 0, 6],
            f2,
        )
    ftab = jnp.stack(
        [jnp.where(is_het, v, 0) for v in (f0, f1, f2, f3)], axis=-1
    )
    # Fisher only runs on het rows (call_genotypes.c:62: homozygous
    # sites get no test), and het sites are a few percent of a real
    # pileup — compact them into a small buffer so the 512-step walk
    # costs het_cap/n of the dense version; an overflowing het count
    # flags the excess rows for host rescue (the native batch Fisher is
    # cheap there anyway).
    n_rows = ftab.shape[0]
    if het_cap is None:
        het_cap = n_rows
    het_cap = max(min(het_cap, n_rows), 64)
    hseq = jnp.cumsum(is_het.astype(jnp.int32)) - 1
    hslot = jnp.where(is_het & (hseq < het_cap), hseq, het_cap)
    ftab_c = jnp.zeros((het_cap + 1, 4), ftab.dtype).at[hslot].set(ftab)
    fs_c, over_c = _fisher_dd(ftab_c[:-1], _lfact_split())
    gidx_h = jnp.clip(hseq, 0, het_cap - 1)
    use_fs = is_het & (hseq < het_cap)
    fs_dd = (jnp.where(use_fs, fs_c[0][gidx_h], F32(0)),
             jnp.where(use_fs, fs_c[1][gidx_h], F32(0)))
    fs_over = is_het & (over_c[gidx_h] | (hseq >= het_cap))
    fs_y = jnp.where(is_het, _dd_y(fs_dd), F32(0))
    fs_q = -fs_y * F32(10.0) + F32(0.5)
    fs_int = fs_q.astype(jnp.int32)
    risk |= is_het & (_near_int_boundary(fs_q) | fs_over)
    flt = (
        jnp.where(ph < 20, 1, 0)
        | jnp.where(qd < 2, 2, 0)
        | jnp.where(fs_int > 60, 4, 0)
        | jnp.where(mq < 40, 8, 0)
    )
    # mac1 (only when the hard filters pass)
    sa = (counts * jnp.asarray(_MAC_A)[mx]).sum(axis=-1)
    sb = (counts * jnp.asarray(_MAC_B)[mx]).sum(axis=-1)
    mac1 = (
        (flt == 0)
        & jnp.asarray(_MAC_VALID)[mx]
        & ((sa <= 1) | (sb <= 1))
    )
    # GL compaction (print_vcf.c:318-347): f32 cast of the dd log10
    # posteriors; flag casts whose dd `lo` sits near the f32 rounding
    # midpoint of `hi` (the only place a 1e-9-relative dd-vs-f64
    # difference can change the printed value)
    from bs_call_tpu.output.vector_site import _GL_IDX_C, _GL_LEN_C

    r = jnp.clip(ref_codes.astype(jnp.int32), 0, 4)
    gidx = jnp.asarray(_GL_IDX_C.reshape(50, 5))[mx * 5 + r]  # [n,5]
    gl_len = jnp.asarray(_GL_LEN_C.reshape(50))[mx * 5 + r]
    safe = jnp.maximum(gidx, 0)
    gph = jnp.take_along_axis(gp[0], safe, axis=-1)
    gpl = jnp.take_along_axis(gp[1], safe, axis=-1)
    # The WINNER slot is -log1p(off)/LOG10 ~ -off/ln10, which the host
    # carries in f64 all the way to the f32 cast. Small magnitudes kill
    # the gathered dd planes (their lo plane goes subnormal below
    # ~1e-30), so the value is rebuilt in log2 space where dd precision
    # is uniform: v = -2^y, y = (lse + ln1p(-off/2..) - ln(ln10))/ln2,
    # split into exact ldexp(frac, k). Regimes by lse:
    #   >= -18.4         gathered planes are full-precision
    #   (-86, -18.4)     log2 reconstruction (normal f32 results)
    #   (-104, -86]      host emits subnormal f32: device f32 exp is
    #                    blind / TPUs flush — risk-flag for host rescue
    #   <= -104          host f32 cast is exactly -0.0 (%g prints "-0")
    win_sub = (lse_y > F32(-104.0)) & (lse_y < F32(-86.0))
    lnln10 = dd.const(math.log(math.log(10.0)))
    inv_ln2 = dd.const(1.0 / math.log(2.0))
    corr = jnp.where(
        lse_y < F32(-18.0), -F32(0.5) * off[0], F32(0)
    )  # ln1p(-off/2): |off| <= 1e-8 here, error < 1e-16
    ylog = dd.mul(
        dd.add_f32(
            dd.sub(lse, (jnp.full_like(lse[0], lnln10[0]),
                         jnp.full_like(lse[0], lnln10[1]))),
            corr,
        ),
        (jnp.full_like(lse[0], inv_ln2[0]),
         jnp.full_like(lse[0], inv_ln2[1])),
    )
    kexp = jnp.floor(ylog[0] + ylog[1]).astype(jnp.int32)
    frac = dd.add_f32(ylog, -kexp.astype(F32))
    ln2c = dd.const(math.log(2.0))
    fr = dd.exp(dd.mul(frac, (jnp.full_like(lse[0], ln2c[0]),
                              jnp.full_like(lse[0], ln2c[1]))))
    fr_y = fr[0] + fr[1]
    vw_log2 = -jnp.ldexp(fr_y, kexp)
    # frac collapse near an f32 rounding midpoint -> host rescue
    win_edge = jnp.abs(fr[1]) > F32(0.49) * F32(1.19e-7) * fr_y
    recon = (lse_y >= F32(-86.0)) & (lse_y < F32(-18.4))
    vw = jnp.where(
        lse_y <= F32(-104.0), F32(-0.0),
        jnp.where(recon, vw_log2, F32(0)),
    )
    use_vw = recon | (lse_y <= F32(-104.0))
    # the gather CLAMPS gidx (-1 also lands on genotype 0), so a slot is
    # winner-valued whenever its clamped index hits mx
    is_win = safe == mx[:, None]
    v = jnp.where(is_win & use_vw[:, None], vw[:, None], gph + gpl)
    win_sub |= recon & win_edge
    clamped = v < F32(-99.999)
    gl_vals = jnp.where(
        (gidx == -2) | clamped, F32(-99.999), v
    )
    gl_risk = (
        (gidx != -2)
        & ~clamped
        & (jnp.abs(gpl) > F32(0.49) * F32(1.19e-7) * jnp.abs(gph))
    )
    # the clamp itself is a boundary: host clamps in f64 then casts
    gl_risk |= (gidx != -2) & (
        jnp.abs(v - F32(-99.999)) < F32(2e-4)
    )
    risk |= gl_risk.any(axis=-1)
    risk |= win_sub  # host-subnormal GL band: device f32 can't see it
    # genotype codes + CG automaton over within-chunk neighbours (halo
    # context, when the caller has it, fills the border slots)
    gt1 = jnp.where(covered, mx + 1, 0)
    if prev_ctx is None:
        prev_known, prev_gt = jnp.bool_(False), jnp.int32(0)
    else:
        prev_known, prev_gt = prev_ctx
    if next_ctx is None:
        next_known, next_gt = jnp.bool_(False), jnp.int32(0)
    else:
        next_known, next_gt = next_ctx
    g1 = jnp.concatenate(
        [jnp.where(prev_known, prev_gt, 0).astype(gt1.dtype)[None],
         gt1[:-1]]
    )
    g3 = jnp.concatenate(
        [gt1[1:],
         jnp.where(next_known, next_gt, 0).astype(gt1.dtype)[None]]
    )
    from bs_call_tpu.output.vector_site import _CFLAG_U8, _GFLAG_U8

    cflag = jnp.asarray(_CFLAG_U8.astype(np.bool_))
    gflag = jnp.asarray(_GFLAG_U8.astype(np.bool_))
    cg_code, cond_cg = _cg_codes(gt1, g1, g3, mx, cflag, gflag)
    # edges without halo context lack real neighbours: host recomputes
    edge = jnp.zeros_like(covered)
    edge = edge.at[0].set(~prev_known).at[-1].set(~next_known)
    risk |= edge
    risk |= margin < F32(1e-9)  # ll tie: oracle rescue regardless
    het = is_het  # (het_tab[mx] & covered, computed for Fisher above)
    # the [n,10] log10-posterior planes (gp) stay ON DEVICE: every
    # printed value derived from them (GL, phred, max_gt) is already a
    # field below, and risky rows rescue through the host engines from
    # host-side inputs — shipping gp would double the tier's D2H for
    # nothing (audited: no prep consumer reads them)
    return {
        "covered": covered,
        "max_gt": mx, "margin": margin, "counts": counts,
        "quals": quals, "mq": mq, "phred": ph, "dp1": dp1, "qd": qd,
        "fs_int": fs_int, "fs_hi": fs_dd[0], "fs_lo": fs_dd[1],
        "flt": flt, "mac1": mac1, "gl_vals": gl_vals, "gl_len": gl_len,
        "cg_code": cg_code, "cond_cg": cond_cg, "het": het,
        "gt1": gt1, "ref5": r, "risk": risk,
    }


# jitted twin of emit_fields_dd (dd-safe on every backend)
emit_fields_jit = dd.dd_jit(
    emit_fields_dd, static_argnames=("quirk", "het_cap")
)


def _cg_codes(a2, a1, a3, mx, cflag, gflag):
    """The CG-status decision tree (print_vcf.c:227-266; bsc_emit.cpp),
    elementwise on 1-based genotype codes a1/a2/a3 (0 = uncalled)."""
    g1c = jnp.maximum(a1 - 1, 0)
    g3c = jnp.maximum(a3 - 1, 0)
    ccg = ((a2 == 5) & (a3 == 8)) | ((a2 == 8) & (a1 == 5))
    Q, H, N, G, D = (ord("?"), ord("H"), ord("N"), ord("G"), ord("."))
    # the CC branch (a2==5) and the cflag[mx] branch share one
    # expression (print_vcf.c evaluates the same a3/gflag lookahead)
    code_a3 = jnp.where(a3 > 0, jnp.where(gflag[g3c], H, N), Q)
    code_a1 = jnp.where(a1 > 0, jnp.where(cflag[g1c], H, N), Q)
    code_g = jnp.where(a1 > 0, jnp.where(cflag[g1c], H, N), D)
    code = jnp.where(
        ccg, G,
        jnp.where(
            a2 == 5, code_a3,
            jnp.where(
                a2 == 8, code_a1,
                jnp.where(
                    cflag[jnp.clip(mx, 0, 9)], code_a3,
                    jnp.where(gflag[jnp.clip(mx, 0, 9)], code_g, D),
                ),
            ),
        ),
    )
    return code.astype(jnp.int32), ccg


@functools.partial(
    dd.dd_jit, static_argnames=("n_pos", "min_qual", "params", "quirk",
                                "het_cap")
)
def fused_ll_emit(rd, starts, ori, strand, mapq, ref_codes,
                  n_pos: int, min_qual: int, params,
                  quirk: bool = True, het_cap: int | None = None):
    """The engine-facing emit tier: fused_ll_dd's contract (ll planes +
    device quals for the host mismatch-rescue) PLUS the emit fields, all
    in one compiled program. Returns (hi, lo, quals_u8, fields). The
    caller slices fields to its window and attaches them to the block
    soa; risky rows (plus host-rescued rows it knows about) recompute
    through bsc_emit.cpp. No compaction here — the window is dense and
    the splice is positional."""
    from bs_call_tpu.ops.genotype_dd import genotype_ll_dd
    from bs_call_tpu.ops.kernels.pileup_device import (
        _agg_quals_f32,
        device_pileup,
    )

    counts2, qual_sum, mapq2_sum = device_pileup(
        rd, starts, ori, strand, mapq, n_pos, min_qual
    )
    counts = counts2.sum(axis=1).astype(jnp.int32)
    quals = _agg_quals_f32(counts, qual_sum)
    hi, lo = genotype_ll_dd(counts, quals, ref_codes, params)
    if het_cap is None:
        het_cap = max(n_pos // 8, 64)  # real pileups are ~1-5% het
    fields = emit_fields_dd(
        hi, lo, counts2, qual_sum, mapq2_sum, ref_codes, quirk=quirk,
        het_cap=het_cap,
    )
    return hi, lo, quals.astype(jnp.uint8), fields


def _winner_codes(hi, lo, counts2):
    """1-based genotype codes exactly as emit_fields_dd derives them:
    lexicographic (hi, lo) argmax, 0 where uncovered."""
    mhi = jnp.max(hi, axis=-1, keepdims=True)
    top_hi = hi == mhi
    lo_m = jnp.where(top_hi, lo, -jnp.inf)
    mlo = jnp.max(lo_m, axis=-1, keepdims=True)
    mx = jnp.argmax(top_hi & (lo_m == mlo), axis=-1).astype(jnp.int32)
    covered = counts2.sum(axis=(1, 2)) > 0
    return jnp.where(covered, mx + 1, 0)


def _gt1_halo(gt1, axis, nsh):
    """Ring-ppermute the slab-border genotype codes; returns
    (prev_ctx, next_ctx) for emit_fields_dd (global ends unknown)."""
    fwd = [(i, (i + 1) % nsh) for i in range(nsh)]
    bwd = [(i, (i - 1) % nsh) for i in range(nsh)]
    from_left = jax.lax.ppermute(gt1[-1:], axis, fwd)[0]
    from_right = jax.lax.ppermute(gt1[:1], axis, bwd)[0]
    idx = jax.lax.axis_index(axis)
    return ((idx > 0, from_left), (idx < nsh - 1, from_right))


def sharded_fused_ll_emit(mesh, params, n_pos: int, min_qual: int,
                          quirk: bool = True,
                          het_cap: int | None = None):
    """Multi-chip emit tier: sharded_fused_ll_dd's contract (reads
    data-parallel, one psum merges the pileup over ICI, each chip runs
    the dd model on its contiguous slab) PLUS the emit fields with a
     1-position genotype halo so the CG automaton is exact at slab
    borders. Returns fn(rd, starts, ori, strand, mapq, ref) ->
    (hi, lo, quals_u8, fields), everything position-sharded."""
    from jax.sharding import PartitionSpec as P

    from bs_call_tpu.ops.genotype_dd import genotype_ll_dd
    from bs_call_tpu.ops.kernels.pileup_device import (
        _agg_quals_f32,
        device_pileup,
    )

    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    assert n_pos % nd == 0
    shard = n_pos // nd
    cap = het_cap if het_cap is not None else max(shard // 8, 64)

    def local(rd, starts, ori, strand, mapq, ref_shard):
        counts2, qual_sum, mapq2_sum = device_pileup(
            rd, starts, ori, strand, mapq, n_pos, min_qual
        )
        counts2 = jax.lax.psum(counts2, axis)
        qual_sum = jax.lax.psum(qual_sum, axis)
        mapq2_sum = jax.lax.psum(mapq2_sum, axis)
        i = jax.lax.axis_index(axis)
        c2 = jax.lax.dynamic_slice_in_dim(counts2, i * shard, shard)
        qs = jax.lax.dynamic_slice_in_dim(qual_sum, i * shard, shard)
        m2 = jax.lax.dynamic_slice_in_dim(mapq2_sum, i * shard, shard)
        counts = c2.sum(axis=1)
        quals = _agg_quals_f32(counts, qs)
        hi, lo = genotype_ll_dd(counts, quals, ref_shard, params)
        prev_ctx, next_ctx = _gt1_halo(
            _winner_codes(hi, lo, c2), axis, nd
        )
        fields = emit_fields_dd(
            hi, lo, c2, qs, m2, ref_shard, quirk=quirk, het_cap=cap,
            prev_ctx=prev_ctx, next_ctx=next_ctx,
        )
        return hi, lo, quals.astype(jnp.uint8), fields

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=P(axis),
    )
    return dd.dd_jit(fn)


def sharded_emit_fields(mesh, quirk: bool = True,
                        het_cap: int | None = None):
    """Multi-chip emit fields: positions data-parallel over the mesh's
    first axis, with a 1-position ring-ppermute halo of the 1-based
    genotype codes so the CG automaton is EXACT at slab borders
    (print_vcf.c:227-266; same design as sharding.sharded_full_step) —
    only the global chunk edges stay risk-flagged. Returns
    fn(hi, lo, counts2, qual_sum, mapq2_sum, ref) -> fields dict with
    every [n]-shaped output position-sharded. n must divide the mesh."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nsh = mesh.devices.size

    def local(hi, lo, counts2, qual_sum, mapq2_sum, ref):
        prev_ctx, next_ctx = _gt1_halo(
            _winner_codes(hi, lo, counts2), axis, nsh
        )
        return emit_fields_dd(
            hi, lo, counts2, qual_sum, mapq2_sum, ref, quirk=quirk,
            het_cap=het_cap, prev_ctx=prev_ctx, next_ctx=next_ctx,
        )

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=P(axis),
    )
    return dd.dd_jit(fn)


def compact_emitted(fields: dict, cap: int):
    """Pack emitted (covered) rows into cap-sized buffers: D2H carries
    only the compacted records + the row count (print_vcf.c emits only
    covered sites without --all-positions). Returns (n_emit, dict);
    n_emit > cap means the chunk overflowed and the host must rerun it
    through the column path."""
    emitted = fields["covered"]
    seq = jnp.cumsum(emitted.astype(jnp.int32)) - 1
    n_emit = emitted.sum()
    slot = jnp.where(emitted & (seq < cap), seq, cap)
    n = emitted.shape[0]
    src_pos = jnp.arange(n, dtype=jnp.int32)
    out = {"pos": jnp.zeros(cap + 1, jnp.int32).at[slot].set(src_pos)[:-1]}
    for k, v in fields.items():
        if k == "covered":
            continue
        buf_shape = (cap + 1,) + v.shape[1:]
        buf = jnp.zeros(buf_shape, v.dtype).at[slot].set(v)
        out[k] = buf[:-1]
    return n_emit, out


@functools.partial(
    dd.dd_jit, static_argnames=("n_pos", "min_qual", "params", "cap",
                                "quirk", "het_cap")
)
def fused_emit_chunk(rd, starts, ori, strand, mapq, ref_codes,
                     n_pos: int, min_qual: int, params, cap: int,
                     quirk: bool = True, het_cap: int | None = None):
    """The full fused tier in ONE compiled program: read batch -> pileup
    -> df32 model -> finish -> Fisher -> filters/GL/CG -> compaction.
    H2D: read bytes; D2H: compacted emitted-site tensors."""
    from bs_call_tpu.ops.genotype_dd import genotype_ll_dd
    from bs_call_tpu.ops.kernels.pileup_device import (
        _agg_quals_f32,
        device_pileup,
    )

    counts2, qual_sum, mapq2_sum = device_pileup(
        rd, starts, ori, strand, mapq, n_pos, min_qual
    )
    counts = counts2.sum(axis=1).astype(jnp.int32)
    quals = _agg_quals_f32(counts, qual_sum)
    hi, lo = genotype_ll_dd(counts, quals, ref_codes, params)
    if het_cap is None:
        het_cap = max(n_pos // 8, 64)  # real pileups are ~1-5% het
    fields = emit_fields_dd(
        hi, lo, counts2, qual_sum, mapq2_sum, ref_codes, quirk=quirk,
        het_cap=het_cap,
    )
    return compact_emitted(fields, cap)
