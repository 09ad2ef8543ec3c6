"""Vectorized per-block VCF emission.

Computes every output field of _print_vcf_entry (print_vcf.c:32-527) as
position-major numpy arrays for a whole pileup block at once, then formats
text rows in a tight loop. Semantics match the scalar SiteEmitter exactly,
including the 2-position lag pipeline quirks:

  - the lookahead slots at block end hold stale duplicates of the last
    genotype (flush_vcf_entries, print_vcf.c:540-541) — captured by padding
    the genotype array with two copies of its last element;
  - reference-context truncation at the first N (strncpy semantics) with
    block-edge windows fixed up scalar (first two and last two positions).

Used for text output without stats/dbSNP; other configurations run the
scalar emitter (the behavioral reference implementation).
"""

from __future__ import annotations

import math

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from bs_call_tpu.constants import GT_HET, LOG10
from bs_call_tpu.output.site import (
    ALL_IDX,
    CS_STR,
    GT_FLAG,
    GT_INT,
    IUPAC,
    PBASE,
    REF_ALT,
    CFLAG,
    GFLAG,
)

# ---- static LUT construction ----


def _gl_layout(gt: int, rfix: int):
    """Slot list for the GL vector (print_vcf.c:318-347); -2 = literal
    -99.999."""
    aix = ALL_IDX[gt][rfix]
    slots = []
    if rfix:
        slots.append(rfix * (9 - rfix) // 2 + rfix - 5)
    else:
        slots.append(-2)
    for i in range(2):
        if aix[i] <= 0:
            break
        if rfix:
            a, b = min(rfix, aix[i]), max(rfix, aix[i])
            slots.append(a * (9 - a) // 2 + b - 5)
        slots.append(aix[i] * (9 - aix[i]) // 2 + aix[i] - 5)
    return slots


GL_IDX = np.full((10, 5, 5), -1, dtype=np.int32)
GL_LEN = np.zeros((10, 5), dtype=np.int32)
for _g in range(10):
    for _r in range(5):
        sl = _gl_layout(_g, _r)
        GL_LEN[_g, _r] = len(sl)
        GL_IDX[_g, _r, : len(sl)] = sl

GT_STR = [["" for _ in range(5)] for _ in range(10)]
for _g in range(10):
    for _r in range(5):
        gg = GT_INT[_g][_r]
        GT_STR[_g][_r] = f"{(gg >> 4 >> 1) - 1}/{((gg & 0xF) >> 1) - 1}"

ALT_STR = [[",".join(REF_ALT[g][r]) or "." for r in range(5)] for g in range(10)]
GT_FLAG_A = np.array(GT_FLAG, dtype=bool)
CFLAG_A = np.array(CFLAG, dtype=bool)
GFLAG_A = np.array(GFLAG, dtype=bool)
GT_HET_A = np.asarray(GT_HET)
PBASE_B = np.frombuffer(PBASE.encode(), dtype=np.uint8)
IUPAC_B = np.frombuffer(IUPAC.encode(), dtype=np.uint8)

FT_STR = []
for _f in range(16):
    if _f:
        names = [n for i, n in enumerate(("q20", "qd2", "fs60", "mq40")) if (_f >> i) & 1]
        FT_STR.append(";".join(names))
    else:
        FT_STR.append("PASS")


def _truncate_ctx(win: np.ndarray) -> np.ndarray:
    """strncpy-style truncation along the last axis: zero everything after
    the first zero."""
    keep = np.cumprod(win != 0, axis=-1).astype(bool)
    return np.where(keep, win, 0)


class VectorBlockEmitter:
    """Block-vectorized text emission; shares dedup state with the caller
    through old_ctg/old_x attributes (matching the scalar emitter)."""

    def __init__(self, cfg, fileobj):
        self.cfg = cfg
        self._f = fileobj
        self.old_ctg = None
        self.old_x = 0

    def emit_block(self, ctg, soa, ref_window, x: int, y: int) -> None:
        sz = y - x + 1
        covered = soa["covered"]
        gt1 = np.where(covered, soa["max_gt"] + 1, 0).astype(np.int32)
        if self.old_ctg is not ctg:
            self.old_ctg = ctg
            self.old_x = 0

        # genotype 5-windows with stale-tail padding
        G_ext = np.concatenate(
            [np.zeros(2, np.int32), gt1, np.repeat(gt1[-1:], 2)]
        )
        g5 = sliding_window_view(G_ext, 5)  # [sz, 5]

        # reference 7-windows with strncpy truncation; rows 0,1 and the two
        # flush rows need scalar fixups
        ref_window = np.asarray(ref_window, dtype=np.uint8)
        V = sliding_window_view(ref_window[: sz + 2], 7)  # [sz-4, 7]
        T = _truncate_ctx(V)
        rf7 = np.zeros((sz, 7), dtype=np.uint8)
        rf7[2 : sz - 2] = T[: sz - 4]
        # first two positions: push offsets < 4 (print_vcf.c:576-580)
        t0 = _truncate_ctx(ref_window[None, :5])[0]
        rf7[0, 2:7] = t0
        t1 = _truncate_ctx(ref_window[None, :6])[0]
        rf7[1, 1:7] = t1
        # flush rows: shifted copies of the push-y window
        o = _truncate_ctx(ref_window[None, sz - 5 : sz + 2])[0]
        rf7[sz - 2] = np.concatenate([o[1:7], o[6:7]])
        rf7[sz - 1] = np.concatenate([o[2:7], o[6:7], o[6:7]])

        rfix = rf7[:, 2].astype(np.int32)
        gt = g5[:, 2] - 1  # -1 where uncovered

        # emission gating (covered, dedup, hom-ref skip, contig length)
        pos = np.arange(x, y + 1)
        reach = covered & (pos > self.old_x)
        if reach.any():
            self.old_x = int(pos[reach].max())
        gtc = np.maximum(gt, 0)
        skip_homref = GT_FLAG_A[gtc, rfix] & (not self.cfg.all_positions)
        skip_len = pos > ctg.seq_len
        emit = reach & ~skip_homref & ~skip_len
        idx = np.nonzero(emit)[0]
        if len(idx) == 0:
            return

        counts = soa["counts"][idx]
        quals = soa["quals"][idx]
        gt_prob = soa["gt_prob"][idx]
        g = gtc[idx]
        r = rfix[idx]
        mq = soa["mq"][idx]
        fs = soa["fs"][idx]
        n = len(idx)

        # phred (print_vcf.c:140-148) with libm boundary rescue
        z = gt_prob[np.arange(n), g]
        z1 = np.exp(z * LOG10)
        with np.errstate(divide="ignore"):
            pf = -10.0 * np.log(1.0 - np.minimum(z1, 1.0 - 1e-300)) / LOG10
        phred = np.where(z1 >= 1.0, 255, np.minimum(pf.astype(np.int64), 255))
        frac = pf - np.floor(pf)
        bnd = np.nonzero(
            (z1 < 1.0)
            & ((frac < 1e-9) | (frac > 1.0 - 1e-9) | (z1 > 1.0 - 1e-12))
        )[0]
        for j in bnd:
            zz1 = math.exp(float(z[j]) * LOG10)
            if zz1 >= 1.0:
                phred[j] = 255
            else:
                phred[j] = min(
                    255, int(-10.0 * math.log(1.0 - zz1) / LOG10)
                )
        phred = phred.astype(np.int64)

        dp1 = counts[:, :4].sum(axis=1)
        fs_int = np.trunc(-fs * 10.0 + 0.5).astype(np.int64)
        qd = np.where(dp1 > 0, phred // np.maximum(dp1, 1), phred)
        flt = (
            (phred < 20).astype(np.int64)
            | ((qd < 2).astype(np.int64) << 1)
            | ((fs_int > 60).astype(np.int64) << 2)
            | ((mq < 40).astype(np.int64) << 3)
        )
        # mac1 (print_vcf.c:192-212)
        c = counts
        mac1 = np.zeros(n, dtype=bool)
        for gv, (sa, sb) in {
            1: ((1, 5, 7), (0, 4)),
            2: ((2, 6), (0,)),
            3: ((3, 7), (0, 4)),
            5: ((2, 6, 4), (1, 5, 7)),
            6: ((3,), (1, 5)),
            8: ((3, 7), (2, 6, 4)),
        }.items():
            m = g == gv
            if m.any():
                mac1[m] = (c[m][:, list(sa)].sum(axis=1) <= 1) | (
                    c[m][:, list(sb)].sum(axis=1) <= 1
                )
        mac1 &= flt == 0

        # GL values (float32-rounded for %g formatting)
        gl_idx = GL_IDX[g, r]  # [n, 5]
        gl_len = GL_LEN[g, r]
        safe = np.maximum(gl_idx, 0)
        gl_vals = gt_prob[np.arange(n)[:, None], safe]
        gl_vals = np.maximum(gl_vals, -99.999)
        gl_vals = np.where(gl_idx == -2, -99.999, gl_vals)
        gl_vals = gl_vals.astype(np.float32)

        # CpG status automaton (print_vcf.c:227-266), vectorized
        g1 = g5[idx, 1]
        g2 = g5[idx, 2]
        g3 = g5[idx, 3]
        g1c = np.maximum(g1 - 1, 0)
        g3c = np.maximum(g3 - 1, 0)

        def hn(neigh, neigh_flag):
            return np.where(
                neigh > 0, np.where(neigh_flag, 72, 78), 63
            )  # 'H','N','?'

        cg_code = np.full(n, ord("."), dtype=np.int64)
        cond_cg = ((g2 == 5) & (g3 == 8)) | ((g2 == 8) & (g1 == 5))
        cond_c = g2 == 5
        cond_g = g2 == 8
        cond_cf = CFLAG_A[g]
        cond_gf = GFLAG_A[g]
        branch_c = hn(g3, GFLAG_A[g3c])
        branch_g = hn(g1, CFLAG_A[g1c])
        branch_gf = np.where(
            g1 > 0, np.where(CFLAG_A[g1c], 72, 78), ord(".")
        )
        # 'CG' is two chars; cond_cg rows override the code below
        cg_code = np.select(
            [cond_cg, cond_c, cond_g, cond_cf, cond_gf],
            [ord("G"), branch_c, branch_g, branch_c, branch_gf],
            ord("."),
        )

        # context strings
        prf_bytes = PBASE_B[rf7[idx, :5]]
        prf_all = prf_bytes.tobytes().decode()
        ctx_bytes = IUPAC_B[g5[idx]]
        ctx_all = ctx_bytes.tobytes().decode()

        pos_e = pos[idx]
        name = ctg.name
        het = GT_HET_A[g]
        lines = []
        q8 = quals
        for i in range(n):
            gi = g[i]
            ri = r[i]
            f = int(flt[i])
            if f:
                filt = "fail"
                ft = FT_STR[f & 15]
            elif mac1[i]:
                filt = "mac1"
                ft = "PASS"
            else:
                filt = "PASS"
                ft = "PASS"
            prf = prf_all[i * 5 : i * 5 + 5]
            ctx = ctx_all[i * 5 : i * 5 + 5]
            ph = phred[i]
            gl = ",".join(
                "%g" % gl_vals[i, k] for k in range(gl_len[i])
            )
            ci = c[i]
            mc8 = "%d,%d,%d,%d,%d,%d,%d,%d" % tuple(ci)
            amq = ",".join(str(q8[i, k]) for k in range(8) if ci[k] > 0)
            if cond_cg[i]:
                cgs = "CG"
            else:
                cgs = chr(cg_code[i])
            fmt = "GT:FT:DP:MQ:GQ:QD:GL:MC8:AMQ:CS:CG:CX"
            vals = (
                f"{GT_STR[gi][ri]}:{ft}:{dp1[i]}:{mq[i]}:{ph}:{qd[i]}:"
                f"{gl}:{mc8}:{amq}:{CS_STR[gi]}:{cgs}:{ctx}"
            )
            if het[i]:
                fmt += ":FS"
                vals += f":{fs_int[i]}"
            lines.append(
                f"{name}\t{pos_e[i]}\t.\t{PBASE[ri]}\t{ALT_STR[gi][ri]}\t"
                f"{ph}\t{filt}\tCX={prf}\t{fmt}\t{vals}\n"
            )
        self._f.write("".join(lines).encode())
