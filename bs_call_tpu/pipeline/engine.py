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

import math
from typing import List, Optional

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.constants import LOG10
from bs_call_tpu.ops import oracle
from bs_call_tpu.ops.postprocess import aggregate_pileup, fisher_strand
from bs_call_tpu.output.site import SiteCall


class CallEngine:
    """Maps (counts2, qual_sum, mapq2_sum, ref) blocks to per-position
    SiteCall results."""

    def __init__(self, cfg: CallerConfig):
        self.cfg = cfg
        self._params = None
        self._jax = None
        if cfg.device != "numpy":
            try:
                import jax
                import jax.numpy as jnp

                from bs_call_tpu.ops.genotype import ModelParams, call_genotypes

                self._jax = (jax, jnp, call_genotypes)
                self._params = ModelParams(
                    under_conv=cfg.under_conv,
                    over_conv=cfg.over_conv,
                    ref_bias=cfg.ref_bias,
                )
            except Exception:
                self._jax = None

    # ------------------------------------------------------------------

    def _call_batch(self, counts, quals, ref):
        """Returns (gt_prob [N,10] f64, max_gt [N], margin [N])."""
        n = len(ref)
        if self._jax is None or n == 0:
            gt_prob = np.zeros((n, 10))
            max_gt = np.zeros(n, dtype=np.int32)
            for i in range(n):
                gt_prob[i], max_gt[i] = oracle.calc_gt_prob(
                    counts[i],
                    quals[i],
                    int(ref[i]),
                    self.cfg.under_conv,
                    self.cfg.over_conv,
                    self.cfg.ref_bias,
                )
            return gt_prob, max_gt, np.full(n, np.inf)
        jax, jnp, call_genotypes = self._jax
        # pad to the batch granularity so only a few kernel shapes compile
        bp = self.cfg.batch_positions
        pad = (-n) % min(bp, max(256, 1 << (n - 1).bit_length()))
        if pad:
            counts = np.concatenate(
                [counts, np.zeros((pad, 8), counts.dtype)]
            )
            quals = np.concatenate([quals, np.zeros((pad, 8), quals.dtype)])
            ref = np.concatenate([ref, np.zeros(pad, ref.dtype)])
        gt_prob, max_gt, margin = call_genotypes(
            jnp.asarray(counts),
            jnp.asarray(quals),
            jnp.asarray(ref),
            self._params,
            dtype=jnp.float32,
        )
        gt_prob = np.array(gt_prob, dtype=np.float64)[:n]
        max_gt = np.array(max_gt)[:n]
        margin = np.array(margin, dtype=np.float64)[:n]
        return gt_prob, max_gt, margin

    def _rescue_mask(self, gt_prob, max_gt, margin, counts):
        """Positions needing exact recomputation."""
        n = len(max_gt)
        mask = np.zeros(n, dtype=bool)
        if n == 0:
            return mask
        # 1. ambiguous argmax: margin below f32 noise floor of the ll sums
        depth = counts.sum(axis=1)
        scale = np.maximum(1.0, depth * 60.0)  # ll magnitude ~ depth * |ln k|
        mask |= margin < 1e-5 * scale
        # 2. GQ/phred near an integer boundary
        top = gt_prob[np.arange(n), max_gt]
        z1 = np.exp(top * LOG10)
        with np.errstate(divide="ignore"):
            ph = np.where(z1 < 1.0, -10.0 * np.log10(1.0 - z1), 256.0)
        frac = ph - np.floor(ph)
        tol = 1e-4 * np.maximum(1.0, np.abs(ph))
        mask |= frac < tol
        mask |= (1.0 - frac) < tol
        mask |= z1 > 1.0 - 1e-6  # saturation boundary
        # 3. GL clamp boundary at -99.999
        mask |= np.any(np.abs(gt_prob + 99.999) < 1e-3, axis=1)
        return mask

    def call_block(self, counts2, qual_sum, mapq2_sum, ref_codes):
        """counts2 [sz,2,8], qual_sum [sz,8], mapq2_sum [sz],
        ref_codes [sz] (position-aligned reference base codes).
        Returns list[SiteCall|None] of length sz."""
        agg = aggregate_pileup(counts2, qual_sum, mapq2_sum)
        counts = agg["counts"]
        n = agg["n"]
        covered = np.nonzero(n > 0)[0]
        out: List[Optional[SiteCall]] = [None] * len(n)
        if len(covered) == 0:
            return out
        ccounts = counts[covered]
        cquals = agg["quals"][covered]
        cref = np.asarray(ref_codes, dtype=np.int32)[covered]
        gt_prob, max_gt, margin = self._call_batch(
            ccounts.astype(np.int32), cquals, cref
        )
        if self.cfg.exact and self._jax is not None:
            mask = self._rescue_mask(gt_prob, max_gt, margin, ccounts)
            for j in np.nonzero(mask)[0]:
                gt_prob[j], max_gt[j] = oracle.calc_gt_prob(
                    ccounts[j],
                    cquals[j],
                    int(cref[j]),
                    self.cfg.under_conv,
                    self.cfg.over_conv,
                    self.cfg.ref_bias,
                )
        fs = fisher_strand(
            counts2[covered], max_gt, not self.cfg.reference_quirks
        )
        for idx, j in enumerate(covered):
            out[j] = SiteCall(
                counts=counts[j],
                quals=agg["quals"][j],
                gt_prob=gt_prob[idx],
                fisher_strand=fs[idx],
                mq=int(agg["mq"][j]),
                aq=int(agg["aq"][j]),
                max_gt=int(max_gt[idx]),
            )
        return out
