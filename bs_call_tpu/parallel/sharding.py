"""Multi-chip sharding of the calling step.

Positions are data-parallel over a 1-D device mesh ("pos" axis): each chip
calls genotypes for a contiguous slab of pileup columns. Two collectives
tie the slabs together, mirroring the reference's only cross-position
couplings (SURVEY §5):

  - a 2-position halo exchange (ppermute) of called-genotype codes so the
    CpG-status stencil (print_vcf.c:231-266) is correct at slab borders;
  - a psum merge of the per-shard stats histograms (the bs_stats analogue).

The same step function runs on a virtual CPU mesh in tests and on a real
TPU slice in production.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bs_call_tpu.ops.genotype import ModelParams, genotype_log_likelihoods
from bs_call_tpu.constants import LOG10


def make_mesh(n_devices: int = None, axis: str = "pos") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_call_step(mesh: Mesh, params: ModelParams, dtype=jnp.float32):
    """Returns a jitted function (counts [N,8], quals [N,8], ref [N]) ->
    (gt_prob [N,10], max_gt [N], cg_mask [N], gt_hist [10], cov_hist [64])
    with N sharded over the mesh's 'pos' axis."""
    axis = mesh.axis_names[0]
    nsh = mesh.devices.size

    def local_step(counts, quals, ref):
        ll = genotype_log_likelihoods(counts, quals, ref, params, dtype)
        mx = jnp.argmax(ll, axis=-1).astype(jnp.int32)
        mval = jnp.max(ll, axis=-1, keepdims=True)
        s = jnp.log(jnp.sum(jnp.exp(ll - mval), axis=-1, keepdims=True))
        gt_prob = (ll - mval - s) / LOG10
        covered = counts.sum(axis=-1) > 0
        gt1 = jnp.where(covered, mx + 1, 0)  # 1-based codes, 0 = uncalled

        # halo exchange: previous shard's last genotype, next shard's first
        right = jax.lax.ppermute(
            gt1[-1:], axis, [(i, (i + 1) % nsh) for i in range(nsh)]
        )
        left = jax.lax.ppermute(
            gt1[:1], axis, [(i, (i - 1) % nsh) for i in range(nsh)]
        )
        idx = jax.lax.axis_index(axis)
        prev_gt = jnp.where(idx == 0, 0, right[0])
        next_gt = jnp.where(idx == nsh - 1, 0, left[0])
        g_prev = jnp.concatenate([prev_gt[None], gt1[:-1]])
        g_next = jnp.concatenate([gt1[1:], next_gt[None]])
        # CG detection across the stencil (subset of the full automaton:
        # the "CG" branch needs only the +-1 neighbours)
        cg_mask = ((gt1 == 5) & (g_next == 8)) | ((gt1 == 8) & (g_prev == 5))

        # stats merge over shards
        gt_hist = jnp.zeros(10, jnp.int32).at[mx].add(
            covered.astype(jnp.int32)
        )
        gt_hist = jax.lax.psum(gt_hist, axis)
        depth = jnp.clip(counts.sum(axis=-1), 0, 63).astype(jnp.int32)
        cov_hist = jnp.zeros(64, jnp.int32).at[depth].add(
            covered.astype(jnp.int32)
        )
        cov_hist = jax.lax.psum(cov_hist, axis)
        return gt_prob, mx, cg_mask, gt_hist, cov_hist

    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(), P()),
    )
    return jax.jit(shmapped)


def shard_positions(mesh: Mesh, *arrays):
    """Device-put position-major arrays with the pos axis sharded."""
    axis = mesh.axis_names[0]
    out = []
    for a in arrays:
        spec = P(axis) if a.ndim == 1 else P(axis, None)
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
