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


# ---------------------------------------------------------------------------
# Production mesh kernels (used by pipeline.engine.CallEngine)
# ---------------------------------------------------------------------------
# These carry the exact single-device contracts of ops.genotype.call_genotypes
# and ops.genotype_dd.genotype_ll_dd, with the position axis sharded over the
# mesh. The model is a pure per-position map, so the sharded program runs the
# identical elementwise/gather graph on each slab and needs no collectives —
# outputs are bitwise equal to the single-device kernels, which is what lets
# the production engine switch to the mesh whenever >1 device is present
# without disturbing the exactness tiers (f64 rescue + scalar oracle).


def sharded_call_genotypes(mesh: Mesh, params, dtype):
    """jit(shard_map) of ops.genotype.call_genotypes over the mesh:
    (counts [B,8], quals [B,8], ref [B]) ->
    (gt_prob [B,10], max_gt [B], margin [B], off_sum [B]), B % ndev == 0."""
    from bs_call_tpu.ops.genotype import call_genotypes

    axis = mesh.axis_names[0]

    def local(counts, quals, ref):
        return call_genotypes(counts, quals, ref, params, dtype=dtype)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )
    )


def sharded_ll_dd(mesh: Mesh, params):
    """jit(shard_map) of ops.genotype_dd.genotype_ll_dd over the mesh:
    (counts, quals, ref) -> (ll_hi [B,10] f32, ll_lo [B,10] f32)."""
    from bs_call_tpu.ops.genotype_dd import genotype_ll_dd

    axis = mesh.axis_names[0]

    def local(counts, quals, ref):
        return genotype_ll_dd(counts, quals, ref, params)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
    )


def usable_device_count(n_devices: int, batch: int) -> int:
    """Largest power of two <= n_devices that divides the batch size (the
    fixed compiled chunk shape must split evenly over the mesh)."""
    n = 1
    while n * 2 <= n_devices and batch % (n * 2) == 0:
        n *= 2
    return n
