"""Multi-host execution over a TPU pod slice.

Topology: each host runs one bs_call_tpu process against its local chips
(jax.distributed). Contigs are assigned to hosts by greedy LPT (the same
partitioner as the in-host shard runner); each host calls its contigs and
writes a per-host VCF with a uniform header (concat-compatible, the
reference's -s contract). The JSON stats block is then merged with device
collectives: every fixed-size counter flattens into one vector and a
single psum over the host axis produces the global stats — the coverage
hash is folded into a bounded histogram for the collective (SURVEY §5) and
kept exact per-host for single-host runs.

Entry points:
  initialize(coordinator, num_processes, process_id) — jax.distributed
  my_contigs(universe, n_hosts, host_id) — deterministic assignment
  merge_stats_collective(stats, axis_devices) — psum-based global merge
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from bs_call_tpu.parallel.shard_runner import partition_contigs
from bs_call_tpu.stats.collect import BsStats

COV_HIST_MAX = 4096  # bounded coverage histogram for collectives


def initialize(
    coordinator: str, num_processes: int, process_id: int
) -> None:
    """jax.distributed bring-up (call once per host before any jax use)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def my_contigs(
    universe: List[Tuple[str, int]], n_hosts: int, host_id: int
) -> List[str]:
    """Deterministic contig assignment for this host."""
    shards = partition_contigs(universe, n_hosts)
    return shards[host_id] if host_id < len(shards) else []


# ---------------- collective stats merge ----------------

_FIXED_FIELDS = [
    ("snps", 2), ("indels", 2), ("multi", 2), ("dbSNP_sites", 2),
    ("dbSNP_var", 2), ("CpG_ref", 2), ("CpG_nonref", 2),
]
_ARRAY_FIELDS = [
    ("mut_counts", (12, 2)),
    ("dbSNP_mut_counts", (12, 2)),
    ("qual", (4, 256)),
    ("filter_cts", (15,)),
    ("filter_bases", (15,)),
    ("base_filter", (5,)),
    ("filter_counts", (2, 32)),
]
_FLOAT_FIELDS = [
    ("CpG_ref_meth", (2, 101)),
    ("CpG_nonref_meth", (2, 101)),
]
_QC_MAX = 512  # fs/qd/mq distribution bound for the collective
_MPROF_MAX = 1024


def stats_to_vectors(stats: BsStats) -> Dict[str, np.ndarray]:
    """Flatten a BsStats into fixed-shape arrays suitable for psum."""
    ints = []
    for name, n in _FIXED_FIELDS:
        ints.extend(int(v) for v in getattr(stats, name))
    for name, shape in _ARRAY_FIELDS:
        ints.extend(np.asarray(getattr(stats, name)).ravel().tolist())
    iv = np.array(ints, dtype=np.int64)
    fv = np.concatenate(
        [np.asarray(getattr(stats, name)).ravel() for name, _ in _FLOAT_FIELDS]
    )
    # bounded coverage histogram: [cov, 5] counters (all, var, CpG0/1,
    # CpG_inf handled separately keyed by informative depth)
    cov = np.zeros((COV_HIST_MAX, 4), dtype=np.int64)
    cov_inf = np.zeros((COV_HIST_MAX, 2), dtype=np.int64)
    gc = np.zeros((COV_HIST_MAX, 101), dtype=np.int64)
    for d, cs in stats.cov_stats.items():
        d = min(int(d), COV_HIST_MAX - 1)
        cov[d, 0] += cs.all
        cov[d, 1] += cs.var
        cov[d, 2] += cs.CpG[0]
        cov[d, 3] += cs.CpG[1]
        cov_inf[d, 0] += cs.CpG_inf[0]
        cov_inf[d, 1] += cs.CpG_inf[1]
        gc[d] += cs.gc_pcent
    qc = np.zeros((3, _QC_MAX, 2), dtype=np.int64)
    for row, attr in enumerate(("fs_stats", "qd_stats", "mq_stats")):
        for k, v in getattr(stats, attr).items():
            k = min(int(k), _QC_MAX - 1)
            qc[row, k, 0] += v[0]
            qc[row, k, 1] += v[1]
    mprof = np.zeros((_MPROF_MAX, 4), dtype=np.int64)
    mp = stats.meth_profile[:_MPROF_MAX]
    mprof[: len(mp)] = mp
    return {
        "ints": iv,
        "floats": fv,
        "cov": cov,
        "cov_inf": cov_inf,
        "gc": gc,
        "qc": qc,
        "mprof": mprof,
        "mprof_used": np.array([stats.meth_profile_used], dtype=np.int64),
    }


def vectors_to_stats(v: Dict[str, np.ndarray]) -> BsStats:
    stats = BsStats()
    iv = np.asarray(v["ints"])
    off = 0
    for name, n in _FIXED_FIELDS:
        setattr(stats, name, [int(x) for x in iv[off : off + n]])
        off += n
    for name, shape in _ARRAY_FIELDS:
        size = int(np.prod(shape))
        setattr(
            stats, name, np.asarray(iv[off : off + size]).reshape(shape)
        )
        off += size
    fv = np.asarray(v["floats"])
    off = 0
    for name, shape in _FLOAT_FIELDS:
        size = int(np.prod(shape))
        setattr(stats, name, fv[off : off + size].reshape(shape))
        off += size
    cov = np.asarray(v["cov"])
    cov_inf = np.asarray(v["cov_inf"])
    gc = np.asarray(v["gc"])
    for d in np.nonzero(
        cov.any(axis=1) | cov_inf.any(axis=1) | gc.any(axis=1)
    )[0]:
        cs = stats.cov_stats[int(d)]
        cs.all = int(cov[d, 0])
        cs.var = int(cov[d, 1])
        cs.CpG = [int(cov[d, 2]), int(cov[d, 3])]
        cs.CpG_inf = [int(cov_inf[d, 0]), int(cov_inf[d, 1])]
        cs.gc_pcent = gc[d].copy()
    qc = np.asarray(v["qc"])
    for row, attr in enumerate(("fs_stats", "qd_stats", "mq_stats")):
        dct = getattr(stats, attr)
        for k in np.nonzero(qc[row].any(axis=1))[0]:
            dct[int(k)][0] = int(qc[row, k, 0])
            dct[int(k)][1] = int(qc[row, k, 1])
    used = int(np.asarray(v["mprof_used"])[0])
    stats.grow_meth_profile(max(used, 0))
    mp = np.asarray(v["mprof"])
    stats.meth_profile[: min(len(mp), len(stats.meth_profile))] = mp[
        : len(stats.meth_profile)
    ]
    stats.meth_profile_used = used
    return stats


def merge_stats_collective(stats: BsStats, mesh=None) -> BsStats:
    """Merge per-host stats into the global stats with a single psum over
    all participating processes/devices. On a single process this runs
    over the local device mesh (shard axis); multi-host it runs over the
    global device set brought up by initialize()."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    vecs = stats_to_vectors(stats)
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("hosts",))

    # every host contributes its local vectors; psum over the axis.
    def merge(*arrs):
        return tuple(
            jax.lax.psum(a, "hosts") for a in arrs
        )

    keys = [k for k in vecs if k != "mprof_used"]
    n_dev = mesh.devices.size
    # replicate local arrays across local devices scaled so the psum over
    # devices equals the per-process sum exactly once per process
    args = []
    for k in keys:
        a = vecs[k]
        contrib = np.zeros((n_dev,) + a.shape, dtype=a.dtype)
        contrib[0] = a  # one device per process carries the payload
        args.append(contrib)
    shard = jax.shard_map(
        lambda *arrs: merge(*[a[0] for a in arrs]),
        mesh=mesh,
        in_specs=tuple(P("hosts") for _ in args),
        out_specs=tuple(P() for _ in args),
    )
    out = shard(*[jnp.asarray(a) for a in args])
    merged = {k: np.asarray(o) for k, o in zip(keys, out)}
    merged["mprof_used"] = vecs["mprof_used"]
    return vectors_to_stats(merged)
