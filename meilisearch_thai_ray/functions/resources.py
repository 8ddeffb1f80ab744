"""Cluster-derived sizing for actor pools and block fan-outs.

The dedup/similarity stages were originally tuned on one 32-vCPU box
(BASELINE.md records the A/Bs); those constants are kept as the
SINGLE-NODE FLOOR, and on a larger cluster the caps grow with the
CPU count reported by ray.cluster_resources() — a fixed `(1, 8)` pool
would starve a 64-core-per-node multi-node cluster.

Pure sizing only: pool size never changes operator OUTPUT (hash parity
asserted by the driver gate), only how wide it runs.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs the cluster advertises, or `default` when Ray is not
    initialized (sizing must never force an init — library code does not
    own the Ray session)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def pool_cap(floor: int, fraction: float = 0.5,
             ceiling: int = 256) -> int:
    """Max size for an autoscaling actor pool: the single-node tuned value
    (`floor`) or `fraction` of the cluster's CPUs, whichever is larger,
    bounded by `ceiling` (driver-side actor bookkeeping is not free).
    fraction < 1 leaves headroom for the other stages of the same pipeline
    (e.g. the sort feeding a verify pool)."""
    return max(floor, min(ceiling, int(cluster_cpus(floor) * fraction)))


def block_count(n_rows: int, target_rows: int, floor: int = 4,
                ceiling: int | None = None) -> int:
    """Block count for the blocked all-pairs similarity join: bounded block
    size bounds each task's memory, and the ceiling keeps the P*(P+1)/2
    pair fan-out proportionate to the cluster (P=32 already yields 528
    tasks — plenty for hundreds of cores; beyond that, more blocks only
    shrink per-task work below its fixed costs)."""
    if ceiling is None:
        # one block per ~2 cores floor->32, then grow slowly with cluster
        ceiling = max(32, min(128, cluster_cpus() // 4))
    return int(max(floor, min(ceiling, -(-n_rows // target_rows))))
