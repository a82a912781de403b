"""Shared engine helpers."""

from __future__ import annotations


def pool_size(reserve: int = 2, cap: int = 8) -> int:
    """Actor-pool size that ALWAYS leaves ``reserve`` CPUs free for the
    upstream read/map tasks.

    An actor pool (or two chained pools) reserving every cluster CPU
    starves the ``ReadParquet`` tasks that feed it and deadlocks the
    whole pipeline — observed as a permanent 0-blocks stall at
    ``num_cpus=4``.  Rule: pool <= min(cap, ncpu - reserve, ncpu // 2),
    floored at 1 (one actor + the driver can always make progress
    because map_batches tasks are only *scheduled*, not reserved).
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(cap, ncpu - reserve, ncpu // 2))
