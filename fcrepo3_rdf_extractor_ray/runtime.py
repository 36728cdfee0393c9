"""Cluster-aware stage sizing.

A fixed actor-pool size equal to the session's CPU count starves the
upstream read tasks (observed livelock at num_cpus=4 with
concurrency=4). Every actor-pool stage therefore uses an *autoscaling*
pool ``(1, cap)``: Ray reserves one actor's worth of resources and
scales up only while CPUs are free, so no stage can starve the others
(the sizing concern called out in SURVEY.md §4 row 1)."""

from __future__ import annotations

import os


def cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 4)
    except Exception:
        pass
    return os.cpu_count() or 4


def pool(frac: float = 0.75, cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds: (1, max(2, cpus*frac)), optionally
    capped."""
    hi = max(2, int(cluster_cpus() * frac))
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)
