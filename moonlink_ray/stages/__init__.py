"""Stage helpers shared across operators."""

from __future__ import annotations


def default_concurrency(frac: float = 1.0, floor: int = 2) -> int:
    """Actor-pool size scaled to the cluster: stages must widen with the
    cluster (N -> 4N nodes) instead of pinning a constant pool.

    Always leaves >= 2 CPUs of headroom — an actor pool sized to the
    whole cluster starves its upstream read/downstream reduce tasks and
    the pipeline deadlocks (0 blocks progress)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, min(int(cpus * frac), cpus - 2))
