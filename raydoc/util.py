"""Shared runtime helpers (no Ray session ownership here)."""

from __future__ import annotations


def cpu_cap() -> int:
    """Upper bound for autoscaling actor-pool concurrency: cluster CPUs
    minus one. A FIXED pool sized to ALL CPUs deadlocks the streaming
    executor — the actors pin every CPU and the upstream read task is
    backpressured forever (observed on 8 CPUs; see
    pipelines.extract_pipeline.default_concurrency). One shared helper
    so every actor-pool stage stays in sync."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, cpus - 1)
