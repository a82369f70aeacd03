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


def embedding_matrix(col, dtype=None):
    """Decode a list<float> / fixed_size_list<float> column to an
    (N, D) numpy matrix WITHOUT a Python-object round trip: flatten the
    child values buffer and reshape — zero-copy for null-free
    fixed-dim columns, which is what embedding columns are. Falls back
    to the ``to_pylist`` path for ragged/nullable lists. This is the
    dominant per-batch cost of every ANN stage, so it matters.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    dtype = dtype or np.float64
    if isinstance(col, pa.ChunkedArray):
        col = (col.chunk(0) if col.num_chunks == 1
               else pa.concat_arrays(col.chunks))
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
            flat = col.flatten()
            return (flat.to_numpy(zero_copy_only=False)
                    .astype(dtype, copy=False).reshape(n, dim))
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            mm = pc.min_max(pc.list_value_length(col))
            dim_min, dim_max = mm["min"].as_py(), mm["max"].as_py()
            flat = col.flatten()
            if dim_min == dim_max and flat.null_count == 0:
                return (flat.to_numpy(zero_copy_only=False)
                        .astype(dtype, copy=False).reshape(n, dim_min))
    return np.asarray(col.to_pylist(), dtype=dtype)
