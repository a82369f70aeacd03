"""Flagship pipeline: pages parquet -> extracted/chunks parquet + manifests.

Ray-Data-first layout (SURVEY.md §3.4 entry point A):

    read_parquet(pages, columns=[url, html])        # prune at the read
      -> filter committed partitions (broadcast set, no shuffle)
      -> map_batches(ExtractStage, actor pool)      # html dropped here
      -> add part_id = crc32(url) % P               # stable, process-independent
      -> groupby(part_id).map_groups(write_partition_atomic)
      -> manifest rows (tiny)

The ONE all-to-all exchange is the groupby(part_id) — and it runs on
post-extraction rows (html already dropped), so the shuffle moves
extracted text, not raw multi-MB html. Partitioning key is url-hash
throughout (host skew broken by design: a hot host's pages spread
uniformly over partitions). At 100 TB the same plan holds: P scales
with input size (`parts_for`), each partition commits independently,
and a killed job resumes from the committed-manifest set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydoc.hashing import crc32_str
from raydoc.stages.extract_stage import ExtractStage, explode_chunks
from raydoc.state.manifest import committed_partitions, load_manifests, write_partition_atomic


def parts_for(n_rows: int, rows_per_part: int = 2000, min_parts: int = 8) -> int:
    return max(min_parts, (n_rows + rows_per_part - 1) // rows_per_part)


def default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for the extract stage.

    A FIXED pool sized to all cluster CPUs deadlocks the streaming
    executor: the actors pin every CPU and the upstream read task is
    backpressured forever (observed on 8 CPUs: ReadParquet
    "[backpressured:tasks]" with 8/8 CPUs held by idle actors). An
    autoscaling pool capped at cpus-1 always leaves headroom for the
    read/shuffle tasks. Ray requires an explicit ``concurrency`` for
    callable-class stages."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, cpus - 1))


def add_part_id(batch: pa.Table, num_parts: int) -> pa.Table:
    part = np.fromiter(
        (crc32_str(u) % num_parts for u in batch.column("url").to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("part_id", pa.array(part))


def extract_dataset(
    pages_path: str,
    token_budget: int = 256,
    concurrency: int | None = None,
    batch_size: int = 64,
):
    """pages parquet -> lazy Dataset of extracted rows (nested chunks).

    No shuffle, no materialization — the streaming executor pipelines
    read -> extract. Used by entry()/queries() and as the front half of
    the checkpointed pipeline.
    """
    import ray.data as rd

    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    return ds.map_batches(
        ExtractStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"token_budget": token_budget},
        concurrency=concurrency or default_concurrency(),
    )


def run_extract_pipeline(
    pages_path: str,
    out_dir: str,
    num_parts: int | None = None,
    token_budget: int = 256,
    batch_size: int = 64,
    concurrency: int | None = None,
) -> dict:
    """Checkpointed, resumable flagship run. Returns a summary dict.

    Resume semantics (north rule): partitions listed in
    ``out_dir/_manifest`` are skipped entirely — their pages are
    filtered out right after the read, BEFORE any parse work.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    # row count via parquet metadata (cheap, no data read)
    import glob as _glob
    import os as _os

    files = (
        sorted(_glob.glob(_os.path.join(pages_path, "*.parquet")))
        if _os.path.isdir(pages_path)
        else [pages_path]
    )
    total_rows = sum(pq.read_metadata(f).num_rows for f in files)
    P = num_parts or parts_for(total_rows)

    done = committed_partitions(out_dir)
    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    ds = ds.map_batches(lambda b: add_part_id(b, P), batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())

        def _not_done(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(
                pc.invert(pc.is_in(b.column("part_id"), value_set=done_arr))
            )

        ds = ds.map_batches(_not_done, batch_format="pyarrow")

    # part_id survives map_batches only if the stage keeps it; ExtractStage
    # rebuilds its output table, so re-stamp afterwards (cheap) instead of
    # widening the stage contract.
    extracted = ds.map_batches(
        ExtractStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"token_budget": token_budget},
        concurrency=concurrency or default_concurrency(),
    )
    extracted = extracted.map_batches(lambda b: add_part_id(b, P), batch_format="pyarrow")

    def _write_group(group: pa.Table) -> pa.Table:
        part_id = int(group.column("part_id")[0].as_py())
        chunks = explode_chunks(group)
        ext = group.drop_columns(["chunks", "part_id"])
        row = write_partition_atomic(out_dir, part_id, ext, chunks)
        return pa.Table.from_pylist([row])

    manifests_ds = extracted.groupby("part_id").map_groups(
        _write_group, batch_format="pyarrow"
    )
    new_manifests = manifests_ds.take_all()  # tiny: one row per partition

    all_manifests = load_manifests(out_dir)
    return {
        "out_dir": out_dir,
        "num_parts": P,
        "n_parts_committed": len(all_manifests),
        "n_parts_skipped_resume": len(done),
        "n_parts_written": len(new_manifests),
        "n_docs": sum(m["n_docs"] for m in all_manifests),
        "n_ok": sum(m["n_ok"] for m in all_manifests),
        "n_empty": sum(m["n_empty"] for m in all_manifests),
        "n_error": sum(m["n_error"] for m in all_manifests),
        "n_chunks": sum(m["n_chunks"] for m in all_manifests),
        "text_bytes": sum(m["text_bytes"] for m in all_manifests),
    }
