"""Per-partition lineage manifests + atomic commit protocol.

The reference's checkpoint is a single JSON snapshot of the whole
pipeline state (``Canvas.__str__``/``load``,
/root/reference/agent/canvas.py:128-151, 101-126) — serial and
driver-held. The engine's scale-out equivalent (SURVEY.md §4) is a
coordinator-free layout:

    out_dir/
      extracted/part-{id:05d}.parquet
      chunks/part-{id:05d}.parquet
      _manifest/part-{id:05d}.json     <- written LAST; its presence IS the commit

Each partition is written to ``*.tmp`` files, renamed into place, and
only then is the manifest written (tmp + fsync + rename). A resumed run
lists ``_manifest/`` and skips committed partitions; partial files from
a crashed run are simply overwritten. No coordinator, no global lock —
rename is the atom.

Durability levels: the default (``durable=False``) is safe against the
north rule's failure mode — a KILLED JOB/process (written pages survive
in the OS page cache; rename ordering guarantees a manifest never
appears before its data files exist). Passing ``durable=True`` adds
per-file + directory fsyncs so a committed manifest also implies the
parquet pages are on disk across POWER LOSS — measurably slower
(serialized device flushes cost ~25% of 32-CPU throughput at sf0.1),
so it is an explicit opt-in, matching the default posture of other
data engines' rename-based output committers.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raydoc.hashing import md5_hex


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_partitions(out_dir: str) -> set[int]:
    """Partition ids with a committed manifest (cheap directory listing)."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                out.add(int(name[5:-5]))
            except ValueError:
                continue
    return out


def load_manifests(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    rows = []
    if not os.path.isdir(mdir):
        return rows
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    return rows


def _atomic_write_parquet(table: pa.Table, path: str,
                          durable: bool = False) -> None:
    """write tmp -> [fsync file] -> rename -> [fsync directory]. With
    ``durable`` the data is on disk BEFORE the manifest commits: a
    manifest that survives a power loss while its parquet pages didn't
    would make resume permanently skip a truncated partition."""
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    if durable:
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    os.replace(tmp, path)
    if durable:
        dfd = os.open(os.path.dirname(path), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


def write_partition_atomic(
    out_dir: str,
    part_id: int,
    extracted: pa.Table,
    chunks: pa.Table,
    num_parts: int | None = None,
    durable: bool = False,
    timing: dict | None = None,
) -> dict:
    """Write one partition's outputs + manifest; returns the manifest row.

    Idempotent: re-running a partition overwrites its files and
    re-commits — output is byte-identical because extraction is a pure
    per-row function and rows are sorted by url before write (pinned
    within-partition order, SURVEY.md §7 hard part 4).
    """
    for sub in ("extracted", "chunks", "_manifest"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    name = f"part-{part_id:05d}.parquet"

    sort_idx = pa.compute.sort_indices(extracted.column("url"))
    extracted = extracted.take(sort_idx)
    if chunks.num_rows:
        chunks = chunks.take(
            pa.compute.sort_indices(
                chunks, sort_keys=[("url", "ascending"), ("chunk_id", "ascending")]
            )
        )

    _atomic_write_parquet(extracted, os.path.join(out_dir, "extracted", name),
                          durable=durable)
    _atomic_write_parquet(chunks, os.path.join(out_dir, "chunks", name),
                          durable=durable)

    status = extracted.column("status").to_pylist()
    texts = extracted.column("text").to_pylist()
    urls = extracted.column("url").to_pylist()
    checksum = md5_hex("".join(u + "\0" + t + "\1" for u, t in zip(urls, texts)))
    manifest = {
        "part_id": int(part_id),
        "num_parts": int(num_parts) if num_parts is not None else None,
        "n_docs": extracted.num_rows,
        "n_ok": sum(1 for s in status if s == "ok"),
        "n_empty": sum(1 for s in status if s == "empty"),
        "n_error": sum(1 for s in status if s == "error"),
        "n_chunks": int(chunks.num_rows),
        "text_bytes": sum(len(t.encode("utf-8")) for t in texts),
        "checksum": checksum,
    }
    if timing:
        # per-partition lineage metrics: when the write task started on
        # this partition and how long chunk/sort/write took — lets an
        # operator read tail latency and write-phase concurrency straight
        # off the manifest directory of a finished (or killed) run
        manifest.update(timing)
    mpath = os.path.join(manifest_dir(out_dir), f"part-{part_id:05d}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mpath)
    return manifest
