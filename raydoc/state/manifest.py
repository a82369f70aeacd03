"""Per-partition lineage manifests + atomic commit protocol.

The reference's checkpoint is a single JSON snapshot of the whole
pipeline state (``Canvas.__str__``/``load``,
/root/reference/agent/canvas.py:128-151, 101-126) — serial and
driver-held. The engine's scale-out equivalent (SURVEY.md §4) is a
coordinator-free layout:

    out_dir/
      extracted/part-{id:05d}.parquet
      chunks/part-{id:05d}.parquet
      _manifest/s{id % 256:03d}/part-{id:05d}.json  <- written LAST;
                                                       presence IS the commit
      _manifest/ledger-{epoch:04d}.parquet          <- compacted history

Each partition is written to ``*.tmp`` files, renamed into place, and
only then is the manifest written (tmp [+ fsync] + rename). A resumed
run lists ``_manifest/`` and skips committed partitions; partial files
from a crashed run are simply overwritten. No coordinator, no global
lock — rename is the atom.

Scale layout (r04, VERDICT r03 #5): at 100 TB ``parts_for`` targets
~1.6M partitions, and 1.6M files in ONE directory makes every resume
listing (and the filesystem) crawl. Two mechanisms bound it:

* manifests shard into ``s{part_id % 256}`` subdirectories — no
  directory ever holds more than ~parts/256 entries;
* ``compact_manifests`` consolidates all loose JSONs into one
  epoch-numbered parquet ledger and deletes them, so steady-state
  resume reads a handful of ledger files + only the manifests written
  since the last compaction. Run it between jobs (it must not race a
  writing run). A partition re-committed after compaction writes a
  fresh loose JSON, which overrides its ledger row on load.

The flat legacy layout (loose ``_manifest/part-*.json``) is still
read, so pre-r04 output directories resume unchanged.

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

import hashlib
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SHARDS = 256

_PART_RE = re.compile(r"^part-(\d+)\.json$")
_LEDGER_RE = re.compile(r"^ledger-(\d+)\.parquet$")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, part_id: int) -> str:
    """Sharded location of one partition's manifest (write side)."""
    return os.path.join(manifest_dir(out_dir),
                        f"s{part_id % MANIFEST_SHARDS:03d}",
                        f"part-{part_id:05d}.json")


def _scan_layout(out_dir: str):
    """-> (loose json paths by part_id, ledger paths in epoch order).
    Reads both the sharded layout and the flat legacy layout."""
    mdir = manifest_dir(out_dir)
    loose: dict[int, str] = {}
    ledgers: list[tuple[int, str]] = []
    if not os.path.isdir(mdir):
        return loose, []
    for entry in os.scandir(mdir):
        if entry.is_dir():
            for name in os.listdir(entry.path):
                m = _PART_RE.match(name)
                if m:
                    loose[int(m.group(1))] = os.path.join(entry.path, name)
            continue
        m = _PART_RE.match(entry.name)
        if m:
            loose[int(m.group(1))] = entry.path
            continue
        m = _LEDGER_RE.match(entry.name)
        if m:
            ledgers.append((int(m.group(1)), entry.path))
    ledgers.sort()
    return loose, [p for _, p in ledgers]


def committed_partitions(out_dir: str) -> set[int]:
    """Partition ids with a committed manifest: ledger rows + loose
    JSONs. Listing cost is O(shard dirs + ledgers + loose files since
    the last compaction), never O(total partitions ever committed) in
    one directory."""
    loose, ledgers = _scan_layout(out_dir)
    out = set(loose)
    for path in ledgers:
        out.update(
            pq.read_table(path, columns=["part_id"])
            .column("part_id").to_pylist())
    return out


def load_manifests(out_dir: str) -> list[dict]:
    """All manifest rows, ledger-then-loose so a partition re-committed
    after compaction is represented by its NEWER loose JSON."""
    loose, ledgers = _scan_layout(out_dir)
    rows: dict[int, dict] = {}
    for path in ledgers:
        for row in pq.read_table(path).to_pylist():
            row = {k: v for k, v in row.items() if v is not None}
            rows[int(row["part_id"])] = row
    for pid, path in loose.items():
        with open(path) as f:
            rows[pid] = json.load(f)
    return [rows[pid] for pid in sorted(rows)]


def compact_manifests(out_dir: str) -> str | None:
    """Consolidate every loose JSON manifest into one epoch-numbered
    parquet ledger and delete the consumed JSONs. Atomic (tmp +
    rename): a crash mid-compaction leaves either the old loose files
    or the ledger plus some already-deleted files — both resume
    correctly because committed_partitions unions ledgers and loose
    files. Must not run concurrently with a writing job. Returns the
    ledger path, or None when there is nothing to compact."""
    loose, ledgers = _scan_layout(out_dir)
    if not loose:
        return None
    rows = []
    for pid in sorted(loose):
        with open(loose[pid]) as f:
            rows.append(json.load(f))
    epoch = 1 + max(
        (int(_LEDGER_RE.match(os.path.basename(p)).group(1))
         for p in ledgers), default=-1)
    path = os.path.join(manifest_dir(out_dir),
                        f"ledger-{epoch:04d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows), tmp, compression="zstd")
    os.replace(tmp, path)
    for p in loose.values():
        os.unlink(p)
    return path


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
    for sub in ("extracted", "chunks"):
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

    # Lineage metrics + checksum are computed with Arrow kernels — the
    # manifest builder sits on the flagship's write path, so a Python
    # per-row loop here would cost O(partition rows) driver-side string
    # work per partition (~1-2 s at 1M-row partitions). The checksum is
    # byte-identical to md5("".join(u + "\0" + t + "\1")): each row is
    # joined to "u\0t\1" vectorized, then the concatenated rows are the
    # string array's values buffer, fed to md5 zero-copy per chunk.
    status = extracted.column("status")
    url_col, text_col = extracted.column("url"), extracted.column("text")
    # large_string (Ray/Arrow's >2 GiB-block variant) needs matching
    # large separator scalars; normalize both columns to one type
    big = (pa.types.is_large_string(url_col.type)
           or pa.types.is_large_string(text_col.type))
    st = pa.large_string() if big else pa.string()
    joined = pa.compute.binary_join_element_wise(
        url_col.cast(st), text_col.cast(st), pa.scalar("\0", st))
    joined = pa.compute.binary_join_element_wise(
        joined, pa.scalar("", st), pa.scalar("\1", st))
    # fail-loud on null url/text, like the Python loop this replaced
    # (null rows would otherwise silently contribute zero bytes and the
    # integrity checksum would under-cover the partition)
    if joined.null_count:
        raise ValueError(
            f"partition {part_id}: {joined.null_count} null url/text rows")
    h = hashlib.md5()
    chunks_iter = joined.chunks if isinstance(joined, pa.ChunkedArray) else [joined]
    for arr in chunks_iter:
        if len(arr) == 0:
            continue
        # offsets are int32 for string, int64 for large_string (which
        # Ray/Arrow produce for >2 GiB blocks) — reading the wrong width
        # would silently hash garbage, so dispatch on the array type
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1]
        h.update(memoryview(arr.buffers()[2])[int(offs[0]):int(offs[-1])])

    def _count(val: str) -> int:
        c = pa.compute.sum(
            pa.compute.cast(pa.compute.equal(status, val), pa.int64())).as_py()
        return int(c or 0)

    tb = pa.compute.sum(
        pa.compute.binary_length(extracted.column("text"))).as_py()
    manifest = {
        "part_id": int(part_id),
        "num_parts": int(num_parts) if num_parts is not None else None,
        "n_docs": extracted.num_rows,
        "n_ok": _count("ok"),
        "n_empty": _count("empty"),
        "n_error": _count("error"),
        "n_chunks": int(chunks.num_rows),
        "text_bytes": int(tb or 0),
        "checksum": h.hexdigest(),
    }
    if timing:
        # per-partition lineage metrics: when the write task started on
        # this partition and how long chunk/sort/write took — lets an
        # operator read tail latency and write-phase concurrency straight
        # off the manifest directory of a finished (or killed) run
        manifest.update(timing)
    commit_manifest(out_dir, part_id, manifest, durable=durable)
    return manifest


def commit_manifest(out_dir: str, part_id: int, manifest: dict,
                    durable: bool = False) -> str:
    """Commit one manifest row into its shard (tmp [+ fsync] + rename —
    the fsync, like the data files', is power-loss hardening and an
    opt-in; rename alone is kill-safe)."""
    mpath = manifest_path(out_dir, part_id)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        if durable:
            f.flush()
            os.fsync(f.fileno())
    os.replace(tmp, mpath)
    return mpath
