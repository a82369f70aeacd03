"""Flagship pipeline: pages parquet -> extracted/chunks parquet + manifests.

Ray-Data-first layout (SURVEY.md §3.4 entry point A):

    read_parquet(pages, columns=[url, html])        # prune at the read
      -> filter committed partitions (broadcast set, no shuffle)
      -> map_batches(extract_map_fn, task pool)     # html dropped here;
                                                    # stage cached per worker
      -> add part_id = crc32(url) % P               # stable, process-independent
         + shuffle_key (collision-free bucket map)
      -> repartition(P, keys=[shuffle_key])         # HASH shuffle, no sort
      -> map_batches(chunk + write_partition_atomic, whole blocks)
      -> manifest rows (tiny)

The ONE all-to-all exchange is the keyed hash repartition — it runs on
post-extraction rows (html already dropped, chunks not yet computed),
so the shuffle moves each text exactly once: (url, text, spans,
metrics). Chunking is recomputed after the shuffle inside the write
task (pure per-row function, so placement is free). Partitioning key is
url-hash throughout (host skew broken by design: a hot host's pages
spread uniformly over partitions). At 100 TB the same plan holds: P
scales with input size (`parts_for`), each partition commits
independently, and a killed job resumes from the committed-manifest set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydoc.hashing import PART_RULE, part_ids_for_urls
from raydoc.stages.extract_stage import ExtractStage, explode_chunks, extract_map_fn
from raydoc.state.manifest import committed_partitions, load_manifests, write_partition_atomic


def parts_for(
    n_rows: int,
    rows_per_part: int | None = None,
    min_parts: int = 8,
    total_bytes: int | None = None,
    bytes_per_part: int = 192 << 20,
    cpus: int | None = None,
) -> int:
    """Partition count for the checkpointed output.

    Partitions are sized by BYTES, not rows: each partition is one
    shuffle bucket, one write task, and one resume/commit unit, so what
    matters is how much data it holds. Row-based sizing scales P
    linearly with the corpus (measured at 1M docs/32 CPUs: the old
    4000-rows/part rule gave P=250 and 4.7k docs/s vs P=32 at 10.7k —
    and at 10^12 docs it would demand 2.5e8 partitions). ~128 MB of
    uncompressed input per partition keeps the write task's heap bounded
    (~0.5-1 GB peak: text + chunk explode + parquet encode) while P
    still grows linearly with DATA — a 100 TB corpus gets ~1.6M
    partitions, each an independent commit, which is exactly the
    resume granularity the north rule wants. (Bytes here are parquet
    row-group ``total_byte_size`` — uncompressed — so the target holds
    regardless of the input's codec.)

    ``cpus`` adds a CLUSTER-WIDTH FLOOR for small corpora: byte sizing
    alone gave P=8 at sf0.1 (100k docs, ~1 GB uncompressed) on 32 CPUs,
    capping the post-shuffle phase (chunk recompute + parquet write) at
    8-wide — measured 7.2k docs/s vs 9-12k at P=32 on the same input.
    The floor is min(cpus, n_rows // 1000) so it never manufactures
    micro-partitions, and it is inert exactly when byte sizing matters:
    any corpus big enough for bytes to demand more than ``cpus``
    partitions (>= cpus x 192 MB) is unaffected.

    ``rows_per_part`` remains as an explicit override for callers that
    want row-deterministic layouts (tests, tools)."""
    if rows_per_part is not None:
        return max(min_parts, (n_rows + rows_per_part - 1) // rows_per_part)
    if total_bytes:
        p = max(min_parts, (total_bytes + bytes_per_part - 1) // bytes_per_part)
        if cpus:
            p = max(p, min(int(cpus), n_rows // 1000))
        return p
    return max(min_parts, (n_rows + 31_999) // 32_000)


def default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for the extract stage.

    A FIXED pool sized to all cluster CPUs deadlocks the streaming
    executor: the actors pin every CPU and the upstream read task is
    backpressured forever (observed on 8 CPUs: ReadParquet
    "[backpressured:tasks]" with 8/8 CPUs held by idle actors). An
    autoscaling pool capped at cpus-1 always leaves headroom for the
    read/shuffle tasks. Ray requires an explicit ``concurrency`` for
    callable-class stages."""
    from raydoc.util import cpu_cap

    return (1, cpu_cap())


def batch_rows_for_bytes(
    pages_path: str,
    target_batch_bytes: int = 32 << 20,
    lo: int = 8,
    hi: int = 512,
) -> int:
    """Rows per extract batch sized by DATA, not a fixed row count.

    Ray's ``batch_size`` counts rows, but what bounds worker memory is
    bytes x concurrency: 128 rows of 5 MB Common-Crawl pages is a
    640 MB batch. Average row bytes come free from parquet metadata
    (no data read); clamp keeps tiny docs from producing huge batches
    and giant docs from starving the pipeline of parallelism.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(_os.path.join(pages_path, "*.parquet")))
        if _os.path.isdir(pages_path)
        else [pages_path]
    )
    rows = bytes_ = 0
    for f in files[:16]:  # metadata sample is enough for an average
        md = pq.read_metadata(f)
        rows += md.num_rows
        bytes_ += sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
    if rows == 0 or bytes_ == 0:
        return 128
    return int(min(hi, max(lo, target_batch_bytes // max(1, bytes_ // rows))))


# Fixed schema for the write stage's manifest-row output blocks: a write
# task whose partitions were ALL committed by a prior run (resume) emits
# zero rows, and an unpinned from_pylist([]) would make a zero-column
# block whose schema disagrees with its siblings'. (Ray's hash shuffle
# additionally passes EMPTY partitions through without invoking the UDF
# at all — a schemaless empty bundle it warns about on resume runs; that
# is harmless under the take_all() consumer here.)
MANIFEST_ROW_SCHEMA = pa.schema([
    ("part_id", pa.int64()),
    ("num_parts", pa.int64()),
    ("n_docs", pa.int64()),
    ("n_ok", pa.int64()),
    ("n_empty", pa.int64()),
    ("n_error", pa.int64()),
    ("n_chunks", pa.int64()),
    ("text_bytes", pa.int64()),
    ("checksum", pa.string()),
    ("t_start_unix", pa.float64()),
    ("wall_sec", pa.float64()),
])


def add_part_id(batch: pa.Table, num_parts: int) -> pa.Table:
    """Partition id per url — rule ``hashing.PART_RULE``, vectorized
    (r05: the per-row crc32 loop this replaced cost ~1 µs/url; the
    numpy kernel ~0.4 µs/url measured best-of-5 on 200k urls). The
    rule version is persisted in ``out_dir/_manifest/PART_RULE`` and
    checked on resume, so committed layouts never silently re-shard."""
    part = part_ids_for_urls(batch.column("url"), num_parts)
    return batch.append_column("part_id", pa.array(part))


def collision_free_shuffle_keys(num_parts: int) -> list[int]:
    """One int64 shuffle-key value per part_id, chosen so Ray's hash
    bucketing maps the P distinct keys onto P distinct buckets.

    Ray's hash shuffle buckets a key value v by ``hash((scalar,)) %
    num_partitions`` over the pyarrow scalar (ray.data._internal
    .arrow_ops.transform_pyarrow.hash_partition) — deterministic and
    PYTHONHASHSEED-independent for int64. Hashing only P distinct
    part_id values into P buckets leaves ~1/e of buckets empty and
    piles up to 4 partitions into one (measured: a 9s straggler write
    task vs 3.8s mean at sf0.1). Searching ~P·lnP candidate ints for a
    collision-free set costs microseconds and makes every bucket hold
    exactly one partition. CORRECTNESS never depends on this: the
    write task groups by part_id within whatever block it receives, so
    if a future Ray changes its hash the layout degrades to the old
    collision balance, nothing more.
    """
    found: dict[int, int] = {}
    v = 0
    cap = 1000 * num_parts
    while len(found) < num_parts and v < cap:
        b = hash((pa.scalar(v, pa.int64()),)) % num_parts
        if b not in found:
            found[b] = v
        v += 1
    if len(found) < num_parts:  # pathological hash: identity fallback
        return list(range(num_parts))
    return [found[b] for b in range(num_parts)]


def extract_dataset(
    pages_path: str,
    token_budget: int = 256,
    concurrency: int | None = None,
    batch_size: int | None = None,
):
    """pages parquet -> lazy Dataset of extracted rows (nested chunks).

    No shuffle, no materialization — the streaming executor pipelines
    read -> extract. Used by entry()/queries() and as the front half of
    the checkpointed pipeline. batch_size defaults to a byte-derived
    row count (``batch_rows_for_bytes``).
    """
    import ray.data as rd

    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    return _apply_extract(
        ds, pages_path, token_budget=token_budget, with_chunks=True,
        batch_size=batch_size, concurrency=concurrency,
    )


def _apply_extract(ds, pages_path, *, token_budget, with_chunks,
                   batch_size, concurrency):
    """Shared extract-stage dispatch: explicit ``concurrency`` => bounded
    actor pool (tests, co-tenancy); default => task pool with the stage
    cached per worker process, measured ~3x the actor pool for this
    cheap-state stage (see ``extract_map_fn``)."""
    bs = batch_size or batch_rows_for_bytes(pages_path)
    if concurrency is not None:
        return ds.map_batches(
            ExtractStage,
            batch_format="pyarrow",
            batch_size=bs,
            fn_constructor_kwargs={"token_budget": token_budget,
                                   "with_chunks": with_chunks},
            concurrency=concurrency,
        )
    return ds.map_batches(
        extract_map_fn(token_budget=token_budget, with_chunks=with_chunks),
        batch_format="pyarrow",
        batch_size=bs,
    )


def run_extract_pipeline(
    pages_path: str,
    out_dir: str,
    num_parts: int | None = None,
    token_budget: int = 256,
    batch_size: int | None = None,
    concurrency: int | None = None,
    rows_per_part: int | None = None,
    durable: bool = False,
    collect_stats: bool = False,
) -> dict:
    """Checkpointed, resumable flagship run. Returns a summary dict.

    Resume semantics (north rule): partitions listed in
    ``out_dir/_manifest`` are skipped entirely — their pages are
    filtered out right after the read, BEFORE any parse work.

    ``collect_stats=True`` adds the executed Dataset's
    ``stats()`` string to the summary (``stats_str``) for per-stage
    wall/CPU attribution (tools/stage_split.py).
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
    total_rows = total_bytes = 0
    for f in files:
        md = pq.read_metadata(f)
        total_rows += md.num_rows
        total_bytes += sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
    # Keyed (hash) repartition requires the hash shuffle strategy, and the
    # DataContext is captured when the dataset is CREATED — set it before
    # read_parquet, restore after execution.
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    prev_agg_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    prev_max_agg = ctx.max_hash_shuffle_aggregators
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # One aggregator actor per ~8 CPUs (min 2), each owning several
    # partitions, instead of Ray's default one-per-partition (up to 64):
    # 25 actor forks were most of the cold-start and their dispatch
    # overhead dragged steady state too (32 CPUs, cold/steady walls:
    # default 16.4/12.7 s -> cap 10.8/8.8 s; neutral at 8 CPUs). Scales
    # with the cluster, so a 1024-CPU cluster still gets 128 aggregators.
    import os as _os

    import ray as _ray

    # before ray.init (auto-init happens at execution) the best guess
    # for local-mode cluster size is the machine's CPU count — a
    # hardcoded small fallback would silently reintroduce the default
    # aggregator reservation on big machines
    _cpus = (
        _ray.cluster_resources().get("CPU", 8)
        if _ray.is_initialized()
        else (_os.cpu_count() or 8)
    )
    P = num_parts or parts_for(
        total_rows, rows_per_part=rows_per_part, total_bytes=total_bytes,
        cpus=int(_cpus),
    )
    ctx.max_hash_shuffle_aggregators = int(
        _os.environ.get("RAYDOC_MAX_AGG", 0)
    ) or max(2, int(_cpus) // 8)
    # Ray's default reserves (cluster_CPUs/2)/P CPUs per shuffle
    # aggregator — HALF the cluster held by actors that only buffer and
    # concat blocks, starving the extract tasks. On clusters of >=16
    # CPUs, 0.1 CPU per partition measures 9.8k vs 8.6k docs/s at
    # sf0.1/32 CPUs (and frees proportionally more CPU as the cluster
    # grows). On tiny clusters the default (~half) is the right share:
    # interleaved A/B at 8 CPUs measured the 0.1 override ~25% SLOWER —
    # with so few slots the aggregators need their reserved cores to
    # keep up with the map side.
    if _cpus >= 16:
        # 0.1/partition was measured at P≈cpus (sf0.1: P=25, 32 CPUs).
        # The reservation is PER PARTITION, so at P >> cpus it silently
        # eats the cluster (observed at sf1: P=250 reserved 25 of 32
        # CPUs and the executor backpressured shuffle ingestion to ONE
        # task, ~800 docs/s). Cap the TOTAL aggregator reservation at a
        # quarter of the cluster so P can grow with the data while the
        # map side keeps its cores.
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            min(0.1, (0.25 * _cpus) / P)

    done = committed_partitions(out_dir)
    # the resume filter is only correct under the SAME partitioning
    # rule AND partition count: hash(url) % P must mean the same thing
    # as in the run that committed the manifests. The rule version is a
    # marker file next to the manifests; a committed dir without one is
    # pre-r05 (crc32_v1) and cannot be resumed by this build.
    rule_path = _os.path.join(out_dir, "_manifest", "PART_RULE")
    if done:
        committed_rule = "crc32_v1"
        if _os.path.exists(rule_path):
            with open(rule_path) as f:
                committed_rule = f.read().strip()
        if committed_rule != PART_RULE:
            raise ValueError(
                f"resume partition-rule mismatch: {out_dir} was committed "
                f"under url-hash rule {committed_rule!r} but this build "
                f"partitions with {PART_RULE!r}; clear {out_dir} (or rerun "
                f"with the matching build) to proceed safely")
        for m in load_manifests(out_dir):
            mp = m.get("num_parts")
            if mp is not None and mp != P:
                raise ValueError(
                    f"resume partition-count mismatch: committed manifests "
                    f"used num_parts={mp} but this run derived {P}; pass "
                    f"num_parts={mp} (or clear {out_dir}) to resume safely"
                )
    else:
        _os.makedirs(_os.path.dirname(rule_path), exist_ok=True)
        with open(rule_path, "w") as f:
            f.write(PART_RULE)
    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    if done:
        # compute the part id inline for the resume filter only — a fresh
        # run never pays a pass over the html-heavy blocks. Vectorized
        # (r05): hash kernel + np.isin against the committed-part array.
        done_arr = np.fromiter(done, dtype=np.int64, count=len(done))

        def _not_done(b: pa.Table) -> pa.Table:
            pid = part_ids_for_urls(b.column("url"), P)
            return b.filter(pa.array(~np.isin(pid, done_arr)))

        ds = ds.map_batches(_not_done, batch_format="pyarrow")

    # Extract WITHOUT chunks: chunking is recomputed after the shuffle in
    # the write task, so the one all-to-all exchange moves (url, text,
    # spans, metrics) — not a second nested copy of every text.
    extracted = _apply_extract(
        ds, pages_path, token_budget=token_budget, with_chunks=False,
        batch_size=batch_size, concurrency=concurrency,
    )
    remap = np.asarray(collision_free_shuffle_keys(P), dtype=np.int64)

    def _add_keys(b: pa.Table) -> pa.Table:
        b = add_part_id(b.drop_columns(["chunks", "n_chunks"]), P)
        pids = b.column("part_id").to_numpy(zero_copy_only=False)
        return b.append_column("shuffle_key", pa.array(remap[pids]))

    extracted = extracted.map_batches(_add_keys, batch_format="pyarrow")

    # HASH repartition by shuffle_key (no sort): rows of one part_id land
    # in exactly one output block, and the collision-free key remapping
    # puts exactly ONE partition per bucket (see
    # collision_free_shuffle_keys). This replaced a sort-based
    # groupby().map_groups() that cost ~10x the extraction time at sf0.1,
    # and a 4*P-bucket variant whose extra hash-shuffle aggregator actors
    # cost more in cold-start than the skew they removed.
    extracted = extracted.repartition(num_blocks=P, keys=["shuffle_key"], sort=False)

    def _write_block(block: pa.Table) -> pa.Table:
        import time as _time

        from raydoc.extract.chunker import chunk_document_arrays as _chunk_arr
        from raydoc.stages.extract_stage import _CHUNK_TYPE

        rows_out = []
        pids = block.column("part_id").to_numpy(zero_copy_only=False)
        for part_id in sorted(set(pids.tolist())):
            _t0 = _time.time()
            grp = block.filter(pa.array(pids == part_id))
            # recompute chunks post-shuffle (pure per-row function),
            # slicing span fields straight out of the flattened Arrow
            # list<struct> — spans.to_pylist() was ~40% of this task's CPU
            spans_col = grp.column("spans").combine_chunks()
            texts = grp.column("text").to_pylist()
            statuses = grp.column("status").to_pylist()
            if spans_col.null_count:
                chunk_lists = [
                    _chunk_arr(
                        t,
                        [s["start"] for s in sp],
                        [s["end"] for s in sp],
                        [s["kind"] for s in sp],
                        [s["level"] for s in sp],
                        token_budget,
                    )
                    if st == "ok" and sp is not None
                    else []
                    for t, sp, st in zip(texts, spans_col.to_pylist(), statuses)
                ]
            else:
                offs = spans_col.offsets.to_numpy()
                flat = spans_col.values
                starts = flat.field("start").to_numpy(zero_copy_only=False)
                ends = flat.field("end").to_numpy(zero_copy_only=False)
                levels = flat.field("level").to_numpy(zero_copy_only=False)
                kinds = flat.field("kind").to_pylist()
                chunk_lists = [
                    _chunk_arr(
                        t,
                        starts[offs[i]:offs[i + 1]],
                        ends[offs[i]:offs[i + 1]],
                        kinds[offs[i]:offs[i + 1]],
                        levels[offs[i]:offs[i + 1]],
                        token_budget,
                    )
                    if st == "ok"
                    else []
                    for i, (t, st) in enumerate(zip(texts, statuses))
                ]
            grp = grp.append_column(
                "chunks", pa.array(chunk_lists, pa.list_(_CHUNK_TYPE))
            ).append_column(
                "n_chunks",
                pa.array([len(c) for c in chunk_lists], pa.int32()),
            )
            chunks = explode_chunks(grp)
            ext = grp.drop_columns(["chunks", "part_id", "shuffle_key"])
            rows_out.append(
                write_partition_atomic(
                    out_dir, int(part_id), ext, chunks,
                    num_parts=P, durable=durable,
                    timing={"t_start_unix": round(_t0, 3),
                            "wall_sec": round(_time.time() - _t0, 3)},
                )
            )
        return pa.Table.from_pylist(rows_out, schema=MANIFEST_ROW_SCHEMA)

    try:
        # Throttle write concurrency to ~8 tasks per 32 cores WHEN the
        # partition count allows more: the write task is
        # string/allocation heavy (chunk explode + sort + zstd parquet
        # encode over ~100 MB of text), and a full-width fleet of them
        # thrashes the allocator/memory bus — 32 concurrent writes ran
        # 26-87 s each where the SAME partition alone takes 3-5 s
        # (1M docs/32 CPUs: num_cpus=1 → 196 s job, =2 → 139 s, =4 →
        # 93 s, =8 → 112 s). num_cpus is the throttle: 4 CPUs per task
        # ≈ cpus/8 concurrent writes, and honestly reflects the task's
        # real footprint (>1 core of work plus ~1 GB heap). The gate is
        # PARTITION SIZE, not partition count: small partitions don't
        # thrash at any width (sf0.1, 25×24 MB partitions at width 25
        # → 12.2k docs/s; throttling those to width 8 DELAYS overlap
        # with the extract phase and loses ~20%), so the throttle only
        # engages when a partition carries >96 MB uncompressed input.
        # The reservation is num_cpus = cpus/8 — i.e. write WIDTH pinned
        # at ~8 concurrent tasks per 32-core node, where the thrash was
        # observed; clusters of <=8 cores never throttle. (An earlier
        # cpus/4 rule also throttled 8-core runs; re-measured at 8
        # CPUs it LOST throughput in both partition regimes — 1M docs:
        # 2.46k docs/s unthrottled vs 1.8-2.1k at width 4; sf0.3/P=10:
        # 3.43k vs 2.1k — because with so few cores the reservation
        # starves the extract stage it overlaps with, and 8 concurrent
        # ~1 GB writes don't thrash a whole node's allocator the way 32
        # do.) Env override for re-measuring on other hardware.
        _big_parts = total_bytes / max(1, P) > 96 << 20
        _wcpus = float(_os.environ.get("RAYDOC_WRITE_CPUS", 0)) or (
            max(1.0, _cpus / 8) if _big_parts else 1.0
        )
        manifests_ds = extracted.map_batches(
            _write_block, batch_format="pyarrow", batch_size=None,
            num_cpus=_wcpus,
        )
        new_manifests = manifests_ds.take_all()  # tiny: one row per partition
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = prev_agg_cpus
        ctx.max_hash_shuffle_aggregators = prev_max_agg

    all_manifests = load_manifests(out_dir)
    summary_extra = {}
    if collect_stats:
        summary_extra["stats_str"] = manifests_ds.stats()
    return {
        **summary_extra,
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
