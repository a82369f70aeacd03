"""Coarse-bucket vectorized grouped execution — the engine's rule for
grouped computation over DATA-SIZED key spaces (order ids, tokens,
users, hosts, grams).

``groupby(key).map_groups(fn)`` pays one Python call per DISTINCT KEY;
measured at 4.6 s for just 5k distinct texts (ops.dedup.exact_dedup),
i.e. minutes per million keys of pure dispatch — not executable at
10^9+ keys. The fix, applied uniformly here: hash the key tuple into a
coarse partition count P (cpu-scaled by default, caller-sized to
~total_bytes / 256 MB at scale), ``groupby("_part")`` (ONE shuffle,
same data movement as groupby(key)), then inside each bucket either

* ``bucketed_hash_apply`` — a pyarrow ``Table.group_by`` hash aggregate
  (C++-vectorized, all types, null-safe), for order-insensitive
  aggregates; or
* ``bucketed_sorted_apply`` — ONE vectorized sort by (keys..., order
  ...), run boundaries marked by adjacent compare on dictionary codes
  (null-safe), then segment-vectorized numpy kernels (``reduceat``,
  segmented cumsum, within-run ``arange``) over all runs at once.

Either way: P Python calls TOTAL for the whole dataset, not one per
key. Skew note (r04): for COMBINABLE aggregates a hot key is handled —
``relational.grouped_agg(salt=S)`` runs two-level aggregation (salt
column via ``with_salt`` -> partial per (key, salt) -> final merge), so
the hot key's rows spread over S buckets and the final merge sees at
most S rows per key. For ORDER-SENSITIVE appliers (windows, sessions)
a single key's run is irreducible by salting; ``bucketed_sorted_apply``
takes ``max_key_rows`` as a fail-loud guard on that assumption (use
``window.running_agg_carry``'s range-partitioned carry for the
prefix-combinable fns instead of raising).

The reference interprets its graphs single-threaded on pandas frames
(reference canvas.py:205-239) and has no grouped vocabulary to scale;
this module is the engine's 100-TB substitute for per-key dispatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "key_hash_u64",
    "with_bucket",
    "run_segments",
    "segment_ids",
    "bucketed_hash_apply",
    "bucketed_sorted_apply",
    "default_partitions",
]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def default_partitions(num_partitions: int | None = None) -> int:
    """cpu-scaled coarse partition count. At cluster scale callers
    should pass ~total_bytes / 256 MB instead so one bucket fits a
    worker's heap (each bucket is materialized whole by map_groups)."""
    if num_partitions:
        return int(num_partitions)
    from raydoc.util import cpu_cap

    return max(4, cpu_cap())


def _col_hash_u64(col) -> np.ndarray:
    """Per-value uint64 hash of one key column. Null-safe (nulls hash
    to 0 and co-locate), unsigned-safe (uint64 values > 2^63 never
    round-trip through int64). Integer/temporal/bool columns hash via
    a zero-copy-ish cast; strings/binary and everything else go
    through polars' vectorized xxhash (Rust kernel over the Arrow
    buffers, fixed seed so workers agree across processes — r04: the
    r03 crc32-per-row Python loop cost ~2.2 s per 2M string keys vs
    0.5 s here, and string keys are corpus-sized: tokens, canon urls).
    Bucketing only needs uniformity and same-value co-location, not
    cryptographic strength, so the hash function choice is physical
    and never observable in results."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_unsigned_integer(t):
        return pc.fill_null(col, 0).cast(pa.uint64()).to_numpy(
            zero_copy_only=False)
    if (pa.types.is_integer(t) or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t)):
        try:
            as_int = pc.fill_null(col, 0).cast(pa.int64())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            as_int = None
        if as_int is not None:
            return as_int.to_numpy(zero_copy_only=False).astype(np.uint64)
    try:
        import polars as pl

        h = pl.from_arrow(col).hash().to_numpy().astype(np.uint64)
        if col.null_count:
            h = h.copy()
            h[col.is_null().to_numpy(zero_copy_only=False)] = 0
        return h
    except Exception:
        # defensive fallback for types polars can't ingest
        return np.fromiter(
            (zlib.crc32(str(v).encode("utf-8", "surrogatepass"))
             if v is not None else 0
             for v in col.to_pylist()),
            dtype=np.uint64, count=len(col))


def key_hash_u64(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Combined uint64 hash of the key TUPLE per row (order-sensitive
    multiplicative mix; uint64 wraparound is intentional)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        with np.errstate(over="ignore"):
            h = h * _MIX + _col_hash_u64(batch.column(k))
    return h


def with_bucket(ds, keys: list[str], P: int, part_col: str = "_part"):
    """Append ``part_col`` = hash(key tuple) % P — the map-side of every
    coarse-bucket plan."""

    def _bucket(batch: pa.Table) -> pa.Table:
        part = (key_hash_u64(batch, keys) % np.uint64(P)).astype(np.int64)
        return batch.append_column(part_col, pa.array(part))

    return ds.map_batches(_bucket, batch_format="pyarrow")


def with_salt(ds, S: int, salt_col: str = "_salt"):
    """Append ``salt_col`` = row-position % S per batch — spreads a HOT
    KEY's rows over S distinct (key, salt) groups so a two-level
    combinable aggregation never funnels one key's full row set into
    one bucket. The assignment is batching-dependent, which is fine:
    callers only salt COMMUTATIVE partial aggregates, so the final
    merge is invariant to which salt a row drew."""
    if S < 1:
        raise ValueError(f"salt must be >= 1, got {S}")

    def _salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % S
        return batch.append_column(salt_col, pa.array(salt))

    return ds.map_batches(_salt, batch_format="pyarrow")


def run_segments(t: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) of the key runs of a table ALREADY SORTED by
    ``keys``. Null-safe: adjacent comparison happens on dictionary
    codes (nulls share code -1, so an all-null key forms one run).
    Empty-table safe: returns two empty arrays (ADVICE r02: the
    vectorized bucket fns must not die on a 0-row group)."""
    n = t.num_rows
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        col = t.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = pc.fill_null(
            col.dictionary_encode().indices, -1
        ).to_numpy(zero_copy_only=False)
        if n > 1:
            change |= codes[1:] != codes[:-1]
    starts = np.flatnonzero(np.concatenate(([True], change)))
    counts = np.diff(np.append(starts, n))
    return starts, counts


def segment_ids(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Dense 0..n_runs-1 segment id per ROW — feed to pandas' cython
    ``groupby(...).cum*/rolling`` kernels for the few segmented scans
    numpy can't express in one shot (cummin/cummax, rolling min/max)."""
    return np.repeat(np.arange(len(starts), dtype=np.int64), counts)


def _coalesce_typed(ds, batch_size: int = 16384):
    """Re-block a grouped output so every block carries the REAL output
    schema. Ray 2.49's sort-based ``groupby(part).map_groups`` emits a
    zero-COLUMN empty block for every sort partition holding none of
    the P distinct bucket ids (P << shuffle partitions by design here),
    and such blocks crash a downstream Acero ``Dataset.join`` ("No
    match ... for key field"). A batch_size-driven identity map absorbs
    empty blocks into its batcher (verified: typed blocks out, join
    green) at the cost of one linear re-batching pass. batch_size
    deliberately differs from map_groups' (None) so Ray never fuses
    the two stages (fusion would skip the re-batching)."""

    def _ident(b: pa.Table) -> pa.Table:
        return b

    return ds.map_batches(_ident, batch_format="pyarrow",
                          batch_size=batch_size)


def clique_pair_indices(starts: np.ndarray,
                        counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs (i, j), i < j, within every key run of a sorted
    bucket — the LSH "all pairs in a bucket" clique, fully vectorized
    (total = sum of C(L, 2) over runs; the quadratic blow-up of a hot
    bucket is inherent to LSH, not to this kernel — upstream plans keep
    buckets small by excluding degenerate docs)."""
    n = int(counts.sum())
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    row_in_run = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    reps = np.repeat(counts, counts) - row_in_run - 1
    total = int(reps.sum())
    ai = np.repeat(np.arange(n, dtype=np.int64), reps)
    out_start = np.cumsum(reps) - reps
    delta = np.arange(total, dtype=np.int64) - np.repeat(out_start, reps)
    bi = np.repeat(np.arange(1, n + 1, dtype=np.int64), reps) + delta
    return ai, bi


def capped_pair_indices(starts: np.ndarray, counts: np.ndarray,
                        cap: int) -> tuple[np.ndarray, np.ndarray]:
    """``clique_pair_indices`` with a per-run size cap (r04): runs of
    length L <= cap emit the full C(L, 2) clique; longer runs emit
    STAR pairs — the run's FIRST row (its minimum sort key) paired
    with every other member, L - 1 pairs. Connectivity within the run
    is preserved, so connected-components / dedup-victim logic
    downstream sees the same clusters for genuinely-duplicate runs,
    while a mass-duplicated boilerplate bucket (10^5+ web pages
    sharing one LSH band hash is a REALISTIC Common-Crawl cluster)
    costs linear, not quadratic, candidate pairs: a 213k-doc bucket is
    213k-1 star pairs instead of 22.6e9 (169 GiB of int64 indices —
    the measured failure this kernel fixes). Tradeoff, documented: a
    non-duplicate pair that collides into an oversized bucket is only
    discovered through its star center, so downstream
    threshold-filtering may drop some true near-dup pairs whose star
    pair fails the estimate — acceptable for dedup (oversized buckets
    are overwhelmingly true mass-dups), wrong for exact pair
    enumeration, hence opt-in.

    Unlike ``clique_pair_indices`` this does not assume (starts,
    counts) tile the whole table, so it can split runs into
    small/large subsets internally."""

    def _cliques(s: np.ndarray, c: np.ndarray):
        tot = int(c.sum())
        if tot == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        first_out = np.cumsum(c) - c
        rid = np.arange(tot, dtype=np.int64) - np.repeat(first_out, c)
        abs_pos = np.repeat(s, c) + rid
        reps = np.repeat(c, c) - rid - 1
        npairs = int(reps.sum())
        ai = np.repeat(abs_pos, reps)
        out_start = np.cumsum(reps) - reps
        delta = np.arange(npairs, dtype=np.int64) - np.repeat(out_start, reps)
        bi = np.repeat(abs_pos + 1, reps) + delta
        return ai, bi

    starts = np.asarray(starts, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    small = counts <= cap
    ai, bi = _cliques(starts[small], counts[small])
    sb, cb = starts[~small], counts[~small]
    if len(sb) == 0:
        return ai, bi
    m = cb - 1
    tot = int(m.sum())
    centers = np.repeat(sb, m)
    out_start = np.cumsum(m) - m
    delta = np.arange(tot, dtype=np.int64) - np.repeat(out_start, m)
    others = centers + 1 + delta
    return (np.concatenate([ai, centers]), np.concatenate([bi, others]))


# pair-expansion gathers run in fixed-size chunks with PREALLOCATED
# buffers. The naive form — `mat[ai]` over hundreds of thousands of
# pair indices — allocates a fresh ~0.5 GB array per call, and under
# full-width concurrency (32 tasks each faulting fresh mmap pages) one
# such gather was MEASURED at 103 s/task vs 0.05 s standalone; 16k-row
# chunks reusing one buffer bring it to ~1 s/task. The chunk size keeps
# each buffer ~8 MB (cache-friendly, small-alloc territory).
_PAIR_CHUNK = 16384


def pair_cosine(unit: np.ndarray, ai: np.ndarray,
                bi: np.ndarray) -> np.ndarray:
    """Rowwise dot products unit[ai] . unit[bi] (cosines when rows are
    unit-normalized), chunked-preallocated (see _PAIR_CHUNK note)."""
    n, d = len(ai), unit.shape[1]
    out = np.empty(n)
    a = np.empty((min(_PAIR_CHUNK, n), d), dtype=unit.dtype)
    b = np.empty_like(a)
    m_ = np.empty_like(a)
    for off in range(0, n, _PAIR_CHUNK):
        m = min(_PAIR_CHUNK, n - off)
        np.take(unit, ai[off:off + m], axis=0, out=a[:m])
        np.take(unit, bi[off:off + m], axis=0, out=b[:m])
        np.multiply(a[:m], b[:m], out=m_[:m])
        out[off:off + m] = m_[:m].sum(axis=1)
    return out


def pair_match_fraction(sigs: np.ndarray, ai: np.ndarray,
                        bi: np.ndarray) -> np.ndarray:
    """Per-pair fraction of equal positions of sigs[ai] vs sigs[bi]
    (the MinHash jaccard estimate), chunked-preallocated (see
    _PAIR_CHUNK note). Integer match counts divide exactly, so values
    are bit-identical to a whole-array bool mean."""
    n, d = len(ai), sigs.shape[1]
    out = np.empty(n)
    a = np.empty((min(_PAIR_CHUNK, n), d), dtype=sigs.dtype)
    b = np.empty_like(a)
    e = np.empty(a.shape, dtype=bool)
    for off in range(0, n, _PAIR_CHUNK):
        m = min(_PAIR_CHUNK, n - off)
        np.take(sigs, ai[off:off + m], axis=0, out=a[:m])
        np.take(sigs, bi[off:off + m], axis=0, out=b[:m])
        np.equal(a[:m], b[:m], out=e[:m])
        out[off:off + m] = e[:m].sum(axis=1) / d
    return out


def popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — hamming distances over
    simhash xors without a Python loop."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        x *= np.uint64(0x0101010101010101)
    return (x >> np.uint64(56)).astype(np.int64)


def bucketed_hash_apply(ds, keys: list[str], fn,
                        num_partitions: int | None = None,
                        part_col: str = "_part"):
    """Order-INSENSITIVE grouped apply: fn(bucket_table) -> table, where
    the bucket holds every row of ~1/P of the key space (the fn
    typically runs a pyarrow ``group_by`` hash aggregate inside). P
    Python calls total."""
    P = default_partitions(num_partitions)

    def _apply(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns([part_col]))

    return _coalesce_typed(
        with_bucket(ds, keys, P, part_col)
        .groupby(part_col)
        .map_groups(_apply, batch_format="pyarrow"))


def bucketed_sorted_apply(ds, keys: list[str], sort_keys, fn,
                          num_partitions: int | None = None,
                          part_col: str = "_part",
                          max_key_rows: int | None = None):
    """Order-SENSITIVE grouped apply: each bucket is sorted ONCE by
    ``sort_keys`` (must lead with ``keys``; pyarrow (col, order) pairs),
    then fn(sorted_table, run_starts, run_counts) -> table runs
    segment-vectorized kernels over all key runs at once.

    ``max_key_rows``: fail-loud guard on the one-key-fits-a-worker
    assumption — an order-sensitive run cannot be salted, so a key
    whose run exceeds the cap raises (naming the key) instead of
    silently OOM-ing a worker at scale. Callers with a prefix-
    combinable kernel should route pathological keys through
    ``window.running_agg_carry``-style range partitioning instead."""
    P = default_partitions(num_partitions)

    def _apply(group: pa.Table) -> pa.Table:
        g = group.drop_columns([part_col])
        if g.num_rows:
            g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        starts, counts = run_segments(g, keys)
        if max_key_rows is not None and len(counts) \
                and counts.max() > max_key_rows:
            worst = int(np.argmax(counts))
            key_vals = {k: g.column(k)[int(starts[worst])].as_py()
                        for k in keys}
            raise ValueError(
                f"bucketed_sorted_apply: key {key_vals} has "
                f"{int(counts[worst])} rows, over max_key_rows="
                f"{max_key_rows}; this key's ordered run exceeds the "
                "one-key-fits-a-worker assumption — range-partition it "
                "(window.running_agg_carry pattern) or raise the cap")
        return fn(g, starts, counts)

    return _coalesce_typed(
        with_bucket(ds, keys, P, part_col)
        .groupby(part_col)
        .map_groups(_apply, batch_format="pyarrow"))
