"""Relational layer: joins, grouped aggregates, top-k, distinct, union.

The reference has only degenerate forms of these — value-bindings as
broadcast scalar joins (/root/reference/agent/component/base.py:419-444),
``pd.concat`` unions (canvas.py:247,277), exact dedup on content
(base.py:474,509), per-connector top_n limits (SURVEY.md §2.5). The
engine provides the full vocabulary, scale-first:

* small side  -> broadcast join: ``ray.put`` the lookup table ONCE, every
  map_batches task reads it zero-copy from the object store — no shuffle.
* big x big   -> ``Dataset.join`` (Ray's hash-shuffle join) with an
  explicit partition count.
* aggregates  -> per-batch partial combine inside map_batches, then a
  small groupby over (key, partials) — the shuffle moves one row per
  (batch, key), not one per input row.
* top-k       -> per-batch local top-k, then a single small sort+limit.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "broadcast_join",
    "shuffle_join",
    "broadcast_semi_join",
    "shuffle_semi_join",
    "semi_join",
    "grouped_agg",
    "grouped_count_distinct",
    "grouped_concat",
    "grouped_quantile",
    "top_k",
    "group_top_k",
    "distinct_on",
    "union_all",
    "nonempty_batches",
]


def nonempty_batches(fn):
    """Wrap a map_batches UDF so it yields NOTHING for empty results
    instead of returning a 0-row table.

    Ray Data (2.49) never invokes map_batches UDFs on 0-row blocks: an
    empty block created by an upstream filter keeps its PRE-transform
    schema while sailing untouched past every later map_batches /
    select_columns, and when such a stale-schema empty block meets a
    hash-shuffle consumer (``Dataset.join``, groupby) next to live
    blocks with the post-transform schema, Acero fails with "No match
    or multiple matches for key field". Yielding nothing means the
    empty block is never created, so every block in the stream carries
    the real schema. Use this on ANY UDF that can filter a batch to
    zero rows when further transforms follow it.

    Limitation: if every block is dropped (a legitimately empty query
    result) the dataset ends with NO blocks and its schema is unknown
    — ``to_pandas()`` yields a zero-column frame and ``select_columns``
    fails. A caller whose result can be legitimately empty should
    anchor the output schema by unioning with an explicit empty table
    of the final schema as the last step.
    """

    def _gen(batch):
        out = fn(batch)
        if out.num_rows:
            yield out

    return _gen

_AGG_FUNCS = {"sum", "count", "mean", "min", "max", "std"}


class _Joiner:
    """Broadcast-join probe: index built once per worker PROCESS (cached
    in ``_BCAST_CACHE``), not per batch. Duplicate right keys multiply
    matching left rows (SQL join semantics) via a sorted-run index
    probed with ``pc.index_in`` + ``np.repeat`` — both the unique and
    the duplicate case are fully vectorized, no per-row Python."""

    def __init__(self, ref, left_key: str, right_key: str, how: str) -> None:
        import numpy as np
        import ray

        tbl: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.how = how
        self.left_key = left_key
        self.tbl = tbl.combine_chunks()
        key_arr = self.tbl.column(right_key).combine_chunks()
        n = len(key_arr)
        n_unique = len(pc.unique(key_arr))
        self.has_dups = n_unique != n
        if self.has_dups:
            # sorted-run index: right row ids ordered by key, plus the
            # (start, count) of each distinct key's run — O(n log n)
            # once per worker, vectorized probes forever after
            sort_idx = pc.sort_indices(key_arr)
            self.sorted_rows = sort_idx.to_numpy(zero_copy_only=False)
            skeys = key_arr.take(sort_idx)
            if isinstance(skeys, pa.ChunkedArray):
                skeys = skeys.combine_chunks()
            if n > 1:
                bounds = np.flatnonzero(
                    pc.not_equal(skeys.slice(1), skeys.slice(0, n - 1))
                    .to_numpy(zero_copy_only=False)
                )
                starts = np.concatenate(([0], bounds + 1))
            else:
                starts = np.zeros(1, dtype=np.int64)
            self.starts = starts
            self.counts = np.diff(np.concatenate((starts, [n])))
            self.key_arr = skeys.take(pa.array(starts, pa.int64()))
        else:
            self.key_arr = key_arr
        self.other_cols = [c for c in self.tbl.column_names if c != right_key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        if self.has_dups:
            pos = pc.index_in(
                batch.column(self.left_key).combine_chunks(),
                value_set=self.key_arr,
            )
            posn = pos.fill_null(-1).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            valid = posn >= 0
            # per left row: its run (start,count); unmatched rows keep
            # one output row (left) or zero (inner), order preserved
            counts = np.where(valid, self.counts[np.where(valid, posn, 0)],
                              1 if self.how == "left" else 0)
            starts = np.where(valid, self.starts[np.where(valid, posn, 0)], 0)
            total = int(counts.sum())
            row_out_start = np.cumsum(counts) - counts
            delta = np.arange(total) - np.repeat(row_out_start, counts)
            sorted_pos = np.repeat(starts, counts) + delta
            idx = np.where(np.repeat(valid, counts),
                           self.sorted_rows[sorted_pos], -1)
            batch = batch.take(
                pa.array(np.repeat(np.arange(batch.num_rows), counts),
                         pa.int64())
            )
        else:
            pos = pc.index_in(
                batch.column(self.left_key).combine_chunks(),
                value_set=self.key_arr,
            )
            idx = pos.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            if self.how == "inner":
                sel = idx >= 0
                batch = batch.filter(pa.array(sel))
                idx = idx[sel]
        take = pa.array(np.where(idx >= 0, idx, 0), type=pa.int64())
        null_mask = pa.array(idx < 0)
        for c in self.other_cols:
            col = self.tbl.column(c).take(take)
            if self.how == "left":
                col = pc.if_else(null_mask, pa.nulls(len(idx), col.type), col)
            batch = batch.append_column(c, col)
        return batch


# Per-worker-process LRU for broadcast lookup state: ray workers
# persist across tasks, so task-pool stages get once-per-worker setup
# without an actor pool's min-actor CPU pinning (an actor pool per join
# deadlocks small clusters when a query stacks several joins, and
# measured ~3x slower than tasks for the extract stage). The trade vs
# torn-down actors is memory retention: each entry pins one
# materialized small table until evicted, so the LRU is small (8) and
# evicts oldest-used first rather than clearing wholesale (a clear-all
# would also evict entries a concurrently executing dataset still
# probes with, forcing rebuilds mid-job).
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8


def _bcast_cached(key, make):
    obj = _BCAST_CACHE.pop(key, None)
    if obj is None:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        obj = make()
    _BCAST_CACHE[key] = obj  # reinsert = move to MRU end
    return obj


def broadcast_join(
    ds,
    small: pa.Table,
    left_on: str,
    right_on: str,
    how: str = "inner",
    columns: list[str] | None = None,
):
    """Join a Dataset against a SMALL in-memory table without a shuffle.

    The small table is ``ray.put`` once; each task fetches the shared
    object-store copy (never re-shipped per batch) and builds its
    per-process hash index lazily (see ``_BCAST_CACHE``). ``how`` in
    {"inner", "left"}.
    """
    import ray

    if columns is not None:
        keep = [right_on] + [c for c in columns if c != right_on]
        small = small.select(keep)
    small_ref = ray.put(small)
    cache_key = (small_ref.hex(), left_on, right_on, how)

    def _join_batch(batch: pa.Table) -> pa.Table:
        joiner = _bcast_cached(
            cache_key, lambda: _Joiner(small_ref, left_on, right_on, how)
        )
        return joiner(batch)

    # inner joins filter: never emit 0-row blocks (stale-schema hazard)
    return ds.map_batches(nonempty_batches(_join_batch), batch_format="pyarrow")


def _cpu_cap() -> int:
    from raydoc.util import cpu_cap

    return cpu_cap()


def shuffle_join(
    left,
    right,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Big x big hash-shuffle join via ``Dataset.join`` with an explicit
    partition count.

    Each join partition costs an aggregator actor, so the count must
    track DATA size, not CPU count (measured at sf0.1/32 CPUs: 8
    partitions -> 4.7 s, 64 partitions -> 10.9 s for the same join). The
    default suits up to a few GB; at real scale pass
    ~total_bytes / 256 MB.

    Pitfall (Ray 2.49): join output contains SCHEMALESS empty blocks
    for empty partitions, and map_batches skips empty blocks, so
    feeding one join's output into another join's key resolution can
    fail. Chain at most one Dataset.join per branch; for multi-hop
    attach use the tag-union-groupby pattern (ops.dedup
    ngram_jaccard_pairs, ops.window.asof_join). grouped_agg/groupby
    consumers are unaffected."""
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions or max(4, _cpu_cap() // 4),
        on=on,
        right_on=right_on,
    )


def broadcast_semi_join(
    ds,
    keys: pa.Table,
    left_on: str,
    right_on: str,
    anti: bool = False,
):
    """Semi/anti join against a SMALL key table without a shuffle
    (EXISTS / NOT EXISTS — the relational form of the reference's
    value-binding lookups, base.py:419-444).

    The DISTINCT key set is ``ray.put`` once and each task filters its
    batch by a vectorized ``pc.is_in`` membership probe (key array
    cached per worker process) — no row multiplication, no all-to-all.
    Assumption: the deduped key set fits in a worker's heap; use
    ``shuffle_semi_join`` when it doesn't.
    """
    import ray

    keys = keys.select([right_on])
    keys_ref = ray.put(keys)
    cache_key = (keys_ref.hex(), right_on, "semi")

    def _load_keys():
        tbl: pa.Table = ray.get(keys_ref)
        return pc.unique(tbl.column(right_on).combine_chunks())

    def _member_batch(batch: pa.Table) -> pa.Table:
        key_arr = _bcast_cached(cache_key, _load_keys)
        mask = pc.is_in(batch.column(left_on).combine_chunks(), value_set=key_arr)
        mask = pc.fill_null(mask, False)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(nonempty_batches(_member_batch), batch_format="pyarrow")


def shuffle_semi_join(
    left,
    right,
    left_on: str,
    right_on: str,
    anti: bool = False,
    num_partitions: int | None = None,
):
    """Big x big semi/anti join: dedup the right side to its DISTINCT
    keys (so the shuffle moves one row per key and the join cannot
    multiply left rows), stamp a presence marker, left-outer
    ``Dataset.join``, then keep matched (semi) or unmatched (anti) rows.
    """
    import numpy as np

    left_cols = list(left.schema().names)

    def _mark(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                right_on: batch.column(right_on),
                "__present": pa.array(
                    np.ones(batch.num_rows, dtype=np.int8), pa.int8()
                ),
            }
        )

    keys = distinct_on(
        right.select_columns([right_on]), right_on, bucketed=True,
        num_partitions=num_partitions,  # ADVICE r02: one knob end to end
    ).map_batches(_mark, batch_format="pyarrow")
    joined = left.join(
        keys,
        join_type="left_outer",
        num_partitions=num_partitions or max(4, _cpu_cap() // 4),
        on=(left_on,),
        right_on=(right_on,),
    )

    def _keep(batch: pa.Table) -> pa.Table:
        present = pc.is_valid(batch.column("__present"))
        mask = pc.invert(present) if anti else present
        return batch.filter(mask).select(left_cols)

    return joined.map_batches(_keep, batch_format="pyarrow")


def semi_join(
    left,
    right,
    left_on: str,
    right_on: str,
    anti: bool = False,
    broadcast_cap: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Semi/anti join where the RIGHT side is a Dataset whose size is
    unknown up front (e.g. LSH candidate ids). Never collects right-side
    VALUES on the driver:

    * right row count <= ``broadcast_cap``: the right side's Arrow
      blocks stay in the object store; each worker fetches the block
      refs once (per-process LRU cache), builds the distinct key array,
      and filters its batches with a vectorized ``pc.is_in`` — a true
      broadcast (one copy in the object store, zero driver memory).
    * larger: fall through to ``shuffle_semi_join`` (distinct right
      keys + presence-marker left-outer ``Dataset.join``).

    The right side is materialized to make its count metadata-cheap and
    its blocks addressable; at ``broadcast_cap`` x int64 that is MBs,
    and above the cap the shuffle path only needs it once.
    """
    import ray

    right_keys = right.select_columns([right_on]).materialize()
    if right_keys.count() > broadcast_cap:
        return shuffle_semi_join(left, right_keys, left_on, right_on,
                                 anti=anti, num_partitions=num_partitions)

    refs = list(right_keys.to_arrow_refs())
    cache_key = tuple(r.hex() for r in refs) + (right_on, "semi_ds")

    def _load_keys():
        tbls = [t for t in ray.get(list(refs)) if t.num_rows]
        if not tbls:
            return None
        col = pa.concat_arrays(
            [c for t in tbls for c in t.column(right_on).chunks]
        )
        return pc.unique(col)

    def _member(batch: pa.Table) -> pa.Table:
        key_arr = _bcast_cached(cache_key, _load_keys)
        if key_arr is None:
            return batch if anti else batch.slice(0, 0)
        mask = pc.is_in(batch.column(left_on).combine_chunks(), value_set=key_arr)
        mask = pc.fill_null(mask, False)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return left.map_batches(nonempty_batches(_member), batch_format="pyarrow")


def grouped_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_partitions: int | None = None,
    salt: int | None = None,
):
    """Grouped aggregation with EXPLICIT output names and partial
    pre-aggregation.

    ``aggs``: out_name -> (fn, column), fn in {sum,count,mean,min,max}.
    Phase 1 (map_batches) collapses each batch to one row per key with
    partial sums/counts/mins/maxs; phase 2 hash-buckets the partials
    into a coarse partition count and finalizes each bucket with ONE
    pyarrow ``group_by`` hash aggregate (C++-vectorized) — P Python
    calls total, never one per key, because callers group by
    corpus-sized keys (q3/q18: l_orderkey; keyword_topn_global: token).
    mean = final sum/count (exact integer-free division done once at
    the end). ``num_partitions``: size to ~partial_bytes/256 MB at
    scale (ops.bucketing.default_partitions).

    ``salt`` (r04, hot-key skew): a single pathological key (one hot
    host is a realistic CC case) otherwise funnels one partial row per
    BATCH it appears in into one finalize bucket — ~n_blocks rows at
    10^12-doc scale. With ``salt=S`` the RAW rows are salted (row
    position % S per batch, so a hot key's mass provably cycles
    through every salt), partials aggregate per (keys, _salt), a
    level-1 bucket pass combines them still in mergeable partial form,
    and only then does the per-key final merge — which now sees AT
    MOST S rows per key, whatever the skew.
    Every agg here is commutative-combinable, so the result is
    bit-identical to the unsalted plan (tested vs DuckDB at one key
    holding 50% of 1M rows). Cost: one extra small shuffle over
    combined partials; leave unset when no key dominates."""
    for name, (fn, _col) in aggs.items():
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported agg {fn} for {name}")

    # partial-aggregation spec shared by every batch (dedup'd): pyarrow
    # names outputs "<col>_<fn>"
    spec: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    sq_cols: set[str] = set()  # std needs a sum-of-squares partial
    for _name, (fn, col) in aggs.items():
        wanted = {"sum": [("sum", col)], "count": [("count", col)],
                  "mean": [("sum", col), ("count", col)],
                  "min": [("min", col)], "max": [("max", col)],
                  "std": [("sum", col), ("count", col),
                          ("sum", f"{col}__sq")]}[fn]
        if fn == "std":
            sq_cols.add(col)
        for f, c in wanted:
            if (f, c) not in seen:
                spec.append((c, f))
                seen.add((f, c))

    # salt the RAW rows, before the per-batch partial, and keep _salt a
    # partial-aggregation key: salting the 1-row-per-key PARTIALS would
    # stride-alias (a hot key's partial sits at a near-constant batch
    # position, drawing one constant salt — review r04); raw row
    # positions cycle through every salt within each batch, so the hot
    # key's mass provably spreads over all S (key, salt) groups
    salted = bool(salt and salt > 1)
    pkeys = keys + ["_salt"] if salted else keys
    if salted:
        from raydoc.ops.bucketing import with_salt

        ds = with_salt(ds, salt)

    def _partial(batch: pa.Table) -> pa.Table:
        # works for zero-row batches too (empty table, correct schema)
        for c in sq_cols:
            batch = batch.append_column(
                f"{c}__sq", pc.multiply(batch.column(c), batch.column(c))
            )
        return batch.group_by(pkeys).aggregate(spec)

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    # merge spec over the partial columns: pyarrow names the outputs
    # "<partial_col>_<fn>" again, e.g. l_quantity_sum -> l_quantity_sum_sum
    spec2: list[tuple[str, str]] = []
    seen2: set[str] = set()
    for c, f in spec:
        pname = f"{c}_{f}"
        if pname not in seen2:
            spec2.append((pname, {"count": "sum"}.get(f, f)))
            seen2.add(pname)

    def _finalize_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(spec2)
        out: dict[str, pa.ChunkedArray | pa.Array] = {
            k: g.column(k) for k in keys
        }
        for name, (fn, col) in aggs.items():
            if fn == "sum":
                v = g.column(f"{col}_sum_sum")
            elif fn == "count":
                v = g.column(f"{col}_count_sum")
            elif fn == "mean":
                s = pc.cast(g.column(f"{col}_sum_sum"), pa.float64())
                c = pc.cast(g.column(f"{col}_count_sum"), pa.float64())
                nz = pc.max_element_wise(c, 1.0)
                v = pc.if_else(pc.equal(c, 0.0),
                               pa.nulls(g.num_rows, pa.float64()),
                               pc.divide(s, nz))
            elif fn == "min":
                v = g.column(f"{col}_min_min")
            elif fn == "std":
                s = pc.cast(g.column(f"{col}_sum_sum"), pa.float64()
                            ).to_numpy(zero_copy_only=False)
                sq = pc.cast(g.column(f"{col}__sq_sum_sum"), pa.float64()
                             ).to_numpy(zero_copy_only=False)
                c = pc.cast(g.column(f"{col}_count_sum"), pa.float64()
                            ).to_numpy(zero_copy_only=False)
                with np.errstate(invalid="ignore", divide="ignore"):
                    var = np.maximum(sq / c - (s / c) ** 2, 0.0)
                    var = np.where(c > 0, var, np.nan)
                v = pa.array(np.sqrt(var), pa.float64(), from_pandas=True)
            else:
                v = g.column(f"{col}_max_max")
            out[name] = v
        return pa.Table.from_pydict(out)

    from raydoc.ops.bucketing import bucketed_hash_apply

    if salted:
        # level 1: combine partials per (key, salt) — same mergeable
        # partial schema out, so level 2 is the ordinary finalize
        def _combine_bucket(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["_salt"])
            g = t.group_by(keys).aggregate(spec2)
            ren = {f"{pn}_{f}": pn for pn, f in spec2}
            return g.rename_columns([ren.get(c, c) for c in g.column_names])

        partial = bucketed_hash_apply(
            partial, keys + ["_salt"], _combine_bucket,
            num_partitions=num_partitions)

    return bucketed_hash_apply(partial, keys, _finalize_bucket,
                               num_partitions=num_partitions)


def grouped_count_distinct(ds, keys: list[str], col: str,
                           out_col: str = "ndv",
                           num_partitions: int | None = None):
    """Exact COUNT(DISTINCT col) per key group (SQL semantics: nulls
    are not counted as a distinct value).

    Two-phase: per-batch dedup of (keys, col) inside ``map_batches``
    (so the shuffle moves one row per distinct pair per batch, not one
    per input row), then the pairs hash-bucket by key and each bucket
    runs ONE pyarrow ``count_distinct`` hash aggregate — P Python calls
    total even at vocabulary-sized key spaces. This is the exact
    counterpart of ``ops.sketch.grouped_approx_ndv`` — use the sketch
    when the distinct-pair set itself is too large to shuffle.
    """
    cols = keys + [col]

    def _local_distinct(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def _bucket_ndv(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([
            (col, "count_distinct", pc.CountOptions(mode="only_valid"))
        ])
        return g.rename_columns(keys + [out_col])

    from raydoc.ops.bucketing import bucketed_hash_apply

    partial = ds.map_batches(_local_distinct, batch_format="pyarrow")
    return bucketed_hash_apply(partial, keys, _bucket_ndv,
                               num_partitions=num_partitions)


def grouped_quantile(ds, keys: list[str], col: str, qs: dict[str, float],
                     num_partitions: int | None = None):
    """Exact per-group continuous quantiles (linear interpolation at
    rank q*(n-1) — DuckDB's quantile_cont semantics). Quantiles aren't
    partial-aggregable exactly, so this is the one aggregate that
    shuffles full groups; use the sketch path when groups don't fit.
    ``qs``: out_name -> quantile in [0, 1].

    Coarse-bucket plan: ONE sort per bucket by (keys..., col), then all
    groups' quantiles come from vectorized gathers at
    ``run_start + floor(q*(n_valid-1))`` — P Python calls total, so a
    data-sized key space (per-host latency quantiles at CC scale) pays
    no per-key dispatch. NaN values sort as nulls do (excluded)."""
    from raydoc.ops.bucketing import bucketed_sorted_apply

    sort_keys = [(k, "ascending") for k in keys] + [(col, "ascending")]

    def _q_bucket(t: pa.Table, starts: np.ndarray,
                  counts: np.ndarray) -> pa.Table:
        out: dict[str, object] = {k: t.column(k).take(pa.array(starts))
                                  for k in keys}
        n_runs = len(starts)
        vals = pc.cast(t.column(col), pa.float64()).to_numpy(
            zero_copy_only=False)
        # nulls and NaNs sort to the run's tail (Arrow: NaN after all
        # numbers incl. inf, nulls last) -> the non-NaN head is contiguous
        valid = ~np.isnan(vals) if len(vals) else np.empty(0, bool)
        nv = (np.add.reduceat(valid.astype(np.int64), starts)
              if n_runs else np.empty(0, np.int64))
        empty = nv == 0
        safe_n = np.maximum(nv, 1)
        for name, q in qs.items():
            pos = q * (safe_n - 1)
            lo = pos.astype(np.int64)
            hi = np.minimum(lo + 1, safe_n - 1)
            frac = pos - lo
            v_lo = vals[starts + lo] if n_runs else np.empty(0)
            v_hi = vals[starts + hi] if n_runs else np.empty(0)
            res = v_lo + (v_hi - v_lo) * frac
            res = np.where(empty, np.nan, res)
            out[name] = pa.array(res, pa.float64(), from_pandas=True)
        return pa.Table.from_pydict(out)

    return bucketed_sorted_apply(ds, keys, sort_keys, _q_bucket,
                                 num_partitions=num_partitions)


def top_k(ds, key: str, k: int, descending: bool = True, tiebreak: str | None = None):
    """Global top-k without a global sort: each batch keeps its local
    top-k (vectorized sort+slice), then ONE small final sort+limit over
    ≤ k*num_batches rows."""
    order = "descending" if descending else "ascending"
    sort_keys = [(key, order)] + ([(tiebreak, "ascending")] if tiebreak else [])

    def _local(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx.slice(0, k))

    pruned = ds.map_batches(_local, batch_format="pyarrow")
    cols = [key] + ([tiebreak] if tiebreak else [])
    sorted_ds = pruned.sort(cols, descending=[descending] + [False] * (len(cols) - 1))
    return sorted_ds.limit(k)


def group_top_k(ds, group_key: str, sort_key: str, k: int, descending: bool = True,
                tiebreak: str | None = None, num_partitions: int | None = None):
    """Per-group top-k (the reference's per-query top_n,
    retrieval.py:100-112), coarse-bucketed: ONE sort per bucket by
    (group, sort_key[, tiebreak]), within-run row index by segmented
    arange, filter index < k — P Python calls total, so a host-sized
    group space (docs_host_cap at CC scale: millions of hosts) pays no
    per-key dispatch."""
    from raydoc.ops.bucketing import bucketed_sorted_apply

    order = "descending" if descending else "ascending"
    sort_keys = ([(group_key, "ascending"), (sort_key, order)]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def _head_bucket(t: pa.Table, starts: np.ndarray,
                     counts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return t
        rn = np.arange(t.num_rows, dtype=np.int64) - np.repeat(starts, counts)
        return t.filter(pa.array(rn < k))

    return bucketed_sorted_apply(ds, [group_key], sort_keys, _head_bucket,
                                 num_partitions=num_partitions)


def grouped_concat(ds, key: str, value_col: str, sep: str = "\n",
                   order_col: str | None = None, out_col: str | None = None,
                   num_partitions: int | None = None):
    """Grouped string concatenation — the reference's actual aggregate
    vocabulary (``"\\n".join`` of component contents, base.py:465,
    generate.py:193, ``" - ".join`` template.py:112), distributed and
    coarse-bucketed: ONE sort per bucket by (key, order_col) — pin
    ``order_col`` for determinism, concat is order-sensitive — then all
    groups join at once via run-offset list arrays + ``pc.binary_join``
    (P Python calls total; large-list int64 offsets so a >2^31-char
    bucket can't overflow). The gather is inherently linear in the
    group's data (no partial combine shrinks a concatenation), so group
    size — not group count — is the scale limit; the reference does
    this driver-side single-threaded."""
    oc = order_col or value_col
    out = out_col or f"{value_col}_concat"

    from raydoc.ops.bucketing import bucketed_sorted_apply

    sort_keys = [(key, "ascending"), (oc, "ascending")]

    def _cat_bucket(t: pa.Table, starts: np.ndarray,
                    counts: np.ndarray) -> pa.Table:
        n_runs = len(starts)
        vcol = t.column(value_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        # NULL values are skipped entirely (no separator emitted),
        # matching SQL string_agg semantics: per-run VALID counts give
        # the list offsets over the null-filtered value array
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        nv = (np.add.reduceat(valid.astype(np.int64), starts)
              if n_runs else np.empty(0, np.int64))
        offsets = np.concatenate(([0], np.cumsum(nv)))
        if pa.types.is_string(vcol.type) or pa.types.is_large_string(vcol.type):
            svals = vcol.filter(pa.array(valid)).cast(pa.large_string())
        else:
            # non-string values concat via Python str() (matches the
            # engine's historical output, e.g. True not 'true'); the
            # loop is O(values), same order as the concat itself
            svals = pa.array(
                [str(v) for v in vcol.filter(pa.array(valid)).to_pylist()],
                pa.large_string())
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), svals)
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        return pa.Table.from_pydict({
            key: t.column(key).take(pa.array(starts)),
            out: joined.cast(pa.string()),
        })

    return bucketed_sorted_apply(ds, [key], sort_keys, _cat_bucket,
                                 num_partitions=num_partitions)


def distinct_on(ds, key: str, keep: str = "min", order_col: str | None = None,
                num_partitions: int | None = None, bucketed: bool = False):
    """Exact dedup on a key: hash-partition by key, keep one row per
    group (the reference's drop_duplicates on content, base.py:474,509).
    ``keep``: which row survives — "min"/"max" of ``order_col`` (defaults
    to the key itself), pinned so output is deterministic.

    Two physical plans, chosen by the CALLER's knowledge of the key
    space (cardinality isn't knowable without executing the input):

    * default (low-cardinality keys — routes, segments, nations):
      ``groupby(key).map_groups``, one Python call per distinct value.
    * ``bucketed=True`` (DATA-SIZED key spaces — ids, texts): keys are
      hash-bucketed into a cpu-scaled coarse partition count and each
      bucket deduped vectorized (sort by key+order, dictionary-code
      adjacent comparison marks run starts, one row per run). Same
      single shuffle, P Python calls total; measured A/B at sf0.01 the
      bucketed plan costs ~1 s MORE on a 25-key input (extra map
      stage) and collapses the per-group overhead on corpus-sized
      keys (see exact_dedup: 4.6 s -> 0.9 s for 5k distinct texts).
    """
    oc = order_col or key

    if not bucketed:
        def _first(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[(oc, "ascending" if keep == "min" else "descending")],
            )
            return group.take(idx.slice(0, 1))

        return ds.groupby(key).map_groups(_first, batch_format="pyarrow")

    P = num_partitions or max(4, _cpu_cap())

    def _bucket(batch: pa.Table) -> pa.Table:
        # one shared kernel: integers pass through as their own value
        # (null-safe, unsigned-safe), strings hash via polars'
        # vectorized xxhash — r04, replacing a crc32-per-row Python
        # loop that cost ~2 s per 2M string keys (canon urls, tokens)
        from raydoc.ops.bucketing import _col_hash_u64

        col = batch.column(key).combine_chunks()
        part = np.mod(_col_hash_u64(col), np.uint64(P)).astype(np.int64)
        return batch.append_column("_part", pa.array(part))

    def _dedupe_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # ADVICE r02: starts=[0] would mis-take
            return group.drop_columns(["_part"])
        idx = pc.sort_indices(
            group,
            sort_keys=[(key, "ascending"),
                       (oc, "ascending" if keep == "min" else "descending")],
        )
        t = group.take(idx)
        keys = t.column(key).combine_chunks()
        # dictionary codes give a null-safe adjacent comparison (nulls
        # sort together and share the -1 code -> one surviving row)
        codes = pc.fill_null(
            keys.dictionary_encode().indices, -1
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])))
        return t.take(pa.array(starts)).drop_columns(["_part"])

    from raydoc.ops.bucketing import _coalesce_typed

    return _coalesce_typed(  # few distinct keys << shuffle partitions
        ds.map_batches(_bucket, batch_format="pyarrow")  # would otherwise
        .groupby("_part")                                # emit zero-column
        .map_groups(_dedupe_bucket, batch_format="pyarrow")  # empty blocks
    )                                                    # that crash joins


def union_all(*datasets):
    """Bag union (the reference's pd.concat fan-in, canvas.py:247,277)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
