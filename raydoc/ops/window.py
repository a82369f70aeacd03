"""Event-time operators: tumbling windows, sessionization, as-of join.

The reference has no event-time semantics (SURVEY.md §2.5 streaming
note) — these are the engine's additions for event tables. One
partitioning rule throughout: COARSE hash buckets of the entity key
(ops.bucketing — P Python calls total, never one per key; user-sized
key spaces at CC scale make per-key dispatch non-executable), order by
timestamp INSIDE each key run only (never a global sort). The one
operator where a single hot key realistically exceeds a worker —
a mega-user's running aggregate — has a range-partitioned carry-in
variant (``running_agg_carry``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "stamp_tumbling_window",
    "sessionize",
    "sessionize_carry",
    "asof_join",
    "running_agg",
    "running_agg_carry",
    "pack_sequences",
    "lag_delta",
    "group_rank",
    "rolling_agg",
]


def stamp_tumbling_window(batch: pa.Table, ts_col: str, unit: str = "hour",
                          out_col: str = "window_start") -> pa.Table:
    """Append the tumbling-window start (floor of the timestamp to
    ``unit``) — a pure vectorized projection; the windowed aggregate is
    then an ordinary grouped_agg on ``out_col``."""
    floored = pc.floor_temporal(batch.column(ts_col), unit=unit)
    return batch.append_column(out_col, floored)


def sessionize(ds, key_col: str, ts_col: str, gap_minutes: float = 30.0,
               agg_value_col: str | None = None,
               num_partitions: int | None = None,
               max_key_rows: int | None = None):
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the SAME key exceeds the gap.

    ``max_key_rows`` (r04): fail-loud enforcement of the one-key-fits-
    a-worker assumption — a session chain is order-sensitive state that
    salting cannot split, so a key whose event history exceeds the cap
    raises with the key named instead of silently OOM-ing a worker.
    Set it to the per-worker row budget at scale; unset skips the
    check.

    Coarse-bucket plan (ops.bucketing): ONE shuffle into a cpu-scaled
    partition count, ONE sort per bucket by (key, ts), then every key's
    sessions come from segment-vectorized kernels at once — session
    breaks by adjacent diff, per-session reduces by ``reduceat``,
    per-key session numbering by a segmented arange over the session
    table. P Python calls total (a user-sized key space pays no per-key
    dispatch). Output one row per session:
    (key, session_id, n_events, start_ts, end_ts[, sum_value]).
    session_id numbers sessions per key from 1 in time order.
    """
    from raydoc.ops.bucketing import bucketed_sorted_apply

    gap_us = int(gap_minutes * 60 * 1e6)

    def _drop_null_ts(batch: pa.Table) -> pa.Table:
        # null timestamps have no place on the timeline: drop them
        # (int64-casting a null otherwise yields a NaN float array)
        return batch.filter(pc.is_valid(batch.column(ts_col)))

    clean = ds.map_batches(_drop_null_ts, batch_format="pyarrow")
    return bucketed_sorted_apply(
        clean, [key_col],
        [(key_col, "ascending"), (ts_col, "ascending")],
        _session_kernel([key_col], ts_col, gap_us, agg_value_col),
        num_partitions=num_partitions, max_key_rows=max_key_rows)


def _session_kernel(key_cols: list[str], ts_col: str, gap_us: int,
                    agg_value_col: str | None):
    """Bucket fn shared by sessionize (key = [key_col]) and
    sessionize_carry (key = [key_col, range-slice]): one row per
    session of each composite-key run, session_id numbered from 1 in
    time order WITHIN the composite key."""

    def _sessions_bucket(g: pa.Table, starts: np.ndarray,
                         counts: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            fields = [pa.field(k, g.schema.field(k).type)
                      for k in key_cols]
            fields += [pa.field("session_id", pa.int64()),
                       pa.field("n_events", pa.int64()),
                       pa.field("start_ts", pa.timestamp("us")),
                       pa.field("end_ts", pa.timestamp("us"))]
            if agg_value_col:
                fields.append(pa.field("sum_value", pa.float64()))
            return pa.Table.from_pydict(
                {f.name: [] for f in fields}, schema=pa.schema(fields))
        ts = g.column(ts_col).combine_chunks().cast(
            pa.timestamp("us")).cast(pa.int64()).to_numpy()
        brk = np.zeros(n, dtype=bool)
        brk[starts] = True  # a key change always opens a session
        if n > 1:
            brk[1:] |= np.diff(ts) > gap_us
        s_starts = np.flatnonzero(brk)
        n_sessions = len(s_starts)
        s_counts = np.diff(np.append(s_starts, n))
        s_ends = np.append(s_starts[1:], n) - 1
        # per-key session numbering: key run of each session, minus the
        # ordinal of that run's first session (segmented arange)
        run_of = np.searchsorted(starts, s_starts, side="right") - 1
        first_sess = np.searchsorted(s_starts, starts, side="left")
        session_id = np.arange(n_sessions) - first_sess[run_of] + 1
        take = pa.array(s_starts)
        out: dict[str, object] = {
            k: g.column(k).take(take) for k in key_cols
        }
        out.update({
            "session_id": pa.array(session_id, pa.int64()),
            "n_events": pa.array(s_counts, pa.int64()),
            "start_ts": pa.array(ts[s_starts]).cast(pa.timestamp("us")),
            "end_ts": pa.array(ts[s_ends]).cast(pa.timestamp("us")),
        })
        if agg_value_col:
            vals = pc.cast(g.column(agg_value_col), pa.float64()).to_numpy(
                zero_copy_only=False)
            valid = ~np.isnan(vals)
            s = np.add.reduceat(np.where(valid, vals, 0.0), s_starts)
            nv = np.add.reduceat(valid.astype(np.int64), s_starts)
            out["sum_value"] = pa.array(  # SQL sum: nulls skipped,
                np.where(nv > 0, s, np.nan),  # all-null session -> NULL
                pa.float64(), from_pandas=True)
        return pa.Table.from_pydict(out)

    return _sessions_bucket




def _range_bounds(ds, col: str) -> tuple[int, int]:
    """Global [lo, hi] of an order column as int64 (us for timestamps)
    via one tiny per-batch min/max aggregate. (0, 0) when every value
    is null (the caller's stamp then uses a single slice)."""
    mm = ds.map_batches(
        lambda b: pa.Table.from_pydict({
            "lo": [pc.min(_ord_i64(b.column(col))).as_py()],
            "hi": [pc.max(_ord_i64(b.column(col))).as_py()],
        }),
        batch_format="pyarrow",
    ).materialize()
    rows = mm.take_all()
    los = [r["lo"] for r in rows if r["lo"] is not None]
    his = [r["hi"] for r in rows if r["hi"] is not None]
    return (min(los) if los else 0), (max(his) if his else 0)


def _stamp_range(ds, col: str, lo: int, hi: int, R: int,
                 out_col: str = "_rpart"):
    """Append the uniform range-slice id of ``col``: a pure function of
    the value, so equal values always share a slice and slices order by
    value. Nulls route to the LAST slice (their sort position within a
    key is nulls-last, matching the unsliced plans; int64-casting a
    null would otherwise hit an undefined NaN clip). The slice index is
    computed in float64 — (v - lo) * R in int64 can WRAP for order
    columns spanning most of the int64 range and silently misplace rows
    (review r04); float64 floor is monotone in v, which is all the
    slicing needs."""
    span = float(max(hi - lo + 1, 1))

    def _stamp(b: pa.Table) -> pa.Table:
        v = pc.fill_null(_ord_i64(b.column(col)), hi).to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        part = np.clip(((v - lo) * R / span), 0, R - 1).astype(np.int64)
        return b.append_column(out_col, pa.array(part))

    return ds.map_batches(_stamp, batch_format="pyarrow")


def _carry_lookup_key(t: pa.Table, key_col: str,
                      part_col: str = "_rpart") -> pa.Array:
    """'<key>\\x00<part>' broadcast-join key, NULL-SAFE: a null key
    maps to a sentinel instead of a null join key (review r04: a null
    lookup silently dropped the null-key group's carry / took row 0's
    base). run_segments groups null keys into one run, so they carry
    exactly like any other key value."""
    k = pc.fill_null(pc.cast(t.column(key_col), pa.string()), "\x02NUL\x03")
    return pc.binary_join_element_wise(
        k, pc.cast(t.column(part_col), pa.string()), "\x00")


def sessionize_carry(ds, key_col: str, ts_col: str,
                     gap_minutes: float = 30.0,
                     agg_value_col: str | None = None,
                     num_range_parts: int = 32,
                     num_partitions: int | None = None):
    """``sessionize`` for PATHOLOGICAL keys whose event history exceeds
    one worker (VERDICT r03 #4 — the mega-key case ``max_key_rows``
    would reject): range-partition the timestamp into
    ``num_range_parts`` uniform slices, sessionize per (key, slice) so
    no worker ever materializes more than one key-slice, then repair
    sessions that SPAN slice boundaries:

    * a driver-side scan over the tiny (keys x non-empty slices)
      boundary table marks consecutive slices of a key whose boundary
      gap (first event of the later slice minus last event of the
      earlier) is <= gap — their adjacent sessions are ONE session;
    * each slice's session ids shift by a broadcast base offset
      (sessions in earlier slices minus merge boundaries so far), which
      renumbers every key's sessions 1..N in time order AND gives the
      members of a spanning chain the same id;
    * one bucketed grouped_agg collapses the chains (n_events summed,
      start/end min/maxed, sum_value SQL-summed).

    Output is EXACTLY ``sessionize``'s (tested with one session
    spanning 16+ slices). Same driver-side-size assumption as
    ``running_agg_carry``: the boundary table (distinct keys x slices)
    fits the driver — this is the skew-repair plan for bounded key
    counts, not the default."""
    import ray

    from raydoc.ops.bucketing import bucketed_sorted_apply, run_segments
    from raydoc.ops.relational import grouped_agg

    gap_us = int(gap_minutes * 60 * 1e6)

    def _drop_null_ts(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(ts_col)))

    clean = ds.map_batches(_drop_null_ts, batch_format="pyarrow")

    # 1) global ts range -> uniform slices (strict boundaries cut
    # between values, never inside a run of equal timestamps)
    lo, hi = _range_bounds(clean, ts_col)
    R = num_range_parts
    stamped = _stamp_range(clean, ts_col, lo, hi, R)

    # 2) in-slice sessions under the composite key (key, slice);
    # materialized because BOTH the boundary aggregate and the final-id
    # map consume it — lazy, the whole stamp+shuffle+sort chain would
    # execute twice (review r04); the session table is one row per
    # session, far smaller than the event input
    in_slice = bucketed_sorted_apply(
        stamped, [key_col, "_rpart"],
        [(key_col, "ascending"), ("_rpart", "ascending"),
         (ts_col, "ascending")],
        _session_kernel([key_col, "_rpart"], ts_col, gap_us,
                        agg_value_col),
        num_partitions=num_partitions).materialize()

    # 3) boundary facts per (key, slice) -> driver-side merge scan
    bt = grouped_agg(
        in_slice, [key_col, "_rpart"],
        {"_nsess": ("max", "session_id"),
         "_first": ("min", "start_ts"),
         "_last": ("max", "end_ts")})
    btab = pa.concat_tables(
        [t for t in ray.get(list(bt.to_arrow_refs())) if t.num_columns])
    idx = pc.sort_indices(btab, sort_keys=[(key_col, "ascending"),
                                           ("_rpart", "ascending")])
    btab = btab.take(idx)
    kstarts, kcounts = run_segments(btab, [key_col])
    c = btab.column("_nsess").to_numpy(zero_copy_only=False).astype(
        np.int64)
    f = _ord_i64(btab.column("_first")).to_numpy(zero_copy_only=False)
    last = _ord_i64(btab.column("_last")).to_numpy(zero_copy_only=False)
    nb = len(c)
    merge = np.zeros(nb, dtype=bool)
    if nb > 1:
        merge[1:] = (f[1:] - last[:-1]) <= gap_us
    merge[kstarts] = False  # a key's first non-empty slice never merges
    excl_sessions = _seg_cumsum(c.astype(np.float64), kstarts, kcounts) - c
    merges_so_far = _seg_cumsum(merge.astype(np.float64), kstarts, kcounts)
    base = (excl_sessions - merges_so_far).astype(np.int64)
    carry = pa.Table.from_pydict({
        key_col: btab.column(key_col),
        "_rpart": btab.column("_rpart"),
        "_base": pa.array(base, pa.int64()),
    })
    carry_ref = ray.put(carry)

    # 4) shift ids by the broadcast base, collapse spanning chains
    def _final_id(b: pa.Table) -> pa.Table:
        ct: pa.Table = ray.get(carry_ref) if isinstance(
            carry_ref, ray.ObjectRef) else carry_ref
        pos = pc.index_in(_carry_lookup_key(b, key_col),
                          value_set=_carry_lookup_key(ct, key_col))
        bases = ct.column("_base").take(pc.fill_null(pos, 0))
        sid = pc.add(b.column("session_id"), bases)
        i = b.schema.get_field_index("session_id")
        return b.set_column(i, "session_id", sid).drop_columns(["_rpart"])

    aggs: dict[str, tuple[str, str]] = {
        "n_events": ("sum", "n_events"),
        "start_ts": ("min", "start_ts"),
        "end_ts": ("max", "end_ts"),
    }
    if agg_value_col:
        aggs["sum_value"] = ("sum", "sum_value")
    return grouped_agg(
        in_slice.map_batches(_final_id, batch_format="pyarrow"),
        [key_col, "session_id"], aggs, num_partitions=num_partitions)


def _row_index_in_run(n: int, starts: np.ndarray,
                      counts: np.ndarray) -> np.ndarray:
    """0-based position of each row inside its key run (segmented
    arange) — the building block of every bucketed window kernel."""
    return np.arange(n, dtype=np.int64) - np.repeat(starts, counts)


def running_agg(ds, key_col: str, order_cols: list[str], val_col: str,
                out_col: str = "run_sum", fn: str = "sum",
                num_partitions: int | None = None):
    """Per-key running aggregate in ``order_cols`` order — the SQL
    window ``fn(val) OVER (PARTITION BY key ORDER BY order_cols)`` with
    a default cumulative frame. ``fn`` in {sum, count, min, max}.

    Coarse-bucket plan: ONE shuffle, ONE sort per bucket by
    (key, order_cols), then segment-vectorized scans over every key run
    at once — cumsum-minus-run-offset for sum, segmented arange for
    count, pandas' cython ``groupby.cummin/cummax`` on dense segment
    ids for min/max. P Python calls total. Partitioning assumption: one
    key's full history fits a worker; ``running_agg_carry`` below lifts
    that for prefix-combinable fns by range-partitioning the order
    column with broadcast carry-ins.
    """
    if fn not in ("sum", "count", "min", "max"):
        raise ValueError(f"unsupported running fn {fn}")

    from raydoc.ops.bucketing import bucketed_sorted_apply, segment_ids

    sort_keys = ([(key_col, "ascending")]
                 + [(c, "ascending") for c in order_cols])

    def _run_bucket(g: pa.Table, starts: np.ndarray,
                    counts: np.ndarray) -> pa.Table:
        return g.append_column(
            out_col, _running_kernel(g, starts, counts, val_col, fn))

    return bucketed_sorted_apply(ds, [key_col], sort_keys, _run_bucket,
                                 num_partitions=num_partitions)


def _seg_cumsum(v: np.ndarray, starts: np.ndarray,
                counts: np.ndarray) -> np.ndarray:
    c = np.cumsum(v)
    return c - np.repeat(c[starts] - v[starts], counts)


def _running_kernel(g: pa.Table, starts: np.ndarray, counts: np.ndarray,
                    val_col: str, fn: str) -> pa.Array:
    """SQL-semantics running scan over the key runs of a sorted bucket:
    NULL values are SKIPPED (``fn(val) OVER ...`` in SQL never poisons
    the scan the way numpy's NaN-propagating cumsum would) and the
    output is NULL only while the frame holds no non-null value yet."""
    n = g.num_rows
    if n == 0:
        return pa.array([], pa.float64() if fn != "count" else pa.int64())
    vals = pc.cast(g.column(val_col), pa.float64()).to_numpy(
        zero_copy_only=False)
    valid = ~np.isnan(vals)
    nvalid = _seg_cumsum(valid.astype(np.int64), starts, counts)
    if fn == "count":
        return pa.array(nvalid, pa.int64())
    if fn == "sum":
        s = _seg_cumsum(np.where(valid, vals, 0.0), starts, counts)
        out = np.where(nvalid > 0, s, np.nan)
    else:
        import pandas as pd

        from raydoc.ops.bucketing import segment_ids

        seg = segment_ids(starts, counts)
        s = pd.Series(vals).groupby(seg)
        scan = (s.cummin() if fn == "min" else s.cummax()).to_numpy()
        # pandas leaves NaN at rows whose own value is NaN; SQL carries
        # the prior extremum forward — forward-fill within the run
        out = scan.copy()
        bad = np.isnan(out)
        if bad.any():
            idx = np.arange(n)
            last = np.where(bad, 0, idx)
            np.maximum.accumulate(last, out=last)
            run_start = np.repeat(starts, counts)
            take = np.maximum(last, run_start)
            out = np.where(np.isnan(out[take]), np.nan, out[take])
            out = np.where(nvalid > 0, out, np.nan)
    return pa.array(out, pa.float64(), from_pandas=True)


def running_agg_carry(ds, key_col: str, order_cols: list[str], val_col: str,
                      out_col: str = "run_sum", fn: str = "sum",
                      num_range_parts: int = 32):
    """``running_agg`` for PATHOLOGICAL keys whose full history exceeds
    one worker (a mega-user's event stream): range-partition the FIRST
    order column into ``num_range_parts`` uniform slices between the
    global min/max, run the in-slice running aggregate per
    (key, slice), then apply per-(key, slice) carry-ins — the exclusive
    prefix combine of the per-slice totals, a tiny (keys x slices)
    table prefix-scanned with the same segmented kernels and broadcast
    back via the object store. fn in {sum, count, min, max} (the
    prefix-combinable ones; mean = sum/count by the caller).

    Within a slice, rows of one key still sort together on the
    remaining order columns, so results are EXACTLY running_agg's as
    long as order_cols[0] values are distinct across slices boundaries
    — uniform slicing cuts between values, never inside a run of equal
    values, because boundary comparison is strict (< boundary goes
    left, >= goes right).
    """
    if fn not in ("sum", "count", "min", "max"):
        raise ValueError(f"unsupported running fn {fn}")
    import ray

    from raydoc.ops.bucketing import bucketed_sorted_apply

    oc0 = order_cols[0]

    # 1) global [min, max] of the order column, then uniform slices
    # (_stamp_range: nulls-last routing, overflow-safe float math)
    lo, hi = _range_bounds(ds, oc0)
    R = num_range_parts
    stamped = _stamp_range(ds, oc0, lo, hi, R)

    # 2) in-slice running agg, scan segmented by the COMPOSITE key
    #    (key, slice) so each slice restarts at zero and the carry-in
    #    is exactly the missing prefix
    in_slice = _running_agg_composite(
        stamped, [key_col, "_rpart"], order_cols, val_col, out_col, fn)

    # 3) per-(key, slice) totals -> exclusive prefix combine per key
    from raydoc.ops.relational import grouped_agg

    part_fn = {"sum": "sum", "count": "count", "min": "min", "max": "max"}[fn]
    totals = grouped_agg(
        stamped.select_columns([key_col, "_rpart", val_col]),
        keys=[key_col, "_rpart"], aggs={"_tot": (part_fn, val_col)})
    tot_tbl = pa.concat_tables(ray.get(list(totals.to_arrow_refs())))
    carry = _exclusive_prefix(tot_tbl, key_col, "_rpart", "_tot", fn)
    carry_ref = ray.put(carry)

    # 4) broadcast the carry table, combine into the in-slice scans
    def _apply_carry(b: pa.Table) -> pa.Table:
        ct: pa.Table = ray.get(carry_ref) if isinstance(
            carry_ref, ray.ObjectRef) else carry_ref
        pos = pc.index_in(_carry_lookup_key(b, key_col),
                          value_set=_carry_lookup_key(ct, key_col))
        cv = ct.column("_carry").take(pc.fill_null(pos, 0))
        has = pc.is_valid(pos)
        cur = b.column(out_col)
        carry_valid = pc.and_(has, pc.is_valid(cv))
        if fn in ("sum", "count"):
            zero = pa.scalar(0).cast(cv.type)
            added = pc.add(cur, pc.if_else(carry_valid, cv, zero))
            # a null in-slice scan means the slice's own frame is still
            # empty: SQL's running sum is then exactly the carried
            # prefix, null only when THAT is empty too (ADVICE r03 —
            # running count is never null, so `added` covers it)
            combined = pc.if_else(
                pc.is_valid(cur), added,
                pc.if_else(carry_valid, pc.cast(cv, cur.type), cur))
        elif fn == "min":
            # min/max_element_wise skip nulls: a null cur with a valid
            # carry correctly emits the carry itself
            combined = pc.if_else(
                carry_valid, pc.min_element_wise(cur, cv), cur)
        else:
            combined = pc.if_else(
                carry_valid, pc.max_element_wise(cur, cv), cur)
        i = b.schema.get_field_index(out_col)
        return b.set_column(i, out_col, combined).drop_columns(["_rpart"])

    return in_slice.map_batches(_apply_carry, batch_format="pyarrow")


def _ord_i64(col):
    """Order column -> int64 (timestamps normalized to us)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64())


def _running_agg_composite(ds, key_cols: list[str], order_cols: list[str],
                           val_col: str, out_col: str, fn: str):
    """running_agg generalized to a composite key tuple (internal:
    the carry plan scans within (key, range-slice) segments)."""
    from raydoc.ops.bucketing import bucketed_sorted_apply, segment_ids

    sort_keys = ([(k, "ascending") for k in key_cols]
                 + [(c, "ascending") for c in order_cols])

    def _run_bucket(g: pa.Table, starts: np.ndarray,
                    counts: np.ndarray) -> pa.Table:
        return g.append_column(
            out_col, _running_kernel(g, starts, counts, val_col, fn))

    return bucketed_sorted_apply(ds, key_cols, sort_keys, _run_bucket)


def _exclusive_prefix(tot: pa.Table, key_col: str, part_col: str,
                      val_col: str, fn: str) -> pa.Table:
    """(key, part, total) -> (key, part, _carry) where _carry combines
    all STRICTLY EARLIER parts of the same key. _carry is NULL when no
    earlier part holds a non-null total — each key's first part, and
    any prefix made entirely of all-null slices (ADVICE r03: a NaN
    total must neither poison the cumsum for later rows nor be
    zero-filled into a fake carry). Driver-side on a tiny
    (keys x slices) table."""
    idx = pc.sort_indices(tot, sort_keys=[(key_col, "ascending"),
                                          (part_col, "ascending")])
    t = tot.take(idx)
    from raydoc.ops.bucketing import run_segments

    starts, counts = run_segments(t, [key_col])
    v = t.column(val_col).to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False)
    n = len(v)
    valid = ~np.isnan(v)
    if fn in ("sum", "count"):
        inc = _seg_cumsum(np.where(valid, v, 0.0), starts, counts)
    else:
        import pandas as pd

        # valid-aware extremum scan: null totals become the identity
        # element, the validity count below masks empty prefixes
        fill = np.inf if fn == "min" else -np.inf
        seg = np.repeat(np.arange(len(starts)), counts)
        s = pd.Series(np.where(valid, v, fill)).groupby(seg)
        inc = (s.cummin() if fn == "min" else s.cummax()).to_numpy()
    nval = _seg_cumsum(valid.astype(np.int64), starts, counts)
    carry = np.full(n, np.nan, dtype=np.float64)
    has = np.zeros(n, dtype=bool)
    if n > 1:
        carry[1:] = inc[:-1]
        has[1:] = nval[:-1] > 0
    carry[starts] = np.nan  # first slice of each key has no carry
    has[starts] = False
    carry = np.where(has, carry, np.nan)
    out = pa.array(carry, pa.float64(), from_pandas=True)
    if fn == "count":
        out = out.cast(pa.int64())
    return pa.Table.from_pydict({
        key_col: t.column(key_col),
        part_col: t.column(part_col),
        "_carry": out,
    })


def lag_delta(ds, key_col: str, order_cols: list[str], val_col: str,
              out_col: str = "delta", num_partitions: int | None = None):
    """``val - lag(val)`` per key in ``order_cols`` order (null for each
    key's first row) — SQL ``val - LAG(val) OVER (PARTITION BY key ORDER
    BY order_cols)``. Coarse-bucket plan: one diff over the whole sorted
    bucket, run starts reset to null — P Python calls total."""
    from raydoc.ops.bucketing import bucketed_sorted_apply

    sort_keys = ([(key_col, "ascending")]
                 + [(c, "ascending") for c in order_cols])

    def _delta_bucket(g: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        n = g.num_rows
        vals = pc.cast(g.column(val_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        delta = np.empty(n, dtype=np.float64)
        if n:
            delta[0] = np.nan
            if n > 1:
                delta[1:] = vals[1:] - vals[:-1]
            delta[starts] = np.nan  # each key's first row has no lag
        col = pa.array(delta, pa.float64(), from_pandas=True)  # NaN -> null
        return g.append_column(out_col, col)

    return bucketed_sorted_apply(ds, [key_col], sort_keys, _delta_bucket,
                                 num_partitions=num_partitions)


def rolling_agg(ds, key_col: str, order_cols: list[str], val_col: str,
                window: int, out_col: str = "roll", fn: str = "mean",
                num_partitions: int | None = None):
    """Per-key rolling aggregate over the last ``window`` rows — SQL
    ``fn(val) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. ``fn`` in {mean, sum, min,
    max}. Leading rows use their shorter actual frame (SQL semantics).

    Coarse-bucket plan: sum/mean from prefix sums with the frame's left
    edge clamped at the run start (pure numpy over the whole bucket);
    min/max via pandas' cython ``groupby.rolling`` on dense segment ids.
    P Python calls total."""
    if fn not in ("mean", "sum", "min", "max"):
        raise ValueError(f"unsupported rolling fn {fn}")

    from raydoc.ops.bucketing import bucketed_sorted_apply, segment_ids

    sort_keys = ([(key_col, "ascending")]
                 + [(c, "ascending") for c in order_cols])

    def _roll_bucket(g: pa.Table, starts: np.ndarray,
                     counts: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        vals = pc.cast(g.column(val_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        if fn in ("sum", "mean"):
            run_start = np.repeat(starts, counts)
            i = np.arange(n, dtype=np.int64)
            left = np.maximum(i - window + 1, run_start)
            valid = ~np.isnan(vals)
            # SQL semantics: NULL values neither poison the sum nor
            # count toward AVG's divisor; an all-null frame is NULL
            csum = np.concatenate(([0.0], np.cumsum(
                np.where(valid, vals, 0.0))))
            ccnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
            sums = csum[i + 1] - csum[left]
            nv = ccnt[i + 1] - ccnt[left]
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(nv > 0, sums if fn == "sum" else sums / nv,
                               np.nan)
        else:
            import pandas as pd

            seg = segment_ids(starts, counts)
            r = pd.Series(vals).groupby(seg).rolling(
                window, min_periods=1)
            out = (r.min() if fn == "min" else r.max()).to_numpy()
        return g.append_column(
            out_col, pa.array(out, pa.float64(), from_pandas=True))

    return bucketed_sorted_apply(ds, [key_col], sort_keys, _roll_bucket,
                                 num_partitions=num_partitions)


def group_rank(ds, key_col: str, sort_col: str, out_col: str = "rn",
               descending: bool = True, tiebreak: str | None = None,
               k: int | None = None, num_partitions: int | None = None):
    """``row_number() OVER (PARTITION BY key ORDER BY sort_col [DESC],
    tiebreak)`` with an optional ``rn <= k`` filter (per-group top-k
    that KEEPS the rank column, unlike relational.group_top_k).
    Coarse-bucket plan: segmented arange over the sorted bucket — P
    Python calls total."""
    from raydoc.ops.bucketing import bucketed_sorted_apply

    order = "descending" if descending else "ascending"
    sort_keys = [(key_col, "ascending"), (sort_col, order)] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def _rank_bucket(g: pa.Table, starts: np.ndarray,
                     counts: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        rn = _row_index_in_run(n, starts, counts) + 1
        g = g.append_column(out_col, pa.array(rn, pa.int64()))
        if k is not None:
            g = g.filter(pa.array(rn <= k))
        return g

    return bucketed_sorted_apply(ds, [key_col], sort_keys, _rank_bucket,
                                 num_partitions=num_partitions)


def asof_join(
    left,
    right,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
):
    """As-of (most-recent-prior) join: each left row matched to the
    latest right row with the same key and right_ts <= left_ts; among
    equal right_ts the row with the LARGEST ``right_tiebreak`` wins
    (pinned so output is deterministic at any partitioning).

    Ray Data lacks this natively; composition (SURVEY.md custom-operator
    rule (a)): tag sides -> rename to common schema -> union -> groupby
    key -> per-group time sort + backward scan (vectorized searchsorted).
    The one shuffle co-partitions both sides by key.

    Output: all left columns + ``right_cols`` (null when no prior right
    row exists).
    """
    import ray.data  # noqa: F401

    left_schema_cols: list[str] = [f for f in left.schema().names]

    def _norm_ts(col: pa.ChunkedArray) -> pa.ChunkedArray:
        # normalize BOTH sides to us-resolution before the int64 compare
        # (a ns-resolution left vs us-resolution right would otherwise
        # compare raw int64 values 1000x apart and silently mis-join)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64())

    def _tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(["L"] * b.num_rows, pa.string()))
        b = b.append_column("_k", b.column(key))  # key type preserved
        return b.append_column("_ts", _norm_ts(b.column(left_ts)))

    def _tag_right(b: pa.Table) -> pa.Table:
        keep = [right_key, right_ts] + [c for c in right_cols]
        if right_tiebreak:
            keep.append(right_tiebreak)
        b = b.select(list(dict.fromkeys(keep)))
        b = b.append_column("_side", pa.array(["R"] * b.num_rows, pa.string()))
        b = b.append_column("_k", b.column(right_key))
        return b.append_column("_ts", _norm_ts(b.column(right_ts)))

    lt = left.map_batches(_tag_left, batch_format="pyarrow")
    rt = right.map_batches(_tag_right, batch_format="pyarrow")

    # coarse-bucket merge (r03; the r02 per-key map_groups paid one
    # Python call per entity key): sort each bucket ONCE by
    # (key, ts, R-before-L, tiebreak). In that order, each left row's
    # match is simply THE LAST RIGHT ROW SEEN BEFORE IT within its key
    # run — a cumulative-count scan, vectorized over the whole bucket:
    #   r_seen[i]   = count of R rows at positions <= i   (cumsum)
    #   r_before_run= r_seen just before each key run's start
    #   match       = r_seen[i] - 1, valid iff r_seen[i] > r_before_run
    # R rows sorted tiebreak-ASC at equal ts, so "last seen" = largest
    # tiebreak, and R-before-L at equal ts implements rts <= lts.
    def _merge_bucket(t: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        is_r = pc.equal(t.column("_side"), "R").to_numpy(
            zero_copy_only=False)
        n = t.num_rows
        if n == 0 or not (~is_r).any():
            return pa.Table.from_pydict(
                {c: pa.array([], t.schema.field(c).type
                             if c in t.column_names else pa.null())
                 for c in left_schema_cols + right_cols})
        r_seen = np.cumsum(is_r)
        r_before = np.repeat(
            np.where(starts > 0, r_seen[np.maximum(starts - 1, 0)], 0),
            counts)
        lmask = ~is_r
        match = r_seen[lmask] - 1          # index into R rows, in order
        valid = r_seen[lmask] > r_before[lmask]
        lrows = t.filter(pa.array(lmask))
        rrows = t.filter(pa.array(is_r))
        out = {c: lrows.column(c) for c in left_schema_cols}
        if rrows.num_rows == 0:
            for c in right_cols:
                out[c] = pa.nulls(lrows.num_rows,
                                  rrows.schema.field(c).type)
            return pa.Table.from_pydict(out)
        take = pa.array(np.where(valid, match, 0), pa.int64())
        null_mask = pa.array(~valid)
        for c in right_cols:
            col = rrows.column(c).take(take)
            out[c] = pc.if_else(null_mask,
                                pa.nulls(lrows.num_rows, col.type), col)
        return pa.Table.from_pydict(out)

    # the tiebreak sorts NATIVELY (ADVICE r03: a float64 cast broke
    # timestamp/string tiebreaks); left rows carry typed nulls, and
    # _lorder already separates sides at equal (key, ts) so null
    # placement among left rows is irrelevant
    if right_tiebreak:
        _rs = right.schema()
        tb_type = _rs.types[_rs.names.index(right_tiebreak)]

    # numeric side order: R=0 sorts before L=1 at equal (key, ts)
    def _with_order(b: pa.Table) -> pa.Table:
        isl = pc.cast(pc.equal(b.column("_side"), "L"), pa.int8())
        b = b.append_column("_lorder", isl)
        if not right_tiebreak:
            return b
        if right_tiebreak in b.column_names:
            tb = b.column(right_tiebreak)
            if isinstance(tb, pa.ChunkedArray):
                tb = tb.combine_chunks()
            tb = tb.cast(tb_type)
        else:  # left rows carry a typed null tiebreak
            tb = pa.nulls(b.num_rows, tb_type)
        return b.append_column("_tb", tb)

    merged = lt.union(rt).map_batches(_with_order, batch_format="pyarrow")
    sort_keys = [("_k", "ascending"), ("_ts", "ascending"),
                 ("_lorder", "ascending")]
    if right_tiebreak:
        sort_keys.append(("_tb", "ascending"))

    from raydoc.ops.bucketing import bucketed_sorted_apply

    return bucketed_sorted_apply(merged, ["_k"], sort_keys, _merge_bucket)


def pack_sequences(ds, token_col: str, budget: int, order_cols: list[str],
                   key_col: str, out_col: str = "pack_id"):
    """Token-budget sequence packing for LLM training: rows sorted by
    ``order_cols`` within each ``key_col`` partition (e.g. language)
    fill contiguous packs, ``pack_id = (running_sum - tokens) //
    budget`` — the offset-based strategy, so a pack holds at most
    ``budget + max_doc_tokens - 1`` tokens and assignment is a pure
    function of the ordered prefix sums (deterministic at any physical
    partitioning, and exactly the SQL window ``sum() OVER (PARTITION BY
    key ORDER BY ...)`` arithmetic). True greedy reset-on-overflow
    packing is NOT order-free and needs a sequential scan per key —
    this is the distributable form web-scale packing jobs use.

    Same partitioning contract as ``running_agg``: one key's rows fit a
    worker; range-partition the order column for pathological keys.
    """
    import numpy as np

    from raydoc.ops.bucketing import bucketed_sorted_apply

    sort_keys = ([(key_col, "ascending")]
                 + [(c, "ascending") for c in order_cols])

    def _pack_bucket(g: pa.Table, starts: np.ndarray,
                     counts: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        toks = g.column(token_col).to_numpy(zero_copy_only=False)
        c = np.cumsum(toks)
        # segmented EXCLUSIVE prefix: inclusive minus self, run-reset
        start = (c - np.repeat(c[starts] - toks[starts], counts)) - toks
        return g.append_column(
            out_col, pa.array(start // budget, pa.int64())
        )

    return bucketed_sorted_apply(ds, [key_col], sort_keys, _pack_bucket)
