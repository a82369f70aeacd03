"""Event-time operators: tumbling windows, sessionization, as-of join.

The reference has no event-time semantics (SURVEY.md §2.5 streaming
note) — these are the engine's additions for event tables. All three
follow one partitioning rule: hash-partition by entity key, order by
timestamp INSIDE each group only (never a global sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "stamp_tumbling_window",
    "sessionize",
    "asof_join",
    "running_agg",
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
               agg_value_col: str | None = None):
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the SAME key exceeds the gap.

    One shuffle (groupby key); within each group a vectorized sort +
    cumulative sum over gap breaks. Output one row per session:
    (key, session_id, n_events, start_ts, end_ts[, sum_value]).
    session_id numbers sessions per key from 1 in time order.
    """
    gap_us = int(gap_minutes * 60 * 1e6)

    def _sessions(group: pa.Table) -> pa.Table:
        # null timestamps have no place on the timeline: drop them
        # (int64-casting a null otherwise yields a NaN float array)
        group = group.filter(pc.is_valid(group.column(ts_col)))
        out: dict[str, list] = {
            key_col: [], "session_id": [], "n_events": [],
            "start_ts": [], "end_ts": [],
        }
        if agg_value_col:
            out["sum_value"] = []
        if group.num_rows == 0:
            # typed empty output (all-null groups): no schema drift
            fields = [pa.field(key_col, group.schema.field(key_col).type),
                      pa.field("session_id", pa.int64()),
                      pa.field("n_events", pa.int64()),
                      pa.field("start_ts", pa.int64()),
                      pa.field("end_ts", pa.int64())]
            if agg_value_col:
                fields.append(pa.field("sum_value", pa.float64()))
            tbl = pa.Table.from_pydict(out, schema=pa.schema(fields))
        else:
            idx = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
            g = group.take(idx)
            ts = g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            breaks = np.empty(len(ts), dtype=np.int64)
            breaks[0] = 1
            if len(ts) > 1:
                breaks[1:] = (np.diff(ts) > gap_us).astype(np.int64)
            # session boundaries -> O(n) segment reduces (a per-session
            # boolean-mask loop is O(n_sessions * n) and hangs on a key
            # with ~1M singleton sessions)
            starts = np.flatnonzero(breaks)
            n_sessions = len(starts)
            counts = np.diff(np.append(starts, len(ts)))
            key = g.column(key_col)[0].as_py()
            out[key_col] = [key] * n_sessions
            out["session_id"] = list(range(1, n_sessions + 1))
            out["n_events"] = counts.tolist()
            out["start_ts"] = ts[starts].tolist()  # sorted: first = min
            out["end_ts"] = ts[np.append(starts[1:], len(ts)) - 1].tolist()
            if agg_value_col:
                vals = g.column(agg_value_col).to_numpy(zero_copy_only=False)
                out["sum_value"] = np.add.reduceat(
                    vals.astype(np.float64), starts
                ).tolist()
        tbl = pa.Table.from_pydict(out)
        for c in ("start_ts", "end_ts"):
            tbl = tbl.set_column(
                tbl.schema.get_field_index(c), c,
                tbl.column(c).cast(pa.int64()).cast(pa.timestamp("us")),
            )
        return tbl

    return ds.groupby(key_col).map_groups(_sessions, batch_format="pyarrow")


def _group_sorted(group: pa.Table, order_cols: list[str]) -> pa.Table:
    idx = pc.sort_indices(group, sort_keys=[(c, "ascending") for c in order_cols])
    return group.take(idx)


def running_agg(ds, key_col: str, order_cols: list[str], val_col: str,
                out_col: str = "run_sum", fn: str = "sum"):
    """Per-key running aggregate in ``order_cols`` order — the SQL
    window ``fn(val) OVER (PARTITION BY key ORDER BY order_cols)`` with
    a default cumulative frame. ``fn`` in {sum, count, min, max}.

    One shuffle (groupby key); vectorized sort + cumulative kernel per
    group. Output: all input columns + ``out_col``. Partitioning
    assumption: one key's full history fits a worker (range-partition
    the order column and carry per-partition carry-in sums for
    pathological keys).
    """
    kernels = {
        "sum": np.cumsum,
        "count": lambda v: np.arange(1, len(v) + 1, dtype=np.int64),
        "min": np.minimum.accumulate,
        "max": np.maximum.accumulate,
    }
    if fn not in kernels:
        raise ValueError(f"unsupported running fn {fn}")

    def _run(group: pa.Table) -> pa.Table:
        g = _group_sorted(group, order_cols)
        vals = g.column(val_col).to_numpy(zero_copy_only=False)
        return g.append_column(out_col, pa.array(kernels[fn](vals)))

    return ds.groupby(key_col).map_groups(_run, batch_format="pyarrow")


def lag_delta(ds, key_col: str, order_cols: list[str], val_col: str,
              out_col: str = "delta"):
    """``val - lag(val)`` per key in ``order_cols`` order (null for each
    key's first row) — SQL ``val - LAG(val) OVER (PARTITION BY key ORDER
    BY order_cols)``. Same partitioning contract as ``running_agg``."""

    def _delta(group: pa.Table) -> pa.Table:
        g = _group_sorted(group, order_cols)
        vals = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        delta = np.empty(len(vals), dtype=np.float64)
        delta[0] = np.nan
        if len(vals) > 1:
            delta[1:] = vals[1:] - vals[:-1]
        col = pa.array(delta, pa.float64(), from_pandas=True)  # NaN -> null
        return g.append_column(out_col, col)

    return ds.groupby(key_col).map_groups(_delta, batch_format="pyarrow")


def rolling_agg(ds, key_col: str, order_cols: list[str], val_col: str,
                window: int, out_col: str = "roll", fn: str = "mean"):
    """Per-key rolling aggregate over the last ``window`` rows — SQL
    ``fn(val) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. ``fn`` in {mean, sum, min,
    max}. Leading rows use their shorter actual frame (SQL semantics).
    Vectorized via a zero-padded sliding window per group; same
    partitioning contract as ``running_agg``."""
    if fn not in ("mean", "sum", "min", "max"):
        raise ValueError(f"unsupported rolling fn {fn}")

    def _roll(group: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        g = _group_sorted(group, order_cols)
        vals = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(vals)
        k = min(window, n) if n else 1
        if fn in ("min", "max"):
            fill = np.inf if fn == "min" else -np.inf
            pad = np.concatenate([np.full(k - 1, fill), vals])
            win = sliding_window_view(pad, k)
            out = win.min(axis=1) if fn == "min" else win.max(axis=1)
        else:
            pad = np.concatenate([np.zeros(k - 1), vals])
            sums = sliding_window_view(pad, k).sum(axis=1)
            if fn == "sum":
                out = sums
            else:
                counts = np.minimum(np.arange(n) + 1, k)
                out = sums / counts
        return g.append_column(out_col, pa.array(out, pa.float64()))

    return ds.groupby(key_col).map_groups(_roll, batch_format="pyarrow")


def group_rank(ds, key_col: str, sort_col: str, out_col: str = "rn",
               descending: bool = True, tiebreak: str | None = None,
               k: int | None = None):
    """``row_number() OVER (PARTITION BY key ORDER BY sort_col [DESC],
    tiebreak)`` with an optional ``rn <= k`` filter (per-group top-k
    that KEEPS the rank column, unlike relational.group_top_k)."""
    order = "descending" if descending else "ascending"
    sort_keys = [(sort_col, order)] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def _rank(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=sort_keys)
        g = group.take(idx)
        if k is not None:
            g = g.slice(0, k)
        return g.append_column(
            out_col, pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64))
        )

    return ds.groupby(key_col).map_groups(_rank, batch_format="pyarrow")


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

    def _merge(group: pa.Table) -> pa.Table:
        side = np.array(group.column("_side").to_pylist())
        ts = group.column("_ts").to_numpy(zero_copy_only=False)
        lmask, rmask = side == "L", side == "R"
        lrows = group.filter(pa.array(lmask))
        if lrows.num_rows == 0:
            return pa.Table.from_pydict(
                {c: pa.array([], _out_type(c)) for c in left_schema_cols + right_cols}
            )
        rrows = group.filter(pa.array(rmask))
        lts = ts[lmask]
        out = {c: lrows.column(c) for c in left_schema_cols}
        if rrows.num_rows == 0:
            for c in right_cols:
                out[c] = pa.nulls(lrows.num_rows, _rtype(rrows, c))
            return pa.Table.from_pydict(out)
        rts = ts[rmask]
        if right_tiebreak:
            tb = rrows.column(right_tiebreak).to_numpy(zero_copy_only=False)
            rorder = np.lexsort((tb, rts))  # ts asc, tiebreak asc -> last wins
        else:
            rorder = np.argsort(rts, kind="stable")
        rts_sorted = rts[rorder]
        # index of latest right with rts <= lts
        pos = np.searchsorted(rts_sorted, lts, side="right") - 1
        take = np.where(pos >= 0, rorder[np.clip(pos, 0, None)], 0)
        null_mask = pa.array(pos < 0)
        for c in right_cols:
            col = rrows.column(c).take(pa.array(take, pa.int64()))
            col = pc.if_else(null_mask, pa.nulls(lrows.num_rows, col.type), col)
            out[c] = col
        return pa.Table.from_pydict(out)

    def _rtype(rrows: pa.Table, c: str):
        return rrows.schema.field(c).type

    def _out_type(c: str):  # only hit for fully-empty groups
        return pa.null()

    merged = lt.union(rt)
    return merged.groupby("_k").map_groups(_merge, batch_format="pyarrow")


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

    def _pack(group: pa.Table) -> pa.Table:
        g = _group_sorted(group, order_cols)
        toks = g.column(token_col).to_numpy(zero_copy_only=False)
        start = np.cumsum(toks) - toks
        return g.append_column(
            out_col, pa.array(start // budget, pa.int64())
        )

    return ds.groupby(key_col).map_groups(_pack, batch_format="pyarrow")
