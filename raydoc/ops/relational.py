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

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "broadcast_join",
    "shuffle_join",
    "broadcast_semi_join",
    "shuffle_semi_join",
    "grouped_agg",
    "grouped_quantile",
    "top_k",
    "group_top_k",
    "distinct_on",
    "union_all",
]

_AGG_FUNCS = {"sum", "count", "mean", "min", "max", "std"}


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
    per-process hash index lazily. ``how`` in {"inner", "left"}.
    """
    import ray

    if columns is not None:
        keep = [right_on] + [c for c in columns if c != right_on]
        small = small.select(keep)
    small_ref = ray.put(small)

    class _Joiner:
        """Actor-pool joiner: index built once per actor, not per batch.
        Duplicate right keys multiply matching left rows (SQL join
        semantics); the unique-key case keeps the vectorized fast path."""

        def __init__(self, ref, key: str, how: str) -> None:
            tbl: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.how = how
            self.key = key
            self.tbl = tbl.combine_chunks()
            keys = self.tbl.column(key).to_pylist()
            self.index: dict[Any, Any] = {}
            self.has_dups = False
            for i, k in enumerate(keys):
                prev = self.index.get(k)
                if prev is None:
                    self.index[k] = i
                elif isinstance(prev, list):
                    prev.append(i)
                    self.has_dups = True
                else:
                    self.index[k] = [prev, i]
                    self.has_dups = True
            self.other_cols = [c for c in self.tbl.column_names if c != key]

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            lk = batch.column(left_on).to_pylist()
            if self.has_dups:
                left_take: list[int] = []
                right_take: list[int] = []
                for i, k in enumerate(lk):
                    rows = self.index.get(k)
                    if rows is None:
                        if self.how == "left":
                            left_take.append(i)
                            right_take.append(-1)
                    elif isinstance(rows, list):
                        left_take.extend([i] * len(rows))
                        right_take.extend(rows)
                    else:
                        left_take.append(i)
                        right_take.append(rows)
                batch = batch.take(pa.array(left_take, pa.int64()))
                idx = np.asarray(right_take, dtype=np.int64)
            else:
                idx = np.fromiter(
                    (self.index.get(k, -1) for k in lk),
                    dtype=np.int64, count=len(lk),
                )
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

    import ray.data  # noqa: F401  (ensure ray.data registered)

    return ds.map_batches(
        _Joiner,
        fn_constructor_args=(small_ref, right_on, how),
        batch_format="pyarrow",
        concurrency=(1, _cpu_cap()),
    )


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
    batch by membership — no row multiplication, no all-to-all.
    Assumption: the deduped key set fits in a worker's heap; use
    ``shuffle_semi_join`` when it doesn't.
    """
    import ray

    keys = keys.select([right_on])
    keys_ref = ray.put(keys)

    class _Member:
        """Membership set built once per actor, not per batch."""

        def __init__(self, ref) -> None:
            tbl: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.keys = set(tbl.column(right_on).to_pylist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            lk = batch.column(left_on).to_pylist()
            mask = pa.array([(k in self.keys) != anti for k in lk])
            return batch.filter(mask)

    return ds.map_batches(
        _Member,
        fn_constructor_args=(keys_ref,),
        batch_format="pyarrow",
        concurrency=(1, _cpu_cap()),
    )


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
        right.select_columns([right_on]), right_on
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


def grouped_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
):
    """Grouped aggregation with EXPLICIT output names and partial
    pre-aggregation.

    ``aggs``: out_name -> (fn, column), fn in {sum,count,mean,min,max}.
    Phase 1 (map_batches) collapses each batch to one row per key with
    partial sums/counts/mins/maxs; phase 2 shuffles only those partials
    through ``groupby().map_groups``. mean = final sum/count (exact
    integer-free division done once at the end).
    """
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

    def _partial(batch: pa.Table) -> pa.Table:
        # works for zero-row batches too (empty table, correct schema)
        for c in sq_cols:
            batch = batch.append_column(
                f"{c}__sq", pc.multiply(batch.column(c), batch.column(c))
            )
        return batch.group_by(keys).aggregate(spec)

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _final(group: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [group.column(k)[0].as_py()] for k in keys}
        for name, (fn, col) in aggs.items():
            if fn == "sum":
                v = pc.sum(group.column(f"{col}_sum")).as_py()
            elif fn == "count":
                v = pc.sum(group.column(f"{col}_count")).as_py()
            elif fn == "mean":
                s = pc.sum(group.column(f"{col}_sum")).as_py()
                c = pc.sum(group.column(f"{col}_count")).as_py()
                v = (s / c) if c else None
            elif fn == "min":
                v = pc.min(group.column(f"{col}_min")).as_py()
            elif fn == "std":
                import math

                s = pc.sum(group.column(f"{col}_sum")).as_py()
                sq = pc.sum(group.column(f"{col}__sq_sum")).as_py()
                c2 = pc.sum(group.column(f"{col}_count")).as_py()
                v = math.sqrt(max(sq / c2 - (s / c2) ** 2, 0.0)) if c2 else None
            else:
                v = pc.max(group.column(f"{col}_max")).as_py()
            out[name] = [v]
        return pa.Table.from_pydict(out)

    return partial.groupby(keys).map_groups(_final, batch_format="pyarrow")


def grouped_quantile(ds, keys: list[str], col: str, qs: dict[str, float]):
    """Exact per-group continuous quantiles (linear interpolation at
    rank q*(n-1) — DuckDB's quantile_cont semantics). Quantiles aren't
    partial-aggregable exactly, so this is the one aggregate that
    shuffles full groups; use the partial-agg path for everything else.
    ``qs``: out_name -> quantile in [0, 1]."""
    import numpy as np

    def _q(group: pa.Table) -> pa.Table:
        vals = group.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = np.sort(vals[~np.isnan(vals)])  # nulls ignored, like quantile_cont
        out: dict[str, list] = {k: [group.column(k)[0].as_py()] for k in keys}
        n = len(vals)
        for name, q in qs.items():
            if n == 0:
                out[name] = [None]
                continue
            pos = q * (n - 1)
            lo = int(pos)
            hi = min(lo + 1, n - 1)
            frac = pos - lo
            out[name] = [float(vals[lo] + (vals[hi] - vals[lo]) * frac)]
        return pa.Table.from_pydict(out)

    return ds.groupby(keys).map_groups(_q, batch_format="pyarrow")


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
                tiebreak: str | None = None):
    """Per-group top-k: hash-partition by group, vectorized local sort
    within each group (the reference's per-query top_n, retrieval.py:100-112)."""
    order = "descending" if descending else "ascending"
    sort_keys = [(sort_key, order)] + ([(tiebreak, "ascending")] if tiebreak else [])

    def _head(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=sort_keys)
        return group.take(idx.slice(0, k))

    return ds.groupby(group_key).map_groups(_head, batch_format="pyarrow")


def distinct_on(ds, key: str, keep: str = "min", order_col: str | None = None):
    """Exact dedup on a key: hash-partition by key, keep one row per
    group (the reference's drop_duplicates on content, base.py:474,509).
    ``keep``: which row survives — "min"/"max" of ``order_col`` (defaults
    to the key itself), pinned so output is deterministic."""
    oc = order_col or key

    def _first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(oc, "ascending" if keep == "min" else "descending")]
        )
        return group.take(idx.slice(0, 1))

    return ds.groupby(key).map_groups(_first, batch_format="pyarrow")


def union_all(*datasets):
    """Bag union (the reference's pd.concat fan-in, canvas.py:247,277)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
