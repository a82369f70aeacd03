"""Mergeable sketches: approximate distinct counts and quantiles.

The exact forms of these are the engine's two worst wide operations —
``distinct_on``/COUNT(DISTINCT) shuffles every distinct value and
``grouped_quantile`` shuffles full groups (its documented limitation,
relational.py). At 10^12 rows both are unaffordable, so web-scale
pipelines run SKETCHES instead: fixed-size partial states computed per
batch, merged through one tiny groupby, estimated once at the end. No
reference counterpart (the reference has no aggregates at all beyond
``"\\n".join``); these follow the published designs:

* HyperLogLog (Flajolet et al. 2007): 2^p byte registers per group,
  merge = elementwise max, standard error 1.04/sqrt(2^p) (~1.6% at
  p=12 / 4 KB per group).
* Equi-width histogram quantiles: per-group [lo, hi] from a cheap
  partial-agg pass, then fixed ``bins`` counters per group; quantile
  interpolated inside its bucket, worst-case error (hi-lo)/bins.

Shuffle payload: one fixed-size state row per (batch, group) — never
row-per-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["grouped_approx_ndv", "grouped_quantile_sketch",
           "topk_heavy_hitters"]

# splitmix64 finalizer: vectorized 64-bit avalanche for numeric columns
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


def _value_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of a column: vectorized splitmix64 for numerics,
    cached blake2 (raydoc.hashing.stable_u64) for strings."""
    typ = col.type
    if pa.types.is_integer(typ):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _mix64(v)
    if pa.types.is_floating(typ):
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return _mix64(v.view(np.uint64))
    from raydoc.ops.dedup import _token_hashes

    return _token_hashes([str(x) for x in col.to_pylist()])


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def grouped_approx_ndv(ds, keys: list[str], col: str,
                       precision: int = 12,
                       out_col: str = "ndv_approx"):
    """Approximate COUNT(DISTINCT col) per key group via HyperLogLog.

    Phase 1 (map_batches): one 2^p-byte register row per (batch,
    group) — registers[i] = max rank of any value hashing to bucket i.
    Phase 2: groupby(keys) merges registers with elementwise max and
    applies the standard HLL estimator (with the small-range
    linear-counting correction). The shuffle moves fixed-size
    register rows, never values.
    """
    p = precision
    m = 1 << p
    alpha = _hll_alpha(m)
    reg_type = pa.list_(pa.uint8(), m)

    def _partial(batch: pa.Table) -> pa.Table:
        h = _value_hashes(batch.column(col).combine_chunks())
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - p)) - 1)
        # rho = leading-zero count within the low 64-p bits, + 1.
        # Bit length via frexp's exponent: for p>=11 the low 64-p bits
        # fit float64's 53-bit mantissa EXACTLY, and frexp (x = m*2^e,
        # m in [0.5,1)) is pure bit extraction — no libm rounding. That
        # integer-exactness is what lets the DuckDB oracle reproduce
        # rho via length(bin(rest)) bit-for-bit (EVENTS_NDV_SKETCH_SQL).
        bl = np.zeros(len(rest), dtype=np.int64)
        nz = rest > 0
        bl[nz] = np.frexp(rest[nz].astype(np.float64))[1]
        rho = ((64 - p) - bl + 1).astype(np.uint8)
        # group rows of this batch by key tuple, one register row each
        kt = batch.select(keys)
        combo = pc.binary_join_element_wise(
            *[pc.cast(kt.column(k), pa.string()) for k in keys], "\x1f"
        ) if len(keys) > 1 else pc.cast(kt.column(keys[0]), pa.string())
        codes, first_idx, inv = np.unique(
            np.asarray(combo.to_pylist(), dtype=object),
            return_index=True, return_inverse=True,
        )
        regs = np.zeros((len(codes), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, idx), rho)
        out = kt.take(pa.array(first_idx.astype(np.int64)))
        return out.append_column(
            "_hll", pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1), pa.uint8()), m)
        )

    def _final_bucket(t: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        # register merge for EVERY key run of the bucket at once:
        # zero-copy decode of the fixed-size register rows to an (n, m)
        # matrix, per-run elementwise max via 2-D reduceat, vectorized
        # estimator (r03: the per-key map_groups final paid one Python
        # call per key — NDV-per-host is a corpus-sized key space)
        out: dict[str, object] = {k: t.column(k).take(pa.array(starts))
                                  for k in keys}
        n = t.num_rows
        if n == 0:
            out[out_col] = pa.array([], pa.int64())
            return pa.Table.from_pydict(out)
        col = t.column("_hll")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        regs = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint8).reshape(n, m)
        rmax = np.maximum.reduceat(regs, starts, axis=0)
        est = alpha * m * m / np.sum(
            np.power(2.0, -rmax.astype(np.float64)), axis=1)
        zeros = (rmax == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lc = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0))
        est = np.where(small, lc, est)
        out[out_col] = pa.array(np.round(est).astype(np.int64))
        return pa.Table.from_pydict(out)

    from raydoc.ops.bucketing import bucketed_sorted_apply

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_sorted_apply(
        partial, keys, [(k, "ascending") for k in keys], _final_bucket)


def grouped_quantile_sketch(ds, keys: list[str], col: str,
                            qs: dict[str, float], bins: int = 2048):
    """Approximate per-group quantiles via equi-width histograms.

    Pass 1: per-group [lo, hi] through ``grouped_agg`` partials
    (broadcast to the workers — one (lo, hi) pair per group).
    Pass 2: per (batch, group) a fixed ``bins`` counter row; one
    groupby sums histograms and interpolates each quantile inside its
    bucket. Worst-case error = (hi - lo) / bins per group. Exact
    ``grouped_quantile`` shuffles FULL groups; this shuffles
    ``bins * 8`` bytes per (batch, group).

    Cardinality contract: LOW-cardinality keys only (event types,
    languages) — the per-group [lo, hi] table is broadcast as a driver
    dict and each (batch, group) emits a bins-wide row, both linear in
    group COUNT. For data-sized key spaces use the exact
    ``grouped_quantile`` (coarse-bucketed, flat in key count).
    """
    import ray

    from raydoc.ops.relational import grouped_agg

    ranges = grouped_agg(ds, keys, {"lo": ("min", col), "hi": ("max", col)})
    range_rows = [t for t in ray.get(ranges.materialize().to_arrow_refs())
                  if t.num_rows]
    rmap: dict[tuple, tuple[float, float]] = {}
    for t in range_rows:
        for i in range(t.num_rows):
            kt = tuple(t.column(k)[i].as_py() for k in keys)
            rmap[kt] = (float(t.column("lo")[i].as_py()),
                        float(t.column("hi")[i].as_py()))
    rref = ray.put(rmap)
    hist_type = pa.list_(pa.int64(), bins)

    class _Partial:
        def __init__(self, ref) -> None:
            self.ranges = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_numpy(zero_copy_only=False).astype(
                np.float64)
            kt = batch.select(keys)
            key_rows = list(zip(*[kt.column(k).to_pylist() for k in keys]))
            combo = np.asarray(["\x1f".join(map(str, r)) for r in key_rows],
                               dtype=object)
            codes, first_idx, inv = np.unique(combo, return_index=True,
                                              return_inverse=True)
            hists = np.zeros((len(codes), bins), dtype=np.int64)
            for g in range(len(codes)):
                lo, hi = self.ranges[key_rows[int(first_idx[g])]]
                sel = vals[inv == g]
                if hi <= lo:
                    hists[g, 0] = len(sel)
                    continue
                b = np.minimum(((sel - lo) / (hi - lo) * bins).astype(
                    np.int64), bins - 1)
                np.add.at(hists[g], b, 1)
            out = kt.take(pa.array(first_idx.astype(np.int64)))
            return out.append_column(
                "_hist", pa.FixedSizeListArray.from_arrays(
                    pa.array(hists.reshape(-1), pa.int64()), bins)
            )

    def _final(group: pa.Table) -> pa.Table:
        hist = np.asarray(group.column("_hist").to_pylist(),
                          dtype=np.int64).sum(axis=0)
        kt = tuple(group.column(k)[0].as_py() for k in keys)
        lo, hi = rmap_final[kt]
        n = int(hist.sum())
        cum = np.cumsum(hist)
        out = {k: [group.column(k)[0].as_py()] for k in keys}
        width = (hi - lo) / bins if hi > lo else 0.0
        for name, q in qs.items():
            if n == 0:
                out[name] = [None]
                continue
            target = q * (n - 1) + 1
            b = int(np.searchsorted(cum, target))
            b = min(b, bins - 1)
            prev = cum[b - 1] if b else 0
            inb = hist[b]
            frac = (target - prev) / inb if inb else 0.0
            out[name] = [lo + (b + frac) * width if width else lo]
        return pa.Table.from_pydict(out)

    rmap_final = rmap  # driver-built map reused in the reduce closure

    from raydoc.util import cpu_cap

    partials = ds.map_batches(
        _Partial, fn_constructor_args=(rref,), batch_format="pyarrow",
        concurrency=(1, cpu_cap()),
    )
    return partials.groupby(keys).map_groups(_final, batch_format="pyarrow")


def _mg_summarize(values, counts, capacity: int):
    """Misra-Gries compression of an exact (value, count) multiset to
    at most ``capacity`` counters: keep the top-``capacity`` counts and
    subtract the first evicted count from the survivors (the standard
    merge rule, Misra & Gries 1982 / Agarwal et al. 2013 mergeable
    summaries). Guarantees every item with true count > N/capacity
    survives, with counts underestimated by at most N/capacity."""
    if len(values) <= capacity:
        return values, counts
    order = np.argsort(-counts, kind="stable")
    kept = order[:capacity]
    threshold = counts[order[capacity]]
    new_counts = counts[kept] - threshold
    keep = new_counts > 0
    return [values[i] for i in kept[keep]], new_counts[keep]


def topk_heavy_hitters(ds, col: str, k: int = 20, capacity: int = 4096):
    """Approximate global top-k frequent values (heavy hitters) with a
    BOUNDED-size summary, for columns whose distinct-value set is too
    large to shuffle exactly (the unbounded-vocabulary regime where the
    exact `keyword_topn` plan's per-batch combiner stops helping).

    Phase 1 (map_batches): exact per-batch counts compressed to a
    ``capacity``-counter Misra-Gries summary — one fixed-size row set
    per batch. Phase 2: single-group merge (counter-wise sum then one
    more MG compression) + top-k. Any value with true frequency
    > N/capacity is guaranteed present; reported counts are lower
    bounds within N/capacity of exact. Output: (value, count_lb)
    sorted by count desc, value asc.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(col).combine_chunks())
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        vals, cnts = _mg_summarize(vals, cnts, capacity)
        return pa.Table.from_pydict({
            "value": pa.array(vals, pa.string()),
            "count_lb": pa.array(np.asarray(cnts, np.int64), pa.int64()),
            "_g": pa.array([0] * len(vals), pa.int64()),
        })

    def _final(group: pa.Table) -> pa.Table:
        merged = group.group_by("value").aggregate([("count_lb", "sum")])
        vals = merged.column("value").to_pylist()
        cnts = merged.column("count_lb_sum").to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, cnts = _mg_summarize(vals, cnts, capacity)
        out = pa.Table.from_pydict({
            "value": pa.array(vals, pa.string()),
            "count_lb": pa.array(np.asarray(cnts, np.int64), pa.int64()),
        })
        idx = pc.sort_indices(out, sort_keys=[("count_lb", "descending"),
                                              ("value", "ascending")])
        return out.take(idx.slice(0, k))

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(_final, batch_format="pyarrow")
        .select_columns(["value", "count_lb"])
    )
