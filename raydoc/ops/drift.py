"""Corpus drift: per-token distribution divergence between two corpora.

The crawl-QA question every rolling web pipeline asks: did THIS crawl's
content distribution move against the last one (new boilerplate, a spam
campaign, a parser regression)? The standard instrument is per-token
log-odds against the reference corpus — the tokens with the largest
smoothed log-odds ratio are exactly the "what changed" report, and a
threshold on them is the drift alarm.

Contract (mirrored exactly by the generated SQL oracle,
queries.docs_token_drift):

- tokens: the engine-standard ``\\s+`` split of trim(lower(text));
- per-token counts c1(w) over corpus A and c2(w) over corpus B, T1/T2
  their total token counts, V the UNION vocabulary size — exact ints;
- add-one smoothed log-odds, integer fixed-point:

    drift_fp(w) = floor( ln( ((c1+1.0) * (T2+V))
                             / ((c2+1.0) * (T1+V)) ) * 2**frac_bits )

  positive = overrepresented in A. The double arithmetic inside ln is
  spelled operation-for-operation like the SQL (float product, float
  divide), so both engines feed ln the identical IEEE double; the
  single float step then floors to the 2**-frac_bits grid (the
  bm25/lm discipline);
- output: the top-k tokens by drift_fp (desc, token asc on ties) with
  their raw counts — deterministic, hash-checkable.

Physical plan: ONE tag-union count shuffle — per-batch token rows
carry (a, b) indicator columns, ``grouped_agg`` partial-sums them into
(w, c1, c2) — then corpus totals reduce to one row per block, the
drift map runs one ln per DISTINCT (c1, c2) pair, and the top-k
finalizes through the coarse-bucket kernel. No text shuffles; the
vocab table is the only materialized intermediate.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_drift", "dataset_diff", "numeric_drift"]


def _tok_rows(batch: pa.Table, text_col: str, a: int) -> pa.Table:
    from raydoc.ops.lm import _tokens

    flat = pc.list_flatten(_tokens(batch, text_col))
    n = len(flat)
    return pa.Table.from_pydict({
        "w": flat,
        "a": pa.array(np.full(n, a, dtype=np.int64)),
        "b": pa.array(np.full(n, 1 - a, dtype=np.int64))})


def token_drift(ds_a, ds_b, text_col: str = "text", top_k: int = 20,
                frac_bits: int = 16, num_partitions: int | None = None):
    """Top-``top_k`` drifted tokens of corpus A against corpus B ->
    Dataset (w, c1, c2, drift_fp). See module contract."""
    import ray

    from raydoc.ops.relational import grouped_agg, nonempty_batches, top_k as _top
    scale = 1 << frac_bits

    ta = ds_a.map_batches(
        nonempty_batches(lambda b: _tok_rows(b, text_col, 1)),
        batch_format="pyarrow")
    tb = ds_b.map_batches(
        nonempty_batches(lambda b: _tok_rows(b, text_col, 0)),
        batch_format="pyarrow")
    vocab = grouped_agg(ta.union(tb), ["w"],
                        {"c1": ("sum", "a"), "c2": ("sum", "b")},
                        num_partitions=num_partitions).materialize()

    def _totals(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "t1": pa.array([int(pc.sum(b.column("c1")).as_py() or 0)]),
            "t2": pa.array([int(pc.sum(b.column("c2")).as_py() or 0)]),
            "v": pa.array([b.num_rows])})

    parts = [t for t in ray.get(
        vocab.map_batches(_totals, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "w": pa.array([], pa.string()),
            "c1": pa.array([], pa.int64()),
            "c2": pa.array([], pa.int64()),
            "drift_fp": pa.array([], pa.int64())}))
    tot = pa.concat_tables(parts, promote_options="permissive")
    T1 = int(pc.sum(tot.column("t1")).as_py())
    T2 = int(pc.sum(tot.column("t2")).as_py())
    V = int(pc.sum(tot.column("v")).as_py())

    def _drift(b: pa.Table) -> pa.Table:
        c1 = b.column("c1").to_numpy(zero_copy_only=False).astype(
            np.int64)
        c2 = b.column("c2").to_numpy(zero_copy_only=False).astype(
            np.int64)
        # one ln per DISTINCT (c1, c2) pair; the double expression is
        # spelled exactly like the SQL ((c+1.0) float products)
        nd = np.column_stack([c1, c2])
        uniq, inv = np.unique(nd, axis=0, return_inverse=True)
        du = np.array(
            [math.floor(math.log(
                ((int(a) + 1.0) * (T2 + V))
                / ((int(bb) + 1.0) * (T1 + V))) * scale)
             for a, bb in uniq], dtype=np.int64)
        return pa.Table.from_pydict({
            "w": b.column("w"), "c1": pa.array(c1),
            "c2": pa.array(c2), "drift_fp": pa.array(du[inv])})

    scored = vocab.map_batches(nonempty_batches(_drift),
                               batch_format="pyarrow")
    return _top(scored, "drift_fp", top_k, descending=True, tiebreak="w")


def dataset_diff(ds_a, ds_b, key_col: str, compare_cols: list[str],
                 num_partitions: int | None = None):
    """Row-level diff of two dataset snapshots by key — the other half
    of pipeline QA next to ``token_drift``: after an engine or parser
    upgrade, "how many rows appeared / vanished / changed?" is the
    regression report. Output: ONE row
    (n_a, n_b, n_added, n_removed, n_changed, n_same) — exact ints,
    trivially SQL-replayable.

    Contract: keys are assumed unique per side (snapshot semantics —
    run exact_dedup first otherwise; with duplicate keys the counts
    follow the bucketed grouped math of whichever rows share the key
    and are not meaningful). "changed" compares the process-stable
    64-bit hash of the NUL-joined ``compare_cols`` (null encodes as
    the empty string, so a null->'' flip is invisible) — a 2^-64
    per-pair collision could report "same" for a changed row, the
    same accepted odds as the engine's 63-bit doc ids; the SQL oracle
    compares the raw strings instead, which is what makes the hash
    contract checkable.

    Physical plan: each side maps to slim (key, side, content-hash)
    rows; ONE tag-union coarse-bucket pass classifies every key run
    vectorized (present-in-a / present-in-b / hash-equal) and emits
    fixed-size per-bucket count partials; the driver sums P rows."""
    import ray
    import ray.data as rd

    from raydoc.ops.bucketing import bucketed_sorted_apply
    from raydoc.ops.relational import nonempty_batches

    def _rows(side: int):
        def _fn(b: pa.Table) -> pa.Table:
            cols = []
            for c in compare_cols:
                col = b.column(c)
                cols.append(pc.fill_null(pc.cast(col, pa.string()), ""))
            joined = pc.binary_join_element_wise(
                *cols, "\x00") if len(cols) > 1 else cols[0]
            # vectorized content hash (the dedup md5 contract would be
            # hashlib-per-row; the diff only needs equality, so the
            # process-stable 64-bit kernel is the right tool)
            from raydoc.hashing import stable_u64_arr

            h = stable_u64_arr(joined).astype(np.int64)
            return pa.Table.from_pydict({
                "k": pc.cast(b.column(key_col), pa.string()),
                "side": pa.array(
                    np.full(b.num_rows, side, dtype=np.int64)),
                "h": pa.array(h)})

        return _fn

    msgs = ds_a.map_batches(nonempty_batches(_rows(0)),
                            batch_format="pyarrow").union(
        ds_b.map_batches(nonempty_batches(_rows(1)),
                         batch_format="pyarrow"))

    def _classify(t: pa.Table, starts: np.ndarray,
                  counts: np.ndarray) -> pa.Table:
        z = {"n_a": 0, "n_b": 0, "n_added": 0, "n_removed": 0,
             "n_changed": 0, "n_same": 0}
        if t.num_rows:
            side = t.column("side").to_numpy(zero_copy_only=False)
            h = t.column("h").to_numpy(zero_copy_only=False)
            in_a = side == 0
            na = np.add.reduceat(in_a.astype(np.int64), starts)
            nb = counts - na
            both = (na > 0) & (nb > 0)
            z["n_a"] = int(in_a.sum())
            z["n_b"] = int((~in_a).sum())
            z["n_added"] = int(((na == 0) & (nb > 0)).sum())
            z["n_removed"] = int(((na > 0) & (nb == 0)).sum())
            # same iff every hash in the run is identical (side-sorted
            # run: first/last hash differ => changed)
            hfirst = h[starts]
            hlast = h[starts + counts - 1]
            same = both & (hfirst == hlast)
            # guard multi-row runs with equal endpoints but a noisy
            # middle (duplicate keys): require all-equal within run
            seg = np.repeat(np.arange(len(starts)), counts)
            allsame = np.ones(len(starts), dtype=bool)
            np.logical_and.at(allsame, seg, h == hfirst[seg])
            same &= allsame
            z["n_same"] = int(same.sum())
            z["n_changed"] = int((both & ~same).sum())
        return pa.Table.from_pydict(
            {k: pa.array([v], pa.int64()) for k, v in z.items()})

    parts = [t for t in ray.get(
        bucketed_sorted_apply(
            msgs, ["k"], [("k", "ascending"), ("side", "ascending")],
            _classify, num_partitions=num_partitions)
        .to_arrow_refs()) if t.num_rows]
    tot = {k: 0 for k in ("n_a", "n_b", "n_added", "n_removed",
                          "n_changed", "n_same")}
    if parts:
        t = pa.concat_tables(parts, promote_options="permissive")
        for k in tot:
            tot[k] = int(pc.sum(t.column(k)).as_py() or 0)
    return rd.from_arrow(pa.Table.from_pydict(
        {k: pa.array([v], pa.int64()) for k, v in tot.items()}))


def numeric_drift(ds_a, ds_b, col: str,
                  num_range_parts: int = 32,
                  num_partitions: int | None = None):
    """Two-sample Kolmogorov-Smirnov distance between a numeric
    column's distributions — the numeric sibling of ``token_drift``
    (value drift: a schema-valid upstream change that shifts a score
    or length distribution). EXACT integers end to end: the statistic
    is returned as the fraction ``ks_num / ks_den`` with

        ks_num = max over distinct values v of
                 | cum_a(v) * n_b  -  cum_b(v) * n_a |,
        ks_den = n_a * n_b

    (the right-continuous empirical CDFs evaluated at every distinct
    value — exactly the two-sample KS sup). Nulls are excluded on
    both sides. Output: one row (n_a, n_b, ks_num, ks_den).
    Overflow bound: n_a * n_b < 2**63 (sample past ~3e9 rows a side).

    Physical plan: ONE tag-union count shuffle builds the per-distinct-
    value (v, c1, c2) table (indicator partial sums, the token_drift
    plan); the global cumulative sums run on the range-partitioned
    carry kernel (``window.running_agg_carry`` under a constant key —
    the distinct-value table is corpus-sized in general, so the
    one-key-fits-a-worker shortcut is NOT assumed); the max reduces
    per block to one scalar row each."""
    import ray
    import ray.data as rd

    from raydoc.ops.relational import grouped_agg, nonempty_batches
    from raydoc.ops.window import running_agg_carry

    def _rows(side: int):
        def _fn(b: pa.Table) -> pa.Table:
            c = b.column(col)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            t = pa.Table.from_pydict({"v": c})
            t = t.filter(pc.is_valid(t.column("v")))
            if pa.types.is_floating(t.column("v").type):
                # NaNs have no place in a CDF
                t = t.filter(pc.equal(t.column("v"), t.column("v")))
            n = t.num_rows
            return t.append_column(
                "a", pa.array(np.full(n, 1 - side, dtype=np.int64))
            ).append_column(
                "b", pa.array(np.full(n, side, dtype=np.int64)))

        return _fn

    msgs = ds_a.map_batches(nonempty_batches(_rows(0)),
                            batch_format="pyarrow").union(
        ds_b.map_batches(nonempty_batches(_rows(1)),
                         batch_format="pyarrow"))
    def _stamp(t: pa.Table) -> pa.Table:
        # the carry kernel range-partitions an int64-orderable order
        # column; floats get the IEEE order-preserving int64 view
        # (sign-flip trick) as the ordering KEY — the cumulative sums
        # are over counts, so v itself never needs to survive the sort
        v = t.column("v")
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        if pa.types.is_floating(v.type):
            bits = v.cast(pa.float64()).view(pa.int64()) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            key = bits ^ ((bits >> 63) & 0x7FFFFFFFFFFFFFFF)
        else:
            key = v.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(
            "vkey", pa.array(key, pa.int64())).append_column(
            "k", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    vals = grouped_agg(msgs, ["v"],
                       {"c1": ("sum", "a"), "c2": ("sum", "b")},
                       num_partitions=num_partitions).map_batches(
        _stamp, batch_format="pyarrow").materialize()

    def _totals(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "t1": pa.array([int(pc.sum(b.column("c1")).as_py() or 0)]),
            "t2": pa.array([int(pc.sum(b.column("c2")).as_py() or 0)])})

    parts = [t for t in ray.get(
        vals.map_batches(_totals, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return rd.from_arrow(pa.Table.from_pydict({
            "n_a": pa.array([0], pa.int64()),
            "n_b": pa.array([0], pa.int64()),
            "ks_num": pa.array([0], pa.int64()),
            "ks_den": pa.array([0], pa.int64())}))
    tot = pa.concat_tables(parts, promote_options="permissive")
    n_a = int(pc.sum(tot.column("t1")).as_py())
    n_b = int(pc.sum(tot.column("t2")).as_py())

    cum = running_agg_carry(vals, "k", ["vkey"], "c1", out_col="cum1",
                            num_range_parts=num_range_parts)
    cum = running_agg_carry(cum, "k", ["vkey"], "c2", out_col="cum2",
                            num_range_parts=num_range_parts)

    def _maxd(b: pa.Table) -> pa.Table:
        c1 = b.column("cum1").to_numpy(zero_copy_only=False).astype(
            np.int64)
        c2 = b.column("cum2").to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = np.abs(c1 * n_b - c2 * n_a)
        return pa.Table.from_pydict({
            "m": pa.array([int(d.max()) if len(d) else 0], pa.int64())})

    parts = [t for t in ray.get(
        cum.map_batches(_maxd, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    ks = max((int(pc.max(t.column("m")).as_py() or 0) for t in parts),
             default=0)
    return rd.from_arrow(pa.Table.from_pydict({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "ks_num": pa.array([ks], pa.int64()),
        "ks_den": pa.array([n_a * n_b], pa.int64())}))
