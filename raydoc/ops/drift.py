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

__all__ = ["token_drift"]


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
