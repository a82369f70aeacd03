"""Distributed k-means clustering over an embedding column, and the
SemDeDup-style semantic near-dup pass built on top of it.

The reference has no clustering operator (its nearest is the Retrieval
component's flat vector search, /root/reference/agent/component/
retrieval.py:100-112); k-means-partitioned curation is a training-data
op from the public literature (SemDeDup, Abbas et al. 2023; the same
cluster-then-prune shape backs data-mixing and diversity sampling),
so this module is engine-first with no reference counterpart to cite.

Scale shape (the part that must survive 100 TB):

* Each Lloyd update is ONE streaming pass: every batch computes its
  assignment against the broadcast centroid matrix (``ray.put`` once
  per update, workers fetch the ref) and emits a FIXED-SIZE mergeable
  partial — ≤ min(batch_rows, k) rows of (cluster, vector-sum,
  count) — never its rows. The combine is a bucketed segmented
  reduceat over ≤ k x num_blocks slim partial rows; only the k
  combined (cluster, mean) rows ever reach the driver. This is the
  same partial/combiner discipline as ops.sketch. Honest caveat: the
  partial compresses by ~batch_rows/k, so when k approaches the
  per-block row count the update shuffles roughly input-sized
  sum-rows — still slim (no text/html payload), but size blocks a
  few x k rows when fitting at large k.
* ``n_updates`` passes re-execute the input lineage once each — pass
  a parquet-read Dataset (re-read, not recompute) or materialize the
  input yourself first if its lineage is expensive.
* ``semantic_dedup_pairs`` needs each CLUSTER's rows on one worker
  (the in-cluster pair verify) — the documented one-key-fits-a-worker
  assumption shared by every bucketed kernel here, fail-loud via
  ``max_key_rows``. Pair verify is quadratic PER CELL, so size k for
  cells of ~100-1000 docs (SemDeDup's own regime: k ~ N/100), not for
  worker memory alone. ``max_cluster_docs`` star-caps runaway cells
  like minhash's ``max_bucket_docs``, but the semantics differ by
  cell content: a genuinely-duplicate cell keeps full connectivity
  under star pairing (every member is a near-dup of the hub), while
  an oversized MIXED cell loses every pair not adjacent to its hub —
  measured: k=256 over 1M random vectors (≈3.9k docs/cell) with cap
  4096 dropped 10% of planted clone pairs; k=10000 (≈100 docs/cell)
  recovers all of them. Treat the cap as a mass-dup safety valve and
  fix cell size with k.

Determinism contract (what the DuckDB oracle replays bit-for-bit):
centroids seed from the rows whose ids are in ``init_ids`` (cluster
label = seed id); assignment is argmax cosine computed in float64 as
dot/(|a||b|) with ties to the LOWEST cluster label; each update
recomputes a centroid as the plain element-wise MEAN of its members'
raw embeddings (cosine is scale-invariant, so not renormalizing
matches the SQL `AVG` replay exactly); clusters that lose all members
are dropped, mirroring SQL's GROUP BY. DUPLICATE centroid rows are
collapsed onto the lowest label before every assignment
(``_dedup_centroids``): BLAS matmuls are not column-position
invariant, so an argmax tie between identical columns cannot be
trusted bit-wise — the collapse computes what the SQL tie rule
yields (lowest label takes all members, the emptied duplicate is
dropped) without relying on float equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydoc.util import embedding_matrix

__all__ = ["kmeans_fit", "kmeans_assign", "semantic_dedup_pairs",
           "semantic_dedup", "cluster_balanced_sample"]


def _unit_safe_norms(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return n


# transient budget for one argmax chunk: rows_per_chunk x k float64
# cells (64 MB at 8M cells). Without this, a 15k-row block against
# k=10^4 centroids allocates a 1.25 GB sims matrix PER TASK — with 30
# concurrent tasks that is node-killing memory pressure (measured: the
# 1M x k=10k fit fell from ~370 s to ~25 s once chunked).
_ARGMAX_CHUNK_CELLS = 8_000_000


def _cosine_argmax(embs: np.ndarray, cent: np.ndarray,
                   cnorm: np.ndarray) -> np.ndarray:
    """Argmax cosine row-per-embedding, float64, dot/(|a||b|) — the
    exact formula DuckDB's list_cosine_similarity evaluates, so oracle
    replays agree to the last ulp. np.argmax takes the FIRST max,
    which is the lowest cluster index = lowest label (rows are
    label-ordered), matching SQL's ORDER BY sim DESC, cluster ASC.
    Row-chunked so the sims transient stays ~64 MB whatever k is;
    chunking changes nothing numerically (each row's argmax is
    independent)."""
    k = cent.shape[0]
    step = max(1, _ARGMAX_CHUNK_CELLS // max(1, k))
    enorm = _unit_safe_norms(embs)
    out = np.empty(len(embs), dtype=np.int64)
    for off in range(0, len(embs), step):
        hi = min(off + step, len(embs))
        sims = (embs[off:hi] @ cent.T) / (enorm[off:hi, None]
                                          * cnorm[None, :])
        out[off:hi] = sims.argmax(axis=1)
    return out


def _cosine_topk(embs: np.ndarray, cent: np.ndarray,
                 cnorm: np.ndarray, p: int) -> np.ndarray:
    """Top-``p`` centroid INDICES per row by cosine, descending, exact
    ties by lowest index (stable argsort of -sims). Same chunk budget
    as ``_cosine_argmax``; returns an (n, p) int64 matrix. Used by
    multi-probe candidate generation (n_probe > 1), where a row is
    allowed to candidate in its p nearest cells."""
    k = cent.shape[0]
    p = min(p, k)
    step = max(1, _ARGMAX_CHUNK_CELLS // max(1, k))
    enorm = _unit_safe_norms(embs)
    out = np.empty((len(embs), p), dtype=np.int64)
    for off in range(0, len(embs), step):
        hi = min(off + step, len(embs))
        sims = (embs[off:hi] @ cent.T) / (enorm[off:hi, None]
                                          * cnorm[None, :])
        out[off:hi] = np.argsort(-sims, axis=1, kind="stable")[:, :p]
    return out


def _dedup_centroids(labels: np.ndarray, cent: np.ndarray):
    """Collapse duplicate centroid ROWS onto the lowest label. Needed
    for bit-exact tie semantics: BLAS matmuls are not column-position
    invariant (identical centroid columns can produce sims differing
    in the last ulp — measured on 1-row batches), so an argmax tie
    between identical centroids cannot be trusted to go low. SQL's
    replay gives every member of duplicate centroids to the lowest
    label (ORDER BY sim DESC, cluster ASC) and drops the emptied
    higher one — collapsing before assignment computes exactly that.
    ``labels`` must be sorted ascending (both callers sort), so
    np.unique's first-occurrence index IS the lowest label."""
    if len(labels) < 2:
        return labels, cent
    c = np.ascontiguousarray(cent)
    v = c.view([("", c.dtype)] * c.shape[1]).ravel()
    _, idx = np.unique(v, return_index=True)
    if len(idx) == len(labels):
        return labels, cent
    idx = np.sort(idx)
    return labels[idx], cent[idx]


def _batch_partials(labels: np.ndarray):
    """Per-batch partial for one Lloyd update: (cluster label,
    per-dimension sum as list<double>, member count). Segmented
    reduceat over the assignment-sorted batch — no per-row Python."""

    def _fn(cent: np.ndarray, cnorm: np.ndarray, batch: pa.Table,
            id_col: str, emb_col: str) -> pa.Table:
        dim = cent.shape[1]
        empty = pa.table({
            "cluster": pa.array([], pa.int64()),
            "vsum": pa.array([], pa.list_(pa.float64())),
            "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        embs = embedding_matrix(batch.column(emb_col)).astype(
            np.float64, copy=False)
        assign = _cosine_argmax(embs, cent, cnorm)
        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        starts = np.flatnonzero(np.diff(sa, prepend=sa[0] - 1))
        sums = np.add.reduceat(embs[order], starts, axis=0)
        cnts = np.diff(starts, append=len(sa))
        flat = pa.array(sums.ravel(), pa.float64())
        offs = pa.array(np.arange(0, (len(starts) + 1) * dim, dim,
                                  dtype=np.int64).astype(np.int32))
        return pa.table({
            "cluster": pa.array(labels[sa[starts]], pa.int64()),
            "vsum": pa.ListArray.from_arrays(offs, flat),
            "cnt": pa.array(cnts.astype(np.int64))})

    return _fn


def kmeans_fit(ds, init_ids=None, id_col: str = "vec_id",
               emb_col: str = "embedding", n_updates: int = 1,
               init_centroids: tuple[np.ndarray, np.ndarray]
               | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Fit spherical-k-means centroids over ``ds`` (see module note for
    the streaming-partial plan). Returns ``(labels, centroids)`` —
    int64 labels (the seed ids, minus any cluster that emptied) and
    the matching (k, d) float64 centroid matrix.

    Seeding: either ``init_ids`` (one pruned gather pass picks those
    rows' embeddings; labels = the ids) or ``init_centroids`` as an
    explicit ``(labels, matrix)`` pair — the no-scan path for seeding
    from a driver-side sample or a previous fit's output at 10^12-doc
    scale, where even a pruned gather pass is a full-corpus read."""
    import ray

    if init_centroids is not None:
        if init_ids is not None:
            raise ValueError(
                "kmeans_fit: pass init_ids or init_centroids, not both")
        labels, cent = init_centroids
        labels = np.asarray(labels, dtype=np.int64)
        cent = np.asarray(cent, dtype=np.float64)
        if cent.ndim != 2 or len(labels) != cent.shape[0]:
            raise ValueError(
                f"kmeans_fit: init_centroids shapes disagree "
                f"({len(labels)} labels vs {cent.shape} matrix)")
        if len(labels) == 0:
            raise ValueError("kmeans_fit: init_centroids is empty")
        if len(np.unique(labels)) != len(labels):
            raise ValueError("kmeans_fit: duplicate centroid labels")
        order = np.argsort(labels)
        labels, cent = labels[order], cent[order]
    else:
        init = sorted(int(i) for i in init_ids or [])
        if not init:
            raise ValueError("kmeans_fit: init_ids is empty")
        seed_set = pa.array(init, pa.int64())

        def _seed_rows(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.is_in(b.column(id_col), value_set=seed_set))

        seed = pa.concat_tables(
            [t for t in ray.get(
                ds.map_batches(_seed_rows, batch_format="pyarrow")
                .to_arrow_refs()) if t.num_rows],
            promote_options="permissive")
        if seed.num_rows != len(init):
            raise ValueError(
                f"kmeans_fit: init_ids matched {seed.num_rows} rows, "
                f"expected {len(init)} (duplicate or missing ids)")
        seed = seed.take(pc.sort_indices(seed.column(id_col)))
        labels = np.asarray(init, dtype=np.int64)
        cent = embedding_matrix(seed.column(emb_col)).astype(np.float64)

    labels, cent = _dedup_centroids(labels, cent)
    for _ in range(n_updates):
        cref = ray.put((labels, cent, _unit_safe_norms(cent)))
        partial = _batch_partials(labels)

        def _emit(batch: pa.Table, _ref=cref) -> pa.Table:
            import ray as _r

            lab, c, cn = _r.get(_ref)
            return partial(c, cn, batch, id_col, emb_col)

        def _combine_runs(t: pa.Table, starts: np.ndarray,
                          counts: np.ndarray) -> pa.Table:
            # segmented reduceat over all cluster runs in the bucket at
            # once — k is model-sized, but the house rule still holds:
            # no per-key Python (k=10^4+ cells is a realistic SemDeDup
            # config and 10^4 map_groups calls per update is the per-
            # key dispatch ops/bucketing.py exists to avoid)
            if t.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "cnt": pa.array([], pa.int64())})
            vs = embedding_matrix(t.column("vsum"))
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            dim = vs.shape[1]
            sums = np.add.reduceat(vs, starts, axis=0)
            flat = pa.array(sums.ravel(), pa.float64())
            offs = pa.array(np.arange(
                0, (len(starts) + 1) * dim, dim,
                dtype=np.int64).astype(np.int32))
            clusters = t.column("cluster").to_numpy(
                zero_copy_only=False)[starts]
            return pa.table({
                "cluster": pa.array(clusters, pa.int64()),
                "vsum": pa.ListArray.from_arrays(offs, flat),
                "cnt": pa.array(
                    np.add.reduceat(cnt, starts).astype(np.int64))})

        from raydoc.ops.bucketing import bucketed_sorted_apply

        rows = bucketed_sorted_apply(
            ds.map_batches(_emit, batch_format="pyarrow"),
            ["cluster"], [("cluster", "ascending")],
            _combine_runs).take_all()
        rows.sort(key=lambda r: r["cluster"])
        labels = np.array([r["cluster"] for r in rows], dtype=np.int64)
        cent = np.stack([
            np.asarray(r["vsum"], dtype=np.float64) / r["cnt"]
            for r in rows])
        labels, cent = _dedup_centroids(labels, cent)
    return labels, cent


def kmeans_assign(ds, init_ids=None, id_col: str = "vec_id",
                  emb_col: str = "embedding", n_updates: int = 1,
                  init_centroids=None):
    """Distributed k-means: fit (``kmeans_fit``) then ONE streaming
    assignment pass. Returns a Dataset of (id_col, cluster:int64) —
    cluster is the seed id of the winning centroid."""
    labels, cent = kmeans_fit(ds, init_ids, id_col=id_col,
                              emb_col=emb_col, n_updates=n_updates,
                              init_centroids=init_centroids)
    import ray

    cref = ray.put((labels, cent, _unit_safe_norms(cent)))

    def _assign(batch: pa.Table) -> pa.Table:
        import ray as _r

        lab, c, cn = _r.get(cref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        embs = embedding_matrix(batch.column(emb_col)).astype(
            np.float64, copy=False)
        a = _cosine_argmax(embs, c, cn)
        return pa.table({id_col: batch.column(id_col),
                         "cluster": pa.array(lab[a], pa.int64())})

    return ds.map_batches(_assign, batch_format="pyarrow")


def cluster_balanced_sample(ds, init_ids, k_per_cluster: int,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            n_updates: int = 1,
                            num_partitions: int | None = None,
                            init_centroids=None):
    """Diversity sampling by k-means cell: keep the ``k_per_cluster``
    lowest-id rows of every cluster — the embedding-space analogue of
    the per-host cap (group_top_k over data-adaptive cells instead of
    url hosts), the standard cluster-balanced data-mixing move (one
    cap per semantic region, so no region dominates the mixture).
    Returns (id_col, cluster) slim rows; ONE hash shuffle of slim
    tagged keys after the streaming Lloyd passes."""
    from raydoc.ops.relational import group_top_k

    labels, cent = kmeans_fit(ds, init_ids, id_col=id_col,
                              emb_col=emb_col, n_updates=n_updates,
                              init_centroids=init_centroids)
    import ray

    cref = ray.put((labels, cent, _unit_safe_norms(cent)))

    def _tag(batch: pa.Table) -> pa.Table:
        import ray as _r

        lab, c, cn = _r.get(cref)
        if batch.num_rows == 0:
            cl = pa.array([], pa.int64())
        else:
            embs = embedding_matrix(batch.column(emb_col)).astype(
                np.float64, copy=False)
            cl = pa.array(lab[_cosine_argmax(embs, c, cn)], pa.int64())
        return pa.Table.from_arrays([batch.column(id_col), cl],
                                    names=[id_col, "cluster"])

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return group_top_k(tagged, "cluster", id_col, k=k_per_cluster,
                       descending=False,
                       num_partitions=num_partitions)


def semantic_dedup_pairs(ds, init_ids=None, threshold: float = 0.9,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         n_updates: int = 1,
                         max_cluster_docs: int | None = None,
                         num_partitions: int | None = None,
                         max_key_rows: int | None = None,
                         init_centroids=None):
    """SemDeDup candidate pairs: k-means-cluster the embeddings, then
    verify exact cosine WITHIN each cluster only — the k-means cells
    play the role the random sign buckets play in
    ``embedding_near_dup_pairs``, trading the tunable plane count for
    data-adaptive cells (SemDeDup's observation: semantic duplicates
    co-locate in k-means cells far more reliably than in random
    projections at equal bucket counts).

    Output: (id_a, id_b) with id_a < id_b, same cluster, cosine >=
    threshold. ``max_cluster_docs`` star-pairs oversized clusters
    (mass-dup regime) exactly like minhash's ``max_bucket_docs``.
    """
    from raydoc.ops.bucketing import (bucketed_sorted_apply,
                                      capped_pair_indices,
                                      clique_pair_indices, pair_cosine)

    labels, cent = kmeans_fit(ds, init_ids, id_col=id_col,
                              emb_col=emb_col, n_updates=n_updates,
                              init_centroids=init_centroids)
    import ray

    cref = ray.put((labels, cent, _unit_safe_norms(cent)))

    def _tag(batch: pa.Table) -> pa.Table:
        import ray as _r

        lab, c, cn = _r.get(cref)
        if batch.num_rows == 0:
            cl = pa.array([], pa.int64())
        else:
            embs = embedding_matrix(batch.column(emb_col)).astype(
                np.float64, copy=False)
            cl = pa.array(lab[_cosine_argmax(embs, c, cn)], pa.int64())
        return pa.Table.from_arrays(
            [cl, batch.column(id_col), batch.column(emb_col)],
            names=["cluster", id_col, emb_col])

    tagged = ds.map_batches(_tag, batch_format="pyarrow")

    def _pairs(t: pa.Table, starts: np.ndarray,
               counts: np.ndarray) -> pa.Table:
        z = pa.array([], pa.int64())
        empty = pa.table({"id_a": z, "id_b": z})
        if t.num_rows == 0:
            return empty
        if max_cluster_docs is not None:
            ai, bi = capped_pair_indices(starts, counts,
                                         max_cluster_docs)
        else:
            ai, bi = clique_pair_indices(starts, counts)
        if len(ai) == 0:
            return empty
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        embs = embedding_matrix(t.column(emb_col))
        unit = embs / _unit_safe_norms(embs)[:, None]
        cs = pair_cosine(unit, ai, bi)
        keep = (cs >= threshold) & (ids[ai] != ids[bi])
        a, b = ids[ai[keep]], ids[bi[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64())})

    return bucketed_sorted_apply(
        tagged, ["cluster"],
        [("cluster", "ascending"), (id_col, "ascending")],
        _pairs, num_partitions=num_partitions,
        max_key_rows=max_key_rows)


def semantic_dedup(ds, init_ids=None, threshold: float = 0.9,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   n_updates: int = 1,
                   max_cluster_docs: int | None = None,
                   num_partitions: int | None = None,
                   max_key_rows: int | None = None,
                   init_centroids=None):
    """Drop semantic near-duplicates: victims are every id appearing
    as the GREATER id of any over-threshold same-cluster pair (the
    deterministic keep-the-lowest rule the exact/segment dedups use).
    Victim ids stay a Dataset; removal is the anti semi_join."""
    from raydoc.ops.relational import distinct_on, semi_join

    pairs = semantic_dedup_pairs(
        ds, init_ids, threshold=threshold, id_col=id_col,
        emb_col=emb_col, n_updates=n_updates,
        max_cluster_docs=max_cluster_docs,
        num_partitions=num_partitions, max_key_rows=max_key_rows,
        init_centroids=init_centroids)
    victims = distinct_on(
        pairs.select_columns(["id_b"])
        .map_batches(lambda b: b.rename_columns([id_col]),
                     batch_format="pyarrow"),
        id_col, bucketed=True)
    return semi_join(ds, victims, id_col, id_col, anti=True)
