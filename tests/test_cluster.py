"""Unit tests for ops/cluster.py — distributed k-means and the
SemDeDup-style semantic near-dup pass built on it.

The reference has no clustering operator (nearest: flat vector search
in /root/reference/agent/component/retrieval.py:100-112); these pin
the engine-first contract: deterministic seeded Lloyd (ties to lowest
label, AVG centroid update, empty clusters dropped), k-means cells as
candidate blocks, star-capped pair expansion, Dataset-native victims.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _toy_ds(vecs, ids=None):
    import ray.data as rd

    ids = list(range(len(vecs))) if ids is None else list(ids)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))


class TestKmeans:
    def test_two_obvious_clusters(self, ray_session):
        from raydoc.ops.cluster import kmeans_assign

        # 2-d: four vectors near +x, four near +y; seeds one of each
        vecs = [(1, 0.01), (1, 0.02), (1, -0.01), (1, 0.03),
                (0.01, 1), (0.02, 1), (-0.01, 1), (0.03, 1)]
        out = kmeans_assign(_toy_ds(vecs), [0, 4], n_updates=2)
        got = {r["vec_id"]: r["cluster"] for r in out.take_all()}
        assert all(got[i] == 0 for i in range(4))
        assert all(got[i] == 4 for i in range(4, 8))

    def test_fit_deterministic_across_runs(self, ray_session):
        from raydoc.ops.cluster import kmeans_fit

        rng = np.random.RandomState(7)
        vecs = rng.standard_normal((60, 8))
        ds = _toy_ds(vecs)
        l1, c1 = kmeans_fit(ds, [0, 1, 2], n_updates=2)
        l2, c2 = kmeans_fit(ds, [0, 1, 2], n_updates=2)
        assert np.array_equal(l1, l2)
        # partial sums combine in nondeterministic block order; means
        # must still agree to float64 accumulation noise
        assert np.allclose(c1, c2, rtol=0, atol=1e-12)

    def test_empty_cluster_dropped(self, ray_session):
        from raydoc.ops.cluster import kmeans_fit

        # two IDENTICAL seed vectors: the duplicate collapses onto the
        # lower label before assignment (BLAS tie bits can't be
        # trusted — see _dedup_centroids), which is exactly what the
        # SQL tie rule computes: label 1 takes no members and drops.
        vecs = [(1, 0), (1, 0), (0.9, 0.1), (0.95, 0.05)]
        labels, cent = kmeans_fit(_toy_ds(vecs), [0, 1], n_updates=1)
        assert labels.tolist() == [0]
        assert cent.shape[0] == 1

    def test_bad_seed_ids_raise(self, ray_session):
        from raydoc.ops.cluster import kmeans_fit

        ds = _toy_ds([(1, 0), (0, 1)])
        with pytest.raises(ValueError, match="matched"):
            kmeans_fit(ds, [0, 99])
        with pytest.raises(ValueError, match="empty"):
            kmeans_fit(ds, [])

    def test_init_centroids_no_scan_path(self, ray_session):
        """Explicit (labels, matrix) seeding must equal id seeding —
        the no-scan path for 10^12-doc corpora — and validate shapes."""
        from raydoc.ops.cluster import kmeans_fit

        rng = np.random.RandomState(5)
        vecs = rng.standard_normal((50, 6))
        ds = _toy_ds(vecs)
        by_ids = kmeans_fit(ds, [0, 1, 2], n_updates=2)
        seed = vecs[:3].astype(np.float32).astype(np.float64)
        by_cent = kmeans_fit(
            ds, init_centroids=(np.array([0, 1, 2]), seed),
            n_updates=2)
        assert by_ids[0].tolist() == by_cent[0].tolist()
        assert np.allclose(by_ids[1], by_cent[1], rtol=0, atol=1e-12)
        with pytest.raises(ValueError, match="not both"):
            kmeans_fit(ds, [0], init_centroids=(np.array([0]), seed[:1]))
        with pytest.raises(ValueError, match="disagree"):
            kmeans_fit(ds, init_centroids=(np.array([0, 1]), seed[:1]))
        with pytest.raises(ValueError, match="duplicate"):
            kmeans_fit(ds, init_centroids=(np.array([0, 0]), seed[:2]))


class TestArgmaxKernelProperties:
    """Pure-kernel properties (no Ray): the chunked argmax is
    numerically identical to the unchunked form for ANY chunk size,
    and ties always resolve to the lowest centroid index — the two
    claims the oracle's bit-exactness rests on."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 12), st.integers(2, 16),
           st.integers(0, 2**31 - 1))
    def test_chunking_is_neutral(self, n, k, dim, seed):
        import raydoc.ops.cluster as cl

        rng = np.random.RandomState(seed)
        embs = rng.standard_normal((n, dim))
        cent = rng.standard_normal((k, dim))
        cnorm = cl._unit_safe_norms(cent)
        old = cl._ARGMAX_CHUNK_CELLS
        try:
            cl._ARGMAX_CHUNK_CELLS = 10 ** 9  # one chunk
            whole = cl._cosine_argmax(embs, cent, cnorm)
            cl._ARGMAX_CHUNK_CELLS = 1        # 1-row chunks
            rowwise = cl._cosine_argmax(embs, cent, cnorm)
        finally:
            cl._ARGMAX_CHUNK_CELLS = old
        assert whole.tolist() == rowwise.tolist()

    @settings(max_examples=100, deadline=None)
    @given(st.integers(1, 8), st.integers(2, 10),
           st.integers(0, 2**31 - 1))
    def test_duplicate_centroids_collapse_to_lowest(self, k, dim,
                                                    seed):
        """An argmax tie between IDENTICAL centroid columns cannot be
        trusted bit-wise (BLAS is not column-position invariant —
        hypothesis found 1-row matmuls where duplicate columns differ
        in the last ulp), so the engine collapses duplicates onto the
        lowest label before every assignment instead."""
        import raydoc.ops.cluster as cl

        rng = np.random.RandomState(seed)
        cent = rng.standard_normal((k, dim))
        labels = np.arange(2 * k, dtype=np.int64)
        got_l, got_c = cl._dedup_centroids(labels,
                                           np.vstack([cent, cent]))
        assert got_l.tolist() == list(range(k))
        assert np.array_equal(got_c, cent)
        # no duplicates: identity
        same_l, same_c = cl._dedup_centroids(labels[:k], cent)
        assert same_l.tolist() == list(range(k))
        assert np.array_equal(same_c, cent)


def _numpy_lloyd(vecs, init_ids, n_updates):
    """Driver-side reference Lloyd with the module's exact contract:
    argmax cosine (float64, first-max tie -> lowest label), AVG
    update, empty clusters dropped. Round through float32 first —
    that is what the Arrow list<float> column stores."""
    vecs = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    labels = np.array(sorted(init_ids), dtype=np.int64)
    cent = vecs[labels]
    for _ in range(n_updates):
        cn = np.linalg.norm(cent, axis=1)
        cn[cn == 0] = 1.0
        en = np.linalg.norm(vecs, axis=1)
        en[en == 0] = 1.0
        sims = (vecs @ cent.T) / (en[:, None] * cn[None, :])
        a = sims.argmax(axis=1)
        used = np.unique(a)
        labels = labels[used]
        cent = np.stack([vecs[a == u].mean(axis=0) for u in used])
    return labels, cent


class TestLloydParity:
    @pytest.mark.parametrize("n_updates", [1, 2, 3])
    def test_fit_matches_numpy_reference(self, ray_session, n_updates):
        """Multi-update parity: the streaming partial-sum fit must
        equal a driver-side reference Lloyd bit-for-bit in labels and
        to accumulation noise in centroids — pins the update-loop
        semantics the SQL oracle only covers at n_updates=1."""
        from raydoc.ops.cluster import kmeans_fit

        rng = np.random.RandomState(23)
        vecs = rng.standard_normal((120, 12))
        ds = _toy_ds(vecs)
        got_l, got_c = kmeans_fit(ds, [0, 3, 7, 11], n_updates=n_updates)
        exp_l, exp_c = _numpy_lloyd(vecs, [0, 3, 7, 11], n_updates)
        assert got_l.tolist() == exp_l.tolist()
        assert np.allclose(got_c, exp_c, rtol=0, atol=1e-10)

    def test_assign_preserves_only_id_and_cluster(self, ray_session):
        from raydoc.ops.cluster import kmeans_assign

        out = kmeans_assign(_toy_ds([(1, 0), (0, 1), (1, 0.1)]), [0, 1])
        t = out.schema()
        assert t.names == ["vec_id", "cluster"]


class TestClusterBalancedSample:
    def test_per_cell_cap(self, ray_session):
        from raydoc.ops.cluster import cluster_balanced_sample

        # 6 vectors near +x, 2 near +y; cap 3 per cell
        vecs = [(1, 0.01), (1, 0.02), (1, -0.01), (1, 0.03),
                (1, -0.02), (1, 0.015), (0.01, 1), (0.02, 1)]
        out = cluster_balanced_sample(_toy_ds(vecs), [0, 6],
                                      k_per_cluster=3)
        got = sorted((r["vec_id"], r["cluster"])
                     for r in out.take_all())
        assert got == [(0, 0), (1, 0), (2, 0), (6, 6), (7, 6)]


class TestSemanticDedup:
    def test_exact_clones_pruned(self, ray_session):
        from raydoc.ops.cluster import (semantic_dedup,
                                        semantic_dedup_pairs)

        rng = np.random.RandomState(11)
        base = rng.standard_normal((40, 16))
        vecs = np.vstack([base, base[:5]])  # ids 40..44 clone 0..4
        ids = list(range(40)) + [100 + i for i in range(5)]
        ds = _toy_ds(vecs, ids)
        pairs = semantic_dedup_pairs(ds, [0, 7, 19], threshold=0.99,
                                     n_updates=1)
        got = sorted((r["id_a"], r["id_b"]) for r in pairs.take_all())
        assert got == [(i, 100 + i) for i in range(5)]
        kept = semantic_dedup(ds, [0, 7, 19], threshold=0.99,
                              n_updates=1)
        assert sorted(r["vec_id"] for r in
                      kept.select_columns(["vec_id"]).take_all()) \
            == list(range(40))

    def test_mass_dup_cluster_star_capped(self, ray_session):
        from raydoc.ops.cluster import semantic_dedup_pairs

        # 50 identical vectors + 3 distinct: uncapped would emit
        # C(50,2)=1225 pairs; cap 10 emits the 49 star pairs
        vecs = [(1.0, 0.0)] * 50 + [(0.0, 1.0), (-1.0, 0.2),
                                    (0.1, -1.0)]
        ds = _toy_ds(vecs)
        pairs = semantic_dedup_pairs(ds, [0, 50], threshold=0.99,
                                     max_cluster_docs=10)
        got = sorted((r["id_a"], r["id_b"]) for r in pairs.take_all())
        assert got == [(0, j) for j in range(1, 50)]

    def test_max_key_rows_fail_loud(self, ray_session):
        from raydoc.ops.cluster import semantic_dedup_pairs

        vecs = [(1.0, 0.0)] * 20 + [(0.0, 1.0)]
        ds = _toy_ds(vecs)
        with pytest.raises(Exception, match="max_key_rows|exceeds"):
            semantic_dedup_pairs(ds, [0, 20], threshold=0.99,
                                 max_key_rows=5).take_all()


class TestKmeansFeedsIVF:
    def test_ivf_with_distributed_centroids(self, ray_session):
        """The scale-path link: knn_ivf / ann_join accept
        kmeans_fit's distributed centroids in place of a driver-side
        training sample, and planted near-clones stay recoverable."""
        import ray.data as rd

        from raydoc.ops.cluster import kmeans_fit
        from raydoc.ops.similarity import ann_join, knn_ivf

        rng = np.random.RandomState(41)
        base = rng.standard_normal((80, 16))
        base /= np.linalg.norm(base, axis=1)[:, None]
        # plant a tight clone of row 0 at id 200
        clone = base[0] + 0.001 * np.roll(base[0], 1)
        vecs = np.vstack([base, clone / np.linalg.norm(clone)])
        ids = list(range(80)) + [200]
        ds = _toy_ds(vecs, ids)

        _, cent = kmeans_fit(ds, [0, 17, 33, 55], n_updates=2)
        out = knn_ivf(ds, vecs[:1], k=2, n_probe=2, centroids=cent)
        got = sorted((r["rank"], r["vec_id"]) for r in out.take_all())
        assert got[0] == (1, 0) and got[1] == (2, 200)

        q = rd.from_arrow(pa.table({
            "query_id": pa.array([500], pa.int64()),
            "embedding": pa.array([vecs[0].tolist()],
                                  pa.list_(pa.float32()))}))
        j = ann_join(q, ds, k=2, n_probe=2, centroids=cent)
        jp = sorted((r["rank"], r["vec_id"]) for r in j.take_all())
        assert jp[0] == (1, 0) and jp[1] == (2, 200)


class TestBottomKSample:
    def test_mergeable_and_exact_size(self, ray_session):
        """The bottom-k invariant: bottom-k(A ∪ B) equals
        bottom-k(bottom-k(A) ∪ bottom-k(B)) — what makes the sample
        shuffle-free and resumable across shards; output size is
        exactly n; salt decorrelates."""
        import ray.data as rd

        from raydoc.ops.sampling import bottom_k_sample

        def _ds(lo, hi):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "v": pa.array([i * 2 for i in range(lo, hi)],
                              pa.int64())}))

        def _ids(ds, n, salt=0):
            return sorted(r["doc_id"] for r in bottom_k_sample(
                ds, "doc_id", n, salt).take_all())

        whole = _ids(_ds(0, 400), 25)
        a = bottom_k_sample(_ds(0, 200), "doc_id", 25)
        b = bottom_k_sample(_ds(200, 400), "doc_id", 25)
        merged = sorted(r["doc_id"] for r in bottom_k_sample(
            a.union(b), "doc_id", 25).take_all())
        assert whole == merged and len(whole) == 25
        assert _ids(_ds(0, 400), 25, salt=1) != whole
        # n larger than the input: everything, no crash
        assert len(_ids(_ds(0, 10), 25)) == 10

    def test_spec_op(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import run_spec

        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(100), pa.int64())}), p)
        out = run_spec({
            "source": {"op": "read_parquet", "path": p},
            "stages": [{"op": "bottom_k_sample", "key_col": "doc_id",
                        "n": 7}],
            "sink": {"op": "count"},
        })
        assert out == 7
