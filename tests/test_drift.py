"""Corpus drift: per-token smoothed log-odds (ops/drift.py)."""

import math

import pyarrow as pa

from raydoc.ops.drift import token_drift

A = ["spam spam casino casino casino win", "spam normal words here",
     "casino spam jackpot"]
B = ["normal words here again", "more normal prose words",
     "words about nothing"]


def _ds(texts, parts=2):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": texts}))
    return ds.repartition(parts) if parts else ds


def _ref(top_k, frac_bits=16):
    ca, cb = {}, {}
    for t in A:
        for w in t.strip().lower().split():
            ca[w] = ca.get(w, 0) + 1
    for t in B:
        for w in t.strip().lower().split():
            cb[w] = cb.get(w, 0) + 1
    vocab = sorted(set(ca) | set(cb))
    T1, T2, V = sum(ca.values()), sum(cb.values()), len(vocab)
    rows = []
    for w in vocab:
        c1, c2 = ca.get(w, 0), cb.get(w, 0)
        d = math.floor(math.log(((c1 + 1.0) * (T2 + V))
                                / ((c2 + 1.0) * (T1 + V)))
                       * (1 << frac_bits))
        rows.append((w, c1, c2, d))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:top_k]


class TestTokenDrift:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        ref = _ref(8)
        for parts in (1, 3):
            out = token_drift(_ds(A, parts), _ds(B, parts),
                              top_k=8).take_all()
            got = sorted(((r["w"], r["c1"], r["c2"], r["drift_fp"])
                          for r in out), key=lambda r: (-r[3], r[0]))
            assert got == ref

    def test_spam_tokens_lead(self, ray_session):
        out = token_drift(_ds(A), _ds(B), top_k=3).take_all()
        top = {r["w"] for r in out}
        assert "casino" in top and "spam" in top

    def test_direction_swap(self, ray_session):
        # swapped direction: B-only singletons all tie at ratio
        # (1+1)/(0+1); the alphabetical tiebreak picks them in order
        out = token_drift(_ds(B), _ds(A), top_k=3).take_all()
        got = sorted(((r["w"], r["drift_fp"]) for r in out),
                     key=lambda r: (-r[1], r[0]))
        assert [w for w, _ in got] == ["about", "again", "more"]
        assert len({d for _, d in got}) == 1  # exact integer tie

    def test_empty_side(self, ray_session):
        out = token_drift(_ds(A), _ds([""]), top_k=5).take_all()
        assert len(out) == 5  # everything overrepresented in A
        assert all(r["c2"] == 0 for r in out)


class TestDatasetDiff:
    def test_hand_built_diff(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import dataset_diff

        a = rd.from_arrow(pa.table({
            "k": [1, 2, 3, 4], "t": ["a", "b", "c", "d"]})).repartition(2)
        b = rd.from_arrow(pa.table({
            "k": [2, 3, 5], "t": ["b", "C", "e"]})).repartition(2)
        out = dataset_diff(a, b, "k", ["t"]).take_all()
        assert out == [{"n_a": 4, "n_b": 3, "n_added": 1,
                        "n_removed": 2, "n_changed": 1, "n_same": 1}]

    def test_identical_snapshots(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import dataset_diff

        a = rd.from_arrow(pa.table({
            "k": [1, 2], "t": ["x", None]}))
        out = dataset_diff(a, a, "k", ["t"]).take_all()
        assert out == [{"n_a": 2, "n_b": 2, "n_added": 0,
                        "n_removed": 0, "n_changed": 0, "n_same": 2}]

    def test_multi_column_compare(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import dataset_diff

        a = rd.from_arrow(pa.table({
            "k": [1, 2], "x": ["p", "q"], "y": [10, 20]}))
        b = rd.from_arrow(pa.table({
            "k": [1, 2], "x": ["p", "q"], "y": [10, 99]}))
        out = dataset_diff(a, b, "k", ["x", "y"]).take_all()
        assert out[0]["n_changed"] == 1 and out[0]["n_same"] == 1


class TestNumericDrift:
    def test_matches_numpy_reference(self, ray_session):
        import numpy as np
        import ray.data as rd

        from raydoc.ops.drift import numeric_drift

        rng = np.random.RandomState(7)
        a = rng.normal(0, 1, 400).round(2)
        b = rng.normal(0.4, 1.2, 250).round(2)
        out = numeric_drift(
            rd.from_arrow(pa.table({"x": a})).repartition(3),
            rd.from_arrow(pa.table({"x": b})).repartition(2),
            "x").take_all()[0]
        allv = np.sort(np.unique(np.concatenate([a, b])))
        Fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        Fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        assert out["n_a"] == 400 and out["n_b"] == 250
        assert abs(out["ks_num"] / out["ks_den"]
                   - np.abs(Fa - Fb).max()) < 1e-12

    def test_identical_distributions_zero(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import numeric_drift

        t = pa.table({"x": [1.0, 2.0, 3.0, 2.0]})
        out = numeric_drift(rd.from_arrow(t), rd.from_arrow(t),
                            "x").take_all()[0]
        assert out["ks_num"] == 0

    def test_disjoint_supports_ks_one(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import numeric_drift

        a = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
        b = rd.from_arrow(pa.table({"x": [10, 11]}))
        out = numeric_drift(a, b, "x").take_all()[0]
        assert out["ks_num"] == out["ks_den"] == 6

    def test_negative_floats_and_nan_null_excluded(self, ray_session):
        import ray.data as rd

        from raydoc.ops.drift import numeric_drift

        a = rd.from_arrow(pa.table(
            {"x": [-2.5, -0.5, 0.5, None, float("nan")]}))
        b = rd.from_arrow(pa.table({"x": [-2.5, -0.5, 0.5]}))
        out = numeric_drift(a, b, "x").take_all()[0]
        assert out["n_a"] == 3 and out["ks_num"] == 0

    def test_spec_op(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import run_spec

        src = str(tmp_path / "a.parquet")
        ref = str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"x": [1.0, 2.0, 3.0]}), src)
        pq.write_table(pa.table({"x": [1.0, 2.0, 3.0]}), ref)
        out = run_spec({
            "source": {"op": "read_parquet", "path": src},
            "stages": [{"op": "numeric_drift", "ref_path": ref,
                        "column": "x"}],
            "sink": {"op": "collect"}}).to_pandas()
        assert int(out["ks_num"][0]) == 0
