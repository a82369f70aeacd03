"""Round-3 additions: coarse-bucket grouped execution (ops/bucketing),
carry-in running aggregates, Jinja2 template rendering, and the
segment_dedup null-text pin (ADVICE r02)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestBucketingUnits:
    def test_run_segments_null_safe_multi_key(self):
        from raydoc.ops.bucketing import run_segments

        t = pa.table({
            "a": pa.array([1, 1, 1, None, None, 2], pa.int64()),
            "b": pa.array(["x", "x", "y", "y", "y", "y"], pa.string()),
        })
        starts, counts = run_segments(t, ["a", "b"])
        assert starts.tolist() == [0, 2, 3, 5]
        assert counts.tolist() == [2, 1, 2, 1]

    def test_run_segments_empty(self):
        from raydoc.ops.bucketing import run_segments

        t = pa.table({"a": pa.array([], pa.int64())})
        starts, counts = run_segments(t, ["a"])
        assert len(starts) == 0 and len(counts) == 0

    def test_key_hash_uint64_above_2_63(self):
        from raydoc.ops.bucketing import key_hash_u64

        t = pa.table({"k": pa.array([2**63 + 5, 7, None], pa.uint64())})
        h = key_hash_u64(t, ["k"])
        assert h.dtype == np.uint64 and len(h) == 3

    def test_hash_apply_small_and_empty_buckets(self, ray_session):
        # 3 distinct keys << default P: most buckets are EMPTY — the
        # apply must survive and the output must stay joinable
        from raydoc.ops.bucketing import bucketed_hash_apply

        t = pa.table({"k": pa.array([1, 2, 3, 1], pa.int64()),
                      "v": pa.array([10, 20, 30, 40], pa.int64())})

        def _agg(b: pa.Table) -> pa.Table:
            g = b.group_by(["k"]).aggregate([("v", "sum")])
            return g.rename_columns(["k", "s"])

        out = bucketed_hash_apply(_ds(t), ["k"], _agg)
        joined = out.join(_ds(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                        "name": ["a", "b", "c"]})),
                          join_type="inner", num_partitions=4, on=("k",))
        got = {r["k"]: (r["s"], r["name"]) for r in joined.take_all()}
        assert got == {1: (50, "a"), 2: (20, "b"), 3: (30, "c")}


class TestRunningAggCarry:
    @pytest.mark.parametrize("fn", ["sum", "count", "min", "max"])
    def test_matches_plain_running_agg_on_one_giant_key(self, ray_session, fn):
        import ray.data as rd

        from raydoc.ops.window import running_agg, running_agg_carry

        rng = np.random.RandomState(3)
        n = 5000
        t = pa.table({
            "user": pa.array(["mega"] * (n - 100) + ["tiny"] * 100),
            "ts": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.randint(-50, 50, size=n).astype(np.float64)),
        })
        # many small blocks so one key genuinely spans blocks
        ds = rd.from_arrow(t).repartition(16)
        a = running_agg(ds, "user", ["ts"], "v", out_col="r", fn=fn) \
            .to_pandas().sort_values(["user", "ts"]).reset_index(drop=True)
        b = running_agg_carry(ds, "user", ["ts"], "v", out_col="r", fn=fn,
                              num_range_parts=8) \
            .to_pandas().sort_values(["user", "ts"]).reset_index(drop=True)
        assert len(a) == len(b) == n
        assert np.allclose(a["r"].astype(float), b["r"].astype(float))

    def test_boundary_equal_order_values_stay_together(self, ray_session):
        # equal order values must land in ONE range slice (strict
        # boundary), so the scan over them is unaffected
        import ray.data as rd

        from raydoc.ops.window import running_agg, running_agg_carry

        t = pa.table({
            "user": pa.array(["u"] * 12),
            "ts": pa.array([0, 0, 1, 1, 1, 2, 2, 3, 3, 3, 3, 4], pa.int64()),
            "eid": pa.array(list(range(12)), pa.int64()),
            "v": pa.array([1.0] * 12),
        })
        ds = rd.from_arrow(t).repartition(4)
        a = running_agg(ds, "user", ["ts", "eid"], "v", out_col="r") \
            .to_pandas().sort_values("eid")["r"].tolist()
        b = running_agg_carry(ds, "user", ["ts", "eid"], "v", out_col="r",
                              num_range_parts=3) \
            .to_pandas().sort_values("eid")["r"].tolist()
        assert a == b == [float(i + 1) for i in range(12)]


class TestWindowFamilyVsPandas:
    """Plan-agreement property checks: the bucketed window kernels must
    match pandas' reference scans on adversarial inputs the events
    oracle table lacks — null values, duplicate order keys, single-row
    and singleton-session groups."""

    @staticmethod
    def _table(seed: int, n: int = 400, n_keys: int = 37) -> pa.Table:
        rng = np.random.RandomState(seed)
        vals = rng.randint(-9, 9, size=n).astype(np.float64)
        vals[rng.rand(n) < 0.05] = np.nan  # nulls in the value column
        return pa.table({
            "k": pa.array(rng.randint(0, n_keys, size=n).astype(np.int64)),
            "o": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(vals, pa.float64(), from_pandas=True),
        })

    @staticmethod
    def _duck_window(t: pa.Table, expr: str) -> np.ndarray:
        import duckdb

        con = duckdb.connect()
        con.register("t", t)
        return con.execute(
            f"SELECT {expr} OVER (PARTITION BY k ORDER BY o) AS r "
            "FROM t ORDER BY k, o").fetchdf()["r"].to_numpy(dtype=float)

    def test_running_scans_match_duckdb_with_nulls(self, ray_session):
        # SQL semantics: NULL values are skipped, never poison the scan
        from raydoc.ops.window import running_agg

        t = self._table(1)
        for fn, expr in (("sum", "sum(v)"), ("count", "count(v)"),
                         ("min", "min(v)"), ("max", "max(v)")):
            got = running_agg(_ds(t), "k", ["o"], "v", out_col="r", fn=fn) \
                .to_pandas().sort_values(["k", "o"])["r"].to_numpy(float)
            want = self._duck_window(t, expr)
            assert np.allclose(got, want, equal_nan=True), fn

    def test_group_rank_with_sort_ties(self, ray_session):
        import pandas as pd

        from raydoc.ops.window import group_rank

        rng = np.random.RandomState(2)
        t = pa.table({
            "k": pa.array(rng.randint(0, 9, 200).astype(np.int64)),
            "s": pa.array(rng.randint(0, 5, 200).astype(np.int64)),  # ties
            "tb": pa.array(np.arange(200, dtype=np.int64)),
        })
        out = group_rank(_ds(t), "k", "s", out_col="rn",
                         descending=True, tiebreak="tb") \
            .to_pandas().sort_values(["k", "rn"])
        pdf = t.to_pandas().sort_values(
            ["k", "s", "tb"], ascending=[True, False, True])
        pdf["rn"] = pdf.groupby("k").cumcount() + 1
        a = out[["k", "s", "tb", "rn"]].reset_index(drop=True)
        b = pdf.sort_values(["k", "rn"])[["k", "s", "tb", "rn"]] \
            .reset_index(drop=True)
        assert a.equals(b)

    def test_rolling_matches_duckdb_with_nulls(self, ray_session):
        import duckdb

        from raydoc.ops.window import rolling_agg

        t = self._table(3)
        con = duckdb.connect()
        con.register("t", t)
        for fn, expr in (("mean", "avg(v)"), ("sum", "sum(v)"),
                         ("min", "min(v)"), ("max", "max(v)")):
            got = rolling_agg(_ds(t), "k", ["o"], "v", window=4,
                              out_col="r", fn=fn) \
                .to_pandas().sort_values(["k", "o"])["r"].to_numpy(float)
            want = con.execute(
                f"SELECT {expr} OVER (PARTITION BY k ORDER BY o ROWS "
                "BETWEEN 3 PRECEDING AND CURRENT ROW) AS r "
                "FROM t ORDER BY k, o").fetchdf()["r"].to_numpy(dtype=float)
            assert np.allclose(got, want, equal_nan=True), fn

    def test_sessionize_singletons_and_one_key(self, ray_session):
        from raydoc.ops.window import sessionize

        ts = pa.array(
            np.array([0, 10**9, 3 * 10**9, 10 ** 13], dtype="datetime64[us]"
                     ).astype("datetime64[us]"))
        t = pa.table({"u": pa.array([7, 7, 7, 7], pa.int64()), "ts": ts})
        out = sessionize(_ds(t), "u", "ts", gap_minutes=1.0) \
            .to_pandas().sort_values("session_id")
        # gaps: 1000s and ~larger => 3 sessions (first two events 1000s
        # apart > 60s gap => separate)
        assert list(out["n_events"]) == [1, 1, 1, 1]
        assert list(out["session_id"]) == [1, 2, 3, 4]

    def test_pack_sequences_exclusive_prefix(self, ray_session):
        from raydoc.ops.window import pack_sequences

        t = pa.table({
            "lang": pa.array(["en"] * 5 + ["de"] * 3),
            "i": pa.array(list(range(8)), pa.int64()),
            "tok": pa.array([600, 600, 600, 600, 600, 2000, 100, 2000],
                            pa.int64()),
        })
        out = pack_sequences(_ds(t), "tok", 2048, ["i"], key_col="lang") \
            .to_pandas().sort_values("i")
        # en: starts 0,600,1200,1800,2400 -> packs 0,0,0,0,1
        # de: starts 0,2000,2100 -> packs 0,0,1
        assert list(out["pack_id"]) == [0, 0, 0, 0, 1, 0, 0, 1]


class TestJinjaTemplates:
    def test_conditional_and_literal_passes(self):
        from raydoc.ops.template import render_batch

        b = pa.table({"name": ["ann", "bo"], "bal": [5.0, -2.0]})
        out = render_batch(
            b, "{% if bal >= 0 %}OK{% else %}NEG{% endif %} {name}")
        assert out.column("rendered").to_pylist() == ["OK ann", "NEG bo"]

    def test_loop_render(self):
        from raydoc.ops.template import render_batch

        b = pa.table({"tags": [["a", "b"], ["c"]]})
        out = render_batch(b, "{% for t in tags %}<{{ t }}>{% endfor %}")
        assert out.column("rendered").to_pylist() == ["<a><b>", "<c>"]

    def test_render_error_passes_template_through(self):
        # StrictUndefined + swallowed exception = reference parity
        # (template.py:123-125): unrendered content survives
        from raydoc.ops.template import render_batch

        b = pa.table({"name": ["x"]})
        out = render_batch(b, "{% if nope %}y{% endif %} {name}")
        assert out.column("rendered").to_pylist() == [
            "{% if nope %}y{% endif %} x"]

    def test_plain_templates_skip_jinja(self):
        from raydoc.ops.template import jinja_template

        tpl, refs = jinja_template("hello {name}")
        assert tpl is None and refs == frozenset()

    def test_canvas_render_conditional(self):
        from raydoc.pipelines.canvas import _render

        out = _render(
            "{% if mood == 'good' %}great{% else %}meh{% endif %} {user}",
            {"mood": "good", "user": "ann"})
        assert out == "great ann"
        out2 = _render("{{ gen }}!", {"gen:0": "hi"})
        assert out2 == "hi!"


class TestSpecFileSources:
    def test_csv_and_json_sources(self, ray_session, tmp_path):
        import json as _json

        import pandas as pd

        from raydoc.pipelines.spec import run_spec

        df = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
        csv = str(tmp_path / "t.csv")
        df.to_csv(csv, index=False)
        jsonl = str(tmp_path / "t.json")
        with open(jsonl, "w") as f:
            for r in df.to_dict("records"):
                f.write(_json.dumps(r) + "\n")
        for path, op in ((csv, "read_csv"), (jsonl, "read_json")):
            out = run_spec({
                "source": {"op": op, "path": path},
                "stages": [{"op": "grouped_agg", "keys": ["k"],
                            "aggs": {"s": {"fn": "sum", "column": "v"}}}],
                "sink": {"op": "collect"},
            }).to_pandas().sort_values("k").reset_index(drop=True)
            assert list(out["k"]) == ["a", "b"]
            assert list(out["s"]) == [4, 2]


class TestGroupedOpsNullKeysVsDuckdb:
    """Null KEY handling: Arrow's hash group-by and DuckDB both treat
    NULL as one group — pin the bucketed plans to that."""

    @staticmethod
    def _t():
        rng = np.random.RandomState(7)
        k = rng.randint(0, 9, 300).astype(np.float64)
        k[rng.rand(300) < 0.1] = np.nan
        return pa.table({
            "k": pa.array(k, pa.float64(), from_pandas=True),
            "v": pa.array(rng.randint(0, 100, 300).astype(np.int64)),
        })

    def test_grouped_agg_null_keys(self, ray_session):
        import duckdb

        from raydoc.ops.relational import grouped_agg

        t = self._t()
        got = grouped_agg(_ds(t), ["k"], {"s": ("sum", "v"),
                                          "n": ("count", "v")}) \
            .to_pandas().sort_values("k", na_position="last") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT k, sum(v) AS s, count(v) AS n FROM t GROUP BY k "
            "ORDER BY k NULLS LAST").fetchdf()
        assert len(got) == len(want)
        assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
        assert (got["n"].to_numpy() == want["n"].to_numpy()).all()

    def test_group_top_k_null_keys(self, ray_session):
        from raydoc.ops.relational import group_top_k

        t = self._t()
        out = group_top_k(_ds(t), "k", "v", k=2, descending=True,
                          tiebreak="v").to_pandas()
        # the null-key group also yields <= 2 rows
        nulls = out[out["k"].isna()]
        assert 1 <= len(nulls) <= 2
        per = out.groupby("k", dropna=False).size()
        assert (per <= 2).all()


class TestConnectedComponentsConvergence:
    def test_non_convergence_raises_instead_of_wrong_labels(self, ray_session):
        import ray.data as rd

        from raydoc.ops.graph import connected_components

        n = 12  # chain of diameter 11 > max_rounds=3
        t = pa.table({"id_a": pa.array(np.arange(n - 1), pa.int64()),
                      "id_b": pa.array(np.arange(1, n), pa.int64())})
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(rd.from_arrow(t), max_rounds=3) \
                .materialize()
        # and with enough rounds the same chain resolves to min-id 0
        out = connected_components(rd.from_arrow(t), max_rounds=16) \
            .to_pandas()
        assert set(out["cluster_id"]) == {0} and len(out) == n


class TestSuffixLoopDetection:
    def test_find_loop_detects_two_node_cycle(self):
        from raydoc.pipelines.canvas import _find_loop

        path = ["begin", "gen:0", "switch:0"] + \
            ["gen:0", "switch:0"] * 8
        got = _find_loop(path)
        assert got and "switch => gen" in got

    def test_find_loop_ignores_answer_boundary(self):
        from raydoc.pipelines.canvas import _find_loop

        # repeats BEFORE an answer are dialogue turns, not a cycle
        path = (["gen:0", "switch:0"] * 8) + ["answer:0", "gen:0"]
        assert _find_loop(path) is False

    def test_find_loop_short_paths_and_no_repeat(self):
        from raydoc.pipelines.canvas import _find_loop

        assert _find_loop(["a"]) is False
        assert _find_loop(["a", "b", "c", "d"]) is False

    def test_cyclic_canvas_raises_overflow_with_pattern(self):
        from raydoc.pipelines.canvas import run_canvas

        # generate:0 <-> generate:1 ping-pong with no router exit
        dsl = {"components": {
            "begin": {"obj": {"component_name": "Begin", "params": {}},
                      "downstream": ["answer:0"], "upstream": []},
            "answer:0": {"obj": {"component_name": "Answer", "params": {}},
                         "downstream": ["generate:0"], "upstream": ["begin"]},
            "generate:0": {"obj": {"component_name": "Generate",
                                   "params": {"llm_id": "x"}},
                           "downstream": ["generate:1"],
                           "upstream": ["answer:0", "generate:1"]},
            "generate:1": {"obj": {"component_name": "Generate",
                                   "params": {"llm_id": "x"}},
                           "downstream": ["generate:0"],
                           "upstream": ["generate:0"]},
        }}
        with pytest.raises(OverflowError, match="generate"):
            run_canvas(dsl, user_inputs=["hi"])


class TestSegmentDedupNullPin:
    @pytest.mark.parametrize("cap", [10**9, 0])
    def test_null_text_docs_drop_in_both_plans(self, ray_session, cap):
        from raydoc.ops.dedup import segment_dedup

        boiler = " ".join(f"b{i}" for i in range(8))
        ids, texts = [], []
        for d in range(30):
            ids.append(d)
            texts.append(boiler + " " + " ".join(
                f"u{d}w{i}" for i in range(9)))
        ids.append(99)
        texts.append(None)
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = segment_dedup(_ds(t), "text", "doc_id", broadcast_cap=cap) \
            .to_pandas()
        assert 99 not in set(out["doc_id"])
        assert len(out) == 30
        assert (out["n_removed"] >= 1).all()  # boilerplate gone everywhere
