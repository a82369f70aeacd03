"""Tests for classifier doubles, hybrid retrieval, and the SQL-exec
stage."""

import numpy as np
import pyarrow as pa
import pytest

from raydoc.ops.classify import CategorizeStage, RelevantStage
from raydoc.ops.sql_exec import extract_sql


class TestClassify:
    def test_categorize_argmax_and_fallback(self):
        stage = CategorizeStage(
            {"a": ["apple"], "b": ["banana"], "z": ["zebra"]})
        b = pa.table({"text": [
            "apple apple banana",       # a wins 2-1
            "banana apple",             # tie 1-1 -> earlier category a
            "nothing matches here",     # zero hits -> LAST category z
        ]})
        assert stage(b).column("category").to_pylist() == ["a", "a", "z"]

    def test_relevant_min_overlap(self):
        stage = RelevantStage("vector hash join", min_overlap=2)
        b = pa.table({"text": ["vector and hash things", "vector only", ""]})
        assert stage(b).column("relevant").to_pylist() == ["yes", "no", "no"]


class TestExtractSql:
    def test_fenced(self):
        t = "Here you go:\n```sql\nSELECT a FROM t;\n``` hope it helps"
        assert extract_sql(t) == "SELECT a FROM t"

    def test_bare_select(self):
        assert extract_sql("blah SELECT x FROM y WHERE z > 1; trailing") == \
            "SELECT x FROM y WHERE z > 1"

    def test_passthrough(self):
        assert extract_sql("SELECT 1") == "SELECT 1"


@pytest.mark.usefixtures("ray_session")
class TestSqlExecStage:
    def test_execute_and_repair_loop(self, sf_dir):
        import ray.data as rd

        from raydoc.ops.sql_exec import SqlExecStage

        def repair(sql, err):
            # deterministic repair double: fix a known bad table name
            return sql.replace("ordrs", "orders") if "ordrs" in sql else None

        ds = rd.from_items([
            {"sql_text": "```sql\nSELECT count(*) AS n FROM orders;\n```"},
            {"sql_text": "SELECT count(*) AS n FROM ordrs;"},  # repaired
            {"sql_text": "SELECT broken syntax here"},          # error row
        ])
        out = ds.map_batches(
            SqlExecStage,
            fn_constructor_kwargs={
                "tables": {"orders": f"{sf_dir}/orders.parquet"},
                "repair_fn": repair,
            },
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        ok = out[out["status"] == "ok"]
        assert len(ok) == 2
        err = out[out["status"] != "ok"]
        assert len(err) == 1 and err.iloc[0]["n_rows"] == 0


@pytest.mark.usefixtures("ray_session")
class TestHybridRetrieval:
    def test_matches_brute_force(self):
        import ray.data as rd

        from raydoc.ops.retrieval import hybrid_retrieve

        rng = np.random.RandomState(1)
        texts = [f"doc {i} " + " ".join(
            rng.choice(list("abcdefgh"), 5)) for i in range(50)]
        embs = rng.standard_normal((50, 8))
        ds = rd.from_arrow(pa.table({
            "doc_id": list(range(50)), "text": texts,
            "embedding": [e.tolist() for e in embs]}))
        q = {"query_id": 0, "tokens": set(texts[3].split()),
             "vector": embs[3]}
        out = hybrid_retrieve(ds, [q], top_n=5).to_pandas().sort_values("rank")

        unit = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        cos = unit @ unit[3]
        qt = set(texts[3].split())
        tok = np.array([len(qt & set(t.split())) / len(qt) for t in texts])
        score = 0.7 * tok + 0.3 * cos
        expect = sorted(range(50), key=lambda i: (-score[i], i))[:5]
        assert list(out["doc_id"]) == expect
        assert out.iloc[0]["doc_id"] == 3  # self is the best hybrid match
