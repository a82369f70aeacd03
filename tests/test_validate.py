"""Data-expectation validation (ops/validate.py)."""

import pyarrow as pa
import pytest

from raydoc.ops.validate import validate_expectations


def _ds(parts=3):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 2, 3, 4, 4],
        "url": ["https://a.com", None, "https://b.com", "garbage",
                "https://c.com", "https://c.com"],
        "score": [5, 50, 500, None, 7, -1],
        "lang": ["en", "de", "xx", None, "en", "en"],
    }))
    return ds.repartition(parts) if parts else ds


RULES = [
    {"check": "not_null", "column": "url"},
    {"check": "unique", "column": "id"},
    {"check": "range", "column": "score", "min": 0, "max": 100},
    {"check": "regex", "column": "url", "pattern": "^https://"},
    {"check": "in_set", "column": "lang", "values": ["en", "de"]},
]

# hand-derived: url null=1; id dups: 2x2,4x2 -> 2 extra rows; score:
# null + 500 + -1 = 3; regex: null + garbage = 2; lang: xx + null = 2
EXPECT = {0: 1, 1: 2, 2: 3, 3: 2, 4: 2}


class TestValidateExpectations:
    def test_counts_and_partition_invariance(self, ray_session):
        for parts in (1, 4):
            rows = {r["rule_id"]: r for r in
                    validate_expectations(_ds(parts), RULES).take_all()}
            assert {i: rows[i]["n_violations"] for i in rows} == EXPECT
            assert all(r["n_rows"] == 6 for r in rows.values())
            assert all(not r["ok"] for r in rows.values())

    def test_clean_table_all_ok(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "id": [1, 2, 3], "v": [5, 6, 7]}))
        rows = validate_expectations(ds, [
            {"check": "unique", "column": "id"},
            {"check": "range", "column": "v", "min": 0, "max": 10},
        ]).take_all()
        assert all(r["ok"] and r["n_violations"] == 0 for r in rows)

    def test_unknown_check_fail_loud(self, ray_session):
        with pytest.raises(ValueError, match="unknown check"):
            validate_expectations(_ds(), [
                {"check": "sorted", "column": "id"}])
        with pytest.raises(ValueError, match="missing 'column'"):
            validate_expectations(_ds(), [{"check": "not_null"}])

    def test_spec_ops(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import run_spec

        src = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({
            "id": [1, 2, 2], "text": ["a b c", "a b", "zz yy"]}), src)
        ref = str(tmp_path / "ref.parquet")
        pq.write_table(pa.table({"text": ["a b c", "a b d"]}), ref)

        rep = run_spec({
            "source": {"op": "read_parquet", "path": src},
            "stages": [{"op": "expect", "rules": [
                {"check": "unique", "column": "id"},
                {"check": "not_null", "column": "text"}]}],
            "sink": {"op": "collect"}}).to_pandas()
        assert list(rep["n_violations"]) == [1, 0]

        dr = run_spec({
            "source": {"op": "read_parquet", "path": src},
            "stages": [{"op": "token_drift", "ref_path": ref,
                        "top_k": 2}],
            "sink": {"op": "collect"}}).to_pandas()
        assert set(dr["w"]) <= {"zz", "yy", "c"} and len(dr) == 2
