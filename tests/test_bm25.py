"""Corpus-scale integer fixed-point BM25 (ops/retrieval.bm25_topk)."""

import math

import pyarrow as pa
import pytest

from raydoc.ops.retrieval import bm25_topk

DOCS = [
    (1, "fast hash join beats slow scan"),
    (2, "hash join hash join hash join"),          # high tf
    (3, "the slow table scan of a big table"),
    (4, "fast fast fast unrelated words here now"),
    (5, ""),                                        # empty doc
    (6, "hash join beats slow scan"),               # near-clone of 1
]


def _ds(parts=3):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [d[0] for d in DOCS],
        "text": [d[1] for d in DOCS]}))
    return ds.repartition(parts) if parts else ds


def _ref(queries, k):
    """Driver-side replay of the documented integer contract."""
    k1n, k1d, bn, bd = 12, 10, 3, 4
    toks = [d[1].strip().lower().split() if d[1].strip() else [""]
            for d in DOCS]
    # contract tokenization: \s+ split of trim(lower(text)); an empty
    # doc yields [''] (one empty token), matching Arrow/DuckDB split
    dl = [len(t) for t in toks]
    N, L = len(DOCS), sum(dl)
    avgdl_fp = (L << 10) // N
    out = []
    for qi, q in enumerate(queries):
        terms = sorted({w for w in q.lower().split() if w})
        scored = []
        for (did, _), tk, d in zip(DOCS, toks, dl):
            s = 0
            for t in terms:
                tf = tk.count(t)
                if tf == 0:
                    continue
                df = sum(1 for tk2 in toks if t in tk2)
                idf = math.floor(
                    math.log(1.0 + (N - df + 0.5) / (df + 0.5)) * 65536)
                num = idf * (k1n + k1d) * bd * tf * avgdl_fp
                den = (k1d * bd * tf * avgdl_fp
                       + k1n * (bd - bn) * avgdl_fp
                       + ((k1n * bn) << 10) * d)
                s += num // den
            if s > 0:
                scored.append((-s, did))
        scored.sort()
        for rk, (negs, did) in enumerate(scored[:k], 1):
            out.append((qi, rk, did, -negs))
    return sorted(out)


class TestBM25:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        queries = ["hash join", "fast scan", "table"]
        ref = _ref(queries, 3)
        for parts in (1, 4):
            rows = bm25_topk(_ds(parts), queries, top_n=3).take_all()
            got = sorted((r["query_id"], r["rank"], r["doc_id"],
                          r["score_fp"]) for r in rows)
            assert got == ref

    def test_tf_saturation_and_idf(self, ray_session):
        # doc 2 repeats "hash join" 3x but BM25 tf-saturates; doc 1 and
        # 6 match both terms once — all three rank above non-matches,
        # and the shorter doc 6 outranks doc 1 (length normalization)
        rows = bm25_topk(_ds(), ["hash join"], top_n=6).take_all()
        order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert set(order) == {1, 2, 6}
        assert order.index(6) < order.index(1)

    def test_no_match_query_emits_nothing(self, ray_session):
        rows = bm25_topk(_ds(), ["zzz missing", "hash"], top_n=3).take_all()
        assert {r["query_id"] for r in rows} == {1}

    def test_empty_queries_fail_loud(self, ray_session):
        with pytest.raises(ValueError, match="no terms"):
            bm25_topk(_ds(), ["", "   "])

    def test_tie_breaks_on_doc_id(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": [10, 7, 3],
            "text": ["same words here"] * 3}))
        rows = bm25_topk(ds, ["same words"], top_n=3).take_all()
        order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert order == [3, 7, 10]
        assert len({r["score_fp"] for r in rows}) == 1  # exact int tie


class TestRetrievalEval:
    def _results(self):
        import ray.data as rd

        rows = []
        for q, docs in ((0, [7, 3, 9]), (1, [4, 5, 6]), (2, [1, 2, 8])):
            for rk, d in enumerate(docs, 1):
                rows.append({"query_id": q, "rank": rk, "doc_id": d})
        return rd.from_items(rows).repartition(2)

    def test_recall_and_integer_mrr(self, ray_session):
        from raydoc.ops.retrieval import retrieval_eval

        gold = pa.table({
            "query_id": [0, 0, 1, 2, 3],
            "doc_id": [9, 3, 99, 8, 1]})  # q0: best rank 2; q1 miss;
        # q2: rank 3; q3: gold query absent from results
        out = retrieval_eval(self._results(), gold, k=3).take_all()
        assert out == [{"n_queries": 4, "n_hit": 2,
                        "mrr_fp": 10**9 // 2 + 10**9 // 3}]

    def test_k_boundary(self, ray_session):
        from raydoc.ops.retrieval import retrieval_eval

        gold = pa.table({"query_id": [0], "doc_id": [9]})  # rank 3
        out2 = retrieval_eval(self._results(), gold, k=2).take_all()
        assert out2[0]["n_hit"] == 0 and out2[0]["mrr_fp"] == 0
        out3 = retrieval_eval(self._results(), gold, k=3).take_all()
        assert out3[0]["n_hit"] == 1

    def test_empty_gold(self, ray_session):
        from raydoc.ops.retrieval import retrieval_eval

        out = retrieval_eval(
            self._results(),
            pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})).take_all()
        assert out == [{"n_queries": 0, "n_hit": 0, "mrr_fp": 0}]


class TestUnicode:
    def test_unicode_terms_and_case_fold(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3],
            "text": ["danke schön für alles", "中文 文档 内容 here",
                     "plain english text"]}))
        out = bm25_topk(ds, ["SCHÖN danke", "中文 内容"], top_n=2).take_all()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["doc_id"])
        assert by_q[0] == [1] and by_q[1] == [2]
