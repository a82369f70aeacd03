"""Corpus-fit bigram-LM perplexity (ops/lm.py) — the CCNet-style
quality signal, integer fixed-point contract."""

import math

import pyarrow as pa
import pytest

from raydoc.ops.lm import fit_bigram_lm, lm_perplexity, score_perplexity

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "dog"),                      # < 2 tokens: zero bigrams
    (4, "the cat sat on the mat"),   # clone of 1: identical score
    (5, "zebra quantum flux"),       # all-rare bigrams: high nll
]


def _ds(parts=3):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [d[0] for d in DOCS],
        "text": [d[1] for d in DOCS]}))
    return ds.repartition(parts) if parts else ds


def _ref(frac_bits=16):
    toks = {d: t.strip().lower().split() for d, t in DOCS}
    uni, bi = {}, {}
    for tk in toks.values():
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for d, tk in toks.items():
        n, s = 0, 0
        for a, b in zip(tk, tk[1:]):
            p = (bi.get((a, b), 0) + 1) / (uni[a] + V)
            s += -math.floor(math.log(p) * (1 << frac_bits))
            n += 1
        out[d] = (n, s)
    return out


class TestLMPerplexity:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        ref = _ref()
        for parts in (1, 4):
            rows = lm_perplexity(_ds(parts)).take_all()
            got = {r["doc_id"]: (r["n_bigrams"], r["nll_fp"])
                   for r in rows}
            assert got == ref

    def test_clone_docs_tie_exactly_and_rare_scores_higher(self, ray_session):
        rows = {r["doc_id"]: r for r in lm_perplexity(_ds()).take_all()}
        assert rows[1]["nll_fp"] == rows[4]["nll_fp"]
        assert rows[3]["n_bigrams"] == 0 and rows[3]["nll_fp"] == 0
        # per-bigram cost: rare doc 5 above the common-phrase doc 1
        r5 = rows[5]["nll_fp"] / rows[5]["n_bigrams"]
        r1 = rows[1]["nll_fp"] / rows[1]["n_bigrams"]
        assert r5 > r1

    def test_score_new_docs_against_fitted_model(self, ray_session):
        import ray.data as rd

        model = fit_bigram_lm(_ds())
        new = rd.from_arrow(pa.table({
            "doc_id": [100, 101],
            "text": ["the cat sat", "unseen words entirely"]}))
        rows = {r["doc_id"]: r
                for r in score_perplexity(new, model).take_all()}
        # in-model phrase scores exactly as in the fit corpus
        ref = _ref()
        assert (rows[100]["n_bigrams"], rows[100]["nll_fp"]) == ref[2]
        # unseen unigrams back off to cu=0: p = (0+1)/(0+V), cost known
        V = model[4]
        cost = -math.floor(math.log(1 / V) * (1 << 16))
        assert rows[101]["nll_fp"] == 2 * cost

    def test_model_cap_fail_loud(self, ray_session):
        with pytest.raises(ValueError, match="max_model_rows"):
            fit_bigram_lm(_ds(), max_model_rows=3)

    def test_spec_op(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import run_spec

        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.table({
            "doc_id": [d for d, _ in DOCS],
            "text": [t for _, t in DOCS]}), src)
        out = run_spec({
            "source": {"op": "read_parquet", "path": src},
            "stages": [{"op": "lm_perplexity"}],
            "sink": {"op": "collect"}}).to_pandas()
        ref = _ref()
        got = {int(r.doc_id): (int(r.n_bigrams), int(r.nll_fp))
               for r in out.itertuples()}
        assert got == ref
