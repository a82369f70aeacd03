"""Corpus-fit n-gram LM perplexity — the CCNet-style quality signal.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the
perplexity of a language model and keeps the head of the distribution;
every serious pretraining pipeline since applies some LM-quality
filter. The reference engine has no LM scoring at all; this module
adds the self-contained version a sandboxed engine can run: fit a
bigram LM on the corpus ITSELF (two distributed count passes), then
score every document's negative log-likelihood under it — boilerplate
and keyword-stuffed pages sit in the tails, mid-corpus prose in the
head.

Model contract (mirrored exactly by the generated SQL oracle,
queries.docs_lm_perplexity):

- tokens: ``\\s+`` split of trim(lower(text)) — the engine-standard
  (hash-green) tokenization; bigrams are consecutive in-doc pairs (no
  padding; docs with < 2 tokens have 0 bigrams);
- counts: corpus-wide unigram counts c(w), bigram counts c(w1,w2),
  vocabulary size V = distinct unigram count — exact integers;
- add-one smoothed conditional: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V);
- per-bigram cost, integer fixed-point: nll_fp(w1,w2) =
  -floor(ln((c+1)/(cu+V)) * 2**frac_bits)  (ln of an exact rational —
  the same single-float-step discipline as bm25_topk's idf; a floor
  boundary flip needs ln to land within ~1e-9 of the 2**-frac_bits
  grid);
- doc score = SUM of nll_fp over its bigrams — an ORDER-INDEPENDENT
  int64, bit-identical under any partitioning and exactly replayable
  in DuckDB. Downstream filters compare nll_fp * 2**frac_bits-scaled
  thresholds or the normalized nll_fp // n_bigrams.

Physical plan: counting is two ``grouped_agg`` passes over slim token
/ bigram-key rows (partial-aggregated per batch before the shuffle);
the fitted model (vocab + observed-bigram table) is ``ray.put`` once
and each scoring task probes it with hash ``index_in`` kernels — no
per-row Python, no text shuffle. The documented assumption is the
MODEL fits a worker (observed bigrams of a 10^12-token corpus do not —
at that scale fit on a sample, which is exactly what CCNet does:
its Wikipedia LM is a tiny fraction of CC), enforced fail-loud by
``max_model_rows``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["fit_bigram_lm", "score_perplexity", "lm_perplexity"]

_SEP = "\x1f"  # joins (w1, w2) into one probe key; never in \s+ tokens


def _tokens(batch: pa.Table, text_col: str):
    s = pc.cast(batch.column(text_col), pa.string())
    return pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(s)), r"\s+")


def _bigram_keys(toks):
    """Flatten a token-list array into per-bigram (join key, first
    word, doc index) triples — consecutive in-doc pairs only."""
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(flat)
    empty = (pa.array([], pa.string()), pa.array([], pa.string()),
             np.empty(0, dtype=np.int64))
    if n < 2:
        return empty
    same = parent[1:] == parent[:-1]
    w1 = flat.slice(0, n - 1)
    w2 = flat.slice(1, n)
    keys = pc.binary_join_element_wise(w1, w2, _SEP)
    keep = pa.array(same)
    return (keys.filter(keep), w1.filter(keep), parent[:-1][same])


def fit_bigram_lm(ds, text_col: str = "text",
                  max_model_rows: int = 50_000_000,
                  num_partitions: int | None = None):
    """Fit the contract's bigram LM over ``ds``; returns the model as
    ``(uni_words, uni_counts, bi_keys, bi_counts, V)`` with the word /
    key arrays Arrow-sorted (probe via ``pc.index_in``). Fail-loud at
    ``max_model_rows`` total rows — past that, fit on a hash-sampled
    subset (``ops.sampling.hash_sample``), the CCNet shape."""
    import ray

    from raydoc.ops.relational import grouped_agg, nonempty_batches

    def _uni(b: pa.Table) -> pa.Table:
        toks = _tokens(b, text_col)
        return pa.Table.from_pydict({"w": pc.list_flatten(toks)})

    def _bi(b: pa.Table) -> pa.Table:
        keys, _w1, _d = _bigram_keys(_tokens(b, text_col))
        return pa.Table.from_pydict({"k": keys})

    uni = grouped_agg(
        ds.map_batches(nonempty_batches(_uni), batch_format="pyarrow"),
        ["w"], {"c": ("count", "w")}, num_partitions=num_partitions)
    bi = grouped_agg(
        ds.map_batches(nonempty_batches(_bi), batch_format="pyarrow"),
        ["k"], {"c": ("count", "k")}, num_partitions=num_partitions)

    def _collect(d, limit):
        rows = d.limit(limit + 1).take_all()
        if len(rows) > limit:
            raise ValueError(
                f"fit_bigram_lm: model exceeds max_model_rows="
                f"{max_model_rows}; fit on a hash_sample of the corpus "
                "(the CCNet shape) or raise the cap")
        return rows

    urows = _collect(uni, max_model_rows)
    brows = _collect(bi, max_model_rows - len(urows))
    uw = pa.array([r["w"] for r in urows], pa.string())
    uc = np.array([r["c"] for r in urows], dtype=np.int64)
    order = pc.sort_indices(uw)
    uw = uw.take(order)
    uc = uc[order.to_numpy(zero_copy_only=False)]
    bk = pa.array([r["k"] for r in brows], pa.string())
    bc = np.array([r["c"] for r in brows], dtype=np.int64)
    order = pc.sort_indices(bk)
    bk = bk.take(order)
    bc = bc[order.to_numpy(zero_copy_only=False)]
    return uw, uc, bk, bc, len(uw)


def score_perplexity(ds, model, text_col: str = "text",
                     id_col: str = "doc_id", frac_bits: int = 16):
    """Append ``n_bigrams`` and the integer ``nll_fp`` per doc under a
    fitted model (see module contract). Model is shipped once via
    ``ray.put``; each batch probes it with two ``index_in`` hash
    lookups (w1 for the denominator, the joined key for the numerator)
    — distinct (cu, c) pairs get ONE ``ln`` each via inverse-unique,
    so the float step count is bounded by distinct count pairs, not
    tokens."""
    import ray

    uw, uc, bk, bc, V = model
    ref = ray.put((uw, uc, bk, bc))
    scale = 1 << frac_bits

    def _score(b: pa.Table) -> pa.Table:
        import ray as _r

        uw_, uc_, bk_, bc_ = _r.get(ref) if isinstance(
            ref, _r.ObjectRef) else ref
        toks = _tokens(b, text_col)
        keys, w1, docidx = _bigram_keys(toks)
        n = b.num_rows
        nbi = np.zeros(n, dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        if len(keys):
            upos = pc.index_in(w1, value_set=uw_)
            bpos = pc.index_in(keys, value_set=bk_)
            up = upos.to_numpy(zero_copy_only=False)
            bp = bpos.to_numpy(zero_copy_only=False)
            cu = np.where(np.isnan(up), 0,
                          uc_[np.nan_to_num(up).astype(np.int64)])
            cb = np.where(np.isnan(bp), 0,
                          bc_[np.nan_to_num(bp).astype(np.int64)])
            # one ln per DISTINCT (c+1, cu+V) pair (row-unique: count
            # magnitudes can't overflow a packed single-int encoding)
            nd = np.column_stack([(cb + 1).astype(np.int64),
                                  (cu + V).astype(np.int64)])
            uniq, inv = np.unique(nd, axis=0, return_inverse=True)
            cost_u = np.array(
                [-math.floor(math.log(int(a) / int(b_)) * scale)
                 for a, b_ in uniq], dtype=np.int64)
            cost = cost_u[inv]
            np.add.at(nbi, docidx, 1)
            np.add.at(nll, docidx, cost)
        return b.append_column(
            "n_bigrams", pa.array(nbi, pa.int64())).append_column(
            "nll_fp", pa.array(nll, pa.int64()))

    return ds.map_batches(_score, batch_format="pyarrow")


def lm_perplexity(ds, text_col: str = "text", id_col: str = "doc_id",
                  frac_bits: int = 16,
                  max_model_rows: int = 50_000_000,
                  num_partitions: int | None = None):
    """Fit-on-corpus + score in one call (two count shuffles + one
    scoring pass). Returns the scored Dataset (input columns +
    n_bigrams + nll_fp)."""
    model = fit_bigram_lm(ds, text_col=text_col,
                          max_model_rows=max_model_rows,
                          num_partitions=num_partitions)
    return score_perplexity(ds, model, text_col=text_col,
                            id_col=id_col, frac_bits=frac_bits)
