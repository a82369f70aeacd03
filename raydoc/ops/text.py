"""Text analysis over a documents table: language-ID, quality scoring,
token counting, fingerprinting.

The training-data-pipeline counterpart of the reference's text post-
processors (regex strips generate.py:227 / keyword.py:66-67, token
counting via tiktoken relevant.py:68-69, ISO-639 lookup rewrite.py:52-94
— all in /root/reference/agent/component/). Every function here is a
pure batch transform: Arrow/numpy kernels or a single compiled-regex
pass; no per-row Python in the hot loop beyond what string ops require.

Determinism: ratios are (int / int) divisions of exactly-counted
integers, so they are bit-identical to any oracle computing the same
counts (no accumulation-order issues).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydoc.hashing import md5_hex, stable_u64

__all__ = [
    "token_count_batch",
    "quality_batch",
    "langid_batch",
    "fingerprint_batch",
    "repetition_batch",
    "pii_redact_batch",
    "shingles",
    "top_salient_terms",
    "STOPWORDS",
]

_WS_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter for token counting: words (with
# apostrophes), numbers, or single non-space symbols.
_BPE_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\sA-Za-z\d]")

# ASCII printable punctuation — the exact [!-/:-@[-`{-~] class the
# DOCS_QUALITY_SQL oracle counts, so punct_ratio stays bit-identical on
# non-ASCII corpora too (unicode symbols are deliberately NOT counted)
import string as _string

_ASCII_PUNCT = frozenset(_string.punctuation)

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as by at "
    "from it this that these those i you he she we they not no".split()
)

# Tiny per-language marker sets for the n-gram/stopword language-ID
# heuristic. Scores = marker-token hit counts; argmax wins, ties broken
# by language-code order (deterministic).
_LANG_MARKERS: dict[str, frozenset] = {
    "en": STOPWORDS,
    "de": frozenset("der die das und ist nicht ein eine zu mit für auf von den dem ich sie".split()),
    "fr": frozenset("le la les et de est pas un une pour sur avec dans que qui au du".split()),
    "es": frozenset("el la los las y de es no un una para sobre con en que por del".split()),
    "ru": frozenset("и в не на я быть он с что а по это она этот к но они мы".split()),
    "zh": frozenset("的 是 在 了 和 有 我 他 这 中 大 来 上 国 个 到 数据".split()),
}


def _texts(batch: pa.Table, col: str) -> list[str]:
    return batch.column(col).to_pylist()


def token_count_batch(batch: pa.Table, col: str = "text",
                      mode: str = "whitespace") -> pa.Table:
    """Append ``n_tokens``: whitespace tokens (str.split) or BPE-ish
    regex tokens (words / numbers / single symbols)."""
    if mode == "whitespace":
        # vectorized: count space-separated pieces after trim+collapse
        s = pc.utf8_trim_whitespace(pc.cast(batch.column(col), pa.string()))
        parts = pc.split_pattern_regex(s, r"\s+")
        n = pc.list_value_length(parts)
        n = pc.if_else(pc.equal(s, ""), pa.scalar(0, pa.int32()), n)
        return batch.append_column("n_tokens", pc.cast(n, pa.int64()))
    counts = [len(_BPE_RE.findall(t or "")) for t in _texts(batch, col)]
    return batch.append_column("n_tokens", pa.array(counts, type=pa.int64()))


_PUNCT_CLASS_RE = r"[!-/:-@\[-`{-~]"  # == string.punctuation, RE2 class
_STOPWORD_ARR = None


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append quality features: n_tokens, stopword_ratio, punct_ratio,
    mean_token_len. Ratios are int/int of exact counts. Vectorized:
    one regex tokenize pass + flat-token Arrow kernels + segment sums
    (``np.add.reduceat`` over the list offsets) — the per-row Python
    version this replaces produced bit-identical numbers (both are
    exact integer counts divided once)."""
    import numpy as np

    global _STOPWORD_ARR
    if _STOPWORD_ARR is None:
        _STOPWORD_ARR = pa.array(sorted(STOPWORDS), pa.string())

    s = pc.fill_null(pc.cast(batch.column(col), pa.string()), "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(s)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    raw_n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    # an empty/whitespace doc still splits to one phantom "" token, so
    # flat-stream OFFSETS use the raw lengths; the reported n zeroes it
    n = raw_n.copy()
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n[empty] = 0
    flat = pc.list_flatten(toks)
    offsets = np.concatenate(([0], np.cumsum(raw_n)[:-1]))
    is_stop = pc.is_in(pc.utf8_lower(flat), value_set=_STOPWORD_ARR) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    nz = n > 0
    seg_nz = raw_n > 0
    stop_cnt = np.zeros(len(n), dtype=np.int64)
    len_sum = np.zeros(len(n), dtype=np.int64)
    if len(flat):
        seg = np.add.reduceat
        stop_cnt[seg_nz] = seg(is_stop, offsets[seg_nz])
        len_sum[seg_nz] = seg(tok_len, offsets[seg_nz])
    stop_r = np.where(nz, stop_cnt / np.maximum(n, 1), 0.0)
    mean_len = np.where(nz, len_sum / np.maximum(n, 1), 0.0)
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    n_punct = pc.count_substring_regex(s, _PUNCT_CLASS_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    punct_r = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    return (
        batch.append_column("n_tokens", pa.array(n, type=pa.int64()))
        .append_column("stopword_ratio", pa.array(stop_r, type=pa.float64()))
        .append_column("punct_ratio", pa.array(punct_r, type=pa.float64()))
        .append_column("mean_token_len", pa.array(mean_len, type=pa.float64()))
    )


_LANG_MARKER_ARRS: dict[str, pa.Array] | None = None


def langid_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``lang_pred``: marker-token argmax heuristic; "und" when
    nothing matches. Ties break by language-code sort order.
    Vectorized: one tokenize pass, one ``pc.is_in`` membership probe
    per language over the flat token stream, segment sums per doc,
    numpy argmax (first max == the scalar loop's strict-> winner)."""
    import numpy as np

    global _LANG_MARKER_ARRS
    if _LANG_MARKER_ARRS is None:
        _LANG_MARKER_ARRS = {
            lang: pa.array(sorted(m), pa.string())
            for lang, m in _LANG_MARKERS.items()
        }
    s = pc.fill_null(pc.cast(batch.column(col), pa.string()), "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(s)), r"\s+"
    )
    raw_n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    flat = pc.list_flatten(toks)
    offsets = np.concatenate(([0], np.cumsum(raw_n)[:-1]))
    seg_nz = raw_n > 0
    langs = sorted(_LANG_MARKERS)
    counts = np.zeros((len(langs), len(raw_n)), dtype=np.int64)
    if len(flat):
        for li, lang in enumerate(langs):
            hit = pc.is_in(flat, value_set=_LANG_MARKER_ARRS[lang]) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            counts[li][seg_nz] = np.add.reduceat(hit, offsets[seg_nz])
    best = counts.argmax(axis=0)
    names = np.asarray(langs, dtype=object)
    preds = names[best]
    preds[counts.max(axis=0) == 0] = "und"
    return batch.append_column("lang_pred",
                               pa.array(preds.tolist(), type=pa.string()))


def _rolling_sigs(col, k: int = 8) -> np.ndarray:
    """Min rolling word-k-gram hash per doc, vectorized (r05; replaced
    one blake2b call per SHINGLE with one per DISTINCT token + a flat
    position-weighted polynomial and ``np.minimum.reduceat`` at doc
    boundaries — the dedup signature builders' gram hash, so the per-doc
    cost is O(tokens) numpy, not O(shingles) hashlib). ``shingles``
    semantics: lowercase + whitespace collapse; fewer-than-k tokens ->
    ONE whole-text gram; empty -> 0. Values are a different (equally
    stable/uniform) hash family than the pre-r05 string-blake2b — the
    signature is an edit-robust shape estimator, not an oracle-pinned
    value."""
    from raydoc.ops.dedup import _GRAM_W, _batch_token_hashes

    th, offs = _batch_token_hashes(col)
    n = len(offs) - 1
    lens = np.diff(offs)
    out = np.zeros(n, dtype=np.uint64)
    T = len(th)
    if T == 0:
        return out
    with np.errstate(over="ignore"):
        long_docs = np.flatnonzero(lens >= k)
        if T >= k and len(long_docs):
            poly = th[: T - k + 1] * _GRAM_W[0]
            for j in range(1, k):
                poly = poly + th[j: T - k + 1 + j] * _GRAM_W[j]
            doc_of = np.repeat(np.arange(n, dtype=np.int64),
                               lens)[: T - k + 1]
            pos = (np.arange(T - k + 1, dtype=np.int64)
                   - offs[:-1][doc_of])
            vm = poly[pos <= (lens[doc_of] - k)]
            g = (lens[long_docs] - k + 1).astype(np.int64)
            starts = np.zeros(len(long_docs), dtype=np.int64)
            np.cumsum(g[:-1], out=starts[1:])
            out[long_docs] = np.minimum.reduceat(vm, starts)
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            tok_doc = np.repeat(np.arange(n, dtype=np.int64), lens)
            stok = np.isin(tok_doc, short)
            pos_t = (np.arange(T, dtype=np.int64)
                     - offs[:-1][tok_doc])[stok]
            wt = th[stok] * _GRAM_W[pos_t]
            st = np.zeros(len(short), dtype=np.int64)
            np.cumsum(lens[short][:-1], out=st[1:])
            out[short] = np.add.reduceat(wt, st)
    return out


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``fingerprint`` (md5 hex of the text — matches DuckDB
    ``md5()``, the oracle-pinned column) and ``rolling_sig`` (min of
    rolling 8-gram hashes, a document-shape signature robust to small
    edits; vectorized, see ``_rolling_sigs``)."""
    fps = [md5_hex(t or "") for t in _texts(batch, col)]
    sigs = _rolling_sigs(batch.column(col))
    return batch.append_column(
        "fingerprint", pa.array(fps, type=pa.string())
    ).append_column("rolling_sig", pa.array(sigs, type=pa.uint64()))


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append Gopher-style word-repetition signals:
    ``dup_word_frac`` = 1 - distinct/total tokens and ``top_word_frac``
    = most-frequent-token count / total tokens (both 0.0 for empty
    text). Exact int/int divisions — bit-identical to a SQL oracle
    computing the same counts."""
    from collections import Counter

    dup, top = [], []
    for t in _texts(batch, col):
        toks = (t or "").split()
        n = len(toks)
        if n == 0:
            dup.append(0.0)
            top.append(0.0)
            continue
        c = Counter(toks)
        dup.append(1.0 - len(c) * 1.0 / n)
        top.append(max(c.values()) * 1.0 / n)
    return batch.append_column(
        "dup_word_frac", pa.array(dup, pa.float64())
    ).append_column("top_word_frac", pa.array(top, pa.float64()))


# RE2 syntax on BOTH sides: pyarrow's replace_substring_regex and
# DuckDB's regexp_replace are RE2, so one pattern string produces
# identical redactions in the engine and the oracle
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}"


def pii_redact_batch(batch: pa.Table, col: str = "text",
                     out_col: str = "text_redacted") -> pa.Table:
    """Append ``out_col`` with emails -> <EMAIL> and international
    phone numbers -> <PHONE>, plus ``n_pii`` (total matches removed).
    Fully vectorized: two RE2 passes over the column, no per-row
    Python — the scrub stage every web-scale training corpus runs."""
    s = pc.cast(batch.column(col), pa.string())
    n = pc.add(
        pc.count_substring_regex(s, PII_EMAIL_PATTERN),
        pc.count_substring_regex(s, PII_PHONE_PATTERN),
    )
    s = pc.replace_substring_regex(s, PII_EMAIL_PATTERN, "<EMAIL>")
    s = pc.replace_substring_regex(s, PII_PHONE_PATTERN, "<PHONE>")
    return batch.append_column(out_col, s).append_column(
        "n_pii", pc.cast(n, pa.int64())
    )


def shingles(text: str, k: int) -> list[str]:
    """Word k-shingles of a whitespace-collapsed, lower-cased text."""
    toks = _WS_RE.sub(" ", (text or "").lower()).strip().split(" ")
    if toks == [""]:
        return []
    if len(toks) <= k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def top_salient_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                      top_k: int = 3):
    """Per-doc top-k terms by tf·(N/df) — the linear-idf tf-idf variant.

    Linear idf (N/df instead of log(N/df)) is chosen deliberately: the
    ranking key reduces to tf/df, an exactly-rounded IEEE division of
    two integers that is bit-identical in numpy and any SQL engine,
    where log-idf would hang the ranking on libm's last ulp. The output
    carries only integers and strings (doc_id, term, tf, df, rank), so
    an oracle hash comparison is exact.

    Dataflow (the "global statistic, broadcast back" pattern):
      1. document frequencies: per-batch partial DF counts (one row per
         (batch, token)) -> partial-agg ``grouped_agg`` sum — the only
         shuffle, and it moves token/int rows, never text;
      2. the DF table is collected and ``ray.put`` once (vocabulary is
         Heaps-law sublinear in corpus size; for corpora whose vocab
         outgrows a broadcast, swap step 2 for a shuffle join on term
         and a regroup by doc — two more all-to-alls);
      3. per-doc scoring + local top-k inside one map_batches against
         the per-process cached DF dict — no further shuffle.
    """
    import numpy as np
    import ray

    from raydoc.ops.relational import grouped_agg

    def _tok_pairs(b: pa.Table) -> pa.Table:
        """(doc_id, term, tf) rows — one Arrow pass (r03; was a Python
        Counter loop per doc): whitespace split, flatten, hash group by
        (doc, term) with a ones-sum for tf."""
        texts = pc.utf8_lower(pc.fill_null(
            b.column(text_col).combine_chunks().cast(pa.string()), ""))
        toks = pc.utf8_split_whitespace(texts)
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = b.column(id_col).combine_chunks().take(
            pa.array(np.repeat(np.arange(len(nw)), nw)))
        pairs = pa.table({"d": ids, "term": flat,
                          "one": pa.array(np.ones(len(flat), np.int64))})
        pairs = pairs.filter(pc.not_equal(pairs.column("term"), ""))
        g = pairs.group_by(["d", "term"]).aggregate([("one", "sum")])
        return g.rename_columns(["d", "term", "tf"])

    def _partial_df(b: pa.Table) -> pa.Table:
        g = _tok_pairs(b)
        part = g.group_by("term").aggregate([("d", "count")])
        return pa.table({"term": part.column("term"),
                         "df": part.column("d_count").cast(pa.int64())})

    df_ds = grouped_agg(
        ds.map_batches(_partial_df, batch_format="pyarrow"),
        ["term"], {"df": ("sum", "df")},
    )
    parts = [p for p in ray.get(df_ds.to_arrow_refs()) if p.num_rows]
    df_tbl = (
        pa.concat_tables(parts) if parts
        else pa.table({"term": pa.array([], pa.string()),
                       "df": pa.array([], pa.int64())})
    )
    df_ref = ray.put(df_tbl)
    cache_key = ("salient_df", df_ref.hex())

    def _score(b: pa.Table) -> pa.Table:
        # fully vectorized per-doc top-k (r03; was a Counter + sorted()
        # per document): (doc, term, tf) rows, df via index_in against
        # the broadcast DF table, ONE sort by (doc, score desc, term),
        # segmented-arange rank filter
        from raydoc.ops.bucketing import run_segments
        from raydoc.ops.relational import _bcast_cached

        df_terms, df_vals = _bcast_cached(
            cache_key,
            lambda: (ray.get(df_ref).column("term").combine_chunks(),
                     ray.get(df_ref).column("df").combine_chunks()),
        )
        g = _tok_pairs(b)
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        pos = pc.index_in(g.column("term").combine_chunks(),
                          value_set=df_terms)
        dfv = df_vals.take(pc.fill_null(pos, 0))
        score = pc.divide(pc.cast(g.column("tf"), pa.float64()),
                          pc.cast(dfv, pa.float64()))
        t = pa.table({"d": g.column("d"), "term": g.column("term"),
                      "tf": g.column("tf").cast(pa.int64()),
                      "df": dfv.cast(pa.int64()), "s": score})
        idx = pc.sort_indices(t, sort_keys=[("d", "ascending"),
                                            ("s", "descending"),
                                            ("term", "ascending")])
        t = t.take(idx)
        starts, counts = run_segments(t, ["d"])
        rank = (np.arange(t.num_rows, dtype=np.int64)
                - np.repeat(starts, counts) + 1)
        t = t.append_column("rank", pa.array(rank, pa.int64()))
        t = t.filter(pa.array(rank <= top_k))
        return pa.table({id_col: t.column("d"), "term": t.column("term"),
                         "tf": t.column("tf"), "df": t.column("df"),
                         "rank": t.column("rank")})

    return ds.map_batches(_score, batch_format="pyarrow")
