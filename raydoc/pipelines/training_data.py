"""End-to-end training-data curation: the composite pipeline a 100 TB
web corpus actually runs, built from the operator library.

    documents
      -> quality features (token count, stopword/punct ratios)   [map]
      -> quality gate (drop too-short / too-punctuated / too-few
         stopwords rows — in-band, no row errors)                [filter]
      -> language gate (marker-argmax langid == keep_langs)      [map+filter]
      -> exact dedup on text (md5 key, min doc_id survives)      [1 shuffle]
      -> near-dup removal via MinHash LSH (drop the HIGHER id of
         each estimated-duplicate pair)                          [LSH plan]
      -> kept corpus + per-stage retention stats

Every stage is a streaming Dataset transform; the only all-to-alls are
the exact-dedup groupby (16-byte keys) and the LSH bucket shuffle.
Near-dup victims are collected as an id SET (pairs are tiny relative
to the corpus by LSH design) and broadcast as a membership filter —
the corpus itself is never joined against the pair list.

This is the engine's composition story for SURVEY.md §2.5's dedup /
text-analysis extensions; there is no reference counterpart (the
reference has only exact content dedup, base.py:474,509).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["curate_documents"]


def curate_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
    keep_langs: tuple[str, ...] | None = None,
    near_dup_threshold: float = 0.7,
):
    """Returns (kept_dataset, stats dict). Deterministic: of any
    duplicate group, the smallest id survives."""
    from raydoc.ops.dedup import exact_dedup, minhash_lsh_pairs
    from raydoc.ops.text import langid_batch, quality_batch

    # n_input: metadata-cheap for parquet-read inputs; for DERIVED
    # inputs this executes the upstream lineage once for the count —
    # materialize your input first if that lineage is expensive
    stats: dict[str, int] = {"n_input": ds.count()}

    def _gates(b: pa.Table) -> pa.Table:
        # quality + language maps and both filters fused into one pass
        b = quality_batch(b, text_col)
        mask = pc.and_(
            pc.greater_equal(b.column("n_tokens"), pa.scalar(min_tokens)),
            pc.and_(
                pc.less_equal(b.column("punct_ratio"),
                              pa.scalar(max_punct_ratio)),
                pc.greater_equal(b.column("stopword_ratio"),
                                 pa.scalar(min_stopword_ratio)),
            ),
        )
        b = b.filter(mask)
        if keep_langs:
            b = langid_batch(b, text_col)
            langs = pa.array(list(keep_langs), pa.string())
            b = b.filter(pc.is_in(b.column("lang_pred"), value_set=langs))
        return b

    ds = ds.map_batches(_gates, batch_format="pyarrow").materialize()
    stats["n_after_gates"] = ds.count()

    deduped = exact_dedup(ds, text_col, id_col).materialize()
    stats["n_after_exact_dedup"] = deduped.count()

    pairs = minhash_lsh_pairs(deduped, text_col, id_col,
                              threshold=near_dup_threshold)
    import ray

    victims: set = set()
    for t in ray.get(pairs.to_arrow_refs()):
        if t.num_rows:
            # keep the smaller id of each near-dup pair
            victims.update(
                pc.max_element_wise(t.column("id_a"),
                                    t.column("id_b")).to_pylist()
            )
    stats["n_near_dup_removed"] = len(victims)
    if victims:
        varr = pa.array(sorted(victims), pa.int64())
        deduped = deduped.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column(id_col), value_set=varr))
            ),
            batch_format="pyarrow",
        )
    stats["n_kept"] = stats["n_after_exact_dedup"] - len(victims)
    return deduped, stats
