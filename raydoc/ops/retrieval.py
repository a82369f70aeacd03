"""Hybrid retrieval: keyword + vector scored top-k over a document
corpus with embeddings.

Engine counterpart of the reference's Retrieval component
(/root/reference/agent/component/retrieval.py:100-112) and the hybrid
similarity used for citation insertion (token 0.7 / vector 0.3,
generate.py:92-125): score(doc) = kw_weight * token_overlap +
(1 - kw_weight) * cosine(embedding).

Shape: the query set (tokens + unit vectors) is ``ray.put`` once;
every batch task scores its rows against all queries in one numpy
matmul + set intersections, keeps a local top-k per query, and one
small per-query groupby reduces to the global top-k. The corpus is
never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hybrid_retrieve", "insert_citations"]

_SENT_SPLIT = None


def insert_citations(
    answer: str,
    chunk_texts: list[str],
    chunk_vectors,
    embed_fn,
    tkweight: float = 0.7,
    vtweight: float = 0.3,
    threshold: float = 0.3,
) -> tuple[str, list[int]]:
    """Sentence x chunk hybrid-similarity citation insertion — the
    answer-side join of the reference's ``Generate.set_cite``
    (generate.py:92-125): the answer splits into sentences, every
    sentence scores against every evidence chunk with the SAME
    token/vector mix ``hybrid_retrieve`` uses (tkweight * overlap +
    vtweight * cosine; the reference passes 0.7/0.3), and each
    sentence whose best chunk clears ``threshold`` gets a `` ##N$$``
    marker appended. Returns (cited answer, cited chunk indices in
    first-cited order — the dedup'd recall list the reference builds
    at generate.py:102-110).

    ``embed_fn(text) -> vector`` supplies sentence embeddings (the
    reference's LLMBundle EMBEDDING slot); pass the same deterministic
    double the retrieval stage uses for offline runs.
    """
    import re

    global _SENT_SPLIT
    if _SENT_SPLIT is None:
        _SENT_SPLIT = re.compile(r"(?<=[.!?;。！？])\s+")
    if not (answer or "").strip() or not chunk_texts:
        return answer, []
    cmat = _unit(np.asarray(chunk_vectors, dtype=np.float64))
    ctoks = [set((t or "").lower().split()) for t in chunk_texts]
    parts = [s for s in _SENT_SPLIT.split(answer) if s]
    cited: list[int] = []
    out_parts: list[str] = []
    for sent in parts:
        stoks = set(sent.lower().split())
        svec = np.asarray(embed_fn(sent), dtype=np.float64)
        nrm = np.linalg.norm(svec)
        svec = svec / nrm if nrm else svec
        cos = cmat @ svec
        tok = np.fromiter(
            (len(stoks & ct) / max(len(stoks), 1) for ct in ctoks),
            dtype=np.float64, count=len(ctoks),
        )
        score = tkweight * tok + vtweight * cos
        best = int(score.argmax())
        if score[best] >= threshold:
            sent = f"{sent} ##{best}$$"
            if best not in cited:
                cited.append(best)
        out_parts.append(sent)
    return " ".join(out_parts), cited


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def hybrid_retrieve(
    ds,
    queries: list[dict],
    top_n: int = 10,
    kw_weight: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_col: str = "embedding",
):
    """queries: [{"query_id", "tokens": set/list, "vector": ndarray}].

    Output: (query_id, rank, doc_id, score) — rank 1..top_n by hybrid
    score desc, doc_id asc on ties.
    """
    import ray

    q_tokens = [set(w.lower() for w in q["tokens"]) for q in queries]
    q_ids = [int(q["query_id"]) for q in queries]
    qmat = _unit(np.asarray([q["vector"] for q in queries], dtype=np.float64))
    shared = ray.put((q_ids, q_tokens, qmat))

    class _Scorer:
        def __init__(self, ref) -> None:
            self.q_ids, self.q_tokens, self.qmat = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            from raydoc.util import embedding_matrix

            embs = _unit(embedding_matrix(batch.column(emb_col)))
            cos = self.qmat @ embs.T  # (Q, B)
            doc_tok = [set((t or "").lower().split()) for t in texts]
            out = {"query_id": [], "doc_id": [], "score": []}
            for qi, (qid, qt) in enumerate(zip(self.q_ids, self.q_tokens)):
                qlen = max(len(qt), 1)
                tok = np.fromiter(
                    (len(qt & dt) / qlen for dt in doc_tok),
                    dtype=np.float64, count=len(doc_tok),
                )
                score = kw_weight * tok + (1.0 - kw_weight) * cos[qi]
                kk = min(top_n, len(ids))
                part = np.argpartition(-score, kk - 1)[:kk] if len(ids) > kk \
                    else np.arange(len(ids))
                out["query_id"].extend([qid] * len(part))
                out["doc_id"].extend([ids[i] for i in part])
                out["score"].extend(score[part].tolist())
            return pa.Table.from_pydict(
                {"query_id": pa.array(out["query_id"], pa.int64()),
                 "doc_id": pa.array(out["doc_id"], pa.int64()),
                 "score": pa.array(out["score"], pa.float64())}
            )

    def _cap() -> int:
        from raydoc.util import cpu_cap

        return cpu_cap()

    cands = ds.map_batches(
        _Scorer, fn_constructor_args=(shared,), batch_format="pyarrow",
        concurrency=(1, _cap()),
    )
    # per-query top-k through the coarse-bucket rank kernel (P Python
    # calls total) — the r03 groupby(query_id).map_groups finalize paid
    # one Python call per query (VERDICT r03)
    from raydoc.ops.window import group_rank

    return group_rank(cands, "query_id", "score", out_col="rank",
                      descending=True, tiebreak="doc_id", k=top_n)
