"""Template-based chunking: title-hierarchy merge + token-budget split.

The engine's re-expression of the reference's chunk model (chunk lists
serialized per document, /root/reference/agent/component/retrieval.py:133)
and RAGFlow's "naive" template chunker semantics (BASELINE.json
north_star): walk the extracted blocks in document order, maintain the
h1->hN title stack, pack consecutive non-title blocks under the current
title path into chunks of at most ``token_budget`` tokens, splitting
oversized single blocks on token boundaries.

Pure + deterministic: tokens are whitespace tokens (``str.split()``),
the same fixed rule as the q_token_count oracle. No Ray imports.
"""

from __future__ import annotations

__all__ = ["chunk_document", "chunk_document_arrays"]


def chunk_document(
    text: str,
    spans: list[dict],
    token_budget: int = 256,
    min_tokens: int = 16,
) -> list[dict]:
    """(text, spans) -> list of {"chunk_id","text","token_count","title_path"}.

    Rules (pinned):
      * a ``title`` span of level L pops the title stack to depth L-1 and
        pushes its text; it starts a new chunk but its text is not
        duplicated into the chunk body — it lives in ``title_path``
      * consecutive para/table/list blocks accumulate into the current
        chunk ("\\n"-joined) until adding the next block would exceed
        ``token_budget``; then the chunk is emitted
      * a single block longer than ``token_budget`` is split on token
        boundaries into budget-sized pieces (last piece may be short)
      * a trailing chunk shorter than ``min_tokens`` is merged into the
        previous chunk when both share a title path, else kept
    """
    return _chunk_core(
        text,
        ((sp["start"], sp["end"], sp["kind"], sp.get("level", 1)) for sp in spans),
        token_budget,
        min_tokens,
    )


def chunk_document_arrays(
    text: str,
    starts,
    ends,
    kinds,
    levels,
    token_budget: int = 256,
    min_tokens: int = 16,
) -> list[dict]:
    """``chunk_document`` over parallel span-field arrays (numpy slices of
    a flattened Arrow ``list<struct>`` column) — identical output, no
    per-span dict materialization. This is the hot-path entry used by
    the post-shuffle write task, where ``spans.to_pylist()`` was ~40% of
    the per-partition CPU."""
    return _chunk_core(text, zip(starts, ends, kinds, levels), token_budget, min_tokens)


def _chunk_core(text, span_tuples, token_budget, min_tokens):
    title_stack: list[tuple[int, str]] = []  # (level, title text)
    chunks: list[dict] = []
    cur_parts: list[str] = []
    cur_tokens = 0
    cur_path: list[str] = []

    def emit() -> None:
        nonlocal cur_parts, cur_tokens
        if cur_parts:
            body = "\n".join(cur_parts)
            chunks.append(
                {
                    "text": body,
                    "token_count": cur_tokens,
                    "title_path": list(cur_path),
                }
            )
        cur_parts = []
        cur_tokens = 0

    for start, end, kind, lvl in span_tuples:
        seg = text[start:end]
        if kind == "title":
            emit()
            level = int(lvl) or 1
            while title_stack and title_stack[-1][0] >= level:
                title_stack.pop()
            title_stack.append((level, seg))
            cur_path = [t for _, t in title_stack]
            continue
        toks = seg.split()
        n = len(toks)
        if n == 0:
            continue
        if n > token_budget:
            emit()
            for i in range(0, n, token_budget):
                piece = toks[i : i + token_budget]
                chunks.append(
                    {
                        "text": " ".join(piece),
                        "token_count": len(piece),
                        "title_path": list(cur_path),
                    }
                )
            continue
        if cur_tokens and cur_tokens + n > token_budget:
            emit()
        cur_parts.append(seg)
        cur_tokens += n
    emit()

    # trailing-runt merge
    if (
        len(chunks) >= 2
        and chunks[-1]["token_count"] < min_tokens
        and chunks[-1]["title_path"] == chunks[-2]["title_path"]
        and chunks[-2]["token_count"] + chunks[-1]["token_count"] <= token_budget
    ):
        last = chunks.pop()
        chunks[-1]["text"] = chunks[-1]["text"] + "\n" + last["text"]
        chunks[-1]["token_count"] += last["token_count"]

    for i, c in enumerate(chunks):
        c["chunk_id"] = i
    return chunks
