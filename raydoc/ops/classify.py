"""Deterministic classifier stages: the engine's test-stable doubles of
the reference's LLM router components.

* ``CategorizeStage`` — keyword-count argmax over named categories: the
  exact scoring rule the reference applies to the LLM's answer
  (substring-count argmax over category names, fallback = last
  category, /root/reference/agent/component/categorize.py:93-107),
  applied directly to the document text. Routing then = filter on the
  ``category`` column (canvas.py:265-269 made data-parallel).
* ``RelevantStage`` — binary yes/no gate (relevant.py:24-79): scores
  overlap between a query's tokens and the document, empty input -> "no"
  (relevant.py:61-62).

Both are callable classes for ``map_batches(..., concurrency=...)`` —
a real LLM-backed classifier swaps in with the same interface, loading
its model in __init__ (the LLMBundle slot, categorize.py:87).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["CategorizeStage", "RelevantStage"]


class CategorizeStage:
    """categories: {name: [keywords...]} in PRIORITY ORDER; a doc goes
    to the category whose keywords occur most often (ties -> earlier
    category; zero hits -> the LAST category, matching
    categorize.py:105-107's fallback)."""

    def __init__(self, categories: dict[str, list[str]],
                 text_col: str = "text", out_col: str = "category") -> None:
        # per-actor setup: lower-case keyword lists compiled once
        self.cats = [(name, [k.lower() for k in kws])
                     for name, kws in categories.items()]
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized keyword-count argmax: one pc.count_substring pass
        # per keyword over the whole column (no per-row Python), then a
        # numpy argmax with first-max tie-breaking; all-zero rows fall
        # back to the LAST category (categorize.py:105-107)
        import numpy as np
        import pyarrow.compute as pc

        col = pc.utf8_lower(
            pc.fill_null(batch.column(self.text_col), "")
        ).combine_chunks()
        counts = np.zeros((len(self.cats), batch.num_rows), dtype=np.int64)
        for ci, (_name, kws) in enumerate(self.cats):
            for k in kws:
                counts[ci] += pc.count_substring(col, k).to_numpy(
                    zero_copy_only=False
                )
        best = counts.argmax(axis=0)  # first max wins ties
        best[counts.max(axis=0) == 0] = len(self.cats) - 1
        names = np.asarray([n for n, _ in self.cats], dtype=object)
        return batch.append_column(
            self.out_col, pa.array(names[best].tolist(), pa.string())
        )


class RelevantStage:
    """Binary relevance gate: yes iff >= ``min_overlap`` query tokens
    occur in the document (empty doc -> "no")."""

    def __init__(self, query: str, text_col: str = "text",
                 out_col: str = "relevant", min_overlap: int = 1) -> None:
        self.q_tokens = {w for w in query.lower().split() if w}
        self.text_col = text_col
        self.out_col = out_col
        self.min_overlap = min_overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(self.text_col).to_pylist():
            toks = set((t or "").lower().split())
            hit = len(self.q_tokens & toks) >= self.min_overlap if toks else False
            out.append("yes" if hit else "no")
        return batch.append_column(self.out_col, pa.array(out, pa.string()))
