"""Actor-pool stage hosting the PDF layout model.

Same actor-pool contract as ExtractStage: the LayoutModel ("weights")
is constructed ONCE per actor in __init__ (the reference's per-run
LLMBundle slot, /root/reference/agent/component/generate.py:150), each
__call__ processes one Arrow batch. ``MixedExtractStage`` dispatches on
payload magic bytes so one pipeline can stream HTML and PDF documents
together (the north-star's combined extraction path).
"""

from __future__ import annotations

import time

import pyarrow as pa

from raydoc.extract.chunker import chunk_document
from raydoc.extract.html_extract import extract_page
from raydoc.extract.layout import LayoutModel
from raydoc.stages.extract_stage import EXTRACT_OUT_SCHEMA

__all__ = ["PdfExtractStage", "MixedExtractStage"]


class PdfExtractStage:
    """pages(url, payload) -> extracted rows (same schema as the HTML
    extract stage; chunker runs on the layout spans)."""

    def __init__(self, token_budget: int = 256, codec: str = "fake") -> None:
        self.model = LayoutModel(codec=codec)  # once per actor
        self.token_budget = token_budget

    def _extract_one(self, payload: bytes) -> dict:
        return self.model.extract(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _assemble(batch, self._extract_one, self.token_budget)


class MixedExtractStage:
    """Dispatch per document on magic bytes: FPDF -> layout model,
    anything else -> HTML DOM extraction. One streaming pipeline for a
    mixed corpus."""

    def __init__(self, token_budget: int = 256) -> None:
        self.model = LayoutModel()
        self.token_budget = token_budget

    def _extract_one(self, payload: bytes) -> dict:
        if payload[:4] == b"FPDF":
            return self.model.extract(payload)
        return extract_page(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _assemble(batch, self._extract_one, self.token_budget)


def _assemble(batch: pa.Table, extract_one, token_budget: int) -> pa.Table:
    payload_col = "payload" if "payload" in batch.column_names else "html"
    urls = batch.column("url").to_pylist()
    payloads = batch.column(payload_col).to_pylist()
    out = {k: [] for k in (
        "url", "text", "spans", "chunks", "n_chunks", "extract_ms", "status",
        "error")}
    for url, payload in zip(urls, payloads):
        t0 = time.perf_counter()
        res = extract_one(payload if payload is not None else b"")
        chunks = (
            chunk_document(res["text"], res["spans"], token_budget)
            if res["status"] == "ok" else []
        )
        out["url"].append(url)
        out["text"].append(res["text"])
        out["spans"].append(res["spans"])
        out["chunks"].append(chunks)
        out["n_chunks"].append(len(chunks))
        out["extract_ms"].append((time.perf_counter() - t0) * 1000.0)
        out["status"].append(res["status"])
        out["error"].append(res["error"])
    return pa.Table.from_pydict(out, schema=EXTRACT_OUT_SCHEMA)
