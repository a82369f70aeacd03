"""Ray Data stages wrapping the pure extractor/chunker.

``ExtractStage`` is a callable CLASS for ``map_batches(..., concurrency=N)``
— the actor-pool pattern the reference uses for every model stage
(LLMBundle built once per run, /root/reference/agent/component/generate.py:150,
retrieval.py:89-96): per-actor setup in ``__init__``, per-batch work in
``__call__`` over zero-copy Arrow batches. HTML parsing is inherently
per-row Python work (a DOM parse cannot be expressed as an Arrow
kernel); everything around it — decoding, column assembly, chunk
explode — stays Arrow-native.

The stage DROPS the multi-MB ``html`` column on output (SURVEY.md §4
memory-pressure rule): downstream stages and shuffles only ever see the
much smaller extracted text.
"""

from __future__ import annotations

import time

import pyarrow as pa

from raydoc.extract.chunker import chunk_document
from raydoc.extract.html_extract import extract_page
from raydoc.schemas import CHUNKS_SCHEMA, SPAN_TYPE

_CHUNK_TYPE = pa.struct(
    [
        pa.field("chunk_id", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("token_count", pa.int32()),
        pa.field("title_path", pa.list_(pa.string())),
    ]
)

EXTRACT_OUT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("text", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("chunks", pa.list_(_CHUNK_TYPE)),
        pa.field("n_chunks", pa.int32()),
        pa.field("extract_ms", pa.float64()),
        pa.field("status", pa.string()),
        pa.field("error", pa.string()),
    ]
)


class ExtractStage:
    """pages(url, html, ...) -> extracted(+ nested chunks), html dropped.

    Use: ``ds.map_batches(ExtractStage, fn_constructor_kwargs={...},
    batch_format="pyarrow", batch_size=B, concurrency=N)``.
    batch_size caps batch BYTES because each input row carries a
    multi-KB..MB html payload (SURVEY.md §7 hard part 2) — derive it
    from average row bytes via
    ``extract_pipeline.batch_rows_for_bytes`` (64-512 rows are
    equivalent within noise on ~6 KB rows; multi-MB rows need <=16).
    """

    def __init__(self, token_budget: int = 256, with_chunks: bool = True) -> None:
        self.token_budget = token_budget
        self.with_chunks = with_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        out = {k: [] for k in (
            "url", "text", "spans", "chunks", "n_chunks", "extract_ms", "status", "error")}
        for url, html in zip(urls, htmls):
            t0 = time.perf_counter()
            res = extract_page(html if html is not None else b"")
            if self.with_chunks and res["status"] == "ok":
                chunks = chunk_document(res["text"], res["spans"], self.token_budget)
            else:
                chunks = []
            ms = (time.perf_counter() - t0) * 1000.0
            out["url"].append(url)
            out["text"].append(res["text"])
            out["spans"].append(res["spans"])
            out["chunks"].append(chunks)
            out["n_chunks"].append(len(chunks))
            out["extract_ms"].append(ms)
            out["status"].append(res["status"])
            out["error"].append(res["error"])
        return pa.Table.from_pydict(out, schema=EXTRACT_OUT_SCHEMA)


_FN_CACHE: dict[tuple, ExtractStage] = {}


def extract_map_fn(token_budget: int = 256, with_chunks: bool = True):
    """Task-pool variant of ``ExtractStage`` for ``map_batches(fn)``.

    The extract stage's only per-worker state is cheap (compiled
    regexes, module imports) — it does not need an actor's lifetime, so
    a plain task pool with the stage instance cached per worker PROCESS
    (Ray workers persist across tasks) gets the same once-per-worker
    setup without actor-pool dispatch limits. Measured at sf0.1 /
    32 CPUs: tasks ~14-20k docs/s vs ~6-7k for the actor pool on the
    identical corpus — the pool's fixed actor count + per-actor queue
    caps effective parallelism, while tasks let the scheduler use every
    free CPU. Stages with EXPENSIVE state (layout/OCR models,
    `layout_stage.py`) keep the actor-pool contract.
    """
    key = (token_budget, with_chunks)

    def extract_batch(batch: pa.Table) -> pa.Table:
        stage = _FN_CACHE.get(key)
        if stage is None:
            stage = _FN_CACHE[key] = ExtractStage(
                token_budget=token_budget, with_chunks=with_chunks
            )
        return stage(batch)

    return extract_batch


def explode_chunks(batch: pa.Table) -> pa.Table:
    """extracted(url, chunks) -> CHUNKS_SCHEMA rows (one per chunk).

    Arrow-native explode: flatten the list column and repeat the url by
    list lengths — no Python per-chunk loop.
    """
    import numpy as np
    import pyarrow.compute as pc

    chunks = batch.column("chunks")
    if isinstance(chunks, pa.ChunkedArray):
        chunks = chunks.combine_chunks()
    lengths = pc.list_value_length(chunks).fill_null(0).to_numpy(zero_copy_only=False)
    urls = batch.column("url").to_pylist()
    # explicit string type: an all-empty repeat would otherwise infer a
    # null-typed url column and schema-drift the chunks parquet
    rep_urls = pa.array(np.repeat(np.asarray(urls, dtype=object), lengths),
                        type=CHUNKS_SCHEMA.field("url").type)
    flat = chunks.flatten()  # struct array of chunk fields
    return pa.Table.from_arrays(
        [
            rep_urls,
            flat.field("chunk_id"),
            flat.field("text"),
            flat.field("token_count"),
            flat.field("title_path"),
        ],
        schema=CHUNKS_SCHEMA,
    )
