"""Fixed Arrow schemas for every table the engine produces or consumes.

The reference exchanges schemaless single-column pandas frames
(``be_output`` wraps any scalar as ``[{"content": v}]``,
/root/reference/agent/component/base.py:546-548) and grows/drops columns
dynamically (base.py:335-337, retrieval.py:129-130). The engine replaces
that with explicit nullable Arrow schemas per stage (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

# Flagship input (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),  # raw fallback text, NOT the golden output
        pa.field("lang", pa.string()),
    ]
)

# One span per extracted block; offsets index into the final normalized
# `text`. kind in {title, para, table, list}; level = heading level
# (1..6) for kind == "title", else 0 (needed by the chunker's
# title-hierarchy merge).
SPAN_TYPE = pa.struct(
    [
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("level", pa.int8()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("text", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("n_chunks", pa.int32()),
        pa.field("extract_ms", pa.float64()),
        pa.field("status", pa.string()),  # "ok" | "empty" | "error" (in-band error rows,
        # the reference's **ERROR** convention, baidu.py:70-71)
        pa.field("error", pa.string()),
    ]
)

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("chunk_id", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("token_count", pa.int32()),
        pa.field("title_path", pa.list_(pa.string())),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int64()),
        pa.field("n_docs", pa.int64()),
        pa.field("n_ok", pa.int64()),
        pa.field("n_empty", pa.int64()),
        pa.field("n_error", pa.int64()),
        pa.field("n_chunks", pa.int64()),
        pa.field("text_bytes", pa.int64()),
        pa.field("checksum", pa.string()),
    ]
)
