"""raydoc — Ray-Data-native web-document extraction & data-processing engine.

A brand-new engine (not a port) with the query/data-processing
capabilities of the reference (52dev/ragflow ``agent/`` subtree, see
SURVEY.md): a streaming ``ray.data.Dataset`` pipeline over Parquet
tables of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``
running DOM-density main-content extraction, title-hierarchy chunking,
an operator library (predicates, template render, dedup, top-k, joins,
aggregates), dedup/similarity/text-analysis stages, with explicit
url-hash partitioning, per-partition lineage manifests and checkpointed
resume.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or test fixture).
"""

__version__ = "0.1.0"
