"""Sitemap ingestion — URL discovery for the crawl-planning chain.

The politeness family (ops/url.py: blocklist -> robots ->
urls_crawl_schedule) plans fetches over a URL list; sitemaps are where
that list comes from on the open web. This module parses the two
sitemap document kinds (XML-lite, stdlib-only, fail-soft like the
WARC reader):

- urlset:   ``<url><loc>...</loc><lastmod>...</lastmod></url>`` ->
            (url, lastmod) rows;
- sitemapindex: ``<sitemap><loc>...</loc></sitemap>`` -> child
            sitemap paths (returned separately so the caller — who
            owns fetching — can recurse; this engine has no network).

Parsing is deliberately regex-based over the raw bytes, NOT a full XML
parse: real-world sitemaps are full of namespace variants, stray
bytes, and truncations, and the only fields that matter are ``loc``
and ``lastmod``. CDATA wrappers and surrounding whitespace are
stripped; a missing/unparseable lastmod yields null and keeps the row;
gzip is detected by magic (CC-style .xml.gz).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import re

import pyarrow as pa

__all__ = ["parse_sitemap_bytes", "read_sitemaps"]

_URL_RE = re.compile(
    rb"<url\b[^>]*>(.*?)</url>", re.S | re.I)
_SM_RE = re.compile(
    rb"<sitemap\b[^>]*>(.*?)</sitemap>", re.S | re.I)
_LOC_RE = re.compile(rb"<loc[^>]*>\s*(?:<!\[CDATA\[)?(.*?)"
                     rb"(?:\]\]>)?\s*</loc>", re.S | re.I)
_MOD_RE = re.compile(rb"<lastmod[^>]*>\s*(.*?)\s*</lastmod>",
                     re.S | re.I)


def _ts(raw: bytes):
    try:
        s = raw.decode("utf-8", errors="replace").strip()
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    except ValueError:
        return None


def parse_sitemap_bytes(buf: bytes):
    """One sitemap document -> (urls_table, child_sitemap_paths).
    ``urls_table`` = (url, lastmod) rows from ``<url>`` entries;
    ``child_sitemap_paths`` = loc values of ``<sitemap>`` entries (a
    sitemapindex). Either may be empty; both may be non-empty in a
    malformed-but-salvageable document."""
    if buf[:2] == b"\x1f\x8b":
        try:
            buf = gzip.decompress(buf)
        except (OSError, EOFError):
            return (pa.Table.from_pydict({
                "url": pa.array([], pa.string()),
                "lastmod": pa.array([], pa.timestamp("us"))}), [])
    urls: list = []
    mods: list = []
    for block in _URL_RE.findall(buf):
        loc = _LOC_RE.search(block)
        if not loc:
            continue
        urls.append(loc.group(1).decode("utf-8",
                                        errors="replace").strip())
        mod = _MOD_RE.search(block)
        mods.append(_ts(mod.group(1)) if mod else None)
    children = [m.group(1).decode("utf-8", errors="replace").strip()
                for b in _SM_RE.findall(buf)
                if (m := _LOC_RE.search(b))]
    t = pa.Table.from_pydict({
        "url": pa.array(urls, pa.string()),
        "lastmod": pa.array(mods, pa.timestamp("us"))})
    return t, children


def read_sitemaps(paths, parallelism: int = -1):
    """Sitemap file paths -> Dataset (url, lastmod, n_child_sitemaps)
    — one parse task per file. ``n_child_sitemaps`` rides every row of
    its file so a driver can detect un-recursed indexes without a
    second pass (this engine has no network; fetching children is the
    caller's loop)."""
    import ray.data as rd

    from raydoc.ops.relational import nonempty_batches

    files = rd.read_binary_files(paths, override_num_blocks=(
        None if parallelism in (-1, None) else parallelism))

    def _parse(b: pa.Table) -> pa.Table:
        out = []
        for data in b.column("bytes").to_pylist():
            t, children = parse_sitemap_bytes(data)
            if t.num_rows:
                out.append(t.append_column(
                    "n_child_sitemaps",
                    pa.array([len(children)] * t.num_rows,
                             pa.int64())))
        if not out:
            return pa.Table.from_pydict({
                "url": pa.array([], pa.string()),
                "lastmod": pa.array([], pa.timestamp("us")),
                "n_child_sitemaps": pa.array([], pa.int64())})
        return pa.concat_tables(out, promote_options="permissive")

    return files.map_batches(nonempty_batches(_parse),
                             batch_format="pyarrow", batch_size=1)
