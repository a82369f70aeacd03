"""WARC ingestion — Common Crawl's native archive format as a source.

The engine's flagship input is the Parquet pages table, but the web's
raw form is WARC (ISO 28500): Common Crawl ships ~90k ``.warc.gz``
files per crawl, each ~1 GB of concatenated records. A user replacing
the reference's per-URL fetch store with this engine needs the WARC
front door; this module provides it with NOTHING but the stdlib —
``read_warc(paths)`` -> Dataset rows ``(url, warc_ts, html)``, the
exact flagship input schema, so ``warc -> extract -> curate`` composes
directly.

Parsing contract (the subset CC actually uses):

- records are ``WARC/1.x`` header blocks terminated by CRLFCRLF, with
  ``Content-Length`` giving the exact body byte count and two CRLFs
  separating records;
- only ``WARC-Type: response`` records yield rows; request/metadata/
  warcinfo records are skipped (counted in the returned stats);
- the body of a response record is an HTTP response; the html is the
  bytes after ITS header block (a body with no CRLFCRLF — e.g. a
  truncated capture — yields the whole body, never a crash);
- ``url`` from ``WARC-Target-URI``, ``warc_ts`` from ``WARC-Date``
  (ISO-8601, parsed to timestamp; unparseable dates -> null, row
  kept — fail-soft like the extractor's in-band error rows);
- gzip is detected by MAGIC, not extension (Ray's binary reader
  already auto-gunzips ``*.gz``; a still-compressed or mislabeled
  buffer decompresses here — concatenated members included).

Scale shape: one TASK per WARC file (``read_binary_files`` with file
parallelism — a 1 GB file is one block, the CC-native work unit; the
record loop inside is per-RECORD Python over ~50-100k records/GB,
which is I/O-dominated in practice and never per-row-of-the-corpus:
downstream stages see Arrow batches). Malformed tails fail soft: a
record whose Content-Length overruns the buffer ends the file's parse
with what was recovered (truncated downloads are routine at CC scale).
"""

from __future__ import annotations

import datetime as _dt
import gzip

import pyarrow as pa

__all__ = ["parse_warc_bytes", "read_warc", "read_wet",
           "write_warc_bytes", "write_wet_bytes"]

_CRLF2 = b"\r\n\r\n"


def _parse_ts(s: str):
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    except ValueError:
        return None


def parse_warc_bytes(buf: bytes, record_type: str = "response",
                     strip_http: bool = True,
                     body_col: str = "html") -> pa.Table:
    """One WARC file's bytes -> (url, warc_ts, <body_col>) rows for
    its ``record_type`` records. Pure function (testable without Ray);
    hand it DECOMPRESSED bytes (``read_warc`` magic-sniffs gzip).
    ``strip_http=False`` keeps the record body verbatim — the WET
    shape, whose conversion records hold plain text, not an HTTP
    response."""
    urls: list = []
    tss: list = []
    bodies: list = []
    pos = 0
    n = len(buf)
    view = memoryview(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = buf.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        header = bytes(view[pos:hdr_end]).decode("latin-1")
        if not header.startswith("WARC/"):
            break
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:  # a negative length would walk pos backwards
            break
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:  # truncated capture: stop with what we have
            break
        if fields.get("warc-type") == record_type:
            body = bytes(view[body_start:body_end])
            if strip_http:
                # strip the HTTP response's own header block
                split = body.find(_CRLF2)
                body = body[split + 4:] if split >= 0 else body
            urls.append(fields.get("warc-target-uri"))
            tss.append(_parse_ts(fields.get("warc-date", "")))
            bodies.append(body)
        pos = body_end
    return pa.Table.from_pydict({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        body_col: pa.array(bodies, pa.binary())})


def read_warc(paths, parallelism: int = -1):
    """WARC file paths (plain or .gz) -> Dataset (url, warc_ts, html),
    one parse task per file. Feed straight into the flagship
    (extract_pipeline) or ``web_to_training_shards``."""
    import ray.data as rd

    files = rd.read_binary_files(paths, override_num_blocks=(
        None if parallelism in (-1, None) else parallelism))

    def _parse(b: pa.Table) -> pa.Table:
        out = []
        for data in b.column("bytes").to_pylist():
            # sniff the gzip magic rather than trusting the extension:
            # Ray's read_binary_files already auto-gunzips *.gz by
            # extension, so double-decompressing would throw — and a
            # mislabeled plain file parses either way
            if data[:2] == b"\x1f\x8b":
                try:
                    data = gzip.decompress(data)
                except (OSError, EOFError):
                    continue  # corrupt member: fail soft, skip file
            out.append(parse_warc_bytes(data))
        out = [t for t in out if t.num_rows]
        if not out:
            return pa.Table.from_pydict({
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "html": pa.array([], pa.binary())})
        return pa.concat_tables(out, promote_options="permissive")

    from raydoc.ops.relational import nonempty_batches

    return files.map_batches(nonempty_batches(_parse),
                             batch_format="pyarrow", batch_size=1)


def read_wet(paths, parallelism: int = -1):
    """WET file paths (CC's extracted-text sibling of WARC: the same
    record framing, ``WARC-Type: conversion`` records holding plain
    text) -> Dataset ``(url, warc_ts, text)`` with text decoded
    utf-8/replace — the documents-table shape, ready for the curation
    stack without the extract stage."""
    import pyarrow.compute as pc
    import ray.data as rd

    files = rd.read_binary_files(paths, override_num_blocks=(
        None if parallelism in (-1, None) else parallelism))

    def _parse(b: pa.Table) -> pa.Table:
        out = []
        for data in b.column("bytes").to_pylist():
            if data[:2] == b"\x1f\x8b":
                try:
                    data = gzip.decompress(data)
                except (OSError, EOFError):
                    continue  # corrupt member: fail soft, skip file
            out.append(parse_warc_bytes(
                data, record_type="conversion", strip_http=False,
                body_col="text"))
        out = [t for t in out if t.num_rows]
        if not out:
            return pa.Table.from_pydict({
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "text": pa.array([], pa.string())})
        t = pa.concat_tables(out, promote_options="permissive")
        # bytes -> text: per-row decode with replace (WET is utf-8 by
        # spec, but CC carries stragglers); rows are file-local so the
        # loop is bounded by one file's records, like the record walk
        txt = pa.array([x.decode("utf-8", errors="replace")
                        for x in t.column("text").to_pylist()],
                       pa.string())
        return t.set_column(t.schema.get_field_index("text"),
                            "text", txt)

    from raydoc.ops.relational import nonempty_batches

    return files.map_batches(nonempty_batches(_parse),
                             batch_format="pyarrow", batch_size=1)


def write_wet_bytes(records) -> bytes:
    """Deterministic WET fixture writer: (url, iso_ts, text) ->
    conversion records."""
    chunks = [b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
              b"Content-Length: 0\r\n\r\n\r\n\r\n"]
    for url, ts, text in records:
        body = text.encode("utf-8")
        hdr = (f"WARC/1.0\r\nWARC-Type: conversion\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts}\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode()
        chunks.append(hdr + body + b"\r\n\r\n")
    return b"".join(chunks)


def write_warc_bytes(records) -> bytes:
    """Deterministic WARC writer for fixtures and round-trip tests:
    ``records`` = iterable of (url, iso_ts, html_bytes) -> one WARC
    buffer with a warcinfo record plus one response record each
    (HTTP/200 header block included, as CC captures have)."""
    chunks = [b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
              b"Content-Length: 0\r\n\r\n\r\n\r\n"]
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts}\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        chunks.append(hdr + http + b"\r\n\r\n")
    return b"".join(chunks)
