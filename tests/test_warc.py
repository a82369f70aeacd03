"""WARC ingestion (raydoc/sources/warc.py)."""

import gzip

import pyarrow as pa
import pytest

from raydoc.sources.warc import (parse_warc_bytes, read_warc,
                                 write_warc_bytes)

RECS = [
    ("https://a.com/x", "2024-01-01T00:00:00Z", b"<html>alpha</html>"),
    ("https://b.org/y", "2024-01-02T12:30:00Z", b"<html>b\xffeta</html>"),
    ("https://c.net/z", "not-a-date", b"<p>c</p>"),
]


class TestParse:
    def test_round_trip(self):
        t = parse_warc_bytes(write_warc_bytes(RECS))
        assert t.num_rows == 3
        assert t.column("url").to_pylist() == [r[0] for r in RECS]
        assert t.column("html").to_pylist() == [r[2] for r in RECS]
        ts = t.column("warc_ts").to_pylist()
        assert ts[0].year == 2024 and ts[1].hour == 12
        assert ts[2] is None  # unparseable date -> null, row kept

    def test_non_response_records_skipped(self):
        buf = write_warc_bytes(RECS[:1])
        extra = (b"WARC/1.0\r\nWARC-Type: request\r\n"
                 b"WARC-Target-URI: https://a.com/x\r\n"
                 b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
        t = parse_warc_bytes(extra + buf)
        assert t.num_rows == 1

    def test_truncated_tail_fails_soft(self):
        buf = write_warc_bytes(RECS)
        t = parse_warc_bytes(buf[:-30])  # cut into the last record
        assert t.num_rows == 2

    def test_body_without_http_header_kept_whole(self):
        raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://d.io/\r\n"
               b"WARC-Date: 2024-05-05T05:05:05Z\r\n"
               b"Content-Length: 9\r\n\r\nraw-bytes\r\n\r\n")
        t = parse_warc_bytes(raw)
        assert t.column("html").to_pylist() == [b"raw-bytes"]

    def test_garbage_and_empty(self):
        assert parse_warc_bytes(b"").num_rows == 0
        assert parse_warc_bytes(b"not a warc at all").num_rows == 0


class TestReadWarc:
    def test_read_plain_and_gz_into_flagship_schema(self, ray_session,
                                                    tmp_path):
        p1 = tmp_path / "a.warc"
        p1.write_bytes(write_warc_bytes(RECS[:2]))
        p2 = tmp_path / "b.warc.gz"
        p2.write_bytes(gzip.compress(write_warc_bytes(RECS[2:])))
        ds = read_warc([str(p1), str(p2)])
        rows = sorted(r["url"] for r in ds.take_all())
        assert rows == sorted(r[0] for r in RECS)

    def test_warc_to_extract_composes(self, ray_session, tmp_path):
        from raydoc.pipelines.extract_pipeline import extract_map_fn

        p = tmp_path / "c.warc"
        p.write_bytes(write_warc_bytes(
            [("https://a.com/p", "2024-01-01T00:00:00Z",
              b"<html><body><p>real page body text here</p>"
              b"</body></html>")]))
        out = read_warc([str(p)]).map_batches(
            extract_map_fn(token_budget=64, with_chunks=False),
            batch_format="pyarrow").take_all()
        assert out[0]["status"] == "ok"
        assert "real page body text here" in out[0]["text"]

    def test_warc_spec_source(self, ray_session, tmp_path):
        from raydoc.pipelines.spec import run_spec

        p = tmp_path / "d.warc"
        p.write_bytes(write_warc_bytes(
            [("https://a.com/1", "2024-01-01T00:00:00Z",
              b"<html><body><p>spec page body words</p></body></html>")]))
        n = run_spec({
            "source": {"op": "read_warc", "path": str(p)},
            "stages": [{"op": "extract", "batch_size": 8}],
            "sink": {"op": "count"}})
        assert n == 1


class TestWet:
    def test_wet_round_trip_and_decode(self, ray_session, tmp_path):
        import gzip as _gz

        from raydoc.sources.warc import read_wet, write_wet_bytes

        recs = [("https://a.com/1", "2024-03-01T00:00:00Z",
                 "plain extracted text one"),
                ("https://b.org/2", "2024-03-02T00:00:00Z",
                 "unicode snippet: danke schön 中文")]
        p = tmp_path / "x.wet.gz"
        p.write_bytes(_gz.compress(write_wet_bytes(recs)))
        rows = sorted(read_wet([str(p)]).take_all(),
                      key=lambda r: r["url"])
        assert [r["text"] for r in rows] == [r[2] for r in recs]

    def test_wet_feeds_curation_shape(self, ray_session, tmp_path):
        from raydoc.ops.text import token_count_batch
        from raydoc.sources.warc import read_wet, write_wet_bytes

        p = tmp_path / "y.wet"
        p.write_bytes(write_wet_bytes(
            [("https://a.com/1", "2024-03-01T00:00:00Z",
              "five plain text tokens here")]))
        out = read_wet([str(p)]).map_batches(
            lambda b: token_count_batch(b, "text"),
            batch_format="pyarrow").take_all()
        assert out[0]["n_tokens"] == 5


class TestMalformed:
    def test_negative_content_length_terminates(self):
        raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x.io/\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Length: -5\r\n\r\nbody\r\n\r\n")
        t = parse_warc_bytes(raw)  # must return, not loop forever
        assert t.num_rows == 0

    def test_zero_content_length_response(self):
        raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x.io/\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Length: 0\r\n\r\n\r\n\r\n")
        t = parse_warc_bytes(raw)
        assert t.num_rows == 1 and t.column("html").to_pylist() == [b""]
