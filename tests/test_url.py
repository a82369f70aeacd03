"""URL canonicalization + recrawl dedup (ops/url.py)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from raydoc.ops.url import canonicalize_url_batch, url_dedup

SF_DIR = "/root/testdata/sf0.001"


def _canon(urls: list[str | None]) -> list[str | None]:
    t = pa.table({"url": pa.array(urls, pa.string())})
    return canonicalize_url_batch(t).column("canon_url").to_pylist()


class TestCanonKernel:
    def test_rule_matrix(self):
        cases = {
            # fragment + default port + mixed case + utm + param sort
            "https://WWW.Site.COM:443/Articles/42/?utm_source=f&b=2&a=1#s":
                "https://www.site.com/Articles/42?a=1&b=2",
            "http://Host.com:80/": "http://host.com/",
            # non-default port survives; trailing-slash RUN collapses
            "http://host.com:8080/a/b//": "http://host.com:8080/a/b",
            # empty path -> '/'
            "https://h.com": "https://h.com/",
            # query that empties out drops its '?'
            "https://h.com/p?utm_campaign=x": "https://h.com/p",
            "https://h.com/p?z=9&gclid=abc&A=2": "https://h.com/p?A=2&z=9",
            # path case is PRESERVED
            "ftp://H.com/Files/": "ftp://h.com/Files",
            # duplicate keys both survive, byte-sorted
            "https://h.com/p?a=1&a=0": "https://h.com/p?a=0&a=1",
            # 'ref' dropped only as a whole key ('refresh' keeps)
            "https://h.com/p?ref=x&refresh=1": "https://h.com/p?refresh=1",
        }
        got = _canon(list(cases))
        assert got == list(cases.values())

    def test_non_url_passthrough_strips_only_fragment(self):
        assert _canon(["not a url?x=1#frag"]) == ["not a url?x=1"]

    def test_null_stays_null(self):
        assert _canon([None, "https://h.com/a"]) == [None, "https://h.com/a"]

    def test_idempotent(self):
        urls = ["https://A.B:443/x/?b=2&a=1#f", "http://h.com:80",
                "https://h.com/p?utm_x=1", "junk",
                # malformed doubled default port: the strip is anchored
                # to a colon-free host, so this must NOT strip once per
                # pass (which would change the key on re-canonicalization)
                "https://h.com:443:443/x", "http://h.com:80:80"]
        once = _canon(urls)
        assert _canon(once) == once

    def test_doubled_port_left_alone(self):
        assert _canon(["https://h.com:443:443/x"]) == [
            "https://h.com:443:443/x"]
        assert _canon(["https://h.com:443/x"]) == ["https://h.com/x"]

    def test_empty_batch(self):
        assert _canon([]) == []


class TestUrlDedup:
    def test_latest_fetch_wins_per_canonical(self, ray_session):
        import ray.data as rd

        rows = [
            {"url": "https://H.com/a?utm_s=1", "fetch_ts": 1},
            {"url": "https://h.com:443/a", "fetch_ts": 2},
            {"url": "https://h.com/a#frag", "fetch_ts": 3},
            {"url": "https://h.com/b", "fetch_ts": 1},
        ]
        out = url_dedup(rd.from_items(rows), "url", "fetch_ts").to_pandas()
        out = out.sort_values("canon_url").reset_index(drop=True)
        assert list(out["canon_url"]) == ["https://h.com/a", "https://h.com/b"]
        assert list(out["fetch_ts"]) == [3, 1]
        assert list(out["url"]) == ["https://h.com/a#frag", "https://h.com/b"]


def test_docs_url_dedup_matches_duckdb(ray_session):
    """Full-rules side-by-side vs the registered SQL oracle at sf0.001
    (the driver repeats this at sf0.01)."""
    from raydoc.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    df = QUERIES["docs_url_dedup"](SF_DIR).to_pandas()
    odf = con.execute(ORACLES["docs_url_dedup"]).fetchdf()
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a.astype(str).equals(b.astype(str))


class TestRobots:
    TXT = (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "Disallow: /tmp\n"
        "Disallow: /wild*card\n"   # wildcard rule skipped
        "\n"
        "User-agent: strictbot\n"
        "Disallow: /\n")

    def test_parse_groups_and_wildcard_skip(self):
        from raydoc.ops.url import parse_robots

        assert parse_robots(self.TXT) == [
            ("/private/", False), ("/private/ok", True),
            ("/tmp", False)]
        assert parse_robots(self.TXT, "StrictBot") == [("/", False)]
        assert parse_robots("", "*") == []

    def test_filter_longest_match_and_defaults(self, ray_session):
        import ray.data as rd

        from raydoc.ops.url import filter_robots_disallowed

        urls = ["https://a.com/public/x",      # no rule -> allow
                "https://a.com/private/x",     # disallow
                "https://a.com/private/ok/y",  # longer allow wins
                "https://a.com/tmpfile",       # prefix match disallow
                "https://A.COM:443/private/z",  # case/port normalize
                "https://other.net/private/x",  # unknown host -> allow
                "garbage"]                     # hostless -> drop
        ds = rd.from_arrow(pa.table({"url": urls})).repartition(2)
        out = filter_robots_disallowed(ds, {"a.com": self.TXT})
        kept = sorted(r["url"] for r in out.take_all())
        assert kept == sorted([
            "https://a.com/public/x",
            "https://a.com/private/ok/y",
            "https://other.net/private/x"])

    def test_agent_specific_group(self, ray_session):
        import ray.data as rd

        from raydoc.ops.url import filter_robots_disallowed

        ds = rd.from_arrow(pa.table({"url": ["https://a.com/anything"]}))
        out = filter_robots_disallowed(ds, {"a.com": self.TXT},
                                       agent="strictbot").take_all()
        assert out == []

    def test_tie_prefers_allow_either_order(self, ray_session):
        import ray.data as rd

        from raydoc.ops.url import filter_robots_disallowed

        ds = rd.from_arrow(pa.table({"url": ["https://a.com/p/x"]}))
        for txt in ("User-agent: *\nDisallow: /p/\nAllow: /p/\n",
                    "User-agent: *\nAllow: /p/\nDisallow: /p/\n"):
            out = filter_robots_disallowed(ds, {"a.com": txt}).take_all()
            assert len(out) == 1, txt
