"""Tests for connectors and the fetch+extract stage."""

import pytest

from raydoc.sources.connectors import (
    FinanceConnector,
    NewsConnector,
    SearchConnector,
    TranslateConnector,
    network_transport,
)


class TestConnectors:
    def test_search_deterministic_topn(self):
        c = SearchConnector()
        r1, r2 = c.fetch("ray data", 3), c.fetch("ray data", 3)
        assert r1 == r2 and len(r1) == 3
        assert [r["rank"] for r in r1] == [1, 2, 3]
        assert all(r["status"] == "ok" for r in r1)

    def test_error_in_band_not_raised(self):
        c = SearchConnector(transport=network_transport)
        rows = c.fetch("anything")
        assert len(rows) == 1
        assert rows[0]["status"] == "error:NotImplementedError"

    def test_news_keyword_filter(self):
        all_rows = NewsConnector().fetch("markets", 10)
        kw = all_rows[0]["content"].split()[0]
        filtered = NewsConnector(keyword=kw).fetch("markets", 10)
        assert all(kw in r["content"] for r in filtered)
        assert len(filtered) <= len(all_rows)

    def test_finance_has_values(self):
        rows = FinanceConnector().fetch("TICK", 4)
        assert all(isinstance(r["value"], float) for r in rows)

    def test_translate_double(self):
        rows = TranslateConnector().fetch("hello big world")
        assert rows[0]["content"] == "world big hello"


@pytest.mark.usefixtures("ray_session")
class TestConnectorSource:
    def test_fanout_and_schema(self):
        from raydoc.sources.connectors import connector_source

        out = connector_source("search", ["q1", "q2", "q3"], top_n=4).to_pandas()
        assert len(out) == 12
        assert set(out["query"]) == {"q1", "q2", "q3"}
        assert set(out.columns) >= {"query", "rank", "title", "content",
                                    "source", "status"}


@pytest.mark.usefixtures("ray_session")
class TestFetchExtract:
    def test_fetch_matches_pipeline_extraction(self):
        from raydoc.corpus import gen_row
        from raydoc.extract.html_extract import extract_page
        from raydoc.sources.crawl_stage import fetch_urls

        rows = [gen_row(i) for i in (3, 17, 42)]
        urls = [r["url"] for r in rows] + ["https://nowhere.example.com/missing"]
        out = fetch_urls(urls, extract_type="content").to_pandas().set_index("url")
        for r in rows:
            assert out.loc[r["url"], "content"] == extract_page(r["html"])["text"]
        assert out.loc["https://nowhere.example.com/missing", "status"].startswith(
            "error:FileNotFoundError")
