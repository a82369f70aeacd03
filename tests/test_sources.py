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


class TestConnectorShapes:
    def test_lookup_join_two_step_and_error_codes(self):
        from raydoc.sources.connectors import LookupJoinConnector

        c = LookupJoinConnector()
        rows = c.fetch("beijing", top_n=2)
        assert [r["status"] for r in rows] == ["ok", "ok"]
        assert rows[0]["title"].startswith("2026-08-")
        # same city resolves through the same location id -> same data
        assert c.fetch("beijing", top_n=2) == rows
        # backend error code at the lookup step: in-band **Error** row
        err = c.fetch("err:404 atlantis")
        assert len(err) == 1 and err[0]["status"] == "error:404"
        assert err[0]["content"].startswith("**Error**")

    def test_multitable_fanout_sections(self):
        from raydoc.sources.connectors import MultiTableConnector

        c = MultiTableConnector(sections=("info", "balance_sheet", "news"))
        rows = c.fetch("MSFT", top_n=10)
        assert [r["title"] for r in rows] == ["info", "balance_sheet", "news"]
        assert all(r["content"].startswith(r["title"] + ":\n") for r in rows)
        import pytest as _pt

        with _pt.raises(ValueError):
            MultiTableConnector(sections=("nope",))

    def test_xml_projection_strips_markup_and_defaults(self):
        from raydoc.sources.connectors import XmlConnector

        c = XmlConnector()
        rows = c.fetch("gene therapy", top_n=5)
        assert 1 <= len(rows) <= 5
        assert all(r["content"].startswith("Title:") for r in rows)
        assert all("<b>" not in r["content"] for r in rows)
        assert all("pubmed.ncbi.nlm.nih.gov/" in r["content"] for r in rows)
        joined = "\n".join(r["content"] for r in rows)
        assert "Abstract:" in joined

    def test_flatten_polymorphic_dict(self):
        from raydoc.sources.connectors import FlattenConnector

        c = FlattenConnector()
        rows = c.fetch("top ev makers", top_n=10)
        titles = [r["title"] for r in rows]
        # meta-dicts and image tables are skipped (wencai.py:66-75)
        assert "_internal" not in titles and "chart" not in titles
        assert {"summary", "quotes", "detail", "count"} <= set(titles)
        q = next(r for r in rows if r["title"] == "quotes")
        assert q["content"].count("\n") == 3  # header + 3 records
