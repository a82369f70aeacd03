"""Request-construction conformance for the connector family (VERDICT
r04 #6): the url/param/signing builders must mirror the reference
components, and fetch() must run end-to-end against RECORDED payloads
(fixture_transport), exercising the request side — not just the parse
side the offline doubles cover. No Ray, no network."""

import hashlib
import os

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "connectors")


def _fx():
    from raydoc.sources.connectors import fixture_transport

    return fixture_transport(FIXTURES)


class TestRequestConstruction:
    def test_search_serpapi_params(self):
        """google.py:73-78: engine/q/api_key/gl/hl/num; news channel
        switches engine (duckduckgo.py:38-66's text/news split)."""
        from raydoc.sources.connectors import SearchConnector

        r = SearchConnector(api_key="k1", country="de",
                            language="fr").build_request("q text", 7)
        assert r["url"] == "https://serpapi.com/search"
        assert r["params"] == {"engine": "google", "q": "q text",
                               "api_key": "k1", "gl": "de", "hl": "fr",
                               "num": 7}
        rn = SearchConnector(channel="news").build_request("x", 3)
        assert rn["params"]["engine"] == "google_news"

    def test_translate_md5_signing(self):
        """baidufanyi.py:71: sign = md5(appid + q + salt + secret_key);
        fieldtranslate signs with the domain inserted
        (baidufanyi.py:83)."""
        from raydoc.sources.connectors import TranslateConnector

        c = TranslateConnector(appid="A", secret_key="K", target_lang="fr")
        r = c.build_request("hello world", 1)
        p = r["params"]
        want = hashlib.md5(
            ("A" + "hello world" + p["salt"] + "K").encode()).hexdigest()
        assert p["sign"] == want
        assert 32768 <= int(p["salt"]) <= 65536
        assert r["headers"]["Content-Type"] == \
            "application/x-www-form-urlencoded"
        # same query -> same salt -> same sign (replayable fixtures)
        assert c.build_request("hello world", 1)["params"]["sign"] == want

        cf = TranslateConnector(appid="A", secret_key="K",
                                trans_type="fieldtranslate", domain="law")
        rf = cf.build_request("hello world", 1)
        pf = rf["params"]
        wantf = hashlib.md5(
            ("A" + "hello world" + pf["salt"] + "law" + "K").encode()
        ).hexdigest()
        assert pf["sign"] == wantf and pf["domain"] == "law"
        assert rf["url"].endswith("/fieldtranslate")

    def test_lookup_join_two_step_urls(self):
        """qweather.py:66-111: geo lookup then kind-dependent path;
        base url switches on user_type, indices adds type=0."""
        from raydoc.sources.connectors import LookupJoinConnector

        c = LookupJoinConnector(api_key="wk", kind="weather",
                                time_period="3d")
        lk = c.build_lookup_request("beijing")
        assert lk["url"] == "https://geoapi.qweather.com/v2/city/lookup"
        assert lk["params"] == {"location": "beijing", "key": "wk"}
        dr = c.build_data_request("loc-1", "beijing")
        assert dr["url"] == "https://devapi.qweather.com/v7/weather/3d"
        assert dr["params"]["location"] == "loc-1"
        paid = LookupJoinConnector(user_type="paid", kind="indices")
        di = paid.build_data_request("loc-1", "q")
        assert di["url"] == "https://api.qweather.com/v7/indices/1d"
        assert di["params"]["type"] == "0"
        air = LookupJoinConnector(kind="airquality").build_data_request(
            "loc-1", "q")
        assert air["url"].endswith("/air/now")

    def test_pubmed_esearch_efetch_params(self):
        """pubmed.py:49-52: esearch(db,retmax,term) then
        efetch(db,id=','.join(ids),retmode=xml)."""
        from raydoc.sources.connectors import XmlConnector

        c = XmlConnector(email="who@lab.org")
        es = c.build_request("gene therapy", 5)
        assert es["url"].endswith("/esearch.fcgi")
        assert es["params"] == {"db": "pubmed", "retmax": 5,
                                "term": "gene therapy",
                                "email": "who@lab.org"}
        ef = c.build_fetch_request(["1", "2"], "gene therapy")
        assert ef["url"].endswith("/efetch.fcgi")
        assert ef["params"] == {"db": "pubmed", "id": "1,2",
                                "retmode": "xml"}

    def test_news_finance_multitable_flatten_params(self):
        from raydoc.sources.connectors import (FinanceConnector,
                                               FlattenConnector,
                                               MultiTableConnector,
                                               NewsConnector)

        rn = NewsConnector(token="T", src="sina").build_request("q", 4)
        assert rn["method"] == "POST"
        assert rn["params"]["api_name"] == "news"  # tushare.py:52-56
        assert rn["params"]["token"] == "T" and rn["params"]["src"] == "sina"
        rf = FinanceConnector().build_request("TICK", 4)
        assert rf["params"]["symbol"] == "TICK"  # akshare.py:34-55
        rm = MultiTableConnector(
            sections=("info", "news")).build_request("MSFT", 5)
        assert rm["params"]["modules"] == "info,news"
        rw = FlattenConnector(query_type="fund").build_request("q", 9)
        assert rw["params"] == {"query": "q", "query_type": "fund",
                                "perpage": 9}  # wencai.py:51


class TestFixtureReplay:
    """fetch() end-to-end over recorded payloads: the built request must
    MATCH the recorded one (url + params) for the payload to be served,
    so these runs exercise request construction and parsing together."""

    def test_search_replay(self):
        from raydoc.sources.connectors import SearchConnector

        rows = SearchConnector(transport=_fx()).fetch(
            "ray data streaming", 2)
        assert [r["title"] for r in rows] == ["Ray Data overview",
                                              "Dataset API"]
        assert all(r["status"] == "ok" for r in rows)

    def test_news_replay_and_keyword_filter(self):
        from raydoc.sources.connectors import NewsConnector

        rows = NewsConnector(transport=_fx()).fetch("any", 5)
        assert len(rows) == 2
        kw = NewsConnector(transport=_fx(), keyword="foundry").fetch(
            "any", 5)
        assert len(kw) == 1 and "Chip" in kw[0]["title"]

    def test_finance_replay(self):
        from raydoc.sources.connectors import FinanceConnector

        rows = FinanceConnector(transport=_fx()).fetch("TICK", 3)
        assert rows[0]["value"] == 101.5

    def test_translate_replay_and_error_payload(self):
        from raydoc.sources.connectors import TranslateConnector

        ok = TranslateConnector(transport=_fx(),
                                target_lang="fr").fetch("hello world")
        assert ok[0]["content"] == "bonjour le monde"
        err = TranslateConnector(transport=_fx(),
                                 target_lang="fr").fetch("quota please")
        assert err[0]["status"] == "error:54003"  # baidufanyi.py:77-78
        assert err[0]["content"].startswith("**Error**:")

    def test_lookup_join_replay(self):
        from raydoc.sources.connectors import LookupJoinConnector

        rows = LookupJoinConnector(transport=_fx()).fetch("beijing", 2)
        assert [r["title"] for r in rows] == ["2026-08-19", "2026-08-20"]
        assert rows[0]["content"] == "sunny"

    def test_multitable_replay(self):
        from raydoc.sources.connectors import MultiTableConnector

        rows = MultiTableConnector(transport=_fx(),
                                   sections=("info",)).fetch("MSFT", 5)
        assert len(rows) == 1 and "431.2" in rows[0]["content"]

    def test_pubmed_two_step_replay(self):
        from raydoc.sources.connectors import XmlConnector

        rows = XmlConnector(transport=_fx()).fetch("gene therapy", 5)
        assert len(rows) == 2
        assert rows[0]["title"] == "Vector design for gene therapy"
        assert "38000001" in rows[0]["content"]
        assert "No abstract available" in rows[1]["content"]

    def test_flatten_replay(self):
        from raydoc.sources.connectors import FlattenConnector

        rows = FlattenConnector(transport=_fx()).fetch("top ev makers", 9)
        titles = {r["title"] for r in rows}
        # meta-dicts and image tables are skipped (wencai.py:66-75)
        assert titles == {"summary", "quotes", "count"}

    def test_unrecorded_request_is_in_band_error(self):
        from raydoc.sources.connectors import SearchConnector

        rows = SearchConnector(transport=_fx()).fetch("never recorded", 2)
        assert rows[0]["status"] == "error:LookupError"
