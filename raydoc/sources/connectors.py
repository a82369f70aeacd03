"""Query-driven source connectors.

Re-expression of the reference's connector family
(/root/reference/agent/component/{baidu,duckduckgo,google,bing,
wikipedia,arxiv,pubmed,github,akshare,tushare,...}.py): every connector
is ``fetch(query, top_n) -> rows`` where rows carry
(query, rank, title, content, source, status). Error handling follows
the reference's in-band convention (a failed fetch emits one
status="error" row, never raises — baidu.py:70-71), so one bad query
never kills a pipeline.

``transport`` seam: connectors BUILD a structured request
(``build_request(query, top_n) -> {"url", "method", "params",
"headers", "seed"}`` — the url/param/signing construction mirrors the
reference component it models, e.g. BaiduFanyi's md5 signing
baidufanyi.py:66-76, Google's SerpApi params google.py:73-78,
QWeather's two-step geo lookup qweather.py:66-75) and call
``self.transport(request) -> payload``. The default
``offline_transport`` synthesizes deterministic results (seeded by the
request's ``seed`` string); ``fixture_transport(dir)`` replays
recorded payloads matched on url + params (the test seam for the
request-building code); ``network_transport`` raises
NotImplementedError at the line where requests/httpx would be used.

``connector_source`` fans a list of queries out as a Dataset and runs
the connector in an actor pool (connection/session built once per
actor, the reference's per-run client pattern).

Beyond the four generic shape families, four connector-specific
dataflow shapes are modeled: two-step lookup-join (QWeather,
qweather.py:60-117), multi-table fan-out (YahooFinance,
yahoofinance.py:50-84), nested-XML projection (PubMed,
pubmed.py:39-69), and polymorphic-dict flattening (WenCai,
wencai.py:40-79).
"""

from __future__ import annotations

import random
from typing import Callable

import pyarrow as pa

from raydoc.hashing import stable_u64

__all__ = [
    "Connector",
    "SearchConnector",
    "NewsConnector",
    "FinanceConnector",
    "TranslateConnector",
    "LookupJoinConnector",
    "MultiTableConnector",
    "XmlConnector",
    "FlattenConnector",
    "connector_source",
    "offline_transport",
    "fixture_transport",
    "network_transport",
    "CONNECTOR_REGISTRY",
]

_WORDS = ("data ray stream batch block shuffle partition actor arrow parquet "
          "table column row page content extract chunk title text search "
          "result news stock market price index weather city paper author").split()


def _seed_of(request) -> str:
    """Deterministic seed string of a request: its ``seed`` field for
    structured requests, the string itself for the legacy plain form."""
    if isinstance(request, dict):
        return request.get("seed") or request.get("url", "")
    return str(request)


def offline_transport(request) -> dict:
    """Deterministic synthetic backend: payload derived from the
    request's seed string only (same request -> same payload on any
    node/process)."""
    rng = random.Random(stable_u64(_seed_of(request)))
    return {
        "items": [
            {
                "title": " ".join(rng.choice(_WORDS) for _ in range(4)).title(),
                "snippet": " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 20))),
                "value": round(rng.uniform(1, 500), 2),
            }
            for _ in range(10)
        ]
    }


def network_transport(request) -> dict:
    raise NotImplementedError(
        "no network in this environment; plug an HTTP transport "
        "(requests/httpx) here — same seam the reference fills with "
        "requests.get (invoke.py:75-91)"
    )


def fixture_transport(fixture_dir: str):
    """Recorded-fixture backend: replays canned payloads from
    ``fixture_dir/*.json``. Each fixture is
    ``{"match": {"url": ..., "params": {...}}, "payload": {...}}`` —
    a request matches when its url equals the fixture's and every
    fixture param equals the request's (subset match, so volatile
    params like signatures can be left out of the fixture). First
    match wins; no match raises LookupError, which ``fetch`` maps to
    an in-band error row — exactly how an unrecorded HTTP call should
    fail in a replay test."""
    import glob
    import json
    import os

    fixtures = []
    for path in sorted(glob.glob(os.path.join(fixture_dir, "*.json"))):
        with open(path) as f:
            loaded = json.load(f)
        for fx in loaded if isinstance(loaded, list) else [loaded]:
            fixtures.append((fx.get("match", {}), fx["payload"], path))

    def _transport(request) -> dict:
        req = request if isinstance(request, dict) else {"url": str(request)}
        params = req.get("params") or {}
        for match, payload, _path in fixtures:
            if match.get("url") and match["url"] != req.get("url"):
                continue
            want = match.get("params") or {}
            if all(str(params.get(k)) == str(v) for k, v in want.items()):
                return payload
        raise LookupError(
            f"no recorded fixture for {req.get('url')!r} params={params!r}")

    return _transport


class Connector:
    """Base: subclasses set ``source``, implement ``_rows`` and
    override ``build_request`` with the reference component's actual
    url/param construction."""

    source = "base"

    def __init__(self, transport: Callable[[str], dict] | None = None) -> None:
        # once-per-actor client construction slot
        self.transport = transport or offline_transport

    def build_request(self, query: str, top_n: int) -> dict:
        """Structured request the transport executes. ``seed`` pins the
        offline double's determinism and is ignored by real transports."""
        return {"url": f"https://api.example.com/{self.source}",
                "method": "GET",
                "params": {"q": query, "num": top_n},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    def _rows(self, query: str, payload: dict, top_n: int) -> list[dict]:
        raise NotImplementedError

    def fetch(self, query: str, top_n: int = 5) -> list[dict]:
        try:
            payload = self.transport(self.build_request(query, top_n))
            rows = self._rows(query, payload, top_n)[:top_n]
            for rank, r in enumerate(rows):
                r.setdefault("query", query)
                r["rank"] = rank + 1
                r.setdefault("source", self.source)
                r.setdefault("status", "ok")
            return rows
        except Exception as e:  # in-band error row (baidu.py:70-71)
            return [{"query": query, "rank": 0, "title": "", "content": "",
                     "source": self.source, "status": f"error:{type(e).__name__}"}]


class SearchConnector(Connector):
    """Web-search shape (baidu/duckduckgo/google/bing/wikipedia)."""

    def __init__(self, transport=None, channel: str = "text",
                 api_key: str = "demo-key", country: str = "us",
                 language: str = "en") -> None:
        super().__init__(transport)
        self.channel = channel  # text | news (duckduckgo.py:38-66)
        self.source = f"search:{channel}"
        self.api_key = api_key
        self.country = country
        self.language = language

    def build_request(self, query: str, top_n: int) -> dict:
        """SerpApi request shape (google.py:73-78: engine/q/api_key/
        gl/hl/num); the news channel switches engine the way
        duckduckgo.py:38-66 switches DDGS().text/news."""
        engine = "google_news" if self.channel == "news" else "google"
        return {"url": "https://serpapi.com/search",
                "method": "GET",
                "params": {"engine": engine, "q": query,
                           "api_key": self.api_key, "gl": self.country,
                           "hl": self.language, "num": top_n},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    def _rows(self, query, payload, top_n):
        return [{"title": it["title"], "content": it["snippet"]}
                for it in payload["items"]]


class NewsConnector(Connector):
    """News + keyword containment filter (tushare.py:65's client-side
    ``str.contains`` predicate)."""

    source = "news"

    def __init__(self, transport=None, keyword: str | None = None,
                 token: str = "demo-token", src: str = "eastmoney") -> None:
        super().__init__(transport)
        self.keyword = keyword
        self.token = token
        self.src = src

    def build_request(self, query: str, top_n: int) -> dict:
        """TuShare quick-news POST shape (tushare.py:46-60: api_name /
        token / params{src,start_date,end_date}); the keyword predicate
        stays client-side like the reference's str.contains filter
        (tushare.py:65)."""
        return {"url": "http://api.tushare.pro",
                "method": "POST",
                "params": {"api_name": "news", "token": self.token,
                           "src": self.src, "q": query, "num": top_n},
                "headers": {"Content-Type": "application/json"},
                "seed": f"{self.source}:{query}"}

    def _rows(self, query, payload, top_n):
        rows = [{"title": it["title"], "content": it["snippet"]}
                for it in payload["items"]]
        if self.keyword:
            rows = [r for r in rows
                    if self.keyword.lower() in r["content"].lower()]
        return rows


class FinanceConnector(Connector):
    """Finance shape: numeric fields + multi-table fan-out key
    (yahoofinance.py:50-84, akshare.py:34-55)."""

    source = "finance"

    def build_request(self, query: str, top_n: int) -> dict:
        """Per-symbol GET shape (akshare.py:34-55's
        stock_news_em(symbol=...))."""
        return {"url": "https://api.example-finance.com/stock_news",
                "method": "GET",
                "params": {"symbol": query, "num": top_n},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    def _rows(self, query, payload, top_n):
        return [{"title": it["title"], "content": it["snippet"],
                 "value": it["value"]} for it in payload["items"]]


class TranslateConnector(Connector):
    """Per-row scalar transform via external model (deepl.py:45-61,
    baidufanyi.py:58-95). The request carries BaiduFanyi's md5 signing
    protocol: ``sign = md5(appid + q + salt + secret_key)`` for
    ``translate``, ``md5(appid + q + salt + domain + secret_key)`` for
    ``fieldtranslate`` (baidufanyi.py:71,83). One divergence, for
    replayability: the reference draws ``salt`` from
    ``random.randint(32768, 65536)`` per call; here it is a stable
    hash of the query into the same range, so a recorded fixture can
    match the signature. Offline double = deterministic token-reverse,
    delivered through the same ``trans_result[0].dst`` payload shape
    the reference parses (baidufanyi.py:79)."""

    source = "translate"

    def __init__(self, transport=None, target_lang: str = "en",
                 source_lang: str = "auto", appid: str = "demo-appid",
                 secret_key: str = "demo-secret",
                 trans_type: str = "translate", domain: str = "it") -> None:
        super().__init__(transport or self.offline_payload)
        self.target = target_lang
        self.source_lang = source_lang
        self.appid = appid
        self.secret_key = secret_key
        self.trans_type = trans_type  # translate | fieldtranslate
        self.domain = domain

    def build_request(self, query: str, top_n: int) -> dict:
        from hashlib import md5

        salt = str(32768 + stable_u64(query) % 32768)
        if self.trans_type == "fieldtranslate":
            sign = md5((self.appid + query + salt + self.domain
                        + self.secret_key).encode("utf-8")).hexdigest()
            url = "http://api.fanyi.baidu.com/api/trans/vip/fieldtranslate"
            params = {"q": query, "from": self.source_lang,
                      "to": self.target, "appid": self.appid,
                      "salt": salt, "domain": self.domain, "sign": sign}
        else:
            sign = md5((self.appid + query + salt
                        + self.secret_key).encode("utf-8")).hexdigest()
            url = "http://api.fanyi.baidu.com/api/trans/vip/translate"
            params = {"q": query, "from": self.source_lang,
                      "to": self.target, "appid": self.appid,
                      "salt": salt, "sign": sign}
        return {"url": url, "method": "POST", "params": params,
                "headers": {"Content-Type":
                            "application/x-www-form-urlencoded"},
                "seed": f"{self.source}:{query}"}

    @staticmethod
    def offline_payload(request) -> dict:
        q = (request.get("params", {}).get("q", "")
             if isinstance(request, dict) else str(request))
        return {"trans_result": [{"dst": " ".join(reversed(q.split()))}]}

    def fetch(self, query: str, top_n: int = 1) -> list[dict]:
        try:
            payload = self.transport(self.build_request(query, top_n))
            if payload.get("error_code"):  # baidufanyi.py:77-78
                return [{"query": query, "rank": 0, "title": "",
                         "content": "**Error**:"
                         + str(payload.get("error_msg", "")),
                         "source": self.source,
                         "status": f"error:{payload['error_code']}"}]
            translated = payload["trans_result"][0]["dst"]
            return [{"query": query, "rank": 1, "title": "",
                     "content": translated, "source": self.source,
                     "status": "ok"}]
        except Exception as e:
            return [{"query": query, "rank": 0, "title": "", "content": "",
                     "source": self.source, "status": f"error:{type(e).__name__}"}]


class LookupJoinConnector(Connector):
    """Two-step lookup-join shape (QWeather, qweather.py:60-117): step 1
    resolves the query to an entity id (the city->location_id geo
    lookup, qweather.py:67-74); step 2 fetches that id's data. A
    non-"200" code at either step maps through ``error_code`` to an
    in-band ``"**Error**..."`` row (qweather.py:73,90,102,113) — never
    an exception."""

    source = "lookup"
    error_code = {
        "204": "no data for this region at this time",
        "400": "request error",
        "401": "authentication failed",
        "402": "quota exceeded",
        "403": "no access",
        "404": "the queried data or region does not exist",
        "429": "rate limited",
        "500": "backend timeout",
    }

    def __init__(self, transport=None, kind: str = "weather",
                 api_key: str = "demo-key", user_type: str = "free",
                 lang: str = "en", time_period: str = "3d") -> None:
        super().__init__(transport or self.offline_payload)
        self.kind = kind  # weather | indices | airquality
        self.api_key = api_key
        self.user_type = user_type  # free | paid (qweather.py:72)
        self.lang = lang
        self.time_period = time_period

    def build_lookup_request(self, query: str) -> dict:
        """Step 1, the geo lookup (qweather.py:66-67:
        geoapi.qweather.com/v2/city/lookup?location=..&key=..)."""
        return {"url": "https://geoapi.qweather.com/v2/city/lookup",
                "method": "GET",
                "params": {"location": query, "key": self.api_key},
                "headers": {},
                "seed": f"lookup:{query}"}

    def build_data_request(self, location_id: str, query: str) -> dict:
        """Step 2, the per-entity fetch (qweather.py:72-111): the base
        url switches on user_type, the path on kind (weather/<period>,
        indices/1d with type=0, air/now)."""
        base = ("https://api.qweather.com/v7/" if self.user_type == "paid"
                else "https://devapi.qweather.com/v7/")
        path = {"weather": f"weather/{self.time_period}",
                "indices": "indices/1d",
                "airquality": "air/now"}.get(self.kind, self.kind)
        params = {"location": location_id, "key": self.api_key,
                  "lang": self.lang}
        if self.kind == "indices":
            params["type"] = "0"  # qweather.py:95
        return {"url": base + path, "method": "GET", "params": params,
                "headers": {},
                "seed": f"{self.kind}:{location_id}:{query}"}

    @staticmethod
    def offline_payload(request) -> dict:
        """Deterministic double of both endpoints. ``err:NNN <q>``
        queries simulate the backend's error codes."""
        seed = _seed_of(request)
        kind, _, q = seed.partition(":")
        if q.startswith("err:"):
            return {"code": q.split()[0][4:]}
        if kind == "lookup":
            return {"code": "200",
                    "location": [{"id": f"loc-{stable_u64(q) % 10**6}"}]}
        rng = random.Random(stable_u64(seed))
        return {"code": "200",
                "daily": [{"date": f"2026-08-{d:02d}",
                           "text": " ".join(rng.choice(_WORDS)
                                            for _ in range(6))}
                          for d in range(1, 4)]}

    def fetch(self, query: str, top_n: int = 5) -> list[dict]:
        def _err(code: str) -> list[dict]:
            msg = "**Error**" + self.error_code.get(code, f"code {code}")
            return [{"query": query, "rank": 0, "title": "",
                     "content": msg, "source": self.source,
                     "status": f"error:{code}"}]

        try:
            look = self.transport(self.build_lookup_request(query))
            if look.get("code") != "200":
                return _err(look.get("code", "500"))
            loc = look["location"][0]["id"]
            data = self.transport(self.build_data_request(loc, query))
            if data.get("code") != "200":
                return _err(data.get("code", "500"))
            rows = [{"query": query, "rank": i + 1, "title": d["date"],
                     "content": d["text"], "source": self.source,
                     "status": "ok"}
                    for i, d in enumerate(data["daily"][:top_n])]
            return rows
        except Exception as e:
            return [{"query": query, "rank": 0, "title": "", "content": "",
                     "source": self.source,
                     "status": f"error:{type(e).__name__}"}]


class MultiTableConnector(Connector):
    """Multi-table fan-out shape (YahooFinance, yahoofinance.py:50-84):
    ONE query emits one row per enabled report section — the flat_map
    pattern where each boolean param appends another rendered table."""

    source = "multitable"
    SECTIONS = ("info", "history", "financials", "balance_sheet",
                "cash_flow_statement", "news")

    def __init__(self, transport=None, sections: tuple | None = None) -> None:
        super().__init__(transport)
        self.sections = tuple(sections or ("info", "news"))
        bad = set(self.sections) - set(self.SECTIONS)
        if bad:
            raise ValueError(f"unknown sections {sorted(bad)}")

    def build_request(self, query: str, top_n: int) -> dict:
        """Per-ticker quote-summary GET; the enabled report sections
        ride as modules (yahoofinance.py:50-84 appends one table per
        boolean param)."""
        return {"url": "https://query1.finance.yahoo.com/v10/finance/"
                       "quoteSummary",
                "method": "GET",
                "params": {"symbol": query,
                           "modules": ",".join(self.sections)},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    def _rows(self, query, payload, top_n):
        rows = []
        for sec in self.sections:
            body = "\n".join(
                f"| {it['title']} | {it['value']} |"
                for it in payload["items"][:3]
            )
            rows.append({"title": sec, "content": f"{sec}:\n{body}\n"})
        return rows


class XmlConnector(Connector):
    """Nested-XML projection shape (PubMed, pubmed.py:39-69): the
    payload is one XML document; rows project
    MedlineCitation/Article/ArticleTitle + PMID + Abstract (with the
    "No abstract available" default) after stripping inline <b>/<i>
    markup (pubmed.py:51-53)."""

    source = "xml"

    def __init__(self, transport=None, email: str = "a.n.other@example.com") -> None:
        super().__init__(transport or self.offline_payload)
        self.email = email  # pubmed.py:33 (Entrez requires a contact)

    def build_request(self, query: str, top_n: int) -> dict:
        """The esearch half of the Entrez two-step (pubmed.py:49-50:
        esearch(db='pubmed', retmax=top_n, term=query))."""
        return {"url": "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/"
                       "esearch.fcgi",
                "method": "GET",
                "params": {"db": "pubmed", "retmax": top_n, "term": query,
                           "email": self.email},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    def build_fetch_request(self, ids: list[str], query: str) -> dict:
        """The efetch half (pubmed.py:51-52: efetch(db='pubmed',
        id=','.join(ids), retmode='xml')). Seeded by the query so the
        offline double's XML is pinned by the dialogue, not the ids."""
        return {"url": "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/"
                       "efetch.fcgi",
                "method": "GET",
                "params": {"db": "pubmed", "id": ",".join(ids),
                           "retmode": "xml"},
                "headers": {},
                "seed": f"{self.source}:{query}"}

    @staticmethod
    def offline_payload(request) -> dict:
        seed = _seed_of(request)
        is_search = (isinstance(request, dict)
                     and "esearch" in request.get("url", ""))
        if is_search:
            return {"idlist": [str(stable_u64(seed) % 10**7 + i)
                               for i in range(5)]}
        rng = random.Random(stable_u64(seed))
        arts = []
        for i in range(5):
            title = " ".join(rng.choice(_WORDS) for _ in range(5))
            abstract = (
                f"<AbstractText>about <b>{rng.choice(_WORDS)}</b> "
                f"{' '.join(rng.choice(_WORDS) for _ in range(8))}"
                f"</AbstractText>"
            )
            has_abs = rng.random() > 0.3
            arts.append(
                "<PubmedArticle><MedlineCitation>"
                f"<PMID>{stable_u64(seed) % 10**7 + i}</PMID>"
                "<Article>"
                f"<ArticleTitle>{title}</ArticleTitle>"
                + (f"<Abstract>{abstract}</Abstract>" if has_abs else "")
                + "</Article></MedlineCitation></PubmedArticle>"
            )
        return {"xml": "<PubmedArticleSet>" + "".join(arts)
                       + "</PubmedArticleSet>"}

    def fetch(self, query: str, top_n: int = 5) -> list[dict]:
        """Two transport calls, reference parity (pubmed.py:49-52):
        esearch resolves the term to PMIDs, efetch pulls their XML."""
        try:
            found = self.transport(self.build_request(query, top_n))
            ids = [str(i) for i in found.get("idlist", [])][:top_n]
            payload = self.transport(self.build_fetch_request(ids, query))
            rows = self._rows(query, payload, top_n)[:top_n]
            for rank, r in enumerate(rows):
                r.setdefault("query", query)
                r["rank"] = rank + 1
                r.setdefault("source", self.source)
                r.setdefault("status", "ok")
            return rows
        except Exception as e:  # in-band error row (baidu.py:70-71)
            return [{"query": query, "rank": 0, "title": "", "content": "",
                     "source": self.source, "status": f"error:{type(e).__name__}"}]

    def _rows(self, query, payload, top_n):
        import re
        import xml.etree.ElementTree as ET

        clean = re.sub(r"<(/?)b>|<(/?)i>", "", payload["xml"])
        root = ET.fromstring(clean)
        rows = []
        for child in root.findall("PubmedArticle"):
            cit = child.find("MedlineCitation")
            art = cit.find("Article")
            abstract = art.find("Abstract")
            abs_text = (abstract.find("AbstractText").text
                        if abstract is not None else "No abstract available")
            pmid = cit.find("PMID").text
            rows.append({
                "title": art.find("ArticleTitle").text,
                "content": (
                    f"Title:{art.find('ArticleTitle').text}\n"
                    f"Url:<a href=\"https://pubmed.ncbi.nlm.nih.gov/{pmid}\">"
                    f"</a>\nAbstract:{abs_text}"
                ),
            })
        return rows


class FlattenConnector(Connector):
    """Semi-structured flattening shape (WenCai, wencai.py:40-79): the
    payload is a polymorphic dict whose values may be a list of
    records, a plain string, a nested dict (skipped when it carries a
    "meta" key), or a table (skipped when it has an image_url column) —
    each flattens to one content row, unknown types stringify."""

    source = "flatten"

    def __init__(self, transport=None, query_type: str = "stock") -> None:
        super().__init__(transport or self.offline_payload)
        self.query_type = query_type  # wencai.py:30-37's valid set

    def build_request(self, query: str, top_n: int) -> dict:
        """pywencai.get(query=, query_type=, perpage=) shape
        (wencai.py:51)."""
        return {"url": "https://www.iwencai.com/customized/chart/get-"
                       "robot-data",
                "method": "POST",
                "params": {"query": query, "query_type": self.query_type,
                           "perpage": top_n},
                "headers": {"Content-Type": "application/json"},
                "seed": f"{self.source}:{query}"}

    @staticmethod
    def offline_payload(request) -> dict:
        rng = random.Random(stable_u64(_seed_of(request)))
        return {
            "summary": " ".join(rng.choice(_WORDS) for _ in range(8)),
            "quotes": [{"name": rng.choice(_WORDS),
                        "price": round(rng.uniform(1, 99), 2)}
                       for _ in range(3)],
            "detail": {"pe": round(rng.uniform(5, 40), 1),
                       "pb": round(rng.uniform(0.5, 9), 1)},
            "_internal": {"meta": {"v": 1}, "blob": "x"},
            "chart": {"columns": ["image_url"], "rows": [["http://img"]]},
            "count": 42,
        }

    def _rows(self, query, payload, top_n):
        rows = []
        for key, val in payload.items():
            if isinstance(val, list):
                body = "\n".join(str(r) for r in val)
                rows.append({"title": key, "content": f"{key}\n{body}"})
            elif isinstance(val, str):
                rows.append({"title": key, "content": f"{key}\n{val}"})
            elif isinstance(val, dict):
                if "meta" in val:
                    continue  # wencai.py:66-67
                if "columns" in val and "image_url" in val["columns"]:
                    continue  # wencai.py:74-75
                body = "\n".join(f"{k}: {v}" for k, v in val.items())
                rows.append({"title": key, "content": body})
            else:
                rows.append({"title": key, "content": f"{key}\n{val}"})
        return rows


CONNECTOR_REGISTRY: dict[str, type[Connector]] = {
    "search": SearchConnector,
    "news": NewsConnector,
    "finance": FinanceConnector,
    "translate": TranslateConnector,
    "lookup": LookupJoinConnector,
    "multitable": MultiTableConnector,
    "xml": XmlConnector,
    "flatten": FlattenConnector,
}

_OUT_SCHEMA = pa.schema(
    [
        pa.field("query", pa.string()),
        pa.field("rank", pa.int64()),
        pa.field("title", pa.string()),
        pa.field("content", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("source", pa.string()),
        pa.field("status", pa.string()),
    ]
)


def connector_source(connector_name: str, queries: list[str], top_n: int = 5,
                     concurrency: tuple[int, int] | int = (1, 4), **kwargs):
    """Fan queries out as a Dataset and run the connector in an actor
    pool (client built once per actor): query rows -> result rows."""
    import ray.data as rd

    cls = CONNECTOR_REGISTRY[connector_name]

    class _Fetch:
        def __init__(self) -> None:
            self.conn = cls(**kwargs)  # per-actor client

        def __call__(self, batch: pa.Table) -> pa.Table:
            out: list[dict] = []
            for q in batch.column("query").to_pylist():
                for r in self.conn.fetch(q, top_n):
                    r.setdefault("value", None)
                    out.append(r)
            return pa.Table.from_pylist(out, schema=_OUT_SCHEMA)

    ds = rd.from_items([{"query": q} for q in queries])
    return ds.map_batches(
        _Fetch, batch_format="pyarrow", batch_size=8, concurrency=concurrency
    )
