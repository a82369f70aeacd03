"""Query-driven source connectors.

Re-expression of the reference's connector family
(/root/reference/agent/component/{baidu,duckduckgo,google,bing,
wikipedia,arxiv,pubmed,github,akshare,tushare,...}.py): every connector
is ``fetch(query, top_n) -> rows`` where rows carry
(query, rank, title, content, source, status). Error handling follows
the reference's in-band convention (a failed fetch emits one
status="error" row, never raises — baidu.py:70-71), so one bad query
never kills a pipeline.

``transport`` seam: connectors call ``self.transport(url_or_q) ->
payload``. The default ``offline_transport`` synthesizes deterministic
results (seeded by the request string); ``network_transport`` raises
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
    "network_transport",
    "CONNECTOR_REGISTRY",
]

_WORDS = ("data ray stream batch block shuffle partition actor arrow parquet "
          "table column row page content extract chunk title text search "
          "result news stock market price index weather city paper author").split()


def offline_transport(request: str) -> dict:
    """Deterministic synthetic backend: payload derived from the request
    string only (same request -> same payload on any node/process)."""
    rng = random.Random(stable_u64(request))
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


def network_transport(request: str) -> dict:
    raise NotImplementedError(
        "no network in this environment; plug an HTTP transport "
        "(requests/httpx) here — same seam the reference fills with "
        "requests.get (invoke.py:75-91)"
    )


class Connector:
    """Base: subclasses set ``source`` and implement ``_rows``."""

    source = "base"

    def __init__(self, transport: Callable[[str], dict] | None = None) -> None:
        # once-per-actor client construction slot
        self.transport = transport or offline_transport

    def _rows(self, query: str, payload: dict, top_n: int) -> list[dict]:
        raise NotImplementedError

    def fetch(self, query: str, top_n: int = 5) -> list[dict]:
        try:
            payload = self.transport(f"{self.source}:{query}")
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

    def __init__(self, transport=None, channel: str = "text") -> None:
        super().__init__(transport)
        self.channel = channel  # text | news (duckduckgo.py:38-66)
        self.source = f"search:{channel}"

    def _rows(self, query, payload, top_n):
        return [{"title": it["title"], "content": it["snippet"]}
                for it in payload["items"]]


class NewsConnector(Connector):
    """News + keyword containment filter (tushare.py:65's client-side
    ``str.contains`` predicate)."""

    source = "news"

    def __init__(self, transport=None, keyword: str | None = None) -> None:
        super().__init__(transport)
        self.keyword = keyword

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

    def _rows(self, query, payload, top_n):
        return [{"title": it["title"], "content": it["snippet"],
                 "value": it["value"]} for it in payload["items"]]


class TranslateConnector(Connector):
    """Per-row scalar transform via external model (deepl.py:45-61);
    offline double = deterministic token-reverse."""

    source = "translate"

    def __init__(self, transport=None, target_lang: str = "en") -> None:
        super().__init__(transport)
        self.target = target_lang

    def fetch(self, query: str, top_n: int = 1) -> list[dict]:
        try:
            translated = " ".join(reversed(query.split()))
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

    def __init__(self, transport=None, kind: str = "weather") -> None:
        super().__init__(transport or self.offline_payload)
        self.kind = kind  # weather | indices | airquality

    @staticmethod
    def offline_payload(request: str) -> dict:
        """Deterministic double of both endpoints. ``err:NNN <q>``
        queries simulate the backend's error codes."""
        kind, _, q = request.partition(":")
        if q.startswith("err:"):
            return {"code": q.split()[0][4:]}
        if kind == "lookup":
            return {"code": "200",
                    "location": [{"id": f"loc-{stable_u64(q) % 10**6}"}]}
        rng = random.Random(stable_u64(request))
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
            look = self.transport(f"lookup:{query}")
            if look.get("code") != "200":
                return _err(look.get("code", "500"))
            loc = look["location"][0]["id"]
            data = self.transport(f"{self.kind}:{loc}:{query}")
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

    def __init__(self, transport=None) -> None:
        super().__init__(transport or self.offline_payload)

    @staticmethod
    def offline_payload(request: str) -> dict:
        rng = random.Random(stable_u64(request))
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
                f"<PMID>{stable_u64(request) % 10**7 + i}</PMID>"
                "<Article>"
                f"<ArticleTitle>{title}</ArticleTitle>"
                + (f"<Abstract>{abstract}</Abstract>" if has_abs else "")
                + "</Article></MedlineCitation></PubmedArticle>"
            )
        return {"xml": "<PubmedArticleSet>" + "".join(arts)
                       + "</PubmedArticleSet>"}

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

    def __init__(self, transport=None) -> None:
        super().__init__(transport or self.offline_payload)

    @staticmethod
    def offline_payload(request: str) -> dict:
        rng = random.Random(stable_u64(request))
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
