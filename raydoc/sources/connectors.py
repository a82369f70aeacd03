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


CONNECTOR_REGISTRY: dict[str, type[Connector]] = {
    "search": SearchConnector,
    "news": NewsConnector,
    "finance": FinanceConnector,
    "translate": TranslateConnector,
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
