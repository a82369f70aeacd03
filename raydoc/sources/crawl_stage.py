"""Per-url fetch + extract stage: the Crawler/Invoke analog.

The reference fetches a url and optionally strips boilerplate
(crawl4ai at crawler.py:23-67; ``HtmlParser()(None, response.content)``
at invoke.py:93). The engine form: an IO-bound actor pool with HIGH
concurrency and LOW cpu per actor (fetches wait on the network, not the
CPU), a pluggable transport (offline deterministic double here — it
synthesizes the corpus page for the url so tests are hermetic), and
three extract_type modes mirroring crawler.py:61-67:
html (raw), content (main-content extraction), markdown-ish text.
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa

__all__ = ["FetchExtractStage", "offline_fetch", "fetch_urls"]

_URL_ID = re.compile(r"/p/(\d{8})/")


def offline_fetch(url: str) -> bytes:
    """Deterministic fetch double: regenerates the corpus page whose url
    embeds its row index; unknown urls 404 (raise)."""
    m = _URL_ID.search(url)
    if not m:
        raise FileNotFoundError(f"404: {url}")
    from raydoc.corpus import gen_row

    return gen_row(int(m.group(1)), with_text=False)["html"]


class FetchExtractStage:
    """urls -> (url, content, status). extract_type: html | content | text."""

    def __init__(self, transport: Callable[[str], bytes] | None = None,
                 extract_type: str = "content") -> None:
        self.fetch = transport or offline_fetch  # session built once per actor
        self.extract_type = extract_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raydoc.extract.html_extract import extract_page, html_to_text

        urls, contents, status = [], [], []
        for url in batch.column("url").to_pylist():
            try:
                payload = self.fetch(url)
                if self.extract_type == "html":
                    content = payload.decode("utf-8", errors="replace")
                elif self.extract_type == "text":
                    content = html_to_text(payload)
                else:
                    content = extract_page(payload)["text"]
                urls.append(url)
                contents.append(content)
                status.append("ok")
            except Exception as e:
                urls.append(url)
                contents.append("")
                status.append(f"error:{type(e).__name__}")
        return pa.Table.from_pydict(
            {"url": pa.array(urls, pa.string()),
             "content": pa.array(contents, pa.string()),
             "status": pa.array(status, pa.string())}
        )


def fetch_urls(urls: list[str], extract_type: str = "content",
               concurrency: tuple[int, int] | int = (1, 8),
               transport: Callable[[str], bytes] | None = None):
    """Dataset of fetch+extract results for a url list. num_cpus=0.5 per
    actor: IO-bound work should oversubscribe cores."""
    import ray.data as rd

    ds = rd.from_items([{"url": u} for u in urls])
    return ds.map_batches(
        FetchExtractStage,
        fn_constructor_kwargs={"extract_type": extract_type,
                               "transport": transport},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=0.5,
    )
