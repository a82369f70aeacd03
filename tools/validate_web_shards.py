"""Scale validation of the end-to-end composition
(`training_data.web_to_training_shards`): raw fetch records -> packed,
split training shards in one call.

Corpus: the flagship synthetic pages at the given sf (cached by
`corpus.ensure_pages_parquet`), each page fetched TWICE — a dirty
original (upper-cased host, tracking params, fragment) and a later
clean recrawl that must win — so url_dedup halves the stream before
any parse work. Asserts the count flow end to end (recrawls collapsed,
every curated doc in exactly one split) and reports fetch-rows/s.

Usage: python tools/validate_web_shards.py [sf] [out_dir]
"""
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

sys.path.insert(0, ".")

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/web_shards_out"

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.corpus import ensure_pages_parquet
from raydoc.pipelines.training_data import web_to_training_shards

pages_path = ensure_pages_parquet(SF)


def _to_fetches(b: pa.Table) -> pa.Table:
    urls = b.column("url")
    host_path = pc.utf8_replace_slice(urls, 0, len("https://"), "")
    # dirty = upper-cased host + tracking junk; recrawl = the clean url
    parts = pc.split_pattern(host_path, "/", max_splits=1)
    hosts = pc.list_element(parts, 0)
    paths = pc.list_element(parts, 1)
    dirty = pc.binary_join_element_wise(
        pa.array(["https://"] * len(urls)), pc.utf8_upper(hosts),
        pa.array(["/"] * len(urls)), paths,
        pa.array(["?utm_source=x#frag"] * len(urls)), pa.scalar(""))
    n = len(urls)
    import numpy as np

    return pa.table({
        "url": pa.concat_arrays([dirty.combine_chunks()
                                 if isinstance(dirty, pa.ChunkedArray)
                                 else dirty,
                                 urls.combine_chunks()
                                 if isinstance(urls, pa.ChunkedArray)
                                 else urls]),
        "fetch_ts": pa.array(
            np.concatenate([np.arange(n) * 2, np.arange(n) * 2 + 1])),
        "html": pa.concat_arrays(
            [b.column("html").combine_chunks()] * 2),
    })


fetches = rd.read_parquet(pages_path, columns=["url", "html"]) \
    .map_batches(_to_fetches, batch_format="pyarrow")
n_fetch = fetches.count()

shutil.rmtree(OUT, ignore_errors=True)
t0 = time.perf_counter()
stats = web_to_training_shards(fetches, OUT, near_dup_threshold=1.01,
                               min_tokens=1, max_punct_ratio=1.0)
wall = time.perf_counter() - t0

ok = (stats["n_train"] + stats["n_val"] + stats["n_test"]
      == stats["n_kept"]) and stats["n_extract_ok"] * 2 <= n_fetch
print(f"n_fetch={n_fetch} extract_ok={stats['n_extract_ok']} "
      f"kept={stats['n_kept']} "
      f"splits={stats['n_train']}/{stats['n_val']}/{stats['n_test']} "
      f"packs={stats['n_packs_train']} flow={'OK' if ok else 'FAIL'} "
      f"wall={wall:.1f}s fetch_rows_per_sec={n_fetch / wall:,.0f}")
assert ok
ray.shutdown()
