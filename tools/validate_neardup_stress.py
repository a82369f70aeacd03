"""1M-doc near-dup curation validation (the r03/r04 recorded
workload): ids % 10 == 9 clone the preceding id's text EXACTLY; ids %
10 == 8 clone it with ONE substituted word (a near-dup the MinHash+LSH
stage must catch at threshold 0.6). Reports exact-dedup correctness,
LSH near-dup recall, and end-to-end docs/s.

Usage: python tools/validate_neardup_stress.py [n_docs]
"""
import sys
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.pipelines.training_data import curate_documents


def _base(s: int) -> str:
    # id-derived tokens interleaved throughout so DIFFERENT base docs
    # share few shingles (cross-family jaccard << threshold), while a
    # one-word substitution stays well above it
    return (f"the quick document d{s} body t{s % 97} with enough "
            f"tokens u{(s * 31) % 89} to pass every quality gate "
            f"v{(s * 7) % 83} and some more filler words w{s % 79} "
            f"here now ok x{(s * 13) % 73} more body y{s % 71} "
            f"end z{(s * 3) % 67} of document text block q{s % 61}")


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    texts = []
    for i in ids:
        i = int(i)
        if i % 10 == 9:      # exact clone of i-2's text (i-2 % 10 == 7)
            texts.append(_base(i - 2))
        elif i % 10 == 8:    # near-dup: one word substituted
            texts.append(_base(i - 1).replace("filler", "replaced"))
        else:
            texts.append(_base(i))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


docs = rd.range(N).map_batches(_gen, batch_format="pyarrow")
t0 = time.perf_counter()
kept, stats = curate_documents(docs, near_dup_threshold=0.6)
n_kept = kept.count()
wall = time.perf_counter() - t0
n_exact_dups = N // 10           # the %10==9 clones
n_near_dups = N // 10            # the %10==8 near-dups
after_exact = N - n_exact_dups
perfect = after_exact - n_near_dups
removed_near = after_exact - n_kept
recall = removed_near / n_near_dups
print(f"n_input={stats['n_input']} after_exact_expect={after_exact} "
      f"kept={n_kept} perfect={perfect} "
      f"near_dup_recall={recall:.3%} wall={wall:.1f}s "
      f"docs_per_sec={N / wall:,.0f}")
assert stats["n_input"] == N
assert recall >= 0.98, f"LSH recall too low: {recall:.3%}"
ray.shutdown()
