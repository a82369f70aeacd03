"""Mass-duplication stress validation for the curation composite.

The corpus is deliberately PATHOLOGICAL: every document shares ~95% of
its token stream (one boilerplate template, tiny per-doc tail), so
MinHash band buckets grow to O(corpus) — the Common-Crawl boilerplate
regime. 10% of docs are exact duplicates of their predecessor; the
near-dup threshold is set above 1.0 so the LSH stage must ENUMERATE
its candidates but remove nothing, making the expected output exact:
N - N/10 rows.

This is the workload that exposed (r04) the uncapped clique explosion
— a 213k-doc single-band bucket demanded 22.6e9 pair indices (169 GiB)
— and the unchunked signature-gather estimate (11.3 GiB peak heap in
one task at 100k docs). With ``near_dup_bucket_cap`` star-pairing and
the chunked vectorized estimate, 1M docs validate in ~54 s / ~18k
docs/s on 32 CPUs (see BASELINE.md round 4).

Usage: python tools/validate_curation_stress.py [n_docs]
"""
import sys
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 10  # ids % 10 == 9 duplicate the preceding id's text

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.pipelines.training_data import curate_documents


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    src = np.where(ids % DUP_EVERY == DUP_EVERY - 1, ids - 1, ids)
    texts = [
        f"the quick document {int(s)} body with enough tokens to pass "
        f"every quality gate and some more filler words here now ok "
        f"{int(s) * 7} {int(s) % 13} end of document text block"
        for s in src
    ]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


docs = rd.range(N).map_batches(_gen, batch_format="pyarrow")
t0 = time.perf_counter()
kept, stats = curate_documents(docs, near_dup_threshold=1.01)
n_kept = kept.count()
wall = time.perf_counter() - t0
expect = N - N // DUP_EVERY
print(f"n_input={stats['n_input']} kept={n_kept} expect={expect} "
      f"exact={'OK' if n_kept == expect else 'FAIL'} "
      f"wall={wall:.1f}s docs_per_sec={N / wall:,.0f}")
assert n_kept == expect
ray.shutdown()
