"""1M-doc BM25 scale validation: planted-gold retrieval over a corpus
with a known best document per query, measuring the slim-stats pass
throughput and checking (a) every planted doc is retrieved at rank 1,
(b) a re-run at different partitioning reproduces identical integer
scores (the order-independence the fixed-point contract promises).

Usage: python tools/validate_bm25_stress.py [n_docs]
Prints one JSON line.
"""
import json
import sys
import time

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

from raydoc.ops.retrieval import bm25_topk

QUERIES = ["alpha beacon cradle", "delta ember flint", "gamma harbor idol"]
# planted: doc 10q+? ... doc q holds the exact query phrase 3x (top
# tf, short doc); everything else is filler sharing at most one term
PLANT = {0: 100, 1: 101, 2: 102}


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    texts = []
    for i in ids:
        i = int(i)
        if i in (100, 101, 102):
            q = QUERIES[i - 100]
            texts.append(f"{q} {q} {q}")
        else:
            texts.append(
                f"filler tokens f{i % 997} g{(i * 31) % 89} with "
                f"{'alpha' if i % 7 == 0 else 'omega'} body words "
                f"h{i % 73} long tail end e{i % 61}")
    return pa.table({"doc_id": b.column("id"),
                     "text": pa.array(texts, pa.string())})


ds = rd.range(N).map_batches(_gen, batch_format="pyarrow").materialize()

t0 = time.time()
out = bm25_topk(ds, QUERIES, top_n=10).take_all()
wall = time.time() - t0

top1 = {r["query_id"]: r["doc_id"] for r in out if r["rank"] == 1}
planted_ok = all(top1.get(q) == d for q, d in PLANT.items())

out2 = bm25_topk(ds.repartition(97), QUERIES, top_n=10).take_all()
same = sorted((r["query_id"], r["rank"], r["doc_id"], r["score_fp"])
              for r in out) == sorted(
    (r["query_id"], r["rank"], r["doc_id"], r["score_fp"])
    for r in out2)

print(json.dumps({
    "n_docs": N, "wall_s": round(wall, 2),
    "docs_per_s": int(N / wall),
    "planted_top1_ok": bool(planted_ok),
    "repartition_identical": bool(same),
}))
assert planted_ok and same
ray.shutdown()
