"""1M-doc LM-perplexity scale validation: fit the corpus bigram LM and
score every doc, then check the integer contract's invariants at
scale — (a) planted exact clones tie to the last unit, (b) a re-run at
different parallelism reproduces the identical global nll sum and doc
count (order-independence), (c) throughput.

Usage: python tools/validate_lm_stress.py [n_docs]
Prints one JSON line.
"""
import json
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

from raydoc.ops.lm import lm_perplexity


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    texts = []
    for i in ids:
        i = int(i)
        if i % 10 == 9:  # exact clone of i-1: must tie bit-exactly
            i = i - 1
        texts.append(
            f"the quick document d{i % 997} body t{i % 97} with common "
            f"phrase tokens u{(i * 31) % 89} and rare w{i % 7919} "
            f"suffix v{(i * 13) % 73} end")
    return pa.table({"doc_id": b.column("id"),
                     "text": pa.array(texts, pa.string())})


ds = rd.range(N).map_batches(_gen, batch_format="pyarrow").materialize()

t0 = time.time()
scored = lm_perplexity(ds).select_columns(
    ["doc_id", "n_bigrams", "nll_fp"]).materialize()
wall = time.time() - t0

tbl = pa.concat_tables(ray.get(scored.to_arrow_refs()))
ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
nll = tbl.column("nll_fp").to_numpy(zero_copy_only=False)
order = np.argsort(ids)
ids, nll = ids[order], nll[order]

# planted clones: doc 10k+9 == doc 10k+8
nine = ids % 10 == 9
clones_ok = bool((nll[nine] == nll[np.flatnonzero(nine) - 1]).all())

# order-independence: second run, different partitioning
nll2 = lm_perplexity(ds.repartition(97)).select_columns(["nll_fp"])
s2 = sum(r["nll_fp"] for r in nll2.take_all())
total = int(nll.sum())

print(json.dumps({
    "n_docs": N, "wall_s": round(wall, 2),
    "docs_per_s": int(N / wall),
    "total_nll_fp": total,
    "clones_tie_exact": clones_ok,
    "repartition_sum_identical": bool(total == s2),
}))
assert clones_ok and total == s2
ray.shutdown()
