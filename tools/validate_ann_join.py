"""1M-corpus validation of ann_join (dataset-to-dataset IVF top-k):
corpus = 1M random unit vectors (64 dims); query DATASET = the rows
with vec_id < Q, re-labelled as query_id. Each query's true nearest
neighbour is itself (cosine 1.0), and an identical vector probes its
own argmax cell, so IVF recall of the planted top-1 must be ~100%.
Reports corpus build wall, join wall, and query throughput.

Usage: python tools/validate_ann_join.py [N] [Q]
"""
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, ".")
from raydoc.ops.similarity import ann_join

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
DIM = 64


def _corpus_batch(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(ids[0]) + 17)
    v = rng.standard_normal((len(ids), DIM))
    v /= np.linalg.norm(v, axis=1)[:, None]
    flat = pa.array(v.ravel(), pa.float64())
    offs = pa.array(
        np.arange(0, (len(v) + 1) * DIM, DIM, dtype=np.int64),
        pa.int64()).cast(pa.int32())
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.ListArray.from_arrays(offs, flat)})


t0 = time.time()
corpus = (rd.range(N, override_num_blocks=64)
          .map_batches(_corpus_batch, batch_format="pyarrow",
                       batch_size=16_384)
          .materialize())
queries = (corpus
           .filter(expr=f"vec_id < {Q}")
           .map_batches(lambda b: b.rename_columns(
               ["query_id", "embedding"]), batch_format="pyarrow")
           .materialize())
t_build = time.time() - t0

# Bounded centroid training sample, collected the way the docstring
# prescribes at scale.
sample = corpus.random_sample(min(1.0, 20_000 / N), seed=7)
train = np.vstack([
    np.asarray(r["embedding"], dtype=np.float64)
    for r in sample.take_all()])

t1 = time.time()
n_cells = max(64, N // 16_384)
res = ann_join(queries, corpus, k=5, n_cells=n_cells, n_probe=4,
               train_sample=train, seed=31).materialize()
t_join = time.time() - t1

top1 = res.filter(expr="rank == 1").take_all()
hits = sum(1 for r in top1 if r["vec_id"] == r["query_id"])
print(f"N={N} Q={Q} cells={n_cells} build={t_build:.1f}s "
      f"join={t_join:.1f}s out_rows={res.count()} "
      f"top1_planted_recall={hits}/{Q} "
      f"queries_per_s={Q / t_join:,.0f}")
assert hits >= int(0.99 * Q), f"recall too low: {hits}/{Q}"
ray.shutdown()
