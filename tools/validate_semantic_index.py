"""1M-vector validation of the persisted semantic index
(ops/incremental.py semantic component): seed the index over 1M
random 64-dim unit vectors at k=10,000 (the SemDeDup cell regime),
then probe a 1,000-row new batch holding 500 exact clones of corpus
rows and 500 novels — the probe must flag exactly the clones, read
only the member buckets the batch touches, and a second probe after
``update_index`` must also catch clones of the first batch's novels.
Reports seed and probe walls. Run from /root/repo:
`python tools/validate_semantic_index.py [index_dir]`."""
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, ".")
from raydoc.ops.incremental import (
    incremental_semantic_dedup,
    write_semantic_index,
)

N = 1_000_000
DIM = 64
K = 10_000
CLONES = 500   # batch rows 0..499 clone corpus rows 0..499
NOVELS = 500

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydoc_sem_index_1m"
shutil.rmtree(IDX, ignore_errors=True)


def _unit(rng, n):
    v = rng.standard_normal((n, DIM))
    return v / np.linalg.norm(v, axis=1)[:, None]


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(ids[0]) + 1)
    v = _unit(rng, len(ids))
    flat = pa.array(v.ravel(), pa.float64())
    col = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (len(v) + 1) * DIM, DIM, dtype=np.int64),
                 pa.int64()).cast(pa.int32()), flat)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": col})


corpus = rd.range(N).map_batches(_gen, batch_format="pyarrow")

t0 = time.perf_counter()
meta = write_semantic_index(corpus, IDX, init_ids=range(K))
wall_seed = time.perf_counter() - t0
print(f"seed: k={meta['k']} over {N} vectors in {wall_seed:.1f} s "
      f"= {N / wall_seed:,.0f} vecs/s")

# the clone vectors = regenerate the first corpus blocks' rows
first = rd.range(N).map_batches(_gen, batch_format="pyarrow") \
    .filter(lambda r: r["vec_id"] < CLONES).take_all()
first.sort(key=lambda r: r["vec_id"])
clone_vecs = np.array([r["embedding"] for r in first])
rngn = np.random.default_rng(777)
novel_vecs = _unit(rngn, NOVELS)
allv = np.vstack([clone_vecs, novel_vecs])
flat = pa.array(allv.ravel(), pa.float64())
col = pa.ListArray.from_arrays(
    pa.array(np.arange(0, (len(allv) + 1) * DIM, DIM, dtype=np.int64),
             pa.int64()).cast(pa.int32()), flat)
batch = rd.from_arrow(pa.table({
    "vec_id": pa.array(
        [2_000_000 + i for i in range(CLONES)]
        + [3_000_000 + i for i in range(NOVELS)], pa.int64()),
    "embedding": col}))

t0 = time.perf_counter()
kept, pairs = incremental_semantic_dedup(batch, IDX, threshold=0.999,
                                         update_index=True)
kept_ids = sorted(r["vec_id"] for r in
                  kept.select_columns(["vec_id"]).take_all())
wall_probe = time.perf_counter() - t0
pr = sorted((r["id_new"], r["id_corpus"]) for r in pairs.take_all())
print(f"probe: {len(pr)} victims / {len(kept_ids)} kept "
      f"in {wall_probe:.1f} s")
assert pr == [(2_000_000 + i, i) for i in range(CLONES)], pr[:5]
assert kept_ids == [3_000_000 + i for i in range(NOVELS)]

# rolling: clone of an appended novel is now caught
b2 = rd.from_arrow(pa.table({
    "vec_id": pa.array([4_000_000], pa.int64()),
    "embedding": pa.array([novel_vecs[7].tolist()],
                          pa.list_(pa.float64()))}))
t0 = time.perf_counter()
kept2, pairs2 = incremental_semantic_dedup(b2, IDX, threshold=0.999)
n_kept2 = kept2.count()
wall2 = time.perf_counter() - t0
p2 = [(r["id_new"], r["id_corpus"]) for r in pairs2.take_all()]
print(f"rolling probe: {p2} kept={n_kept2} in {wall2:.1f} s")
assert p2 == [(4_000_000, 3_000_007)] and n_kept2 == 0
print("OK")
ray.shutdown()
