"""1M-vector validation of embedding_near_dup_pairs (r04 rewrite):
random unit vectors (no natural near-dups at 64 dims) + 10k planted
exact clones; the hyperplane bucketing + in-bucket verify must recover
exactly the 10k (original, clone) pairs. Reports vectors/s."""
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
from raydoc.ops.dedup import embedding_near_dup_pairs

N = 1_000_000
DIM = 64
CLONES = 10_000  # vec_id i < CLONES gets a clone at id N + i


def _gen(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    out_ids = [ids]
    rng = np.random.default_rng(int(ids[0]) + 1)
    v = rng.standard_normal((len(ids), DIM)).astype(np.float64)
    v /= np.linalg.norm(v, axis=1)[:, None]
    mats = [v]
    sel = ids < CLONES
    if sel.any():
        out_ids.append(ids[sel] + N)
        mats.append(v[sel])
    allv = np.vstack(mats)
    flat = pa.array(allv.ravel(), pa.float64())
    col = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (len(allv) + 1) * DIM, DIM, dtype=np.int64),
                 pa.int64()).cast(pa.int32()), flat)
    return pa.table({"vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                     "embedding": col})


ds = rd.range(N).map_batches(_gen, batch_format="pyarrow")
t0 = time.perf_counter()
pairs = embedding_near_dup_pairs(ds, threshold=0.999,
                                 max_bucket_docs=4096).materialize()
n = pairs.count()
wall = time.perf_counter() - t0

# exactness: every pair must be (i, N+i) with i < CLONES, all present
import pyarrow.compute as pc


def _check(b: pa.Table) -> pa.Table:
    a = b.column("id_a").to_numpy(zero_copy_only=False)
    bb = b.column("id_b").to_numpy(zero_copy_only=False)
    ok = (a < CLONES) & (bb == a + N)
    return pa.table({"bad": pa.array([int((~ok).sum())], pa.int64()),
                     "seen": pa.array([len(a)], pa.int64())})


chk = pairs.map_batches(_check, batch_format="pyarrow").to_pandas()
bad, seen = int(chk["bad"].sum()), int(chk["seen"].sum())
print(f"pairs={n} expect={CLONES} bad={bad} "
      f"exact={'OK' if n == CLONES and bad == 0 else 'FAIL'} "
      f"wall={wall:.1f}s vecs_per_sec={(N + CLONES) / wall:,.0f}")
assert n == CLONES and bad == 0
ray.shutdown()
