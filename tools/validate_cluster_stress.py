"""1M-vector validation of ops/cluster.py (r05): distributed k-means
with k=256 seeded centroids over random 64-dim unit vectors, one Lloyd
update + assignment pass, then semantic_dedup_pairs at SemDeDup's own
cell regime (k=10000, ~100 docs/cell — pair verify is quadratic per
cell, so k fixes the cost) with 10k planted exact clones: the cells
must recover exactly the 10k (original, clone) pairs (an identical
vector lands in its source's cell by argmax determinism). The first
version of this tool ran the dedup leg at k=256 (~3.9k docs/cell) and
measured the documented star-cap hazard directly: cap 4096 over mixed
cells dropped 1,036 of the 10k planted pairs — k sizing, not the cap,
is the recall control. Run from /root/repo:
`python tools/validate_cluster_stress.py`."""
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
from raydoc.ops.cluster import kmeans_assign, semantic_dedup_pairs

N = 1_000_000
DIM = 64
K = 256           # assignment-throughput leg
K_DEDUP = 10_000  # SemDeDup leg: ~100 docs/cell keeps cliques cheap
CLONES = 10_000   # vec_id i < CLONES gets a clone at id N + i


def _gen_plain(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(int(ids[0]) + 1)
    v = rng.standard_normal((len(ids), DIM)).astype(np.float64)
    v /= np.linalg.norm(v, axis=1)[:, None]
    flat = pa.array(v.ravel(), pa.float64())
    col = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (len(v) + 1) * DIM, DIM, dtype=np.int64),
                 pa.int64()).cast(pa.int32()), flat)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": col})


def _gen_cloned(b: pa.Table) -> pa.Table:
    t = _gen_plain(b)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    sel = ids < CLONES
    if not sel.any():
        return t
    import pyarrow.compute as pc

    clone = t.filter(pa.array(sel))
    clone = clone.set_column(
        clone.schema.get_field_index("vec_id"), "vec_id",
        pc.add(clone.column("vec_id"), pa.scalar(N)))
    return pa.concat_tables([t, clone])


# ---- leg 1: k-means fit+assign over 1M plain vectors -------------------
ds = rd.range(N).map_batches(_gen_plain, batch_format="pyarrow")
t0 = time.perf_counter()
assigned = kmeans_assign(ds, range(K), n_updates=1).materialize()
n_assigned = assigned.count()
wall_km = time.perf_counter() - t0
k_used = assigned.select_columns(["cluster"]).unique("cluster")
print(f"kmeans: {n_assigned} rows assigned to {len(k_used)} clusters "
      f"in {wall_km:.1f} s = {n_assigned / wall_km:,.0f} vecs/s")
assert n_assigned == N

# ---- leg 2: SemDeDup pairs with 10k planted clones ---------------------
ds2 = rd.range(N).map_batches(_gen_cloned, batch_format="pyarrow")
t0 = time.perf_counter()
pairs = semantic_dedup_pairs(ds2, range(K_DEDUP), threshold=0.999,
                             max_cluster_docs=4096).materialize()
n_pairs = pairs.count()
wall_sd = time.perf_counter() - t0

import pyarrow.compute as pc


def _check(b: pa.Table) -> pa.Table:
    a = b.column("id_a").to_numpy(zero_copy_only=False)
    bb = b.column("id_b").to_numpy(zero_copy_only=False)
    ok = (a < CLONES) & (bb == a + N)
    return pa.table({"bad": pa.array([int((~ok).sum())], pa.int64())})


bad = sum(r["bad"] for r in
          pairs.map_batches(_check, batch_format="pyarrow").take_all())
print(f"semantic_dedup_pairs: {n_pairs} pairs ({bad} unexpected) "
      f"in {wall_sd:.1f} s = {(N + CLONES) / wall_sd:,.0f} vecs/s")
assert bad == 0, f"{bad} non-planted pairs"
assert n_pairs == CLONES, f"expected {CLONES} pairs, got {n_pairs}"
print("OK")
ray.shutdown()
