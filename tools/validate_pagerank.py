"""PageRank scale validation: a skewed multi-million-edge host graph
with hot hub sinks (20% of all edges land on 100 hub nodes — the
CC-style "everyone links to the big sites" regime), run through
ops/linkgraph.pagerank and compared BIT-EXACTLY against a driver-side
numpy replay of the integer fixed-point contract (exactness is the
point of the integer design: any partitioning must reproduce the
replay to the last unit).

Usage: python tools/validate_pagerank.py [n_edges] [n_hosts] [plan]
``plan`` in {broadcast, copartition, auto} (default broadcast).
Prints one JSON line: edge count, node count, wall seconds for the
5-iteration run, edges*iters/s, and exact-match flag.
"""
import json
import sys
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, ".")

E = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
H = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
PLAN = sys.argv[3] if len(sys.argv) > 3 else "broadcast"
ITERS = 5
SCALE = 10**12

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.ops.linkgraph import pagerank
from raydoc.ops.relational import grouped_agg


def _idx(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # src/dst depend on i beyond (i mod H) so raw edges stay ~distinct
    # (a pure multiplicative map mod H collapses 10:1); all arithmetic
    # int64-safe to E=1e8 and exactly replayed below
    src = (i * 2654435761) % H
    hub = i % 5 == 0
    dst = np.where(hub, i % 100,
                   ((i // H) * 48271 + (i % H) * 40503 + 7) % H)
    return src, dst


def _gen(b: pa.Table) -> pa.Table:
    i = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    src, dst = _idx(i)
    s = pa.compute.binary_join_element_wise(
        pa.scalar("s"), pa.compute.cast(pa.array(src), pa.string()),
        pa.scalar(""))
    d = pa.compute.binary_join_element_wise(
        pa.scalar("s"), pa.compute.cast(pa.array(dst), pa.string()),
        pa.scalar(""))
    return pa.table({"src": s, "dst": d})


edges_raw = rd.range(E).map_batches(_gen, batch_format="pyarrow")
edges = grouped_agg(edges_raw, ["src", "dst"], {"c": ("count", "src")})

t0 = time.time()
out = pagerank(edges, src_col="src", dst_col="dst", iterations=ITERS,
               scale=SCALE, max_nodes=2 * H, plan=PLAN).take_all()
wall = time.time() - t0
got = {r["node"]: r["rank"] for r in out}

# ---- driver-side exact replay ----
i = np.arange(E, dtype=np.int64)
src, dst = _idx(i)
key = src * np.int64(H) + dst
uk = np.unique(key[src != dst])
rs, rdst = uk // H, uk % H
nodes = np.unique(np.concatenate([rs, rdst]))
remap = np.full(H, -1, dtype=np.int64)
remap[nodes] = np.arange(len(nodes))
rs, rdst = remap[rs], remap[rdst]
n = len(nodes)
outdeg = np.bincount(rs, minlength=n).astype(np.int64)
base = SCALE // n
tele = ((100 - 85) * base) // 100
r = np.full(n, base, dtype=np.int64)
nz = outdeg > 0
for _ in range(ITERS):
    contrib = np.zeros(n, dtype=np.int64)
    np.floor_divide(r, outdeg, out=contrib, where=nz)
    insum = np.zeros(n, dtype=np.int64)
    np.add.at(insum, rdst, contrib[rs])
    r = tele + (85 * insum) // 100
ref = {f"s{nodes[k]}": int(r[k]) for k in range(n)}

exact = got == ref
print(json.dumps({
    "plan": PLAN,
    "n_edges_raw": E, "n_edges_distinct": int(len(uk)),
    "n_nodes": n, "iterations": ITERS,
    "wall_s": round(wall, 2),
    "edge_iters_per_s": int(len(uk) * ITERS / wall),
    "exact_match": bool(exact),
}))
assert exact, "pagerank diverged from the integer replay"
ray.shutdown()
