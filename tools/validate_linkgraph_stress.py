"""Link-extraction + host-graph scale validation over the REAL pages
corpus at sf1 (1M pages): vectorized href extraction off the binary
html, weighted host edges, weighted PageRank — measuring pages/s and
links/s through the extraction kernel and validating the graph
invariants (every site host present, ads sink dangling, weighted
rank conservation bound).

Usage: python tools/validate_linkgraph_stress.py [sf]
Prints one JSON line.
"""
import json
import sys
import time

import ray
import ray.data as rd

sys.path.insert(0, ".")

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.corpus import ensure_pages_parquet
from raydoc.ops.linkgraph import host_edges, pagerank

pages_path = ensure_pages_parquet(SF)
ds = rd.read_parquet(pages_path, columns=["url", "html"])
n_pages = ds.count()

t0 = time.time()
edges = host_edges(ds).materialize()
t_edges = time.time() - t0
rows = edges.take_all()
n_links = sum(r["n_links"] for r in rows)
hosts = {r["src_host"] for r in rows} | {r["dst_host"] for r in rows}

t0 = time.time()
pr = pagerank(edges, iterations=5, weight_col="n_links",
              rank_col="rank").take_all()
t_pr = time.time() - t0
ranks = {r["node"]: r["rank"] for r in pr}
total = sum(ranks.values())

ok = (len(hosts) >= 51
      and "ads.example.com" in hosts
      and ranks["ads.example.com"] == max(ranks.values())
      and total <= 10**12)
print(json.dumps({
    "sf": SF, "n_pages": n_pages, "n_distinct_edges": len(rows),
    "n_links": int(n_links), "n_hosts": len(hosts),
    "edge_extract_s": round(t_edges, 2),
    "pages_per_s": int(n_pages / t_edges),
    "links_per_s": int(n_links / t_edges),
    "pagerank_s": round(t_pr, 2),
    "invariants_ok": bool(ok),
}))
assert ok
ray.shutdown()
