"""Robots-gate scale validation: N urls across H hosts, each host
with R literal prefix rules — measuring filter throughput and
validating the decision against a driver-side replay on a sample.

Usage: python tools/validate_robots_stress.py [n_urls] [n_hosts] [rules_per_host]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
H = int(sys.argv[2]) if len(sys.argv) > 2 else 50
R = int(sys.argv[3]) if len(sys.argv) > 3 else 20

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.ops.url import filter_robots_disallowed, parse_robots

robots = {}
for h in range(H):
    lines = ["User-agent: *"]
    for r in range(R):
        lines.append(f"Disallow: /sec{r}/")
        if r % 4 == 0:
            lines.append(f"Allow: /sec{r}/public")
    robots[f"host{h}.example"] = "\n".join(lines)


def _gen(b: pa.Table) -> pa.Table:
    i = b.column("id").to_numpy(zero_copy_only=False)
    host = i % H
    sec = (i * 7) % (R + 10)          # some paths match no rule
    pub = (i % 3 == 0)
    urls = [f"https://host{h}.example/sec{s}/"
            f"{'public/page' if p else 'page'}{k}"
            for h, s, p, k in zip(host, sec, pub, i)]
    return pa.table({"url": pa.array(urls, pa.string())})


ds = rd.range(N).map_batches(_gen, batch_format="pyarrow").materialize()
t0 = time.time()
kept = filter_robots_disallowed(ds, robots).materialize()
wall = time.time() - t0
n_kept = kept.count()

# driver replay on a deterministic sample
compiled = {h: parse_robots(t) for h, t in robots.items()}


def _ref_allow(url: str) -> bool:
    host = url.split("//")[1].split("/")[0]
    path = "/" + url.split("//")[1].split("/", 1)[1]
    best, allow = -1, True
    for prefix, a in compiled.get(host, []):
        if path.startswith(prefix):
            pl = len(prefix)
            if pl > best or (pl == best and a):
                best, allow = pl, a
    return allow


sample = [r["url"] for r in ds.limit(5000).take_all()]
ref_kept = sum(1 for u in sample if _ref_allow(u))
got_sample = filter_robots_disallowed(
    rd.from_arrow(pa.table({"url": pa.array(sample, pa.string())})),
    robots).count()

print(json.dumps({
    "n_urls": N, "n_hosts": H, "rules_per_host": len(
        compiled["host0.example"]),
    "wall_s": round(wall, 2), "urls_per_s": int(N / wall),
    "kept_fraction": round(n_kept / N, 4),
    "sample_matches_replay": bool(got_sample == ref_kept),
}))
assert got_sample == ref_kept
ray.shutdown()
