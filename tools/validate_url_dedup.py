"""Scale validation for ops/url.url_dedup: N synthetic docs -> 2N
fetch rows (dirty original + later recrawl per doc, same construction
as queries.docs_url_dedup) -> canonicalize + latest-wins dedup.

Checks EXACTNESS at scale (output rows == N, every winner is the
ts=2d+1 recrawl) and reports throughput, mirroring the 1M-doc
validations BASELINE.md records for the other dedup ops.

    python tools/validate_url_dedup.py [n_docs]   # default 1_000_000
"""

from __future__ import annotations

import sys
import time

import pyarrow as pa
import pyarrow.compute as pc


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from raydoc.ops.url import synthetic_fetch_rows, url_dedup

    base = rd.range(n).map_batches(
        lambda b: synthetic_fetch_rows(b.column("id")),
        batch_format="pyarrow")

    t0 = time.perf_counter()
    out = url_dedup(base, "url", "fetch_ts")

    # exactness ride-along: every winner must be its doc's recrawl
    # (odd fetch_ts) — reduce per block, never collect rows
    def _check(b: pa.Table) -> pa.Table:
        ts = b.column("fetch_ts")
        bad = pc.sum(pc.cast(
            pc.equal(pc.bit_wise_and(ts, 1), 0), pa.int64())).as_py() or 0
        return pa.table({"rows": pa.array([b.num_rows], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    stats = out.map_batches(_check, batch_format="pyarrow") \
        .to_pandas().sum()
    wall = time.perf_counter() - t0
    rows, bad = int(stats["rows"]), int(stats["bad"])
    ok = rows == n and bad == 0
    print(f"n_docs={n} fetch_rows={2 * n} out_rows={rows} "
          f"stale_winners={bad} exact={'OK' if ok else 'FAIL'} "
          f"wall={wall:.1f}s urls_per_sec={2 * n / wall:,.0f}")
    ray.shutdown()
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
