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

import numpy as np
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
    from raydoc.ops.url import url_dedup

    _QA = np.array(["?utm_source=feed&b=2&a=1", "?a=1&utm_campaign=x",
                    "?z=9&gclid=abc", ""], dtype=object)
    _QB = np.array(["?a=1&b=2&utm_medium=m", "?a=1", "?z=9", ""],
                   dtype=object)

    def _fetch_rows(b: pa.Table) -> pa.Table:
        d = b.column("id").combine_chunks()
        dnp = d.to_numpy(zero_copy_only=False)
        dstr = pc.cast(d, pa.string())
        h = pc.cast(pa.array(dnp % 7), pa.string())
        j = pc.binary_join_element_wise
        url_a = j(pa.scalar("https://WWW.Site"), h,
                  pa.scalar(".COM:443/Articles/"), dstr,
                  pa.array(np.where(dnp % 2 == 0, "/", ""), pa.string()),
                  pa.array(_QA[dnp % 4], pa.string()),
                  pa.array(np.where(dnp % 5 == 0, "#sec", ""), pa.string()),
                  pa.scalar(""))
        url_b = j(pa.scalar("https://www.site"), h,
                  pa.scalar(".com/Articles/"), dstr,
                  pa.array(_QB[dnp % 4], pa.string()), pa.scalar(""))
        return pa.table({
            "url": pa.concat_arrays([url_a, url_b]),
            "fetch_ts": pa.array(np.concatenate([dnp * 2, dnp * 2 + 1])),
        })

    base = rd.range(n).map_batches(_fetch_rows, batch_format="pyarrow")

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
