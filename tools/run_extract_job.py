"""Flagship extraction as a `ray job submit` driver (north-rule launch
path).

On a real cluster:

    ray job submit --working-dir . -- \
        python tools/run_extract_job.py \
        --pages s3://bucket/pages/ --out s3://bucket/extracted/

The job is resumable: re-submitting with the same --out skips every
partition whose manifest is already committed (atomic rename protocol,
raydoc/state/manifest.py), so a killed job restarts from the last
committed partition. In this sandbox it runs the same way against local
paths with `python tools/run_extract_job.py --sf 0.01 --out /tmp/x`.

This script OWNS its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", help="pages parquet file/dir (url, html)")
    ap.add_argument("--sf", type=float,
                    help="generate/use the synthetic corpus at this scale "
                         "factor instead of --pages")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--num-parts", type=int, default=None)
    ap.add_argument("--rows-per-part", type=int, default=None,
                    help="explicit row-based partition sizing; default "
                         "derives byte-targeted partitions (~192 MB of "
                         "uncompressed input each) from parquet metadata")
    ap.add_argument("--token-budget", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="rows per extract batch; default derives from "
                         "average row bytes in the parquet metadata")
    ap.add_argument("--durable", action="store_true",
                    help="fsync data files before each manifest commit "
                         "(power-loss-safe resume; slower writes)")
    ap.add_argument("--report", action="store_true",
                    help="add a write-phase timing report derived from the "
                         "per-partition lineage manifests (start spread, "
                         "wall percentiles, extract/write overlap)")
    args = ap.parse_args()
    if bool(args.pages) == bool(args.sf is not None):
        ap.error("exactly one of --pages / --sf is required")

    import ray

    if not ray.is_initialized():  # `ray job submit` may have connected us
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raydoc.pipelines.extract_pipeline import run_extract_pipeline

    if args.sf is not None:
        from raydoc.corpus import ensure_pages_parquet

        pages = ensure_pages_parquet(args.sf)
    else:
        pages = args.pages

    t0 = time.perf_counter()
    t0_unix = time.time()
    summary = run_extract_pipeline(
        pages, args.out,
        num_parts=args.num_parts,
        token_budget=args.token_budget,
        batch_size=args.batch_size,
        rows_per_part=args.rows_per_part,
        durable=args.durable,
    )
    summary["wall_sec"] = round(time.perf_counter() - t0, 3)
    summary["docs_per_sec"] = round(summary["n_docs"] / summary["wall_sec"], 1)
    if args.report:
        # operators read tail latency and extract/write overlap straight
        # off the committed manifests — works on finished AND killed runs
        from raydoc.state.manifest import load_manifests

        mans = load_manifests(args.out)
        ws = sorted(m["wall_sec"] for m in mans if "wall_sec" in m)
        st = sorted(m["t_start_unix"] for m in mans if "t_start_unix" in m)
        if ws and st:
            summary["write_report"] = {
                "n_committed": len(ws),
                "first_write_at_sec": round(st[0] - t0_unix, 3),
                "write_start_spread_sec": round(st[-1] - st[0], 3),
                "write_wall_p50_sec": round(ws[len(ws) // 2], 3),
                "write_wall_max_sec": round(ws[-1], 3),
            }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
