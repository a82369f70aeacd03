"""Per-stage time split of the flagship extraction pipeline (the
SURVEY §6 measurement: read / extract / shuffle / chunk+write).

Runs the checkpointed pipeline once with ``collect_stats=True`` and
reports, per Ray Data operator: the operator's streaming wall clock
(operators OVERLAP — the executor pipelines blocks, so stage walls sum
to more than the job wall), and the summed remote wall / remote CPU /
UDF seconds across its tasks (the true compute attribution).

Usage:
    python tools/stage_split.py [sf] [num_cpus]    # default 0.1, 32

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def _to_sec(tok: str) -> float:
    m = re.fullmatch(r"([\d.]+)(us|ms|s)", tok)
    return float(m.group(1)) * _UNIT[m.group(2)]


def parse_stats(stats: str) -> list[dict]:
    """Split a Dataset.stats() string into per-operator rows with
    summed remote wall/cpu/UDF seconds (suboperators fold into their
    parent operator)."""
    ops: list[dict] = []
    cur: dict | None = None
    for line in stats.splitlines():
        m = re.match(r"Operator \d+ (.+?):.*?(?:in ([\d.]+)s)?$",
                     line.strip())
        if m and line.startswith("Operator"):
            mt = re.search(r"(\d+) tasks executed", line)
            cur = {"operator": m.group(1),
                   "wall_s": float(m.group(2)) if m.group(2) else None,
                   "remote_wall_s": 0.0, "remote_cpu_s": 0.0,
                   "udf_s": 0.0, "tasks": int(mt.group(1)) if mt else 0}
            ops.append(cur)
            continue
        if cur is None:
            continue
        t = line.strip()
        mm = re.match(r"\* Remote wall time: .* ([\d.]+(?:us|ms|s)) total", t)
        if mm:
            cur["remote_wall_s"] += _to_sec(mm.group(1))
        mm = re.match(r"\* Remote cpu time: .* ([\d.]+(?:us|ms|s)) total", t)
        if mm:
            cur["remote_cpu_s"] += _to_sec(mm.group(1))
        mm = re.match(r"\* UDF time: .* ([\d.]+(?:us|ms|s)) total", t)
        if mm:
            cur["udf_s"] += _to_sec(mm.group(1))
        mm = re.match(r"(?:Suboperator \d+ .*: )?(\d+) tasks executed", t)
        if mm:
            cur["tasks"] += int(mm.group(1))
        if t.startswith("Dataset iterator"):
            cur = None
    for o in ops:
        for k in ("remote_wall_s", "remote_cpu_s", "udf_s"):
            o[k] = round(o[k], 3)
    return ops


_STAGE_OF = [
    (r"ReadParquet", "read"),
    (r"extract_batch", "extract (+part-id/keys)"),
    (r"Shuffle", "url-hash shuffle"),
    (r"_write_block", "chunk + manifest + parquet write"),
]


def stage_label(op_name: str) -> str:
    for pat, label in _STAGE_OF:
        if re.search(pat, op_name):
            return label
    return op_name


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from raydoc.corpus import ensure_pages_parquet
    from raydoc.pipelines.extract_pipeline import run_extract_pipeline

    pages = ensure_pages_parquet(sf)
    out = f"/tmp/raydoc_stage_split/out_sf{sf}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    summary = run_extract_pipeline(pages, out, collect_stats=True)
    wall = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    ops = parse_stats(summary.pop("stats_str"))
    for o in ops:
        o["stage"] = stage_label(o["operator"])
    result = {
        "sf": sf, "num_cpus": cpus,
        "job_wall_s": round(wall, 3),
        "n_docs": summary["n_docs"],
        "docs_per_sec": round(summary["n_docs"] / wall, 1),
        "note": ("operator walls overlap (streaming executor); "
                 "remote_wall_s/remote_cpu_s/udf_s are summed across "
                 "that operator's tasks"),
        "stages": [{k: o[k] for k in
                    ("stage", "wall_s", "tasks", "remote_wall_s",
                     "remote_cpu_s", "udf_s")} for o in ops],
    }
    ray.shutdown()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
