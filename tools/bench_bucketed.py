"""A/B the per-key ``map_groups`` grouped plan against the coarse-bucket
vectorized plan (ops/bucketing) on a synthetic corpus with a
DATA-SIZED key space — the r02 verdict's "What's wrong" family.

    python tools/bench_bucketed.py [n_keys ...]   # default 100_000 1_000_000

Owns its Ray session. Prints one line per (plan, op, n_keys) with wall
seconds; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa


def make_ds(n_keys: int, rows_per_key: int = 2):
    import ray.data as rd

    n = n_keys * rows_per_key
    rng = np.random.RandomState(11)
    t = pa.table({
        "k": pa.array(np.repeat(np.arange(n_keys, dtype=np.int64),
                                rows_per_key)),
        "v": pa.array(rng.rand(n)),
    })
    return rd.from_arrow(t).repartition(32).materialize()


def perkey_agg(ds):
    """The r02 grouped_agg finalize shape: one Python call per key."""
    def _final(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict({
            "k": [g.column("k")[0].as_py()],
            "s": [pc.sum(g.column("v")).as_py()],
        })

    return ds.groupby("k").map_groups(_final, batch_format="pyarrow")


def bucketed_agg(ds):
    from raydoc.ops.relational import grouped_agg

    return grouped_agg(ds, ["k"], {"s": ("sum", "v")})


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sizes = [int(a.replace("_", "")) for a in sys.argv[1:]] or [
        100_000, 1_000_000]
    for n_keys in sizes:
        ds = make_ds(n_keys)
        for name, fn in (("bucketed", bucketed_agg), ("perkey", perkey_agg)):
            if name == "perkey" and n_keys >= 1_000_000:
                # measured minutes of pure dispatch at this size; cap
                # the A side to the 100k point and extrapolate
                print(f"perkey   n_keys={n_keys}: skipped "
                      "(O(n_keys) Python dispatch; see 100k point)")
                continue
            t0 = time.perf_counter()
            out = fn(ds).materialize()
            wall = time.perf_counter() - t0
            assert out.count() == n_keys
            print(f"{name:8s} n_keys={n_keys}: {wall:.2f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
