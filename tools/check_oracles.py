"""Driver-style correctness harness: run every queries() entry and its
DuckDB oracle side-by-side, compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [--json OUT.json] [sf_dir] [name ...]

``--json`` also writes driver-style rows (rows_match/schema_match/
hash_match per query) so a full-registry run can be committed as a
correctness artifact covering entries past the driver's ~50-entry
recording window.

Owns its Ray session (the real driver initialises Ray itself)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_table(res) -> pa.Table:
    import pandas as pd
    import ray.data

    if isinstance(res, ray.data.Dataset):
        tbls = res.to_arrow_refs()
        import ray as _r

        parts = [t for t in _r.get(tbls)]
        nonempty = [p for p in parts if p.num_rows]
        if nonempty:
            return pa.concat_tables(nonempty, promote_options="permissive")
        # all empty: keep one block WITH its schema (a multi-block empty
        # result must not degrade to a zero-column table)
        return parts[0] if parts else pa.table({})
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return res


def value_hash(t: pa.Table) -> str:
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = []
    for row in t.to_pylist():
        rows.append(tuple(repr(row[c]) for c in cols))
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    import ray

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            mine = to_table(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {ex!r}")
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": repr(ex)[:300]}
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"okro {name}: rows={mine.num_rows} (rows-only, {dt:.1f}s)")
            records[name] = {"rows_match": mine.num_rows > 0,
                             "schema_match": None, "hash_match": None,
                             "spark_rows": mine.num_rows,
                             "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            ref = con.sql(oracles[name]).arrow()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex!r}")
            failures.append(name)
            continue
        probs = []
        if mine.num_rows != ref.num_rows:
            probs.append(f"rows {mine.num_rows} != {ref.num_rows}")
        if sorted(mine.column_names) != sorted(ref.column_names):
            probs.append(f"cols {sorted(mine.column_names)} != {sorted(ref.column_names)}")
        if not probs:
            hm, hr = value_hash(mine), value_hash(ref)
            if hm != hr:
                probs.append("value-hash mismatch")
                # show a sample diff
                a = {tuple(repr(r[c]) for c in sorted(mine.column_names)) for r in mine.to_pylist()}
                b = {tuple(repr(r[c]) for c in sorted(ref.column_names)) for r in ref.to_pylist()}
                for d in list(a - b)[:2]:
                    print("   mine-only:", d)
                for d in list(b - a)[:2]:
                    print("   ref-only: ", d)
        if probs:
            print(f"FAIL {name}: {'; '.join(probs)} ({dt:.1f}s)")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={mine.num_rows} hash match ({dt:.1f}s)")
        records[name] = {
            "rows_match": mine.num_rows == ref.num_rows,
            "schema_match": sorted(mine.column_names) == sorted(ref.column_names),
            "hash_match": not probs,
            "spark_rows": mine.num_rows,
            "oracle_rows": ref.num_rows,
            "err": "; ".join(probs) or None,
        }
    ray.shutdown()
    if json_out:
        import datetime
        import json as _json

        payload = {
            "_meta": {
                "command": "python tools/check_oracles.py --json ... " + sf_dir,
                "sf_dir": sf_dir,
                "date": datetime.date.today().isoformat(),
                "n_queries": len(records),
                "note": "full-registry local run; covers entries past the "
                        "driver's ~50-entry recording window",
            },
            **records,
        }
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
