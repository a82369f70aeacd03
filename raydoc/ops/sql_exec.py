"""SQL extraction + execution stage: the ExeSQL component re-expressed.

The reference pulls SQL out of an LLM answer (``` ```sql ``` fence ->
regex trim to ``SELECT ...;``, /root/reference/agent/component/
exesql.py:63-76), executes each ;-separated statement with
``fetchmany(top_n)``, and on error asks the LLM to regenerate up to
``loop`` times (exesql.py:101-152).

Engine form: ``extract_sql`` is the same pure extractor;
``SqlExecStage`` is an actor pool holding ONE DuckDB connection per
actor (the connector-actor pattern, SURVEY.md §2.3) with parquet tables
registered as views at __init__; the bounded retry loop takes a
deterministic ``repair_fn`` hook instead of an LLM. Errors are in-band
rows (status column), never raised.
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa

__all__ = ["extract_sql", "SqlExecStage"]

_FENCE_RE = re.compile(r"```(?:sql)?\s*(.*?)```", re.DOTALL | re.IGNORECASE)
# anchor at WITH as well as SELECT so CTE queries keep their prefix
_SELECT_RE = re.compile(r"((?:with|select)\b.*?;)", re.DOTALL | re.IGNORECASE)


def extract_sql(text: str) -> str:
    """Fenced block first, else first WITH/SELECT...; else the text
    as-is (exesql.py:63-76's progressive trims)."""
    t = text or ""
    m = _FENCE_RE.search(t)
    if m:
        t = m.group(1)
    m = _SELECT_RE.search(t)
    if m:
        t = m.group(1)
    return t.strip().rstrip(";").strip()


class SqlExecStage:
    """rows(sql_text) -> rows(sql, status, n_rows, result_json).

    tables: {view_name: parquet_path} registered once per actor.
    repair_fn(sql, error) -> new sql | None; tried up to max_retries
    times (the reference's loop param, exesql.py:109-130).
    """

    def __init__(self, tables: dict[str, str], top_n: int = 30,
                 max_retries: int = 2,
                 repair_fn: Callable[[str, str], str | None] | None = None) -> None:
        import duckdb

        self.con = duckdb.connect()  # one connection per actor
        for name, path in tables.items():
            self.con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
        self.top_n = top_n
        self.max_retries = max_retries
        self.repair = repair_fn or (lambda sql, err: None)

    def _run_one(self, text: str) -> dict:
        import json

        sql = extract_sql(text)
        last_err = ""
        for attempt in range(self.max_retries + 1):
            try:
                cur = self.con.execute(sql)
                rows = cur.fetchmany(self.top_n)
                cols = [d[0] for d in cur.description]
                return {
                    "sql": sql, "status": "ok", "n_rows": len(rows),
                    "result_json": json.dumps(
                        [dict(zip(cols, [str(v) for v in r])) for r in rows]
                    ),
                }
            except Exception as e:
                last_err = str(e)
                if attempt == self.max_retries:
                    break  # no repair on the final attempt
                fixed = self.repair(sql, last_err)
                if not fixed or fixed == sql:
                    break
                sql = fixed
        # `sql` here is always the statement that PRODUCED last_err —
        # never a repaired string that was not executed
        return {"sql": sql, "status": f"error:{last_err[:200]}",
                "n_rows": 0, "result_json": "[]"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Appends (sql, status, n_rows, result_json) to the INPUT rows,
        so results stay attributable to their question at any
        partitioning (and empty batches keep a stable schema)."""
        out = [self._run_one(t) for t in batch.column("sql_text").to_pylist()]
        for col, typ in (("sql", pa.string()), ("status", pa.string()),
                         ("n_rows", pa.int64()), ("result_json", pa.string())):
            batch = batch.append_column(
                col, pa.array([r[col] for r in out], typ)
            )
        return batch
