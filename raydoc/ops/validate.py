"""Data-expectation validation — declarative QA gates over a Dataset.

Every production pipeline fronts its tables with expectation checks
(the Great-Expectations / dbt-test shape): "url is never null",
"doc_id is unique", "lang in {en, de, ...}", "n_chars in [1, 1e6]",
"url matches ^https?://". This module evaluates a rule list in ONE
pass (plus one count shuffle for uniqueness rules) and emits a
violations REPORT — a row per rule with exact violation counts — so a
pipeline can fail-loud, quarantine, or alert on it.

Rule forms (``rules`` = list of dicts, ``check`` selects the form):

- ``{"check": "not_null", "column": c}``
- ``{"check": "unique", "column": c}`` — violations = rows beyond the
  first of each duplicated key (count - distinct-count)
- ``{"check": "range", "column": c, "min": x, "max": y}`` — inclusive;
  nulls violate (a bound on an absent value is unverifiable)
- ``{"check": "regex", "column": c, "pattern": p}`` — full RE2 match
  via ``match_substring_regex``; nulls violate
- ``{"check": "in_set", "column": c, "values": [...]}`` — nulls violate

Report schema: (rule_id, column, check, n_violations, n_rows, ok) —
exact integers, trivially SQL-replayable (queries.docs_expectations),
deterministic under any partitioning.

Physical plan: all row-local rules evaluate vectorized in one
map_batches emitting a FIXED-size partial row per batch (one int64
pair per rule); uniqueness rules ride the bucketed
``grouped_count_distinct``-style plan (count minus distinct keys, one
hash shuffle of slim key rows). Nothing touches the driver but the
per-rule totals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["validate_expectations"]

_ROW_CHECKS = ("not_null", "range", "regex", "in_set")


def _violations(batch: pa.Table, rule: dict) -> int:
    col = batch.column(rule["column"])
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    check = rule["check"]
    null = pc.is_null(col)
    if check == "not_null":
        bad = null
    elif check == "range":
        lo, hi = rule["min"], rule["max"]
        okv = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
        bad = pc.invert(pc.fill_null(okv, False))
    elif check == "regex":
        okv = pc.match_substring_regex(col.cast(pa.string()),
                                       rule["pattern"])
        bad = pc.invert(pc.fill_null(okv, False))
    elif check == "in_set":
        okv = pc.is_in(col, value_set=pa.array(rule["values"]))
        bad = pc.or_kleene(null, pc.invert(pc.fill_null(okv, False)))
        bad = pc.fill_null(bad, True)
    else:  # pragma: no cover - validated upstream
        raise ValueError(check)
    return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)


def validate_expectations(ds, rules: list[dict],
                          num_partitions: int | None = None):
    """Evaluate ``rules`` over ``ds`` -> report Dataset
    (rule_id, column, check, n_violations, n_rows, ok). See module
    docstring for rule forms and the physical plan."""
    import ray
    import ray.data as rd

    for i, r in enumerate(rules):
        if r.get("check") not in _ROW_CHECKS + ("unique",):
            raise ValueError(
                f"validate_expectations: rule {i} has unknown check "
                f"{r.get('check')!r}")
        if "column" not in r:
            raise ValueError(f"validate_expectations: rule {i} "
                             "missing 'column'")
    row_rules = [(i, r) for i, r in enumerate(rules)
                 if r["check"] in _ROW_CHECKS]
    uniq_rules = [(i, r) for i, r in enumerate(rules)
                  if r["check"] == "unique"]

    # ---- one pass: fixed-size per-batch partial for row-local rules
    def _partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "rid": pa.array([i for i, _ in row_rules] + [-1], pa.int64()),
            "viol": pa.array([_violations(b, r) for _, r in row_rules]
                             + [0], pa.int64()),
            "rows": pa.array([0] * len(row_rules) + [b.num_rows],
                             pa.int64())})

    parts = [t for t in ray.get(
        ds.map_batches(_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    viol = {i: 0 for i, _ in row_rules}
    n_rows = 0
    if parts:
        t = pa.concat_tables(parts, promote_options="permissive")
        rid = t.column("rid").to_numpy(zero_copy_only=False)
        vv = t.column("viol").to_numpy(zero_copy_only=False)
        rr = t.column("rows").to_numpy(zero_copy_only=False)
        n_rows = int(rr.sum())
        for i, _ in row_rules:
            viol[i] = int(vv[rid == i].sum())

    # ---- uniqueness: count - distinct over a slim key shuffle
    for i, r in enumerate(rules):
        if r["check"] != "unique":
            continue
        from raydoc.ops.relational import grouped_agg

        col = r["column"]
        distinct = grouped_agg(
            ds.select_columns([col]), [col], {"c": ("count", col)},
            num_partitions=num_partitions).count()
        viol[i] = n_rows - int(distinct)

    report = pa.Table.from_pydict({
        "rule_id": pa.array(range(len(rules)), pa.int64()),
        "column": pa.array([r["column"] for r in rules], pa.string()),
        "check": pa.array([r["check"] for r in rules], pa.string()),
        "n_violations": pa.array([viol[i] for i in range(len(rules))],
                                 pa.int64()),
        "n_rows": pa.array([n_rows] * len(rules), pa.int64()),
        "ok": pa.array([viol[i] == 0 for i in range(len(rules))]),
    })
    return rd.from_arrow(report)
