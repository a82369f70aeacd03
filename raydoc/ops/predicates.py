"""Predicate algebra + routing: the engine's filter vocabulary.

Re-expresses the reference's Switch component operator set — ``contains,
not contains, start with, end with, empty, not empty, =, ≠, >, <, ≥, ≤``
with numeric-compare-then-string fallback and and/or condition groups
(/root/reference/agent/component/switch.py:90-129) — as vectorized
pyarrow.compute kernels over Arrow batches.

Routing (Switch/Categorize semantics, canvas.py:265-269) becomes data:
``add_route_column`` stamps each row with the first matching branch name
(first-match-wins, switch.py:56-77), after which each branch is a plain
``Dataset.filter``; the control-flow graph is gone, only partitioned
data remains (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["OPERATORS", "apply_predicate", "add_route_column", "filter_ds"]


def _as_numeric(arr: pa.ChunkedArray | pa.Array):
    """Best-effort cast to float64, mirroring switch.py:110-117's
    float-coerce-then-compare; returns None when the column isn't
    numeric-castable (string comparison fallback, switch.py:119-129)."""
    try:
        return pc.cast(arr, pa.float64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None


def _cmp(op: str, arr, value: Any):
    num = _as_numeric(arr) if not isinstance(value, str) or _is_num(value) else None
    if num is not None:
        v = float(value)
        return getattr(pc, op)(num, v)
    return getattr(pc, op)(pc.cast(arr, pa.string()), str(value))


def _is_num(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


# operator name -> fn(array, value) -> BooleanArray. Names follow the
# reference's Switch DSL (switch.py:90-129).
OPERATORS = {
    "contains": lambda a, v: pc.match_substring(pc.cast(a, pa.string()), str(v)),
    "not contains": lambda a, v: pc.invert(
        pc.match_substring(pc.cast(a, pa.string()), str(v))
    ),
    "start with": lambda a, v: pc.starts_with(pc.cast(a, pa.string()), str(v)),
    "end with": lambda a, v: pc.ends_with(pc.cast(a, pa.string()), str(v)),
    "empty": lambda a, v: pc.or_kleene(
        pc.is_null(a), pc.equal(pc.cast(a, pa.string()), "")
    ),
    "not empty": lambda a, v: pc.and_kleene(
        pc.is_valid(a), pc.not_equal(pc.cast(a, pa.string()), "")
    ),
    "=": lambda a, v: _cmp("equal", a, v),
    "≠": lambda a, v: _cmp("not_equal", a, v),
    ">": lambda a, v: _cmp("greater", a, v),
    "<": lambda a, v: _cmp("less", a, v),
    "≥": lambda a, v: _cmp("greater_equal", a, v),
    "≤": lambda a, v: _cmp("less_equal", a, v),
}


def apply_predicate(batch: pa.Table, conditions: list[dict], logic: str = "and"):
    """Evaluate a condition group over a batch -> BooleanArray.

    Each condition: {"column", "operator", "value"}; ``logic`` combines
    items with and/or (switch.py:56-66's ConditionItem groups).
    """
    masks = []
    for c in conditions:
        fn = OPERATORS[c["operator"]]
        masks.append(fn(batch.column(c["column"]), c.get("value")))
    out = masks[0]
    comb = pc.and_kleene if logic == "and" else pc.or_kleene
    for m in masks[1:]:
        out = comb(out, m)
    return pc.fill_null(out, False)


def add_route_column(
    batch: pa.Table,
    branches: list[tuple[str, list[dict], str]],
    default: str = "default",
    column: str = "route",
) -> pa.Table:
    """Stamp first-match-wins branch names: [(name, conditions, logic)].

    The data-parallel form of Switch/Categorize routing — downstream
    branches filter on ``route`` instead of redirecting a scheduler.
    """
    import numpy as np

    route = np.full(batch.num_rows, default, dtype=object)
    unassigned = np.ones(batch.num_rows, dtype=bool)
    for name, conditions, logic in branches:
        mask = apply_predicate(batch, conditions, logic).to_numpy(
            zero_copy_only=False
        )
        take = unassigned & mask
        route[take] = name
        unassigned &= ~mask
    return batch.append_column(column, pa.array(route, type=pa.string()))


def filter_ds(ds, conditions: list[dict], logic: str = "and"):
    """Dataset-level filter using the predicate algebra (streaming,
    batch-at-a-time; no materialization)."""
    return ds.map_batches(
        lambda b: b.filter(apply_predicate(b, conditions, logic)),
        batch_format="pyarrow",
    )
