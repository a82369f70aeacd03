"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001 synthetic pages corpus:
    read_parquet -> actor-pool extract (html dropped) -> extracted rows
    with nested chunks. Returns a lazy Dataset (driver checks rows>=0)."""
    from raydoc.pipelines.queries import flagship_extract

    return flagship_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (registry: raydoc/pipelines/queries.py)."""
    from raydoc.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names). Queries
    absent here (docs_curation's LSH stage, approximate kNN variants,
    the flagship extract/chunk tables) are non-SQL-expressible and get
    the driver's rows-only check; the flagship TEXT itself is
    hash-checked via flagship_text_hash."""
    from raydoc.pipelines.queries import ORACLES

    return dict(ORACLES)
