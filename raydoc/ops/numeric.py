"""Numeric helpers shared by queries and oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["round_half_up", "round_col"]


def round_half_up(x, ndigits: int = 2):
    """Round half away from zero — matches DuckDB/SQL ``round()``, NOT
    Python's banker's rounding. Accepts scalars or numpy arrays."""
    m = 10.0**ndigits
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def round_col(table: pa.Table, col: str, ndigits: int = 2) -> pa.Table:
    vals = table.column(col).to_numpy(zero_copy_only=False)
    out = round_half_up(vals.astype(np.float64), ndigits)
    return table.set_column(
        table.schema.get_field_index(col), col, pa.array(out, pa.float64())
    )
