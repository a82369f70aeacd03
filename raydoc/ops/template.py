"""Per-row template rendering: the engine's projection counterpart of
the reference's Template component (literal {ref} substitution with a
compiled regex, /root/reference/agent/component/template.py:70-139).

``render_batch`` substitutes ``{column}`` placeholders with the row's
column values — one compiled regex pass per row, columns resolved once
per batch. Unknown placeholders are left verbatim (the reference leaves
unresolved refs in place too)."""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["render_batch", "render_op"]

_REF_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def render_batch(batch: pa.Table, template: str, out_col: str = "rendered") -> pa.Table:
    """Append ``out_col`` = template with {column} refs filled per row."""
    names = set(batch.column_names)
    cols = {c: batch.column(c).to_pylist() for c in _REF_RE.findall(template)
            if c in names}

    def _row(i: int) -> str:
        return _REF_RE.sub(
            lambda m: _fmt(cols[m.group(1)][i]) if m.group(1) in cols else m.group(0),
            template,
        )

    vals = [_row(i) for i in range(batch.num_rows)]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def render_op(template: str, out_col: str = "rendered"):
    """Dataset-level op: ds.map_batches(render_op("..."), ...)."""

    def _fn(batch: pa.Table) -> pa.Table:
        return render_batch(batch, template, out_col)

    return _fn
