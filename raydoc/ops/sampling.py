"""Deterministic sampling.

The reference samples with ``random.choice`` (message.py:43,
answer.py:48) — nondeterministic across runs. The engine's form is
hash-based: keep a row iff a stable LCG of its key falls under the
rate. Same rows at ANY parallelism, restart, or cluster size, and
exactly expressible in SQL for the oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hash_sample"]

_A, _C, _M = 1103515245, 12345, 2**31


def hash_sample(ds, key_col: str, percent: int):
    """Keep rows where ((key*A + C) mod 2^31) mod 100 < percent.
    key_col must be integer-typed."""

    def _f(b: pa.Table) -> pa.Table:
        # pyarrow.compute has no mod kernel; numpy int64 arithmetic is
        # exact for key*A up to ~8e9 keys (no overflow at any real id)
        import numpy as np

        k = pc.cast(b.column(key_col), pa.int64()).to_numpy(zero_copy_only=False)
        h = ((k * _A + _C) % _M) % 100
        return b.filter(pa.array(h < percent))

    return ds.map_batches(_f, batch_format="pyarrow")
