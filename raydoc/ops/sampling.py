"""Deterministic sampling.

The reference samples with ``random.choice`` (message.py:43,
answer.py:48) — nondeterministic across runs. The engine's form is
hash-based: keep a row iff a stable LCG of its key falls under the
rate. Same rows at ANY parallelism, restart, or cluster size, and
exactly expressible in SQL for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hash_sample", "hash_split", "stratified_hash_sample",
           "upsample_by_factor"]

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


def stratified_hash_sample(ds, key_col: str, strata_col: str,
                           rates: dict[str, int], default_percent: int = 0):
    """Per-stratum deterministic sampling for training-mix construction
    (e.g. downsample 'en' to 10%, keep low-resource languages whole).
    Same LCG as :func:`hash_sample`, but the keep threshold is looked
    up from the row's stratum. Embarrassingly parallel — no shuffle,
    no per-stratum pass; one vectorized `if_else` chain per batch."""

    def _f(b: pa.Table) -> pa.Table:
        import numpy as np

        k = pc.cast(b.column(key_col), pa.int64()).to_numpy(zero_copy_only=False)
        h = pa.array(((k * _A + _C) % _M) % 100, pa.int64())
        col = b.column(strata_col)
        thr = pa.array(np.full(len(b), default_percent, np.int64))
        for v, p in rates.items():
            thr = pc.if_else(pc.equal(col, pa.scalar(v)),
                             pa.scalar(p, pa.int64()), thr)
        return b.filter(pc.less(h, thr))

    return ds.map_batches(_f, batch_format="pyarrow")


def upsample_by_factor(ds, factor_of, rep_col: str = "rep"):
    """Repeat each row ``factor_of(batch)[i]`` times (int >= 0), adding
    ``rep_col`` = 1..factor within each source row. The training-mix
    upsampling primitive: high-quality buckets repeated, low-quality
    kept once (factor 1) or dropped (factor 0). Pure per-batch
    ``np.repeat`` take — streams, never shuffles; output block size
    grows by the mean factor, so callers with large factors should
    lower ``batch_size`` upstream."""
    import numpy as np

    def _f(b: pa.Table) -> pa.Table:
        fac = np.asarray(factor_of(b), np.int64)
        idx = np.repeat(np.arange(len(fac), dtype=np.int64), fac)
        out = b.take(pa.array(idx))
        starts = np.cumsum(fac) - fac  # first output position per row
        rep = (np.arange(idx.size, dtype=np.int64)
               - np.repeat(starts, fac) + 1)
        return out.append_column(rep_col, pa.array(rep, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def hash_split(ds, key_col: str, val_pct: int = 5, test_pct: int = 5,
               salt: str = "split", out_col: str = "split"):
    """Deterministic train/val/test assignment: bucket = the first 8
    hex digits of md5("<salt>:<key>") mod 100; buckets [0, test_pct)
    -> 'test', [test_pct, test_pct+val_pct) -> 'val', rest -> 'train'.

    A per-row map — no shuffle, no global state — so the split is
    identical at any parallelism, restart, or cluster size, a doc
    never migrates between splits when the corpus grows, and the
    assignment is exactly reproducible in SQL
    (('0x' || substr(md5(...), 1, 8))::BIGINT % 100). The salt makes
    independent splits (e.g. per experiment) uncorrelated.
    """
    import hashlib

    lo, hi = test_pct, test_pct + val_pct

    def _f(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_pylist()
        names = []
        for k in keys:
            d = hashlib.md5(f"{salt}:{k}".encode()).hexdigest()
            bucket = int(d[:8], 16) % 100
            names.append("test" if bucket < lo
                         else "val" if bucket < hi else "train")
        return b.append_column(out_col, pa.array(names, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def bottom_k_sample(ds, key_col: str, n: int, salt: int = 0):
    """Fixed-SIZE uniform sample without knowing the corpus size: keep
    the ``n`` rows whose splitmix64(key + salt) is smallest — the
    bottom-k sketch. Unlike ``hash_sample`` (fixed RATE), the output
    size is exact whatever the input size, the result is deterministic
    and mergeable (the union of two corpora's bottom-k is the bottom-k
    of the union), and no shuffle happens: each batch keeps its local
    bottom-k, then ONE small final sort over <= k x num_batches rows
    (ops.relational.top_k ascending). ``salt`` decorrelates repeated
    samples. Integer keys only (the splitmix64 SQL replay is the
    oracle contract; string keys go through hash_sample)."""
    from raydoc.ops.relational import top_k
    from raydoc.ops.sketch import _mix64

    s = np.uint64(np.int64(salt).view(np.uint64) if salt < 0 else salt)

    def _h(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        # int64 -> uint64 wraps mod 2^64, matching the SQL replay's
        # ((x % M + M) % M) normalization
        h = _mix64(keys.astype(np.int64).astype(np.uint64) + s)
        return b.append_column("_h", pa.array(h, pa.uint64()))

    out = top_k(ds.map_batches(_h, batch_format="pyarrow"), "_h", n,
                descending=False, tiebreak=key_col)
    return out.drop_columns(["_h"])
