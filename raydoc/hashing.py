"""Stable, process-independent hashing primitives.

Python's builtin ``hash()`` is randomized per process (PYTHONHASHSEED),
so every hash that crosses a task boundary (partition ids, minhash,
simhash, dedup keys) MUST come from here. All functions are pure and
deterministic across processes, nodes and runs.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

__all__ = [
    "PART_RULE",
    "crc32_str",
    "md5_hex",
    "part_id_for_url",
    "part_ids_for_urls",
    "stable_u64",
    "stable_u64_arr",
]

# Version tag of the url -> partition-id rule, persisted next to each
# run's manifests (extract_pipeline writes a PART_RULE marker) so a
# resume with a DIFFERENT rule fails loudly instead of silently
# re-extracting committed partitions / skipping uncommitted ones.
# "poly64_v1" = stable_u64_arr(url) % P (r05; replaced the r01-r04
# per-row crc32 "crc32_v1").
PART_RULE = "poly64_v1"

_POLY_W = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def crc32_str(s: str) -> int:
    """CRC32 of a UTF-8 string -> uint32. Fast, used for partition ids."""
    return zlib.crc32(s.encode("utf-8", "surrogatepass")) & 0xFFFFFFFF


def part_id_for_url(url: str, num_partitions: int) -> int:
    """Stable url -> partition id. The single partitioning rule used by
    the flagship pipeline (SURVEY.md §4: url-hash repartition to break
    host skew)."""
    return crc32_str(url) % num_partitions


def md5_hex(s: str) -> str:
    """Hex md5 of a UTF-8 string; matches DuckDB ``md5(text)``."""
    return hashlib.md5(s.encode("utf-8", "surrogatepass")).hexdigest()


def stable_u64(s: str, salt: int = 0) -> int:
    """Salted stable 64-bit hash (for minhash permutations etc.)."""
    h = hashlib.blake2b(
        s.encode("utf-8", "surrogatepass"), digest_size=8, salt=salt.to_bytes(8, "big")
    )
    return int.from_bytes(h.digest(), "big")


def stable_u64_arr(col) -> np.ndarray:
    """Vectorized stable 64-bit hash of an Arrow string/binary array ->
    uint64 ndarray. Pure uint64 arithmetic over the array's value
    buffer, so the values are deterministic across processes, nodes,
    runs, AND library versions — unlike polars' xxhash (whose values
    the polars docs do not pin across releases), which is why the
    physical-only bucketing hash (ops/bucketing._col_hash_u64) may use
    polars but every PERSISTED hash (partition ids in manifests, doc
    ids) must come from here or from ``stable_u64``/``md5_hex``.

    Construction: per-row polynomial sum((byte_i + 1) * W^pos_i) in
    Z/2^64 (the +1 distinguishes trailing NUL bytes, W odd), then a
    splitmix64 finalizer to fix the weak low bits a power-basis
    polynomial has (``% num_partitions`` consumes the LOW bits). One
    numpy pass: position-in-row via arange - repeat, a precomputed
    power table gather, ``np.add.reduceat`` at row starts. Nulls hash
    like "" (callers in the hot paths never feed nulls). ~60 ns/url
    vs ~600 ns for the per-row crc32 loop it replaced (r05)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_large_string(col.type)
            or pa.types.is_large_binary(col.type)):
        col = col.cast(pa.large_binary()
                       if pa.types.is_binary(col.type)
                       else pa.large_string())
    if col.null_count:
        col = pc.fill_null(col, pa.scalar("", col.type))
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if int(offs[-1] - offs[0]):
            maxlen = int(lens.max())
            wpow = np.empty(maxlen, dtype=np.uint64)
            wpow[0] = 1
            if maxlen > 1:
                np.multiply.accumulate(
                    np.full(maxlen - 1, _POLY_W, dtype=np.uint64),
                    out=wpow[1:])
            # row-aligned ~4 MiB chunks with reused scratch buffers:
            # one fresh whole-column uint64 expansion (~8x the value
            # bytes, three temporaries) page-fault-storms on this class
            # of host exactly like the simhash/pair-gather cases
            # (measured 6.9 s vs 0.23 s for 1M ~40-byte urls), and the
            # chunked form is what keeps peak heap flat for text-sized
            # values too
            chunk = max(1 << 22, maxlen)
            cuts = np.searchsorted(
                offs, np.arange(int(offs[0]) + chunk, int(offs[-1]),
                                chunk, dtype=np.int64))
            row_bounds = np.concatenate(([0], cuts, [n]))
            scratch_v = np.empty(chunk + maxlen, dtype=np.uint64)
            scratch_p = np.empty(chunk + maxlen, dtype=np.int64)
            idx = np.arange(chunk + maxlen, dtype=np.int64)
            for r0, r1 in zip(row_bounds[:-1], row_bounds[1:]):
                if r1 <= r0:
                    continue
                b0, b1 = int(offs[r0]), int(offs[r1])
                clen = b1 - b0
                if clen == 0:
                    continue
                vals = scratch_v[:clen]
                # +1 distinguishes trailing NULs; uint64 out upcasts
                np.add(data[b0:b1], np.uint64(1), out=vals,
                       casting="unsafe")
                starts = (offs[r0:r1] - b0).astype(np.int64)
                pos = scratch_p[:clen]
                np.subtract(idx[:clen],
                            np.repeat(starts, lens[r0:r1]), out=pos)
                vals *= wpow[pos]
                nz = lens[r0:r1] > 0
                # reduceat needs non-empty segments; empty rows keep 0
                if nz.any():
                    h[r0:r1][nz] = np.add.reduceat(vals, starts[nz])
        # length rides the mix so zero-byte-tailed prefixes never
        # alias; then splitmix64 to fix the polynomial's weak low bits
        h += lens.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def part_ids_for_urls(col, num_partitions: int) -> np.ndarray:
    """Vectorized url -> partition id (rule ``PART_RULE``): the single
    partitioning rule of the flagship pipeline (SURVEY.md §4). int64
    ndarray in [0, num_partitions)."""
    return (stable_u64_arr(col)
            % np.uint64(num_partitions)).astype(np.int64)
