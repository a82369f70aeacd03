"""Stable, process-independent hashing primitives.

Python's builtin ``hash()`` is randomized per process (PYTHONHASHSEED),
so every hash that crosses a task boundary (partition ids, minhash,
simhash, dedup keys) MUST come from here. All functions are pure and
deterministic across processes, nodes and runs.
"""

from __future__ import annotations

import hashlib
import zlib

__all__ = [
    "crc32_str",
    "md5_hex",
    "part_id_for_url",
    "stable_u64",
]


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
