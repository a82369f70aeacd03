"""Scale validation of the persisted-index incremental dedup
(ops/incremental.py): index a 1M-doc corpus ONCE, then probe a 100k
new batch where ids % 10 == 0 are one-word-substituted near-dups of a
corpus doc and the rest are fresh. Reports index-build and probe
throughput, recall of the planted dups, and false-victim count, for
both plans (broadcast and co-partition).

Usage: python tools/validate_incremental.py [n_corpus] [n_new]
"""
import shutil
import sys
import time

import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from raydoc.ops.incremental import (  # noqa: E402
    incremental_dedup,
    write_neardup_index,
)


def _base(s: int) -> str:
    return (f"the quick document d{s} body t{s % 97} with enough "
            f"tokens u{(s * 31) % 89} to pass every quality gate "
            f"v{(s * 7) % 83} and some more filler words w{s % 79} "
            f"here now ok x{(s * 13) % 73} more body y{s % 71} "
            f"end z{(s * 3) % 67} of document text block q{s % 61}")


def _gen_corpus(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array([_base(int(i)) for i in ids],
                                      pa.string())})


def _gen_new(b: pa.Table) -> pa.Table:
    ids = b.column("id").to_numpy(zero_copy_only=False)
    texts = []
    for i in ids:
        i = int(i)
        if i % 10 == 0:   # near-dup of corpus doc i (one word swapped)
            texts.append(_base(i).replace("filler", "replaced"))
        else:             # fresh: disjoint id-derived token family
            texts.append(_base(i + 7_000_000))
    return pa.table({"doc_id": pa.array(ids + 10_000_000, pa.int64()),
                     "text": pa.array(texts, pa.string())})


corpus = rd.range(N).map_batches(_gen_corpus, batch_format="pyarrow")
new = rd.range(M).map_batches(_gen_new, batch_format="pyarrow")

idx = "/tmp/raydoc_incr_stress_index"
shutil.rmtree(idx, ignore_errors=True)
t0 = time.perf_counter()
write_neardup_index(corpus, idx)
t_build = time.perf_counter() - t0
print(f"index build: {N} docs in {t_build:.1f} s "
      f"= {N / t_build:,.0f} docs/s")

expected_victims = {i + 10_000_000 for i in range(0, M, 10)}

for label, kwargs in (
    ("broadcast", {}),
    ("co-partition", {"broadcast_cap": 0}),
):
    t0 = time.perf_counter()
    kept, pairs = incremental_dedup(new, idx, threshold=0.6, **kwargs)
    n_kept = kept.count()
    wall = time.perf_counter() - t0
    victims = set()
    for blk in ray.get(pairs.to_arrow_refs()):
        if blk.num_rows:  # schemaless empty blocks (Ray join hazard)
            victims.update(blk.column("id_new").to_pylist())
    tp = len(victims & expected_victims)
    fp = len(victims - expected_victims)
    recall = tp / len(expected_victims)
    print(f"{label}: probe {M} new vs {N}-doc index in {wall:.1f} s "
          f"= {M / wall:,.0f} new-docs/s | kept {n_kept}, "
          f"recall {recall:.3%}, false victims {fp}")

# --- compaction at scale: fragment the index with several appends of
# fresh doc families, compact, and verify the SAME probe returns the
# same victims against the compacted layout (plus file-count report).
import glob  # noqa: E402
import os  # noqa: E402

from raydoc.ops.incremental import (  # noqa: E402
    append_neardup_index,
    compact_index,
    incremental_near_dup_pairs,
)


def _gen_extra(off: int):
    def _g(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(ids + off, pa.int64()),
             "text": pa.array([_base(int(i) + off) for i in ids],
                              pa.string())})
    return _g


def _count_files() -> dict:
    return {c: len(glob.glob(os.path.join(idx, c, "*.parquet")))
            for c in ("sigs", "bands")
            if os.path.isdir(os.path.join(idx, c))}


for a in range(4):  # 4 appends of 50k disjoint docs each
    off = 20_000_000 + a * 1_000_000
    append_neardup_index(
        rd.range(50_000).map_batches(_gen_extra(off),
                                     batch_format="pyarrow"), idx)

before = _count_files()


def _victim_ids(pairs) -> set:
    out = set()
    for blk in ray.get(pairs.to_arrow_refs()):
        if blk.num_rows:
            out.update(blk.column("id_new").to_pylist())
    return out


pre = _victim_ids(incremental_near_dup_pairs(new, idx, threshold=0.6))
t0 = time.perf_counter()
report = compact_index(idx)
t_comp = time.perf_counter() - t0
after = _count_files()
post = _victim_ids(incremental_near_dup_pairs(new, idx, threshold=0.6))
n_rows = N + 4 * 50_000
print(f"compaction: files {before} -> {after} "
      f"({n_rows:,} indexed docs) in {t_comp:.1f} s "
      f"= {n_rows / t_comp:,.0f} docs/s rewritten; "
      f"probe victims identical pre/post: {pre == post} "
      f"({len(pre)} victims)")
assert pre == post, "compaction changed probe results"

shutil.rmtree(idx, ignore_errors=True)
ray.shutdown()
