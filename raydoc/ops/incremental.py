"""Incremental near-duplicate dedup against a PERSISTED band index.

The continuous-crawl regime the batch LSH (ops/dedup.py
``minhash_lsh_pairs``) cannot serve: a committed corpus is never
re-read — its MinHash band keys and signatures live as Parquet under
``index_dir`` (written once, appended per ingest batch), and each NEW
crawl batch is banded alone, joined against the persisted band table,
and verified by signature estimate. At 100 TB the corpus-side cost of
a new batch is one pruned read of the (doc_id, band_key) table —
~bands x 16 B per corpus doc — instead of re-shingling petabytes.

Reference anchor: the reference's only dedup is get_input's exact
``drop_duplicates`` on content (base.py:474, 509); this module is an
engine-side extension of that semantic to rolling corpus-scale
near-dedup (same MinHash definitions as ops/dedup.py — shared
``_perm_params`` / ``_GRAM_W`` / ``_BAND_SALT`` constants, so an index
written today matches signatures computed tomorrow: every hash is
library-version-independent ``stable_u64`` arithmetic, the round-5
persisted-hash rule).

Index layout (all Parquet, append-only, ``_meta.json`` is the commit
marker and parameter pin)::

    index_dir/
      _meta.json        {"version": "minhash_band_v1", num_perm,
                         bands, rows_per_band, shingle_k, ...}
      sigs/*.parquet    (doc_id int64, sig list<uint64>[num_perm])
      bands/*.parquet   (doc_id int64, band_key uint64)

Plans (chosen by new-batch size, mirroring dedup.py's carry/slim
split):

* new batch small (band rows <= ``broadcast_cap``): the new side's
  (id, band_key) rows are broadcast once via object-store refs; ONE
  streaming pass over the corpus band table probes them with
  searchsorted — zero shuffle of corpus data.
* new batch large, or ``max_bucket_docs`` set: tag-union co-partition
  of both band tables on band_key (the coarse-bucket plan — P Python
  calls total), cross-side pairs per band run, with the same
  star-pair cap discipline as dedup.py for mass-dup boilerplate
  buckets.

Either way candidate pairs are verified by minhash-estimate >= the
threshold: corpus signatures are fetched from the index by candidate
id (semi-join pruned read), new-side signatures are computed once and
reused. Candidate ids/pairs stay Datasets end to end.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydoc.ops.dedup import (
    _BAND_SALT,
    _GRAM_W,
    _MAXU64,
    _attach_pair_values,
    _distinct_pairs,
    minhash_signatures,
)

__all__ = [
    "write_neardup_index",
    "append_neardup_index",
    "read_index_meta",
    "incremental_near_dup_pairs",
    "write_semantic_index",
    "append_semantic_index",
    "read_semantic_meta",
    "incremental_semantic_pairs",
    "incremental_semantic_dedup",
    "incremental_dedup",
    "write_exact_index",
    "append_exact_index",
    "read_exact_meta",
    "incremental_exact_dedup",
    "compact_index",
]

INDEX_VERSION = "minhash_band_v1"
EXACT_VERSION = "exact_md5_v1"
_BROADCAST_BAND_ROWS_CAP = 4_000_000  # 16 B/row -> ~64 MB broadcast
# candidate-pruned sig sets under this total broadcast for the verify
# fast path (one streaming pass over pairs instead of two shuffles);
# 256 MB ~ 250k pruned docs at num_perm=128 — past it, the
# shuffle-attach scale path keeps worker heaps bounded
_VERIFY_BROADCAST_BYTES_CAP = 256 << 20


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_meta.json")


def read_index_meta(index_dir: str) -> dict:
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    if meta.get("version") != INDEX_VERSION:
        raise ValueError(
            f"near-dup index at {index_dir} has version "
            f"{meta.get('version')!r}, this build reads {INDEX_VERSION!r}")
    return meta


def _band_rows_from_sigs(id_col: str, bands: int, rows_per_band: int):
    """map_batches UDF: (id, sig) rows -> (id, band_key) rows, one per
    band — the same position-weighted poly + per-band salt as
    dedup._band_rows, computed from the STORED signature so index
    build/append never re-reads text. Docs with no shingles carry the
    all-MAX empty signature (every real minhash value is < 2^61, so
    all-MAX <=> zero tokens) and are excluded, exactly like
    dedup._band_rows' ``ne`` filter — empty docs are exact_dedup's
    job and would otherwise collapse into one mega-bucket."""
    from raydoc.util import embedding_matrix

    def _rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {id_col: pa.array([], pa.int64()),
                 "band_key": pa.array([], pa.uint64())})
        sig = embedding_matrix(batch.column("sig"), dtype=np.uint64)
        ne = ~(sig == _MAXU64).all(axis=1)
        sig, ids = sig[ne], ids[ne]
        n = len(ids)
        with np.errstate(over="ignore"):
            keys = (sig.reshape(n, bands, rows_per_band)
                    * _GRAM_W[None, None, :rows_per_band]).sum(axis=2) \
                + _BAND_SALT[None, :bands]
        return pa.Table.from_pydict(
            {id_col: pa.array(np.repeat(ids, bands), pa.int64()),
             "band_key": pa.array(keys.ravel(), pa.uint64())})

    return _rows


def _write_index_rows(ds, index_dir: str, meta: dict, *, text_col: str,
                      id_col: str) -> None:
    """Compute signatures once, persist sigs, then derive band rows
    FROM the persisted sigs (a second read of ~num_perm x 8 B per doc,
    not a second shingling of the text)."""
    import ray.data as rd

    sig_dir = os.path.join(index_dir, "sigs")
    band_dir = os.path.join(index_dir, "bands")
    os.makedirs(sig_dir, exist_ok=True)
    os.makedirs(band_dir, exist_ok=True)
    sigs = minhash_signatures(
        ds, text_col, id_col,
        num_perm=meta["num_perm"], shingle_k=meta["shingle_k"])
    sigs.write_parquet(sig_dir)
    rd.read_parquet(sig_dir).map_batches(
        _band_rows_from_sigs(id_col, meta["bands"], meta["rows_per_band"]),
        batch_format="pyarrow",
    ).write_parquet(band_dir)


def write_neardup_index(
    ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> dict:
    """Build a fresh persisted near-dup index over ``ds``. Fails if a
    committed index already exists (use ``append_neardup_index``).
    ``_meta.json`` is written LAST via tmp+rename — a killed build
    leaves no committed marker and is simply rebuilt."""
    if os.path.exists(_meta_path(index_dir)):
        raise FileExistsError(
            f"near-dup index already committed at {index_dir}; use "
            "append_neardup_index to add a batch")
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    meta = {
        "version": INDEX_VERSION,
        "num_perm": num_perm,
        "bands": bands,
        "rows_per_band": num_perm // bands,
        "shingle_k": shingle_k,
        "id_col": id_col,
        # provenance of the persisted hashes: all values derive from
        # stable_u64 token hashes + fixed-seed numpy constants
        # (perm seed 7, gram seed 17, band-salt seed 29) — process- and
        # library-version-independent by construction
        "hash_rule": "stable_u64+poly64 minhash, seeds 7/17/29",
    }
    _write_index_rows(ds, index_dir, meta, text_col=text_col,
                      id_col=id_col)
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _meta_path(index_dir))
    return meta


def append_neardup_index(
    ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Add a batch to a committed index: signatures + band rows land
    as NEW Parquet files in the same directories (Ray names files
    per-task-uniquely, so appends never clobber). LSH parameters come
    from the index meta — a batch indexed with different parameters
    would silently never match, so they are not even accepted here."""
    meta = read_index_meta(index_dir)
    _write_index_rows(ds, index_dir, meta, text_col=text_col,
                      id_col=id_col)
    return meta


def incremental_near_dup_pairs(
    new_ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket_docs: int | None = None,
    broadcast_cap: int = _BROADCAST_BAND_ROWS_CAP,
    num_partitions: int | None = None,
):
    """Near-dup pairs between a NEW batch and the indexed corpus.

    Output Dataset: ``(id_new, id_corpus, est_jaccard)`` — one row per
    cross pair whose minhash-estimate >= ``threshold``. New-batch ids
    should not collide with corpus ids if you want to tell the sides
    apart downstream (the engine itself keys each side separately).

    ``max_bucket_docs``: per-band-bucket corpus-side cap. ``None``
    enumerates every cross pair in a bucket (exact semantics — what
    the oracle checks). With a cap, a bucket whose CORPUS side exceeds
    it pairs each new doc with the bucket's min corpus id only — the
    dedup.py star-pair discipline: victim detection ("is this new doc
    a dup of the corpus?") is preserved, pair enumeration inside
    mass-dup boilerplate clusters is not. Setting it forces the
    co-partition plan (the cap needs whole buckets in view).
    """
    import ray
    import ray.data as rd

    meta = read_index_meta(index_dir)
    bands, rows_per_band = meta["bands"], meta["rows_per_band"]

    # new-side signatures: computed ONCE, reused for band rows and the
    # estimate attach. Slim (num_perm x 8 B per doc), so materializing
    # is object-store-cheap even for a large ingest batch.
    new_sigs = minhash_signatures(
        new_ds, text_col, id_col,
        num_perm=meta["num_perm"], shingle_k=meta["shingle_k"],
    ).materialize()
    new_bands = new_sigs.map_batches(
        _band_rows_from_sigs(id_col, bands, rows_per_band),
        batch_format="pyarrow")

    idx_bands = rd.read_parquet(os.path.join(index_dir, "bands"))

    n_band_rows = new_sigs.count() * bands
    if max_bucket_docs is None and n_band_rows <= broadcast_cap:
        # broadcast plan: ship the new side's (id, band_key) rows once
        # via object-store refs; one streaming pass over the corpus
        # band table probes them — the corpus is never shuffled. A
        # TASK pool with the per-process broadcast cache
        # (relational._bcast_cached), not an actor pool: the fixed
        # actor count + per-actor queues cap effective parallelism on
        # wide streaming passes (the measured extract-stage lesson).
        from raydoc.ops.relational import _bcast_cached

        refs = list(new_bands.materialize().to_arrow_refs())
        cache_key = tuple(r.hex() for r in refs) + (id_col, "incr_probe")

        def _load_probe():
            tbls = [t for t in ray.get(list(refs)) if t.num_rows]
            if not tbls:
                return None
            t = pa.concat_tables(tbls)
            keys = t.column("band_key").combine_chunks().to_numpy(
                zero_copy_only=False)
            ids = t.column(id_col).combine_chunks().to_numpy(
                zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            return keys[order], ids[order]

        def _probe(batch: pa.Table) -> pa.Table:
            z = pa.array([], pa.int64())
            loaded = _bcast_cached(cache_key, _load_probe)
            if batch.num_rows == 0 or loaded is None:
                return pa.Table.from_pydict({"id_a": z, "id_b": z})
            nkeys, nids = loaded
            bk = batch.column("band_key").combine_chunks().to_numpy(
                zero_copy_only=False)
            cid = batch.column(id_col).combine_chunks().to_numpy(
                zero_copy_only=False)
            lo = np.searchsorted(nkeys, bk, side="left")
            hi = np.searchsorted(nkeys, bk, side="right")
            cnt = hi - lo
            nz = cnt > 0
            if not nz.any():
                return pa.Table.from_pydict({"id_a": z, "id_b": z})
            lo, cnt, cid = lo[nz], cnt[nz], cid[nz]
            total = int(cnt.sum())
            # segmented arange: for corpus row r, new-side slots
            # lo[r] .. lo[r]+cnt[r]-1
            ends = np.cumsum(cnt)
            starts = ends - cnt
            pos = (np.arange(total, dtype=np.int64)
                   - np.repeat(starts, cnt) + np.repeat(lo, cnt))
            return pa.Table.from_pydict(
                {"id_a": pa.array(nids[pos], pa.int64()),
                 "id_b": pa.array(np.repeat(cid, cnt), pa.int64())})

        raw_pairs = idx_bands.map_batches(_probe, batch_format="pyarrow")
    else:
        # co-partition plan: tag-union both band tables, coarse-bucket
        # on band_key, cross-side pairs per band run — vectorized over
        # ALL runs of a bucket at once (P Python calls total).
        def _tag(side_val: int):
            def _t(b: pa.Table) -> pa.Table:
                return pa.Table.from_pydict(
                    {"band_key": b.column("band_key"),
                     "_id": b.column(id_col),
                     "_side": pa.array(
                         np.full(b.num_rows, side_val, np.int8))})

            return _t

        tagged = idx_bands.map_batches(
            _tag(0), batch_format="pyarrow").union(
            new_bands.map_batches(_tag(1), batch_format="pyarrow"))

        def _cross_bucket(t: pa.Table, starts: np.ndarray,
                          counts: np.ndarray) -> pa.Table:
            z = pa.array([], pa.int64())
            if t.num_rows == 0:
                return pa.Table.from_pydict({"id_a": z, "id_b": z})
            side = t.column("_side").combine_chunks().to_numpy(
                zero_copy_only=False)
            ids = t.column("_id").combine_chunks().to_numpy(
                zero_copy_only=False)
            c_cnt = np.add.reduceat((side == 0).astype(np.int64), starts)
            n_cnt = counts - c_cnt
            act = (c_cnt > 0) & (n_cnt > 0)
            if not act.any():
                return pa.Table.from_pydict({"id_a": z, "id_b": z})
            s, c, nn = starts[act], c_cnt[act], n_cnt[act]
            if max_bucket_docs is not None:
                star = c > max_bucket_docs
            else:
                star = np.zeros(len(s), dtype=bool)
            # full runs: every (new j, corpus i) pair
            fs, fc, fn_ = s[~star], c[~star], nn[~star]
            pair_cnt = fc * fn_
            total = int(pair_cnt.sum())
            ends = np.cumsum(pair_cnt)
            starts_p = ends - pair_cnt
            p = (np.arange(total, dtype=np.int64)
                 - np.repeat(starts_p, pair_cnt))
            run = np.repeat(np.arange(len(fs), dtype=np.int64), pair_cnt)
            i = p % np.maximum(fc, 1)[run]
            j = p // np.maximum(fc, 1)[run]
            a_full = ids[fs[run] + fc[run] + j]   # new side (sorted after corpus)
            b_full = ids[fs[run] + i]             # corpus side
            # star runs: each new id x the run's min corpus id (row 0
            # of the run — sort order is (_side asc, id asc))
            ss, sc, sn = s[star], c[star], nn[star]
            a_star = ids[np.repeat(ss + sc, sn)
                         + _seg_arange(sn)] if len(ss) else \
                np.empty(0, np.int64)
            b_star = np.repeat(ids[ss], sn) if len(ss) else \
                np.empty(0, np.int64)
            return pa.Table.from_pydict(
                {"id_a": pa.array(np.concatenate([a_full, a_star]),
                                  pa.int64()),
                 "id_b": pa.array(np.concatenate([b_full, b_star]),
                                  pa.int64())})

        from raydoc.ops.bucketing import bucketed_sorted_apply

        raw_pairs = bucketed_sorted_apply(
            tagged, ["band_key"],
            [("band_key", "ascending"), ("_side", "ascending"),
             ("_id", "ascending")],
            _cross_bucket, num_partitions=num_partitions)

    candidates = _distinct_pairs(raw_pairs,
                                 num_partitions=num_partitions).materialize()

    # verify: attach both sides' signatures by co-partitioned id and
    # estimate in one vectorized compare per batch. Corpus signatures
    # come from the INDEX, pruned to candidate ids (never the corpus).
    from raydoc.ops.relational import distinct_on, semi_join

    sig_t = pa.list_(pa.uint64())

    def _side_ids(col):
        def _ids(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {id_col: pc.unique(b.column(col).combine_chunks())})

        return _ids

    cand_corpus_ids = distinct_on(
        candidates.map_batches(_side_ids("id_b"), batch_format="pyarrow"),
        id_col, bucketed=True)
    corpus_sigs = semi_join(
        rd.read_parquet(os.path.join(index_dir, "sigs")),
        cand_corpus_ids, id_col, id_col).materialize()
    cand_new_ids = distinct_on(
        candidates.map_batches(_side_ids("id_a"), batch_format="pyarrow"),
        id_col, bucketed=True)
    new_cand_sigs = semi_join(new_sigs, cand_new_ids, id_col,
                              id_col).materialize()

    # fast path (late r05): both sig sets are candidate-PRUNED, so
    # under a byte cap they broadcast — the verify becomes one
    # streaming pass over the candidate pairs with searchsorted id
    # resolution + the chunked pair-compare kernel, skipping BOTH
    # pair shuffles (the two Sorts were ~70% of the probe wall in the
    # 20k-vs-200k profile: 15.0 s -> see BASELINE). The double
    # shuffle-attach below stays as the scale path for candidate sets
    # whose pruned sigs exceed a worker-heap-safe broadcast.
    if ((new_cand_sigs.size_bytes() or 0)
            + (corpus_sigs.size_bytes() or 0)
            <= _VERIFY_BROADCAST_BYTES_CAP):
        from raydoc.util import cpu_cap

        num_perm = meta["num_perm"]
        refs_a = list(new_cand_sigs.to_arrow_refs())
        refs_b = list(corpus_sigs.to_arrow_refs())

        class _EstimateBcast:
            # actor pool, like dedup.py's broadcast _Estimate: both
            # sides load ONCE per actor (bounded processes), batches
            # resolve ids by searchsorted and run the chunked
            # pair-compare kernel over one stacked matrix
            def __init__(self, ra, rb) -> None:
                from raydoc.util import embedding_matrix

                def _side(refs):
                    tbls = [t for t in ray.get(list(refs)) if t.num_rows]
                    if not tbls:
                        return (np.empty(0, np.int64),
                                np.empty((0, num_perm), np.uint64))
                    t = pa.concat_tables(tbls)
                    ids = t.column(id_col).combine_chunks().to_numpy(
                        zero_copy_only=False)
                    mat = embedding_matrix(t.column("sig"),
                                           dtype=np.uint64)
                    order = np.argsort(ids, kind="stable")
                    return ids[order], mat[order]

                self.ia, ma = _side(ra)
                self.ib, mb = _side(rb)
                # one stacked matrix so the chunked pair kernel
                # gathers both sides from a single array (corpus rows
                # offset by len(ia))
                self.mat = np.vstack([ma, mb])

            def __call__(self, bt: pa.Table) -> pa.Table:
                from raydoc.ops.bucketing import pair_match_fraction

                z = pa.array([], pa.int64())
                empty = pa.Table.from_pydict(
                    {"id_new": z, "id_corpus": z,
                     "est_jaccard": pa.array([], pa.float64())})
                if (bt.num_rows == 0 or len(self.ia) == 0
                        or len(self.ib) == 0):
                    return empty
                va = bt.column("id_a").combine_chunks().to_numpy(
                    zero_copy_only=False)
                vb = bt.column("id_b").combine_chunks().to_numpy(
                    zero_copy_only=False)
                ia, ib = self.ia, self.ib
                pa_pos = np.minimum(np.searchsorted(ia, va), len(ia) - 1)
                pb_pos = np.minimum(np.searchsorted(ib, vb), len(ib) - 1)
                ok = (ia[pa_pos] == va) & (ib[pb_pos] == vb)
                est = pair_match_fraction(self.mat, pa_pos,
                                          pb_pos + len(ia))
                keep = ok & (est >= threshold)
                return pa.Table.from_pydict(
                    {"id_new": pa.array(va[keep], pa.int64()),
                     "id_corpus": pa.array(vb[keep], pa.int64()),
                     "est_jaccard": pa.array(est[keep], pa.float64())})

        return candidates.map_batches(
            _EstimateBcast, fn_constructor_args=(refs_a, refs_b),
            batch_format="pyarrow", concurrency=(1, cpu_cap()))

    withA = _attach_pair_values(candidates, new_cand_sigs, id_col,
                                "sig", "a", {}, sig_t,
                                num_partitions=num_partitions)
    withB = _attach_pair_values(withA, corpus_sigs, id_col, "sig", "b",
                                {"sig_a": sig_t}, sig_t,
                                num_partitions=num_partitions)

    def _estimate(bt: pa.Table) -> pa.Table:
        from raydoc.util import embedding_matrix

        bt = bt.filter(pc.and_(pc.is_valid(bt.column("sig_a")),
                               pc.is_valid(bt.column("sig_b"))))
        z = pa.array([], pa.int64())
        if bt.num_rows == 0:
            return pa.Table.from_pydict(
                {"id_new": z, "id_corpus": z,
                 "est_jaccard": pa.array([], pa.float64())})
        sa = embedding_matrix(bt.column("sig_a"), dtype=np.uint64)
        sb = embedding_matrix(bt.column("sig_b"), dtype=np.uint64)
        eq = sa == sb
        est = eq.sum(axis=1) / eq.shape[1]
        keep = est >= threshold
        mask = pa.array(keep)
        return pa.Table.from_pydict(
            {"id_new": bt.column("id_a").filter(mask).combine_chunks(),
             "id_corpus": bt.column("id_b").filter(mask).combine_chunks(),
             "est_jaccard": pa.array(est[keep], pa.float64())})

    return withB.map_batches(_estimate, batch_format="pyarrow")


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts,
                                                        counts)


def compact_index(index_dir: str, target_rows_per_file: int = 2_000_000,
                  ) -> dict:
    """Rewrite each index component's accumulated small Parquet files
    (one set per append) into ~``target_rows_per_file``-row files.

    Crash-safe by idempotence, like the manifest-ledger compaction
    (state/manifest.py): the compacted files are written into the SAME
    directory under fresh task-unique names FIRST, then the old files
    are deleted — a crash between the two steps leaves duplicate rows,
    which every consumer tolerates (duplicate band rows produce
    duplicate candidate pairs that ``_distinct_pairs`` collapses;
    duplicate sig/md5 rows attach identical values / keep the same
    min id). Single concurrent writer assumed, as everywhere in the
    index lifecycle. Returns {component: (files_before, files_after)}.
    """
    import glob

    import ray.data as rd

    report = {}
    comps = [("sigs", os.path.join(index_dir, "sigs")),
             ("bands", os.path.join(index_dir, "bands")),
             ("exact", os.path.join(index_dir, "exact"))]
    # semantic members are hive-partitioned (sem_members/bucket=N/);
    # compact each bucket dir independently — duplicate member rows
    # from a crash mid-compaction yield duplicate (identical) pair
    # rows, which the victim semi-join collapses like everywhere else
    mdir = os.path.join(index_dir, "sem_members")
    if os.path.isdir(mdir):
        comps.extend(
            (f"sem_members/{b}", os.path.join(mdir, b))
            for b in sorted(os.listdir(mdir))
            if os.path.isdir(os.path.join(mdir, b)))
    for comp, d in comps:
        if not os.path.isdir(d):
            continue
        old = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if len(old) <= 1:
            report[comp] = (len(old), len(old))
            continue
        # read the EXPLICIT old-file list, not the directory: the
        # write lands new files into the same dir, and a dir-scoped
        # read must never risk picking them up mid-execution
        ds = rd.read_parquet(old)
        n = ds.count()
        k = max(1, -(-n // target_rows_per_file))
        ds.repartition(k).write_parquet(d)  # fresh unique names
        for f in old:
            os.remove(f)
        report[comp] = (len(old),
                        len(glob.glob(os.path.join(d, "*.parquet"))))
    return report


# --------------------------------------------------------------------------
# exact component: persisted md5 index (recrawl dedup without paying
# for minhash when a pipeline only wants exact semantics). Shares the
# same index_dir as the near-dup component (separate subdir + commit
# marker), so one directory can carry both.


def _exact_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_meta_exact.json")


def read_exact_meta(index_dir: str) -> dict:
    with open(_exact_meta_path(index_dir)) as f:
        meta = json.load(f)
    if meta.get("version") != EXACT_VERSION:
        raise ValueError(
            f"exact index at {index_dir} has version "
            f"{meta.get('version')!r}, this build reads {EXACT_VERSION!r}")
    return meta


def _md5_rows(text_col: str, id_col: str):
    """map_batches UDF: (id, text) -> (id, text_md5 fixed16). md5 of
    the raw text bytes (null -> ""), the same key exact_dedup groups
    on — 16 B/doc persisted, content-defined and library-version-
    independent."""
    import hashlib

    def _rows(b: pa.Table) -> pa.Table:
        digests = [hashlib.md5((t or "").encode()).digest()
                   for t in b.column(text_col).to_pylist()]
        return pa.Table.from_pydict(
            {id_col: b.column(id_col),
             "text_md5": pa.array(digests, pa.binary(16))})

    return _rows


def _write_exact_rows(ds, index_dir: str, *, text_col: str,
                      id_col: str) -> None:
    d = os.path.join(index_dir, "exact")
    os.makedirs(d, exist_ok=True)
    ds.map_batches(_md5_rows(text_col, id_col),
                   batch_format="pyarrow").write_parquet(d)


def write_exact_index(ds, index_dir: str, *, text_col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """Persist (doc_id, md5(text)) for the corpus. Fails if an exact
    component is already committed (use ``append_exact_index``)."""
    if os.path.exists(_exact_meta_path(index_dir)):
        raise FileExistsError(
            f"exact index already committed at {index_dir}; use "
            "append_exact_index to add a batch")
    _write_exact_rows(ds, index_dir, text_col=text_col, id_col=id_col)
    meta = {"version": EXACT_VERSION, "id_col": id_col,
            "hash_rule": "md5(utf8 text bytes), null -> empty"}
    tmp = _exact_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _exact_meta_path(index_dir))
    return meta


def append_exact_index(ds, index_dir: str, *, text_col: str = "text",
                       id_col: str = "doc_id") -> dict:
    meta = read_exact_meta(index_dir)
    _write_exact_rows(ds, index_dir, text_col=text_col, id_col=id_col)
    return meta


def incremental_exact_dedup(
    new_ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    update_index: bool = False,
):
    """Drop new-batch docs whose text EXACTLY matches an indexed doc.

    Returns ``(kept_new_ds, victims_ds)`` where victims has columns
    ``(id_new, id_corpus)`` — ``id_corpus`` is the MINIMUM matching
    corpus id (deterministic when the corpus itself carried dups).

    Shape at scale: the new batch's md5 set is broadcast via
    ``semi_join`` and the CORPUS INDEX is streamed against it (the
    corpus is never shuffled); the matched corpus rows — at most
    new-batch-sized — come back as object-store refs and one pass over
    the new batch marks victims with a vectorized ``pc.index_in``.
    """
    import ray
    import ray.data as rd

    read_exact_meta(index_dir)
    from raydoc.ops.relational import (
        _bcast_cached,
        distinct_on,
        semi_join,
    )

    new_h = new_ds.map_batches(_md5_rows(text_col, id_col),
                               batch_format="pyarrow").materialize()
    idx = rd.read_parquet(os.path.join(index_dir, "exact"))
    # corpus rows whose hash appears in the new batch (new side is the
    # broadcast side — semi_join broadcasts its RIGHT argument)
    matched = semi_join(idx, new_h.select_columns(["text_md5"]),
                        "text_md5", "text_md5")
    matched_min = distinct_on(matched, "text_md5", keep="min",
                              order_col=id_col,
                              bucketed=True).materialize()
    refs = list(matched_min.to_arrow_refs())
    cache_key = tuple(r.hex() for r in refs) + (id_col, "incr_exact")

    def _load():
        tbls = [t for t in ray.get(list(refs)) if t.num_rows]
        if not tbls:
            return None
        t = pa.concat_tables(tbls)
        return (t.column("text_md5").combine_chunks(),
                t.column(id_col).combine_chunks())

    def _victims(b: pa.Table) -> pa.Table:
        z = pa.array([], pa.int64())
        loaded = _bcast_cached(cache_key, _load)
        if b.num_rows == 0 or loaded is None:
            return pa.Table.from_pydict({"id_new": z, "id_corpus": z})
        md5s, corpus_ids = loaded
        pos = pc.index_in(b.column("text_md5").combine_chunks(),
                          value_set=md5s)
        hit = pc.is_valid(pos)
        return pa.Table.from_pydict(
            {"id_new": b.column(id_col).filter(hit).combine_chunks(),
             "id_corpus": corpus_ids.take(pos.filter(hit))})

    victims = new_h.map_batches(_victims,
                                batch_format="pyarrow").materialize()
    kept = semi_join(new_ds, victims.select_columns(["id_new"]),
                     id_col, "id_new", anti=True)
    if update_index:
        append_exact_index(kept, index_dir, text_col=text_col,
                           id_col=id_col)
    return kept, victims


def incremental_dedup(
    new_ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket_docs: int | None = None,
    update_index: bool = False,
    broadcast_cap: int = _BROADCAST_BAND_ROWS_CAP,
    num_partitions: int | None = None,
):
    """Drop new-batch docs that near-duplicate the indexed corpus
    (the corpus always wins — it is already committed). Returns
    ``(kept_new_ds, pairs_ds)``. ``update_index=True`` appends the
    KEPT docs' signatures/bands to the index, so the next batch
    dedups against corpus + this batch in one probe.

    Within-batch near-dups are deliberately out of scope here — run
    ``minhash_lsh_pairs``/``curate_documents`` on the batch first;
    composing the two keeps each job's shuffle payload slim."""
    from raydoc.ops.relational import semi_join

    pairs = incremental_near_dup_pairs(
        new_ds, index_dir, text_col=text_col, id_col=id_col,
        threshold=threshold, max_bucket_docs=max_bucket_docs,
        broadcast_cap=broadcast_cap, num_partitions=num_partitions,
    ).materialize()  # duplicate-rate-sized, reused for victims + return
    victims = pairs.select_columns(["id_new"])
    kept = semi_join(new_ds, victims, id_col, "id_new", anti=True)
    if update_index:
        append_neardup_index(kept, index_dir, text_col=text_col,
                             id_col=id_col)
    return kept, pairs


# --------------------------------------------------------------------------
# SEMANTIC component: incremental SemDeDup vs a persisted centroid+member
# index (ops/cluster.py is the batch form; this is the continuous-crawl
# form — the corpus is clustered ONCE, its centroids and cell-tagged
# embeddings live as Parquet, and each new batch is assigned alone and
# verified against only its touched cells). Shares index_dir with the
# minhash/exact components (subdirs sem_centroids/ + sem_members/,
# commit marker _meta_semantic.json), so one directory can carry all
# three probes of a rolling crawl.

SEMANTIC_VERSION = "semantic_cell_v1"
# hive partition key for member rows: bucket = cluster % _SEM_BUCKETS.
# A probe reads ONLY the buckets its new batch touches (<= 256 dirs) —
# the cell-pruned read that keeps probe cost proportional to the new
# batch's cell footprint, not the corpus.
_SEM_BUCKETS = 256


def _semantic_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_meta_semantic.json")


def read_semantic_meta(index_dir: str) -> dict:
    with open(_semantic_meta_path(index_dir)) as f:
        meta = json.load(f)
    if meta.get("version") != SEMANTIC_VERSION:
        raise ValueError(
            f"semantic index at {index_dir} has version "
            f"{meta.get('version')!r}, this build reads "
            f"{SEMANTIC_VERSION!r}")
    return meta


def _load_sem_centroids(index_dir: str):
    import pyarrow.parquet as pq

    from raydoc.util import embedding_matrix

    t = pq.read_table(os.path.join(index_dir, "sem_centroids",
                                   "centroids.parquet"))
    t = t.take(pc.sort_indices(t.column("cluster")))
    labels = t.column("cluster").to_numpy(zero_copy_only=False)
    cent = embedding_matrix(t.column("centroid"))
    return labels.astype(np.int64), cent.astype(np.float64)


def _sem_tag_rows(cent_ref, id_col: str, emb_col: str,
                  n_probe: int = 1):
    """map_batches UDF: assign each row to its nearest persisted
    centroid (broadcast once via ray.put) and emit slim member rows
    (bucket, cluster, id, embedding) — the index row format AND the
    probe's new-side format. ``n_probe > 1`` (probe side only) emits
    each row once per its n_probe nearest cells — a (new, corpus)
    pair still appears at most once, because the corpus member lives
    in exactly one cell."""

    def _rows(b: pa.Table) -> pa.Table:
        import ray as _r

        from raydoc.ops.cluster import (_cosine_argmax, _cosine_topk,
                                        _unit_safe_norms)
        from raydoc.util import embedding_matrix

        lab, c, cn = _r.get(cent_ref)
        if b.num_rows == 0:
            cl = np.empty(0, np.int64)
            take = None
        elif n_probe <= 1:
            embs = embedding_matrix(b.column(emb_col)).astype(
                np.float64, copy=False)
            cl = lab[_cosine_argmax(embs, c, cn)]
            take = None
        else:
            embs = embedding_matrix(b.column(emb_col)).astype(
                np.float64, copy=False)
            tk = _cosine_topk(embs, c, cn, n_probe)   # (n, p)
            cl = lab[tk.ravel()]
            take = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                             tk.shape[1])
        ids = b.column(id_col)
        emb = b.column(emb_col)
        if take is not None:
            idx = pa.array(take, pa.int64())
            ids = ids.combine_chunks().take(idx)
            emb = emb.combine_chunks().take(idx)
        return pa.Table.from_arrays(
            [pa.array(cl % _SEM_BUCKETS, pa.int64()),
             pa.array(cl, pa.int64()), ids, emb],
            names=["bucket", "cluster", id_col, emb_col])

    return _rows


def _write_sem_members(ds, index_dir: str, cent_ref, *, id_col: str,
                       emb_col: str) -> None:
    d = os.path.join(index_dir, "sem_members")
    os.makedirs(d, exist_ok=True)
    ds.map_batches(_sem_tag_rows(cent_ref, id_col, emb_col),
                   batch_format="pyarrow").write_parquet(
        d, partition_cols=["bucket"])


def write_semantic_index(ds, index_dir: str, *, init_ids=None,
                         init_centroids=None, id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         n_updates: int = 1) -> dict:
    """Cluster the corpus (ops/cluster.py kmeans_fit) and persist the
    centroids plus cell-tagged member embeddings. Fails if a semantic
    component is already committed (use ``append_semantic_index``).
    ``_meta_semantic.json`` is written LAST via tmp+rename — a killed
    build leaves no committed marker and is simply rebuilt."""
    import ray
    import pyarrow.parquet as pq

    from raydoc.ops.cluster import _unit_safe_norms, kmeans_fit

    if os.path.exists(_semantic_meta_path(index_dir)):
        raise FileExistsError(
            f"semantic index already committed at {index_dir}; use "
            "append_semantic_index to add a batch")
    labels, cent = kmeans_fit(ds, init_ids, id_col=id_col,
                              emb_col=emb_col, n_updates=n_updates,
                              init_centroids=init_centroids)
    cdir = os.path.join(index_dir, "sem_centroids")
    os.makedirs(cdir, exist_ok=True)
    dim = cent.shape[1]
    flat = pa.array(cent.ravel(), pa.float64())
    offs = pa.array(np.arange(0, (len(labels) + 1) * dim, dim,
                              dtype=np.int64).astype(np.int32))
    pq.write_table(
        pa.table({"cluster": pa.array(labels, pa.int64()),
                  "centroid": pa.ListArray.from_arrays(offs, flat)}),
        os.path.join(cdir, "centroids.parquet"))
    cent_ref = ray.put((labels, cent, _unit_safe_norms(cent)))
    _write_sem_members(ds, index_dir, cent_ref, id_col=id_col,
                       emb_col=emb_col)
    meta = {
        "version": SEMANTIC_VERSION,
        "id_col": id_col,
        "emb_col": emb_col,
        "k": int(len(labels)),
        "dim": int(dim),
        "buckets": _SEM_BUCKETS,
        # determinism rule shared with ops/cluster.py: float64 argmax
        # cosine, first-max tie -> lowest label; centroids are frozen
        # at index build — appends and probes assign against THESE
        "assign_rule": "float64 argmax cosine vs persisted centroids",
    }
    tmp = _semantic_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _semantic_meta_path(index_dir))
    return meta


def append_semantic_index(ds, index_dir: str) -> dict:
    """Add a batch's member rows, assigned against the PERSISTED
    centroids (no refit — a batch assigned under different centroids
    would land in different cells and silently never match, so the
    parameters are not even accepted here)."""
    import ray

    from raydoc.ops.cluster import _unit_safe_norms

    meta = read_semantic_meta(index_dir)
    labels, cent = _load_sem_centroids(index_dir)
    cent_ref = ray.put((labels, cent, _unit_safe_norms(cent)))
    _write_sem_members(ds, index_dir, cent_ref,
                       id_col=meta["id_col"], emb_col=meta["emb_col"])
    return meta


def incremental_semantic_pairs(new_ds, index_dir: str, *,
                               threshold: float = 0.9,
                               n_probe: int = 1,
                               num_partitions: int | None = None,
                               max_key_rows: int | None = None):
    """Semantic near-dup pairs between a NEW batch and the indexed
    corpus: assign the new batch to the persisted cells, read ONLY the
    member buckets it touches (hive-pruned Parquet read), co-partition
    both sides on cluster, and verify exact cosine CROSS-SIDE per cell.

    Output Dataset: ``(id_new, id_corpus, cosine)`` — one row per
    cross pair with cosine >= ``threshold`` (at most once — a corpus
    member lives in exactly one cell, whatever ``n_probe``).
    ``n_probe``: probe each NEW row's n nearest cells instead of only
    the argmax cell — single-cell assignment misses cross-boundary
    neighbors below ~0.99 cosine, and multi-probing only the new side
    costs n_probe x the (small) batch, never the corpus. No star
    capping here:
    a semantic cell holds mostly NON-duplicates, where star pairing
    loses recall (the measured ops/cluster.py lesson) — an oversized
    cell fails loudly via ``max_key_rows`` instead; fix cell size
    with k at index build."""
    import ray
    import ray.data as rd

    from raydoc.ops.bucketing import bucketed_sorted_apply, pair_cosine
    from raydoc.ops.cluster import _unit_safe_norms
    from raydoc.util import embedding_matrix

    meta = read_semantic_meta(index_dir)
    id_col, emb_col = meta["id_col"], meta["emb_col"]
    labels, cent = _load_sem_centroids(index_dir)
    cent_ref = ray.put((labels, cent, _unit_safe_norms(cent)))

    new_tagged = new_ds.map_batches(
        _sem_tag_rows(cent_ref, id_col, emb_col, n_probe=n_probe),
        batch_format="pyarrow").materialize()  # slim: reused twice

    touched = sorted(new_tagged.unique("bucket"))
    mdir = os.path.join(index_dir, "sem_members")
    # hive-pruned read: only the touched buckets' files (a bucket with
    # no corpus members simply has no directory). The partition column
    # itself is stripped by the hive layout; cluster rides in-file.
    paths = []
    for b in touched:
        d = os.path.join(mdir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        z = pa.array([], pa.int64())
        return rd.from_arrow(pa.table({
            "id_new": z, "id_corpus": z,
            "cosine": pa.array([], pa.float64())}))
    corpus = rd.read_parquet(paths)

    def _tag(side_val: int):
        def _t(b: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [b.column("cluster"), b.column(id_col),
                 b.column(emb_col),
                 pa.array(np.full(b.num_rows, side_val, np.int8))],
                names=["cluster", "_id", "_emb", "_side"])

        return _t

    tagged = corpus.map_batches(
        _tag(0), batch_format="pyarrow").union(
        new_tagged.map_batches(_tag(1), batch_format="pyarrow"))

    def _cross_cell(t: pa.Table, starts: np.ndarray,
                    counts: np.ndarray) -> pa.Table:
        z = pa.array([], pa.int64())
        empty = pa.table({"id_new": z, "id_corpus": z,
                          "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        side = t.column("_side").combine_chunks().to_numpy(
            zero_copy_only=False)
        c_cnt = np.add.reduceat((side == 0).astype(np.int64), starts)
        n_cnt = counts - c_cnt
        act = (c_cnt > 0) & (n_cnt > 0)
        if not act.any():
            return empty
        s, c, nn = starts[act], c_cnt[act], n_cnt[act]
        pair_cnt = c * nn
        total = int(pair_cnt.sum())
        ends = np.cumsum(pair_cnt)
        p = (np.arange(total, dtype=np.int64)
             - np.repeat(ends - pair_cnt, pair_cnt))
        run = np.repeat(np.arange(len(s), dtype=np.int64), pair_cnt)
        i = p % c[run]                      # corpus index in run
        j = p // c[run]                     # new index in run
        bi = s[run] + i                     # corpus rows sort first
        ai = s[run] + c[run] + j            # then new rows
        embs = embedding_matrix(t.column("_emb")).astype(
            np.float64, copy=False)
        unit = embs / _unit_safe_norms(embs)[:, None]
        cs = pair_cosine(unit, ai, bi)
        ids = t.column("_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = cs >= threshold
        return pa.table({
            "id_new": pa.array(ids[ai[keep]], pa.int64()),
            "id_corpus": pa.array(ids[bi[keep]], pa.int64()),
            "cosine": pa.array(cs[keep], pa.float64())})

    return bucketed_sorted_apply(
        tagged, ["cluster"],
        [("cluster", "ascending"), ("_side", "ascending"),
         ("_id", "ascending")],
        _cross_cell, num_partitions=num_partitions,
        max_key_rows=max_key_rows)


def incremental_semantic_dedup(new_ds, index_dir: str, *,
                               threshold: float = 0.9,
                               n_probe: int = 1,
                               update_index: bool = False,
                               num_partitions: int | None = None,
                               max_key_rows: int | None = None):
    """Drop new-batch rows that semantically duplicate the indexed
    corpus (the corpus always wins — it is already committed).
    Returns ``(kept_new_ds, pairs_ds)``. ``update_index=True``
    appends the KEPT rows' member records, so the next batch dedups
    against corpus + this batch in one probe."""
    from raydoc.ops.relational import semi_join

    meta = read_semantic_meta(index_dir)
    pairs = incremental_semantic_pairs(
        new_ds, index_dir, threshold=threshold, n_probe=n_probe,
        num_partitions=num_partitions,
        max_key_rows=max_key_rows).materialize()
    victims = pairs.select_columns(["id_new"])
    kept = semi_join(new_ds, victims, meta["id_col"], "id_new",
                     anti=True)
    if update_index:
        append_semantic_index(kept, index_dir)
    return kept, pairs
