"""Incremental near-dup dedup against a persisted band index
(ops/incremental.py): index round-trip, append, plan parity, the
star-pair cap, victim removal, and the fail-loud parameter pins."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from raydoc.ops.incremental import (
    append_neardup_index,
    incremental_dedup,
    incremental_near_dup_pairs,
    read_index_meta,
    write_neardup_index,
)

BOILER = ("mass duplicated boilerplate navigation footer text repeated "
          "across every page of the site")


def _corpus_table() -> pa.Table:
    uniq = [
        f"unique corpus document number {i} about topic {i * 7} with "
        f"words {i * 13} and {i * 29} plus filler {i * 31}"
        for i in range(10)
    ]
    return pa.table({
        "doc_id": list(range(16)),
        "text": [BOILER] * 4 + uniq + ["", " "],  # 14/15: no tokens
    })


def _pairs_set(ds) -> set[tuple[int, int]]:
    t = ds.to_pandas()
    return set(map(tuple, t[["id_new", "id_corpus"]].values.tolist()))


@pytest.fixture()
def index_dir(tmp_path, ray_session):
    import ray.data as rd

    d = str(tmp_path / "idx")
    write_neardup_index(rd.from_arrow(_corpus_table()), d)
    return d


class TestIndexLifecycle:
    def test_layout_and_meta(self, index_dir):
        meta = read_index_meta(index_dir)
        assert meta["num_perm"] == 64 and meta["bands"] == 16
        assert meta["rows_per_band"] == 4
        assert os.path.isdir(os.path.join(index_dir, "sigs"))
        assert os.path.isdir(os.path.join(index_dir, "bands"))
        import pyarrow.parquet as pq

        sigs = pq.read_table(os.path.join(index_dir, "sigs"))
        assert sigs.num_rows == 16  # every doc gets a signature row
        bands = pq.read_table(os.path.join(index_dir, "bands"))
        # empty/whitespace docs are NOT banded (no shingles)
        assert bands.num_rows == 14 * 16
        assert bands.schema.field("band_key").type == pa.uint64()

    def test_write_refuses_committed_dir(self, index_dir, ray_session):
        import ray.data as rd

        with pytest.raises(FileExistsError):
            write_neardup_index(rd.from_arrow(_corpus_table()), index_dir)

    def test_version_pin_fails_loudly(self, index_dir):
        p = os.path.join(index_dir, "_meta.json")
        meta = json.load(open(p))
        meta["version"] = "minhash_band_v0"
        json.dump(meta, open(p, "w"))
        with pytest.raises(ValueError, match="version"):
            read_index_meta(index_dir)

    def test_bad_params_rejected(self, tmp_path, ray_session):
        import ray.data as rd

        with pytest.raises(ValueError, match="divisible"):
            write_neardup_index(rd.from_arrow(_corpus_table()),
                                str(tmp_path / "x"), num_perm=64, bands=15)


class TestPairs:
    def _new_batch(self) -> pa.Table:
        return pa.table({
            "doc_id": [900, 901, 902],
            "text": [
                BOILER,                              # dup of corpus 0-3
                _corpus_table().column("text")[7].as_py()
                + " extraword",                      # near-dup of corpus 7
                "totally fresh content about parquet shards and object "
                "store spilling behavior in the engine",
            ],
        })

    def test_broadcast_plan(self, index_dir, ray_session):
        import ray.data as rd

        pairs = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(self._new_batch()), index_dir, threshold=0.6))
        assert pairs == {(900, 0), (900, 1), (900, 2), (900, 3), (901, 7)}

    def test_shuffle_plan_parity(self, index_dir, ray_session):
        import ray.data as rd

        b = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(self._new_batch()), index_dir, threshold=0.6))
        s = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(self._new_batch()), index_dir, threshold=0.6,
            broadcast_cap=0))
        assert b == s

    def test_star_cap_preserves_victims(self, index_dir, ray_session):
        import ray.data as rd

        pairs = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(self._new_batch()), index_dir, threshold=0.6,
            max_bucket_docs=2))
        # boilerplate bucket (4 corpus docs > cap) collapses to the min
        # corpus id; the unique near-dup bucket is under the cap
        assert pairs == {(900, 0), (901, 7)}

    def test_empty_new_batch(self, index_dir, ray_session):
        import ray.data as rd

        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        out = incremental_near_dup_pairs(rd.from_arrow(empty), index_dir)
        assert out.count() == 0

    def test_no_tokens_new_doc_kept(self, index_dir, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": [1000], "text": [""]})
        kept, pairs = incremental_dedup(rd.from_arrow(t), index_dir)
        assert pairs.count() == 0
        assert kept.count() == 1


class TestDedupAndAppend:
    def test_dedup_and_index_update(self, index_dir, ray_session):
        import ray.data as rd

        fresh_text = ("totally fresh content about parquet shards and "
                      "object store spilling behavior in the engine")
        batch1 = pa.table({
            "doc_id": [900, 901],
            "text": [BOILER, fresh_text],
        })
        kept, pairs = incremental_dedup(
            rd.from_arrow(batch1), index_dir, threshold=0.6,
            update_index=True)
        assert sorted(kept.to_pandas()["doc_id"]) == [901]
        assert {p[0] for p in _pairs_set(pairs)} == {900}
        # batch 2: a clone of the KEPT doc 901 must now be caught by
        # the UPDATED index without re-reading either corpus or batch 1
        batch2 = pa.table({"doc_id": [950], "text": [fresh_text]})
        p2 = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(batch2), index_dir, threshold=0.6))
        assert p2 == {(950, 901)}

    def test_append_only_kept_docs(self, index_dir, ray_session):
        import ray.data as rd
        import pyarrow.parquet as pq

        before = pq.read_table(os.path.join(index_dir, "sigs")).num_rows
        batch = pa.table({"doc_id": [900], "text": [BOILER]})
        incremental_dedup(rd.from_arrow(batch), index_dir, threshold=0.6,
                          update_index=True)
        after = pq.read_table(os.path.join(index_dir, "sigs")).num_rows
        assert after == before  # the dup was dropped, nothing appended

    def test_plain_append(self, index_dir, ray_session):
        import ray.data as rd
        import pyarrow.parquet as pq

        meta = append_neardup_index(
            rd.from_arrow(pa.table({"doc_id": [77],
                                    "text": ["entirely new words here "
                                             "for the appended batch"]})),
            index_dir)
        assert meta["version"] == "minhash_band_v1"
        sigs = pq.read_table(os.path.join(index_dir, "sigs"))
        assert 77 in sigs.column("doc_id").to_pylist()


class TestAgainstBatchLsh:
    def test_matches_batch_mode_cross_pairs(self, index_dir, ray_session):
        """Pairs from the incremental probe == the cross-side subset of
        batch-mode minhash_lsh_pairs over corpus UNION new batch (the
        semantics the index exists to avoid recomputing)."""
        import ray.data as rd

        from raydoc.ops.dedup import minhash_lsh_pairs

        corpus = _corpus_table()
        new = pa.table({
            "doc_id": [900, 901],
            "text": [BOILER,
                     corpus.column("text")[9].as_py() + " tailword"],
        })
        inc = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(new), index_dir, threshold=0.6))
        both = rd.from_arrow(pa.concat_tables([corpus, new]))
        batch_pairs = minhash_lsh_pairs(both, threshold=0.6).to_pandas()
        cross = set()
        for a, b in batch_pairs[["id_a", "id_b"]].values.tolist():
            lo, hi = min(a, b), max(a, b)
            if hi >= 900 and lo < 900:
                cross.add((hi, lo))
        assert inc == cross


class TestExactComponent:
    def _index(self, tmp_path, ray_session):
        import ray.data as rd

        from raydoc.ops.incremental import write_exact_index

        d = str(tmp_path / "xidx")
        corpus = pa.table({
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma", "delta epsilon zeta",
                     "alpha beta gamma", ""],  # 0/2 exact twins; 3 empty
        })
        write_exact_index(rd.from_arrow(corpus), d)
        return d

    def test_victims_min_corpus_id_and_kept(self, tmp_path, ray_session):
        import ray.data as rd

        from raydoc.ops.incremental import incremental_exact_dedup

        d = self._index(tmp_path, ray_session)
        new = pa.table({
            "doc_id": [100, 101, 102, 103],
            "text": ["alpha beta gamma", "fresh totally new", "",
                     "delta epsilon zeta"],
        })
        kept, victims = incremental_exact_dedup(rd.from_arrow(new), d)
        assert sorted(kept.to_pandas()["doc_id"]) == [101]
        got = sorted(map(tuple, victims.to_pandas()[
            ["id_new", "id_corpus"]].values.tolist()))
        # twin text resolves to the MIN corpus id (0, not 2)
        assert got == [(100, 0), (102, 3), (103, 1)]

    def test_update_index_catches_next_batch(self, tmp_path, ray_session):
        import ray.data as rd

        from raydoc.ops.incremental import incremental_exact_dedup

        d = self._index(tmp_path, ray_session)
        b1 = pa.table({"doc_id": [100], "text": ["brand new content"]})
        incremental_exact_dedup(rd.from_arrow(b1), d, update_index=True)
        b2 = pa.table({"doc_id": [200], "text": ["brand new content"]})
        _, v2 = incremental_exact_dedup(rd.from_arrow(b2), d)
        assert sorted(map(tuple, v2.to_pandas()[
            ["id_new", "id_corpus"]].values.tolist())) == [(200, 100)]

    def test_coexists_with_neardup_component(self, tmp_path, ray_session):
        import ray.data as rd

        from raydoc.ops.incremental import (
            incremental_exact_dedup,
            incremental_near_dup_pairs,
            write_neardup_index,
        )

        d = self._index(tmp_path, ray_session)
        long_doc = ("one two three four five six seven eight nine ten "
                    "eleven twelve thirteen fourteen fifteen sixteen")
        write_neardup_index(
            rd.from_arrow(pa.table({"doc_id": [9], "text": [long_doc]})),
            d)
        new = pa.table({"doc_id": [500, 501],
                        "text": ["alpha beta gamma",
                                 long_doc + " seventeen"]})
        _, vex = incremental_exact_dedup(rd.from_arrow(new), d)
        assert vex.to_pandas()["id_new"].tolist() == [500]
        pnear = incremental_near_dup_pairs(rd.from_arrow(new), d,
                                           threshold=0.6)
        assert _pairs_set(pnear) == {(501, 9)}

    def test_commit_marker_and_version(self, tmp_path, ray_session):
        import ray.data as rd

        from raydoc.ops.incremental import (
            read_exact_meta,
            write_exact_index,
        )

        d = self._index(tmp_path, ray_session)
        with pytest.raises(FileExistsError):
            write_exact_index(
                rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]})), d)
        p = os.path.join(d, "_meta_exact.json")
        meta = json.load(open(p))
        meta["version"] = "exact_md5_v0"
        json.dump(meta, open(p, "w"))
        with pytest.raises(ValueError, match="version"):
            read_exact_meta(d)


class TestCrossRunComposition:
    def test_web_shards_cross_run_dedup(self, tmp_path, ray_session):
        """web_to_training_shards(corpus_index_dir=...): run 1 seeds
        the persisted index from its kept docs; run 2 over the SAME
        fetches drops everything as cross-corpus duplicates."""
        import ray.data as rd

        from raydoc.corpus import gen_row
        from raydoc.pipelines.training_data import web_to_training_shards

        rows = [gen_row(i) for i in range(25, 45)
                if gen_row(i)["html"] and i % 97 != 0]
        recs = [{"url": r["url"], "fetch_ts": k, "html": r["html"]}
                for k, r in enumerate(rows)]
        t = pa.Table.from_pylist(recs)
        idx = str(tmp_path / "corpus_idx")

        s1 = web_to_training_shards(
            rd.from_arrow(t).repartition(2), str(tmp_path / "run1"),
            near_dup_threshold=0.99, min_tokens=1, max_punct_ratio=1.0,
            corpus_index_dir=idx)
        assert s1["n_cross_corpus_dup"] == 0  # first run seeds
        assert s1["n_kept"] > 0
        assert os.path.exists(os.path.join(idx, "_meta.json"))

        s2 = web_to_training_shards(
            rd.from_arrow(t).repartition(2), str(tmp_path / "run2"),
            near_dup_threshold=0.99, min_tokens=1, max_punct_ratio=1.0,
            corpus_index_dir=idx)
        # identical content -> every run-2 doc is an exact (jaccard 1)
        # dup of a run-1 corpus doc: all dropped, nothing written
        assert s2["n_cross_corpus_dup"] == s1["n_kept"]
        assert s2["n_train"] + s2["n_val"] + s2["n_test"] == 0


class TestCompaction:
    def test_compact_preserves_results(self, tmp_path, ray_session):
        import glob

        import ray.data as rd

        from raydoc.ops.incremental import (
            append_neardup_index,
            append_exact_index,
            compact_index,
            incremental_near_dup_pairs,
            incremental_exact_dedup,
            write_exact_index,
        )

        d = str(tmp_path / "cidx")
        write_neardup_index(rd.from_arrow(_corpus_table()), d)
        write_exact_index(rd.from_arrow(_corpus_table()), d)
        for j in range(3):  # three appends -> many small files
            extra = pa.table({
                "doc_id": [700 + j],
                "text": [f"appended batch number {j} with its own "
                         f"distinct words w{j} x{j} y{j} z{j} plus "
                         f"padding tokens a{j} b{j} c{j} d{j}"]})
            append_neardup_index(rd.from_arrow(extra), d)
            append_exact_index(rd.from_arrow(extra), d)

        new = pa.table({
            "doc_id": [900, 901],
            "text": [BOILER,
                     "appended batch number 1 with its own distinct "
                     "words w1 x1 y1 z1 plus padding tokens a1 b1 c1 d1"],
        })
        before_near = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(new), d, threshold=0.6))
        _, bv = incremental_exact_dedup(rd.from_arrow(new), d)
        before_exact = sorted(map(tuple, bv.to_pandas()[
            ["id_new", "id_corpus"]].values.tolist()))

        report = compact_index(d)
        for comp in ("sigs", "bands", "exact"):
            nb, na = report[comp]
            assert nb > na  # actually compacted
            assert len(glob.glob(os.path.join(d, comp, "*.parquet"))) == na

        after_near = _pairs_set(incremental_near_dup_pairs(
            rd.from_arrow(new), d, threshold=0.6))
        _, av = incremental_exact_dedup(rd.from_arrow(new), d)
        after_exact = sorted(map(tuple, av.to_pandas()[
            ["id_new", "id_corpus"]].values.tolist()))
        assert after_near == before_near and before_near
        # 900 is an exact copy of corpus 0-3 (min id 0); 901 of the
        # appended batch-1 doc
        assert after_exact == before_exact == [(900, 0), (901, 701)]

    def test_crash_between_write_and_delete_tolerated(
            self, tmp_path, ray_session):
        """The documented crash state of compact_index — compacted
        files landed, old files NOT yet deleted, so every index row
        exists twice — must leave probe victims unchanged, and a
        recovery compaction over the doubled dir must too."""
        import glob
        import shutil

        import ray.data as rd

        from raydoc.ops.incremental import (
            append_exact_index,
            compact_index,
            incremental_exact_dedup,
            write_exact_index,
        )

        d = str(tmp_path / "kidx")
        write_neardup_index(rd.from_arrow(_corpus_table()), d)
        write_exact_index(rd.from_arrow(_corpus_table()), d)
        extra = pa.table({"doc_id": [700],
                          "text": ["appended doc with distinct words "
                                   "q7 r7 s7 t7 u7 v7 w7 x7"]})
        append_neardup_index(rd.from_arrow(extra), d)
        append_exact_index(rd.from_arrow(extra), d)

        new = pa.table({
            "doc_id": [900, 901],
            "text": [BOILER, "appended doc with distinct words "
                             "q7 r7 s7 t7 u7 v7 w7 x7"]})

        def _near():
            return _pairs_set(incremental_near_dup_pairs(
                rd.from_arrow(new), d, threshold=0.6))

        def _exact():
            _, v = incremental_exact_dedup(rd.from_arrow(new), d)
            return sorted(map(tuple, v.to_pandas()[
                ["id_new", "id_corpus"]].values.tolist()))

        base_near, base_exact = _near(), _exact()
        assert base_near and base_exact == [(900, 0), (901, 700)]

        # construct the crash state: stash the pre-compaction files,
        # compact, then restore the stashed "old" files alongside the
        # compacted ones — both generations now coexist in the dir
        stash = {}
        for comp in ("sigs", "bands", "exact"):
            cd = os.path.join(d, comp)
            stash[comp] = {os.path.basename(f): open(f, "rb").read()
                           for f in glob.glob(os.path.join(cd, "*.parquet"))}
        compact_index(d)
        for comp, files in stash.items():
            cd = os.path.join(d, comp)
            live = {os.path.basename(f)
                    for f in glob.glob(os.path.join(cd, "*.parquet"))}
            for name, payload in files.items():
                assert name not in live  # compaction used fresh names
                with open(os.path.join(cd, name), "wb") as fh:
                    fh.write(payload)

        assert _near() == base_near and _exact() == base_exact

        # recovery: a second compaction over the doubled dir converges
        # and the (still duplicated) rows keep producing the same result
        report = compact_index(d)
        for comp in ("sigs", "bands", "exact"):
            assert report[comp][1] <= report[comp][0]
        assert _near() == base_near and _exact() == base_exact


class TestSemanticComponent:
    """The k-means-cell component (incremental SemDeDup vs a persisted
    centroid + member index) — lifecycle, pruned probe, rolling
    append, coexistence with the other components."""

    def _vecs(self, n=60, dim=8, seed=3):
        rng = np.random.RandomState(seed)
        v = rng.standard_normal((n, dim))
        return v / np.linalg.norm(v, axis=1)[:, None]

    def _ds(self, vecs, ids=None):
        import ray.data as rd

        ids = list(range(len(vecs))) if ids is None else list(ids)
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32()))}))

    def test_lifecycle_and_rolling_append(self, tmp_path, ray_session):
        from raydoc.ops.incremental import (
            append_semantic_index,
            incremental_semantic_dedup,
            incremental_semantic_pairs,
            read_semantic_meta,
            write_semantic_index,
        )

        d = str(tmp_path / "semidx")
        vecs = self._vecs()
        meta = write_semantic_index(self._ds(vecs), d,
                                    init_ids=[0, 1, 2, 3])
        assert meta["k"] == 4 and read_semantic_meta(d)["dim"] == 8
        with pytest.raises(FileExistsError):
            write_semantic_index(self._ds(vecs), d, init_ids=[0, 1])

        # batch 1: clones of corpus 5/6 (victims) + one novel (kept)
        nov = self._vecs(1, seed=99)
        b1 = self._ds(np.vstack([vecs[5:7], nov]), [105, 106, 500])
        kept, pairs = incremental_semantic_dedup(b1, d, threshold=0.99,
                                                 update_index=True)
        got = sorted((r["id_new"], r["id_corpus"])
                     for r in pairs.take_all())
        assert got == [(105, 5), (106, 6)]
        assert sorted(r["vec_id"] for r in
                      kept.select_columns(["vec_id"]).take_all()) == [500]

        # batch 2 vs the UPDATED index: a clone of the appended novel
        # is now caught; corpus-clone still caught; fresh vector kept
        nov2 = self._vecs(1, seed=123)
        b2 = self._ds(np.vstack([nov, vecs[9:10], nov2]),
                      [600, 609, 777])
        kept2, pairs2 = incremental_semantic_dedup(b2, d,
                                                   threshold=0.99)
        assert sorted((r["id_new"], r["id_corpus"])
                      for r in pairs2.take_all()) == [(600, 500),
                                                      (609, 9)]
        assert sorted(r["vec_id"] for r in
                      kept2.select_columns(["vec_id"]).take_all()) \
            == [777]
        # probing never mutated the index without update_index
        assert sorted((r["id_new"], r["id_corpus"]) for r in
                      incremental_semantic_pairs(b2, d, threshold=0.99)
                      .take_all()) == [(600, 500), (609, 9)]

    def test_n_probe_full_equals_brute_force(self, tmp_path,
                                             ray_session):
        """n_probe = k (every cell probed) must equal exact
        brute-force cross pairs — pins the multi-probe machinery; and
        n_probe=1's pair set is a subset of it (single-cell assignment
        may miss cross-boundary neighbors, never invent pairs)."""
        from raydoc.ops.incremental import (
            incremental_semantic_pairs,
            write_semantic_index,
        )

        d = str(tmp_path / "probeidx")
        vecs = self._vecs(40, dim=6, seed=21)
        write_semantic_index(self._ds(vecs), d,
                             init_ids=[0, 1, 2, 3, 4, 5])
        newv = self._vecs(8, dim=6, seed=77)
        new = self._ds(newv, [1000 + i for i in range(8)])
        thr = 0.5  # low: catches genuinely cross-boundary neighbors

        def _pairs(n_probe):
            got = incremental_semantic_pairs(
                new, d, threshold=thr, n_probe=n_probe)
            return sorted((r["id_new"], r["id_corpus"])
                          for r in got.take_all())

        full = _pairs(6)
        # float32 storage: recompute like the engine (through float32)
        v32 = vecs.astype(np.float32).astype(np.float64)
        n32 = newv.astype(np.float32).astype(np.float64)
        u = v32 / np.linalg.norm(v32, axis=1)[:, None]
        un = n32 / np.linalg.norm(n32, axis=1)[:, None]
        brute = sorted(
            (1000 + i, j)
            for i in range(8) for j in range(40)
            if (un[i] @ u[j]) >= thr)
        assert full == brute and len(full) > 0
        one = _pairs(1)
        assert set(one) <= set(full)

    def test_append_refuses_uncommitted(self, tmp_path, ray_session):
        from raydoc.ops.incremental import append_semantic_index

        with pytest.raises(FileNotFoundError):
            append_semantic_index(self._ds(self._vecs(4)),
                                  str(tmp_path / "nope"))

    def test_component_coexistence(self, tmp_path, ray_session):
        """One index_dir carries minhash + exact + semantic markers."""
        import ray.data as rd

        from raydoc.ops.incremental import (
            read_exact_meta,
            read_index_meta,
            read_semantic_meta,
            write_exact_index,
            write_neardup_index,
            write_semantic_index,
        )

        d = str(tmp_path / "combined")
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(
                [f"alpha beta gamma delta epsilon zeta eta theta "
                 f"iota kappa doc{i}" for i in range(20)])}))
        write_neardup_index(docs, d)
        write_exact_index(docs, d)
        write_semantic_index(self._ds(self._vecs(20)), d,
                             init_ids=[0, 1])
        assert read_index_meta(d)["version"].startswith("minhash")
        assert read_exact_meta(d)["version"].startswith("exact")
        assert read_semantic_meta(d)["version"].startswith("semantic")

    def test_max_key_rows_fail_loud(self, tmp_path, ray_session):
        from raydoc.ops.incremental import (
            incremental_semantic_pairs,
            write_semantic_index,
        )

        d = str(tmp_path / "hotcell")
        vecs = self._vecs(30)
        write_semantic_index(self._ds(vecs), d, init_ids=[0])  # 1 cell
        with pytest.raises(Exception, match="max_key_rows|exceeds"):
            incremental_semantic_pairs(
                self._ds(self._vecs(3, seed=7), [900, 901, 902]), d,
                threshold=0.99, max_key_rows=10).take_all()
