"""Tests for PDF layout parsing (reading order, table structure) and
the spec runner."""

import pyarrow as pa
import pytest

from raydoc.extract.layout import LayoutModel, make_fake_pdf


class TestLayoutModel:
    def test_reading_order_matches_golden(self):
        model = LayoutModel()
        for doc_id in range(30):
            payload, golden = make_fake_pdf(doc_id)
            res = model.extract(payload)
            assert res["status"] == "ok"
            assert res["text"] == golden, f"doc {doc_id} reading order wrong"

    def test_spans_index_into_text(self):
        model = LayoutModel()
        payload, _ = make_fake_pdf(3)
        res = model.extract(payload)
        for sp in res["spans"]:
            seg = res["text"][sp["start"]:sp["end"]]
            assert seg and "\n" not in seg or sp["kind"] == "table"

    def test_table_structure_grid(self):
        model = LayoutModel()
        cells = [
            {"bbox": [200, 100, 280, 116], "kind": "cell", "text": "b1"},
            {"bbox": [36, 100, 120, 116], "kind": "cell", "text": "a1"},
            {"bbox": [36, 130, 120, 146], "kind": "cell", "text": "a2"},
            {"bbox": [200, 131, 280, 147], "kind": "cell", "text": "b2"},
        ]
        assert model.table_structure(cells) == "a1 | b1\na2 | b2"

    def test_real_codec_boundary(self):
        with pytest.raises(NotImplementedError):
            LayoutModel(codec="pdfminer")

    # --- r03 topologies: 3 columns, spans, table between paragraphs ---

    @staticmethod
    def _pdf(pages) -> bytes:
        import json as _json

        return b"FPDF" + _json.dumps(pages).encode()

    def test_three_column_reading_order(self):
        model = LayoutModel()
        cols = {"L": 36.0, "M": 216.0, "R": 416.0}
        blocks = []
        golden = []
        for tag in ("L", "M", "R"):
            x0 = cols[tag]
            for bi in range(2):
                blocks.append({"bbox": [x0, 60 + 40 * bi, x0 + 150,
                                        90 + 40 * bi],
                               "kind": "text", "text": f"{tag}{bi}"})
        golden = ["L0", "L1", "M0", "M1", "R0", "R1"]
        blocks = blocks[::-1]  # storage order reversed
        res = model.extract(self._pdf([blocks]))
        assert res["status"] == "ok"
        assert res["text"] == "\n".join(golden)

    def test_colspan_header_row(self):
        # full-width header cell spanning both columns reads as its own
        # row, once
        model = LayoutModel()
        cells = [
            {"bbox": [36, 100, 400, 116], "kind": "cell", "text": "HEADER"},
            {"bbox": [36, 130, 200, 146], "kind": "cell", "text": "a1"},
            {"bbox": [220, 130, 400, 146], "kind": "cell", "text": "b1"},
            {"bbox": [36, 160, 200, 176], "kind": "cell", "text": "a2"},
            {"bbox": [220, 160, 400, 176], "kind": "cell", "text": "b2"},
        ]
        assert model.table_structure(cells) == \
            "HEADER\na1 | b1\na2 | b2"

    def test_rowspan_cell_reads_in_its_top_row(self):
        # first-column cell spans two rows: it must read ONCE, in the
        # row it starts in (top-edge clustering; center-clustering
        # would orphan it between rows)
        model = LayoutModel()
        cells = [
            {"bbox": [36, 100, 200, 146], "kind": "cell", "text": "TALL"},
            {"bbox": [220, 100, 400, 116], "kind": "cell", "text": "b1"},
            {"bbox": [220, 130, 400, 146], "kind": "cell", "text": "b2"},
        ]
        assert model.table_structure(cells) == "TALL | b1\nb2"

    def test_table_between_paragraphs(self):
        # the table reads at its PAGE POSITION, not appended last
        model = LayoutModel()
        blocks = [
            {"bbox": [36, 60, 576, 90], "kind": "text", "text": "above"},
            {"bbox": [36, 120, 300, 136], "kind": "cell", "text": "a"},
            {"bbox": [320, 120, 576, 136], "kind": "cell", "text": "b"},
            {"bbox": [36, 180, 576, 210], "kind": "text", "text": "below"},
        ]
        res = model.extract(self._pdf([blocks]))
        assert res["text"] == "above\na | b\nbelow"

    def test_two_col_page_with_full_width_table_below(self):
        # columns resolve above the table; the table closes the page
        model = LayoutModel()
        blocks = [
            {"bbox": [36, 60, 280, 90], "kind": "text", "text": "L0"},
            {"bbox": [320, 60, 576, 90], "kind": "text", "text": "R0"},
            {"bbox": [36, 100, 280, 130], "kind": "text", "text": "L1"},
            {"bbox": [36, 640, 300, 656], "kind": "cell", "text": "c1"},
            {"bbox": [320, 640, 576, 656], "kind": "cell", "text": "c2"},
        ]
        res = model.extract(self._pdf([blocks[::-1]]))
        assert res["text"] == "L0\nL1\nR0\nc1 | c2"

    def test_garbage_payload_in_band_error(self):
        res = LayoutModel().extract(b"\x00\x01junk")
        assert res["status"] == "error" and res["text"] == ""


@pytest.mark.usefixtures("ray_session")
class TestLayoutStage:
    def test_pdf_stage_and_chunks(self):
        import ray.data as rd

        from raydoc.stages.layout_stage import PdfExtractStage

        rows = []
        for i in range(12):
            payload, golden = make_fake_pdf(i)
            rows.append({"url": f"pdf://{i}", "payload": payload, "golden": golden})
        ds = rd.from_items(rows).drop_columns(["golden"])
        out = ds.map_batches(
            PdfExtractStage, batch_size=4, concurrency=2, batch_format="pyarrow"
        ).to_pandas().set_index("url")
        for r in rows:
            assert out.loc[r["url"], "text"] == r["golden"]
            assert out.loc[r["url"], "status"] == "ok"

    def test_mixed_stage_dispatch(self):
        import ray.data as rd

        from raydoc.corpus import gen_row
        from raydoc.stages.layout_stage import MixedExtractStage

        pdf_payload, pdf_golden = make_fake_pdf(1)
        html_row = gen_row(5)
        ds = rd.from_items([
            {"url": "pdf://1", "payload": pdf_payload},
            {"url": html_row["url"], "payload": html_row["html"]},
        ])
        out = ds.map_batches(
            MixedExtractStage, batch_size=2, concurrency=2, batch_format="pyarrow"
        ).to_pandas().set_index("url")
        assert out.loc["pdf://1", "text"] == pdf_golden
        assert out.loc[html_row["url"], "status"] == "ok"
        assert len(out.loc[html_row["url"], "text"]) > 50


@pytest.mark.usefixtures("ray_session")
class TestSpecRunner:
    def test_validate_rejects_bad_spec(self):
        from raydoc.pipelines.spec import SpecError, validate_spec

        with pytest.raises(SpecError, match="unknown op"):
            validate_spec({"source": {"op": "read_parquet", "path": "x"},
                           "stages": [{"op": "nope"}]})
        with pytest.raises(SpecError, match="unknown predicate operator"):
            validate_spec({
                "source": {"op": "read_parquet", "path": "x"},
                "stages": [{"op": "filter",
                            "conditions": [{"column": "a", "operator": "~~"}]}],
            })
        with pytest.raises(SpecError, match="missing required param"):
            validate_spec({"source": {"op": "read_parquet", "path": "x"},
                           "stages": [{"op": "top_k", "key": "v"}]})

    def test_run_spec_chain(self, sf_dir):
        from raydoc.pipelines.spec import run_spec

        spec = {
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/orders.parquet",
                       "columns": ["o_orderkey", "o_totalprice",
                                   "o_orderpriority"]},
            "stages": [
                {"op": "filter", "conditions": [
                    {"column": "o_orderpriority", "operator": "contains",
                     "value": "URGENT"}]},
                {"op": "top_k", "key": "o_totalprice", "k": 5,
                 "tiebreak": "o_orderkey"},
                {"op": "select", "columns": ["o_orderkey", "o_totalprice"]},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas()
        assert len(out) == 5
        assert list(out["o_totalprice"]) == sorted(out["o_totalprice"], reverse=True)

    def test_run_spec_extract_pipeline(self, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.corpus import gen_rows
        from raydoc.pipelines.spec import run_spec

        src = str(tmp_path / "pages.parquet")
        pq.write_table(gen_rows(0, 40), src)
        spec = {
            "source": {"op": "read_parquet", "path": src,
                       "columns": ["url", "html"]},
            "stages": [{"op": "extract", "batch_size": 16},
                       {"op": "chunk_explode"}],
            "sink": {"op": "count"},
        }
        n = run_spec(spec)
        assert n > 40  # more chunks than docs

    def test_run_spec_window_and_semi_join(self, sf_dir):
        from raydoc.pipelines.spec import run_spec

        spec = {
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/events.parquet",
                       "columns": ["event_id", "ts", "user_id", "value"]},
            "stages": [
                {"op": "running_agg", "key_col": "user_id",
                 "order_cols": ["ts", "event_id"], "val_col": "value"},
                {"op": "semi_join_parquet",
                 "path": f"{sf_dir}/events.parquet",
                 "left_on": "event_id", "right_on": "event_id"},
                {"op": "group_rank", "key_col": "user_id",
                 "sort_col": "run_sum", "tiebreak": "event_id", "k": 1},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas()
        # one top-ranked row per user; run_sum is that user's max cumsum
        assert out["user_id"].is_unique
        assert (out["rn"] == 1).all()


@pytest.mark.usefixtures("ray_session")
class TestCodeExec:
    def test_sandbox_stage_contract(self):
        import pyarrow as pa

        from raydoc.ops.code_exec import SandboxCodeStage

        st = SandboxCodeStage(
            "def main(args):\n"
            "    if args['x'] < 0: raise ValueError('neg')\n"
            "    return args['x'] * 2",
            arguments=[{"name": "x", "column": "v"}],
        )
        out = st(pa.table({"v": [1, -1, 3]}))
        assert out.column("content").to_pylist()[0] == "2"
        assert out.column("content").to_pylist()[1] == "**Error**: neg"
        assert out.column("content").to_pylist()[2] == "6"

    def test_sandbox_fatal_script_and_lang_gate(self):
        import pyarrow as pa
        import pytest as _pt

        from raydoc.ops.code_exec import SandboxCodeStage

        st = SandboxCodeStage("this is not python",
                              arguments=[{"name": "x", "column": "v"}])
        out = st(pa.table({"v": [1, 2]}))
        assert all(c.startswith("**Error**: construct code request error")
                   for c in out.column("content").to_pylist())
        with _pt.raises(ValueError):
            SandboxCodeStage("def main(a): return 1", lang="nodejs")

    def test_udf_schema_coercion_and_registry(self):
        import pyarrow as pa
        import ray.data as rd

        from raydoc.ops.code_exec import code_udf, register_udf

        register_udf("double_v", lambda b: {
            "v2": [x * 2 for x in b.column("v").to_pylist()]})
        ds = rd.from_arrow(pa.table({"v": [1, 2, 3]}))
        out = code_udf(ds, "double_v",
                       output_schema={"v2": "float64"}).to_pandas()
        assert list(out["v2"]) == [2.0, 4.0, 6.0]

    def test_spec_code_and_udf_validation(self):
        from raydoc.pipelines.spec import SpecError, validate_spec

        base = {"source": {"op": "read_parquet", "path": "/tmp/x.parquet"}}
        import pytest as _pt

        with _pt.raises(SpecError):
            validate_spec({**base, "stages": [{"op": "code"}]})
        with _pt.raises(SpecError):
            validate_spec({**base, "stages": [
                {"op": "code", "script": "x", "lang": "nodejs"}]})
        with _pt.raises(SpecError):
            validate_spec({**base, "stages": [
                {"op": "udf", "name": "never_registered_udf"}]})
        validate_spec({**base, "stages": [
            {"op": "code", "script": "def main(a): return 1",
             "arguments": [{"name": "x", "column": "v"}]}]})


class TestSpecNewOps:
    @pytest.mark.usefixtures("ray_session")
    def test_spec_layout_op_mixed_corpus(self, tmp_path):
        # the `layout` op is a first-class spec stage (r03): a mixed
        # HTML + fake-PDF parquet streams through one actor-pool stage
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import run_spec

        rows_url, rows_payload, goldens = [], [], {}
        for i in range(6):
            payload, golden = make_fake_pdf(i)
            rows_url.append(f"pdf://{i}")
            rows_payload.append(payload)
            goldens[f"pdf://{i}"] = golden
        rows_url.append("http://h")
        rows_payload.append(b"<html><body><p>plain html body text here"
                            b" with enough words to keep</p></body></html>")
        t = pa.table({"url": pa.array(rows_url),
                      "payload": pa.array(rows_payload, pa.binary())})
        p = str(tmp_path / "mixed.parquet")
        pq.write_table(t, p)
        spec = {
            "source": {"op": "read_parquet", "path": p},
            "stages": [{"op": "layout"},
                       {"op": "select", "columns": ["url", "text",
                                                    "status"]}],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas().set_index("url")
        for u, g in goldens.items():
            assert out.loc[u, "text"] == g
        assert "plain html body text" in out.loc["http://h", "text"]
        assert (out["status"] == "ok").all()

    @pytest.mark.usefixtures("ray_session")
    def test_spec_sessionize_and_asof(self, sf_dir):
        from raydoc.pipelines.spec import run_spec

        out = run_spec({
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/events.parquet",
                       "columns": ["user_id", "ts"]},
            "stages": [{"op": "sessionize", "key_col": "user_id",
                        "ts_col": "ts", "gap_minutes": 30.0}],
            "sink": {"op": "collect"},
        }).to_pandas()
        assert {"user_id", "session_id", "n_events"} <= set(out.columns)
        assert len(out) > 0 and (out["n_events"] >= 1).all()

        out2 = run_spec({
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/events.parquet",
                       "columns": ["event_id", "user_id", "ts"]},
            "stages": [{"op": "asof_join_parquet",
                        "path": f"{sf_dir}/orders.parquet",
                        "key": "user_id", "right_key": "o_custkey",
                        "left_ts": "ts", "right_ts": "o_orderdate",
                        "right_cols": ["o_orderkey"],
                        "right_tiebreak": "o_orderkey"}],
            "sink": {"op": "collect"},
        }).to_pandas()
        assert "o_orderkey" in out2.columns and len(out2) > 0

    def test_new_op_validation(self):
        import pytest as _pt

        from raydoc.pipelines.spec import SpecError, validate_spec

        base = {"source": {"op": "read_parquet", "path": "/tmp/x.parquet"}}
        for op, missing in (
            ("approx_ndv", {"keys": ["k"]}),          # no column
            ("heavy_hitters", {}),                     # no column
            ("count_distinct", {"column": "v"}),       # no keys
            ("pack_sequences", {"token_col": "t", "budget": 1,
                                "order_cols": ["i"]}),  # no key_col
        ):
            with _pt.raises(SpecError):
                validate_spec({**base, "stages": [{"op": op, **missing}]})
        validate_spec({**base, "stages": [
            {"op": "approx_ndv", "keys": ["k"], "column": "v"},
            {"op": "repetition"}, {"op": "pii_redact"}],
            "sink": {"op": "side_effect", "ledger_dir": "/tmp/l",
                     "key_col": "k"}})
        with _pt.raises(SpecError):
            validate_spec({**base, "sink": {"op": "side_effect"}})


class TestSpecSampling:
    def test_validation_and_run(self, sf_dir):
        import pytest as _pt

        from raydoc.pipelines.spec import SpecError, run_spec, validate_spec

        base = {"source": {"op": "read_parquet", "path": "/tmp/x.parquet"}}
        for op, missing in (
            ("hash_sample", {"key_col": "k"}),            # no percent
            ("stratified_sample", {"key_col": "k",
                                   "rates": {"a": 1}}),   # no strata_col
        ):
            with _pt.raises(SpecError):
                validate_spec({**base, "stages": [{"op": op, **missing}]})

        spec = {
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/documents.parquet",
                       "columns": ["doc_id", "lang"]},
            "stages": [
                {"op": "stratified_sample", "key_col": "doc_id",
                 "strata_col": "lang", "rates": {"en": 100},
                 "default_percent": 0},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas()
        assert len(out) > 0 and set(out["lang"]) == {"en"}


class TestSpecSegmentDedupAndHostCap:
    def test_validation_and_run(self, sf_dir):
        import pytest as _pt

        from raydoc.pipelines.spec import SpecError, run_spec, validate_spec

        base = {"source": {"op": "read_parquet", "path": "/tmp/x.parquet"}}
        with _pt.raises(SpecError):
            validate_spec({**base, "stages": [{"op": "host_cap",
                                               "group_key": "source"}]})

        spec = {
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/documents.parquet",
                       "columns": ["doc_id", "text", "source"]},
            "stages": [
                {"op": "host_cap", "group_key": "source", "k": 3},
                {"op": "segment_dedup", "seg_words": 8},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas()
        # every source capped to <= 3 docs, then span-dedup schema
        assert len(out) > 0
        assert set(out.columns) == {"doc_id", "text_clean", "n_segs",
                                    "n_removed"}


class TestSpecDedupFamily:
    def test_validation(self):
        import pytest as _pt

        from raydoc.pipelines.spec import SpecError, validate_spec

        base = {"source": {"op": "read_parquet", "path": "/tmp/x.parquet"}}
        for op, missing in (
            ("hash_split", {}),             # no key_col
            ("incremental_dedup", {}),      # no index_dir
        ):
            with _pt.raises(SpecError):
                validate_spec({**base, "stages": [{"op": op, **missing}]})

    def test_curation_chain_matches_library(self, sf_dir, ray_session):
        """exact_dedup -> near_dup_dedup -> hash_split through the spec
        runner must equal the same ops called directly."""
        import ray.data as rd

        from raydoc.ops.dedup import exact_dedup, near_dup_dedup
        from raydoc.ops.sampling import hash_split
        from raydoc.pipelines.spec import run_spec

        path = f"{sf_dir}/documents.parquet"
        spec = {
            "source": {"op": "read_parquet", "path": path,
                       "columns": ["doc_id", "text"]},
            "stages": [
                {"op": "exact_dedup"},
                {"op": "near_dup_dedup", "threshold": 0.7},
                {"op": "hash_split", "key_col": "doc_id"},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas().sort_values("doc_id")

        direct = hash_split(
            near_dup_dedup(
                exact_dedup(rd.read_parquet(path,
                                            columns=["doc_id", "text"])),
                threshold=0.7),
            key_col="doc_id").to_pandas().sort_values("doc_id")

        assert len(out) > 0
        assert out["doc_id"].tolist() == direct["doc_id"].tolist()
        assert out["split"].tolist() == direct["split"].tolist()
        assert set(out["split"]) <= {"train", "val", "test"}
        assert not out["text"].duplicated().any()

    def test_semantic_dedup_and_cluster_sample_spec(self, sf_dir,
                                                    ray_session):
        """The embedding-side spec ops must equal the library calls."""
        import ray.data as rd

        from raydoc.ops.cluster import cluster_balanced_sample
        from raydoc.pipelines.spec import run_spec

        path = f"{sf_dir}/embeddings.parquet"
        out = run_spec({
            "source": {"op": "read_parquet", "path": path,
                       "columns": ["vec_id", "embedding"]},
            "stages": [{"op": "cluster_sample",
                        "init_ids": [0, 1, 2, 3],
                        "k_per_cluster": 10}],
            "sink": {"op": "collect"},
        }).to_pandas().sort_values("vec_id")
        direct = cluster_balanced_sample(
            rd.read_parquet(path, columns=["vec_id", "embedding"]),
            [0, 1, 2, 3], k_per_cluster=10,
        ).to_pandas().sort_values("vec_id")
        assert len(out) == 40
        assert out["vec_id"].tolist() == direct["vec_id"].tolist()
        assert out["cluster"].tolist() == direct["cluster"].tolist()

        kept = run_spec({
            "source": {"op": "read_parquet", "path": path,
                       "columns": ["vec_id", "embedding"]},
            "stages": [{"op": "semantic_dedup",
                        "init_ids": [0, 1, 2, 3],
                        "threshold": 0.95}],
            "sink": {"op": "count"},
        })
        # the natural corpus has no cosine-0.95 near-dups: all rows kept
        assert kept == 500

    def test_incremental_semantic_spec(self, sf_dir, tmp_path,
                                       ray_session):
        """The persisted-index probe is declarable: a spec stage drops
        new rows duplicating the indexed corpus."""
        import ray.data as rd

        from raydoc.ops.incremental import write_semantic_index
        from raydoc.pipelines.spec import run_spec

        import pyarrow.parquet as pq

        path = f"{sf_dir}/embeddings.parquet"
        idx = str(tmp_path / "semidx")
        write_semantic_index(
            rd.read_parquet(path, columns=["vec_id", "embedding"]),
            idx, init_ids=[0, 1, 2, 3])
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        import pyarrow.compute as _pc

        sel = t.filter(_pc.less(t.column("vec_id"), 5))
        clone = sel.set_column(
            sel.schema.get_field_index("vec_id"), "vec_id",
            _pc.add(sel.column("vec_id"), pa.scalar(900000)))
        newp = str(tmp_path / "new.parquet")
        pq.write_table(clone, newp)
        kept = run_spec({
            "source": {"op": "read_parquet", "path": newp},
            "stages": [{"op": "incremental_semantic_dedup",
                        "index_dir": idx, "threshold": 0.95}],
            "sink": {"op": "count"},
        })
        assert kept == 0  # all five are exact corpus clones

    def test_url_dedup_spec(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from raydoc.ops.url import synthetic_fetch_rows
        from raydoc.pipelines.spec import run_spec

        import pyarrow as _pa

        t = synthetic_fetch_rows(_pa.array(range(20), _pa.int64()))
        p = str(tmp_path / "fetches.parquet")
        pq.write_table(t, p)
        out = run_spec({
            "source": {"op": "read_parquet", "path": p},
            "stages": [{"op": "url_dedup", "ts_col": "fetch_ts"}],
            "sink": {"op": "collect"},
        }).to_pandas()
        assert len(out) == 20                       # one per canonical url
        assert out["canon_url"].is_unique
        # the later recrawl won every key: its ts is odd (id*2 + 1)
        assert (out["fetch_ts"] % 2 == 1).all()

    def test_incremental_dedup_spec(self, tmp_path, ray_session):
        import pyarrow as _pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from raydoc.ops.incremental import write_neardup_index
        from raydoc.pipelines.spec import run_spec

        corpus = _pa.table({
            "doc_id": [1, 2],
            "text": ["the committed corpus document about rivers and "
                     "mountains with many stable words",
                     "another committed document about oceans tides "
                     "and maritime navigation entirely"]})
        idx = str(tmp_path / "idx")
        write_neardup_index(rd.from_arrow(corpus), idx)

        new = _pa.table({
            "doc_id": [10, 11],
            "text": ["the committed corpus document about rivers and "
                     "mountains with many stable words",   # dup of 1
                     "a genuinely fresh document on celestial mechanics "
                     "and orbital resonance phenomena"]})
        p = str(tmp_path / "new.parquet")
        pq.write_table(new, p)
        out = run_spec({
            "source": {"op": "read_parquet", "path": p},
            "stages": [{"op": "incremental_dedup", "index_dir": idx,
                        "threshold": 0.6}],
            "sink": {"op": "collect"},
        }).to_pandas()
        assert out["doc_id"].tolist() == [11]

    def test_partitioned_sink(self, sf_dir, tmp_path, ray_session):
        """hash_split -> write_parquet(partition_cols=['split']): the
        declarative form of the one-pass per-split shard layout."""
        import glob

        from raydoc.pipelines.spec import run_spec

        out_dir = str(tmp_path / "shards")
        run_spec({
            "source": {"op": "read_parquet",
                       "path": f"{sf_dir}/documents.parquet",
                       "columns": ["doc_id", "text"]},
            "stages": [{"op": "hash_split", "key_col": "doc_id"}],
            "sink": {"op": "write_parquet", "path": out_dir,
                     "partition_cols": ["split"]},
        })
        parts = {p.split("=")[-1].rstrip("/")
                 for p in glob.glob(f"{out_dir}/split=*")}
        assert parts == {"train", "val", "test"}
