"""End-to-end pipeline tests: golden per-url byte-identity, crash
resume, partitioning invariance (SURVEY.md §5 items 2 and 4)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from raydoc.corpus import gen_row, gen_rows
from raydoc.extract.chunker import chunk_document
from raydoc.extract.html_extract import extract_page

N_GOLDEN = 120  # small corpus; every template variant + pathological strides


def _golden():
    """Single-threaded reference extraction (the oracle)."""
    out = {}
    for i in range(N_GOLDEN):
        row = gen_row(i)
        res = extract_page(row["html"])
        out[row["url"]] = res
    return out


@pytest.mark.usefixtures("ray_session")
class TestGoldenExtraction:
    @pytest.fixture(scope="class")
    def pages_file(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("pages") / "pages.parquet"
        pq.write_table(gen_rows(0, N_GOLDEN), str(p))
        return str(p)

    def test_byte_identical_per_url_any_partitioning(self, pages_file):
        from raydoc.pipelines.extract_pipeline import extract_dataset

        golden = _golden()
        # two different batch sizes -> different block/batch boundaries
        for bs in (7, 64):
            ds = extract_dataset(pages_file, batch_size=bs, concurrency=2)
            got = {r["url"]: r for r in ds.take_all()}
            assert set(got) == set(golden)
            for url, g in golden.items():
                assert got[url]["text"] == g["text"], f"text differs for {url}"
                assert got[url]["status"] == g["status"]
                assert [dict(s) for s in got[url]["spans"]] == g["spans"]

    def test_chunker_consistency(self, pages_file):
        from raydoc.pipelines.extract_pipeline import extract_dataset

        golden = _golden()
        ds = extract_dataset(pages_file, batch_size=32, concurrency=2)
        for r in ds.take_all():
            g = golden[r["url"]]
            expect = chunk_document(g["text"], g["spans"], 256)
            got = [dict(c) for c in r["chunks"]]
            assert got == expect


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_resume_skips_committed_and_matches(self, tmp_path):
        from raydoc.pipelines.extract_pipeline import run_extract_pipeline
        from raydoc.state.manifest import committed_partitions

        pages = str(tmp_path / "pages.parquet")
        pq.write_table(gen_rows(0, 200), pages)
        out1 = str(tmp_path / "out1")
        s1 = run_extract_pipeline(pages, out1, num_parts=6, concurrency=2)
        assert s1["n_docs"] == 200 and s1["n_parts_committed"] == 6

        # simulate a crash: drop half the manifests, corrupt their data
        for m in sorted(glob.glob(
                os.path.join(out1, "_manifest", "**", "*.json"),
                recursive=True))[::2]:
            pid = m.split("part-")[1].split(".")[0]
            os.remove(m)
            with open(os.path.join(out1, "extracted", f"part-{pid}.parquet"), "wb") as f:
                f.write(b"partial garbage")
        assert len(committed_partitions(out1)) == 3

        s2 = run_extract_pipeline(pages, out1, num_parts=6, concurrency=2)
        assert s2["n_parts_skipped_resume"] == 3
        assert s2["n_parts_written"] == 3
        assert s2["n_docs"] == 200

        # full rerun from scratch must be byte-identical
        out2 = str(tmp_path / "out2")
        run_extract_pipeline(pages, out2, num_parts=6, concurrency=2)
        det_cols = ["url", "text", "spans", "n_chunks", "status", "error"]
        t1 = pq.read_table(os.path.join(out1, "extracted"), columns=det_cols).sort_by("url")
        t2 = pq.read_table(os.path.join(out2, "extracted"), columns=det_cols).sort_by("url")
        assert t1.equals(t2)

    def test_manifest_checksums_stable(self, tmp_path):
        from raydoc.pipelines.extract_pipeline import run_extract_pipeline
        from raydoc.state.manifest import load_manifests

        pages = str(tmp_path / "pages.parquet")
        pq.write_table(gen_rows(0, 60), pages)
        outs = []
        for name in ("a", "b"):
            out = str(tmp_path / name)
            run_extract_pipeline(pages, out, num_parts=4, concurrency=2)
            outs.append({m["part_id"]: m["checksum"] for m in load_manifests(out)})
        assert outs[0] == outs[1]


class TestPartitioningScale:
    def test_url_hash_breaks_host_skew(self):
        """A hot host (80% of urls on one domain) must spread uniformly
        across partitions — the explicit skew-handling contract of the
        url-hash repartition (north rule)."""
        import numpy as np
        import pyarrow as pa

        from raydoc.pipelines.extract_pipeline import add_part_id

        urls = [f"https://hot-host.example/page/{i}" for i in range(8000)]
        urls += [f"https://site-{i}.example/x" for i in range(2000)]
        P = 32
        out = add_part_id(pa.table({"url": urls}), P)
        counts = np.bincount(out.column("part_id").to_numpy(), minlength=P)
        mean = len(urls) / P
        # every partition within 25% of the mean: no partition owns the host
        assert counts.min() > mean * 0.75 and counts.max() < mean * 1.25

    def test_batch_rows_for_bytes_clamps(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from raydoc.pipelines.extract_pipeline import batch_rows_for_bytes

        # tiny rows -> hi clamp; multi-MB rows -> small batches >= lo
        small = tmp_path / "small.parquet"
        pq.write_table(pa.table({"url": ["u"] * 100, "html": [b"x" * 100] * 100}),
                       str(small))
        assert batch_rows_for_bytes(str(small)) == 512
        big = tmp_path / "big.parquet"
        payloads = [i.to_bytes(4, "big") * (1 << 20) for i in range(8)]  # 4 MB each
        pq.write_table(
            pa.table({"url": ["u"] * 8, "html": payloads}),
            str(big), compression="none", use_dictionary=False,
        )
        bs = batch_rows_for_bytes(str(big))
        assert 8 <= bs <= 16  # ~32 MB target / 4 MB rows


@pytest.mark.usefixtures("ray_session")
class TestSideEffectSink:
    def test_once_per_key_across_reruns(self, tmp_path):
        import json
        import os

        import ray.data as rd

        from raydoc.stages.sink_stage import side_effect_sink

        ledger = str(tmp_path / "ledger")
        rows = [{"to": f"u{i}@x.org", "subject": "hi", "body": f"n{i}"}
                for i in range(20)] + [{"to": None, "subject": "bad"}]
        ds = rd.from_items(rows)
        out1 = side_effect_sink(ds, ledger, key_col="to").to_pandas()
        assert (out1["sink_status"] == "sent").sum() == 20
        assert (out1["sink_status"].str.startswith("error:missing")).sum() == 1
        outbox = os.path.join(ledger, "outbox")
        assert len(os.listdir(outbox)) == 20
        # rerun: nothing re-delivered, ledger holds
        out2 = side_effect_sink(rd.from_items(rows), ledger,
                                key_col="to").to_pandas()
        assert (out2["sink_status"] == "skipped:already-delivered").sum() == 20
        assert len(os.listdir(outbox)) == 20
        # outbox payload is the full row, durably renamed json
        one = json.load(open(os.path.join(outbox,
                                          sorted(os.listdir(outbox))[0])))
        assert set(one) == {"to", "subject", "body"}

    def test_failed_effect_stays_undelivered(self, tmp_path):
        import ray.data as rd

        from raydoc.stages.sink_stage import SideEffectSink

        calls = []

        def flaky(row):
            calls.append(row["to"])
            if row["to"] == "bad@x":
                raise RuntimeError("smtp down")

        st = SideEffectSink(str(tmp_path / "l2"), key_col="to",
                            effect=flaky)
        import pyarrow as pa

        out = st(pa.table({"to": ["ok@x", "bad@x"]}))
        assert out.column("sink_status").to_pylist() == [
            "sent", "error:RuntimeError:smtp down"]
        # failed key is NOT committed: a retry re-attempts it
        out2 = st(pa.table({"to": ["ok@x", "bad@x"]}))
        assert out2.column("sink_status").to_pylist() == [
            "skipped:already-delivered", "error:RuntimeError:smtp down"]
        assert calls == ["ok@x", "bad@x", "bad@x"]


class TestStageSplit:
    def test_parse_stats_attribution(self):
        """tools/stage_split.py parses operator walls + summed remote
        wall/cpu/UDF seconds out of a Dataset.stats() string."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "stage_split", "/root/repo/tools/stage_split.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        stats = (
            "Operator 1 ReadParquet->SplitBlocks(8): 2 tasks executed, "
            "16 blocks produced in 0.15s\n"
            "* Remote wall time: 204.4us min, 15.9ms max, 2.11ms mean, "
            "33.82ms total\n"
            "* Remote cpu time: 236.7us min, 17.04ms max, 2.26ms mean, "
            "36.16ms total\n"
            "* UDF time: 0us min, 0us max, 0.0us mean, 0us total\n"
            "\n"
            "Operator 2 Shuffle(key_columns=('shuffle_key',), "
            "num_partitions=8): executed in 1.31s\n"
            "\n"
            "\tSuboperator 0 foo_shuffle: 1 tasks executed, 2 blocks "
            "produced\n"
            "\t* Remote wall time: 27.36ms min, 28.3ms max, 27.83ms "
            "mean, 55.66ms total\n"
            "\t* Remote cpu time: 43.22ms min, 48.2ms max, 45.71ms "
            "mean, 91.42ms total\n"
            "\t* UDF time: 0us min, 0us max, 0.0us mean, 0us total\n"
            "\n"
            "\tSuboperator 1 foo_finalize: 1 tasks executed, 8 blocks "
            "produced\n"
            "\t* Remote wall time: 245.91us min, 4.44ms max, 1.22ms "
            "mean, 9.79ms total\n"
            "\t* Remote cpu time: 245.69us min, 4.44ms max, 1.25ms "
            "mean, 10.04ms total\n"
            "\t* UDF time: 0us min, 0us max, 0.0us mean, 0us total\n"
            "\n"
            "Dataset iterator time breakdown:\n"
            "* Total time overall: 1.52s\n"
        )
        ops = mod.parse_stats(stats)
        assert len(ops) == 2
        read, shuf = ops
        assert read["wall_s"] == 0.15 and read["tasks"] == 2
        assert abs(read["remote_wall_s"] - 0.034) < 1e-3
        assert shuf["wall_s"] == 1.31 and shuf["tasks"] == 2
        # suboperators fold into the parent
        assert abs(shuf["remote_wall_s"] - (0.05566 + 0.00979)) < 1e-3
        assert abs(shuf["remote_cpu_s"] - (0.09142 + 0.01004)) < 1e-3
        assert mod.stage_label("Shuffle(key_columns=('shuffle_key',))") \
            == "url-hash shuffle"
        assert mod.stage_label("MapBatches(extract_batch)->x") \
            == "extract (+part-id/keys)"
