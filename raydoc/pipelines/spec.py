"""Spec runner: dict/JSON pipeline spec -> validated operator chain.

The engine's deliberately-thin analogue of the reference's Canvas DSL
loader (``Canvas.load`` parses component JSON, resolves classes from a
registry, validates params, /root/reference/agent/canvas.py:101-126,
component/__init__.py:56-59, base.py:109-161). Differences by design:

* the spec is a LINEAR chain of dataset transforms, not a cyclic graph —
  Ray Data's streaming executor replaces the frontier scheduler
  (SURVEY.md §2.1); branch routing is a `route` column + filters.
* params are validated by the same style of imperative checkers the
  reference uses (check_* predicates, base.py:226-285) before anything
  runs.

Spec format:

    {"source": {"op": "read_parquet" | "read_csv" | "read_json"
                      | "read_warc", "path": ...,
                "columns": [...optional...]},
     "stages": [{"op": <name>, ...params...}, ...],
     "sink":   {"op": "write_parquet", "path": ...} | {"op": "collect"}}

Registered stage ops (each maps to one library operator): filter,
route, template, extract, chunk_explode, token_count, quality, langid,
fingerprint, repetition, pii_redact, tumbling_window, grouped_agg,
top_k, group_top_k, distinct_on, limit, select, broadcast_join_parquet,
semi_join_parquet, running_agg, lag_delta, group_rank, rolling_agg,
code (sandboxed subprocess script, the reference's Code component),
udf (registered in-process batch callable with declared output schema),
approx_ndv / heavy_hitters (sketches), count_distinct, pack_sequences,
hash_sample / stratified_sample (deterministic training-mix sampling),
and the dedup/split family (r05): exact_dedup, url_dedup,
near_dup_dedup (MinHash-LSH victim removal), incremental_dedup
(vs a persisted corpus index), hash_split, plus the embedding-side
trio semantic_dedup / cluster_sample / incremental_semantic_dedup
(SemDeDup victim removal, the per-k-means-cell diversity cap, and the
persisted-semantic-index probe; ops/cluster.py + ops/incremental.py)
— the whole curation flow is spec-expressible; late r05 adds the
link-graph chain (blocklist_filter, host_edges, pagerank), the quality
trio (lm_perplexity, token_drift / numeric_drift vs a reference
parquet), and `expect` (declarative data-expectation gates ->
violation report).
Sinks: collect, count, write_parquet, side_effect (idempotent per-key
ledger, stages/sink_stage.py).
"""

from __future__ import annotations

from typing import Any, Callable

__all__ = ["run_spec", "validate_spec", "STAGE_REGISTRY"]


class SpecError(ValueError):
    pass


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise SpecError(msg)


def _require(params: dict, *keys: str) -> None:
    for k in keys:
        _check(k in params, f"missing required param {k!r}")


# op name -> (validator(params), builder(ds, params) -> ds)


def _b_filter(ds, p):
    from raydoc.ops.predicates import filter_ds

    return filter_ds(ds, p["conditions"], p.get("logic", "and"))


def _b_route(ds, p):
    from raydoc.ops.predicates import add_route_column

    branches = [(b["name"], b["conditions"], b.get("logic", "and"))
                for b in p["branches"]]

    return ds.map_batches(
        lambda t: add_route_column(t, branches, p.get("default", "default")),
        batch_format="pyarrow",
    )


def _b_template(ds, p):
    from raydoc.ops.template import render_op

    return ds.map_batches(
        render_op(p["template"], p.get("out_col", "rendered")),
        batch_format="pyarrow",
    )


def _b_extract(ds, p):
    from raydoc.pipelines.extract_pipeline import default_concurrency
    from raydoc.stages.extract_stage import ExtractStage

    return ds.map_batches(
        ExtractStage,
        batch_format="pyarrow",
        batch_size=p.get("batch_size", 128),
        fn_constructor_kwargs={"token_budget": p.get("token_budget", 256)},
        concurrency=default_concurrency(),
    )


def _b_layout(ds, p):
    """PDF layout parse as a first-class spec stage (north star: actor
    pools hosting stateful layout models): MixedExtractStage dispatches
    per payload, so HTML and FPDF documents stream through one op."""
    from raydoc.pipelines.extract_pipeline import default_concurrency
    from raydoc.stages.layout_stage import MixedExtractStage, PdfExtractStage

    cls = PdfExtractStage if p.get("pdf_only") else MixedExtractStage
    return ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=p.get("batch_size", 64),
        fn_constructor_kwargs={"token_budget": p.get("token_budget", 256)},
        concurrency=default_concurrency(),
    )


def _b_chunk_explode(ds, p):
    from raydoc.stages.extract_stage import explode_chunks

    return ds.map_batches(explode_chunks, batch_format="pyarrow")


def _map_b(fn_name: str):
    def build(ds, p):
        from raydoc.ops import text as t

        fn = getattr(t, fn_name)
        col = p.get("column", "text")
        return ds.map_batches(lambda b: fn(b, col), batch_format="pyarrow")

    return build


def _b_window(ds, p):
    from raydoc.ops.window import stamp_tumbling_window

    return ds.map_batches(
        lambda b: stamp_tumbling_window(
            b, p["ts_col"], p.get("unit", "hour"), p.get("out_col", "window_start")
        ),
        batch_format="pyarrow",
    )


def _b_grouped_agg(ds, p):
    from raydoc.ops.relational import grouped_agg

    aggs = {name: (a["fn"], a["column"]) for name, a in p["aggs"].items()}
    return grouped_agg(ds, p["keys"], aggs)


def _b_top_k(ds, p):
    from raydoc.ops.relational import top_k

    return top_k(ds, p["key"], p["k"], p.get("descending", True), p.get("tiebreak"))


def _b_group_top_k(ds, p):
    from raydoc.ops.relational import group_top_k

    return group_top_k(ds, p["group_key"], p["sort_key"], p["k"],
                       p.get("descending", True), p.get("tiebreak"))


def _b_distinct(ds, p):
    from raydoc.ops.relational import distinct_on

    return distinct_on(ds, p["key"], p.get("keep", "min"), p.get("order_col"))


def _b_limit(ds, p):
    return ds.limit(p["n"])


def _b_select(ds, p):
    return ds.select_columns(p["columns"])


def _b_bjoin(ds, p):
    import pyarrow.parquet as pq

    from raydoc.ops.relational import broadcast_join

    small = pq.read_table(p["path"], columns=p.get("columns"))
    return broadcast_join(ds, small, p["left_on"], p["right_on"],
                          p.get("how", "inner"))


def _b_semi_join(ds, p):
    import pyarrow.parquet as pq

    from raydoc.ops.relational import broadcast_semi_join

    keys = pq.read_table(p["path"], columns=[p["right_on"]])
    return broadcast_semi_join(ds, keys, p["left_on"], p["right_on"],
                               anti=p.get("anti", False))


def _b_running_agg(ds, p):
    from raydoc.ops.window import running_agg

    return running_agg(ds, p["key_col"], p["order_cols"], p["val_col"],
                       p.get("out_col", "run_sum"), p.get("fn", "sum"))


def _b_lag_delta(ds, p):
    from raydoc.ops.window import lag_delta

    return lag_delta(ds, p["key_col"], p["order_cols"], p["val_col"],
                     p.get("out_col", "delta"))


def _b_rolling_agg(ds, p):
    from raydoc.ops.window import rolling_agg

    return rolling_agg(ds, p["key_col"], p["order_cols"], p["val_col"],
                       p["window"], p.get("out_col", "roll"),
                       p.get("fn", "mean"))


def _b_code(ds, p):
    from raydoc.ops.code_exec import sandbox_code

    return sandbox_code(
        ds, p["script"], p.get("arguments"), p.get("lang", "python"),
        p.get("out_col", "content"), p.get("batch_size", 256),
    )


def _v_code(p):
    _require(p, "script")
    # mirror the reference's check_valid_value on lang (code.py:71-73)
    # minus the runtimes this engine does not ship
    _check(p.get("lang", "python").lower() in ("python", "python3"),
           f"unsupported code lang {p.get('lang')!r}")
    for i, a in enumerate(p.get("arguments", [])):
        _check("name" in a and "column" in a,
               f"arguments[{i}] needs 'name' and 'column'")


def _b_udf(ds, p):
    from raydoc.ops.code_exec import code_udf

    return code_udf(ds, p["name"], p.get("output_schema"),
                    p.get("batch_size"))


def _v_udf(p):
    _require(p, "name")
    from raydoc.ops.code_exec import resolve_udf

    try:
        resolve_udf(p["name"])
    except KeyError as e:
        raise SpecError(str(e)) from None


def _b_group_rank(ds, p):
    from raydoc.ops.window import group_rank

    return group_rank(ds, p["key_col"], p["sort_col"], p.get("out_col", "rn"),
                      p.get("descending", True), p.get("tiebreak"), p.get("k"))


STAGE_REGISTRY: dict[str, tuple[Callable[[dict], None], Callable]] = {
    "filter": (lambda p: _require(p, "conditions"), _b_filter),
    "route": (lambda p: _require(p, "branches"), _b_route),
    "template": (lambda p: _require(p, "template"), _b_template),
    "extract": (lambda p: None, _b_extract),
    "layout": (lambda p: None, _b_layout),
    "chunk_explode": (lambda p: None, _b_chunk_explode),
    "token_count": (lambda p: None, _map_b("token_count_batch")),
    "quality": (lambda p: None, _map_b("quality_batch")),
    "langid": (lambda p: None, _map_b("langid_batch")),
    "fingerprint": (lambda p: None, _map_b("fingerprint_batch")),
    "repetition": (lambda p: None, _map_b("repetition_batch")),
    "pii_redact": (lambda p: None, _map_b("pii_redact_batch")),
    "tumbling_window": (lambda p: _require(p, "ts_col"), _b_window),
    "grouped_agg": (lambda p: _require(p, "keys", "aggs"), _b_grouped_agg),
    "top_k": (lambda p: _require(p, "key", "k"), _b_top_k),
    "group_top_k": (lambda p: _require(p, "group_key", "sort_key", "k"),
                    _b_group_top_k),
    "distinct_on": (lambda p: _require(p, "key"), _b_distinct),
    "limit": (lambda p: _require(p, "n"), _b_limit),
    "select": (lambda p: _require(p, "columns"), _b_select),
    "broadcast_join_parquet": (
        lambda p: _require(p, "path", "left_on", "right_on"), _b_bjoin),
    "semi_join_parquet": (
        lambda p: _require(p, "path", "left_on", "right_on"), _b_semi_join),
    "running_agg": (
        lambda p: _require(p, "key_col", "order_cols", "val_col"), _b_running_agg),
    "lag_delta": (
        lambda p: _require(p, "key_col", "order_cols", "val_col"), _b_lag_delta),
    "group_rank": (lambda p: _require(p, "key_col", "sort_col"), _b_group_rank),
    "rolling_agg": (
        lambda p: _require(p, "key_col", "order_cols", "val_col", "window"),
        _b_rolling_agg),
    "sessionize": (
        lambda p: _require(p, "key_col", "ts_col"),
        lambda ds, p: __import__(
            "raydoc.ops.window", fromlist=["sessionize"]
        ).sessionize(ds, p["key_col"], p["ts_col"],
                     p.get("gap_minutes", 30.0),
                     p.get("agg_value_col"))),
    "asof_join_parquet": (
        lambda p: _require(p, "path", "key", "right_key", "left_ts",
                           "right_ts", "right_cols"),
        lambda ds, p: __import__(
            "raydoc.ops.window", fromlist=["asof_join"]
        ).asof_join(ds,
                    __import__("ray.data", fromlist=["read_parquet"])
                    .read_parquet(p["path"]),
                    p["key"], p["right_key"], p["left_ts"], p["right_ts"],
                    p["right_cols"], p.get("right_tiebreak"))),
    "code": (_v_code, _b_code),
    "udf": (_v_udf, _b_udf),
    "approx_ndv": (
        lambda p: _require(p, "keys", "column"),
        lambda ds, p: __import__(
            "raydoc.ops.sketch", fromlist=["grouped_approx_ndv"]
        ).grouped_approx_ndv(ds, p["keys"], p["column"],
                             p.get("precision", 12))),
    "heavy_hitters": (
        lambda p: _require(p, "column"),
        lambda ds, p: __import__(
            "raydoc.ops.sketch", fromlist=["topk_heavy_hitters"]
        ).topk_heavy_hitters(ds, p["column"], p.get("k", 20),
                             p.get("capacity", 4096))),
    "count_distinct": (
        lambda p: _require(p, "keys", "column"),
        lambda ds, p: __import__(
            "raydoc.ops.relational", fromlist=["grouped_count_distinct"]
        ).grouped_count_distinct(ds, p["keys"], p["column"])),
    "pack_sequences": (
        lambda p: _require(p, "token_col", "budget", "order_cols", "key_col"),
        lambda ds, p: __import__(
            "raydoc.ops.window", fromlist=["pack_sequences"]
        ).pack_sequences(ds, p["token_col"], p["budget"], p["order_cols"],
                         p["key_col"])),
    "hash_sample": (
        lambda p: _require(p, "key_col", "percent"),
        lambda ds, p: __import__(
            "raydoc.ops.sampling", fromlist=["hash_sample"]
        ).hash_sample(ds, p["key_col"], p["percent"])),
    "stratified_sample": (
        lambda p: _require(p, "key_col", "strata_col", "rates"),
        lambda ds, p: __import__(
            "raydoc.ops.sampling", fromlist=["stratified_hash_sample"]
        ).stratified_hash_sample(ds, p["key_col"], p["strata_col"],
                                 p["rates"], p.get("default_percent", 0))),
    "bottom_k_sample": (
        lambda p: _require(p, "key_col", "n"),
        lambda ds, p: __import__(
            "raydoc.ops.sampling", fromlist=["bottom_k_sample"]
        ).bottom_k_sample(ds, p["key_col"], p["n"],
                          p.get("salt", 0))),
    "segment_dedup": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.dedup", fromlist=["segment_dedup"]
        ).segment_dedup(ds, p.get("text_col", "text"),
                        p.get("id_col", "doc_id"),
                        p.get("seg_words", 8), p.get("max_docs", 1))),
    "host_cap": (
        lambda p: _require(p, "group_key", "k"),
        lambda ds, p: __import__(
            "raydoc.ops.relational", fromlist=["group_top_k"]
        ).group_top_k(ds, p["group_key"], p.get("sort_key", "doc_id"),
                      p["k"], descending=p.get("descending", False))),
    # r05: the dedup/split family, so the declarative spec can express
    # the whole curation flow (url_dedup -> exact -> near-dup ->
    # incremental-vs-corpus -> hash_split) without Python glue
    "exact_dedup": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.dedup", fromlist=["exact_dedup"]
        ).exact_dedup(ds, p.get("text_col", "text"),
                      p.get("id_col", "doc_id"))),
    "url_dedup": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.url", fromlist=["url_dedup"]
        ).url_dedup(ds, p.get("url_col", "url"),
                    p.get("ts_col", "warc_ts"))),
    "near_dup_dedup": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.dedup", fromlist=["near_dup_dedup"]
        ).near_dup_dedup(ds, p.get("text_col", "text"),
                         p.get("id_col", "doc_id"),
                         p.get("threshold", 0.7),
                         p.get("max_bucket_docs", 512))),
    "hash_split": (
        lambda p: _require(p, "key_col"),
        lambda ds, p: __import__(
            "raydoc.ops.sampling", fromlist=["hash_split"]
        ).hash_split(ds, p["key_col"], p.get("val_pct", 5),
                     p.get("test_pct", 5), p.get("salt", "split"),
                     p.get("out_col", "split"))),
    "incremental_dedup": (
        lambda p: _require(p, "index_dir"),
        lambda ds, p: __import__(
            "raydoc.ops.incremental", fromlist=["incremental_dedup"]
        ).incremental_dedup(
            ds, p["index_dir"], text_col=p.get("text_col", "text"),
            id_col=p.get("id_col", "doc_id"),
            threshold=p.get("threshold", 0.7),
            max_bucket_docs=p.get("max_bucket_docs"),
            update_index=p.get("update_index", False))[0]),
    # late r05: the embedding-side curation pair (ops/cluster.py) —
    # SemDeDup victim removal and the per-cell diversity cap
    "semantic_dedup": (
        lambda p: _require(p, "init_ids"),
        lambda ds, p: __import__(
            "raydoc.ops.cluster", fromlist=["semantic_dedup"]
        ).semantic_dedup(
            ds, p["init_ids"], threshold=p.get("threshold", 0.9),
            id_col=p.get("id_col", "vec_id"),
            emb_col=p.get("emb_col", "embedding"),
            n_updates=p.get("n_updates", 1),
            max_cluster_docs=p.get("max_cluster_docs"))),
    "cluster_sample": (
        lambda p: _require(p, "init_ids", "k_per_cluster"),
        lambda ds, p: __import__(
            "raydoc.ops.cluster", fromlist=["cluster_balanced_sample"]
        ).cluster_balanced_sample(
            ds, p["init_ids"], p["k_per_cluster"],
            id_col=p.get("id_col", "vec_id"),
            emb_col=p.get("emb_col", "embedding"),
            n_updates=p.get("n_updates", 1))),
    "incremental_semantic_dedup": (
        lambda p: _require(p, "index_dir"),
        lambda ds, p: __import__(
            "raydoc.ops.incremental",
            fromlist=["incremental_semantic_dedup"]
        ).incremental_semantic_dedup(
            ds, p["index_dir"], threshold=p.get("threshold", 0.9),
            update_index=p.get("update_index", False))[0]),
    # late r05: the link-graph family (ops/linkgraph.py, ops/url.py) —
    # blocklist front door, href->host edges, PageRank
    "blocklist_filter": (
        lambda p: _require(p, "blocked"),
        lambda ds, p: __import__(
            "raydoc.ops.url", fromlist=["filter_blocked_hosts"]
        ).filter_blocked_hosts(
            ds, p["blocked"], url_col=p.get("url_col", "url"),
            invert=p.get("invert", False))),
    "host_edges": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.linkgraph", fromlist=["host_edges"]
        ).host_edges(ds, html_col=p.get("html_col", "html"),
                     url_col=p.get("url_col", "url"),
                     drop_self=p.get("drop_self", False))),
    "pagerank": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.linkgraph", fromlist=["pagerank"]
        ).pagerank(ds, src_col=p.get("src_col", "src_host"),
                   dst_col=p.get("dst_col", "dst_host"),
                   iterations=p.get("iterations", 5),
                   scale=p.get("scale", 10**12),
                   max_nodes=p.get("max_nodes", 4_000_000),
                   plan=p.get("plan", "auto"))),
    # late r05: expectation gates + corpus drift (ops/validate.py,
    # ops/drift.py) — the report datasets become the chain's stream
    "expect": (
        lambda p: _require(p, "rules"),
        lambda ds, p: __import__(
            "raydoc.ops.validate", fromlist=["validate_expectations"]
        ).validate_expectations(ds, p["rules"])),
    "token_drift": (
        lambda p: _require(p, "ref_path"),
        lambda ds, p: __import__(
            "raydoc.ops.drift", fromlist=["token_drift"]
        ).token_drift(
            ds,
            __import__("ray.data", fromlist=["read_parquet"]).
            read_parquet(p["ref_path"],
                         columns=[p.get("text_col", "text")]),
            text_col=p.get("text_col", "text"),
            top_k=p.get("top_k", 20),
            frac_bits=p.get("frac_bits", 16))),
    "numeric_drift": (
        lambda p: _require(p, "ref_path", "column"),
        lambda ds, p: __import__(
            "raydoc.ops.drift", fromlist=["numeric_drift"]
        ).numeric_drift(
            ds,
            __import__("ray.data", fromlist=["read_parquet"]).
            read_parquet(p["ref_path"], columns=[p["column"]]),
            p["column"])),
    # late r05: CCNet-style corpus-fit LM perplexity (ops/lm.py)
    "lm_perplexity": (
        lambda p: None,
        lambda ds, p: __import__(
            "raydoc.ops.lm", fromlist=["lm_perplexity"]
        ).lm_perplexity(ds, text_col=p.get("text_col", "text"),
                        id_col=p.get("id_col", "doc_id"),
                        frac_bits=p.get("frac_bits", 16),
                        max_model_rows=p.get("max_model_rows",
                                             50_000_000))),
}

_VALID_PREDICATE_OPS = None


def validate_spec(spec: dict) -> None:
    """Fail fast with a readable message BEFORE any execution — the
    engine's param.check() (base.py:163-173)."""
    from raydoc.ops.predicates import OPERATORS

    _check(isinstance(spec, dict), "spec must be a dict")
    _check("source" in spec, "spec needs a 'source'")
    src = spec["source"]
    _check(src.get("op") in ("read_parquet", "read_csv", "read_json",
                             "read_warc"),
           "source.op must be read_parquet | read_csv | read_json "
           "| read_warc")
    _require(src, "path")
    for i, st in enumerate(spec.get("stages", [])):
        op = st.get("op")
        _check(op in STAGE_REGISTRY, f"stage[{i}]: unknown op {op!r}")
        STAGE_REGISTRY[op][0]({k: v for k, v in st.items() if k != "op"})
        for cond in st.get("conditions", []) + [
            c for b in st.get("branches", []) for c in b.get("conditions", [])
        ]:
            _check(cond.get("operator") in OPERATORS,
                   f"stage[{i}]: unknown predicate operator {cond.get('operator')!r}")
    sink = spec.get("sink", {"op": "collect"})
    _check(sink.get("op") in ("collect", "write_parquet", "count",
                              "side_effect"),
           f"unknown sink {sink.get('op')!r}")
    if sink["op"] == "write_parquet":
        _require(sink, "path")
    if sink["op"] == "side_effect":
        _require(sink, "ledger_dir", "key_col")


def run_spec(spec: dict) -> Any:
    """Validate then execute. Returns a Dataset ('collect'), row count
    ('count'), or output path ('write_parquet')."""
    import ray.data as rd

    validate_spec(spec)
    src = spec["source"]
    if src["op"] == "read_csv":
        ds = rd.read_csv(src["path"])
        if src.get("columns"):
            ds = ds.select_columns(src["columns"])
    elif src["op"] == "read_json":
        ds = rd.read_json(src["path"])
        if src.get("columns"):
            ds = ds.select_columns(src["columns"])
    elif src["op"] == "read_warc":
        from raydoc.sources.warc import read_warc

        ds = read_warc(src["path"])
        if src.get("columns"):
            ds = ds.select_columns(src["columns"])
    else:
        ds = rd.read_parquet(src["path"], columns=src.get("columns"))
    for st in spec.get("stages", []):
        params = {k: v for k, v in st.items() if k != "op"}
        ds = STAGE_REGISTRY[st["op"]][1](ds, params)
    sink = spec.get("sink", {"op": "collect"})
    if sink["op"] == "write_parquet":
        # partition_cols: hive-partitioned single-pass write — with a
        # hash_split stage upstream this is the one-pass per-split
        # shard layout (training_data.web_to_training_shards r05)
        ds.write_parquet(sink["path"],
                         partition_cols=sink.get("partition_cols"))
        return sink["path"]
    if sink["op"] == "count":
        return ds.count()
    if sink["op"] == "side_effect":
        from raydoc.stages.sink_stage import side_effect_sink

        return side_effect_sink(ds, sink["ledger_dir"], sink["key_col"],
                                sink.get("payload_cols"),
                                sink.get("outbox_dir"))
    return ds
