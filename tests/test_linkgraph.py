"""Link-graph module: href extraction, host edges, integer PageRank,
and the domain blocklist filter (raydoc/ops/linkgraph.py, ops/url.py)."""

import numpy as np
import pyarrow as pa
import pytest

from raydoc.ops.linkgraph import extract_links_batch, host_edges, pagerank
from raydoc.ops.url import filter_blocked_hosts


def _links(url, html):
    t = extract_links_batch(pa.table({"url": [url], "html": [html]}))
    return [(r["src_host"], r["dst_host"]) for r in t.to_pylist()]


class TestExtractLinks:
    def test_absolute_link_carries_own_host(self):
        assert _links("https://a.com/p",
                      b'<a href="https://B.org/x">x</a>') == [
            ("a.com", "b.org")]

    def test_relative_resolves_to_page_host(self):
        assert _links("https://a.com/p", b'<a href="/rel">r</a>') == [
            ("a.com", "a.com")]
        assert _links("https://a.com/p", b'<a href="rel/x">r</a>') == [
            ("a.com", "a.com")]

    def test_protocol_relative_and_port_strip(self):
        assert _links("https://a.com/p",
                      b'<a href="//CDN.b.NET:8080/l.js">c</a>') == [
            ("a.com", "cdn.b.net")]

    def test_non_http_schemes_drop(self):
        assert _links("https://a.com/p",
                      b'<a href="mailto:x@y">m</a>'
                      b'<a href="javascript:void(0)">j</a>'
                      b'<a href="ftp://h/x">f</a>') == []

    def test_empty_href_and_junk_host_drop(self):
        assert _links("https://a.com/p", b'<a href="">e</a>') == []
        # invalid bytes in an external host fail the ASCII host grammar
        assert _links("https://a.com/p",
                      b'<a href="http://bad\xffhost/x">w</a>') == []

    def test_invalid_utf8_elsewhere_does_not_break_extraction(self):
        assert _links("https://a.com/p",
                      b'junk \xff\xfe <a href="https://ok.com/x">y</a>') == [
            ("a.com", "ok.com")]

    def test_unparseable_page_url_contributes_nothing(self):
        assert _links("garbage", b'<a href="https://b.com/x">y</a>') == []
        t = extract_links_batch(pa.table(
            {"url": pa.array([None], pa.string()),
             "html": [b'<a href="/x">y</a>']}))
        assert t.num_rows == 0

    def test_case_and_whitespace_tolerant_attribute(self):
        assert _links("https://a.com/p",
                      b"<A HREF = 'HTTPS://Sub.B.org:443/q?x=1#f'>z</A>") == [
            ("a.com", "sub.b.org")]

    def test_anchor_capture(self):
        b = pa.table({
            "url": ["https://a.com/p"],
            "html": [b'<a href="https://b.org/x" class="z">Read More</a>'
                     b'<a href="/rel">inner\xfftext</a>'
                     b'<link href="s.css" rel="x">'],
        })
        t = extract_links_batch(b, with_anchor=True)
        got = [(r["dst_host"], r["anchor"]) for r in t.to_pylist()]
        assert got == [("b.org", b"Read More"),
                       ("a.com", b"inner\xfftext"),
                       ("a.com", b"")]  # <link>: no anchor text follows
        # default output schema unchanged
        t2 = extract_links_batch(b)
        assert t2.column_names == ["src_host", "dst_host"]

    def test_empty_batch_and_no_links(self):
        empty = extract_links_batch(pa.table(
            {"url": pa.array([], pa.string()),
             "html": pa.array([], pa.binary())}))
        assert empty.num_rows == 0
        assert empty.column_names == ["src_host", "dst_host"]
        empty_a = extract_links_batch(
            pa.table({"url": pa.array([], pa.string()),
                      "html": pa.array([], pa.binary())}),
            with_anchor=True)
        assert empty_a.column_names == ["src_host", "dst_host", "anchor"]
        assert _links("https://a.com/p", b"no links here") == []


def _pagerank_ref(edges, iterations, scale, d_num, d_den):
    """Driver-side pure-Python replay of the documented contract."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    E = [(idx[s], idx[t]) for s, t in edges if idx[s] != idx[t]]
    out_deg = [0] * n
    for s, _t in E:
        out_deg[s] += 1
    base = scale // n
    tele = ((d_den - d_num) * base) // d_den
    r = [base] * n
    for _ in range(iterations):
        ins = [0] * n
        for s, t in E:
            if out_deg[s]:
                ins[t] += r[s] // out_deg[s]
        r = [tele + (d_num * ins[v]) // d_den for v in range(n)]
    return {nodes[i]: r[i] for i in range(n)}


def _edges_ds(edges, parts=3):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "src_host": [e[0] for e in edges],
        "dst_host": [e[1] for e in edges]}))
    return ds.repartition(parts) if parts else ds


class TestPagerank:
    EDGES = [("a", "b"), ("c", "b"), ("d", "b"), ("b", "e"),
             ("e", "a"), ("x", "y"), ("a", "e")]

    def test_matches_reference_and_partition_invariant(self, ray_session):
        ref = _pagerank_ref(self.EDGES, 5, 10**12, 85, 100)
        for parts in (1, 4):
            out = pagerank(_edges_ds(self.EDGES, parts),
                           iterations=5).take_all()
            assert {r["node"]: r["rank"] for r in out} == ref

    def test_self_loops_ignored(self, ray_session):
        with_loops = self.EDGES + [("a", "a"), ("b", "b")]
        out = pagerank(_edges_ds(with_loops), iterations=3).take_all()
        ref = _pagerank_ref(self.EDGES, 3, 10**12, 85, 100)
        assert {r["node"]: r["rank"] for r in out} == ref

    def test_dangling_mass_drops_total_bounded(self, ray_session):
        out = pagerank(_edges_ds(self.EDGES), iterations=5).take_all()
        assert sum(r["rank"] for r in out) <= 10**12

    def test_zero_iterations_uniform(self, ray_session):
        out = pagerank(_edges_ds(self.EDGES), iterations=0).take_all()
        n = len({u for e in self.EDGES for u in e})
        assert {r["rank"] for r in out} == {10**12 // n}

    def test_max_nodes_fail_loud_broadcast(self, ray_session):
        with pytest.raises(ValueError, match="max_nodes"):
            pagerank(_edges_ds(self.EDGES), max_nodes=3, plan="broadcast")

    def test_copartition_matches_broadcast(self, ray_session):
        ref = _pagerank_ref(self.EDGES, 4, 10**12, 85, 100)
        out = pagerank(_edges_ds(self.EDGES, 4), iterations=4,
                       plan="copartition").take_all()
        assert {r["node"]: r["rank"] for r in out} == ref

    def test_auto_escalates_to_copartition(self, ray_session):
        # max_nodes below the node count: auto must fall through to the
        # dataset-rank plan and still produce the identical result
        ref = _pagerank_ref(self.EDGES, 3, 10**12, 85, 100)
        out = pagerank(_edges_ds(self.EDGES), iterations=3,
                       max_nodes=3).take_all()
        assert {r["node"]: r["rank"] for r in out} == ref

    def test_copartition_self_loops_and_empty(self, ray_session):
        with_loops = self.EDGES + [("a", "a")]
        out = pagerank(_edges_ds(with_loops), iterations=2,
                       plan="copartition").take_all()
        ref = _pagerank_ref(self.EDGES, 2, 10**12, 85, 100)
        assert {r["node"]: r["rank"] for r in out} == ref
        assert pagerank(_edges_ds([], parts=0),
                        plan="copartition").take_all() == []

    def test_copartition_max_key_rows_fail_loud(self, ray_session):
        fan = [("hot", f"t{i}") for i in range(50)]
        with pytest.raises(ValueError, match="max_key_rows"):
            pagerank(_edges_ds(fan), iterations=1, plan="copartition",
                     max_key_rows=10).take_all()

    def test_star_center_dominates(self, ray_session):
        # hub's whole rank flows to leaf0 each round (outdeg 1), so hub
        # and leaf0 trade mass; both must dwarf an ordinary leaf
        star = [(f"leaf{i}", "hub") for i in range(10)] + [("hub", "leaf0")]
        out = {r["node"]: r["rank"]
               for r in pagerank(_edges_ds(star), iterations=8).take_all()}
        assert min(out["hub"], out["leaf0"]) > 3 * out["leaf1"]
        assert out["leaf1"] == out["leaf2"]  # symmetric leaves tie

    def test_empty_edges(self, ray_session):
        out = pagerank(_edges_ds([], parts=0)).take_all()
        assert out == []


class TestHostEdges:
    def test_weighted_edges_one_row_per_pair(self, ray_session):
        import ray.data as rd

        pages = rd.from_arrow(pa.table({
            "url": ["https://a.com/1", "https://a.com/2"],
            "html": [b'<a href="/x">i</a><a href="https://b.com/y">e</a>',
                     b'<a href="https://b.com/z">e</a>'],
        }))
        rows = {(r["src_host"], r["dst_host"]): r["n_links"]
                for r in host_edges(pages).take_all()}
        assert rows == {("a.com", "a.com"): 1, ("a.com", "b.com"): 2}
        rows2 = host_edges(pages, drop_self=True).take_all()
        assert {(r["src_host"], r["dst_host"]) for r in rows2} == {
            ("a.com", "b.com")}


class TestBlocklist:
    URLS = ["https://WWW.Bad.COM:443/x",     # subdomain of bad.com
            "https://bad.com/y",             # exact registrable
            "https://notbad.com/z",          # suffix but NOT subdomain
            "https://exact.host.net/q",      # exact-host entry
            "https://deep.exact.host.net/q",  # subdomain of exact entry
            "https://ok.org/r",
            "garbage"]

    def _ds(self):
        import ray.data as rd

        return rd.from_arrow(pa.table({"url": self.URLS}))

    def test_block_semantics(self, ray_session):
        out = filter_blocked_hosts(
            self._ds(), ["bad.com", "exact.host.net"]).take_all()
        assert sorted(r["host"] for r in out) == ["notbad.com", "ok.org"]

    def test_invert_keeps_only_blocked(self, ray_session):
        out = filter_blocked_hosts(
            self._ds(), ["bad.com"], invert=True).take_all()
        assert sorted(r["host"] for r in out) == ["bad.com", "www.bad.com"]

    def test_unparseable_urls_always_drop(self, ray_session):
        out = filter_blocked_hosts(self._ds(), []).take_all()
        assert all(r["host"] is not None for r in out)
        assert len(out) == 6  # 'garbage' gone even with empty blocklist


class TestSpecOps:
    def test_spec_linkgraph_chain(self, ray_session, tmp_path):
        """blocklist_filter is declarable and composes with
        host_edges -> pagerank over a real pages parquet."""
        import pyarrow.parquet as pq

        from raydoc.corpus import gen_rows
        from raydoc.pipelines.spec import run_spec

        src = str(tmp_path / "pages.parquet")
        pq.write_table(gen_rows(0, 60), src)
        spec = {
            "source": {"op": "read_parquet", "path": src,
                       "columns": ["url", "html"]},
            "stages": [
                {"op": "blocklist_filter",
                 "blocked": ["site00.example.com"]},
                {"op": "host_edges"},
                {"op": "pagerank", "iterations": 2},
            ],
            "sink": {"op": "collect"},
        }
        out = run_spec(spec).to_pandas()
        assert "rank" in out.columns and len(out) > 1
        assert not out["node"].str.startswith("site00.").any()

    def test_spec_blocklist_requires_blocked(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from raydoc.pipelines.spec import SpecError, run_spec

        src = str(tmp_path / "u.parquet")
        pq.write_table(pa.table({"url": ["https://a.com/x"]}), src)
        spec = {"source": {"op": "read_parquet", "path": src},
                "stages": [{"op": "blocklist_filter"}],
                "sink": {"op": "collect"}}
        with pytest.raises(SpecError, match="blocked"):
            run_spec(spec)


class TestShardsBlocklist:
    def test_web_to_training_shards_front_door(self, ray_session, tmp_path):
        """blocked_hosts drops a whole host's fetches before
        canonicalization; remaining output is identical in shape."""
        import ray.data as rd

        from raydoc.pipelines.training_data import web_to_training_shards

        n = 60
        urls = [f"https://www.site{i % 3}.com/a/{i}" for i in range(n)]
        body = ("words making a real document body with plenty of "
                "distinct tokens alpha%d beta%d gamma%d here")
        html = [(f"<html><body><p>{body % (i, i * 3, i * 7)} "
                 f"unique{i} page text</p></body></html>").encode()
                for i in range(n)]
        fetches = rd.from_arrow(pa.table({
            "url": urls, "fetch_ts": list(range(n)), "html": html}))
        stats = web_to_training_shards(
            fetches, str(tmp_path / "out"),
            blocked_hosts=["site1.com"], min_tokens=4)
        # a third of the corpus was blocked at the front door
        assert stats["n_extract_ok"] == n - n // 3
        assert stats["n_train"] + stats["n_val"] + stats["n_test"] > 0

        import glob

        files = glob.glob(str(tmp_path / "out" / "split=*" / "*.parquet"))
        assert files
        import pyarrow.parquet as pq

        t = pa.concat_tables([pq.read_table(f, columns=["url"])
                              for f in files])
        assert not any("site1" in u for u in t.column("url").to_pylist())


def _pagerank_w_ref(edges, iterations, scale, d_num, d_den):
    """Weighted-contract replay: edges = [(src, dst, w)]."""
    nodes = sorted({u for e in edges for u in e[:2]})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    E = [(idx[s], idx[t], w) for s, t, w in edges if idx[s] != idx[t]]
    outw = [0] * n
    for s, _t, w in E:
        outw[s] += w
    base = scale // n
    tele = ((d_den - d_num) * base) // d_den
    r = [base] * n
    for _ in range(iterations):
        ins = [0] * n
        for s, t, w in E:
            ins[t] += (r[s] * w) // outw[s]
        r = [tele + (d_num * ins[v]) // d_den for v in range(n)]
    return {nodes[i]: r[i] for i in range(n)}


class TestWeightedPagerank:
    WEDGES = [("a", "b", 3), ("a", "e", 1), ("c", "b", 2), ("b", "e", 5),
              ("e", "a", 1), ("x", "y", 7), ("d", "b", 1)]

    def _ds(self, parts=3):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "src_host": [e[0] for e in self.WEDGES],
            "dst_host": [e[1] for e in self.WEDGES],
            "w": [e[2] for e in self.WEDGES]}))
        return ds.repartition(parts) if parts else ds

    def test_matches_reference_both_plans(self, ray_session):
        ref = _pagerank_w_ref(self.WEDGES, 4, 10**12, 85, 100)
        for plan in ("broadcast", "copartition"):
            out = pagerank(self._ds(), iterations=4, weight_col="w",
                           plan=plan).take_all()
            assert {r["node"]: r["rank"] for r in out} == ref, plan

    def test_unit_weights_equal_unweighted(self, ray_session):
        import ray.data as rd

        unit = rd.from_arrow(pa.table({
            "src_host": [e[0] for e in self.WEDGES],
            "dst_host": [e[1] for e in self.WEDGES],
            "w": [1] * len(self.WEDGES)}))
        a = pagerank(unit, iterations=3, weight_col="w").take_all()
        b = pagerank(unit, iterations=3).take_all()
        assert sorted((r["node"], r["rank"]) for r in a) == \
            sorted((r["node"], r["rank"]) for r in b)

    def test_weights_shift_rank(self, ray_session):
        # b receives 3/4 of a's mass, e only 1/4: with weights, b must
        # beat the unweighted tie
        out_w = {r["node"]: r["rank"] for r in pagerank(
            self._ds(), iterations=5, weight_col="w").take_all()}
        out_u = {r["node"]: r["rank"] for r in pagerank(
            self._ds(), iterations=5).take_all()}
        assert out_w["b"] > out_u["b"]

    def test_nonpositive_weight_fail_loud(self, ray_session):
        import ray.data as rd

        bad = rd.from_arrow(pa.table({
            "src_host": ["a"], "dst_host": ["b"], "w": [0]}))
        with pytest.raises(Exception, match="positive"):
            pagerank(bad, iterations=1, weight_col="w").take_all()


class TestLocalFastPath:
    def test_local_path_bit_identical_to_distributed(self, ray_session):
        edges = TestPagerank.EDGES
        a = pagerank(_edges_ds(edges), iterations=5).take_all()
        b = pagerank(_edges_ds(edges), iterations=5,
                     local_edges=0).take_all()
        assert sorted((r["node"], r["rank"]) for r in a) == \
            sorted((r["node"], r["rank"]) for r in b)

    def test_local_path_weighted_bit_identical(self, ray_session):
        import ray.data as rd

        w = TestWeightedPagerank.WEDGES
        ds = rd.from_arrow(pa.table({
            "src_host": [e[0] for e in w],
            "dst_host": [e[1] for e in w],
            "w": [e[2] for e in w]}))
        a = pagerank(ds, iterations=4, weight_col="w").take_all()
        b = pagerank(ds, iterations=4, weight_col="w",
                     local_edges=0).take_all()
        assert sorted((r["node"], r["rank"]) for r in a) == \
            sorted((r["node"], r["rank"]) for r in b)


class TestCanonical:
    def test_extract_canonical_variants(self):
        from raydoc.ops.linkgraph import extract_canonical_batch

        b = pa.table({"html": [
            b'<head><link rel="canonical" href="https://a.com/c"/></head>',
            b"<head><LINK HREF='https://b.org/c' REL='canonical'></head>",
            b'<link rel="stylesheet" href="x.css">none here',
            b'<link rel="canonical" href="bad\xffbytes">',
            b'',
        ]})
        got = extract_canonical_batch(b).column("canonical").to_pylist()
        assert got == ["https://a.com/c", "https://b.org/c",
                       None, None, None]

    def test_first_match_wins(self):
        from raydoc.ops.linkgraph import extract_canonical_batch

        b = pa.table({"html": [
            b'<link rel="canonical" href="https://a.com/1">'
            b'<link rel="canonical" href="https://a.com/2">']})
        got = extract_canonical_batch(b).column("canonical").to_pylist()
        assert got == ["https://a.com/1"]


class TestNonStringKeys:
    def test_integer_node_ids_cast(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "src_host": [1, 2, 3], "dst_host": [2, 3, 1]}))
        out = pagerank(ds, iterations=2).take_all()
        assert {r["node"] for r in out} == {"1", "2", "3"}
        assert len({r["rank"] for r in out}) == 1  # symmetric cycle
