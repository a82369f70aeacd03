"""Link-graph operators: href extraction, host-graph edges, PageRank.

A Common-Crawl-style corpus is not just rows of text — it is a graph:
pages link to hosts, and host-level link centrality (PageRank over the
host graph) is a standard web-corpus quality signal (used e.g. for
crawl prioritization and as a quality-weighting feature in pretraining
curation). The reference engine has no graph operator at all (its web
components fetch and store per-URL rows — see the crawler/invoke
semantics cited in raydoc/sources/crawl_stage.py); this module is one
of the scale extensions SURVEY.md §2.5 calls out, alongside
ops/graph.py's connected components.

Three stages, each Ray-Data-native:

1. ``extract_links_batch`` — vectorized per-batch href extraction
   straight off the BINARY html column (no utf-8 decode of the page:
   RE2 kernels run on bytes, so a page with invalid UTF-8 — the corpus
   plants them — still yields its valid links). Split on
   ``href=["']``, take the prefix up to the closing quote, classify
   each target (absolute / protocol-relative / other-scheme /
   page-relative), and resolve it to a destination HOST: absolute and
   protocol-relative links carry their own host (validated against a
   strict ASCII host grammar — junk hosts drop, which also guarantees
   the binary->string cast is safe); relative links resolve to the
   page's own host; ``mailto:``/``javascript:``/other schemes drop.
   One Arrow pass per batch — splits, regexes, masks — plus O(links)
   numpy index juggling; no Python touches a row.

2. ``host_edges`` — pages Dataset -> weighted host-graph edge list
   ``(src_host, dst_host, n_links)`` via the partial-aggregating
   ``grouped_agg`` (ONE hash shuffle of slim host-pair rows; the
   multi-MB html never moves).

3. ``pagerank`` — damped PageRank over an edge Dataset in INTEGER
   fixed-point arithmetic. Every quantity is an int64 multiple of
   1/``scale``: r0 = scale//N for all N nodes, each iteration sends
   ``rank//outdeg`` along every out-edge and sets

       rank' = teleport + (d_num * incoming) // d_den,
       teleport = ((d_den - d_num) * (scale // N)) // d_den

   with dangling-node mass dropped (the simple dangling variant;
   documented contract, mirrored by the oracle). Integer adds are
   exactly order-independent, so the result is bit-identical under ANY
   partitioning — and exactly replayable in DuckDB with K unrolled
   CTE iterations (``queries._pagerank_sql`` generates that SQL from
   the same constants), which is what makes ``docs_pagerank`` a
   hash-green oracle instead of a float-tolerance check.

   Scale shape: the iteration state is the rank vector — ~16 B/node,
   broadcast once per iteration via ``ray.put`` (the kmeans_fit
   pattern, ops/cluster.py): per-edge contributions are gathered from
   the broadcast vector inside ``map_batches``, pre-summed per batch
   with argsort+``np.add.reduceat`` (exact int64, no dense buffer),
   and combined by ``grouped_agg``'s partial plan — only O(nodes)
   rows ever reach the driver. Edges are stamped with node indices
   ONCE and materialized (slim 16 B rows), so K iterations re-read
   the stamped edges, not the html. The broadcast plan assumes the
   node VECTOR fits the driver/workers (~100 M hosts x 8 B = 800 MB
   at full CC scale — tight but real); past ``max_nodes`` the default
   ``plan="auto"`` escalates to the CO-PARTITION plan
   (``_pagerank_copartition``: ranks stay a Dataset, one tag-union
   coarse-bucket shuffle per iteration, no driver node vector —
   bit-identical output), and below ``local_edges`` a small-graph
   fast path runs the identical integer loop driver-side. Weighted
   mode (``weight_col``) splits rank proportionally to edge weights,
   still exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_links_batch", "host_edges", "pagerank"]

# href="..." / href='...' (whitespace-tolerant); binary-safe RE2
_HREF_SPLIT = r"""[hH][rR][eE][fF]\s*=\s*["']"""
# target = prefix up to closing quote (or tag/space junk)
_TARGET_RE = r"""^(?P<t>[^"'<>\s]*)"""
_ABS_RE = r"^[hH][tT][tT][pP][sS]?://"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"
_ABS_HOST_RE = r"^[hH][tT][tT][pP][sS]?://(?P<h>[^/?#]+)"
_PROTREL_HOST_RE = r"^//(?P<h>[^/?#]+)"
# strict ASCII host[:port]; anything else is junk and drops
_HOSTPORT_RE = r"^(?P<h>[A-Za-z0-9._-]+)(?::[0-9]+)?$"
_PAGE_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#]+)"


def _page_hosts(url_col) -> pa.Array:
    """Lowercased host per page url (null when the url has none)."""
    u = url_col.combine_chunks() if isinstance(
        url_col, pa.ChunkedArray) else url_col
    hp = pc.struct_field(pc.extract_regex(u, _PAGE_HOST_RE), "h")
    h = pc.struct_field(pc.extract_regex(hp, _HOSTPORT_RE), "h")
    return pc.utf8_lower(h)


def extract_links_batch(batch: pa.Table, html_col: str = "html",
                        url_col: str = "url",
                        out_src: str = "src_host",
                        out_dst: str = "dst_host",
                        with_anchor: bool = False) -> pa.Table:
    """(url, html) batch -> one (src_host, dst_host) row per resolved
    link. See module docstring for the resolution contract. Rows whose
    page url has no parseable host contribute nothing (their relative
    links have no referent and their absolute links no source).

    ``with_anchor=True`` appends an ``anchor`` BINARY column: the text
    between the linking tag's ``>`` and the next ``<``, capped at 256
    bytes — the anchor-text signal retrieval-training corpora mine
    from CC. Binary, not string, because page bytes may not be UTF-8;
    deciding a decode policy is the consumer's job (the honest
    zero-copy contract, same as the multimodal columns). Heuristic
    caveat: for non-``<a>`` href carriers (``<link>``, ``<area>``)
    the captured bytes are whatever text follows the tag — acceptable
    for corpus mining, documented here."""
    cols = {out_src: pa.array([], pa.string()),
            out_dst: pa.array([], pa.string())}
    if with_anchor:
        cols["anchor"] = pa.array([], pa.binary())
    empty = pa.Table.from_pydict(cols)
    if batch.num_rows == 0:
        return empty
    h = batch.column(html_col)
    h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    parts = pc.split_pattern_regex(h, pattern=_HREF_SPLIT)
    flat = pc.list_flatten(parts)
    if len(flat) == 0:
        return empty
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # drop each list's position-0 element (the text BEFORE the first
    # href); detected via parent transitions so null/empty lists can't
    # skew an offsets-based position count
    first = np.ones(len(parent), dtype=bool)
    first[1:] = parent[1:] != parent[:-1]
    keep0 = ~first
    if not keep0.any():
        return empty
    flat = flat.filter(pa.array(keep0))
    parent = parent[keep0]

    tgt = pc.struct_field(pc.extract_regex(flat, _TARGET_RE), "t")
    nonempty = pc.not_equal(pc.binary_length(tgt), 0)
    abs_m = pc.match_substring_regex(tgt, _ABS_RE)
    protrel_m = pc.match_substring_regex(tgt, r"^//")
    scheme_m = pc.match_substring_regex(tgt, _SCHEME_RE)

    # external hosts: own host from the target, validated + port-strip
    ext_hp = pc.if_else(
        abs_m,
        pc.struct_field(pc.extract_regex(tgt, _ABS_HOST_RE), "h"),
        pc.struct_field(pc.extract_regex(tgt, _PROTREL_HOST_RE), "h"))
    ext_host = pc.struct_field(pc.extract_regex(ext_hp, _HOSTPORT_RE), "h")
    # validated hosts are pure ASCII -> safe cast off binary
    ext_host = pc.utf8_lower(ext_host.cast(pa.string()))

    src_all = _page_hosts(batch.column(url_col))
    src = src_all.take(pa.array(parent, pa.int64()))

    external = pc.or_(abs_m, protrel_m)
    internal = pc.and_(pc.and_(pc.invert(external),
                               pc.invert(scheme_m)), nonempty)
    dst = pc.if_else(external, ext_host,
                     pc.if_else(internal, src, pa.scalar(None, pa.string())))
    ok = pc.and_kleene(pc.is_valid(dst), pc.is_valid(src))
    data = {out_src: src, out_dst: dst}
    if with_anchor:
        data["anchor"] = pc.struct_field(
            pc.extract_regex(flat, r"^[^>]*>(?P<a>[^<]{0,256})"), "a")
    t = pa.Table.from_pydict(data).filter(ok)
    return t


def host_edges(ds, html_col: str = "html", url_col: str = "url",
               drop_self: bool = False,
               num_partitions: int | None = None):
    """Pages Dataset -> weighted host edge list
    ``(src_host, dst_host, n_links)`` — distinct host pairs with link
    counts, ONE hash shuffle of slim pair rows. ``drop_self`` removes
    same-host (intra-site) edges, the usual form for host-level
    centrality."""
    from raydoc.ops.relational import grouped_agg, nonempty_batches

    def _links(b: pa.Table) -> pa.Table:
        t = extract_links_batch(b, html_col=html_col, url_col=url_col)
        if drop_self and t.num_rows:
            t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                            t.column("dst_host"))))
        return t

    links = ds.map_batches(nonempty_batches(_links), batch_format="pyarrow")
    return grouped_agg(links, ["src_host", "dst_host"],
                       {"n_links": ("count", "src_host")},
                       num_partitions=num_partitions)


def _partial_idx_sums(batch: pa.Table, idx_col: str,
                      vals: np.ndarray) -> pa.Table:
    """Exact int64 per-batch partial: sum ``vals`` rows grouped by the
    batch's ``idx_col`` via argsort + ``np.add.reduceat`` (no dense
    node-length buffer, no float accumulation)."""
    d = batch.column(idx_col).to_numpy(zero_copy_only=False)
    order = np.argsort(d, kind="stable")
    ds_ = d[order]
    starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
    sums = np.add.reduceat(vals[order], starts)
    return pa.Table.from_pydict({
        "i": pa.array(ds_[starts], pa.int64()),
        "s": pa.array(sums, pa.int64())})


def _node_union(edges, src_col: str, dst_col: str,
                num_partitions: int | None):
    """Distinct-node Dataset ``(node)`` from both edge endpoints."""
    from raydoc.ops.relational import grouped_agg, nonempty_batches

    def _emit_nodes(b: pa.Table) -> pa.Table:
        cols = [b.column(src_col).combine_chunks(),
                b.column(dst_col).combine_chunks()]
        return pa.Table.from_pydict(
            {"node": pa.concat_arrays([c.cast(pa.string()) for c in cols])})

    return grouped_agg(
        edges.map_batches(nonempty_batches(_emit_nodes),
                          batch_format="pyarrow"),
        ["node"], {"c": ("count", "node")},
        num_partitions=num_partitions).select_columns(["node"])


def pagerank(edges, src_col: str = "src_host", dst_col: str = "dst_host",
             iterations: int = 5, scale: int = 10**12,
             damping: tuple[int, int] = (85, 100),
             max_nodes: int = 4_000_000,
             node_col: str = "node", rank_col: str = "rank",
             num_partitions: int | None = None,
             plan: str = "auto", max_key_rows: int | None = None,
             weight_col: str | None = None,
             local_edges: int = 1_000_000):
    """Integer fixed-point PageRank over a DISTINCT-edge Dataset
    (``src_col``, ``dst_col``) -> Dataset ``(node, rank)`` with rank an
    int64 multiple of 1/``scale``. See module docstring for the exact
    arithmetic contract (dangling mass dropped, order-independent,
    DuckDB-replayable). Input rows are treated as distinct edges
    (dedupe upstream — ``host_edges`` already does); self-loops are
    ignored. Overflow bound: per-node incoming mass is < ``scale``
    (total mass never grows), so all int64 arithmetic is safe for any
    ``scale`` <= 2**63 / d_num.

    ``plan``: ``"broadcast"`` (rank vector via ``ray.put`` each
    iteration — fastest while the node set fits a worker, fail-loud at
    ``max_nodes``), ``"copartition"`` (ranks stay a DATASET; each
    iteration is one tag-union coarse-bucket shuffle joining ranks to
    out-edges — outdeg falls out of the run length, no driver node
    vector, no ``Dataset.join``, the beyond-10^8-hosts path; ~2 slim
    shuffles per iteration), or ``"auto"`` (broadcast, escalating to
    copartition when the node count exceeds ``max_nodes``). Both plans
    produce bit-identical output (integer arithmetic; equality
    pytest-pinned). ``max_key_rows`` guards the copartition plan's
    one-key-run-fits-a-worker assumption (a single host with >cap
    out-edges raises, naming the key).

    ``weight_col``: WEIGHTED PageRank — each edge carries a positive
    int64 weight (``host_edges``'s n_links is the natural one) and a
    node's rank splits proportionally: contribution = (rank * w) //
    out_weight(src). Still exact integers, still order-independent;
    with all weights 1 the result is bit-identical to the unweighted
    form. Overflow bound: rank * w < 2**63, i.e. w < 9.2e6 at the
    default scale.

    ``local_edges``: small-graph fast path (broadcast plan only) —
    when the stamped edge count is at or below this, the slim index
    rows (16-24 B each) gather to the driver and the K iterations run
    in one numpy loop instead of K distributed rounds, skipping K x
    (broadcast + partial + combine) fixed costs that dominate tiny
    graphs. The arithmetic is the same exact-integer formula, so the
    result is bit-identical (pytest-pinned); set 0 to force the
    distributed loop."""
    import ray

    from raydoc.ops.relational import grouped_agg, nonempty_batches

    d_num, d_den = damping
    if not (0 < d_num < d_den):
        raise ValueError(f"pagerank: bad damping {damping}")
    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    if plan not in ("auto", "broadcast", "copartition"):
        raise ValueError(f"pagerank: unknown plan {plan!r}")
    if plan == "copartition":
        return _pagerank_copartition(
            edges, src_col, dst_col, iterations, scale, d_num, d_den,
            num_partitions, node_col, rank_col, max_key_rows,
            weight_col)

    nd = _node_union(edges, src_col, dst_col, num_partitions)
    rows = nd.limit(max_nodes + 1).take_all()
    if len(rows) > max_nodes:
        if plan == "auto":
            return _pagerank_copartition(
                edges, src_col, dst_col, iterations, scale, d_num,
                d_den, num_partitions, node_col, rank_col, max_key_rows,
                weight_col)
        raise ValueError(
            f"pagerank: node count exceeds max_nodes={max_nodes}; "
            "use plan='copartition' (ranks stay a Dataset) or raise "
            "max_nodes if the node vector fits a worker")
    na = pa.array([r["node"] for r in rows], pa.string())
    na = na.take(pc.sort_indices(na))
    n = len(na)
    import ray.data as rd
    if n == 0:
        return rd.from_arrow(pa.Table.from_pydict({
            node_col: pa.array([], pa.string()),
            rank_col: pa.array([], pa.int64())}))

    # ---- stamp edges with node indices once; drop strings + self.
    # index_in = one C++ hash probe per edge endpoint (house rule: no
    # Python string compares per row); every endpoint is in the node
    # set by construction, so the result is null-free ----
    nref = ray.put(na)

    def _stamp(b: pa.Table) -> pa.Table:
        import ray as _r

        nv = _r.get(nref)
        si = pc.index_in(b.column(src_col).cast(pa.string()),
                         value_set=nv).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ti = pc.index_in(b.column(dst_col).cast(pa.string()),
                         value_set=nv).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = si != ti
        cols = {"si": pa.array(si[keep], pa.int64()),
                "ti": pa.array(ti[keep], pa.int64())}
        if weight_col is not None:
            w = b.column(weight_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)[keep]
            if len(w) and w.min() <= 0:
                raise ValueError(
                    "pagerank: weights must be positive ints")
            cols["w"] = pa.array(w, pa.int64())
        return pa.Table.from_pydict(cols)

    eidx = edges.map_batches(nonempty_batches(_stamp),
                             batch_format="pyarrow").materialize()

    if eidx.count() <= local_edges:
        # small-graph fast path: same integer formulas, one numpy loop
        parts = [t for t in ray.get(eidx.to_arrow_refs()) if t.num_rows]
        if parts:
            et = pa.concat_tables(parts, promote_options="permissive")
            si = et.column("si").to_numpy(zero_copy_only=False)
            ti = et.column("ti").to_numpy(zero_copy_only=False)
            w = (et.column("w").to_numpy(zero_copy_only=False)
                 if weight_col is not None else None)
        else:
            si = ti = np.empty(0, dtype=np.int64)
            w = np.empty(0, dtype=np.int64) if weight_col else None
        # int64 add.at, not bincount(weights=...): bincount sums
        # weights in float64, which would break exactness past 2**53
        outdeg = np.zeros(n, dtype=np.int64)
        np.add.at(outdeg, si, 1 if w is None else w)
        base = scale // n
        teleport = ((d_den - d_num) * base) // d_den
        ranks = np.full(n, base, dtype=np.int64)
        nz = outdeg > 0
        for _ in range(iterations):
            if w is None:
                contrib = np.zeros(n, dtype=np.int64)
                np.floor_divide(ranks, outdeg, out=contrib, where=nz)
                vals = contrib[si]
            else:
                vals = (ranks[si] * w) // outdeg[si]
            insum = np.zeros(n, dtype=np.int64)
            np.add.at(insum, ti, vals)
            ranks = teleport + (d_num * insum) // d_den
        return rd.from_arrow(pa.Table.from_pydict({
            node_col: na, rank_col: pa.array(ranks, pa.int64())}))

    # ---- out-degree / out-weight (dense, driver-side: O(nodes)) ----
    def _out_partial(b: pa.Table) -> pa.Table:
        w = (b.column("w").to_numpy(zero_copy_only=False)
             if weight_col is not None
             else np.ones(b.num_rows, dtype=np.int64))
        return _partial_idx_sums(b, "si", w)

    outdeg = np.zeros(n, dtype=np.int64)
    od = grouped_agg(
        eidx.map_batches(nonempty_batches(_out_partial),
                         batch_format="pyarrow"),
        ["i"], {"s": ("sum", "s")}, num_partitions=num_partitions)
    for r in od.take_all():
        outdeg[r["i"]] = r["s"]

    base = scale // n
    teleport = ((d_den - d_num) * base) // d_den
    ranks = np.full(n, base, dtype=np.int64)
    nz = outdeg > 0
    for _ in range(iterations):
        if weight_col is None:
            # unweighted: per-SRC contribution precomputes driver-side
            contrib = np.zeros(n, dtype=np.int64)
            np.floor_divide(ranks, outdeg, out=contrib, where=nz)
            cref = ray.put((contrib, None))
        else:
            # weighted: contribution is per EDGE ((rank*w)//outw), so
            # broadcast the rank and out-weight vectors instead
            cref = ray.put((ranks, outdeg))

        def _in_partial(b: pa.Table, _ref=cref) -> pa.Table:
            import ray as _r

            cv, ow = _r.get(_ref)
            si = b.column("si").to_numpy(zero_copy_only=False)
            if ow is None:
                vals = cv[si]
            else:
                w = b.column("w").to_numpy(zero_copy_only=False)
                vals = (cv[si] * w) // ow[si]
            return _partial_idx_sums(b, "ti", vals)

        insum = np.zeros(n, dtype=np.int64)
        agg = grouped_agg(
            eidx.map_batches(nonempty_batches(_in_partial),
                             batch_format="pyarrow"),
            ["i"], {"s": ("sum", "s")}, num_partitions=num_partitions)
        for r in agg.take_all():
            insum[r["i"]] = r["s"]
        ranks = teleport + (d_num * insum) // d_den

    return rd.from_arrow(pa.Table.from_pydict({
        node_col: na,
        rank_col: pa.array(ranks, pa.int64())}))


def _pagerank_copartition(edges, src_col, dst_col, iterations, scale,
                          d_num, d_den, num_partitions, node_col,
                          rank_col, max_key_rows, weight_col=None):
    """PageRank with the rank vector as a DATASET — the beyond-broadcast
    plan for graphs whose node set does not fit a worker (10^9-host
    crawls). Per iteration:

    1. tag-union message pass: rank rows (tag 0) and out-edge rows
       (tag 1) of each src key land in the same coarse bucket
       (``bucketed_sorted_apply`` on the key, tag-sorted) — the house
       alternative to ``Dataset.join`` (see shuffle_join's chained-join
       pitfall). Within each key run the rank row leads, outdeg = run
       length minus its rank row, and every edge row emits
       ``(dst, rank // outdeg)`` segment-vectorized.
    2. the contributions UNION a zero row per node (so teleport-only
       nodes survive) feed one partial-agg sum by node; the finalize
       maps ``teleport + (d_num * sum) // d_den``.

    Two slim shuffles per iteration, rank state materialized per round
    (bounded lineage, the ops/graph.py iteration pattern). Bit-identical
    to the broadcast plan — integer arithmetic is order-independent.
    ``max_key_rows`` fail-louds a single host whose out-edge run
    exceeds the one-key-fits-a-worker assumption."""
    import ray.data as rd

    from raydoc.ops.bucketing import bucketed_sorted_apply, segment_ids
    from raydoc.ops.relational import grouped_agg, nonempty_batches

    empty = pa.Table.from_pydict({
        node_col: pa.array([], pa.string()),
        rank_col: pa.array([], pa.int64())})

    nodes = _node_union(edges, src_col, dst_col,
                        num_partitions).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(empty)
    base = scale // n
    tele = ((d_den - d_num) * base) // d_den

    def _clean(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks().cast(pa.string())
        d = b.column(dst_col).combine_chunks().cast(pa.string())
        if weight_col is not None:
            w = b.column(weight_col).cast(pa.int64())
            wn = w.to_numpy(zero_copy_only=False)
            if len(wn) and wn.min() <= 0:
                raise ValueError(
                    "pagerank: weights must be positive ints")
        else:
            # unit weights: the weighted kernel then reproduces the
            # unweighted arithmetic bit-for-bit (pr*1 // outdeg)
            w = pa.array(np.ones(b.num_rows, dtype=np.int64))
        t = pa.Table.from_pydict({"key": s, "dst": d, "w": w})
        return t.filter(pc.invert(pc.equal(t.column("key"),
                                           t.column("dst"))))

    eds = edges.map_batches(nonempty_batches(_clean),
                            batch_format="pyarrow").materialize()

    def _edge_msgs(b: pa.Table) -> pa.Table:
        nr = b.num_rows
        return pa.Table.from_pydict({
            "key": b.column("key"), "dst": b.column("dst"),
            "pr": pa.nulls(nr, pa.int64()), "w": b.column("w"),
            "tag": pa.array(np.ones(nr, dtype=np.int64))})

    def _rank_msgs(b: pa.Table) -> pa.Table:
        nr = b.num_rows
        return pa.Table.from_pydict({
            "key": b.column("node"), "dst": pa.nulls(nr, pa.string()),
            "pr": b.column("pr"), "w": pa.nulls(nr, pa.int64()),
            "tag": pa.array(np.zeros(nr, dtype=np.int64))})

    def _contrib(t: pa.Table, starts: np.ndarray,
                 counts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "node": pa.array([], pa.string()),
                "s": pa.array([], pa.int64())})
        tags = t.column("tag").to_numpy(zero_copy_only=False)
        prs = pc.fill_null(t.column("pr"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ws = pc.fill_null(t.column("w"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        seg = segment_ids(starts, counts)
        is_rank = tags == 0
        # rank rows carry w=0, so the segmented w-sum IS the run's
        # out-weight (== outdeg when all weights are 1)
        outw = np.add.reduceat(ws, starts)
        # tag-ascending sort puts the rank row first in its run; a run
        # with no rank row cannot occur (every edge endpoint is a
        # node), but guard it out rather than divide by garbage
        pr_run = prs[starts]
        valid = is_rank[starts] & (outw > 0)
        mask = (~is_rank) & valid[seg]
        contrib = (pr_run[seg][mask] * ws[mask]) // outw[seg][mask]
        return pa.Table.from_pydict({
            "node": t.column("dst").filter(pa.array(mask)),
            "s": pa.array(contrib, pa.int64())})

    def _zero_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": b.column("node"),
            "s": pa.array(np.zeros(b.num_rows, dtype=np.int64))})

    def _seed(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": b.column("node"),
            "pr": pa.array(np.full(b.num_rows, base, dtype=np.int64))})

    ranks = nodes.map_batches(_seed, batch_format="pyarrow").materialize()
    zeros = nodes.map_batches(_zero_rows, batch_format="pyarrow")
    for _ in range(iterations):
        msgs = eds.map_batches(
            nonempty_batches(_edge_msgs), batch_format="pyarrow").union(
            ranks.map_batches(nonempty_batches(_rank_msgs),
                              batch_format="pyarrow"))
        contribs = bucketed_sorted_apply(
            msgs, ["key"], [("key", "ascending"), ("tag", "ascending")],
            _contrib, num_partitions=num_partitions,
            max_key_rows=max_key_rows)
        sums = grouped_agg(contribs.union(zeros), ["node"],
                           {"s": ("sum", "s")},
                           num_partitions=num_partitions)

        def _finalize(b: pa.Table) -> pa.Table:
            s = b.column("s").to_numpy(zero_copy_only=False).astype(
                np.int64)
            pr = tele + (d_num * s) // d_den
            return pa.Table.from_pydict({
                "node": b.column("node"), "pr": pa.array(pr, pa.int64())})

        ranks = sums.map_batches(
            nonempty_batches(_finalize),
            batch_format="pyarrow").materialize()

    def _out(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({node_col: b.column("node"),
                                     rank_col: b.column("pr")})

    return ranks.map_batches(nonempty_batches(_out),
                             batch_format="pyarrow")


# rel=canonical — attribute order varies in the wild; two patterns
# cover href-then-rel and rel-then-href on one tag, binary-safe
_CANON_RE_1 = (r"""<[lL][iI][nN][kK][^>]*[rR][eE][lL]\s*=\s*"""
               r"""["']canonical["'][^>]*[hH][rR][eE][fF]\s*=\s*"""
               r"""["'](?P<c>[^"']*)["']""")
_CANON_RE_2 = (r"""<[lL][iI][nN][kK][^>]*[hH][rR][eE][fF]\s*=\s*"""
               r"""["'](?P<c>[^"']*)["'][^>]*[rR][eE][lL]\s*=\s*"""
               r"""["']canonical["']""")


def extract_canonical_batch(batch: pa.Table, html_col: str = "html",
                            out_col: str = "canonical") -> pa.Table:
    """Append the page's ``<link rel="canonical" href=...>`` target
    (first match, either attribute order) as a string column — null
    when absent or not valid UTF-8. The canonical target is the
    publisher's OWN dedup key: collapsing recrawls on
    ``coalesce(canonical, canonicalized-url)`` catches mirrors and
    parameter variants that URL normalization alone cannot (the
    queries.docs_canonical_dedup composition). One RE2 pass per
    pattern on the binary html; no per-row Python."""
    h = batch.column(html_col)
    h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    c1 = pc.struct_field(pc.extract_regex(h, _CANON_RE_1), "c")
    c2 = pc.struct_field(pc.extract_regex(h, _CANON_RE_2), "c")
    raw = pc.if_else(pc.is_valid(c1), c1, c2)
    # ASCII-validate (urls in the wild are; junk bytes -> null)
    ok = pc.match_substring_regex(raw, r"^[ -~]+$")
    out = pc.if_else(pc.fill_null(ok, False),
                     raw, pa.scalar(None, pa.binary()))
    return batch.append_column(out_col, out.cast(pa.string()))
