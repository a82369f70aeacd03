"""URL canonicalization + recrawl dedup — the front door of every
Common-Crawl-style corpus: the same page is fetched many times under
cosmetically different URLs (tracking params, fragments, case-varied
hosts, default ports, trailing slashes), and a pretraining pipeline
must collapse them to one canonical row (latest crawl wins) BEFORE any
content-level dedup, or the expensive stages pay for every recrawl.

The reference engine keys its web documents by raw URL (its crawler
component fetches and stores per-URL rows); this module adds the
canonicalization + latest-wins collapse a 10^12-page corpus needs.

Canonicalization rules (deliberately minimal, deterministic, and
SQL-replicable so the driver can hash-check them against DuckDB):

1. strip the ``#fragment``
2. lowercase the scheme and host (never the path)
3. strip the scheme's default port (``:80`` for http, ``:443`` https)
4. drop tracking params: any ``utm_*`` key plus ``gclid`` / ``fbclid``
   / ``ref``
5. byte-sort the surviving ``k=v`` tokens and re-join with ``&``
   (param order never affects page identity)
6. an empty surviving query drops the ``?`` entirely
7. collapse trailing ``/`` runs on the path; an empty path becomes ``/``

Strings that don't parse as ``scheme://host...`` pass through with
only the fragment stripped (garbage rows stay identifiable instead of
nulling out); null input stays null.

Scale shape: the kernel is one Arrow pass per batch — RE2 kernels
(``replace_substring_regex`` / ``extract_regex``) for steps 1-3 and 7,
and for the query params a flatten -> filter -> Arrow sort ->
``binary_join`` rebuild, so no Python touches a row. ``url_dedup``
composes it with ``distinct_on(bucketed=True)``: ONE hash shuffle on
the canonical key, vectorized latest-wins per coarse bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# non-utm_ tracking keys dropped outright (keep this list tiny and
# mirrored byte-for-byte in the SQL oracle, queries.py docs_url_dedup)
_DROP_KEYS = ("gclid", "fbclid", "ref")

_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<hostport>[^/?#]+)(?P<path>[^?#]*)$"
)


def _canon_query(qs: pa.Array) -> pa.Array:
    """Rebuild each query string: drop tracking params, byte-sort the
    rest, '&'-join. Null in (no '?') -> '' out; fully-dropped -> ''.
    Vectorized: flatten all rows' tokens into one array, one filter,
    one Arrow table sort, one ``binary_join``."""
    n = len(qs)
    toks = pc.split_pattern(pc.fill_null(qs, ""), "&")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    key = pc.replace_substring_regex(flat, r"=.*$", "")
    keep = pc.and_(
        pc.invert(pc.starts_with(key, "utm_")),
        pc.invert(pc.is_in(key, value_set=pa.array(_DROP_KEYS))),
    )
    keep = pc.and_(keep, pc.greater(pc.utf8_length(flat), 0))
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    parent = parent[keep_np]
    srt = pa.table({"p": parent, "t": flat})
    idx = pc.sort_indices(
        srt, sort_keys=[("p", "ascending"), ("t", "ascending")])
    srt = srt.take(idx)
    counts = np.bincount(
        srt.column("p").to_numpy(zero_copy_only=False), minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    rebuilt = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        srt.column("t").combine_chunks().cast(pa.string()),
    )
    return pc.binary_join(rebuilt, "&")


def canonicalize_url_batch(batch: pa.Table, col: str = "url",
                           out_col: str = "canon_url") -> pa.Table:
    """Append ``out_col``: the canonical form of ``col`` per the module
    rules. One Arrow pass; no per-row Python."""
    u = batch.column(col)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    u = u.cast(pa.string())
    valid = pc.is_valid(u)
    u0 = pc.fill_null(u, "")
    # 1. fragment
    nofrag = pc.replace_substring_regex(u0, r"#.*$", "")
    # split off the query BEFORE the parts regex ([^?#]* can't span '?')
    base = pc.replace_substring_regex(nofrag, r"\?.*$", "")
    has_q = pc.match_substring(nofrag, "?")
    qs = pc.if_else(
        has_q, pc.replace_substring_regex(nofrag, r"^[^?]*\?", ""), None)
    parts = pc.extract_regex(base, pattern=_PARTS_RE)
    ok = pc.is_valid(parts)
    # struct fields are "" where !ok; all ops below are total on ""
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(parts, "hostport"))
    # 3. default ports (scheme-conditional). Anchored to a colon-free
    # host so the strip is IDEMPOTENT: a malformed doubled port
    # ("h.com:443:443") is left alone rather than stripped once per
    # pass, which would give re-canonicalized URLs a different key.
    hostport = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, r"^([^:]*):80$", r"\1"),
        hostport)
    hostport = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(hostport, r"^([^:]*):443$", r"\1"),
        hostport)
    # 7. path: trailing-slash runs collapse; empty -> '/'
    path = pc.replace_substring_regex(
        pc.struct_field(parts, "path"), r"/+$", "")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    # 4-6. query
    q = _canon_query(qs)
    suffix = pc.if_else(
        pc.equal(q, ""), "",
        pc.binary_join_element_wise("?", q, ""))
    canon = pc.binary_join_element_wise(
        scheme, "://", hostport, path, suffix, "")
    out = pc.if_else(ok, canon, nofrag)       # non-URL passthrough
    out = pc.if_else(valid, out, pa.scalar(None, pa.string()))
    return batch.append_column(out_col, out)


def url_dedup(ds, url_col: str = "url", ts_col: str = "warc_ts",
              num_partitions: int | None = None):
    """Collapse recrawls: canonicalize ``url_col`` then keep, per
    canonical URL, the row with the LATEST ``ts_col`` (a recrawl
    supersedes its predecessors). Output = input columns +
    ``canon_url``, one row per canonical URL.

    Physical plan: map_batches(canonicalize) -> bucketed distinct_on
    (canon-key hash shuffle once, vectorized max-ts pick per coarse
    bucket) — the same plan exact_dedup rides, proven flat in key
    count (ops/bucketing.py A/B). Ties on ``ts_col`` within a key are
    broken by the bucket sort's stable order; feed a unique timestamp
    per fetch (WARC capture times are) for fully pinned output.
    """
    from raydoc.ops.relational import distinct_on

    canon = ds.map_batches(
        lambda b: canonicalize_url_batch(b, url_col),
        batch_format="pyarrow")
    return distinct_on(canon, "canon_url", keep="max", order_col=ts_col,
                       num_partitions=num_partitions, bucketed=True)


def synthetic_fetch_rows(ids) -> pa.Table:
    """Shared fixture for the url_dedup oracle query AND the 1M-doc
    scale validation (tools/validate_url_dedup.py): per id, one dirty
    original URL (mixed-case host, :443 default port, trailing slash,
    utm_*/gclid params, fragment, ts=2d) plus one later recrawl
    (clean-cased, reordered params, ts=2d+1) that must win. One copy so
    the DuckDB oracle SQL in queries.py can never drift from what the
    scale validation exercises."""
    import numpy as np

    _QA = np.array(["?utm_source=feed&b=2&a=1", "?a=1&utm_campaign=x",
                    "?z=9&gclid=abc", ""], dtype=object)
    _QB = np.array(["?a=1&b=2&utm_medium=m", "?a=1", "?z=9", ""],
                   dtype=object)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    dnp = ids.to_numpy(zero_copy_only=False)
    dstr = pc.cast(ids, pa.string())
    h = pc.cast(pa.array(dnp % 7), pa.string())
    j = pc.binary_join_element_wise
    url_a = j(pa.scalar("https://WWW.Site"), h,
              pa.scalar(".COM:443/Articles/"), dstr,
              pa.array(np.where(dnp % 2 == 0, "/", ""), pa.string()),
              pa.array(_QA[dnp % 4], pa.string()),
              pa.array(np.where(dnp % 5 == 0, "#sec", ""), pa.string()),
              pa.scalar(""))
    url_b = j(pa.scalar("https://www.site"), h,
              pa.scalar(".com/Articles/"), dstr,
              pa.array(_QB[dnp % 4], pa.string()), pa.scalar(""))
    return pa.table({
        "url": pa.concat_arrays([url_a, url_b]),
        "fetch_ts": pa.array(np.concatenate([dnp * 2, dnp * 2 + 1])),
    })


# UT1-style domain blocklists are the standard web-corpus front-door
# filter (RefinedWeb / FineWeb both apply one before any content
# stage): a list of blocked registrable domains, matched against the
# page host INCLUDING subdomains. Kept deliberately exact-and-simple
# (host == b, or host ends with "." + b) so the rule is one Arrow pass
# and byte-replayable in the DuckDB oracle (queries.docs_url_blocklist).
_BLOCK_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<hp>[^/?#]+)"


def host_of_url(url_col) -> pa.Array:
    """Lowercased, port-stripped host per URL (null when unparseable).
    One Arrow pass; the companion of canonicalize_url_batch for rules
    that only need the host."""
    u = url_col.combine_chunks() if isinstance(
        url_col, pa.ChunkedArray) else url_col
    u = u.cast(pa.string())
    hp = pc.struct_field(pc.extract_regex(u, _BLOCK_HOST_RE), "hp")
    host = pc.utf8_lower(
        pc.replace_substring_regex(hp, r":[0-9]+$", ""))
    return host


def filter_blocked_hosts(ds, blocked, url_col: str = "url",
                         out_host: str = "host",
                         invert: bool = False):
    """Drop every row whose URL's host is a blocked domain or a
    subdomain of one; appends ``out_host`` (the lowercased parsed
    host) to the survivors. Rows whose URL has no parseable host are
    DROPPED too (a CC pipeline cannot fetch them anyway; garbage rows
    should exit at the front door, not flow on hostless).

    ``blocked``: registrable domains (lowercase). The list ships in
    the task closure — fine for rule lists up to ~10^5 entries; a
    full UT1 dump (millions) should move to ``ray.put`` + a per-actor
    compiled set, the broadcast_join pattern (ops/relational.py).
    ``invert=True`` keeps ONLY blocked rows (audit mode).

    Scale shape: stateless map_batches — B Arrow kernel calls per
    batch for a B-domain list (each vectorized over all rows), no
    shuffle, no per-row Python."""
    bl = sorted({b.lower() for b in blocked})

    def _filter(batch: pa.Table) -> pa.Table:
        host = host_of_url(batch.column(url_col))
        hit = pa.array(np.zeros(batch.num_rows, dtype=bool))
        for b in bl:
            m = pc.or_(pc.equal(host, b), pc.ends_with(host, "." + b))
            hit = pc.or_kleene(hit, m)
        keep = pc.and_kleene(
            pc.is_valid(host),
            hit if invert else pc.invert(pc.fill_null(hit, False)))
        keep = pc.fill_null(keep, False)
        return batch.append_column(out_host, host).filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309 literal-prefix subset)
# ---------------------------------------------------------------------------

def parse_robots(txt: str, agent: str = "*") -> list:
    """robots.txt text -> [(prefix, allow)] rules for ``agent`` —
    the group whose User-agent matches ``agent`` exactly (case-
    insensitive), else the ``*`` group. LITERAL-PREFIX subset of RFC
    9309: rules whose path contains the ``*``/``$`` wildcards are
    skipped (documented contract — the dominant real-world rules are
    plain prefixes; a wildcard-bearing file degrades to its literal
    rules, never to a crash). An empty Disallow value is a no-op, per
    the RFC."""
    groups: dict = {}
    agents: list = []
    rules_started = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k = k.strip().lower()
        v = v.strip()
        if k == "user-agent":
            if rules_started:
                agents = []
                rules_started = False
            agents.append(v.lower())
            for a in (v.lower(),):
                groups.setdefault(a, [])
        elif k in ("allow", "disallow"):
            rules_started = True
            if not v and k == "disallow":
                continue
            if "*" in v or "$" in v:
                continue
            for a in agents:
                groups.setdefault(a, []).append((v, k == "allow"))
    return groups.get(agent.lower(), groups.get("*", []))


def filter_robots_disallowed(ds, robots: dict, url_col: str = "url",
                             agent: str = "*", out_host: str = "host"):
    """Drop rows whose URL a host's robots.txt disallows for
    ``agent`` — the politeness gate between the domain blocklist and
    the crawl scheduler. ``robots``: {host -> robots.txt text} (the
    fetcher's per-host cache; ship via closure for test-sized maps,
    ``ray.put`` past ~10^5 hosts — the blocklist note applies).

    Decision per RFC 9309: among the agent's rules whose literal
    prefix prefixes the URL PATH, the LONGEST wins; ties prefer
    allow; no matching rule (or unknown host) allows. Hostless rows
    drop (as in filter_blocked_hosts).

    Scale shape: rules compile once per call; each batch groups rows
    by host (few distinct hosts per batch) and evaluates R vectorized
    ``starts_with`` kernels per host — no per-row Python."""
    compiled = {h.lower(): parse_robots(t, agent)
                for h, t in robots.items()}

    def _filter(batch: pa.Table) -> pa.Table:
        host = host_of_url(batch.column(url_col))
        u = batch.column(url_col)
        u = (u.combine_chunks() if isinstance(u, pa.ChunkedArray)
             else u).cast(pa.string())
        path = pc.replace_substring_regex(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
        path = pc.if_else(pc.equal(path, ""), "/", path)
        n = batch.num_rows
        hv = host.to_numpy(zero_copy_only=False)
        allow = np.ones(n, dtype=bool)
        bestlen = np.full(n, -1, dtype=np.int64)
        for h in {x for x in hv.tolist() if x is not None}:
            rules = compiled.get(h)
            if not rules:
                continue
            mask = hv == h
            for prefix, rule_allow in rules:
                m = pc.starts_with(path, prefix).to_numpy(
                    zero_copy_only=False) & mask
                plen = len(prefix)
                longer = m & (bestlen < plen)
                # ties prefer allow regardless of rule order
                upd = longer | (m & (bestlen == plen) & rule_allow)
                allow[upd] = rule_allow
                bestlen[longer] = plen
            # rows of h with no matching rule keep the default allow
        keep = pa.array(allow & pc.is_valid(host).to_numpy(
            zero_copy_only=False))
        return batch.append_column(out_host, host).filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow")
