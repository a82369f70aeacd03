"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the corpus — extractor totality/determinism, chunker
budget/coverage rules, predicate algebra consistency."""

from hypothesis import given, settings
from hypothesis import strategies as st

from raydoc.extract.chunker import chunk_document
from raydoc.extract.html_extract import extract_page, html_to_text

# HTML-ish soup: chars plus whole-fragment tokens joined together
# (tags, comments, entities, broken pieces, control chars)
_soup = st.lists(
    st.sampled_from(
        list("abcdefghij <>/=\"'&;!-?\n\tπ✓\x00") + ["<p>", "</p>", "<div",
        "<!--", "-->", "&amp;", "<script>", "</script>", "<![CDATA[", "]]>"]
    ),
    max_size=120,
).map("".join)


class TestExtractorProperties:
    @settings(max_examples=200, deadline=None)
    @given(_soup)
    def test_never_raises_and_deterministic(self, s):
        a = extract_page(s)
        b = extract_page(s)
        assert a == b
        assert a["status"] in ("ok", "empty", "error")

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=300))
    def test_arbitrary_bytes_total(self, raw):
        res = extract_page(raw)
        assert res["status"] in ("ok", "empty", "error")
        assert isinstance(html_to_text(raw), str)

    @settings(max_examples=100, deadline=None)
    @given(_soup)
    def test_spans_index_into_text(self, s):
        res = extract_page(s)
        text = res["text"]
        spans = res["spans"]
        for sp in spans:
            assert 0 <= sp["start"] <= sp["end"] <= len(text)
            assert sp["kind"] in ("title", "para", "table", "list")
            assert text[sp["start"]:sp["end"]] != ""
        # spans tile the text contiguously, joined by exactly one "\n"
        if spans:
            assert spans[0]["start"] == 0 and spans[-1]["end"] == len(text)
        for a, b in zip(spans, spans[1:]):
            assert b["start"] == a["end"] + 1
            assert text[a["end"]] == "\n"


_span_kind = st.sampled_from(["title", "para", "table", "list"])


@st.composite
def _doc(draw):
    """A synthetic (text, spans) pair in the extractor's output shape."""
    blocks = draw(st.lists(
        st.tuples(_span_kind,
                  st.integers(1, 6),
                  st.text(alphabet="ab c", min_size=1, max_size=120)),
        min_size=0, max_size=12,
    ))
    parts, spans, pos = [], [], 0
    for kind, level, raw in blocks:
        t = " ".join(raw.split())
        if not t:
            continue
        parts.append(t)
        spans.append({"start": pos, "end": pos + len(t), "kind": kind,
                      "level": level if kind == "title" else 0})
        pos += len(t) + 1
    return "\n".join(parts), spans


class TestChunkerProperties:
    @settings(max_examples=200, deadline=None)
    @given(_doc(), st.integers(2, 64))
    def test_budget_and_coverage(self, doc, budget):
        text, spans = doc
        chunks = chunk_document(text, spans, token_budget=budget, min_tokens=2)
        body_seq = [
            tok for s in spans if s["kind"] != "title"
            for tok in text[s["start"]:s["end"]].split()
        ]
        # every non-title token lands in exactly one chunk, IN ORDER
        chunk_seq = [tok for c in chunks for tok in c["text"].split()]
        assert chunk_seq == body_seq
        for c in chunks:
            # token_count is truthful; the runt merge is gated on the
            # combined count fitting, so the budget is a hard cap
            assert c["token_count"] == len(c["text"].split())
            assert c["token_count"] <= budget
        # ids are dense 0..n-1
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))

    @settings(max_examples=100, deadline=None)
    @given(_doc())
    def test_title_path_reflects_hierarchy(self, doc):
        text, spans = doc
        chunks = chunk_document(text, spans, token_budget=16)
        # replay the pinned stack rule: level L pops all levels >= L
        stack: list[tuple[int, str]] = []
        expected_path: list[str] = []
        path_at_token: list[list[str]] = []
        for s in spans:
            seg = text[s["start"]:s["end"]]
            if s["kind"] == "title":
                lvl = s["level"] or 1
                while stack and stack[-1][0] >= lvl:
                    stack.pop()
                stack.append((lvl, seg))
                expected_path = [t for _, t in stack]
            else:
                path_at_token.extend([list(expected_path)] * len(seg.split()))
        pos = 0
        for c in chunks:
            for _ in c["text"].split():
                assert c["title_path"] == path_at_token[pos]
                pos += 1


class TestPredicateProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=32), min_size=1, max_size=20),
           st.floats(allow_nan=False, allow_infinity=False, width=32))
    def test_numeric_operators_match_python(self, xs, v):
        import pyarrow as pa

        from raydoc.ops.predicates import OPERATORS

        col = pa.array(xs, pa.float64())
        for op, fn in (("=", lambda a, b: a == b), (">", lambda a, b: a > b),
                       ("<", lambda a, b: a < b), ("≥", lambda a, b: a >= b),
                       ("≤", lambda a, b: a <= b), ("≠", lambda a, b: a != b)):
            got = OPERATORS[op](col, v).to_pylist()
            assert got == [fn(x, float(v)) for x in xs]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet="abc ", max_size=6), min_size=1,
                    max_size=20),
           st.text(alphabet="abc ", max_size=6))
    def test_string_operators_match_python(self, xs, v):
        import pyarrow as pa

        from raydoc.ops.predicates import OPERATORS

        col = pa.array(xs, pa.string())
        assert OPERATORS["contains"](col, v).to_pylist() == [v in x for x in xs]
        assert OPERATORS["start with"](col, v).to_pylist() == [
            x.startswith(v) for x in xs]
        assert OPERATORS["end with"](col, v).to_pylist() == [
            x.endswith(v) for x in xs]
        # non-numeric strings take the string-compare fallback
        assert OPERATORS["="](col, v).to_pylist() == [x == v for x in xs]
        assert OPERATORS["≠"](col, v).to_pylist() == [x != v for x in xs]


class TestTextOpProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(max_size=120), min_size=1, max_size=12))
    def test_pii_redaction_idempotent_and_counted(self, texts):
        import pyarrow as pa

        from raydoc.ops.text import pii_redact_batch

        b = pa.table({"text": pa.array(texts, pa.string())})
        once = pii_redact_batch(b)
        twice = pii_redact_batch(
            pa.table({"text": once.column("text_redacted")}))
        # redaction is idempotent: a scrubbed text has nothing to scrub
        assert (twice.column("text_redacted").to_pylist()
                == once.column("text_redacted").to_pylist())
        assert twice.column("n_pii").to_pylist() == [0] * len(texts)
        # and n_pii counts every substitution made
        for t, red, n in zip(texts, once.column("text_redacted").to_pylist(),
                             once.column("n_pii").to_pylist()):
            assert red.count("<EMAIL>") + red.count("<PHONE>") >= 0
            if n == 0:
                assert red == t

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                    max_size=40),
           st.integers(min_value=1, max_value=600))
    def test_pack_sequences_invariants(self, toks, budget):
        import pyarrow as pa

        from raydoc.ops.window import pack_sequences

        import ray.data as rd

        rows = [{"k": "x", "i": i, "tok": t} for i, t in enumerate(toks)]
        out = pack_sequences(rd.from_items(rows), "tok", budget, ["i"],
                             key_col="k").to_pandas().sort_values("i")
        packs = list(out["pack_id"])
        # pack ids are nondecreasing in document order and start at 0
        assert packs[0] == 0
        assert all(a <= b for a, b in zip(packs, packs[1:]))
        # offset-based bound: a pack never exceeds budget + max_doc - 1
        mx = max(toks)
        sums = out.groupby("pack_id")["tok"].sum()
        assert (sums <= budget + max(mx - 1, 0)).all()

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.text(alphabet="ab \n", max_size=40), min_size=1,
                    max_size=10))
    def test_repetition_bounds(self, texts):
        import pyarrow as pa

        from raydoc.ops.text import repetition_batch

        out = repetition_batch(pa.table({"text": pa.array(texts,
                                                          pa.string())}))
        for d, t in zip(out.column("dup_word_frac").to_pylist(),
                        out.column("top_word_frac").to_pylist()):
            assert 0.0 <= d < 1.0 or d == 0.0
            assert 0.0 <= t <= 1.0


class TestSegmentDedupProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(alphabet="abc ", max_size=30), min_size=1,
                    max_size=12),
           st.integers(min_value=1, max_value=9))
    def test_explode_reassemble_roundtrip(self, texts, seg_words):
        import numpy as np
        import pyarrow as pa

        from raydoc.ops.dedup import _explode_segments, _reassemble

        b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ids, doc_idx, seg_no, segs, nseg = _explode_segments(
            b, "text", "doc_id", seg_words)
        # segments tile each doc: joining them back with ' ' is identity
        out = _reassemble(b, "doc_id", doc_idx, segs, nseg,
                          np.ones(len(doc_idx), dtype=bool))
        assert out.column("text_clean").to_pylist() == texts
        assert out.column("n_removed").to_pylist() == [0] * len(texts)
        # per-doc segment counts are ceil(words/seg_words)
        for t, n in zip(texts, out.column("n_segs").to_pylist()):
            assert n == -(-len(t.split(" ")) // seg_words)
        # and each segment is the right slice of its doc's words
        segs_py = segs.to_pylist()
        for d, s, seg in zip(doc_idx, seg_no, segs_py):
            ws = texts[d].split(" ")
            assert seg == " ".join(ws[s * seg_words:(s + 1) * seg_words])

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(alphabet="ab ", max_size=20), min_size=1,
                    max_size=10),
           st.integers(min_value=1, max_value=4),
           st.data())
    def test_reassemble_arbitrary_keep_mask(self, texts, seg_words, data):
        import numpy as np
        import pyarrow as pa

        from raydoc.ops.dedup import _explode_segments, _reassemble

        b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ids, doc_idx, seg_no, segs, nseg = _explode_segments(
            b, "text", "doc_id", seg_words)
        keep = np.array(data.draw(st.lists(
            st.booleans(), min_size=len(doc_idx), max_size=len(doc_idx))),
            dtype=bool)
        out = _reassemble(b, "doc_id", doc_idx, segs, nseg, keep)
        segs_py = segs.to_pylist()
        for d in range(len(texts)):
            mine = out.column("text_clean")[d].as_py()
            expect = " ".join(s for s, di, k in zip(segs_py, doc_idx, keep)
                              if di == d and k)
            assert mine == expect
            assert out.column("n_removed")[d].as_py() == int(
                (~keep[doc_idx == d]).sum())


class TestUrlCanonProperties:
    # URL-ish soup: schemes, mixed-case hosts, ports, paths, params
    # (incl. tracking), fragments — plus arbitrary junk
    _urlish = st.one_of(
        st.builds(
            lambda sch, host, port, path, qs, frag:
                f"{sch}://{host}{port}{path}{qs}{frag}",
            st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"]),
            st.text(alphabet="aBcD.-", min_size=1, max_size=12),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.text(alphabet="/AbC9._~%", max_size=12),
            st.sampled_from(["", "?a=1", "?b=2&a=1", "?utm_source=x&a=1",
                             "?gclid=z", "?a=1&a=0", "?&", "?=v"]),
            st.sampled_from(["", "#frag", "#"]),
        ),
        st.text(max_size=40),
    )

    @settings(max_examples=300, deadline=None)
    @given(_urlish)
    def test_idempotent_and_total(self, url):
        import pyarrow as pa

        from raydoc.ops.url import canonicalize_url_batch

        t = pa.table({"url": pa.array([url], pa.string())})
        once = canonicalize_url_batch(t).column("canon_url")[0].as_py()
        t2 = pa.table({"url": pa.array([once], pa.string())})
        twice = canonicalize_url_batch(t2).column("canon_url")[0].as_py()
        assert twice == once  # canonical form is a fixed point
        # canonical http(s) urls never keep fragments or tracking params
        if once.startswith(("http://", "https://")):
            assert "#" not in once
            assert "utm_" not in once and "gclid" not in once

    @settings(max_examples=50, deadline=None)
    @given(st.lists(_urlish, min_size=2, max_size=8))
    def test_batching_invariant(self, urls):
        """Canonicalization is per-row pure: the batch split must never
        change any row's output."""
        import pyarrow as pa

        from raydoc.ops.url import canonicalize_url_batch

        whole = canonicalize_url_batch(
            pa.table({"url": pa.array(urls, pa.string())})
        ).column("canon_url").to_pylist()
        solo = [canonicalize_url_batch(
                    pa.table({"url": pa.array([u], pa.string())})
                ).column("canon_url")[0].as_py() for u in urls]
        assert whole == solo


class TestMinhashProperties:
    _words = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=5),
                      min_size=1, max_size=40).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(_words, _words)
    def test_estimate_bounds_identity_symmetry(self, ta, tb):
        import numpy as np

        from raydoc.ops.dedup import _doc_minhash, _perm_params

        a, b = _perm_params(64)
        sa = _doc_minhash(ta, a, b, k=5)
        sb = _doc_minhash(tb, a, b, k=5)
        # identical text -> identical signature -> estimate exactly 1
        assert (_doc_minhash(ta, a, b, k=5) == sa).all()
        est = float((sa == sb).mean())
        assert 0.0 <= est <= 1.0
        assert est == float((sb == sa).mean())  # symmetric
        if ta == tb:
            assert est == 1.0
        # signatures are deterministic uint64 vectors of fixed width
        assert sa.dtype == np.uint64 and len(sa) == 64


class TestLinkgraphKernelProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.binary(max_size=200), min_size=0, max_size=8))
    def test_extract_links_total_on_arbitrary_bytes(self, pages):
        """extract_links_batch is a total function of arbitrary html
        bytes: never throws, emits the fixed schema, every host it
        emits is lowercase ASCII, and it is deterministic."""
        import pyarrow as pa

        from raydoc.ops.linkgraph import extract_links_batch

        b = pa.table({
            "url": ["https://h.example/x"] * len(pages),
            "html": pa.array(pages, pa.binary())})
        t1 = extract_links_batch(b)
        t2 = extract_links_batch(b)
        assert t1.column_names == ["src_host", "dst_host"]
        assert t1.equals(t2)
        for h in t1.column("dst_host").to_pylist():
            assert h == h.lower()
            h.encode("ascii")

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 999)),
                    min_size=1, max_size=200))
    def test_partial_idx_sums_matches_bincount(self, pairs):
        import numpy as np
        import pyarrow as pa

        from raydoc.ops.linkgraph import _partial_idx_sums

        idx = np.array([p[0] for p in pairs], dtype=np.int64)
        val = np.array([p[1] for p in pairs], dtype=np.int64)
        t = _partial_idx_sums(
            pa.table({"i": idx}), "i", val)
        got = {r["i"]: r["s"] for r in t.to_pylist()}
        ref = {int(i): int(val[idx == i].sum()) for i in set(idx.tolist())}
        assert got == ref


class TestLMKernelProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(alphabet="ab c", max_size=24),
                    min_size=0, max_size=8))
    def test_bigram_keys_match_python(self, texts):
        """_bigram_keys emits exactly the consecutive in-doc pairs of
        the contract tokenization, in order, with the right doc idx."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from raydoc.ops.lm import _SEP, _bigram_keys, _tokens

        b = pa.table({"text": pa.array(texts, pa.string())})
        keys, w1, docidx = _bigram_keys(_tokens(b, "text"))
        got = list(zip(docidx.tolist(),
                       [k.split(_SEP)[0] for k in keys.to_pylist()],
                       [k.split(_SEP)[1] for k in keys.to_pylist()]))
        ref = []
        for i, s in enumerate(texts):
            tk = s.strip().lower().split()
            if not tk:
                # Arrow split of "" yields [''] — one empty token,
                # zero bigrams either way for len<2
                tk = [""]
            ref.extend((i, a, bb) for a, bb in zip(tk, tk[1:]))
        assert got == ref
        assert w1.to_pylist() == [a for _, a, _ in ref]


class TestFrontDoorParserProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def test_warc_parser_total_on_arbitrary_bytes(self, buf):
        """parse_warc_bytes never throws and never fabricates rows
        from non-WARC bytes (a row requires a real record header)."""
        from raydoc.sources.warc import parse_warc_bytes

        t = parse_warc_bytes(buf)
        assert t.column_names == ["url", "warc_ts", "html"]
        if not buf.startswith(b"WARC/"):
            assert t.num_rows == 0

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400),
           st.booleans())
    def test_sitemap_parser_total_on_arbitrary_bytes(self, buf,
                                                     gz_prefix):
        from raydoc.sources.sitemap import parse_sitemap_bytes

        if gz_prefix:  # corrupt gzip magic must fail soft, not throw
            buf = b"\x1f\x8b" + buf
        t, children = parse_sitemap_bytes(buf)
        assert t.column_names == ["url", "lastmod"]
        assert isinstance(children, list)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.binary(max_size=300), min_size=0, max_size=6))
    def test_canonical_kernel_total_and_deterministic(self, pages):
        import pyarrow as pa

        from raydoc.ops.linkgraph import extract_canonical_batch

        b = pa.table({"html": pa.array(pages, pa.binary())})
        t1 = extract_canonical_batch(b)
        t2 = extract_canonical_batch(b)
        assert t1.equals(t2)
        for v in t1.column("canonical").to_pylist():
            assert v is None or v.isascii()

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=300))
    def test_robots_parser_total(self, txt):
        from raydoc.ops.url import parse_robots

        rules = parse_robots(txt)
        assert all(isinstance(p, str) and isinstance(a, bool)
                   for p, a in rules)
