"""Unit tests for the pure HTML extractor (no Ray)."""

from raydoc.extract.html_extract import extract_page, html_to_text


def test_basic_main_content():
    html = b"""<html><head><title>t</title><script>x=1</script></head>
    <body><nav><a href='/a'>Home</a><a href='/b'>About</a></nav>
    <main><h1>Hello World</h1><p>First paragraph here with several words.</p>
    <h2>Section</h2><p>Second paragraph.</p></main>
    <footer><a href='/c'>contact</a></footer></body></html>"""
    res = extract_page(html)
    assert res["status"] == "ok"
    lines = res["text"].split("\n")
    assert lines[0] == "Hello World"
    assert "First paragraph here with several words." in lines
    assert "Home" not in res["text"]  # nav boilerplate stripped
    assert "contact" not in res["text"]  # footer stripped
    kinds = [s["kind"] for s in res["spans"]]
    assert kinds == ["title", "para", "title", "para"]
    assert [s["level"] for s in res["spans"]] == [1, 0, 2, 0]
    # spans index into text exactly
    for s, expected in zip(res["spans"], lines):
        assert res["text"][s["start"] : s["end"]] == expected


def test_density_prefers_content_over_linkfarm():
    linkfarm = "".join(f"<a href='/{i}'>link text number {i}</a> " for i in range(40))
    html = f"""<html><body>
    <div id="links">{linkfarm}</div>
    <div id="content"><p>{'real content word ' * 50}</p></div>
    </body></html>""".encode()
    res = extract_page(html)
    assert "real content word" in res["text"]
    assert "link text number" not in res["text"]


def test_table_and_list():
    html = b"""<html><body><main>
    <table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>
    <ul><li>alpha</li><li>beta</li></ul>
    </main></body></html>"""
    res = extract_page(html)
    assert "A | B\n1 | 2" in res["text"]
    assert "- alpha\n- beta" in res["text"]
    assert {s["kind"] for s in res["spans"]} == {"table", "list"}


def test_unclosed_tags_and_empty():
    res = extract_page(b"<html><body><div><p>one<p>two<ul><li>a<li>b")
    assert res["status"] == "ok"
    assert "one" in res["text"] and "two" in res["text"]
    assert "- a" in res["text"] and "- b" in res["text"]

    res = extract_page(b"<html><body>   </body></html>")
    assert res["status"] == "empty"
    assert res["text"] == "" and res["spans"] == []


def test_script_style_attr_traps_never_leak():
    html = (
        b"<html><body><main><p>keep this</p></main>"
        b"<script>var s='<p>leaked script</p>';</script>"
        b"<style>p{color:red}</style>"
        b"<div title='<p>leaked attr</p>'></div></body></html>"
    )
    res = extract_page(html)
    assert "keep this" in res["text"]
    assert "leaked" not in res["text"]


def test_non_utf8_bytes():
    res = extract_page(b"<html><body><p>before</p>\xff\xfe<p>after</p></body></html>")
    assert res["status"] == "ok"
    assert "before" in res["text"] and "after" in res["text"]


def test_deep_nesting_no_recursion_error():
    html = ("<div>" * 5000 + "<p>deep</p>" + "</div>" * 5000).encode()
    res = extract_page(b"<html><body>" + html + b"</body></html>")
    assert res["status"] == "ok"
    assert "deep" in res["text"]


def test_determinism_and_purity():
    from raydoc.corpus import gen_row

    for i in (0, 7, 97, 131):
        html = gen_row(i)["html"]
        a, b = extract_page(html), extract_page(html)
        assert a == b


def test_html_to_text_keeps_everything():
    html = b"<html><body><nav>navtext</nav><p>body text</p></body></html>"
    t = html_to_text(html)
    assert "navtext" in t and "body text" in t


def test_scanner_tag_recovery():
    """Tokenizer semantics pinned: quoted '>', comments, CDATA marked
    sections, bogus end tags, stray '<', and malformed-at-EOF tails."""
    from raydoc.extract.html_extract import extract_page

    # '>' inside a quoted attribute does not end the tag
    assert extract_page('<body><div title="a>b"><p>hello world</p></div></body>')[
        "text"] == "hello world"
    # comments (incl. markup inside) are discarded
    assert extract_page("<body><!-- <p>no</p> --><p>yes</p></body>")["text"] == "yes"
    # CDATA marked section skipped to ']]>'
    assert extract_page("<body><![CDATA[ raw <x> ]]><p>t</p></body>")["text"] == "t"
    # bogus end tag '</ p>' is discarded, not emitted as text
    assert extract_page("<body><p>one</ p><p>two</p></body>")["text"] == "one\ntwo"
    # stray '<' in text is literal data
    assert extract_page("<body><p>3 < 5 and 7 > 2</p></body>")["text"] == "3 < 5 and 7 > 2"
    # script/style content is raw text until the real close tag
    assert extract_page(
        '<body><script>if(a<b&&c>d){"</div>"}</script><p>text</p></body>'
    )["text"] == "text"
    # malformed tails at EOF (unterminated tag/comment) are dropped
    assert extract_page('<body><p>ok</p><div class="x')["text"] == "ok"
    assert extract_page("<body><p>before</p><!-- oops <p>gone")["text"] == "before"
    # entities unescaped in text runs
    assert extract_page("<body><p>a &amp; b &lt;x&gt; &#65;</p></body>")[
        "text"] == "a & b <x> A"


def test_multi_megabyte_document():
    """A single multi-MB page must extract correctly and in bounded time
    (the long-tail giant-doc case SURVEY.md §4 calls out)."""
    import time

    from raydoc.extract.html_extract import extract_page

    para = "<p>" + "lorem ipsum dolor sit amet " * 40 + "</p>"
    html = ("<html><body><nav>menu</nav><main>" + para * 2000 +
            "</main><footer>foot</footer></body></html>").encode()
    assert len(html) > 2_000_000
    t0 = time.perf_counter()
    res = extract_page(html)
    dt = time.perf_counter() - t0
    assert res["status"] == "ok"
    assert len(res["spans"]) == 2000
    assert "menu" not in res["text"] and "lorem ipsum" in res["text"]
    assert dt < 10.0  # linear-time guarantee, generous CI margin
