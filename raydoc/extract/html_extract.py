"""Pure-Python DOM-density main-content extraction.

This is the flagship per-row transform (BASELINE.json north_star): HTML
boilerplate stripping + main-content selection via text-density /
link-density scoring, emitting normalized text plus span offsets. It is
the engine's re-expression of the reference's HTML->text entry point
(``HtmlParser()(None, response.content)`` at
/root/reference/agent/component/invoke.py:93 and the crawler
``cleaned_html`` path at crawler.py:61-67) as a deterministic pure
function, so pipeline output is byte-identical per url at ANY
parallelism / partitioning (SURVEY.md §7 hard part 1).

Determinism rules (pinned once, never change):
  * bytes decoded as UTF-8 with errors="replace"
  * every text run is unicode-NFC normalized, whitespace collapsed to
    single spaces ("".join of runs, then ``" ".join(s.split())``)
  * blocks joined by a single "\\n"; spans index into the final text
  * all tree walks are iterative (no recursion-depth dependence on
    document nesting) and tie-breaks are document-order-first

No Ray imports here — this module is wrapped by
``raydoc.stages.extract_stage`` for distributed execution and called
directly (single-threaded) to produce golden outputs in tests.
"""

from __future__ import annotations

import re
import unicodedata
from html import unescape

__all__ = ["extract_page", "html_to_text", "parse_html"]

# Elements whose entire subtree is discarded at parse time.
_DROP = frozenset(
    "script style noscript template head svg iframe form button input select "
    "option textarea canvas object applet audio video picture map".split()
)
# Void elements: never pushed on the open-element stack.
_VOID = frozenset(
    "br img hr input meta link area base col embed source track wbr param".split()
)
# Inline elements: transparent containers during block emission.
_INLINE = frozenset(
    "a span b i em strong code small u s sup sub mark abbr cite q time var "
    "kbd samp dfn data bdi bdo ruby rt rp font big strike tt label".split()
)
# Boilerplate landmarks skipped during block emission even when they sit
# inside the selected main-content subtree.
_SKIP_EMIT = frozenset("nav aside header footer".split())
# Block-level tags that implicitly close an open <p>.
_P_CLOSERS = frozenset(
    "p div section article main aside header footer nav table ul ol li h1 h2 "
    "h3 h4 h5 h6 blockquote pre figure".split()
)
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
# Candidate containers for main-content selection.
_CANDIDATES = frozenset("body main article div section td blockquote".split())


class _Node:
    # tl/ll/np = subtree text len, link text len, <p> count — accumulated
    # during parsing as nodes close (saves a full post-order re-walk)
    __slots__ = ("tag", "children", "tl", "ll", "np")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.children: list = []  # str | _Node
        self.tl = 0
        self.ll = 0
        self.np = 0


def _collapse(s: str) -> str:
    return " ".join(s.split())


def _nfc(s: str) -> str:
    # ASCII fast path: NFC is the identity there (same output, no copy)
    if s.isascii():
        return s
    return unicodedata.normalize("NFC", s)


class _TreeBuilder:
    """Tolerant tree builder: unclosed tags are implicitly closed, stray
    end tags ignored, dropped subtrees never materialized. Driven by the
    regex scanner in ``parse_html`` (3-4x faster than stdlib
    html.parser, whose per-char goahead/updatepos bookkeeping dominated
    the extract profile; we never read attributes, so full attribute
    parsing is unnecessary)."""

    def __init__(self) -> None:
        self.root = _Node("#root")
        self.stack = [self.root]
        self.dropped = 0  # depth inside a _DROP subtree

    def _pop(self) -> None:
        """Close the top node: fold its finished stats into its parent."""
        stack = self.stack
        child = stack.pop()
        parent = stack[-1]
        parent.tl += child.tl
        parent.ll += child.tl if child.tag == "a" else child.ll
        parent.np += child.np + (1 if child.tag == "p" else 0)

    def close_all(self) -> None:
        """EOF: fold every still-open node up to the root."""
        while len(self.stack) > 1:
            self._pop()

    def handle_starttag(self, tag, attrs):
        if self.dropped:
            if tag in _DROP and tag not in _VOID:
                self.dropped += 1
            return
        if tag in _DROP:
            if tag not in _VOID:
                self.dropped += 1
            return
        if tag in _VOID:
            node = _Node(tag)
            self.stack[-1].children.append(node)
            return
        # implicit closes: <p> closed by any block-level start; <li> by <li>;
        # <td>/<th>/<tr> by their table siblings
        top = self.stack[-1].tag
        if top == "p" and tag in _P_CLOSERS:
            self._pop()
        elif tag == "li" and top == "li":
            self._pop()
        elif tag in ("td", "th") and top in ("td", "th"):
            self._pop()
        elif tag == "tr" and self.stack[-1].tag in ("td", "th"):
            self._pop()
            if self.stack[-1].tag == "tr" and len(self.stack) > 1:
                self._pop()
        elif tag == "tr" and top == "tr":
            self._pop()
        node = _Node(tag)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self.dropped or tag in _DROP:
            return
        self.stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        if self.dropped:
            if tag in _DROP and tag not in _VOID:
                self.dropped -= 1
            return
        # pop to the matching open tag if present; else ignore stray end tag
        stack = self.stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].tag == tag:
                while len(stack) > i:
                    self._pop()
                return

    def handle_data(self, data):
        if self.dropped or not data:
            return
        if not data.isspace():
            top = self.stack[-1]
            top.children.append(data)
            top.tl += len(" ".join(data.split()))
        elif self.stack[-1].children:
            # preserve a word boundary between adjacent inline elements
            self.stack[-1].children.append(" ")


# One regex per tag shape: quoted attribute values may contain '>' so the
# attrs group consumes quoted sections atomically (same recovery behavior
# as html.parser: a '<' that matches nothing is emitted as literal data).
_TAG_RE = re.compile(
    r"<(?:"
    r"(?P<comment>!--)"
    r"|(?P<decl>![^>]*>?)"
    r"|(?P<pi>\?[^>]*>?)"
    r"|(?P<close>/)?(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"
    r"(?P<end>>)?"
    r")"
)
# element-only shape for the hot path: _scan dispatches on the char
# after '<' (letter/slash -> element, '!'/'?' -> markup handled with
# find()), so the common case skips the comment/decl/pi alternation and
# extracts 4 groups instead of 7. Semantics identical to _TAG_RE, which
# remains the single-regex reference shape.
_ELEM_RE = re.compile(
    r"</?(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"
    r"(?P<end>>)?"
)
# script/style content is raw text until the matching close tag
# (html.parser's CDATA_CONTENT_ELEMENTS semantics)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def _scan(html: str, tb: _TreeBuilder) -> None:
    """Tokenize ``html`` and drive the tree builder. Character entities
    in text runs are unescaped; attributes are skipped entirely."""
    handle_data = tb.handle_data
    pos, n = 0, len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data = html[pos:]
            handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            handle_data(unescape(data) if "&" in data else data)
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "!" or nxt == "?":
            # markup declarations / comments / PIs: same recovery as
            # _TAG_RE's comment|decl|pi alternatives, via find()
            if html.startswith("!--", lt + 1):
                cend = find("-->", lt + 4)
                pos = n if cend < 0 else cend + 3
            elif html.startswith("![CDATA[", lt + 1):
                cend = find("]]>", lt)  # marked section: skip to ']]>'
                pos = n if cend < 0 else cend + 3
            else:  # decl / pi: consume to the first '>' (or EOF)
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
            continue
        m = _ELEM_RE.match(html, lt)
        if m is None:
            if nxt == "/":
                # bogus end tag like '</ p>': discard to the next '>'
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
            else:
                handle_data("<")
                pos = lt + 1
            continue
        name, attrs, end = m.group("name", "attrs", "end")
        if end is None:  # unterminated tag at EOF
            break
        name = name.lower()
        pos = m.end()
        if nxt == "/":
            tb.handle_endtag(name)
            continue
        if attrs and attrs.rstrip().endswith("/"):
            # '/' is self-closing only after whitespace, a quoted value,
            # or the bare tag name — an unquoted value like
            # href=http://x/ keeps its trailing '/' (html.parser/HTML5)
            before = attrs.rstrip()[:-1]
            if not before or before[-1] in " \t\n\r\"'":
                tb.handle_startendtag(name, ())
                continue
        tb.handle_starttag(name, ())
        cdata = _CDATA_CLOSE.get(name)
        if cdata is not None:
            mm = cdata.search(html, pos)
            if mm is None:
                break  # unterminated script/style swallows the rest
            pos = mm.start()  # close tag parsed on the next iteration


def parse_html(html: bytes | str) -> _Node:
    """Parse HTML (bytes decoded utf-8/replace) into a tolerant tree."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TreeBuilder()
    _scan(html, p)
    p.close_all()
    return p.root


def _find_first(root: _Node, tag: str) -> _Node | None:
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, _Node):
            if n.tag == tag:
                return n
            stack.extend(reversed(n.children))
    return None


def _gather_text(node: _Node, skip_tags: frozenset = frozenset()) -> str:
    """All text runs under node, document order, collapsed + NFC."""
    parts: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            parts.append(n)
        elif n.tag not in skip_tags:
            stack.extend(reversed(n.children))
    return _collapse(_nfc("".join(parts)))


def _select_main(root: _Node) -> _Node:
    """Text-density / link-density argmax over candidate containers.

    score = text_len * (1 - link_density)^2 * (1 + 0.1 * min(n_p, 30))
    where link_density = link_text_len / text_len; the squared term makes
    a clean subtree beat any ancestor that also contains link boilerplate.
    Per-subtree stats (tl/ll/np) were accumulated while parsing, as
    nodes closed. Ties broken by first-in-document-order. Falls back to
    <body> (or the whole tree) when nothing scores above zero.
    """
    body = _find_first(root, "body") or root
    best, best_score = body, -1.0
    stack = [body]
    while stack:
        n = stack.pop()
        if not isinstance(n, _Node):
            continue
        # children pushed reversed so that doc-order nodes are visited
        # first and strict '>' keeps the earliest max
        for c in reversed(n.children):
            if isinstance(c, _Node):
                stack.append(c)
        if n.tag in _CANDIDATES and n.tag not in _SKIP_EMIT:
            tl, ll, np_ = n.tl, n.ll, n.np
            if tl == 0:
                continue
            clean = 1.0 - (ll / tl)
            score = tl * clean * clean * (1.0 + 0.1 * min(np_, 30))
            if score > best_score:
                best, best_score = n, score
    return best


def _table_text(table: _Node) -> str:
    """Rows joined by \\n, cells by ' | '; nested tables flattened into
    their cell. Falls back to one gathered row when no <tr> present."""
    rows: list[str] = []
    tr_stack = [table]
    trs: list[_Node] = []
    while tr_stack:
        n = tr_stack.pop()
        if not isinstance(n, _Node):
            continue
        if n.tag == "tr":
            trs.append(n)
            continue  # nested tr handled via cell gather
        tr_stack.extend(reversed(n.children))
    for tr in trs:
        cells: list[str] = []
        cstack = list(reversed(tr.children))
        while cstack:
            n = cstack.pop()
            if not isinstance(n, _Node):
                continue
            if n.tag in ("td", "th"):
                cells.append(_gather_text(n))
            else:
                cstack.extend(reversed(n.children))
        row = " | ".join(cells).strip()
        if any(c for c in cells):
            rows.append(row)
    if not trs:
        one = _gather_text(table)
        return one
    return "\n".join(rows)


def _list_text(lst: _Node) -> str:
    """Each <li> -> '- ' + its own text (nested list items become their
    own lines, in document order)."""
    items: list[str] = []
    stack = [lst]
    while stack:
        n = stack.pop()
        if not isinstance(n, _Node):
            continue
        if n.tag == "li":
            t = _gather_text(n, skip_tags=frozenset(("ul", "ol")))
            if t:
                items.append("- " + t)
            # descend for nested lists only
            sub = [c for c in n.children if isinstance(c, _Node) and c.tag in ("ul", "ol")]
            stack.extend(reversed(sub))
        else:
            stack.extend(reversed(n.children))
    return "\n".join(items)


def _emit_blocks(main: _Node) -> list[tuple[str, int, str]]:
    """Walk the selected subtree in document order, emitting
    (kind, level, text) blocks. Containers flush an implicit-paragraph
    buffer at their boundaries; inline elements are transparent."""
    blocks: list[tuple[str, int, str]] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            t = _collapse(_nfc("".join(buf)))
            buf.clear()
            if t:
                blocks.append(("para", 0, t))

    # events: ("enter", node) | ("text", s) | ("exit", None)
    stack: list = [("enter", main)]
    first = True
    while stack:
        ev, n = stack.pop()
        if ev == "text":
            buf.append(n)
            continue
        if ev == "exit":
            flush()
            continue
        tag = n.tag
        if not first and tag in _SKIP_EMIT:
            continue
        if tag in _HEADINGS:
            flush()
            t = _gather_text(n)
            if t:
                blocks.append(("title", _HEADINGS[tag], t))
            continue
        if tag == "p" or tag in ("blockquote", "pre"):
            flush()
            t = _gather_text(n)
            if t:
                blocks.append(("para", 0, t))
            continue
        if tag == "table":
            flush()
            t = _table_text(n)
            if t:
                blocks.append(("table", 0, t))
            continue
        if tag in ("ul", "ol"):
            flush()
            t = _list_text(n)
            if t:
                blocks.append(("list", 0, t))
            continue
        if tag in _INLINE or tag == "br":
            # transparent: children join the current buffer
            for c in reversed(n.children):
                if isinstance(c, str):
                    stack.append(("text", c))
                else:
                    stack.append(("enter", c))
            continue
        # generic container: block boundary on both sides
        first = False
        flush()
        stack.append(("exit", None))
        for c in reversed(n.children):
            if isinstance(c, str):
                stack.append(("text", c))
            else:
                stack.append(("enter", c))
    flush()
    return blocks


def extract_page(html: bytes | str) -> dict:
    """html -> {"text", "spans", "status", "error"}.

    spans: list of {"start","end","kind","level"} indexing into text;
    kind in {title, para, table, list}; blocks joined by "\\n".
    Never raises: failures become in-band status="error" rows (the
    reference's error-channel convention, baidu.py:70-71).
    """
    try:
        root = parse_html(html)
        main = _select_main(root)
        blocks = _emit_blocks(main)
        if not blocks:
            return {"text": "", "spans": [], "status": "empty", "error": ""}
        parts: list[str] = []
        spans: list[dict] = []
        pos = 0
        for kind, level, t in blocks:
            start = pos
            parts.append(t)
            pos += len(t)
            spans.append({"start": start, "end": pos, "kind": kind, "level": level})
            pos += 1  # the joining "\n"
        return {
            "text": "\n".join(parts),
            "spans": spans,
            "status": "ok",
            "error": "",
        }
    except Exception as e:  # pragma: no cover - defensive
        return {"text": "", "spans": [], "status": "error", "error": repr(e)[:500]}


def html_to_text(html: bytes | str) -> str:
    """Whole-page tag strip (no main-content selection): the raw
    fallback `text` column of the pages table (FIXTURES.md §1) and the
    engine's equivalent of HtmlParser's join-all-sections behavior
    (invoke.py:93, 112)."""
    try:
        root = parse_html(html)
        body = _find_first(root, "body") or root
        return _gather_text(body)
    except Exception:
        return ""
