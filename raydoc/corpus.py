"""Deterministic synthetic Common-Crawl-style pages corpus (seed=42).

The flagship input table (BASELINE.json input_hint) does not exist under
/root/testdata, so the engine synthesizes it: ``(url, warc_ts, html,
text, lang)``, FIXTURES.md §1. Generation is PER-ROW deterministic —
row i is produced from ``random.Random(f"{seed}:{i}")`` — so any
partitioning / parallelism yields byte-identical rows, and golden
outputs in tests are reproducible without storing fixtures.

Hosts are Zipf-skewed over ~50 synthetic hosts to exercise the url-hash
repartitioning / host-skew handling of the flagship pipeline.
Pathological variants (multi-MB docs, deep nesting, unclosed tags,
empty body, non-UTF8 bytes, html-in-attribute traps) appear on fixed
row-index strides.

Pure generation lives in ``gen_rows`` (no Ray); ``ensure_pages_parquet``
wraps it in a Ray Dataset to materialize a cached parquet directory.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa

from raydoc.extract.html_extract import html_to_text
from raydoc.schemas import PAGES_SCHEMA

SEED = 42
# bump when gen_row/_page_html change: invalidates cached corpora
GEN_VERSION = 2
_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

_HOSTS = [f"site{i:02d}.example.{tld}" for i, tld in zip(range(50), (
    ["com"] * 20 + ["org"] * 15 + ["net"] * 10 + ["io"] * 5))]
# Zipf-ish host weights: host k picked with weight 1/(k+1)
_HOST_WEIGHTS = [1.0 / (k + 1) for k in range(len(_HOSTS))]

_LANGS = ["en", "zh-cn", "de", "fr", "es", "ja", "ru", "ar"]
_LANG_WEIGHTS = [0.55, 0.08, 0.08, 0.08, 0.07, 0.05, 0.05, 0.04]

_VOCAB = {
    "en": ("the of and to in is for on with as by data ray stream batch block "
           "shuffle partition actor pool arrow parquet table column row page "
           "content extract chunk title text density link score main engine "
           "pipeline worker node cluster memory spill object store scale "
           "throughput latency document corpus crawl web html parse tree "
           "heading paragraph list item cell value result output input "
           "system process model index query search match filter group "
           "aggregate join sort limit sample union distinct hash key range "
           "window event time series metric lineage manifest resume commit "
           "atomic rename golden byte identical url host path skew salt").split(),
    "de": ("der die das und zu in ist für auf mit als durch daten strom "
           "stapel block mischen partition schauspieler pfeil tabelle spalte "
           "zeile seite inhalt auszug stück titel text dichte verbindung "
           "punktzahl haupt motor leitung arbeiter knoten gruppe speicher").split(),
    "fr": ("le la les et de dans est pour sur avec comme par données flux "
           "lot bloc mélange partition acteur flèche table colonne ligne "
           "page contenu extrait morceau titre texte densité lien score "
           "principal moteur pipeline travailleur noeud grappe mémoire").split(),
    "es": ("el la los y de en es para sobre con como por datos flujo lote "
           "bloque mezcla partición actor flecha tabla columna fila página "
           "contenido extracto trozo título texto densidad enlace puntaje "
           "principal motor tubería trabajador nodo grupo memoria").split(),
    "ru": ("и в не на я быть он с что а по это она этот к но они мы данные "
           "поток пакет блок раздел актор таблица столбец строка страница "
           "содержание извлечь кусок заголовок текст плотность ссылка").split(),
    "zh-cn": "数据 流 批 块 分区 演员 箭头 表 列 行 页面 内容 提取 标题 文本 密度 链接 分数 主要 引擎 管道 工作 节点 集群 内存".split(),
    "ja": "データ ストリーム バッチ ブロック パーティション アクター テーブル 列 行 ページ 内容 抽出 タイトル テキスト 密度 リンク".split(),
    "ar": "بيانات تدفق دفعة كتلة قسم ممثل جدول عمود صف صفحة محتوى استخراج عنوان نص كثافة رابط".split(),
}


def _words(rng: random.Random, lang: str, n: int) -> str:
    vocab = _VOCAB.get(lang, _VOCAB["en"])
    return " ".join(rng.choice(vocab) for _ in range(n))


def _sentence(rng: random.Random, lang: str) -> str:
    s = _words(rng, lang, rng.randint(5, 14))
    return s[:1].upper() + s[1:] + "."


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 6)))


def _nav(rng: random.Random) -> str:
    links = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>'
        for w in rng.sample(_VOCAB["en"], rng.randint(4, 8))
    )
    return f"<nav><ul>{links}</ul></nav>"


def _sidebar(rng: random.Random) -> str:
    ads = "".join(
        f'<div class="ad"><a href="https://ads.example.com/{i}">'
        f"{_words(rng, 'en', 3)}</a></div>"
        for i in range(rng.randint(2, 5))
    )
    links = "".join(
        f'<a href="/tag/{w}">{w}</a> ' for w in rng.sample(_VOCAB["en"], 6)
    )
    return f'<aside class="sidebar">{ads}<div class="tags">{links}</div></aside>'


def _footer(rng: random.Random) -> str:
    return (
        "<footer><p>© 2024 Example Site. "
        + " ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(_VOCAB["en"], 5))
        + "</p></footer>"
    )


def _table_html(rng: random.Random, lang: str, nrows: int | None = None) -> str:
    nrows = nrows or rng.randint(2, 6)
    ncols = rng.randint(2, 4)
    head = "<tr>" + "".join(f"<th>{_words(rng, lang, 2)}</th>" for _ in range(ncols)) + "</tr>"
    rows = "".join(
        "<tr>" + "".join(f"<td>{_words(rng, lang, rng.randint(1, 4))}</td>" for _ in range(ncols)) + "</tr>"
        for _ in range(nrows)
    )
    return f"<table>{head}{rows}</table>"


def _list_html(rng: random.Random, lang: str) -> str:
    items = "".join(f"<li>{_words(rng, lang, rng.randint(2, 8))}</li>" for _ in range(rng.randint(3, 7)))
    tag = rng.choice(["ul", "ol"])
    return f"<{tag}>{items}</{tag}>"


def _main_content(rng: random.Random, lang: str) -> str:
    parts = [f"<h1>{_words(rng, lang, rng.randint(3, 8)).title()}</h1>"]
    for _ in range(rng.randint(2, 5)):
        parts.append(f"<h2>{_words(rng, lang, rng.randint(2, 6)).title()}</h2>")
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            if r < 0.72:
                parts.append(f"<p>{_paragraph(rng, lang)}</p>")
            elif r < 0.82:
                parts.append(_table_html(rng, lang))
            elif r < 0.92:
                parts.append(_list_html(rng, lang))
            else:
                parts.append(f"<h3>{_words(rng, lang, rng.randint(2, 5)).title()}</h3>"
                             f"<p>{_paragraph(rng, lang)}</p>")
    return "\n".join(parts)


def _page_html(rng: random.Random, lang: str, wrapper: int,
               layout: int) -> bytes:
    """12 wrapper x 3 layout template variants (drawn INDEPENDENTLY by
    the caller so all 36 combinations occur; a single variant%12 /
    variant%3 draw would reach only 12 of them)."""
    main = _main_content(rng, lang)
    nav, side, foot = _nav(rng), _sidebar(rng), _footer(rng)
    title = _words(rng, "en", 4)
    wrappers = [
        f"<main>{main}</main>",
        f'<article class="post">{main}</article>',
        f'<div id="content">{main}</div>',
        f'<section class="main">{main}</section>',
        f'<div class="wrap"><div class="inner">{main}</div></div>',
        f"<main><article>{main}</article></main>",
        f'<td class="body">{main}</td>'.join(("<table><tr>", "<td>%s</td></tr></table>" % side)),
        f'<div class="col-8">{main}</div><div class="col-4">{side}</div>',
        f"<blockquote>{main}</blockquote>",
        f'<div data-x="&lt;p&gt;trap&lt;/p&gt;" title="<b>not html</b>">{main}</div>',
        f"<main>{main}</main><script>var x = '<p>never emitted</p>';</script>",
        f"<main>{main}</main><style>p {{ color: red }}</style>",
    ]
    body_core = wrappers[wrapper % len(wrappers)]
    layouts = [
        f"<header><h1>{title}</h1>{nav}</header>{body_core}{side}{foot}",
        f"{nav}{body_core}{foot}",
        f"<header>{nav}</header><div class='page'>{side}{body_core}</div>{foot}",
    ]
    body = layouts[layout % len(layouts)]
    return (
        f"<!DOCTYPE html><html lang='{lang}'><head><title>{title}</title>"
        f"<meta charset='utf-8'><style>body{{margin:0}}</style>"
        f"<script>window.q=[];</script></head><body>{body}</body></html>"
    ).encode("utf-8")


def _pathological(rng: random.Random, lang: str, kind: int) -> bytes:
    if kind == 0:  # deeply nested divs
        depth = 400
        core = f"<p>{_paragraph(rng, lang)}</p>"
        return (
            "<html><body>" + "<div>" * depth + core + "</div>" * depth + "</body></html>"
        ).encode("utf-8")
    if kind == 1:  # huge table (large doc)
        return (
            "<html><body><main><h1>big table</h1>"
            + _table_html(rng, lang, nrows=400)
            + "</main></body></html>"
        ).encode("utf-8")
    if kind == 2:  # unclosed tags
        return (
            f"<html><body><div><p>{_paragraph(rng, lang)}"
            f"<p>{_paragraph(rng, lang)}<ul><li>{_words(rng, lang, 4)}"
            f"<li>{_words(rng, lang, 4)}<div><h2>{_words(rng, lang, 3)}"
            f"<p>{_paragraph(rng, lang)}"
        ).encode("utf-8")
    if kind == 3:  # empty body
        return b"<html><head><title>empty</title></head><body>   </body></html>"
    if kind == 4:  # non-UTF8 bytes
        good = f"<html><body><p>{_paragraph(rng, lang)}</p>".encode("utf-8")
        return good + b"\xff\xfe\x9c<p>after bad bytes</p></body></html>"
    # kind 5: html-in-attribute trap
    return (
        f'<html><body><div data-html="&lt;script&gt;x&lt;/script&gt;" '
        f'title="<p>attr trap</p>"><p>{_paragraph(rng, lang)}</p></div></body></html>'
    ).encode("utf-8")


def gen_row(i: int, seed: int = SEED, with_text: bool = True) -> dict:
    """Row i of the corpus — pure function of (i, seed). ``with_text``
    skips the html_to_text fallback column (a second full parse) for
    callers that only need the html payload."""
    rng = random.Random(f"{seed}:{i}")
    lang = rng.choices(_LANGS, weights=_LANG_WEIGHTS, k=1)[0]
    host = rng.choices(_HOSTS, weights=_HOST_WEIGHTS, k=1)[0]
    url = f"https://{host}/p/{i:08d}/{_words(rng, 'en', 1)}"
    if i > 0 and i % 97 == 0:
        html = _pathological(rng, lang, (i // 97) % 6)
    else:
        html = _page_html(rng, lang, wrapper=rng.randrange(12),
                          layout=rng.randrange(3))
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
        "html": html,
        "text": html_to_text(html) if with_text else "",
        "lang": lang,
    }


def gen_rows(start: int, stop: int, seed: int = SEED) -> pa.Table:
    rows = [gen_row(i, seed) for i in range(start, stop)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def n_pages_for_sf(sf: float) -> int:
    """sf0.001 -> 1k, sf0.01 -> 10k, sf0.1 -> 100k (FIXTURES.md §1)."""
    return max(1, int(round(sf * 1_000_000)))


def ensure_pages_parquet(
    sf: float,
    base_dir: str = "/tmp/raydoc_pages",
    seed: int = SEED,
) -> str:
    """Materialize (once) the pages corpus for a scale factor as a
    partitioned parquet directory; returns the directory path.

    Uses Ray to generate in parallel — generation is per-row
    deterministic so the cached table is identical regardless of
    parallelism. Caller owns the Ray session.
    """
    n = n_pages_for_sf(sf)
    out = os.path.join(base_dir, f"sf{sf}_s{seed}_g{GEN_VERSION}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    import ray.data as rd

    def _gen(batch):
        rows = [gen_row(i, seed) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    import shutil

    tmp = out + ".tmp"
    for d in (tmp, out):
        if os.path.exists(d):
            shutil.rmtree(d)
    (
        rd.range(n)
        .map_batches(_gen, batch_format="pyarrow", batch_size=512)
        .write_parquet(tmp)
    )
    os.replace(tmp, out)
    with open(done, "w") as f:
        f.write(str(n))
    return out
