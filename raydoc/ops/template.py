"""Per-row template rendering: the engine's projection counterpart of
the reference's Template component (/root/reference/agent/component/
template.py:70-139).

The reference renders in TWO passes: (1) a Jinja2
``SandboxedEnvironment(autoescape=True, undefined=StrictUndefined)``
render of the whole template against the gathered kwargs, with any
render exception silently swallowed (template.py:115-125 — the content
survives unrendered); (2) literal ``{ref}`` substitution of whatever
placeholders remain (template.py:127-139). ``render_batch`` reproduces
both passes per row — so ``{% if %}`` / ``{% for %}`` conditionals work
— with the Jinja template COMPILED ONCE per worker process (an LRU
keyed by template text; the reference recompiles per run,
template.py:115-118) and only the referenced columns materialized per
batch. Unknown literal placeholders are left verbatim (the reference
leaves unresolved refs in place too)."""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["render_batch", "render_op", "jinja_template", "jinja_vars"]

_REF_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")
_JINJA_RE = re.compile(r"\{\{|\{%")

_TPL_CACHE: dict[str, tuple[object, frozenset[str]]] = {}


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def jinja_template(template: str):
    """(compiled sandboxed template, referenced variable names) for a
    template that uses Jinja syntax; (None, frozenset()) otherwise.
    Compiled once per worker process — stateful setup out of the
    per-batch path."""
    if not _JINJA_RE.search(template):
        return None, frozenset()
    hit = _TPL_CACHE.get(template)
    if hit is not None:
        return hit
    import jinja2
    import jinja2.meta
    from jinja2.sandbox import SandboxedEnvironment

    env = SandboxedEnvironment(
        autoescape=True, undefined=jinja2.StrictUndefined)
    try:
        tpl = env.from_string(template)
        refs = frozenset(
            jinja2.meta.find_undeclared_variables(env.parse(template)))
    except jinja2.TemplateError:
        # a malformed template renders as itself (the reference
        # swallows render errors the same way, template.py:123-125)
        tpl, refs = None, frozenset()
    _TPL_CACHE[template] = (tpl, refs)
    return tpl, refs


def jinja_vars(template: str) -> frozenset[str]:
    return jinja_template(template)[1]


def render_batch(batch: pa.Table, template: str, out_col: str = "rendered") -> pa.Table:
    """Append ``out_col`` = template rendered per row: sandboxed Jinja
    pass (conditionals/loops) then literal {column} substitution."""
    names = set(batch.column_names)
    tpl, jrefs = jinja_template(template)
    need = ({c for c in _REF_RE.findall(template) if c in names}
            | {c for c in jrefs if c in names})
    cols = {c: batch.column(c).to_pylist() for c in need}

    def _row(i: int) -> str:
        text = template
        if tpl is not None:
            try:
                text = tpl.render({c: v[i] for c, v in cols.items()})
            except Exception:
                text = template  # reference parity: render errors pass through
        return _REF_RE.sub(
            lambda m: _fmt(cols[m.group(1)][i]) if m.group(1) in cols else m.group(0),
            text,
        )

    vals = [_row(i) for i in range(batch.num_rows)]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def render_op(template: str, out_col: str = "rendered"):
    """Dataset-level op: ds.map_batches(render_op("..."), ...)."""

    def _fn(batch: pa.Table) -> pa.Table:
        return render_batch(batch, template, out_col)

    return _fn
