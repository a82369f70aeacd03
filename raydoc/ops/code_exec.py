"""Code component: arbitrary user transforms — the reference's sandbox
escape hatch (/root/reference/agent/component/code.py:58-152)
re-expressed for a batch engine.

Two execution modes, both plain ``map_batches`` stages:

* **in-process UDF** (`code_udf` / spec op ``udf``): a Python callable
  ``fn(pa.Table) -> pa.Table | dict`` with an optionally DECLARED
  output schema the result is cast to (the engine's output() coercion,
  base.py:516-539, applied to user code). JSON specs cannot carry code
  objects, so the spec surface references callables by NAME through
  ``register_udf`` — the trusted fast path.
* **sandboxed subprocess** (`sandbox_code` / spec op ``code``): honors
  the reference's execution-request contract (code.py:32-55): the
  script is base64-encoded and validated, arguments are a name->value
  dict, and failures come back IN-BAND as ``"**Error**: ..."`` content
  (code.py:126,134,139) — never a raised exception. The in-container
  analogue of the sandbox HTTP service is one isolated ``python -I``
  subprocess per batch (interpreter startup amortized over the batch;
  rows stream over stdin/stdout as JSON lines); the script must define
  ``main(arguments) -> value``. ``nodejs`` (accepted by the reference,
  code.py:72) is rejected up front — no Node runtime in this engine's
  workers.

At scale the subprocess stage is an actor-pool ``map_batches`` like any
other stateful stage; the per-batch cost is one fork + pipe, so size
``batch_size`` in the hundreds.
"""

from __future__ import annotations

import base64
import json
import subprocess
import sys
from typing import Callable

import pyarrow as pa

__all__ = [
    "register_udf",
    "resolve_udf",
    "code_udf",
    "SandboxCodeStage",
    "sandbox_code",
    "encode_code",
]

_UDF_REGISTRY: dict[str, Callable] = {}


def register_udf(name: str, fn: Callable) -> None:
    """Register a batch callable for spec-driven lookup (specs are
    JSON: they reference code by name, the way the reference's canvas
    resolves component classes from a registry,
    component/__init__.py:56-59)."""
    if not callable(fn):
        raise TypeError(f"udf {name!r} is not callable")
    _UDF_REGISTRY[name] = fn


def resolve_udf(name: str) -> Callable:
    if name not in _UDF_REGISTRY:
        raise KeyError(
            f"unknown udf {name!r}; register_udf it first "
            f"(known: {sorted(_UDF_REGISTRY)})"
        )
    return _UDF_REGISTRY[name]


def _coerce_schema(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + cast a UDF result to the declared schema — column
    order and types are part of the stage's contract, whatever the
    user code returned."""
    cols = [tbl.column(f.name).cast(f.type) for f in schema]
    return pa.Table.from_arrays(cols, schema=schema)


def code_udf(
    ds,
    fn: Callable | str,
    output_schema: pa.Schema | dict | None = None,
    batch_size: int | None = None,
    concurrency=None,
):
    """In-process Code stage: ``map_batches`` over a user callable with
    declared-output-schema enforcement. ``fn`` may be a callable or the
    NAME of a registered UDF. ``output_schema`` may be a pa.Schema or a
    {col: arrow-type-name} dict (the JSON-friendly spelling)."""
    if isinstance(fn, str):
        fn = resolve_udf(fn)
    schema = None
    if output_schema is not None:
        if isinstance(output_schema, dict):
            schema = pa.schema(
                [(k, getattr(pa, v)()) for k, v in output_schema.items()]
            )
        else:
            schema = output_schema

    def _run(batch: pa.Table) -> pa.Table:
        out = fn(batch)
        if isinstance(out, dict):
            out = pa.Table.from_pydict(out)
        if schema is not None:
            out = _coerce_schema(out, schema)
        return out

    kwargs: dict = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(_run, **kwargs)


def encode_code(code: str) -> str:
    """The reference's wire encoding (code.py:141-142), validated the
    way its request model validates it (code.py:37-44)."""
    b64 = base64.b64encode(code.encode("utf-8")).decode("utf-8")
    base64.b64decode(b64, validate=True)
    return b64


# stdin: one JSON arguments-dict per line; stdout: one JSON result per
# line — {"ok": str(value)} or {"err": message}. A failed exec of the
# script itself is reported once on line 1 and the runner exits.
_RUNNER = r"""
import base64, json, sys
try:
    code = base64.b64decode(sys.argv[1], validate=True).decode("utf-8")
    g = {}
    exec(code, g)
    main = g["main"]
except Exception as e:
    sys.stdout.write(json.dumps({"fatal": str(e)}) + "\n")
    sys.exit(0)
for line in sys.stdin:
    if not line.strip():
        continue
    try:
        out = main(json.loads(line))
        sys.stdout.write(json.dumps({"ok": "" if out is None else str(out)}) + "\n")
    except Exception as e:
        sys.stdout.write(json.dumps({"err": str(e)}) + "\n")
"""


class SandboxCodeStage:
    """Actor/task-pool stage running a user script per row in ONE
    isolated subprocess per batch.

    ``arguments``: list of {"name": ..., "column": ...} bindings — the
    batch analogue of the reference's component-output argument
    bindings (code.py:80-109); each row's bound values become the
    ``arguments`` dict passed to the script's ``main``.
    """

    def __init__(
        self,
        script: str,
        arguments: list[dict] | None = None,
        lang: str = "python",
        out_col: str = "content",
        timeout: float = 10.0,
    ) -> None:
        if lang.lower() not in ("python", "python3"):
            # the reference also accepts nodejs (code.py:72); no Node
            # runtime ships with this engine's workers
            raise ValueError(f"unsupported sandbox language: {lang}")
        self.b64 = encode_code(script)
        self.bindings = [(a["name"], a["column"]) for a in (arguments or [])]
        self.out_col = out_col
        self.timeout = timeout

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).to_pylist() for _, c in self.bindings}
        rows = [
            {name: cols[col][i] for name, col in self.bindings}
            for i in range(batch.num_rows)
        ]
        payload = "\n".join(json.dumps(r, default=str) for r in rows)
        try:
            proc = subprocess.run(
                [sys.executable, "-I", "-c", _RUNNER, self.b64],
                input=payload, capture_output=True, text=True,
                timeout=self.timeout,
            )
            out_lines = proc.stdout.splitlines()
        except Exception as e:  # timeout / spawn failure -> in-band
            msg = f"**Error**: Internal error in sandbox: {e}"
            return batch.append_column(
                self.out_col, pa.array([msg] * batch.num_rows, pa.string())
            )
        results: list[str] = []
        fatal = None
        if out_lines:
            first = _parse_line(out_lines[0])
            if "fatal" in first:
                fatal = f"**Error**: construct code request error: {first['fatal']}"
        if fatal is not None:
            results = [fatal] * batch.num_rows
        else:
            for i in range(batch.num_rows):
                if i >= len(out_lines):
                    results.append("**Error**: There is no response from sandbox")
                    continue
                d = _parse_line(out_lines[i])
                if "ok" in d:
                    results.append(d["ok"])
                else:
                    results.append(f"**Error**: {d.get('err', 'unknown')}")
        return batch.append_column(
            self.out_col, pa.array(results, pa.string())
        )


def _parse_line(line: str) -> dict:
    try:
        return json.loads(line)
    except Exception:
        return {"err": f"unparseable sandbox output: {line[:200]}"}


def sandbox_code(
    ds,
    script: str,
    arguments: list[dict] | None = None,
    lang: str = "python",
    out_col: str = "content",
    batch_size: int = 256,
    concurrency=None,
):
    """Dataset wrapper over :class:`SandboxCodeStage`."""
    from raydoc.util import cpu_cap

    return ds.map_batches(
        SandboxCodeStage,
        fn_constructor_kwargs={
            "script": script, "arguments": arguments, "lang": lang,
            "out_col": out_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, cpu_cap()),
    )
