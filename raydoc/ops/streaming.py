"""Token-stream output parity (reference answer.py:50-75,
generate.py:235-267).

The reference streams a Generate answer as CUMULATIVE PREFIXES: its
``chat_streamly`` yields the full text-so-far, each yield is
``{"content": <prefix>, "reference": []}``, and when citation is on a
single cited yield follows the stream end (generate.py:254-261).
``Answer.stream_output`` accumulates upstream DataFrame rows the same
way (``answer += row["content"]``, yield the running total,
answer.py:61-66) and finally appends a seeded ``post_answers`` pick
(answer.py:70-72).

A batch engine has no incremental model, so the deterministic
equivalent streams the ALREADY-COMPUTED answer in token-boundary
chunks with identical prefix-accumulation semantics: every yield's
content is a prefix of the next, the last content-yield is the full
answer, and the concatenated deltas equal the answer byte-for-byte.
Swapping in a real streaming model means replacing ``iter_prefixes``
with the model's cumulative-yield generator; every downstream contract
(dict shape, final cited yield, Answer accumulation) is unchanged.
"""

from __future__ import annotations

import random
import re
from typing import Callable, Iterable, Iterator

# one "token" = a non-space run plus its trailing whitespace, so that
# joining the pieces reproduces the text exactly (spaces included)
_TOKEN_RE = re.compile(r"\S+\s*|\s+")

_EMPTY_KB = "Nothing found in knowledgebase!"  # generate.py:239


def iter_prefixes(text: str, chunk_tokens: int = 1) -> Iterator[str]:
    """Yield cumulative prefixes of ``text`` at token boundaries,
    ``chunk_tokens`` tokens per step — the deterministic double of a
    chat model's cumulative stream. Empty text yields nothing (a model
    that produces no tokens streams no chunks)."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    pieces = _TOKEN_RE.findall(text)
    pos = 0
    for i in range(0, len(pieces), chunk_tokens):
        pos += sum(len(p) for p in pieces[i:i + chunk_tokens])
        yield text[:pos]


def generate_stream(answer: str, *,
                    chunk_texts: list[str] | None = None,
                    chunk_vectors: list | None = None,
                    cite: bool = False,
                    threshold: float = 0.3,
                    embed_fn: Callable | None = None,
                    empty_responses: list[str] | None = None,
                    chunk_tokens: int = 1) -> Iterator[dict]:
    """``Generate.stream_output`` twin (generate.py:235-262).

    - ``empty_responses`` not None == the reference's "retrieval came
      back empty" gate (generate.py:237-240): yield ONE
      ``{"content": joined-or-fallback, "reference": []}`` and stop.
    - Otherwise yield ``{"content": prefix, "reference": []}`` per
      chunk of the finished ``answer``.
    - With ``cite=True`` and evidence chunks, one final yield carries
      the ``##N$$``-marked text and the cited index list
      (generate.py:259-261's post-stream ``set_cite`` yield).
    """
    if empty_responses is not None:
        joined = "\n- ".join(str(t) for t in empty_responses if str(t))
        yield {"content": joined if joined else _EMPTY_KB, "reference": []}
        return
    for prefix in iter_prefixes(answer, chunk_tokens):
        yield {"content": prefix, "reference": []}
    if cite and chunk_texts:
        from raydoc.ops.retrieval import insert_citations

        if embed_fn is None:
            from raydoc.pipelines.conformance import _pseudo_embedding

            dim = len(chunk_vectors[0]) if chunk_vectors else 8
            embed_fn = lambda s: _pseudo_embedding(s, dim)  # noqa: E731
        cited, idx = insert_citations(answer, chunk_texts, chunk_vectors,
                                      embed_fn=embed_fn,
                                      threshold=threshold)
        yield {"content": cited, "reference": list(idx)}


def answer_stream(upstream: Iterable, *,
                  post_answers: list[str] | None = None,
                  seed: int = 0, turn: int = 0) -> Iterator[dict]:
    """``Answer.stream_output`` twin (answer.py:50-75).

    ``upstream`` is either an iterable of stream dicts (a
    ``generate_stream``; passed through, answer.py:67-69) or an
    iterable of plain content strings (the DataFrame-rows case;
    accumulated into a running total, answer.py:61-66). A non-empty
    ``post_answers`` appends one seeded pick to the final content and
    yields once more — the reference's ``random.choice`` made
    deterministic with the canvas Message convention
    (``random.Random(seed * 7919 + turn)``, canvas.py Message node).
    """
    res = None
    acc = ""
    for item in upstream:
        if isinstance(item, dict):
            res = dict(item)
        else:
            acc += item
            res = {"content": acc, "reference": []}
        yield res
    if post_answers and res is not None:
        pick = post_answers[random.Random(
            seed * 7919 + turn).randrange(len(post_answers))]
        res = {**res, "content": res["content"] + pick}
        yield res
