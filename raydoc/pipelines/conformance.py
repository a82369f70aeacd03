"""Conformance pipelines: the reference's DSL corpus re-expressed on
Ray Data.

The reference ships 14 conformance graphs
(/root/reference/agent/test/dsl_examples/*.json) and 11 production
templates (/root/reference/agent/templates/*.json) as its test
strategy (SURVEY.md §5). Each function here is one of those graphs
rebuilt as a data-parallel Dataset composition — same operator
topology, deterministic doubles for the LLM-backed nodes — so a user
of the reference can run the same pipelines here. Routing follows the
engine rule (SURVEY.md §2.1): a router's output value becomes a route
COLUMN + per-branch filters instead of a scheduler redirect
(canvas.py:265-269); fan-in Concentrators become unions
(concentrator.py:32-36); bounded rewrite loops become explicit driver
loops (exesql.py:101-130's retry pattern).

Every LLM double keeps the reference's actor contract: model slot
built once per actor in ``__init__`` (the LLMBundle pattern,
generate.py:150), per-batch work in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "GenerateStage",
    "rewrite_query",
    "retrieval_and_generate",
    "categorize_concentrator",
    "search_generate_switch",
    "keyword_search_generate",
    "retrieval_relevant_rewrite_generate",
    "customer_service",
    "text2sql",
    "code_interpreter",
    "retrieval_categorize_and_generate",
    "retrieval_relevant_keyword_baidu_and_generate",
    "headhunter_zh",
    "websearch_assistant",
    "seo_blog",
    "research_report",
    "db_assistant",
    "hr_callout_zh",
    "general_chat_bot",
    "investment_advisor",
    "medical_consultation",
]

_TOP_N = 5


class GenerateStage:
    """Deterministic double of the reference's Generate component
    (generate.py:42-276): renders ``prompt`` with ``{input}`` and
    ``{evidence}`` slots; with ``cite=True`` it reproduces set_cite's
    sentence x chunk hybrid-similarity citation join (token 0.7 /
    vector 0.3, generate.py:92-125) via ops.retrieval.insert_citations,
    emitting ``##N$$`` markers and the dedup'd ``cited_chunks`` list.
    Swapping in a real model keeps the interface: load it in __init__.

    ``enabled_tools`` mirrors the reference's ``llm_enabled_tools``
    (generate.py:152-158): named plugins are resolved from
    ``raydoc.plugins.GLOBAL_PLUGINS`` ONCE at construction (per-actor
    slot; unknown names fail loudly here, like check_valid), and the
    deterministic double invokes each tool on the row's input and
    appends ``[tool:name] result`` lines — where a real chat model
    would receive the same tools as OpenAI schemas
    (``llm_tool_metadata_to_openai_tool``) and call them through a
    ``PluginCallSession``.
    """

    def __init__(self, prompt: str = "Q: {input}\nA: {evidence}",
                 input_col: str = "input", evidence_col: str = "evidence",
                 out_col: str = "answer", cite: bool = False,
                 chunks_col: str = "chunk_texts",
                 vectors_col: str = "chunk_vectors",
                 cite_threshold: float = 0.3,
                 enabled_tools: list[str] | None = None) -> None:
        self.prompt = prompt  # the per-actor "model" slot
        self.input_col = input_col
        self.evidence_col = evidence_col
        self.out_col = out_col
        self.cite = cite
        self.chunks_col = chunks_col
        self.vectors_col = vectors_col
        self.cite_threshold = cite_threshold
        self.tools = []
        if enabled_tools:
            from raydoc.plugins import GLOBAL_PLUGINS

            resolved = GLOBAL_PLUGINS.get_llm_tools_by_names(enabled_tools)
            known = {t.name for t in resolved}
            bad = [n for n in enabled_tools if n not in known]
            if bad:
                raise ValueError(f"unknown LLM tool(s) {bad}; registered: "
                                 f"{GLOBAL_PLUGINS.names()}")
            self.tools = [t() for t in resolved]  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        ins = (batch.column(self.input_col).to_pylist()
               if self.input_col in cols else [""] * batch.num_rows)
        evs = (batch.column(self.evidence_col).to_pylist()
               if self.evidence_col in cols else [""] * batch.num_rows)
        out = [
            self.prompt.replace("{input}", i or "").replace("{evidence}", e or "")
            for i, e in zip(ins, evs)
        ]
        if self.tools:
            out = [
                ans + "".join(
                    f"\n[tool:{t.name}] {t.invoke(text=i or '')}"
                    for t in self.tools)
                for ans, i in zip(out, ins)
            ]
        if not (self.cite and self.chunks_col in cols
                and self.vectors_col in cols):
            return batch.append_column(self.out_col,
                                       pa.array(out, pa.string()))
        # set_cite (generate.py:92-125): per row, score every answer
        # sentence against the row's evidence chunks (token-0.7 /
        # vector-0.3) and append ##N$$ markers + the dedup'd cited list
        from raydoc.ops.retrieval import insert_citations

        texts_l = batch.column(self.chunks_col).to_pylist()
        vecs_l = batch.column(self.vectors_col).to_pylist()
        cited_answers, cited_lists = [], []
        for ans, ctexts, cvecs in zip(out, texts_l, vecs_l):
            if not ctexts:
                cited_answers.append(ans)
                cited_lists.append([])
                continue
            dim = len(cvecs[0])
            a2, idx = insert_citations(
                ans, ctexts, cvecs,
                embed_fn=lambda s: _pseudo_embedding(s, dim),
                threshold=self.cite_threshold,
            )
            cited_answers.append(a2)
            cited_lists.append(idx)
        batch = batch.append_column(self.out_col,
                                    pa.array(cited_answers, pa.string()))
        return batch.append_column(
            "cited_chunks", pa.array(cited_lists, pa.list_(pa.int64()))
        )

    def stream_row(self, input: str = "", evidence: str = "",
                   chunk_texts: list[str] | None = None,
                   chunk_vectors: list | None = None,
                   empty_responses: list[str] | None = None,
                   chunk_tokens: int = 1):
        """Stream ONE row's answer as cumulative prefixes — the
        ``Generate.stream_output`` contract (generate.py:235-262) over
        this stage's prompt/tool/cite config. The final content-yield
        (and, with ``cite``, the final cited yield) is byte-identical
        to what ``__call__`` puts in ``out_col`` / ``cited_chunks``
        for the same row, so batch and conversational paths agree."""
        from raydoc.ops.streaming import generate_stream

        ans = (self.prompt.replace("{input}", input or "")
               .replace("{evidence}", evidence or ""))
        if self.tools:
            ans += "".join(f"\n[tool:{t.name}] {t.invoke(text=input or '')}"
                           for t in self.tools)
        dim = (len(chunk_vectors[0])
               if self.cite and chunk_vectors else 8)
        return generate_stream(
            ans,
            chunk_texts=chunk_texts if self.cite else None,
            chunk_vectors=chunk_vectors if self.cite else None,
            cite=self.cite,
            threshold=self.cite_threshold,
            embed_fn=(lambda s: _pseudo_embedding(s, dim)),
            empty_responses=empty_responses,
            chunk_tokens=chunk_tokens,
        )


def rewrite_query(query: str, history: list[str]) -> str:
    """Deterministic double of RewriteQuestion (rewrite.py:21-94):
    fold unseen terms from the dialogue history into the query,
    order-preserving, lower-cased."""
    seen = set()
    words: list[str] = []
    for w in (query + " " + " ".join(history)).lower().split():
        if w not in seen:
            seen.add(w)
            words.append(w)
    return " ".join(words)


def _pseudo_embedding(text: str, dim: int) -> np.ndarray:
    """Deterministic query vector from text (hash-seeded) — retrieval
    doubles need a vector, not semantics."""
    from raydoc.hashing import stable_u64

    rng = np.random.RandomState(stable_u64(text) % (2**32))
    return rng.standard_normal(dim)


def _corpus(sf_dir: str):
    """documents joined with embeddings (broadcast; embedding lists are
    rejected as Dataset.join payload — see queries.hybrid_retrieval)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raydoc.ops.relational import broadcast_join

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    dim = len(emb.column("embedding")[0].as_py())
    return broadcast_join(docs, emb, "doc_id", "vec_id"), dim


def _retrieve(sf_dir: str, query: str, query_id: int = 0, top_n: int = _TOP_N):
    """Retrieval node (retrieval.py:100-112): hybrid keyword+vector
    top-k against the documents corpus."""
    from raydoc.ops.retrieval import hybrid_retrieve

    corpus, dim = _corpus(sf_dir)
    return hybrid_retrieve(
        corpus,
        [{"query_id": query_id, "tokens": set(query.lower().split()),
          "vector": _pseudo_embedding(query, dim)}],
        top_n=top_n,
    )


def _collect(ds) -> pa.Table:
    """Materialize a SMALL (top-k sized) result Dataset to one table,
    skipping the schemaless empty blocks groupby/join stages emit."""
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables) if tables else pa.table({})


def _evidence(chunks) -> str:
    """Join retrieved texts rank-ordered — the get_input concat
    (base.py:465)."""
    tbl = chunks if isinstance(chunks, pa.Table) else _collect(chunks)
    idx = pc.sort_indices(tbl, sort_keys=[("rank", "ascending")])
    texts = tbl.take(idx).column("text").to_pylist()
    return " | ".join((t or "")[:80] for t in texts)


def _attach_texts(sf_dir: str, top: pa.Table) -> pa.Table:
    """Fetch the texts of the (tiny) top-k id set with one streaming
    membership-filtered pass over documents — only matching rows reach
    the driver."""
    import ray.data as rd

    ids = pa.array(sorted(set(top.column("doc_id").to_pylist())), pa.int64())
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    texts = _collect(docs.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"), value_set=ids)),
        batch_format="pyarrow",
    ))
    idx = {i: t for i, t in zip(texts.column("doc_id").to_pylist(),
                                texts.column("text").to_pylist())}
    return top.append_column(
        "text",
        pa.array([idx.get(i, "") for i in top.column("doc_id").to_pylist()],
                 pa.string()),
    )


def retrieval_and_generate(sf_dir: str, query: str = "vector hash join stream"):
    """dsl_examples/retrieval_and_generate.json: Begin -> Retrieval ->
    Generate -> Answer. Returns one answer row per query."""
    import ray.data as rd

    top = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, query)))
    ev = _evidence(top)
    answers = rd.from_items([{"input": query, "evidence": ev}])
    return answers.map_batches(GenerateStage, batch_format="pyarrow",
                               concurrency=1)


def categorize_concentrator(sf_dir: str):
    """dsl_examples/categorize.json + concentrator_message.json:
    Categorize fans docs to per-category Message nodes; Concentrator
    fan-in = union. Output: one row per doc with its routed message."""
    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage

    cats = {
        "querying": ["query", "filter", "scan"],
        "storage": ["table", "row", "column"],
        "compute": ["hash", "merge", "sort"],
    }
    messages = {
        "querying": "routed to the query desk",
        "storage": "routed to the storage desk",
        "compute": "routed to the compute desk",
    }
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    routed = ds.map_batches(
        CategorizeStage, fn_constructor_kwargs={"categories": cats},
        batch_format="pyarrow", concurrency=(1, 4),
    ).materialize()  # branches share ONE classification pass (union
    # branches do not dedupe a shared lazy sub-plan)
    branches = []
    for name, msg in messages.items():  # one Message node per branch
        b = routed.filter(expr=f"category == '{name}'")

        def _msg(batch: pa.Table, m=msg) -> pa.Table:
            return batch.append_column(
                "message", pa.array([m] * batch.num_rows, pa.string())
            )

        branches.append(b.map_batches(_msg, batch_format="pyarrow"))
    out = branches[0]
    for b in branches[1:]:  # Concentrator
        out = out.union(b)
    return out.select_columns(["doc_id", "category", "message"])


def search_generate_switch(queries: list[str] | None = None):
    """dsl_examples/baidu_generate_and_switch.json: search connector ->
    Generate -> Switch routes the answer to one of three Message nodes
    (first-match-wins predicate list, switch.py:48-131)."""
    from raydoc.ops.predicates import add_route_column
    from raydoc.sources.connectors import connector_source

    queries = queries or ["ray data shuffle", "arrow parquet read",
                          "actor pool batch"]
    rows = connector_source("search", queries, top_n=3)
    gen = rows.map_batches(
        GenerateStage,
        fn_constructor_kwargs={"input_col": "query", "evidence_col": "content"},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    branches = [
        ("about_data", [{"column": "answer", "operator": "contains",
                         "value": "data"}], "and"),
        ("about_search", [{"column": "answer", "operator": "contains",
                           "value": "search"}], "and"),
    ]
    routed = gen.map_batches(
        lambda b: add_route_column(b, branches, default="other"),
        batch_format="pyarrow",
    )
    return routed.select_columns(["query", "rank", "answer", "route"])


def keyword_search_generate(query: str = "streaming shuffle of arrow record batches"):
    """dsl_examples/keyword_wikipedia_and_generate.json: KeywordExtract
    (TF top-n double, keyword.py:24-72) -> search connector ->
    Generate."""
    from collections import Counter

    from raydoc.sources.connectors import connector_source

    top_kw = [w for w, _ in Counter(query.lower().split()).most_common(3)]
    rows = connector_source("search", [" ".join(top_kw)], top_n=3)
    return rows.map_batches(
        GenerateStage,
        fn_constructor_kwargs={"input_col": "query", "evidence_col": "content"},
        batch_format="pyarrow", concurrency=(1, 4),
    )


def retrieval_relevant_rewrite_generate(
    sf_dir: str,
    query: str = "zzz-nonsense-term",
    history: list[str] | None = None,
    max_rewrites: int = 1,
):
    """dsl_examples/retrieval_relevant_rewrite_and_generate.json:
    Retrieval -> Relevant gate; on "no" the query is rewritten from
    history and retried (bounded driver loop = the reference's rewrite
    cycle, canvas loop detection capped at 6, canvas.py:332-360)."""
    import ray.data as rd

    from raydoc.ops.classify import RelevantStage

    history = history or ["tell me about the hash join and the stream"]
    q = query
    for attempt in range(max_rewrites + 1):
        top = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, q)))
        gated = RelevantStage(query=q, min_overlap=1)(top)
        relevant = gated.filter(pc.equal(gated.column("relevant"), "yes"))
        if relevant.num_rows or attempt == max_rewrites:
            ev = _evidence(relevant if relevant.num_rows else gated)
            ans = rd.from_items(
                [{"input": q, "evidence": ev, "rewrites": attempt}]
            )
            return ans.map_batches(GenerateStage, batch_format="pyarrow",
                                   concurrency=1)
        q = rewrite_query(q, history)  # RewriteQuestion double
    raise AssertionError("unreachable")


def customer_service(sf_dir: str, questions: list[str] | None = None):
    """templates/customer_service.json: Categorize(casual | complain |
    product) -> casual:Message, complain:Generate(apology),
    product:Retrieval->Relevant->Generate/ask-contact. One answer row
    per question with its branch recorded."""
    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage

    questions = questions or [
        "hi there, nice weather",
        "this is broken and I want a refund, complaint incoming",
        "how does the query filter scan the table",
    ]
    cats = {
        "complain": ["broken", "refund", "complaint", "angry"],
        "product": ["query", "filter", "scan", "table", "column"],
        "casual": [],  # fallback (last category wins on zero hits)
    }
    ds = rd.from_items([{"qid": i, "text": q}
                        for i, q in enumerate(questions)])
    routed = ds.map_batches(
        CategorizeStage, fn_constructor_kwargs={"categories": cats},
        batch_format="pyarrow", concurrency=1,
    )
    routed = _collect(routed)

    triples = list(zip(routed.column("qid").to_pylist(),
                       routed.column("text").to_pylist(),
                       routed.column("category").to_pylist()))

    # ONE multi-query retrieval pass for all product-branch questions
    # (hybrid_retrieve is natively multi-query; a per-question loop
    # would re-scan the corpus N times)
    product = [(qid, text) for qid, text, cat in triples
               if cat not in ("casual", "complain")]
    hits: dict[int, int] = {}
    if product:
        from raydoc.ops.retrieval import hybrid_retrieve

        corpus, dim = _corpus(sf_dir)
        top = _collect(hybrid_retrieve(
            corpus,
            [{"query_id": qid, "tokens": set(text.lower().split()),
              "vector": _pseudo_embedding(text, dim)} for qid, text in product],
            top_n=_TOP_N,
        ))
        for q in top.column("query_id").to_pylist():
            hits[q] = hits.get(q, 0) + 1

    rows = []
    for qid, text, cat in triples:
        if cat == "casual":
            rows.append({"qid": qid, "branch": "casual",
                         "answer": "Hello! How can I help you today?"})
        elif cat == "complain":
            rows.append({"qid": qid, "branch": "complain",
                         "answer": f"We are sorry to hear that: {text}"})
        elif hits.get(qid, 0):
            rows.append({"qid": qid, "branch": "product",
                         "answer": f"Q: {text} -> {hits[qid]} sources"})
        else:
            rows.append({"qid": qid, "branch": "ask_contact",
                         "answer": "Please leave your contact details."})
    return rd.from_items(rows)


_T2SQL_TEMPLATES = {
    "count orders": "SELECT count(*) AS n FROM orders",
    "total revenue": ("SELECT round(sum(l_extendedprice * (1 - l_discount)),"
                      " 2) AS revenue FROM lineitem"),
    "customers per segment": ("SELECT c_mktsegment, count(*) AS n FROM "
                              "customer GROUP BY c_mktsegment ORDER BY n"),
    "broken question": "SELEC nope FROM nowhere",  # exercises the repair loop
}


def text2sql(sf_dir: str, questions: list[str] | None = None):
    """templates/text2sql.json + dsl_examples/exesql.json: question ->
    Generate double emits a fenced SQL answer -> extract_sql ->
    SqlExecStage (connection per actor, bounded repair loop,
    exesql.py:28-155). The generate double is a question->SQL template
    table — a real text2sql model swaps into GenerateStage's prompt
    slot with the same downstream contract."""
    import ray.data as rd

    from raydoc.ops.sql_exec import SqlExecStage

    questions = questions or list(_T2SQL_TEMPLATES)
    answers = [
        f"Sure! Here is the query:\n```sql\n"
        f"{_T2SQL_TEMPLATES.get(q, 'SELECT 1 AS one')};\n```\nHope it helps."
        for q in questions
    ]
    ds = rd.from_items(
        [{"question": q, "sql_text": a} for q, a in zip(questions, answers)]
    )
    tables = {t: f"{sf_dir}/{t}.parquet"
              for t in ("orders", "lineitem", "customer")}

    def _repair(sql: str, err: str):
        # deterministic double of the LLM regenerate loop
        # (exesql.py:136-152): fix the one known typo class
        return sql.replace("SELEC ", "SELECT ") if "SELEC " in sql else None

    return ds.map_batches(
        SqlExecStage,
        fn_constructor_kwargs={"tables": tables, "repair_fn": _repair},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


_INTERPRETER_SCRIPT = """
def main(args):
    # the interpreter contract (test/dsl_examples/interpreter.json
    # prologue): "'text' => target language"; answer format "=> ..."
    raw = args.get("content") or ""
    if "=>" not in raw:
        raise ValueError("input must look like 'text => target language'")
    text, lang = (s.strip() for s in raw.rsplit("=>", 1))
    return f"=> [{lang}] {text}"
"""


def code_interpreter(inputs: list[str] | None = None):
    """The interpreter graph (dsl_examples/interpreter.json,
    intergreper.json; templates/interpreter.json): Begin(prologue) ->
    Answer -> translator -> Answer, with the translator slot filled by
    the CODE component (code.py:58-152) instead of an LLM: the script
    ships base64-encoded to an isolated subprocess with arguments
    bound from the upstream Answer's content (code.py:80-109), and
    malformed input surfaces IN-BAND as "**Error**: ..." content
    (code.py:126,134,139) — the graph keeps flowing, one row per
    user turn.
    """
    import ray.data as rd

    from raydoc.ops.code_exec import sandbox_code

    if inputs is None:
        inputs = ["您好! => English", "You look good today. => Japanese"]
    # Begin -> Answer: each user turn is one row, the turn's text in
    # ``content`` (the canvas history slot, code.py:103-105)
    ds = rd.from_items([{"turn": i, "content": s}
                        for i, s in enumerate(inputs)])
    out = sandbox_code(
        ds,
        _INTERPRETER_SCRIPT,
        arguments=[{"name": "content", "column": "content"}],
        out_col="answer",
        batch_size=64,
    )
    return out.select_columns(["turn", "content", "answer"])


def retrieval_categorize_and_generate(sf_dir: str,
                                      queries: list[str] | None = None):
    """dsl_examples/retrieval_categorize_and_generate.json: Begin ->
    Answer -> Categorize which routes each turn EITHER to Retrieval ->
    Generate (kb questions) OR to a canned Message (smalltalk), both
    fanning back into Answer (union). One output row per input turn,
    tagged with its route — the row accounting the scheduler redirect
    (canvas.py:265-269) becomes under the route-column rule."""
    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage

    if queries is None:
        queries = ["how does the hash join stream batches",
                   "hello there nice day",
                   "what column store does the scan read"]
    ds = rd.from_items([{"qid": i, "text": q}
                        for i, q in enumerate(queries)])
    cats = {"kb_question": ["join", "stream", "scan", "column", "batch",
                            "table", "query"],
            "smalltalk": ["hello", "hi", "day", "thanks"]}
    routed = _collect(ds.map_batches(
        CategorizeStage, fn_constructor_kwargs={"categories": cats},
        batch_format="pyarrow", concurrency=(1, 2),
    ))
    rows = []
    for qid, text, cat in zip(routed.column("qid").to_pylist(),
                              routed.column("text").to_pylist(),
                              routed.column("category").to_pylist()):
        if cat == "kb_question":
            top = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, text,
                                                           query_id=qid)))
            rows.append({"qid": qid, "text": text, "route": cat,
                         "input": text, "evidence": _evidence(top)})
        else:  # Message branch (message.py's canned pick)
            rows.append({"qid": qid, "text": text, "route": cat,
                         "input": text,
                         "evidence": "How can I help with the engine?"})
    fanin = rd.from_items(rows)  # Concentrator: union back into Answer
    return fanin.map_batches(GenerateStage, batch_format="pyarrow",
                             concurrency=(1, 2))


def retrieval_relevant_keyword_baidu_and_generate(
    sf_dir: str, queries: list[str] | None = None,
):
    """dsl_examples/retrieval_relevant_keyword_baidu_and_generate.json:
    Retrieval -> Relevant gate; "yes" goes straight to Generate over kb
    evidence, "no" detours KeywordExtract -> Baidu (search-connector
    double) -> a SECOND Generate over web evidence (generate:1), both
    converging on Answer. One row per query, ``branch`` says which
    Generate answered."""
    from collections import Counter

    import ray.data as rd

    from raydoc.ops.classify import RelevantStage
    from raydoc.sources.connectors import SearchConnector

    if queries is None:
        queries = ["hash join stream of record batches",
                   "zzz qqq completely-unknown nonsense"]
    web = SearchConnector()  # per-run client (baidu.py:40-66 double)
    rows = []
    for qid, q in enumerate(queries):
        top = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, q,
                                                       query_id=qid)))
        gated = RelevantStage(query=q, min_overlap=1)(top)
        relevant = gated.filter(pc.equal(gated.column("relevant"), "yes"))
        if relevant.num_rows:
            rows.append({"qid": qid, "input": q, "branch": "retrieval",
                         "evidence": _evidence(relevant)})
        else:
            kws = " ".join(w for w, _ in
                           Counter(q.lower().split()).most_common(3))
            hits = web.fetch(kws, top_n=3)
            ev = " | ".join(h["content"] for h in hits
                            if h["status"] == "ok")
            rows.append({"qid": qid, "input": q, "branch": "web",
                         "evidence": ev})
    fanin = rd.from_items(rows)
    return fanin.map_batches(GenerateStage, batch_format="pyarrow",
                             concurrency=(1, 2))


def headhunter_zh(sf_dir: str, turns: list[dict] | None = None):
    """dsl_examples/headhunter_zh.json: the two-level Categorize
    cascade — categorize:0 routes a first-contact turn to
    {introduction message, casual Generate, reject message, jd
    Retrieval}; follow-up turns hit categorize:1 which routes to {jd
    Retrieval, casual, get_wechat, no_wechat} Generates; every leaf
    fans back into an Answer. Row accounting: exactly one answer row
    per turn, ``route`` = "<level>/<category>"."""
    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage

    if turns is None:
        turns = [
            {"stage": 0, "text": "hello, are you hiring for data roles?"},
            {"stage": 0, "text": "not interested, remove me please"},
            {"stage": 1, "text": "what does the job involve, which "
                                 "table and query work?"},
            {"stage": 1, "text": "sure, my wechat id is abc123"},
            {"stage": 1, "text": "i will not share contact details"},
        ]
    turns = [{"tid": i, **t} for i, t in enumerate(turns)]
    lvl0 = {"interested": ["hiring", "role", "job", "hello"],
            "reject": ["not interested", "remove", "stop"],
            "casual": ["weather", "lunch"]}
    lvl1 = {"about_job": ["job", "work", "involve", "query", "table"],
            "get_wechat": ["wechat", "contact is", "id is"],
            "no_wechat": ["not share", "will not", "refuse"],
            "casual": ["weather", "lunch"]}
    answers = {
        ("0", "interested"): "intro: we have a data-engine role open",
        ("0", "reject"): "understood, no further messages",
        ("0", "casual"): "nice chatting!",
        ("1", "get_wechat"): "great, adding you on wechat",
        ("1", "no_wechat"): "no problem, we can keep chatting here",
        ("1", "casual"): "nice chatting!",
    }
    rows = []
    for stage, cats in ((0, lvl0), (1, lvl1)):
        sub = [t for t in turns if t["stage"] == stage]
        if not sub:
            continue
        ds = rd.from_items(sub)
        routed = _collect(ds.map_batches(
            CategorizeStage, fn_constructor_kwargs={"categories": cats},
            batch_format="pyarrow", concurrency=(1, 2),
        ))
        for tid, text, cat in zip(routed.column("tid").to_pylist(),
                                  routed.column("text").to_pylist(),
                                  routed.column("category").to_pylist()):
            route = f"{stage}/{cat}"
            if cat == "about_job":  # the Retrieval -> generate:aboutJob leaf
                top = _attach_texts(
                    sf_dir, _collect(_retrieve(sf_dir, text, query_id=tid)))
                rows.append({"tid": tid, "text": text, "route": route,
                             "input": text, "evidence": _evidence(top)})
            else:
                rows.append({"tid": tid, "text": text, "route": route,
                             "input": text,
                             "evidence": answers[(str(stage), cat)]})
    fanin = rd.from_items(rows)
    return fanin.map_batches(GenerateStage, batch_format="pyarrow",
                             concurrency=(1, 2))


def websearch_assistant(sf_dir: str,
                        query: str = "how does a hash join stream batches",
                        history: list[str] | None = None):
    """templates/websearch_assistant.json: RewriteQuestion ->
    KeywordExtract fanning out to THREE web sources (Baidu /
    DuckDuckGo / Wikipedia — search-connector doubles) in PARALLEL
    with kb Retrieval, all four converging on one Generate. Output: 1
    answer row + one evidence row per source (the fan-in accounting)."""
    from collections import Counter

    import ray.data as rd

    from raydoc.sources.connectors import connector_source

    q = rewrite_query(query, history or [])
    kws = " ".join(w for w, _ in Counter(q.split()).most_common(3))
    # three web connectors, one actor-pool source each, unioned — the
    # template's parallel downstream fan-out of KeywordExtract
    webs = [connector_source("search", [kws], top_n=2, channel=ch)
            for ch in ("baidu", "duckduckgo", "wikipedia")]
    web_rows = _collect(webs[0].union(*webs[1:]))
    kb = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, q)))
    sources = ([{"source": s, "content": (c or "")[:80]}
                for s, c in zip(web_rows.column("source").to_pylist(),
                                web_rows.column("content").to_pylist())]
               + [{"source": "kb", "content": (t or "")[:80]}
                  for t in kb.column("text").to_pylist()])
    ev = " | ".join(r["content"] for r in sources)
    ans = rd.from_items([{"input": q, "evidence": ev,
                          "n_sources": len(sources)}])
    return ans.map_batches(GenerateStage, batch_format="pyarrow",
                           concurrency=1)


def seo_blog(topic: str = "streaming joins in ray data",
             url: str | None = None):
    """templates/seo_blog.json: Switch routes on whether the user gave
    a URL (Baidu:ShyTeamsJuggle fetch branch) or a bare topic
    (Generate:FancyMomentsTalk branch); both chains research the topic
    (second Baidu), then TWO parallel Generates produce title and body
    (FortyBirdsAsk / CuddlyBatsCamp) merged by the Template node into
    the final post. Output: one row with route, title, body, post."""
    import ray.data as rd

    from raydoc.ops.template import render_batch
    from raydoc.sources.connectors import SearchConnector

    web = SearchConnector()
    if url:  # Switch branch A: seed research from the fetched page
        route = "from_url"
        seed = " | ".join(h["content"] for h in web.fetch(url, top_n=2))
    else:  # branch B: a Generate expands the bare topic into a brief
        route = "from_topic"
        seed = f"brief: {topic} — angles, audience, keywords"
    research = " | ".join(
        h["content"] for h in web.fetch(topic, top_n=3)
        if h["status"] == "ok"
    )
    ds = rd.from_items([{"route": route, "topic": topic, "seed": seed,
                         "research": research}])
    title_gen = GenerateStage(prompt="Title: {input}", input_col="topic",
                              out_col="title")
    body_gen = GenerateStage(
        prompt="Body on {input}: {evidence}", input_col="topic",
        evidence_col="research", out_col="body",
    )

    def _merge(batch: pa.Table) -> pa.Table:
        batch = title_gen(batch)
        batch = body_gen(batch)
        return render_batch(batch, "{title}\n\n{body}", out_col="post")

    return ds.map_batches(_merge, batch_format="pyarrow", concurrency=1)


def research_report(sf_dir: str,
                    topic: str = "arrow batch shuffle strategies",
                    n_sections: int = 3):
    """templates/research_report.json: an outline Generate fans a topic
    into sections; Iteration #1 (IterationItem -> Baidu) researches
    each section; Iteration #2 (IterationItem -> Generate) writes each
    section; a Template merges the ordered sections into the report.
    The Iterations run as DATASET rows (explode -> per-row stages ->
    grouped reassemble), not a driver loop. Output: one report row;
    section rows carried in ``sections``."""
    import ray.data as rd

    from raydoc.ops.relational import grouped_concat
    from raydoc.sources.connectors import SearchConnector

    # outline Generate: deterministic expansion of the topic
    words = topic.split()
    sections = [{"sec": i,
                 "heading": " ".join(words[i % len(words):]) or topic}
                for i in range(n_sections)]
    items = rd.from_items(sections)  # Iteration explode: one row/section

    class _Research:  # IterationItem -> Baidu (per-section web search)
        def __init__(self) -> None:
            self.web = SearchConnector()  # client once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            ev = [
                " | ".join(h["content"] for h in self.web.fetch(hd, top_n=2)
                           if h["status"] == "ok")
                for hd in batch.column("heading").to_pylist()
            ]
            return batch.append_column("evidence", pa.array(ev, pa.string()))

    researched = items.map_batches(_Research, batch_format="pyarrow",
                                   concurrency=(1, 2))
    written = researched.map_batches(  # Iteration #2: write each section
        GenerateStage,
        fn_constructor_kwargs={
            "prompt": "## {input}\n{evidence}", "input_col": "heading",
            "out_col": "section_text"},
        batch_format="pyarrow", concurrency=(1, 2),
    )
    # Template merge: ordered grouped concat reassembles the report
    written = written.map_batches(
        lambda b: b.append_column(
            "report_id", pa.array([0] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    report = grouped_concat(written, "report_id", "section_text",
                            sep="\n\n", order_col="sec")
    return report


def db_assistant(sf_dir: str,
                 question: str = "total order value per customer"):
    """templates/DB Assistant.json: RewriteQuestion -> THREE parallel
    Retrievals (schema docs / sample rows / sql examples) feeding one
    Generate that writes SQL -> ExeSQL runs it against the warehouse.
    Output: the executed result rows + the sql text (exesql.py's
    contract)."""
    import ray.data as rd

    from raydoc.ops.sql_exec import SqlExecStage

    q = rewrite_query(question, [])
    # three kb slices retrieved in parallel — here three top-k passes
    # over the documents corpus seeded with slice-specific tokens
    slices = [f"{q} schema", f"{q} sample rows", f"{q} sql examples"]
    ev = " | ".join(
        _evidence(_attach_texts(sf_dir, _collect(_retrieve(sf_dir, s,
                                                           query_id=i))))
        for i, s in enumerate(slices)
    )[:200]
    # Generate -> SQL (deterministic double keyed on the question)
    sql = ("SELECT c_custkey, sum(o_totalprice) AS total "
           "FROM orders GROUP BY c_custkey ORDER BY c_custkey LIMIT 5")
    ds = rd.from_items([{
        "question": q, "evidence": ev,
        "sql_text": f"Here you go:\n```sql\n{sql};\n```\ndone",
    }])
    tables = {"orders": f"{sf_dir}/orders.parquet"}

    def _orders_alias(s: str) -> str:
        return s.replace("c_custkey", "o_custkey")

    return ds.map_batches(
        SqlExecStage,
        fn_constructor_kwargs={"tables": tables,
                               "repair_fn": lambda s, e: _orders_alias(s)},
        batch_format="pyarrow", concurrency=(1, 2),
    )


def hr_callout_zh(sf_dir: str, turns: list[dict] | None = None):
    """templates/HR_callout_zh.json: the production twin of
    headhunter_zh — categorize:0 routes first-contact turns to
    {reject message, jd Retrieval -> Generate, pitch Generate, canned
    Message}; categorize:1 routes follow-ups to {benefits Retrieval ->
    Generate, salary / schedule / handoff Generates}; every leaf fans
    into the Answer. One answer row per turn."""
    if turns is None:
        turns = [
            {"stage": 0, "text": "what is the job about, which table "
                                 "and query work is involved?"},
            {"stage": 0, "text": "stop calling, not interested"},
            {"stage": 1, "text": "what benefits package and salary "
                                 "range does it pay?"},
            {"stage": 1, "text": "can we schedule an interview time?"},
        ]
    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage

    turns = [{"tid": i, **t} for i, t in enumerate(turns)]
    lvl = {
        0: {"about_job": ["job", "work", "query", "table"],
            "reject": ["stop", "not interested"],
            "pitch": ["hello", "who"]},
        1: {"benefits": ["benefits", "salary", "pay"],
            "schedule": ["schedule", "interview", "time"],
            "handoff": ["human", "manager"]},
    }
    canned = {"reject": "understood — removing you from the list",
              "pitch": "we have a data-platform opening you may like",
              "schedule": "booking a slot, expect an invite",
              "handoff": "connecting you to the hiring manager"}
    rows = []
    for stage in (0, 1):
        sub = [t for t in turns if t["stage"] == stage]
        if not sub:
            continue
        routed = _collect(rd.from_items(sub).map_batches(
            CategorizeStage, fn_constructor_kwargs={"categories": lvl[stage]},
            batch_format="pyarrow", concurrency=(1, 2)))
        for tid, text, cat in zip(routed.column("tid").to_pylist(),
                                  routed.column("text").to_pylist(),
                                  routed.column("category").to_pylist()):
            if cat in ("about_job", "benefits"):  # the Retrieval leaves
                top = _attach_texts(
                    sf_dir, _collect(_retrieve(sf_dir, text, query_id=tid)))
                ev = _evidence(top)
            else:
                ev = canned.get(cat, "hello!")
            rows.append({"tid": tid, "text": text,
                         "route": f"{stage}/{cat}", "input": text,
                         "evidence": ev})
    return rd.from_items(rows).map_batches(GenerateStage,
                                           batch_format="pyarrow",
                                           concurrency=(1, 2))


def general_chat_bot(sf_dir: str, queries: list[str] | None = None):
    """templates/general_chat_bot.json: the big router — Rewrite ->
    Categorize fans each turn to one of five branches: weather
    (QWeather two-step lookup-join connector), finance (Concentrator ->
    WenCai flatten + KeywordExtract -> AkShare finance connector),
    websearch (KeywordExtract -> Baidu/DuckDuckGo/Wikipedia), medical
    (Concentrator -> Retrieval + PubMed XML connector), smalltalk
    (direct Generate); all Generates fan into the Answer. One answer
    row per turn tagged with its branch."""
    from collections import Counter

    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage
    from raydoc.sources.connectors import (FlattenConnector,
                                           FinanceConnector,
                                           LookupJoinConnector,
                                           SearchConnector, XmlConnector)

    if queries is None:
        queries = [
            "what is the weather forecast in shanghai",
            "which stock price and market index should i buy",
            "search the web for arrow shuffle articles",
            "medical question: what treats a persistent cough",
            "hi there, how are you doing",
        ]
    cats = {"weather": ["weather", "forecast", "rain"],
            "finance": ["stock", "market", "price", "fund"],
            "websearch": ["search", "web", "find", "articles"],
            "medical": ["medical", "treats", "symptom", "cough"],
            "smalltalk": ["hi", "hello", "how are"]}
    ds = rd.from_items([{"qid": i, "text": rewrite_query(t, [])}
                        for i, t in enumerate(queries)])
    routed = _collect(ds.map_batches(
        CategorizeStage, fn_constructor_kwargs={"categories": cats},
        batch_format="pyarrow", concurrency=(1, 2)))
    weather, wencai, finance = (LookupJoinConnector(), FlattenConnector(),
                                FinanceConnector())
    web, pubmed = SearchConnector(), XmlConnector()
    rows = []
    for qid, text, cat in zip(routed.column("qid").to_pylist(),
                              routed.column("text").to_pylist(),
                              routed.column("category").to_pylist()):
        kws = " ".join(w for w, _ in
                       Counter(text.split()).most_common(3))
        if cat == "weather":
            hits = weather.fetch(text, top_n=2)
        elif cat == "finance":  # Concentrator: WenCai + AkShare fan-in
            hits = wencai.fetch(text, top_n=2) + finance.fetch(kws, top_n=2)
        elif cat == "websearch":
            hits = sum((SearchConnector(channel=ch).fetch(kws, top_n=1)
                        for ch in ("baidu", "duckduckgo", "wikipedia")), [])
        elif cat == "medical":  # Concentrator: kb Retrieval + PubMed
            top = _attach_texts(sf_dir,
                                _collect(_retrieve(sf_dir, text,
                                                   query_id=qid)))
            hits = pubmed.fetch(kws, top_n=2) + [
                {"content": (t or "")[:60], "status": "ok"}
                for t in top.column("text").to_pylist()[:2]]
        else:
            hits = [{"content": "doing great — how can i help?",
                     "status": "ok"}]
        ev = " | ".join((h["content"] or "")[:60] for h in hits
                        if h["status"] == "ok")
        rows.append({"qid": qid, "branch": cat, "input": text,
                     "evidence": ev, "n_evidence": len(hits)})
    return rd.from_items(rows).map_batches(GenerateStage,
                                           batch_format="pyarrow",
                                           concurrency=(1, 2))


def investment_advisor(query: str = "growth stock screen for "
                                    "semiconductor market"):
    """templates/investment_advisor.json: the Answer fans the question
    to WenCai (flatten connector) AND KeywordExtract -> AkShare
    (finance connector) in parallel; one Generate merges both."""
    from collections import Counter

    import ray.data as rd

    from raydoc.ops.classify import CategorizeStage  # noqa: F401 (doc)
    from raydoc.sources.connectors import FinanceConnector, FlattenConnector

    kws = " ".join(w for w, _ in Counter(query.lower().split()).most_common(3))
    wc = FlattenConnector().fetch(query, top_n=5)
    ak = FinanceConnector().fetch(kws, top_n=3)
    ev = " | ".join((h["content"] or "")[:60]
                    for h in wc + ak if h["status"] == "ok")
    ds = rd.from_items([{"input": query, "evidence": ev,
                         "n_wencai": len(wc), "n_akshare": len(ak)}])
    return ds.map_batches(GenerateStage, batch_format="pyarrow",
                          concurrency=1)


def medical_consultation(sf_dir: str,
                         question: str = "what treats a persistent "
                                         "cough and mild fever"):
    """templates/medical_consultation.json: the Answer fans the
    question to TWO parallel Generate-fronted branches — one rewrites
    it for kb Retrieval, one translates it for PubMed (XML connector);
    a final Generate merges both evidence streams."""
    import ray.data as rd

    from raydoc.sources.connectors import XmlConnector

    kb_q = rewrite_query(question, ["medical knowledge base"])
    top = _attach_texts(sf_dir, _collect(_retrieve(sf_dir, kb_q)))
    kb_ev = _evidence(top)
    pub = XmlConnector().fetch(question, top_n=3)
    pub_ev = " | ".join(h["title"] for h in pub if h["status"] == "ok")
    ds = rd.from_items([{"input": question,
                         "evidence": f"kb: {kb_ev[:120]} || pubmed: {pub_ev}",
                         "n_kb": top.num_rows, "n_pubmed": len(pub)}])
    return ds.map_batches(GenerateStage, batch_format="pyarrow",
                          concurrency=1)
