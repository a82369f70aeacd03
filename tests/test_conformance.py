"""Conformance: the reference's DSL graphs re-expressed on Ray Data
(raydoc/pipelines/conformance.py vs
/root/reference/agent/test/dsl_examples/*.json topologies)."""

import pytest


@pytest.mark.usefixtures("ray_session")
class TestConformancePipelines:
    def test_retrieval_and_generate(self, sf_dir):
        from raydoc.pipelines.conformance import retrieval_and_generate

        out = retrieval_and_generate(sf_dir).to_pandas()
        assert len(out) == 1
        ans = out.iloc[0]["answer"]
        assert ans.startswith("Q: vector hash join stream") and "A: " in ans
        # deterministic: second run bit-identical
        again = retrieval_and_generate(sf_dir).to_pandas()
        assert again.iloc[0]["answer"] == ans

    def test_categorize_concentrator_routes_all_docs(self, sf_dir):
        import pyarrow.parquet as pq

        from raydoc.pipelines.conformance import categorize_concentrator

        out = categorize_concentrator(sf_dir).to_pandas()
        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        # fan-out + concentrator fan-in loses no rows
        assert len(out) == n_docs and out["doc_id"].is_unique
        assert set(out["category"]) <= {"querying", "storage", "compute"}
        for cat, msg in out.groupby("category")["message"].first().items():
            assert cat.split("ing")[0][:5] in msg or cat in msg.replace(" desk", "")

    def test_search_generate_switch_first_match_wins(self):
        from raydoc.pipelines.conformance import search_generate_switch

        out = search_generate_switch().to_pandas()
        assert len(out) == 9  # 3 queries x top_n 3
        assert set(out["route"]) <= {"about_data", "about_search", "other"}
        # route must agree with the predicate order on the answer text
        for _, r in out.iterrows():
            expected = ("about_data" if "data" in r["answer"]
                        else "about_search" if "search" in r["answer"]
                        else "other")
            assert r["route"] == expected

    def test_keyword_search_generate(self):
        from raydoc.pipelines.conformance import keyword_search_generate

        out = keyword_search_generate().to_pandas()
        assert len(out) == 3 and out["answer"].str.contains("A: ").all()

    def test_rewrite_loop_recovers_relevance(self, sf_dir):
        from raydoc.pipelines.conformance import (
            retrieval_relevant_rewrite_generate,
            rewrite_query,
        )

        out = retrieval_relevant_rewrite_generate(
            sf_dir, query="zzz-nonsense-term",
            history=["tell me about the hash join and the stream"],
        ).to_pandas()
        assert len(out) == 1
        # nonsense query fails the gate; one rewrite folds history terms in
        assert out.iloc[0]["rewrites"] == 1
        assert "hash" in out.iloc[0]["input"]
        # the rewrite double is order-preserving and dedups
        assert rewrite_query("a b", ["b c c d"]) == "a b c d"

    def test_customer_service_branches(self, sf_dir):
        from raydoc.pipelines.conformance import customer_service

        out = customer_service(sf_dir).to_pandas().sort_values("qid")
        assert list(out["branch"]) == ["casual", "complain", "product"]
        assert out.iloc[1]["answer"].startswith("We are sorry")
        assert "sources" in out.iloc[2]["answer"]

    def test_text2sql_exec_and_repair(self, sf_dir):
        from raydoc.pipelines.conformance import text2sql

        out = text2sql(sf_dir).to_pandas()
        assert len(out) == 4
        ok = out[out["status"] == "ok"]
        assert len(ok) == 3  # three valid questions execute
        # the broken question flows through the bounded repair loop:
        # SELEC -> SELECT, but the table still doesn't exist -> error row
        bad = out[out["status"] != "ok"].iloc[0]
        assert bad["sql"].startswith("SELECT nope")
        assert bad["n_rows"] == 0


@pytest.mark.usefixtures("ray_session")
class TestCodeInterpreter:
    def test_interpreter_graph_translates_and_errors_in_band(self):
        from raydoc.pipelines.conformance import code_interpreter

        df = code_interpreter(
            ["您好! => English", "You look good today. => Japanese",
             "no arrow here"]
        ).to_pandas().sort_values("turn")
        assert list(df["answer"])[:2] == [
            "=> [English] 您好!",
            "=> [Japanese] You look good today.",
        ]
        # malformed turn: in-band error, graph keeps flowing
        assert df["answer"].iloc[2].startswith("**Error**: ")
        assert len(df) == 3


@pytest.mark.usefixtures("ray_session")
class TestCitationInsertion:
    def test_planted_evidence_cites_matching_sentence(self):
        import pyarrow as pa
        import ray.data as rd

        from raydoc.pipelines.conformance import (GenerateStage,
                                                  _pseudo_embedding)

        chunks = ["the quick brown fox jumps over the dog",
                  "stock markets fell sharply across asia today"]
        vecs = [_pseudo_embedding(c, 16).tolist() for c in chunks]
        ds = rd.from_items([{
            "input": "what happened",
            "evidence": "The quick brown fox jumps over the dog. "
                        "Nothing matches zzz qqq xxx vvv kkk.",
            "chunk_texts": chunks,
            "chunk_vectors": vecs,
        }])
        out = ds.map_batches(
            GenerateStage,
            fn_constructor_kwargs={"prompt": "{evidence}", "cite": True},
            batch_format="pyarrow", concurrency=1,
        ).to_pandas()
        ans = out["answer"].iloc[0]
        # the evidence-backed sentence is cited against chunk 0 …
        assert "dog. ##0$$" in ans
        # … the filler sentence is not cited at all
        assert ans.count("$$") == 1
        assert list(out["cited_chunks"].iloc[0]) == [0]

    def test_insert_citations_scalar_contract(self):
        from raydoc.ops.retrieval import insert_citations
        from raydoc.pipelines.conformance import _pseudo_embedding

        chunks = ["alpha beta gamma delta", "omega psi chi phi"]
        vecs = [_pseudo_embedding(c, 8) for c in chunks]
        ans, idx = insert_citations(
            "alpha beta gamma delta. omega psi chi phi! unrelated words "
            "here nothing.",
            chunks, vecs, embed_fn=lambda s: _pseudo_embedding(s, 8),
        )
        assert "##0$$" in ans and "##1$$" in ans
        assert idx == [0, 1]
        # empty answer / no chunks: no-op
        assert insert_citations("", chunks, vecs, lambda s: None) == ("", [])
        assert insert_citations("hi there.", [], [], lambda s: None) == (
            "hi there.", [])


@pytest.mark.usefixtures("ray_session")
class TestRemainingDslGraphs:
    def test_retrieval_categorize_and_generate_routes(self, sf_dir):
        """dsl_examples/retrieval_categorize_and_generate.json: every
        turn answered exactly once; kb questions go through retrieval,
        smalltalk through the Message branch."""
        from raydoc.pipelines.conformance import (
            retrieval_categorize_and_generate)

        df = (retrieval_categorize_and_generate(sf_dir)
              .to_pandas().sort_values("qid"))
        assert len(df) == 3 and sorted(df["qid"]) == [0, 1, 2]
        routes = dict(zip(df["qid"], df["route"]))
        assert routes[0] == "kb_question" and routes[2] == "kb_question"
        assert routes[1] == "smalltalk"
        assert (df["answer"].str.len() > 0).all()

    def test_relevant_keyword_baidu_branches(self, sf_dir):
        """dsl_examples/retrieval_relevant_keyword_baidu_and_generate
        .json: relevant queries answer from kb (generate:0); irrelevant
        ones detour keyword->web (generate:1)."""
        from raydoc.pipelines.conformance import (
            retrieval_relevant_keyword_baidu_and_generate)

        df = (retrieval_relevant_keyword_baidu_and_generate(sf_dir)
              .to_pandas().sort_values("qid"))
        assert list(df["branch"]) == ["retrieval", "web"]
        assert len(df) == 2 and (df["answer"].str.len() > 0).all()

    def test_headhunter_two_level_cascade(self, sf_dir):
        """dsl_examples/headhunter_zh.json: one answer per turn through
        the two Categorize levels; each expected leaf is reached."""
        from raydoc.pipelines.conformance import headhunter_zh

        df = headhunter_zh(sf_dir).to_pandas().sort_values("tid")
        assert len(df) == 5 and sorted(df["tid"]) == [0, 1, 2, 3, 4]
        assert list(df["route"]) == [
            "0/interested", "0/reject", "1/about_job", "1/get_wechat",
            "1/no_wechat",
        ]


@pytest.mark.usefixtures("ray_session")
class TestTemplates:
    def test_websearch_assistant_fans_in_four_sources(self, sf_dir):
        """templates/websearch_assistant.json: 3 web connectors + kb
        retrieval all feed the single Generate."""
        from raydoc.pipelines.conformance import websearch_assistant

        df = websearch_assistant(sf_dir).to_pandas()
        assert len(df) == 1
        # 3 connectors x 2 hits + 5 kb chunks
        assert int(df["n_sources"].iloc[0]) == 11
        assert df["answer"].iloc[0].count("|") >= 9

    def test_seo_blog_switch_and_template_merge(self):
        """templates/seo_blog.json: both Switch branches produce a
        title+body merged post."""
        from raydoc.pipelines.conformance import seo_blog

        a = seo_blog("ray data joins").to_pandas()
        b = seo_blog("ray data joins", url="https://x.example/post").to_pandas()
        assert a["route"].iloc[0] == "from_topic"
        assert b["route"].iloc[0] == "from_url"
        for df in (a, b):
            post = df["post"].iloc[0]
            assert post.startswith("Title: ray data joins")
            assert "Body on ray data joins:" in post

    def test_research_report_iteration_reassembles_ordered(self):
        """templates/research_report.json: Iteration explode ->
        per-section research+write -> ordered Template merge."""
        from raydoc.pipelines.conformance import research_report

        df = research_report(None, topic="alpha beta gamma",
                             n_sections=3).to_pandas()
        assert len(df) == 1
        report = df.filter(like="section_text").iloc[0, 0] \
            if "section_text" not in df.columns else df["section_text"].iloc[0]
        text = report if isinstance(report, str) else str(report)
        # three ordered section headings, each with web evidence
        i0 = text.find("## alpha beta gamma")
        i1 = text.find("## beta gamma")
        i2 = text.find("## gamma")
        assert -1 < i0 < i1 < i2


@pytest.mark.usefixtures("ray_session")
class TestRemainingTemplates:
    def test_db_assistant_retrieve_generate_exesql_repair(self, sf_dir):
        """templates/DB Assistant.json: 3-way retrieval -> SQL Generate
        -> ExeSQL, whose retry loop repairs the bad column name."""
        from raydoc.pipelines.conformance import db_assistant

        df = db_assistant(sf_dir).to_pandas()
        assert len(df) == 1
        assert df["status"].iloc[0] == "ok"
        assert df["n_rows"].iloc[0] == 5
        assert "o_custkey" in df["sql"].iloc[0]  # the repaired form ran

    def test_hr_callout_routes_every_turn(self, sf_dir):
        """templates/HR_callout_zh.json: one answer per turn through
        the two-level categorize; retrieval leaves get kb evidence."""
        from raydoc.pipelines.conformance import hr_callout_zh

        df = hr_callout_zh(sf_dir).to_pandas().sort_values("tid")
        assert len(df) == 4
        assert list(df["route"]) == ["0/about_job", "0/reject",
                                     "1/benefits", "1/schedule"]
        assert (df["answer"].str.len() > 0).all()

    def test_general_chat_bot_five_branches(self, sf_dir):
        """templates/general_chat_bot.json: the 5-way router reaches
        weather/finance/websearch/medical/smalltalk, with the
        QWeather/WenCai/AkShare/PubMed connector shapes wired in."""
        from raydoc.pipelines.conformance import general_chat_bot

        df = general_chat_bot(sf_dir).to_pandas().sort_values("qid")
        assert list(df["branch"]) == ["weather", "finance", "websearch",
                                      "medical", "smalltalk"]
        assert (df["n_evidence"] >= 1).all()
        # finance = WenCai flatten + AkShare fan-in; medical = pubmed+kb
        assert df.loc[df["branch"] == "finance", "n_evidence"].iloc[0] >= 4
        assert df.loc[df["branch"] == "medical", "n_evidence"].iloc[0] >= 3

    def test_investment_advisor_parallel_sources(self):
        from raydoc.pipelines.conformance import investment_advisor

        df = investment_advisor().to_pandas()
        assert len(df) == 1
        assert df["n_wencai"].iloc[0] >= 3 and df["n_akshare"].iloc[0] == 3
        assert "|" in df["answer"].iloc[0]

    def test_medical_consultation_merges_kb_and_pubmed(self, sf_dir):
        from raydoc.pipelines.conformance import medical_consultation

        df = medical_consultation(sf_dir).to_pandas()
        assert len(df) == 1
        assert df["n_kb"].iloc[0] >= 1 and df["n_pubmed"].iloc[0] >= 1
        ans = df["answer"].iloc[0]
        assert "kb: " in ans and "pubmed: " in ans
