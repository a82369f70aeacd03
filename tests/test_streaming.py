"""Token-stream output parity (raydoc/ops/streaming.py vs reference
answer.py:50-75 / generate.py:235-262). Pure driver-side generators —
no Ray session needed."""

import numpy as np
import pyarrow as pa
import pytest

from raydoc.ops.streaming import answer_stream, generate_stream, iter_prefixes
from raydoc.pipelines.conformance import GenerateStage, _pseudo_embedding


TEXT = "A hash join streams\tbatches,\n  then probes the build side."


class TestIterPrefixes:
    def test_prefix_accumulation_contract(self):
        # every yield is a prefix of the next; last is the full text;
        # the implied deltas concatenate back to the text exactly
        prefixes = list(iter_prefixes(TEXT))
        assert prefixes[-1] == TEXT
        prev = ""
        deltas = []
        for p in prefixes:
            assert p.startswith(prev) and len(p) > len(prev)
            deltas.append(p[len(prev):])
            prev = p
        assert "".join(deltas) == TEXT

    def test_chunk_tokens_coarsens_but_preserves_final(self):
        fine = list(iter_prefixes(TEXT, chunk_tokens=1))
        coarse = list(iter_prefixes(TEXT, chunk_tokens=4))
        assert len(coarse) < len(fine)
        assert coarse[-1] == TEXT == fine[-1]
        assert set(coarse) <= set(fine)  # same boundary family

    def test_empty_and_whitespace(self):
        assert list(iter_prefixes("")) == []
        # pure whitespace still round-trips byte-exactly
        assert list(iter_prefixes("  \n\t"))[-1] == "  \n\t"

    def test_bad_chunk_tokens(self):
        with pytest.raises(ValueError):
            list(iter_prefixes("x", chunk_tokens=0))


class TestGenerateStream:
    def test_yield_shape_and_final(self):
        out = list(generate_stream(TEXT))
        assert all(set(d) == {"content", "reference"} for d in out)
        assert out[-1]["content"] == TEXT
        assert all(d["reference"] == [] for d in out)

    def test_empty_response_gate(self):
        # generate.py:237-240: empty retrieval -> single joined yield
        out = list(generate_stream("ignored",
                                   empty_responses=["try a", "", "try b"]))
        assert out == [{"content": "try a\n- try b", "reference": []}]
        out = list(generate_stream("ignored", empty_responses=[]))
        assert out == [{"content": "Nothing found in knowledgebase!",
                        "reference": []}]

    def test_cited_final_yield(self):
        # the post-stream set_cite yield (generate.py:259-261): last
        # yield carries ##N$$ markers and the cited index list
        chunks = [TEXT, "completely unrelated pelican text"]
        vecs = [_pseudo_embedding(c, 8).tolist() for c in chunks]
        out = list(generate_stream(TEXT, chunk_texts=chunks,
                                   chunk_vectors=vecs, cite=True))
        assert out[-2]["content"] == TEXT  # last plain prefix
        assert "##0$$" in out[-1]["content"]
        assert out[-1]["reference"] == [0]


class TestAnswerStream:
    def test_dataframe_rows_accumulate(self):
        # answer.py:61-66: answer += row content, yield running total
        out = list(answer_stream(["a ", "b ", "c"]))
        assert [d["content"] for d in out] == ["a ", "a b ", "a b c"]

    def test_generator_passthrough(self):
        out = list(answer_stream(generate_stream("x y")))
        assert [d["content"] for d in out] == ["x ", "x y"]

    def test_post_answers_seeded(self):
        # deterministic twin of answer.py:70-72's random.choice, using
        # the canvas Message convention random.Random(seed*7919 + turn)
        import random

        posts = ["!", "?", "..."]
        for seed, turn in [(0, 0), (3, 2)]:
            out = list(answer_stream(["hi"], post_answers=posts,
                                     seed=seed, turn=turn))
            pick = posts[random.Random(seed * 7919 + turn)
                         .randrange(len(posts))]
            assert out[-1]["content"] == "hi" + pick
            assert out[-2]["content"] == "hi"
        # empty upstream -> no post yield (reference: res is None)
        assert list(answer_stream([], post_answers=posts)) == []


class TestGenerateStageStreamRow:
    def test_stream_matches_batch_plain(self):
        st = GenerateStage(prompt="Q: {input}\nA: {evidence}")
        batch = pa.table({"input": ["what is a join"],
                          "evidence": ["joins match rows"]})
        want = st(batch).column("answer")[0].as_py()
        got = list(st.stream_row("what is a join", "joins match rows"))
        assert got[-1]["content"] == want

    def test_stream_matches_batch_cited(self):
        chunks = ["joins match rows on keys", "unrelated walrus fact"]
        vecs = [_pseudo_embedding(c, 8).tolist() for c in chunks]
        st = GenerateStage(prompt="{evidence}", cite=True)
        batch = pa.table({
            "input": ["q"], "evidence": ["joins match rows on keys."],
            "chunk_texts": [chunks],
            "chunk_vectors": pa.array([vecs],
                                      pa.list_(pa.list_(pa.float64()))),
        })
        res = st(batch)
        want_ans = res.column("answer")[0].as_py()
        want_idx = res.column("cited_chunks")[0].as_py()
        got = list(st.stream_row("q", "joins match rows on keys.",
                                 chunk_texts=chunks, chunk_vectors=vecs))
        assert got[-1]["content"] == want_ans
        assert got[-1]["reference"] == want_idx

    def test_empty_response_passthrough(self):
        st = GenerateStage()
        got = list(st.stream_row("q", "", empty_responses=["no hits"]))
        assert got == [{"content": "no hits", "reference": []}]
