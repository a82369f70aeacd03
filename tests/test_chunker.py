"""Unit tests for the title-hierarchy/token-budget chunker (no Ray)."""

from raydoc.extract.chunker import chunk_document
from raydoc.extract.html_extract import extract_page


def _doc(blocks):
    text = "\n".join(t for _, _, t in blocks)
    spans, pos = [], 0
    for kind, level, t in blocks:
        spans.append({"start": pos, "end": pos + len(t), "kind": kind, "level": level})
        pos += len(t) + 1
    return text, spans


def test_title_hierarchy():
    text, spans = _doc(
        [
            ("title", 1, "Top"),
            ("para", 0, "a " * 20),
            ("title", 2, "Sub A"),
            ("para", 0, "b " * 20),
            ("title", 2, "Sub B"),
            ("para", 0, "c " * 20),
            ("title", 1, "Top2"),
            ("para", 0, "d " * 20),
        ]
    )
    chunks = chunk_document(text, spans, token_budget=300, min_tokens=1)
    paths = [c["title_path"] for c in chunks]
    assert paths == [["Top"], ["Top", "Sub A"], ["Top", "Sub B"], ["Top2"]]
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2, 3]


def test_token_budget_packing_and_split():
    text, spans = _doc(
        [("para", 0, "w " * 100), ("para", 0, "x " * 100), ("para", 0, "y " * 100)]
    )
    chunks = chunk_document(text, spans, token_budget=250, min_tokens=1)
    # 100+100 fits in 250, third overflows -> two chunks
    assert [c["token_count"] for c in chunks] == [200, 100]

    text, spans = _doc([("para", 0, "z " * 600)])
    chunks = chunk_document(text, spans, token_budget=256, min_tokens=1)
    assert [c["token_count"] for c in chunks] == [256, 256, 88]
    assert all(c["text"].split() == ["z"] * c["token_count"] for c in chunks)


def test_runt_merge():
    # a runt after an oversized-block split merges into the short tail piece
    text, spans = _doc([("para", 0, "z " * 300), ("para", 0, "tiny runt")])
    chunks = chunk_document(text, spans, token_budget=256, min_tokens=16)
    assert [c["token_count"] for c in chunks] == [256, 46]
    assert chunks[-1]["text"].endswith("tiny runt")


def test_chunker_consistent_with_extractor():
    from raydoc.corpus import gen_row

    row = gen_row(3)
    res = extract_page(row["html"])
    chunks = chunk_document(res["text"], res["spans"])
    assert chunks, "normal page should produce chunks"
    for c in chunks:
        assert c["token_count"] == len(c["text"].split())
        assert c["token_count"] <= 256 + 256  # budget + merged runt bound
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    # deterministic
    assert chunks == chunk_document(res["text"], res["spans"])
