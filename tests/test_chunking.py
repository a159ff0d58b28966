"""Chunking vs an exact python replay of the pinned window rule."""

from __future__ import annotations

import pytest

from linkgraph.pipeline import chunk_documents


def _replay(text, chunk_size, overlap):
    toks = text.strip().split()
    if not toks:
        toks = [""]
    stride = chunk_size - overlap
    out = []
    for k in range((len(toks) - 1) // stride + 1):
        piece = toks[k * stride : k * stride + chunk_size]
        out.append((k, " ".join(piece), len(piece)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(25))),
        (2, "short doc"),
        (3, "one"),
        (4, "  padded   with\tmixed\n whitespace  tokens here  "),
        (5, " ".join(f"t{i}" for i in range(10))),  # exactly one stride
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("chunk_size,overlap", [(10, 0), (10, 3), (4, 1)])
def test_chunks_match_replay(spark, docs, chunk_size, overlap):
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, chunk_size, overlap).collect()
    }
    expected = set()
    for row in docs.collect():
        for k, txt, n in _replay(row["text"], chunk_size, overlap):
            expected.add((row["doc_id"], k, txt, n))
    assert got == expected


def test_chunks_cover_every_token_and_overlap(spark, docs):
    rows = chunk_documents(docs, 10, 3).filter("doc_id = 1").collect()
    toks = [f"w{i}" for i in range(25)]
    seen = set()
    for r in sorted(rows, key=lambda r: r["chunk_id"]):
        piece = r["chunk_text"].split(" ")
        seen.update(piece)
        assert len(piece) == r["n_chunk_tokens"] <= 10
    assert seen == set(toks)
    # consecutive chunks share exactly `overlap` tokens (interior)
    c0 = rows[0]["chunk_text"].split(" ") if rows else []
    c1 = [r for r in rows if r["chunk_id"] == 1][0]["chunk_text"].split(" ")
    assert c0[-3:] == c1[:3]


def test_chunking_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 5, 5)
    with pytest.raises(ValueError):
        chunk_documents(docs, 5, -1)
