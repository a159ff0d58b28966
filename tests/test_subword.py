"""BPE-ish token counting vs Python `re` (identical regex engines)."""

from __future__ import annotations

import re

from linkgraph.pipeline import subword_token_count_col, token_count_col
from linkgraph.pipeline.textstats import BPE_ISH_PATTERN

TEXTS = [
    "hello world",
    "don't stop-me now!!! it's 2024, v2.0alpha",
    "CamelCase under_score 3.14159 ... emoji-ish ::=",
    "   spaced    out\ttabs\nnewlines   ",
    "a",
    "'s lone contraction '",
]


def test_subword_counts_match_python_re(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        subword_token_count_col().alias("bpe"),
        token_count_col().alias("ws"),
    ).collect()
    got = {r["doc_id"]: (r["bpe"], r["ws"]) for r in rows}
    for i, t in enumerate(TEXTS):
        expect_bpe = len(re.findall(BPE_ISH_PATTERN, t))
        assert got[i][0] == expect_bpe, (t, got[i][0], expect_bpe)
        # BPE-ish pieces never undercount whitespace tokens
        assert got[i][0] >= len(t.split()) or not t.strip()


def test_subword_splits_contractions_and_punct(spark):
    df = spark.createDataFrame([(1, "don't stop!")], "doc_id long, text string")
    n = df.select(subword_token_count_col().alias("n")).collect()[0]["n"]
    # don | 't | stop | !  = 4 pieces
    assert n == 4
