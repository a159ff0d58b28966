"""Document chunking — fixed-size overlapping token windows, the
standard preprocessing step between cleaning and tokenization in a
training/RAG pipeline (every published LLM data pipeline ships one).

Semantics pinned for cross-engine exactness: tokens are the SAME
whitespace split the TF-IDF/BM25 operators use
(`split(trim(text), '\\s+')`); chunk k covers tokens
[k·stride, k·stride + chunk_size) with stride = chunk_size − overlap,
for k = 0 .. floor((n_tokens − 1) / stride) — i.e. every token is
covered, consecutive chunks overlap by `overlap` tokens, and a
document shorter than one chunk yields exactly one chunk. Chunk text
re-joins tokens with single spaces (normalizing interior whitespace —
deliberate: chunk identity must not depend on the original spacing).

Scale shape: one pure-JVM projection — split, sequence, posexplode,
slice, array_join; no shuffle at all (composes with scan pushdown and
whole-stage codegen). Output size is n_tokens/stride rows per doc,
the inherent fan-out of chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns (id_col, chunk_id, chunk_text, n_chunk_tokens)."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    ks = F.sequence(
        F.lit(0),
        F.floor((F.col("_n") - 1) / F.lit(stride)).cast("int"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(chunk_size)
    )
    return (
        base.select(id_col, F.explode(ks).alias("chunk_id"), "_toks")
        .select(
            id_col,
            "chunk_id",
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
        )
    )
