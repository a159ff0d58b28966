"""Eval-set decontamination: n-gram overlap of corpus docs against a
benchmark/eval table.

Every serious training-data pipeline ships this next to dedup: before
training on a crawled corpus, any document that textually overlaps the
evaluation benchmarks must be found (and usually dropped), or the
benchmark scores are meaningless. The standard check (published in the
GPT-3, PaLM and Llama model cards) is character/token n-gram overlap:
a training doc is contaminated if a large-enough fraction of an eval
document's n-grams appear verbatim in it.

This module reuses the exact shingle machinery dedup already has
(`dedup.shingles` — distinct character k-grams, pure JVM) pointed at a
second table:

    contamination = |shingles(train doc) ∩ shingles(eval doc)|
                    / |shingles(eval doc)|

i.e. the fraction of the EVAL doc's n-grams found in the training doc
— asymmetric on purpose: a 1 GB training doc that swallows a 2 KB eval
question whole is 100% contaminated by it, regardless of the training
doc's own size.

Scale shape: the corpus side is 10^12 docs; the eval side is a few
thousand benchmark rows. The join is therefore corpus-shingles ⋈
BROADCAST(eval-shingles) — the corpus is scanned and shingled ONCE,
never shuffled (the broadcast hash join keeps the big side map-side),
and only matching (train, eval, shingle) rows survive into the
bounded (train, eval) count aggregate. `broadcast_eval=False` falls
back to a shuffle join for eval sets too large to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import shingles


def contamination_report(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, eval_id, overlap_ngrams, eval_ngrams, contamination)
    for every (training doc, eval doc) pair whose contamination — the
    fraction of the eval doc's distinct k-gram shingles present in the
    training doc — is >= threshold.

    k: shingle width (characters). Production decontamination uses
    wider grams (8-13 tokens); k is a parameter, the plumbing is
    identical. threshold: minimum contamination fraction to report.
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(
            f"contamination_report: threshold must be in [0, 1], got {threshold}"
        )
    sh_train = shingles(df, id_col=id_col, text_col=text_col, k=k).select(
        F.col("id").alias("doc_id"), "shingle"
    )
    sh_eval = shingles(
        eval_df, id_col=eval_id_col, text_col=eval_text_col, k=k
    ).select(F.col("id").alias("eval_id"), "shingle")
    eval_sizes = sh_eval.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("eval_ngrams")
    )
    if broadcast_eval:
        sh_eval = F.broadcast(sh_eval)
        eval_sizes = F.broadcast(eval_sizes)
    overlap = (
        sh_train.join(sh_eval, "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )
    return (
        overlap.join(eval_sizes, "eval_id")
        .select(
            "doc_id",
            "eval_id",
            "overlap_ngrams",
            "eval_ngrams",
            (F.col("overlap_ngrams") / F.col("eval_ngrams")).alias(
                "contamination"
            ),
        )
        .filter(F.col("contamination") >= threshold)
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The corpus minus contaminated docs: rows of `df` not flagged by
    `contamination_report` at the given threshold — the operator a
    pipeline actually applies before training."""
    flagged = contamination_report(
        df, eval_df, id_col=id_col, **kwargs
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return df.join(flagged, id_col, "left_anti")
