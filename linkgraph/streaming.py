"""Incremental corpus/edge ingestion via Structured Streaming.

The reference model is batch BSP (paper §2) — there is NO streaming
operator to replicate (SURVEY §2 D13). This module is the engine's
own extension: keep the edge table fresh as new corpus files land,
without recomputing the whole derivation.

Design: corpus files arrive as parquet drops in a directory (or any
streaming source); each micro-batch runs the SAME derivation operators
(A2–A7 from corpus.py — one code path, batch and streaming) and
appends newly-discovered edges to the catalog via foreachBatch, where
the batch-side dedup (left_anti against the current edge snapshot)
gives exactly-once edge semantics on top of at-least-once delivery.
Graph algorithms then run on the latest snapshot — Pregel iterations
stay batch (correct: a superstep needs a consistent graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.corpus import extract_imports, resolve_edges

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

EDGE_TABLE = "edges_stream"


def stream_corpus(spark: SparkSession, drop_dir: str) -> DataFrame:
    """File-drop source with the pinned corpus schema (A1, streaming)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )


def incremental_edges(
    stream: DataFrame, exports: DataFrame, catalog, checkpoint_dir: str
):
    """Start a stream appending newly discovered repo→repo edges.

    foreachBatch: derive candidate edges from the micro-batch with the
    batch operators, anti-join against the current snapshot (dedup
    across batches), append only the delta. Returns the StreamingQuery.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        cand = resolve_edges(extract_imports(batch), exports)
        try:
            existing = catalog.read_all(EDGE_TABLE)
            fresh = cand.join(
                existing, ["src_repo", "dst_repo"], "left_anti"
            )
        except FileNotFoundError:
            fresh = cand
        # one derivation job per micro-batch: append unconditionally
        # (an empty snapshot is harmless — read_all unions it away); a
        # pre-count would run the whole derivation twice per batch
        catalog.append(EDGE_TABLE, fresh, meta={"epoch": epoch_id})

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_degree_counts(stream: DataFrame, exports: DataFrame) -> DataFrame:
    """Continuously-maintained out-degree per repo (complete mode agg) —
    the monitoring-counter pattern over the same extraction operators."""
    edges = resolve_edges(extract_imports(stream), exports)
    return edges.groupBy("src_repo").agg(F.count(F.lit(1)).alias("outdeg"))
