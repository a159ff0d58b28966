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

from linkgraph.corpus import extract_imports, read_corpus, resolve_edges

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

EDGE_TABLE = "edges_stream"


def stream_corpus(spark: SparkSession, drop_dir: str, fmt: str = "parquet") -> DataFrame:
    """File-drop source with the pinned corpus schema (A1, streaming)
    for parquet / csv / json(lines) drops — the same interchange
    formats `read_corpus` accepts in batch, same reader options
    (multiLine CSV with escaped quotes: `content` is raw source code).

    Files already in the drop dir are run through `read_corpus`'s
    schema guards at stream START (reordered CSV header / misnamed
    JSON fields fail loudly before any micro-batch runs). Files
    dropped later are guarded per file for CSV via
    `enforceSchema=false` (Spark validates each file's header against
    the schema field names at read time — a late reordered header
    fails its micro-batch instead of silently binding by position) and
    FAILFAST for malformed rows; late JSON field mismatch surfaces as
    null repo/content rows, which the derivation drops (lang filter +
    inner join), not corrupts.
    """
    if fmt not in ("parquet", "csv", "json", "jsonl"):
        raise ValueError(f"unsupported corpus stream format {fmt!r}")
    if fmt != "parquet":
        from pyspark.errors import AnalysisException

        try:
            read_corpus(spark, drop_dir, fmt=fmt).limit(1).collect()
        except AnalysisException:
            pass  # empty / not-yet-created drop dir: nothing to probe
    reader = spark.readStream.schema(CORPUS_SCHEMA).option("maxFilesPerTrigger", 8)
    if fmt == "parquet":
        return reader.parquet(drop_dir)
    if fmt == "csv":
        return (
            reader.option("header", True)
            .option("enforceSchema", False)  # per-file header validation
            .option("multiLine", True)
            .option("escape", '"')
            .option("mode", "FAILFAST")
            .csv(drop_dir)
        )
    return reader.json(drop_dir)


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


DOC_SCHEMA = "doc_id long, text string"


def stream_documents(
    spark: SparkSession, drop_dir: str
) -> DataFrame:
    """File-drop source with the documents-table shape (doc_id, text)
    for the streaming dedup path."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(drop_dir)


def stream_dedup(
    stream: DataFrame,
    deduper,
    checkpoint_dir: str,
    assignments_table: str = "dedup_assignments",
):
    """Streaming near-dup dedup: each micro-batch of documents runs
    through `IncrementalDeduper.add_batch` (pipeline/dedup_incremental)
    — the batch's NEW content is shingled/banded once, joined against
    the persisted LSH index, and the accumulated (doc_id, canonical_id)
    assignment snapshot is committed per epoch. This is the 100 TB
    crawl shape: dedup keeps up with ingestion instead of recomputing
    the corpus per batch.

    Exactly-once on top of foreachBatch's at-least-once: add_batch
    drops doc_ids already in the index, so a replayed micro-batch
    appends nothing and rewrites an identical assignment snapshot.
    Returns the StreamingQuery.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        assigns = deduper.add_batch(batch)
        deduper.catalog.write_snapshot(
            assignments_table, assigns, meta={"epoch": epoch_id}
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EVENT_SCHEMA = "event_id long, ts timestamp, event_type string, value double, props string"


def stream_events(spark: SparkSession, drop_dir: str) -> DataFrame:
    """File-drop source with the events table schema (TESTDATA shape)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the late-data pattern: rows later than `watermark` behind the max
    observed ts are dropped and their windows finalized, which bounds
    state instead of keeping every window open forever (the thing that
    kills unbounded streaming aggs at 100 TB/day event rates).

    Output: (window_start, window_end, event_type, n, sum_value);
    append output mode emits each window exactly once, on watermark
    passage.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stateful_event_counter(events: DataFrame):
    """Custom stateful operator via applyInPandasWithState: a running
    per-event_type counter + value sum that persists across
    micro-batches (GroupState), emitting the updated running totals
    each batch — the arbitrary-stateful-operator seam the built-in
    windowed aggs can't express (e.g. sessionization, dedup-with-TTL).

    State is one (count, sum) pair per group: O(|group keys|), not
    O(events) — the shape that survives unbounded streams.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # executor-side

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "running_n": [n],
             "running_sum": [round(total, 6)]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, running_n long, running_sum double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
