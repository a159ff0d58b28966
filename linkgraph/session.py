"""SparkSession factory with the engine's pinned configs (SURVEY.md §4.6).

Design notes (scale): `spark.sql.shuffle.partitions` is pinned to the
graph partition count P so every superstep's combine (groupBy dst) and
apply (join on id) reuse one hash partitioning — Catalyst elides the
exchange between the dst-aggregate and the id-join when the partition
counts line up. Arrow is enabled explicitly (off by default in this
build) because every Python-boundary kernel in the engine is
vectorized (pandas/Arrow); per-row Python UDFs are banned
(BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app: str = "linkgraph",
    master: str | None = None,
    partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    partitions: the graph partition count P; defaults to max(8, cores).
    One P is used for shuffle partitions AND explicit repartitions so
    state/messages/adjacency stay co-partitioned across supersteps.
    """
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    p = partitions or max(8, cores)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(p))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
