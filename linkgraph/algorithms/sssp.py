"""Single-source shortest paths (paper §5.2) — parity extra, SURVEY C5.

Same frontier machinery as connected components with a `min` combiner
and `dist + weight` scatter. Unweighted edges default to weight 1.0.
Unreachable vertices report +inf.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.pregel import RunInfo, truncate_lineage

INF = float("inf")


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    max_supersteps: int = 200,
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, dist), RunInfo)."""
    spark = graph.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = graph.edges
    if weight_col is None:
        edges = edges.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        edges = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    edges = edges.repartition(p, "src").sortWithinPartitions("src").persist()
    edges.count()

    info = RunInfo("sssp")
    state = truncate_lineage(
        graph.vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0.0))
            .otherwise(F.lit(INF))
            .alias("dist"),
        ).repartition(p, "id")
    )
    frontier = state.filter(F.col("dist") == 0.0)

    step = 0
    for step in range(1, max_supersteps + 1):
        t0 = time.monotonic()
        # fused combine+apply (see components.py)
        msgs = edges.join(frontier.withColumnRenamed("id", "src"), "src").select(
            "dst",
            (F.col("dist") + F.col("w")).alias("msg"),
            F.lit(None).cast("double").alias("old"),
        )
        carried = state.select(
            F.col("id").alias("dst"),
            F.lit(None).cast("double").alias("msg"),
            F.col("dist").alias("old"),
        )
        new_state = (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("m"), F.max("old").alias("o"))
            .select(
                "id",
                F.least(F.coalesce(F.col("m"), F.col("o")), F.col("o")).alias("dist"),
                F.coalesce(F.col("m") < F.col("o"), F.lit(False)).alias("changed"),
            )
        )
        new_state = truncate_lineage(new_state, eager=False)
        active = int(
            new_state.agg(
                F.sum(F.col("changed").cast("long")).alias("a")
            ).first()["a"]
            or 0
        )
        frontier = new_state.filter("changed").select("id", "dist")
        state = new_state.select("id", "dist")
        info.record(step, t0, active=active)
        if active == 0:
            info.converged = True
            break

    info.supersteps = step
    edges.unpersist()
    return state, info
