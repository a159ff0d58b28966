"""Single-source shortest paths (paper §5.2) — parity extra, SURVEY C5.

A PregelSpec with a `min` combiner and `dist + weight` scatter — same
frontier machinery as connected components via the generic driver.
Unweighted edges default to weight 1.0. Unreachable vertices report
+inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.pregel import PregelSpec, RunInfo, pregel_run

INF = float("inf")


def sssp_spec(source: int, weight_col: str | None = None) -> PregelSpec:
    def prepare_links(edges):
        if weight_col is None:
            return edges.select("src", "dst", F.lit(1.0).alias("w"))
        return edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )

    def step(links, state, frontier, aggs):
        # never scatter +inf (unreached frontier members on the first /
        # post-resume superstep): an inf message can't lower any dist
        live = frontier.filter(F.col("dist") != INF)
        msgs = links.join(live.withColumnRenamed("id", "src"), "src").select(
            "dst",
            (F.col("dist") + F.col("w")).alias("msg"),
            F.lit(None).cast("double").alias("old"),
        )
        carried = state.select(
            F.col("id").alias("dst"),
            F.lit(None).cast("double").alias("msg"),
            F.col("dist").alias("old"),
        )
        return (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("m"), F.max("old").alias("o"))
            .select(
                "id",
                F.least(F.coalesce(F.col("m"), F.col("o")), F.col("o")).alias("dist"),
                F.coalesce(F.col("m") < F.col("o"), F.lit(False)).alias("changed"),
            )
        )

    return PregelSpec(
        algo="sssp",
        state_cols=("dist",),
        init_state=lambda verts: verts.select(
            "id",
            F.when(F.col("id") == source, F.lit(0.0))
            .otherwise(F.lit(INF))
            .alias("dist"),
        ),
        prepare_links=prepare_links,
        step=step,
        metrics={"active": F.sum(F.col("changed").cast("long"))},
        halt=lambda a: int(a.get("active") or 0) == 0,
        frontier_filter="changed",
    )


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    max_supersteps: int = 200,
    checkpointer=None,
    mutations=None,
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, dist), RunInfo)."""
    return pregel_run(
        graph,
        sssp_spec(source, weight_col),
        max_supersteps=max_supersteps,
        checkpointer=checkpointer,
        mutations=mutations,
    )
