"""PageRank as Pregel supersteps over DataFrames (SURVEY §2.C C1).

Pinned semantics (SURVEY §A.2, paper §5.1): d = 0.85, init 1/N, update
`(1-d)/N + d·Σ msgs`; each vertex sends rank/outdeg along its
out-edges; dangling vertices send nothing by default (`dangling="drop"`
— the paper's program; `"redistribute"` spreads their mass uniformly,
matching library conventions). Convergence: L1 delta < tol.

Superstep plan (one Spark job, ONE shuffle — the fused form):
  scatter  B2: links ⋈ state on src — links pre-partitioned P ways on
              src and persisted once; AQE broadcasts the state side
              when it fits, else co-partitions.
  combine+apply B3/B5, fused: the old-rank rows are UNIONED into the
              message stream as (id, contrib=0, old=rank) markers, so
              a single `groupBy(id).agg(sum(contrib), sum(old))`
              produces the new rank AND carries the old one — no
              second join, no second exchange. Map-side partial agg
              is THE Pregel combiner; only combined sums cross the
              wire ("bounded per-superstep shuffle"). Measured ~2×
              faster per superstep than the join-based apply and it
              removes the one stage that didn't scale with cores.
  aggregate B7/B8: sum(|new-old|) — the delta accumulator; its
              `first()` is the superstep barrier (and it materializes
              the lazy lineage checkpoint in the same job).

Skew: in-degree skew is absorbed by the map-side partial sum (each
task pre-merges its contributions to a hot dst before shuffling);
out-degree skew in the scatter join is handled by AQE skew-join
splitting (enabled in session.py). The explicit hot-vertex broadcast
split (B12) lives in skew.py and is exercised by tests for parity.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, out_degrees
from linkgraph.pregel import RunInfo, truncate_lineage


def pagerank(
    graph: Graph,
    d: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 100,
    dangling: str = "drop",
    checkpointer=None,
    hot_threshold: int | None = None,
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, rank), RunInfo). float64 end-to-end (§A.6).

    Note (negative result, measured): chaining k supersteps lazily
    between barriers to amortize driver latency is a 5.7× REGRESSION —
    each superstep's output is referenced twice (scatter input + the
    carried-old branch), so an unmaterialized chain recomputes the
    subtree ~2^k times. One materializing barrier per superstep is the
    correct structure; Pregel's barrier is not overhead to skip.
    """
    assert dangling in ("drop", "redistribute")
    spark = graph.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = graph.num_vertices
    base = (1.0 - d) / n

    # Precompute once: out-edges with the sender's degree attached, so the
    # per-superstep scatter is a single equi-join producing rank/outdeg.
    deg = out_degrees(graph.edges).withColumnRenamed("id", "src")
    # sortWithinPartitions: the cached relation keeps its ordering, so
    # the per-superstep sort-merge scatter join never re-sorts the |E|
    # side — only the |V| state side sorts (verified in test_plans).
    links = (
        graph.edges.join(deg, "src")
        .select("src", "dst", "outdeg")
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    links.count()  # materialize before the loop

    hot_ids = None
    if hot_threshold is not None:
        from linkgraph.skew import hot_vertices

        hot_ids = hot_vertices(
            deg.select(F.col("src").alias("id"), "outdeg"), hot_threshold
        ).persist()
        hot_ids.count()

    info = RunInfo("pagerank")
    start_step = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.try_resume("pagerank")
        if resumed is not None:
            start_step, state = resumed
    if state is None:
        state = graph.vertices.select(
            "id", F.lit(1.0 / n).cast("double").alias("rank")
        )
        state = truncate_lineage(state.repartition(p, "id"))

    dangling_ids = None
    if dangling == "redistribute":
        dangling_ids = graph.vertices.join(
            deg.withColumnRenamed("src", "id"), "id", "left_anti"
        ).persist()

    def one_superstep(cur: DataFrame, extra: float) -> DataFrame:
        """Build one lazy superstep plan: (id, rank, rank_old)."""
        if hot_ids is not None:
            from linkgraph.skew import scatter_hot_broadcast

            contribs = scatter_hot_broadcast(links, cur, hot_ids)
        else:
            contribs = links.join(cur.withColumnRenamed("id", "src"), "src").select(
                "dst", (F.col("rank") / F.col("outdeg")).alias("contrib")
            )
        # fused combine+apply: old ranks ride the same shuffle as markers
        carried = cur.select(
            F.col("id").alias("dst"),
            F.lit(0.0).alias("contrib"),
            F.col("rank").alias("old"),
        )
        return (
            contribs.withColumn("old", F.lit(0.0))
            .unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (F.lit(base + extra) + F.lit(d) * F.sum("contrib")).alias("rank"),
                F.sum("old").alias("rank_old"),
            )
        )

    converged = False
    step = start_step
    while step < max_supersteps and not converged:
        t0 = time.monotonic()
        extra = 0.0
        if dangling == "redistribute":
            dm = (
                state.join(dangling_ids, "id", "left_semi")
                .agg(F.sum("rank").alias("m"))
                .first()["m"]
            )
            extra = d * float(dm or 0.0) / n

        new_state = one_superstep(state, extra)
        # lazy checkpoint: the delta agg below materializes it in one job
        new_state = truncate_lineage(new_state, eager=False)
        delta = float(
            new_state.agg(
                F.sum(F.abs(F.col("rank") - F.col("rank_old"))).alias("d")
            ).first()["d"]
        )
        state = new_state.select("id", "rank")
        step += 1
        info.record(step, t0, delta=delta)
        if checkpointer is not None:
            cp = checkpointer.maybe_checkpoint("pagerank", step, state, delta=delta)
            if cp is not None:
                state = cp  # durable read-back replaces in-memory state
        if delta < tol:
            converged = True

    info.converged = converged
    info.supersteps = step
    links.unpersist()
    if hot_ids is not None:
        hot_ids.unpersist()
    if dangling_ids is not None:
        dangling_ids.unpersist()
    if checkpointer is not None:
        checkpointer.finish("pagerank", step, state)
    return state, info
