"""Connected components via min-label propagation (SURVEY §2.C C2).

HashMin over the symmetrized simple graph: init label=id; every
superstep each *frontier* (changed) vertex scatters its label to its
neighbors; each vertex applies `min(label, min msgs)`; vertices vote
to halt when unchanged and terminate when the frontier is empty
(paper §2 halt semantics). Min is confluent, so the result is exact
and schedule-independent; supersteps = O(component diameter).

Frontier machinery (B6): scatter only from changed vertices — the
scatter join's state side shrinks every superstep, and AQE re-plans it
to a broadcast join once the frontier fits the threshold (the classic
long-tail speedup for high-diameter graphs).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize
from linkgraph.pregel import RunInfo, truncate_lineage


def connected_components(
    graph: Graph, max_supersteps: int = 200, checkpointer=None
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, comp), RunInfo). comp = min vertex id reachable."""
    spark = graph.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        symmetrize(graph.edges)
        .repartition(p, "src")
        .sortWithinPartitions("src")  # pre-sorted cache: no per-superstep sort
        .persist()
    )
    und.count()

    info = RunInfo("connected_components")
    start_step = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.try_resume("components")
        if resumed is not None:
            # Restart scatter from the full vertex set: min-propagation is
            # confluent, so a too-large frontier costs one superstep, not
            # correctness.
            start_step, state = resumed
            state = truncate_lineage(state.repartition(p, "id"))
    if state is None:
        state = truncate_lineage(
            graph.vertices.select("id", F.col("id").alias("comp")).repartition(p, "id")
        )
    frontier = state  # superstep 0 (or resume): every vertex is "changed"

    step = start_step
    for step in range(start_step + 1, max_supersteps + 1):
        t0 = time.monotonic()
        # fused combine+apply: one shuffle carries messages AND old labels
        msgs = und.join(frontier.withColumnRenamed("id", "src"), "src").select(
            "dst", F.col("comp").alias("msg"), F.lit(None).cast("long").alias("old")
        )
        carried = state.select(
            F.col("id").alias("dst"),
            F.lit(None).cast("long").alias("msg"),
            F.col("comp").alias("old"),
        )
        new_state = (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("m"), F.max("old").alias("o"))
            .select(
                "id",
                F.least(F.coalesce(F.col("m"), F.col("o")), F.col("o")).alias("comp"),
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
        frontier = new_state.filter("changed").select("id", "comp")
        state = new_state.select("id", "comp")
        info.record(step, t0, active=active)
        if checkpointer is not None:
            cp = checkpointer.maybe_checkpoint("components", step, state, active=active)
            if cp is not None:
                state = cp
        if active == 0:
            info.converged = True
            break

    info.supersteps = step
    und.unpersist()
    if checkpointer is not None:
        checkpointer.finish("components", step, state)
    return state, info
