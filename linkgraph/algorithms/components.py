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
    und = symmetrize(graph.edges).repartition(p, "src").persist()
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
        msgs = (
            und.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("comp").alias("msg"))
        )
        prev = state.select("id", F.col("comp").alias("comp_old"))
        new_state = (
            prev.join(msgs, prev["id"] == msgs["dst"], "left_outer")
            .select(
                "id",
                F.least(
                    F.col("comp_old"), F.coalesce(F.col("msg"), F.col("comp_old"))
                ).alias("comp"),
                (F.coalesce(F.col("msg"), F.col("comp_old")) < F.col("comp_old")).alias(
                    "changed"
                ),
            )
        )
        new_state = truncate_lineage(new_state)
        active = new_state.filter("changed").count()
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
