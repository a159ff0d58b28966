"""Synchronous label propagation (community detection) — SURVEY §2.C C3.

Pinned semantics (§A.3): undirected; init label=id; every superstep
EVERY vertex adopts the most frequent label among its neighbors, ties
broken toward the SMALLEST label; a vertex with no neighbors keeps its
label; fixed `max_iter` (default 10) because sync LPA can oscillate
(FIXTURES.md G2 demonstrates a 2-cycle), with an optional early stop
at a fixpoint (a fixpoint is stable, so early-stop never changes the
final labels for runs that reach one).

Tie-break is implemented as a pure function of (count, label) — an
aggregate of `max(struct(cnt, -label))` per dst — never of arrival
order, so results are partition-invariant (the classic distributed-LPA
bug class). The agg form needs no per-group sort (vs a row_number
window) and keeps the combine map-side partial like every other
superstep aggregate.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize
from linkgraph.pregel import RunInfo, truncate_lineage


def label_propagation(
    graph: Graph, max_iter: int = 10, early_stop: bool = True, checkpointer=None
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, label), RunInfo)."""
    spark = graph.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        symmetrize(graph.edges)
        .repartition(p, "src")
        .sortWithinPartitions("src")  # pre-sorted cache: no per-superstep sort
        .persist()
    )
    und.count()

    info = RunInfo("label_propagation")
    start_step = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.try_resume("lpa")
        if resumed is not None:
            start_step, state = resumed
            state = truncate_lineage(state.repartition(p, "id"))
    if state is None:
        state = truncate_lineage(
            graph.vertices.select("id", F.col("id").alias("label")).repartition(p, "id")
        )

    step = start_step
    for step in range(start_step + 1, max_iter + 1):
        t0 = time.monotonic()
        # fused: old labels ride the shuffle as zero-count marker rows —
        # they win argmax ONLY when the vertex has no real messages
        # (the "no neighbors keep label" rule), since any neighbor
        # label has cnt ≥ 1 > 0.
        msgs = und.join(state.withColumnRenamed("id", "src"), "src").select(
            "dst",
            "label",
            F.lit(1).cast("long").alias("c"),
            F.lit(None).cast("long").alias("old"),
        )
        carried = state.select(
            F.col("id").alias("dst"),
            "label",
            F.lit(0).cast("long").alias("c"),
            F.col("label").alias("old"),
        )
        counts = (
            msgs.unionByName(carried)
            .groupBy("dst", "label")
            .agg(F.sum("c").alias("cnt"), F.max("old").alias("old"))
        )
        # argmax by (cnt desc, label asc): max over struct(cnt, -label, label)
        new_state = (
            counts.groupBy(F.col("dst").alias("id"))
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("c"),
                        (-F.col("label")).alias("nl"),
                        F.col("label").alias("l"),
                    )
                ).alias("w"),
                F.max("old").alias("label_old"),
            )
            .select(
                "id",
                F.col("w.l").alias("label"),
                (F.col("w.l") != F.col("label_old")).alias("changed"),
            )
        )
        new_state = truncate_lineage(new_state, eager=False)
        changed = (
            int(
                new_state.agg(F.sum(F.col("changed").cast("long")).alias("a")).first()[
                    "a"
                ]
                or 0
            )
            if early_stop
            else None
        )
        if not early_stop:
            new_state.count()  # still materialize the lazy checkpoint
        state = new_state.select("id", "label")
        info.record(step, t0, active=changed)
        if checkpointer is not None:
            cp = checkpointer.maybe_checkpoint("lpa", step, state, active=changed)
            if cp is not None:
                state = cp
        if early_stop and changed == 0:
            info.converged = True
            break

    info.supersteps = step
    und.unpersist()
    if checkpointer is not None:
        checkpointer.finish("lpa", step, state)
    return state, info
