"""Connected components via min-label propagation (SURVEY §2.C C2).

HashMin over the symmetrized simple graph: init label=id; every
superstep each *frontier* (changed) vertex scatters its label to its
neighbors; each vertex applies `min(label, min msgs)`; vertices vote
to halt when unchanged and terminate when the frontier is empty
(paper §2 halt semantics). Min is confluent, so the result is exact
and schedule-independent; supersteps = O(component diameter).

Expressed as a PregelSpec over the generic fused-superstep driver
(pregel.pregel_run): one combine+apply shuffle per superstep carrying
messages AND old labels as marker rows; the frontier filter implements
vote-to-halt (B6) — the scatter join's state side shrinks every
superstep, and AQE re-plans it to a broadcast join once the frontier
fits the threshold (the classic long-tail speedup for high-diameter
graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize
from linkgraph.pregel import PregelSpec, RunInfo, pregel_run


def components_spec() -> PregelSpec:
    def step(links, state, frontier, aggs):
        msgs = links.join(frontier.withColumnRenamed("id", "src"), "src").select(
            "dst", F.col("comp").alias("msg"), F.lit(None).cast("long").alias("old")
        )
        carried = state.select(
            F.col("id").alias("dst"),
            F.lit(None).cast("long").alias("msg"),
            F.col("comp").alias("old"),
        )
        return (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("m"), F.max("old").alias("o"))
            .select(
                "id",
                F.least(F.coalesce(F.col("m"), F.col("o")), F.col("o")).alias("comp"),
                F.coalesce(F.col("m") < F.col("o"), F.lit(False)).alias("changed"),
            )
        )

    return PregelSpec(
        algo="components",
        state_cols=("comp",),
        init_state=lambda verts: verts.select("id", F.col("id").alias("comp")),
        prepare_links=symmetrize,
        step=step,
        metrics={"active": F.sum(F.col("changed").cast("long"))},
        halt=lambda a: int(a.get("active") or 0) == 0,
        frontier_filter="changed",
    )


def connected_components(
    graph: Graph, max_supersteps: int = 200, checkpointer=None, mutations=None
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, comp), RunInfo). comp = min vertex id reachable.

    mutations: optional barrier-resolved topology mutation callback
    (B14, paper §3.4) — min-label is confluent under edge ADDITION, so
    mid-compute growth converges to the final graph's components;
    removals only stop future message flow (monotone state is not
    retracted).
    """
    return pregel_run(
        graph,
        components_spec(),
        max_supersteps=max_supersteps,
        checkpointer=checkpointer,
        mutations=mutations,
    )
