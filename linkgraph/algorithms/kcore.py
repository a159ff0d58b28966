"""k-core decomposition (fixed k) as Pregel supersteps.

The k-core of an undirected simple graph is the maximal induced
subgraph in which every vertex has degree >= k; it is computed by
iteratively peeling vertices of degree < k until none remain. As a
vertex program (the standard Pregel formulation): every vertex keeps
`(alive, deg)`; a vertex that dies scatters a decrement to each
neighbor; a vertex applies `deg -= #dead-neighbor messages` and dies
when `deg < k`. Peeling is confluent (the k-core is unique and
independent of removal order), so the BSP schedule is exact.

Scale shape: this is the *delta* formulation — per superstep the
scatter join's state side is only the newly-dead frontier, so shuffle
volume is bounded by edges incident to vertices dying that round, not
|E|. Total messages over the whole run <= 2|E| (each edge delivers at
most one decrement per direction, ever) — the same total-work bound as
sequential peeling. The naive alternative (recount all alive degrees
every round) costs O(|E|) per round; on a 100 TB graph with a deep
peeling sequence that is the difference between one pass and hundreds.

Superstep count = number of peeling waves (graph-dependent, <= |V|);
each wave is one barrier with the usual fused single-exchange plan.

Checkpoint/resume: decrement messages are NOT idempotent, so resuming
with a widened frontier would re-deliver them and corrupt degrees; the
r4 pregel_run snapshots carry the exact frontier (`_frontier` marker)
and restore it, making kcore + checkpointer safe — resumed ==
uninterrupted, asserted in tests/test_resume.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize
from linkgraph.pregel import PregelSpec, RunInfo, pregel_run


def kcore_spec(k: int, degrees: DataFrame) -> PregelSpec:
    """`degrees` = undirected degree per vertex id (computed once by the
    caller from the same symmetrized edge set used as links)."""

    def init_state(verts):
        # vertices_of guarantees every id has >= 1 edge, but a LEFT join
        # keeps the spec safe for callers passing extra isolated ids
        # (degree 0 => dead in superstep 1, exactly like peeling).
        return verts.join(degrees, "id", "left").select(
            "id",
            F.lit(True).alias("alive"),
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
        )

    def step(links, state, frontier, aggs):
        # frontier = vertices that CHANGED last superstep == newly dead
        # (changed is only ever set on a live->dead transition), so the
        # scatter side is the dying wave, not the full state. The
        # filter exists for superstep 1, where pregel_run seeds the
        # frontier with the FULL (all-alive) state: no one has died
        # yet, so no decrements flow and the step just applies the
        # initial deg >= k test.
        dead = frontier.filter(~F.col("alive")).select(F.col("id").alias("src"))
        msgs = links.join(dead, "src", "left_semi").select(
            "dst",
            F.lit(1).cast("long").alias("dec"),
            F.lit(None).cast("boolean").alias("o_alive"),
            F.lit(None).cast("long").alias("o_deg"),
        )
        carried = state.select(
            F.col("id").alias("dst"),
            F.lit(None).cast("long").alias("dec"),
            F.col("alive").alias("o_alive"),
            F.col("deg").alias("o_deg"),
        )
        merged = (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum("dec").alias("d"),
                F.max("o_alive").alias("a"),
                F.max("o_deg").alias("dg"),
            )
        )
        new_deg = F.col("dg") - F.coalesce(F.col("d"), F.lit(0))
        new_alive = F.col("a") & (new_deg >= F.lit(k))
        return merged.select(
            "id",
            new_alive.alias("alive"),
            new_deg.alias("deg"),
            (F.col("a") & ~new_alive).alias("changed"),
        )

    return PregelSpec(
        algo=f"kcore_{k}",
        state_cols=("alive", "deg"),
        init_state=init_state,
        prepare_links=lambda e: e,  # caller passes the symmetrized graph
        step=step,
        metrics={
            "active": F.sum(F.col("changed").cast("long")),
            "alive": F.sum(F.col("alive").cast("long")),
        },
        halt=lambda a: int(a.get("active") or 0) == 0,
        frontier_filter="changed",
    )


def kcore(
    graph: Graph, k: int, max_supersteps: int = 10_000, checkpointer=None
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, alive, deg), RunInfo) over ALL input vertices.

    `alive` marks k-core membership; for members, `deg` at convergence
    equals the vertex's degree WITHIN the induced k-core subgraph
    (original degree minus one decrement per peeled neighbor).
    """
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    sym = symmetrize(graph.edges)
    degrees = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    sym_graph = Graph(
        edges=sym,
        vertices=graph.vertices,
        num_vertices=graph.num_vertices,
        num_edges=graph.num_edges,
    )
    return pregel_run(
        sym_graph,
        kcore_spec(k, degrees),
        max_supersteps=max_supersteps,
        checkpointer=checkpointer,
    )
