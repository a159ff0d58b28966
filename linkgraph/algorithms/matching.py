"""Maximal bipartite matching as Pregel supersteps (paper §5.3).

The Pregel paper's example program runs a four-phase randomized cycle
(request → grant → accept → confirm). Here one SUPERSTEP executes the
whole cycle as a chain of DataFrame joins — still BSP (every superstep
sees a consistent matching), but the driver pays one barrier per
matching round instead of four. The paper's random tie-breaks are
replaced by deterministic min-id choices: unmatched right vertices
grant their smallest requester, left vertices accept their smallest
granter. Determinism is required for resume-equality and oracle tests;
maximality is unaffected (any round with at least one edge between two
unmatched vertices produces at least one new match, so the fixpoint —
no such edge remains — is a maximal matching).

Input contract: `graph.edges` are directed left→right; a vertex id may
not appear on both sides (validated — the paper assumes a bipartite
input rather than checking it).

Scale shape per superstep: request generation is two semi-joins of the
static edge relation against the (shrinking) unmatched vertex sets;
grant/accept are min-aggregations (map-side partial combine); the state
update is one left join. Everything is keyed on vertex id — no
cartesian anything, shuffle volume bounded by the surviving edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.pregel import PregelSpec, RunInfo, pregel_run


def bipartite_matching(
    graph: Graph, max_supersteps: int = 100
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, side, match), RunInfo); match is NULL for
    unmatched vertices, side is 0 (left / edge source) or 1 (right)."""
    edges = graph.edges
    left_ids = edges.select(F.col("src").alias("id")).distinct()
    right_ids = edges.select(F.col("dst").alias("id")).distinct()
    overlap = left_ids.join(right_ids, "id").count()
    if overlap:
        raise ValueError(
            f"bipartite_matching: {overlap} vertex id(s) appear as both "
            "src and dst — edges must run left→right over disjoint sides"
        )

    def init_state(verts):
        return (
            verts.join(left_ids.withColumn("_l", F.lit(1)), "id", "left")
            .select(
                "id",
                F.when(F.col("_l").isNotNull(), F.lit(0))
                .otherwise(F.lit(1))
                .alias("side"),
                F.lit(None).cast("long").alias("match"),
            )
        )

    def step(links, state, frontier, aggs):
        unmatched = state.filter(F.col("match").isNull())
        lu = unmatched.filter(F.col("side") == 0).select(F.col("id").alias("src"))
        ru = unmatched.filter(F.col("side") == 1).select(F.col("id").alias("dst"))
        # phase 1 (request): edges whose BOTH endpoints are unmatched
        req = links.join(lu, "src", "left_semi").join(ru, "dst", "left_semi")
        # phase 2 (grant): each right vertex grants its min requester
        grants = req.groupBy("dst").agg(F.min("src").alias("src"))
        # phase 3 (accept): each left vertex accepts its min granter;
        # the pair is mutual by construction (that granter chose it)
        accepts = grants.groupBy("src").agg(F.min("dst").alias("dst"))
        new = (
            accepts.select(F.col("src").alias("id"), F.col("dst").alias("nm"))
            .unionByName(
                accepts.select(F.col("dst").alias("id"), F.col("src").alias("nm"))
            )
        )
        return state.join(new, "id", "left").select(
            "id",
            "side",
            F.coalesce(F.col("match"), F.col("nm")).alias("match"),
            F.col("nm").isNotNull().alias("changed"),
        )

    spec = PregelSpec(
        algo="bipartite_matching",
        state_cols=("side", "match"),
        init_state=init_state,
        prepare_links=lambda e: e.select("src", "dst"),
        step=step,
        metrics={"new_matches": F.sum(F.col("changed").cast("long"))},
        halt=lambda a: a.get("new_matches") is not None
        and int(a["new_matches"] or 0) == 0,
        frontier_filter=None,
    )
    return pregel_run(graph, spec, max_supersteps=max_supersteps)
