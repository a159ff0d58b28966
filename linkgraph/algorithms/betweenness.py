"""Betweenness centrality — Brandes' algorithm over sampled sources.

Reference semantics: the reference snapshot is empty (SURVEY §0);
semantics are pinned to the published algorithm (Brandes 2001) and its
sampled-source approximation (Brandes & Pich 2007): for each source s
in a pivot set S,

  forward:   BFS levels d(s,·) with shortest-path counts
             σ(s,v) = Σ_{u pred of v} σ(s,u)            (exact BIGINTs)
  backward:  dependency accumulation, deepest level first:
             δ(s,v) = Σ_{w succ of v} σ(s,v)/σ(s,w) · (1 + δ(s,w))
  score:     bc(v) = Σ_{s ≠ v} δ(s,v)

(undirected simple graph; "pred/succ of v" = BFS-DAG neighbors one
level closer/further from s). With S = all vertices this is exact
Brandes; the pivot form scales it to graphs where all-pairs is
impossible. Pivots are the deterministic top-degree set (ties by id),
same rule as landmark centrality.

Spark shape — the reason this algorithm is a BSP classic: both passes
are per-level joins, never per-path work.

  forward: (s, v, σ) frontier ⋈ edges on the vertex id (graph
  partitioning reused) → groupBy (s, dst) SUM(σ) — the σ recurrence IS
  the message combiner — anti-join known, localCheckpoint per hop.
  backward: for level h from deepest-1 down to 0, one join of the
  level-h vertex set against edges + the level-(h+1) (σ, δ) rows →
  groupBy (s, v) SUM — again a single combined exchange per level.

State is |S|·|V| rows at completion (pivot counts are small); path
COUNTS are BIGINT-exact (no float σ drift); δ is float with the sum
round-off the driver compare absorbs at 6 dp. Per-hop/level actions:
one count (forward emptiness) and none in the backward unroll.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize
from linkgraph.pregel import RunInfo
from linkgraph.algorithms.centrality import pick_landmarks


def betweenness(
    graph: Graph,
    num_sources: int = 16,
    max_hops: int = 32,
    sources: DataFrame | None = None,
) -> tuple[DataFrame, RunInfo]:
    """Returns ((id, betweenness) for every vertex — raw Brandes sums
    over the pivot set, no normalization —, RunInfo)."""
    und = symmetrize(graph.edges).persist()
    src = sources if sources is not None else pick_landmarks(graph, num_sources)
    src = src.select(F.col("lm").alias("s")) if "lm" in src.columns else src

    # ---- forward: levels + exact path counts --------------------------
    frontier = src.select("s", F.col("s").alias("v"), F.lit(1).alias("sigma"))
    known = frontier.select(
        "s", "v", F.lit(0).alias("d"), F.col("sigma").cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    info = RunInfo("betweenness")
    t0 = time.monotonic()
    depth = 0
    h = 0
    while h < max_hops:
        h += 1
        nxt = (
            frontier.join(und, frontier["v"] == und["src"])
            .groupBy("s", F.col("dst").alias("w"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("w", "v")
            .join(known.select("s", "v"), ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        if n == 0:
            info.converged = True
            break
        depth = h
        known = known.unionByName(
            nxt.select("s", "v", F.lit(h).alias("d"), "sigma")
        ).localCheckpoint(eager=True)
        frontier = nxt
        info.record(h, t0, active=n)

    # ---- backward: dependency accumulation, deepest level first -------
    # δ rows exist only where non-zero; levels join against the
    # accumulated delta of the level below
    delta = known.select("s", "v", F.lit(0.0).alias("delta")).limit(0)
    for lev in range(depth - 1, -1, -1):
        below = (
            known.filter(F.col("d") == lev + 1)
            .join(delta, ["s", "v"], "left")
            .select(
                "s",
                F.col("v").alias("w"),
                F.col("sigma").alias("sigma_w"),
                F.coalesce("delta", F.lit(0.0)).alias("delta_w"),
            )
        )
        contrib = (
            known.filter(F.col("d") == lev)
            .join(und, known["v"] == und["src"])
            .select("s", "v", "sigma", F.col("dst").alias("w"))
            .join(below, ["s", "w"])
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma").cast("double")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("delta")
            )
        )
        delta = delta.unionByName(contrib).localCheckpoint(eager=True)

    bc = (
        delta.join(known.select("s", "v", "d"), ["s", "v"])
        .filter(F.col("d") > 0)
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("betweenness"))
    )
    out = graph.vertices.join(bc, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    und.unpersist()
    info.supersteps = depth
    info.wall_s = round(time.monotonic() - t0, 3)
    return out, info
