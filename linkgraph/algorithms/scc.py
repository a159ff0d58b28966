"""Strongly connected components of a DIRECTED graph (beyond-paper
extra; C2's min-label components only answers the undirected question).

Algorithm: trim + forward-coloring + backward-reach — the standard
BSP/Pregel SCC construction (FW-BW coloring):

1. **Trim**: a vertex with no in-edges or no out-edges inside the
   remaining subgraph is its own SCC; peel such vertices repeatedly
   (this disposes of DAG tails, which pure coloring would otherwise
   eliminate one root per round).
2. **Color**: forward min-label propagation within the remaining
   subgraph — color(v) = min id that reaches v. Each color class
   contains its own root c (color(c) = c).
3. **Backward**: inside each color class, flag vertices that reach
   their root via edges whose BOTH endpoints share the color; the
   flagged set IS SCC(root) — assign scc = color, remove, repeat.
   All color classes are processed simultaneously per round.

Every phase is a fixpoint of one combine+apply exchange per superstep
(the same fused shape as the PregelSpec algorithms; hand-rolled here
because the outer driver interleaves three different inner fixpoints
over a shrinking vertex set). Confluent (min / or are idempotent,
commutative, associative), so the result is exact and
schedule-independent — property-tested against networkx.

Scale shape: per superstep the shuffle carries only the remaining
subgraph's messages; `remaining` shrinks every outer round, and AQE
re-plans the semi-joins to broadcasts once it fits. Worst case is
O(#SCC-DAG-levels) outer rounds after trimming; each inner fixpoint is
O(diameter of remaining). State is localCheckpoint'ed at every barrier
(plan-growth control, same as pregel_run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.pregel import RunInfo, truncate_lineage


def _min_fixpoint(edges: DataFrame, labels: DataFrame, info: RunInfo) -> DataFrame:
    """labels(id, lab) -> fixpoint of lab(dst) = min(lab(dst), lab(src))
    over the given directed edges. One exchange per superstep; the
    frontier (changed rows) is the only scatter source after step 1."""
    import time

    frontier = labels
    for _ in range(100_000):  # bounded by remaining-subgraph diameter
        t0 = time.monotonic()
        msgs = edges.join(
            frontier.withColumnRenamed("id", "src"), "src"
        ).select("dst", F.col("lab").alias("m"), F.lit(None).cast("long").alias("o"))
        carried = labels.select(
            F.col("id").alias("dst"), F.lit(None).cast("long").alias("m"), F.col("lab").alias("o")
        )
        new = (
            msgs.unionByName(carried)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("m").alias("m"), F.max("o").alias("o"))
            .select(
                "id",
                F.least(F.coalesce(F.col("m"), F.col("o")), F.col("o")).alias("lab"),
                F.coalesce(F.col("m") < F.col("o"), F.lit(False)).alias("changed"),
            )
        )
        new = truncate_lineage(new, eager=False)
        active = new.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        info.record(info.supersteps + 1, t0, active=int(active))
        frontier = new.filter("changed").select("id", "lab")
        labels = new.select("id", "lab")
        if active == 0:
            return labels
    raise RuntimeError("_min_fixpoint: did not converge (cycle in driver logic?)")


def scc(
    graph: Graph, max_outer: int = 100
) -> tuple[DataFrame, RunInfo]:
    """Returns (state(id, scc), RunInfo); scc = min vertex id of the
    strongly connected component (matching the oracle's normal form).
    RunInfo.supersteps counts every inner barrier across all phases."""
    info = RunInfo("scc")
    edges = graph.edges.select("src", "dst")
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    remaining = truncate_lineage(graph.vertices.repartition(p, "id"))
    done_parts: list[DataFrame] = []
    import time

    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        sub = truncate_lineage(
            edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .repartition(p, "src")
        )
        # ---- trim: no in-edge or no out-edge in `sub` => singleton SCC
        t0 = time.monotonic()
        srcs = sub.select(F.col("src").alias("id")).distinct()
        dsts = sub.select(F.col("dst").alias("id")).distinct()
        keep = remaining.join(srcs, "id", "left_semi").join(dsts, "id", "left_semi")
        trimmed = remaining.join(keep, "id", "left_anti")
        n_trim = trimmed.count()
        info.record(info.supersteps + 1, t0, active=int(n_trim))
        if n_trim:
            done_parts.append(
                truncate_lineage(trimmed.select("id", F.col("id").alias("scc")))
            )
            remaining = truncate_lineage(keep)
            continue  # re-derive sub before coloring: trims cascade

        # ---- color: forward min-label within the remaining subgraph
        colors = _min_fixpoint(
            sub, remaining.select("id", F.col("id").alias("lab")), info
        )

        # ---- backward: reach-the-root within each color class. Flag
        # propagation = min-fixpoint with labels 0 (flagged) / id+1:
        # reuse _min_fixpoint on REVERSED same-color edges with
        # lab = 0 for roots; a vertex is in SCC(root) iff lab hits 0.
        same_color = (
            sub.join(colors.withColumnRenamed("id", "src").withColumnRenamed("lab", "cs"), "src")
            .join(colors.withColumnRenamed("id", "dst").withColumnRenamed("lab", "cd"), "dst")
            .filter(F.col("cs") == F.col("cd"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        init = colors.select(
            "id",
            F.when(F.col("id") == F.col("lab"), F.lit(0)).otherwise(F.lit(1)).cast("long").alias("lab"),
        )
        reach = _min_fixpoint(same_color, init, info)
        found = (
            reach.filter("lab = 0")
            .select("id")
            .join(colors.withColumnRenamed("lab", "scc"), "id")
            .select("id", "scc")
        )
        done_parts.append(truncate_lineage(found))
        remaining = truncate_lineage(
            remaining.join(found.select("id"), "id", "left_anti")
        )
    else:
        if not remaining.isEmpty():
            raise RuntimeError(
                f"scc: not converged after {max_outer} outer rounds"
            )

    out = done_parts[0]
    for d in done_parts[1:]:
        out = out.unionByName(d)
    info.converged = True
    return out.repartition(p, "id"), info
