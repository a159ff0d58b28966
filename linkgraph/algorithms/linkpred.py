"""Link prediction — common-neighbor scores over the undirected graph.

Reference semantics: the reference snapshot is empty (SURVEY §0);
semantics are pinned to the standard published similarity indices
(Liben-Nowell & Kleinberg 2003):

    common(u,v)      = |N(u) ∩ N(v)|
    jaccard(u,v)     = common / |N(u) ∪ N(v)|
    adamic_adar(u,v) = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))

computed for every NON-adjacent pair {u,v} (u < v) with at least
`min_common` shared neighbors. A shared neighbor w is adjacent to both
u and v, so deg(w) ≥ 2 and ln(deg(w)) > 0 — no division guard needed.

Spark shape (one wedge self-join, all JVM-side):

    wedges: e(w,u) ⋈ e(w,v) on the center w, u < v
    scores: groupBy(u,v) → count(*)            = common
                           sum(1/ln(deg(w)))   = adamic_adar
    anti-join the canonical edge set (drop adjacent pairs), then one
    degree join per endpoint for the Jaccard denominator.

Scale shape: wedge volume is Σ_w deg(w)² — the inherent cost of
common-neighbor enumeration — and a power-law hub makes that quadratic
in the hub degree. `max_center_degree` caps the CENTERS (standard
practice: a w with thousands of neighbors contributes ~0 Adamic-Adar
weight anyway, 1/ln(deg) → 0, but would dominate the shuffle); dropped
centers are counted and logged, never silent. The groupBy is map-side
combined; both degree joins are |V|-sized. The same cap parameter is
mirrored by the DuckDB oracle in `__spark_entry__._linkpred_oracle_sql`
so the driver compare is exact.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, symmetrize

log = logging.getLogger(__name__)


def link_prediction(
    graph: Graph,
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Returns (src, dst, common, jaccard, adamic_adar), src < dst,
    non-adjacent pairs only.

    jaccard uses the FULL degrees of the endpoints even when
    `max_center_degree` caps the wedge centers (the cap bounds which
    shared neighbors are counted, not what a vertex's neighborhood
    size is)."""
    und = symmetrize(graph.edges)  # both directions, simple
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )

    centers = deg
    if max_center_degree is not None:
        centers = deg.filter(F.col("d") <= max_center_degree)
        n_dropped = deg.count() - centers.count()
        if n_dropped:
            log.warning(
                "link_prediction: dropped %d wedge centers with degree > %d "
                "(their shared-neighbor contributions are not counted)",
                n_dropped,
                max_center_degree,
            )

    # wedge self-join on the center; the center's degree rides along
    # so adamic_adar needs no extra join
    ew = und.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(
        centers.select(F.col("id").alias("w"), "d"), "w"
    )
    a = ew.select("w", F.col("n").alias("u"), "d")
    b = ew.select("w", F.col("n").alias("v"))
    scores = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("adamic_adar"),
        )
        .filter(F.col("common") >= min_common)
    )

    canon = und.filter(F.col("src") < F.col("dst")).select("src", "dst")
    nonadj = scores.join(canon, ["src", "dst"], "left_anti")

    return (
        nonadj.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(
            "src",
            "dst",
            "common",
            (
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common")).cast("double")
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
