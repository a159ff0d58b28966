"""Whole-graph summary statistics (SURVEY §2.C extensions).

Reference semantics: the reference snapshot is empty (SURVEY §0);
semantics are pinned to the published definitions —

  degree assortativity  (Newman, "Assortative mixing in networks",
  PRL 89, 2002): the Pearson correlation of (deg(u), deg(v)) over the
  ORDERED pairs of the symmetrized simple graph (each undirected edge
  contributes both (u,v) and (v,u), the standard convention — it makes
  the two marginals identical).

  modularity  (Newman & Girvan 2004), undirected form over a vertex
  labelling c(·):

      Q = Σ_communities ( L_c / m  −  (D_c / 2m)² )

  with m = |undirected simple edges|, L_c = intra-community edge
  count, D_c = Σ degree over the community's vertices.  Unlabelled
  vertices (labels missing for some ids) are treated as singleton
  communities — a singleton with no intra edges contributes only its
  −(D/2m)² term either way, so this matches the usual convention.

Numerics are pinned for oracle exactness: every aggregate is a BIGINT
sum (counts, degree sums, sums of degree products), and the statistic
is ONE float expression over those exact integers, so Spark and any
ANSI-SQL oracle produce bit-identical doubles:

      r = (n·Sxy − Sx·Sy) / ( sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²) )
      Q = (4·m·ΣL_c − ΣD_c²) / (4·m²)

Scale shape: two |V|-sized degree joins + one global aggregate each —
no |E|² term anywhere; the degree table is groupBy-partitioned on the
vertex id so the edge joins reuse that partitioning. BIGINT moment
sums hold up to |pairs|·max_deg² ≲ 9.2e18; a 10^12-edge graph with
10^6-degree hubs overflows them — at that scale swap the moment sums
to DOUBLE (one cast) and accept last-ulp nondeterminism, which the
6-dp rounding the callers apply already absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, canonical_undirected, symmetrize


def _und_degrees(edges: DataFrame) -> DataFrame:
    """(id, deg) over the symmetrized simple graph."""
    return (
        symmetrize(edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """One row: (pairs, assortativity) — Pearson r of endpoint degrees
    over ordered pairs of the undirected simple graph."""
    und = symmetrize(graph.edges)
    deg = _und_degrees(graph.edges)

    pairs = (
        und.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy")), "dst")
        .select("dx", "dy")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return mom.select(
        F.col("n").alias("pairs"), (num / den).alias("assortativity")
    )


def modularity(graph: Graph, labels: DataFrame) -> DataFrame:
    """One row: (m, communities, modularity) for the vertex labelling
    `labels(id, label)` over the undirected simple graph.

    Q = (4·m·ΣL_c − ΣD_c²) / (4·m²) — both aggregate sums are exact
    BIGINTs, so the returned double is bit-deterministic."""
    canon = canonical_undirected(graph.edges)
    deg = _und_degrees(graph.edges)

    # degree mass per community; vertices missing from `labels` fall
    # back to a singleton community keyed by their own (negated) id so
    # they can never collide with a real label
    lab = deg.join(labels, deg["id"] == labels["id"], "left").select(
        deg["id"],
        F.coalesce(labels["label"], -deg["id"] - F.lit(1)).alias("label"),
        "deg",
    )
    dsum = lab.groupBy("label").agg(F.sum("deg").alias("d_c"))

    # intra-community edge count: both endpoints carry the same label
    intra = (
        canon.join(lab.select(F.col("id").alias("u"), F.col("label").alias("lu")), "u")
        .join(lab.select(F.col("id").alias("v"), F.col("label").alias("lv")), "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("l_c"))
    )

    per_c = dsum.join(intra, "label", "left").select(
        "label",
        F.coalesce("l_c", F.lit(0)).alias("l_c"),
        "d_c",
    )
    tot = per_c.agg(
        F.count(F.lit(1)).alias("communities"),
        F.sum("l_c").alias("sum_l"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("sum_d2"),
    )
    m = canon.count()
    if m == 0:
        # ADVICE r5: the published definition requires m > 0; dividing
        # by 4m² would yield an engine-dependent NaN/null instead of a
        # clear signal.
        raise ValueError(
            "modularity: graph has no undirected edges (m == 0) — "
            "modularity is undefined"
        )
    q = (
        (4 * F.lit(m) * F.col("sum_l") - F.col("sum_d2")).cast("double")
        / F.lit(float(4 * m * m))
    )
    return tot.select(
        F.lit(m).alias("m"), "communities", q.alias("modularity")
    )
