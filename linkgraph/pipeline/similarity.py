"""Similarity search over an embedding column (array<float>).

- `cosine_topk` — brute-force exact cosine top-k: the correctness
  baseline. The dot product is a single JVM `aggregate(zip_with(...))`
  expression — no Python, whole-stage codegen applies. Top-k is
  `orderBy(desc).limit(k)` which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge, no global sort).
- `ivf_build` / `ivf_topk` — the scale path: IVF-style inverted file.
  Centroids are a deterministic sample (lowest ids) refined by a few
  Lloyd iterations computed AS DATAFRAMES (groupBy avg per dimension —
  distributed, no driver math beyond collecting C centroid rows).
  Every vector is assigned to its nearest centroid (bucket); a query
  probes only `nprobe` nearest buckets — the candidate set shrinks by
  ~C/nprobe, which is what makes 10^11-vector ANN feasible. Recall is
  tested against the brute-force baseline.

Embeddings are cast to double before any arithmetic: float32 dot
products accumulate error and the DuckDB oracle computes in float64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    v = _as_double(F.col(vec_col))
    return df.withColumn(
        "cosine", _dot(v, q) / (_norm(v) * _norm(q))
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by id for determinism."""
    return (
        with_cosine(df, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_build(
    df: DataFrame,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Assign every vector to its nearest centroid.

    Returns (assigned(id, bucket, embedding), centroids). Centroid
    init is the n_centroids lowest ids (deterministic, no RNG — resume
    and tests need reproducibility); refinement is `lloyd_iters` rounds
    of mean-per-bucket computed with posexplode + groupBy — fully
    distributed, only C centroid rows ever reach the driver.
    """
    base = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    # Deterministic pseudo-random seeding: ordering by a hash of the id
    # spreads the seeds over the dataset (lowest-ids seeding clusters
    # poorly when ids correlate with content); still RNG-free so
    # resume/tests reproduce exactly.
    cents = [
        (i, [float(x) for x in r["v"]])
        for i, r in enumerate(
            base.orderBy(F.xxhash64("id"), "id").limit(n_centroids).collect()
        )
    ]

    def assign(cdf: DataFrame, centroids) -> DataFrame:
        # distance to each centroid as one array expression; argmin index
        dists = F.array(
            *[
                _dot(F.col("v"), F.lit(c).cast("array<double>"))
                / (_norm(F.col("v")) * _norm(F.lit(c).cast("array<double>")))
                for _, c in centroids
            ]
        )
        return (
            cdf.withColumn("d", dists)
            .withColumn("bucket", (F.array_position("d", F.array_max("d")) - 1).cast("int"))
            .drop("d")
        )

    assigned = assign(base, cents)
    for _ in range(lloyd_iters):
        dims = assigned.select(
            "bucket", F.posexplode("v").alias("dim", "x")
        )
        means = (
            dims.groupBy("bucket", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("bucket", F.col("dm.m").alias("centroid"))
        )
        by_bucket = {
            int(r["bucket"]): [float(x) for x in r["centroid"]]
            for r in means.collect()
        }
        # bucket label == index into cents, ALWAYS: rebuild positionally
        # and carry the old centroid forward for emptied buckets —
        # otherwise labels shift after an empty bucket and assignment /
        # nprobe filters refer to the wrong centroids.
        cents = [(i, by_bucket.get(i, c)) for i, (_, c) in enumerate(cents)]
        assigned = assign(base, cents)
    return assigned, cents


def probe_buckets(centroids, query_vec: list[float], nprobe: int) -> list[int]:
    """The nprobe bucket ids whose centroids are nearest the query
    (driver-side math over C centroid rows — C is small by design)."""
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(c):
        n = math.sqrt(sum(x * x for x in c))
        return sum(a * b for a, b in zip(q, c)) / (n * qn) if n > 0 else -1.0

    return [i for i, _ in sorted(centroids, key=lambda ic: -cos(ic[1]))[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k probing the nprobe centroids nearest to the query.

    With an in-memory `assigned`, the bucket filter still scans every
    row — use ivf_write + ivf_topk_stored for the storage-pruned path
    that makes nprobe/C a REAL IO reduction at scale.
    """
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    buckets = probe_buckets(centroids, q, nprobe)
    qcol = F.lit(q).cast("array<double>")
    cand = assigned.filter(F.col("bucket").isin(buckets))
    return (
        cand.withColumn("cosine", _dot(F.col("v"), qcol) / (_norm(F.col("v")) * F.lit(qn)))
        .select(F.col("id").alias("vec_id"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_write(assigned: DataFrame, path: str) -> None:
    """Persist the inverted file PARTITIONED BY bucket: each bucket is
    its own parquet directory, so a probe of nprobe buckets is a
    partition-pruned scan touching nprobe/C of the data — without this
    layout the candidate-set reduction is compute-only, not IO."""
    assigned.select("id", "v", "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)


def ivf_topk_stored(
    spark,
    path: str,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k over an ivf_write'd inverted file. The bucket-isin
    filter lands in PartitionFilters (asserted in test_plans), so only
    the probed buckets' files are listed and read."""
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    buckets = probe_buckets(centroids, q, nprobe)
    qcol = F.lit(q).cast("array<double>")
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    return (
        cand.withColumn("cosine", _dot(F.col("v"), qcol) / (_norm(F.col("v")) * F.lit(qn)))
        .select(F.col("id").alias("vec_id"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
