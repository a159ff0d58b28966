"""Deterministic corpus sampling — the subsetting stage of a
training-data pipeline (held-out splits, ablation corpora, per-language
rebalancing).

Two published shapes, both pinned to hash draws so a re-run (or a
different engine) reproduces the sample row-for-row:

- `sample_hash` — Bernoulli by hash threshold: keep a row iff
  H(key) < fraction · 2^60. NO shuffle, no sort, no count — a pure
  map-side filter that composes with predicate pushdown; the ONLY
  shape that works at 10^12 rows. Sample size is binomial around
  fraction·n (exactly the guarantee rand()-based sampling gives,
  minus the nondeterminism).
- `sample_stratified` — exact-count per stratum: within each stratum
  keep the ceil(fraction · n_stratum) rows with the smallest
  (H(key), key). Costs one shuffle on the stratum column + a
  per-stratum sort (a window), which is affordable when strata are
  bounded (languages, sources) — for unbounded strata use
  `sample_hash` per stratum instead.

H is pipeline.dedup.hash64: xxhash64 in production, portable 60-bit
md5 when the sample must be reproduced by an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import hash64


def hash_threshold(fraction: float) -> int:
    """fraction mapped onto the portable hash's [0, 2^60) range as an
    exact integer (both engines compare against the same literal)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return int(fraction * (1 << 60))


def sample_hash(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Bernoulli-by-hash sample: map-side filter, no shuffle.

    xxhash64 mode spans the full signed 64-bit range, so the threshold
    is rescaled onto it; portable mode uses [0, 2^60) directly."""
    h = hash64(F.col(key_col).cast("string"), seed=seed, mode=hash_mode)
    if hash_mode == "portable":
        return df.filter(h < F.lit(hash_threshold(fraction)))
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction == 1.0:
        return df  # lo + 2^64 overflows the signed-long literal
    lo = -(1 << 63)
    return df.filter(h < F.lit(int(lo + fraction * (1 << 64))))


def sample_stratified(
    df: DataFrame,
    fraction: float,
    stratum_col: str,
    key_col: str,
    seed: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Exact-count stratified sample: per stratum, the
    ceil(fraction * n_stratum) rows with the smallest (hash, key)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    h = hash64(F.col(key_col).cast("string"), seed=seed, mode=hash_mode)
    w = Window.partitionBy(stratum_col)
    ranked = df.withColumn(
        "_rn",
        F.row_number().over(w.orderBy(h.asc(), F.col(key_col).asc())),
    ).withColumn("_n", F.count(F.lit(1)).over(w))
    return ranked.filter(
        F.col("_rn") <= F.ceil(F.lit(float(fraction)) * F.col("_n"))
    ).drop("_rn", "_n")
