"""r6 optimization gates: scale-adaptive partitioning, superstep conf
scoping, and the one-exchange plan shapes the round introduced
(symmetrize / Graph.prepare / shingles). These pin the optimizations'
MECHANISMS so a regression is visible in CI, not just in bench noise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph import fixtures as FX
from linkgraph.graph import Graph, symmetrize
from linkgraph.tuning import (
    MAX_PARTITIONS,
    ROWS_PER_PARTITION,
    scale_partitions,
    superstep_conf,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_exchanges(df) -> int:
    """Count LIVE shuffle exchanges by walking the physical-plan tree —
    a text count would also pick up the build plans explain() prints
    for cached InMemoryRelations, which are not executed again."""

    def walk(node) -> int:
        n = 1 if node.nodeName() == "Exchange" else 0
        for i in range(node.children().length()):
            n += walk(node.children().apply(i))
        return n

    return walk(df._jdf.queryExecution().executedPlan())


class TestScalePartitions:
    def test_floor_is_half_the_cores_for_small_inputs(self, spark):
        cores = spark.sparkContext.defaultParallelism
        assert scale_partitions(spark, 10) == max(2, cores // 2)

    def test_grows_with_rows_in_core_waves(self, spark):
        cores = spark.sparkContext.defaultParallelism
        big = 64 * ROWS_PER_PARTITION
        import math

        assert scale_partitions(spark, big) == math.ceil(64 / cores) * cores

    def test_capped(self, spark):
        assert scale_partitions(spark, 10**15) == MAX_PARTITIONS

    def test_explicit_floor_wins(self, spark):
        assert scale_partitions(spark, 1, floor=7) == 7


class TestSuperstepConf:
    def test_sets_and_restores(self, spark):
        before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        before_p = spark.conf.get("spark.sql.shuffle.partitions")
        with superstep_conf(spark, 5):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
        assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe
        assert spark.conf.get("spark.sql.shuffle.partitions") == before_p

    def test_restores_on_exception(self, spark):
        before_p = spark.conf.get("spark.sql.shuffle.partitions")
        with pytest.raises(RuntimeError):
            with superstep_conf(spark, 3):
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == before_p

    def test_pregel_uses_derived_partitions(self, spark, graph_builder):
        from linkgraph.algorithms import pagerank

        g = graph_builder(FX.G1_EDGES)
        state, info = pagerank(g, tol=1e-6, max_supersteps=2)
        # loop conf restored after the run
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # the state partitioning followed the derived count, not the
        # session constant
        expected = scale_partitions(spark, max(g.num_edges, g.num_vertices))
        assert state.rdd.getNumPartitions() == expected


class TestOneExchangeShapes:
    def test_symmetrize_is_single_exchange(self, spark):
        # AQE off so the walkable plan is final (as in the loops that
        # consume symmetrize); with AQE on the tree is lazy stages
        edges = spark.createDataFrame(FX.G1_EDGES, "src long, dst long")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            assert n_exchanges(symmetrize(edges)) == 1
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def test_prepare_raw_edges_single_exchange(self, spark):
        # raw (non-pre-distinct) input: dedup rides the src repartition
        edges = spark.createDataFrame(
            FX.G1_EDGES + FX.G1_EDGES, "src long, dst long"
        )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            g = Graph.prepare(edges)
            # prepare persists, so the dedup plan lives inside the
            # InMemoryRelation — count exchanges in its build plan text
            # (no nested caches here, so the text count is exact)
            assert plan_of(g.edges).count("Exchange hashpartitioning(") == 1
            g.unpersist()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def test_shingles_is_pure_projection(self, spark):
        # r6 second pass: shingles adds ZERO exchanges over an input
        # that already has >= one task wave of partitions (the scale
        # case), and exactly ONE round-robin up-repartition for an
        # under-split source (a one-row-group file would otherwise run
        # the whole window projection on a single core)
        from linkgraph.pipeline.dedup import shingles

        docs = spark.createDataFrame(
            [(1, "abcabcabc"), (2, "xyzxyz")], "doc_id long, text string"
        )
        cores = spark.sparkContext.defaultParallelism
        wide = docs.repartition(cores)
        assert n_exchanges(shingles(wide, k=3)) == n_exchanges(wide)
        sh = shingles(docs, k=3)
        assert n_exchanges(sh) <= 1
        # per-doc dedup still holds: 'abc...' has exactly 3 distinct 3-grams
        rows = {(r["id"], r["shingle"]) for r in sh.collect()}
        assert {(1, "abc"), (1, "bca"), (1, "cab")} <= rows
        assert len([r for r in rows if r[0] == 1]) == 3

    def test_links_prepartitioned_skips_repartition(self, spark, graph_builder):
        # components' scatter relation: exactly the symmetrize exchange,
        # no second repartition by the pregel driver (AQE off so the
        # explain shows one plan, as in the superstep loop itself)
        from linkgraph.algorithms.components import components_spec

        g = graph_builder(FX.G2_EDGES)
        spec = components_spec()
        assert spec.links_prepartitioned
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            links = spec.prepare_links(g.edges).sortWithinPartitions("src")
            assert n_exchanges(links) == 1
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")


class TestMetricBarrier:
    """r6: the superstep barrier evaluates spec.metrics as observed
    metrics during the state-materializing noop write (2 stages) instead
    of a separate agg().first() subtree (3 stages). Values must be
    identical either way; the fallback path must stay correct."""

    def test_observe_and_agg_paths_agree(self, spark):
        from linkgraph import pregel

        df = spark.range(0, 10_000).select(
            F.col("id"),
            (F.col("id") % 7 == 0).cast("long").alias("changed"),
            (F.col("id") % 1000).cast("double").alias("rank"),
        )
        metrics = {
            "active": F.sum("changed"),
            "max_rank": F.max("rank"),
            "n_est": F.approx_count_distinct("rank", rsd=0.02),
        }
        ck = pregel.truncate_lineage(df, eager=False)
        saved = pregel._METRIC_VIA_OBSERVE
        try:
            pregel._METRIC_VIA_OBSERVE = True
            via_obs = pregel._metric_barrier(ck, metrics)
            pregel._METRIC_VIA_OBSERVE = False
            via_agg = pregel._metric_barrier(ck, metrics)
        finally:
            pregel._METRIC_VIA_OBSERVE = saved
        # integer/max/HLL aggregates are order-insensitive: bit-equal
        assert via_obs == via_agg
        assert via_obs["active"] == 10_000 // 7 + 1
        assert via_obs["max_rank"] == 999.0

    def test_unsupported_metric_falls_back(self, spark):
        from linkgraph import pregel

        df = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        )
        # DISTINCT aggregates are rejected by CollectMetrics at analysis
        # time — the barrier must fall back to agg().first() and still
        # return the right value
        metrics = {"nk": F.countDistinct("k")}
        out = pregel._metric_barrier(
            pregel.truncate_lineage(df, eager=False), metrics
        )
        assert out["nk"] == 5

    def test_pregel_run_loop_uses_single_action_values(self, spark, graph_builder):
        # end-to-end: components over G2 under both barrier modes gives
        # identical labels AND identical per-superstep aggregates
        from linkgraph import pregel
        from linkgraph.algorithms import connected_components

        g = graph_builder(FX.G2_EDGES)
        saved = pregel._METRIC_VIA_OBSERVE
        try:
            pregel._METRIC_VIA_OBSERVE = True
            s1, i1 = connected_components(g)
            r1 = {tuple(r) for r in s1.collect()}
            a1 = [s.aggregates for s in i1.log]
            pregel._METRIC_VIA_OBSERVE = False
            s2, i2 = connected_components(g)
            r2 = {tuple(r) for r in s2.collect()}
            a2 = [s.aggregates for s in i2.log]
        finally:
            pregel._METRIC_VIA_OBSERVE = saved
        assert r1 == r2
        assert i1.supersteps == i2.supersteps
        assert a1 == a2
