#!/usr/bin/env python
"""Bench harness (SURVEY §7 M6).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Headline queries:
  graph_build        co-purchase edge table from lineitem⋈orders → Graph
  pagerank           C1 join-path to L1<1e-6 (reports edges/sec too)
  pagerank_csr       C1 via the CSR gather-scatter kernel
  components         C2 frontier min-label to fixpoint
  lpa5               C3 sync LPA, 5 supersteps
  corpus_derive      A1–A9 on a synthesized corpus (FIXTURES dev-bench
                     shape) — extraction pipeline throughput
  corpus_pagerank    C1 on the derived repo graph (has planted hubs)
  corpus_triangles   C4 global count on the repo graph
  minhash_lsh        shingle→minhash→band→bucket-join near-dup candidates
  knn_cosine         brute-force cosine top-10 over embeddings

`python bench.py --scaling` additionally reruns pagerank at local[8]
and local[32] on the same input and prints the scaling-efficiency
JSON (north-rule two-cluster-size criterion, evidenced in-sandbox as
two parallelism levels; the authoritative multi-executor measurements
and their repro commands live in BENCH/BASELINE.md §1a).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _session(cpus: int):
    from linkgraph.session import get_spark

    return get_spark(
        app=f"bench-{cpus}",
        master=f"local[{cpus}]",
        partitions=max(8, cpus),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            # local-mode shuffles through tmpfs: isolates the scaling
            # measurement from disk IO noise (128 GiB RAM available)
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )


def _corpus_graph(spark, R=20000, Fn=2):
    from linkgraph import fixtures as FX
    from linkgraph.corpus import derive_edges
    from linkgraph.graph import Graph

    c = FX.gen_corpus(R=R, F=Fn)
    corpus = spark.createDataFrame(c.files)
    exports = spark.createDataFrame(c.exports)
    _, _, edges = derive_edges(corpus, exports)
    return Graph.prepare(edges)


def run_suite(spark, sf_dir: str) -> tuple[dict, dict]:
    import __spark_entry__ as E
    from linkgraph.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from linkgraph.csr import pagerank_csr
    from linkgraph.graph import Graph
    from linkgraph.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )
    from linkgraph.pipeline.similarity import with_cosine
    from pyspark.sql import functions as F

    queries: dict[str, float] = {}
    meta: dict = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        queries[name] = round(time.monotonic() - t0, 3)
        return out

    g = timed("graph_build", lambda: Graph.prepare(E._copurchase_edges(spark, sf_dir)))
    meta["graph"] = {"vertices": g.num_vertices, "edges": g.num_edges}

    def run_pr():
        state, info = pagerank(g, tol=1e-6)
        state.count()
        return info

    info = timed("pagerank", run_pr)
    t = queries["pagerank"]
    meta["pagerank"] = {
        "supersteps": info.supersteps,
        "converged": info.converged,
        "supersteps_per_sec": round(info.supersteps / t, 3),
        "edges_per_sec": round(g.num_edges * info.supersteps / t, 1),
    }

    timed("pagerank_csr", lambda: pagerank_csr(g, tol=1e-6)[0].count())
    timed("components", lambda: connected_components(g)[0].count())
    timed("lpa5", lambda: label_propagation(g, max_iter=5, early_stop=False)[0].count())

    cg = timed("corpus_derive", lambda: _corpus_graph(spark))
    meta["corpus_graph"] = {"vertices": cg.num_vertices, "edges": cg.num_edges}

    def run_cpr():
        # hot_threshold intentionally OFF: per-superstep broadcasts cost
        # more than AQE skew-splitting saves at this scale (measured 4.7x)
        state, cinfo = pagerank(cg, tol=1e-6)
        state.count()
        return cinfo

    cinfo = timed("corpus_pagerank", run_cpr)
    cwalls = [s.wall_s for s in cinfo.log]
    meta["corpus_pagerank"] = {
        "supersteps": cinfo.supersteps,
        "edges_per_sec": round(
            cg.num_edges * cinfo.supersteps / queries["corpus_pagerank"], 1
        ),
        # noise-robust estimators (see BENCH/BASELINE.md Protocol): the
        # shared host stalls in multi-10-second bursts, so wall-clock
        # sums can be dominated by interference; min/median step walls
        # recover the uninterfered per-superstep cost
        "min_step_s": round(min(cwalls), 3),
        "median_step_s": round(sorted(cwalls)[len(cwalls) // 2], 3),
        "peak_edges_per_sec": round(cg.num_edges / min(cwalls), 1),
    }
    tri_total = timed(
        "corpus_triangles", lambda: triangle_counts(cg, per_vertex=False)[1]
    )
    meta["corpus_triangles_total"] = tri_total

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    def run_minhash():
        sh = shingles(docs, k=5)
        sig = minhash_signatures(sh, num_hashes=16)
        return lsh_candidate_pairs(sig, bands=4, num_hashes=16).count()

    meta["minhash_candidates"] = timed("minhash_lsh", run_minhash)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    timed(
        "knn_cosine",
        lambda: with_cosine(emb, qvec)
        .orderBy(F.desc("cosine"))
        .limit(10)
        .collect(),
    )

    # r3 additions — NOT in the r1/r2 suite: cross-round comparisons
    # must use the legacy subtotal (every query above this line), which
    # the JSON reports as value_r2_comparable.
    from linkgraph.pipeline.similarity import rp_lsh_signatures
    from linkgraph.pipeline.textstats import tfidf_top_terms

    timed("tfidf_top3", lambda: tfidf_top_terms(docs, top_n=3).count())
    timed(
        "rp_lsh_sigs",
        lambda: rp_lsh_signatures(emb, nbits=16)
        .groupBy("sig")
        .count()
        .count(),
    )
    meta["r2_comparable_keys"] = [
        k for k in queries if k not in ("tfidf_top3", "rp_lsh_sigs")
    ]
    return queries, meta


def _cluster_session(executors: int, cores_per_executor: int = 8):
    """Session against the local standalone cluster (see cluster.sh):
    N executor JVMs × 8 cores — real executor processes, netty shuffle,
    per-executor heaps. The honest in-sandbox rendering of 'N vs 4N
    executors'."""
    import sys as _sys

    os.environ.setdefault("PYSPARK_PYTHON", _sys.executable)
    from pyspark.sql import SparkSession

    total = executors * cores_per_executor
    return (
        SparkSession.builder.master("spark://127.0.0.1:7077")
        .appName(f"bench-exec{executors}")
        .config("spark.cores.max", str(total))
        .config("spark.executor.cores", str(cores_per_executor))
        # pin parallelism: defaultParallelism falls back to 2 when the
        # session starts before the executor registers, which would give
        # spark.range a 2-partition scan for the whole run
        .config("spark.default.parallelism", str(total))
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "18g"))
        .config("spark.sql.shuffle.partitions", str(max(8, total)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
    )


def pagerank_throughput(cpus: int, graph_mode: str = "corpus") -> dict:
    """PageRank throughput at one parallelism level, JIT-warmed.

    graph_mode:
      corpus — repo-dependency graph derived from the synthesized
               corpus at R=50k/F=1 (~2.7M edges incl. planted hub
               skew) — the north rule's own input shape.
      uniform — 20M-edge uniform random graph generated distributed
               (spark.range + xxhash64), no driver data — isolates
               raw superstep throughput from extraction.
    """
    from linkgraph.algorithms import pagerank
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    if os.environ.get("SPARK_GRAFT_CLUSTER") == "1":
        # cpus is interpreted as total cores; executors = cpus / 8
        spark = _cluster_session(max(1, cpus // 8))
    else:
        spark = _session(cpus)
    try:
        if graph_mode == "corpus":
            g = _corpus_graph(spark, R=int(os.environ.get("SPARK_GRAFT_SCALING_R", "50000")), Fn=1)
        else:
            V = int(os.environ.get("SPARK_GRAFT_SCALING_VERTS", "2000000"))
            Edg = int(os.environ.get("SPARK_GRAFT_SCALING_EDGES", "20000000"))
            edges = spark.range(0, Edg).select(
                F.pmod(F.xxhash64(F.col("id")), F.lit(V)).alias("src"),
                F.pmod(F.xxhash64(F.col("id") + F.lit(10**9)), F.lit(V)).alias("dst"),
            )
            g = Graph.prepare(edges)
        g.edges.count()
        pagerank(g, tol=1e-6, max_supersteps=3)  # JIT/codegen warmup
        steps = int(os.environ.get("SPARK_GRAFT_SCALING_STEPS", "20"))
        state, info = pagerank(g, tol=1e-6, max_supersteps=steps)
        state.count()
        # steady-state throughput: per-superstep walls from the run log,
        # first 5 supersteps dropped (links build amortization + JIT) —
        # the quantity that scales with cluster size is the superstep,
        # not the one-time graph build.
        tail = [s.wall_s for s in info.log[5:]]
        wall = sum(tail)
        n_steps = len(tail)
        min_step = min(tail)
        return {
            "cpus": cpus,
            "graph": graph_mode,
            "vertices": g.num_vertices,
            "edges": g.num_edges,
            "steady_steps": n_steps,
            "steady_wall_s": round(wall, 3),
            "supersteps_per_sec": round(n_steps / wall, 4),
            "edges_per_sec": round(g.num_edges * n_steps / wall, 1),
            # min-step = noise-robust estimator on a shared box: the
            # fastest superstep is the least-interfered one
            "min_step_s": round(min_step, 3),
            "peak_edges_per_sec": round(g.num_edges / min_step, 1),
        }
    finally:
        spark.stop()


def scaling_report(lo: int = 8, hi: int = 32) -> dict:
    """Each measurement runs in a FRESH subprocess: PySpark reuses one
    JVM across SparkSession restarts inside a process, so driver-memory
    and GC state would otherwise leak between the N and 4N runs."""
    import subprocess

    def one(cpus: int, mode: str) -> dict:
        r = subprocess.run(
            [sys.executable, __file__, "--throughput", str(cpus), mode],
            capture_output=True, text=True, check=True,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = {}
    for mode in ("corpus", "uniform"):
        a = one(lo, mode)
        b = one(hi, mode)
        eff = (b["edges_per_sec"] / a["edges_per_sec"]) / (hi / lo)
        out[mode] = {"low": a, "high": b, "scaling_efficiency": round(eff, 4)}
    return out


def dedup_stress(cpus: int) -> dict:
    """Dup-heavy worst case (BENCH §2a): 25k docs, 20k byte-identical.
    Times the capped candidate pipeline AND the exact Jaccard verify
    stage — the verify must be candidate-bounded (built FROM the LSH
    pairs), so its wall tracks |candidates|, not corpus co-shingles."""
    from linkgraph.pipeline.dedup import (
        dedup_exact,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
    )

    spark = _session(cpus)
    try:
        texts = [
            (i, "lorem ipsum dolor sit amet consectetur " * 6, "b")
            for i in range(20000)
        ] + [
            (100_000 + i, f"distinct document number {i} about engine topic {i % 97}", "d")
            for i in range(5000)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string, source string").cache()
        df.count()
        t0 = time.monotonic()
        sh = shingles(dedup_exact(df), k=5).localCheckpoint()
        sig = minhash_signatures(sh, num_hashes=16)
        pairs = lsh_candidate_pairs(
            sig, bands=4, num_hashes=16, max_bucket_size=1000
        ).localCheckpoint()
        n_cand = pairs.count()
        t_cand = time.monotonic() - t0
        t1 = time.monotonic()
        verified = ngram_jaccard_pairs(sh, pairs, threshold=0.8).localCheckpoint()
        n_verified = verified.count()
        t_verify = time.monotonic() - t1
        # closure (r4): Pregel connected components over the verified
        # pair graph -> clusters; survivors = kept - clustered + clusters
        from linkgraph.pipeline.dedup import near_dup_components

        t2 = time.monotonic()
        comp = near_dup_components(verified).localCheckpoint()
        n_clustered = comp.count()
        n_clusters = comp.select("comp").distinct().count()
        t_closure = time.monotonic() - t2
        return {
            "metric": "dedup_stress",
            "docs": 25000,
            "identical": 20000,
            "candidates": n_cand,
            "candidates_sec": round(t_cand, 3),
            "verified_ge_0.8": n_verified,
            "verify_sec": round(t_verify, 3),
            "clustered_docs": n_clustered,
            "clusters": n_clusters,
            "closure_sec": round(t_closure, 3),
            "cpus": cpus,
        }
    finally:
        spark.stop()


def scc_stress(cpus: int) -> dict:
    """SCC on a dense cyclic directed graph (BENCH §2c, r4): the driver
    oracle runs the sparsified bipartite co-purchase graph, which the
    trim phase disposes of without ever coloring — this stress forces
    the FW-BW coloring path. Uniform random directed graph (avg degree
    10) has a giant SCC plus a periphery: trims cascade, then one big
    color/backward round."""
    from linkgraph.algorithms import scc
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    spark = _session(cpus)
    try:
        V, E = 200_000, 2_000_000
        edges = spark.range(0, E).select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(V)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(10**9)), F.lit(V)).alias("dst"),
        )
        g = Graph.prepare(edges)
        g.edges.count()
        t0 = time.monotonic()
        state, info = scc(g)
        n_scc = state.select("scc").distinct().count()
        wall = time.monotonic() - t0
        return {
            "metric": "scc_stress",
            "vertices": g.num_vertices,
            "edges": g.num_edges,
            "sccs": n_scc,
            "barriers": info.supersteps,
            "wall_s": round(wall, 3),
            "cpus": cpus,
        }
    finally:
        spark.stop()


def core_stress(cpus: int) -> dict:
    """Full core decomposition on a skewed uniform random graph
    (VERDICT r4 #8): `core_number` answers EVERY vertex's core number
    in one h-index fixpoint run — this times that single pass on a
    2M-edge graph and reports rounds + the core-number histogram head
    (a stable fingerprint: xxhash64 generation is deterministic)."""
    from linkgraph.algorithms import core_number
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    spark = _session(cpus)
    try:
        V, E = 200_000, 2_000_000
        edges = spark.range(0, E).select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(V)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") * F.lit(31) + F.lit(7)), F.lit(V)).alias("dst"),
        )
        g = Graph.prepare(edges)
        g.edges.count()
        t0 = time.monotonic()
        state, info = core_number(g)
        hist = {
            int(r["core"]): int(r["n"])
            for r in state.groupBy("core")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("core"))
            .limit(5)
            .collect()
        }
        wall = time.monotonic() - t0
        return {
            "metric": "core_stress",
            "vertices": g.num_vertices,
            "edges": g.num_edges,
            "rounds": info.supersteps,
            "top_cores": hist,
            "wall_s": round(wall, 3),
            "cpus": cpus,
        }
    finally:
        spark.stop()


def ivf_bench(cpus: int, sf_dir: str, n_centroids: int = 256) -> dict:
    """Production-shape IVF check: C=256 build (broadcast-matrix kernel
    assignment + Lloyd) over the real embeddings table, written
    partitionBy(bucket) and probed through the partition-pruned path."""
    import shutil
    import tempfile

    from linkgraph.pipeline.similarity import ivf_build, ivf_topk_stored, ivf_write

    spark = _session(cpus)
    path = tempfile.mkdtemp(prefix="ivf_bench_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        t0 = time.monotonic()
        assigned, cents = ivf_build(emb, n_centroids=n_centroids, lloyd_iters=2)
        ivf_write(assigned, path)
        t_build = time.monotonic() - t0
        t1 = time.monotonic()
        top = ivf_topk_stored(spark, path, cents, qvec, k=10, nprobe=8).collect()
        t_probe = time.monotonic() - t1
        return {
            "metric": "ivf_build",
            "vectors": n,
            "centroids": n_centroids,
            "lloyd_iters": 2,
            "build_write_sec": round(t_build, 3),
            "probe_nprobe8_sec": round(t_probe, 3),
            "top1": int(top[0]["vec_id"]) if top else None,
            "cpus": cpus,
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--ivf-build" in sys.argv:
        print(json.dumps(ivf_bench(cpus, sf_dir)))
        return
    if "--dedup-stress" in sys.argv:
        print(json.dumps(dedup_stress(cpus)))
        return
    if "--scc-stress" in sys.argv:
        print(json.dumps(scc_stress(cpus)))
        return
    if "--core-stress" in sys.argv:
        print(json.dumps(core_stress(cpus)))
        return
    if "--throughput" in sys.argv:
        i = sys.argv.index("--throughput")
        print(json.dumps(pagerank_throughput(int(sys.argv[i + 1]), sys.argv[i + 2])))
        return
    if "--scaling" in sys.argv:
        rep = scaling_report()
        print(json.dumps({"scaling": rep, "sf": sf}))
        return

    spark = _session(cpus)
    try:
        queries, meta = run_suite(spark, sf_dir)
    finally:
        spark.stop()
    total = round(sum(queries.values()), 3)
    legacy = round(
        sum(queries[k] for k in meta.get("r2_comparable_keys", queries)), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "value_r2_comparable": legacy,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "detail": meta,
            }
        )
    )


if __name__ == "__main__":
    main()
