#!/usr/bin/env python
"""Phase-level profiling harness for the optimization round (guide §1).

NOT the driver bench — bench.py is frozen for measurement. This file
isolates each headline query's phases with the noop sink so the numbers
in OPTIMIZATION_r06.md trace to something reproducible:

    python bench_extra.py profile      # phase timings, one JSON line
                                       # (incl. per-superstep walls)

Explain dumps live in plans_dump.py. $SPARK_GRAFT_SF_DIR /
$SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _session(cpus: int):
    from linkgraph.session import get_spark

    return get_spark(
        app=f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        partitions=max(8, cpus),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def profile(spark, sf_dir: str) -> dict:
    import __spark_entry__ as E
    from linkgraph import fixtures as FX
    from linkgraph.algorithms import pagerank, connected_components, label_propagation, triangle_counts
    from linkgraph.corpus import derive_edges
    from linkgraph.graph import Graph
    from linkgraph.pipeline.dedup import lsh_candidate_pairs, minhash_signatures, shingles
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    sc = spark.sparkContext

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.monotonic()
        r = fn()
        out[name] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        return r

    # --- graph_build phases
    edges_raw = E._copurchase_edges(spark, sf_dir)
    timed("gb.edges_noop", lambda: noop(edges_raw))
    timed("gb.edges_noop2", lambda: noop(edges_raw))  # warm second run
    g = timed("gb.prepare", lambda: Graph.prepare(E._copurchase_edges(spark, sf_dir)))

    # --- pagerank phases (links build vs supersteps)
    def pr():
        state, info = pagerank(g, tol=1e-6)
        state.count()
        return info

    info = timed("pr.total", pr)
    out["pr.steps_wall"] = round(sum(s.wall_s for s in info.log), 3)
    out["pr.n_steps"] = info.supersteps
    out["pr.setup"] = round(out["pr.total"] - out["pr.steps_wall"], 3)

    # --- corpus_derive phases
    t0 = time.monotonic()
    c = FX.gen_corpus(R=20000, F=2)
    out["cd.gen_python"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    corpus = spark.createDataFrame(c.files)
    exports = spark.createDataFrame(c.exports)
    out["cd.createDataFrame"] = round(time.monotonic() - t0, 3)
    _, _, cedges = derive_edges(corpus, exports)
    timed("cd.derive_noop", lambda: noop(cedges))
    cg = timed("cd.prepare", lambda: Graph.prepare(cedges))

    # --- corpus_pagerank
    def cpr():
        state, cinfo = pagerank(cg, tol=1e-6)
        state.count()
        return cinfo

    cinfo = timed("cpr.total", cpr)
    walls = sorted(s.wall_s for s in cinfo.log)
    out["cpr.n_steps"] = cinfo.supersteps
    out["cpr.steps_wall"] = round(sum(walls), 3)
    out["cpr.min_step"] = round(walls[0], 3)
    out["cpr.median_step"] = round(walls[len(walls) // 2], 3)
    out["cpr.setup"] = round(out["cpr.total"] - out["cpr.steps_wall"], 3)

    # --- components / lpa5 on the copurchase graph
    ci = timed("comp.total", lambda: connected_components(g)[1])
    out["comp.steps_wall"] = round(sum(s.wall_s for s in ci.log), 3)
    out["comp.n_steps"] = ci.supersteps
    li = timed("lpa5.total", lambda: label_propagation(g, max_iter=5, early_stop=False)[1])
    out["lpa5.steps_wall"] = round(sum(s.wall_s for s in li.log), 3)

    # --- corpus_triangles phases
    timed("tri.total", lambda: triangle_counts(cg, per_vertex=False)[1])

    # --- minhash phases
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingles(docs, k=5)
    timed("mh.shingles_noop", lambda: noop(sh))
    sig = minhash_signatures(sh, num_hashes=16)
    timed("mh.signatures_noop", lambda: noop(sig))
    timed("mh.pairs", lambda: lsh_candidate_pairs(sig, bands=4, num_hashes=16).count())

    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile"
    spark = _session(cpus)
    try:
        if cmd == "profile":
            print(json.dumps(profile(spark, sf_dir)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
