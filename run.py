#!/usr/bin/env python
"""CLI entry point — the spark-submit path (SURVEY §3.4).

Production:
    spark-submit --py-files linkgraph.zip run.py \
        --algo pagerank --corpus <iceberg-table-or-parquet-dir> \
        --exports <manifest> --warehouse <catalog-root> \
        --run-id r42 --checkpoint-every 5 --out <table>

In-sandbox (no cluster manager): the same script runs under plain
python with --master local[N]. Resume: re-invoke with the same
--run-id and --warehouse; the checkpoint manager finds the latest
committed superstep and continues (B10).

Build the py-files zip with:  python run.py --make-zip linkgraph.zip
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def make_zip(path: str) -> None:
    import os
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(path, "w") as z:
        for dirpath, _, files in os.walk(os.path.join(root, "linkgraph")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(f"wrote {path}")


def run_pipeline(ap, args) -> None:
    """--pipeline entry: the training-data dedup closure from the CLI.

    dedup: exact + near dedup -> the surviving documents table.
    dedup-assign: (doc_id, canonical_id) for every doc (audit form).
    decontam: corpus minus docs contaminated by --eval-docs (n-gram
    overlap >= --contam-threshold of an eval doc's shingles).
    """
    if not args.documents:
        ap.error("--pipeline requires --documents <parquet-dir>")
    from linkgraph.catalog import get_catalog
    from linkgraph.pipeline.dedup import dedup_assignments, dedup_near
    from linkgraph.session import get_spark

    spark = get_spark(app=f"linkgraph-{args.pipeline}", master=args.master,
                      partitions=args.partitions)
    catalog = get_catalog(spark, args.warehouse)
    t0 = time.monotonic()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()
    if args.pipeline == "decontam":
        if not args.eval_docs:
            ap.error("--pipeline decontam requires --eval-docs <parquet-dir> "
                     "with (eval_id, text)")
        from linkgraph.pipeline.decontam import decontaminate

        eval_df = spark.read.parquet(args.eval_docs)
        knobs = dict(k=args.shingle_k, threshold=args.contam_threshold)
        out = decontaminate(docs, eval_df, **knobs)
        if args.out:
            catalog.write_snapshot(args.out, out, meta={"run_id": args.run_id})
            n_out = catalog.read_snapshot(args.out).count()
        else:
            n_out = out.count()
        print(json.dumps({
            "pipeline": args.pipeline, "run_id": args.run_id,
            "docs_in": n_in, "rows_out": n_out,
            "dropped": n_in - n_out,
            "wall_s": round(time.monotonic() - t0, 3), **knobs,
        }))
        spark.stop()
        return
    knobs = dict(
        k=args.shingle_k, num_hashes=args.num_hashes, bands=args.bands,
        max_bucket_size=args.bucket_cap, threshold=args.dedup_threshold,
    )
    if args.pipeline == "dedup":
        out = dedup_near(docs, **knobs)
    else:
        out = dedup_assignments(docs, **knobs)
    if args.out:
        catalog.write_snapshot(args.out, out, meta={"run_id": args.run_id})
        n_out = catalog.read_snapshot(args.out).count()
    else:
        n_out = out.count()
    print(json.dumps({
        "pipeline": args.pipeline,
        "run_id": args.run_id,
        "docs_in": n_in,
        "rows_out": n_out,
        "wall_s": round(time.monotonic() - t0, 3),
        **knobs,
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-zip")
    ap.add_argument("--algo", choices=["pagerank", "ppr", "components", "lpa",
                                       "triangles", "sssp", "matching",
                                       "kcore", "core-number", "semicluster",
                                       "scc", "hits", "mis", "coloring",
                                       "linkpred", "assortativity",
                                       "modularity", "walks", "ktruss",
                                       "centrality", "betweenness",
                                       "diameter", "propagate"])
    ap.add_argument("--corpus", help="corpus table: parquet dir (or synth:R,F)")
    ap.add_argument("--corpus-format", default="parquet",
                    choices=["parquet", "csv", "json"],
                    help="corpus file format (schema enforced at scan)")
    ap.add_argument("--exports", help="exports manifest parquet (omit for synth)")
    ap.add_argument("--edges", help="pre-built edge table parquet (skips derivation)")
    ap.add_argument("--warehouse", default="/tmp/linkgraph-warehouse")
    ap.add_argument("--out", help="output table name in the warehouse")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument(
        "--checkpoint-min-interval", type=float, default=30.0,
        help="adaptive cadence: skip a due checkpoint if the last one "
        "is fresher than this many seconds (0 disables the time gate)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-supersteps", type=int, default=100)
    ap.add_argument("--dangling", default="drop", choices=["drop", "redistribute"])
    ap.add_argument("--weight-col", default=None,
                    help="pagerank/sssp: edge-weight column on --edges "
                    "(weights must be positive; only meaningful with "
                    "--edges, since corpus derivation emits unweighted "
                    "src/dst)")
    ap.add_argument("--source", type=int, default=0, help="sssp source vertex")
    ap.add_argument("--sources", default=None,
                    help="ppr teleport set: comma-separated vertex ids")
    ap.add_argument("--k", type=int, default=3, help="kcore/ktruss: the k")
    ap.add_argument("--c-max", type=int, default=2,
                    help="semicluster: clusters kept per vertex")
    ap.add_argument("--m-max", type=int, default=4,
                    help="semicluster: max members per cluster")
    ap.add_argument("--pipeline", choices=["dedup", "dedup-assign",
                                           "decontam"],
                    help="run a training-data pipeline op instead of a "
                    "graph algorithm: dedup = write the deduplicated "
                    "documents table (exact + near); dedup-assign = "
                    "write the full (doc_id, canonical_id) assignment")
    ap.add_argument("--documents", help="documents parquet dir "
                    "(doc_id, text, ...) for --pipeline")
    ap.add_argument("--dedup-threshold", type=float, default=0.5,
                    help="near-dup Jaccard threshold")
    ap.add_argument("--eval-docs", help="eval/benchmark parquet dir "
                    "(eval_id, text) for --pipeline decontam")
    ap.add_argument("--contam-threshold", type=float, default=0.5,
                    help="min fraction of an eval doc's n-grams found "
                    "in a training doc to flag it")
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--bucket-cap", type=int, default=1000,
                    help="LSH bucket-size cap (oversized buckets are "
                    "dropped from candidate generation, with a warning)")
    args = ap.parse_args()

    if args.make_zip:
        make_zip(args.make_zip)
        return
    if args.pipeline:
        run_pipeline(ap, args)
        return
    if not args.algo:
        ap.error("--algo is required (or --make-zip / --pipeline)")

    from linkgraph.session import get_spark

    spark = get_spark(app=f"linkgraph-{args.algo}", master=args.master,
                      partitions=args.partitions)
    from linkgraph.catalog import get_catalog
    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.corpus import corpus_checksum, derive_edges
    from linkgraph.graph import Graph

    catalog = get_catalog(spark, args.warehouse)
    ck = CheckpointManager(
        catalog,
        run_id=args.run_id,
        every=args.checkpoint_every,
        min_interval_s=args.checkpoint_min_interval or None,
    )

    t0 = time.monotonic()
    if args.edges:
        edges = spark.read.parquet(args.edges)
    elif args.corpus and args.corpus.startswith("synth:"):
        r, f = (int(x) for x in args.corpus[6:].split(","))
        from linkgraph import fixtures as FX

        c = FX.gen_corpus(R=r, F=f)
        corpus = spark.createDataFrame(c.files)
        exports = spark.createDataFrame(c.exports)
        _, idmap, edges = derive_edges(corpus, exports)
    elif args.corpus:
        from linkgraph.corpus import read_corpus

        corpus = read_corpus(spark, args.corpus, fmt=args.corpus_format)
        exports = spark.read.parquet(args.exports)
        n, h = corpus_checksum(corpus)  # A2 invariant, recorded per run
        print(json.dumps({"corpus_rows": n, "corpus_checksum": h}))
        _, idmap, edges = derive_edges(corpus, exports)
    else:
        ap.error("need --edges or --corpus")
        return

    if args.weight_col:
        if args.algo not in ("pagerank", "sssp"):
            ap.error(
                f"--weight-col is only meaningful for pagerank and sssp; "
                f"--algo {args.algo} would silently ignore it"
            )
        # weight-preserving canonicalization: self-loops dropped,
        # duplicate (src,dst) resolved to the min weight deterministically
        g = Graph.prepare(edges, weight_cols=[args.weight_col])
    else:
        g = Graph.prepare(edges)
    summary: dict = {
        "algo": args.algo,
        "run_id": args.run_id,
        "vertices": g.num_vertices,
        "edges": g.num_edges,
    }

    if args.algo == "pagerank":
        from linkgraph.algorithms import pagerank

        state, info = pagerank(
            g, tol=args.tol, max_supersteps=args.max_supersteps,
            dangling=args.dangling, checkpointer=ck,
            weight_col=args.weight_col,
        )
    elif args.algo == "ppr":
        from linkgraph.algorithms import personalized_pagerank

        if not args.sources:
            ap.error("--algo ppr requires --sources id[,id...]")
        state, info = personalized_pagerank(
            g, [int(x) for x in args.sources.split(",")],
            tol=args.tol, max_supersteps=args.max_supersteps,
        )
    elif args.algo == "components":
        from linkgraph.algorithms import connected_components

        state, info = connected_components(
            g, max_supersteps=args.max_supersteps, checkpointer=ck
        )
    elif args.algo == "lpa":
        from linkgraph.algorithms import label_propagation

        state, info = label_propagation(g, max_iter=10, checkpointer=ck)
    elif args.algo == "sssp":
        from linkgraph.algorithms import sssp

        state, info = sssp(
            g, source=args.source, max_supersteps=args.max_supersteps,
            weight_col=args.weight_col,
        )
    elif args.algo == "matching":
        from linkgraph.algorithms import bipartite_matching

        state, info = bipartite_matching(g, max_supersteps=args.max_supersteps)
    elif args.algo == "kcore":
        from linkgraph.algorithms import kcore

        state, info = kcore(
            g, args.k, max_supersteps=args.max_supersteps, checkpointer=ck
        )
    elif args.algo == "core-number":
        from linkgraph.algorithms import core_number

        state, info = core_number(
            g, max_supersteps=args.max_supersteps, checkpointer=ck
        )
        if info.log:
            summary["degeneracy"] = info.log[-1].aggregates.get("degeneracy")
    elif args.algo == "scc":
        from linkgraph.algorithms import scc as _scc

        state, info = _scc(g)
    elif args.algo == "hits":
        from linkgraph.algorithms import hits

        state, info = hits(
            g, tol=args.tol, max_supersteps=args.max_supersteps,
            checkpointer=ck,
        )
    elif args.algo == "mis":
        from linkgraph.algorithms import maximal_independent_set

        state, info = maximal_independent_set(
            g, max_rounds=args.max_supersteps, checkpointer=ck
        )
    elif args.algo == "coloring":
        from linkgraph.algorithms import greedy_coloring

        state, info = greedy_coloring(
            g, max_rounds=args.max_supersteps, checkpointer=ck
        )
    elif args.algo == "linkpred":
        from linkgraph.algorithms import link_prediction
        from linkgraph.pregel import RunInfo

        state = link_prediction(g)
        info = RunInfo("linkpred", supersteps=1, converged=True)
    elif args.algo == "propagate":
        # degree-feature smoothing demo; rounds ride --max-supersteps
        from pyspark.sql import functions as _F

        from linkgraph.algorithms import propagate_features
        from linkgraph.graph import symmetrize
        from linkgraph.pregel import RunInfo

        feats = (
            symmetrize(g.edges)
            .groupBy(_F.col("src").alias("id"))
            .agg(_F.count(_F.lit(1)).cast("double").alias("x"))
        )
        state = propagate_features(g, feats, hops=args.max_supersteps)
        info = RunInfo(
            "propagate", supersteps=args.max_supersteps, converged=True
        )
    elif args.algo == "diameter":
        from linkgraph.algorithms import double_sweep_diameter

        state, info = double_sweep_diameter(
            g, max_hops=args.max_supersteps
        )
    elif args.algo == "betweenness":
        # Brandes-Pich pivots ride --k, BFS depth --max-supersteps
        from linkgraph.algorithms import betweenness as _bc

        state, info = _bc(
            g, num_sources=args.k, max_hops=args.max_supersteps
        )
    elif args.algo == "centrality":
        # landmark closeness/harmonic; landmark count rides --k,
        # BFS depth rides --max-supersteps
        from linkgraph.algorithms import landmark_centrality

        state, info = landmark_centrality(
            g, num_landmarks=args.k, max_hops=args.max_supersteps
        )
    elif args.algo == "ktruss":
        from linkgraph.algorithms import ktruss

        state, info = ktruss(g, args.k, max_rounds=args.max_supersteps)
    elif args.algo == "walks":
        # deterministic DeepWalk-style sampling; walk length rides
        # --max-supersteps
        from linkgraph.algorithms import random_walks
        from linkgraph.pregel import RunInfo

        state = random_walks(g, walk_length=args.max_supersteps)
        info = RunInfo(
            "walks", supersteps=args.max_supersteps, converged=True
        )
    elif args.algo == "assortativity":
        from linkgraph.algorithms import degree_assortativity
        from linkgraph.pregel import RunInfo

        state = degree_assortativity(g)
        info = RunInfo("assortativity", supersteps=1, converged=True)
    elif args.algo == "modularity":
        # Q of the LPA communities at --max-supersteps iterations
        from linkgraph.algorithms import label_propagation, modularity
        from linkgraph.pregel import RunInfo

        labels, linfo = label_propagation(
            g, max_iter=args.max_supersteps, checkpointer=ck
        )
        state = modularity(g, labels)
        info = RunInfo(
            "modularity", supersteps=linfo.supersteps,
            converged=linfo.converged,
        )
    elif args.algo == "semicluster":
        from linkgraph.algorithms import semi_clustering

        state, info = semi_clustering(
            g, c_max=args.c_max, m_max=args.m_max,
            max_iter=args.max_supersteps, checkpointer=ck,
        )
    else:  # triangles
        from linkgraph.algorithms import triangle_counts

        state, total, info = triangle_counts(g)
        summary["triangles_total"] = total

    wall = time.monotonic() - t0
    if args.out:
        catalog.write_snapshot(args.out, state, meta={"run_id": args.run_id})
    summary.update(
        {
            "supersteps": info.supersteps,
            "converged": info.converged,
            "wall_s": round(wall, 3),
            "edges_per_sec": round(g.num_edges * max(info.supersteps, 1) / wall, 1),
        }
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
