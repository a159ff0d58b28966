"""Streaming ingestion tests (engine extension; reference is batch-only)."""

from __future__ import annotations

import os

from linkgraph import fixtures as FX
from linkgraph.catalog import ParquetManifestCatalog
from linkgraph.streaming import EDGE_TABLE, incremental_edges, stream_corpus


def test_incremental_edge_ingestion(spark, tmp_path):
    c = FX.gen_corpus(R=20, F=2)
    exports = spark.createDataFrame(c.exports)
    catalog = ParquetManifestCatalog(spark, str(tmp_path / "wh"))
    drop = str(tmp_path / "drop")
    os.makedirs(drop)

    files = spark.createDataFrame(c.files)
    # two drops: first half of repos, then the rest (with overlap to
    # prove cross-batch dedup)
    files.filter("repo < 'org0010'").write.mode("overwrite").parquet(f"{drop}/b1")

    # batch 1
    q = incremental_edges(
        stream_corpus(spark, f"{drop}/*"), exports, catalog, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    n1 = catalog.read_all(EDGE_TABLE).count()
    assert n1 > 0

    # batch 2: everything (incl. batch-1 repos again)
    files.write.mode("overwrite").parquet(f"{drop}/b2")
    q = incremental_edges(
        stream_corpus(spark, f"{drop}/*"), exports, catalog, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    got = {
        (r["src_repo"], r["dst_repo"])
        for r in catalog.read_all(EDGE_TABLE).collect()
    }
    want = {tuple(t) for t in c.edges.itertuples(index=False)}
    assert got == want  # exactly the planted set, no duplicates
    total = catalog.read_all(EDGE_TABLE).count()
    assert total == len(want)
