"""Corpus derivation tests (SURVEY §5.2 tests 5; M2 gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph import fixtures as FX
from linkgraph.corpus import (
    corpus_checksum,
    derive_edges,
    extract_imports,
    extract_imports_arrow,
    resolve_edges,
    unresolved_imports,
    verify_corpus_invariant,
)


def _load(spark, R=30, Fn=5):
    c = FX.gen_corpus(R, Fn)
    corpus = spark.createDataFrame(c.files)
    exports = spark.createDataFrame(c.exports)
    expected_sha = spark.createDataFrame(c.row_sha256)
    return c, corpus, exports, expected_sha


def test_sha256_invariant(spark):
    c, corpus, _, expected_sha = _load(spark)
    assert verify_corpus_invariant(corpus, expected_sha) == 0
    # tamper one row → exactly one mismatch
    tampered = corpus.withColumn(
        "content",
        F.when(
            (F.col("repo") == FX.repo_name(0)) & (F.col("path") == "src/f000.py"),
            F.concat(F.col("content"), F.lit("x")),
        ).otherwise(F.col("content")),
    )
    assert verify_corpus_invariant(tampered, expected_sha) == 1
    n, h = corpus_checksum(corpus)
    n2, h2 = corpus_checksum(tampered)
    assert n == n2 == 30 * 5
    assert h != h2


def test_planted_edges_recovered_exactly(spark):
    c, corpus, exports, _ = _load(spark)
    edges_by_name, idmap, edges = derive_edges(corpus, exports)
    got = {
        (r["src_repo"], r["dst_repo"]) for r in edges_by_name.collect()
    }
    want = {tuple(t) for t in c.edges.itertuples(index=False)}
    assert got == want
    # dense encoding round-trips
    assert idmap.count() == idmap.select("repo").distinct().count()
    assert edges.count() == len(want)
    # no unresolved imports in the synthetic corpus
    imports = extract_imports(corpus)
    assert unresolved_imports(imports, exports).count() == 0


def test_arrow_extractor_matches_jvm(spark):
    c, corpus, exports, _ = _load(spark, R=20, Fn=4)
    jvm = resolve_edges(extract_imports(corpus), exports)
    arrow = resolve_edges(extract_imports_arrow(corpus), exports)
    assert {tuple(r) for r in jvm.collect()} == {tuple(r) for r in arrow.collect()}


def test_hub_skew_planted(spark):
    """Repo 0 (i % 97 == 0) must be a planted hub with deg R/10."""
    c = FX.gen_corpus(R=100, F=2)
    hub_edges = c.edges[c.edges.src_repo == FX.repo_name(0)]
    assert len(hub_edges) == 10  # R/10, no self/dup in range


def test_dirty_corpus_robustness(spark):
    """Unknown langs are filtered; null/empty content must not crash the
    extraction pipeline (ANSI mode makes silent-null bugs loud)."""
    import pandas as pd

    c = FX.gen_corpus(R=6, Fn=2) if False else FX.gen_corpus(6, 2)
    dirty = pd.concat(
        [
            c.files,
            pd.DataFrame(
                [
                    ("org9999/repo9999", "src/x.rs", "c" * 40, "rust", "use repo0001_pkg;"),
                    ("org9998/repo9998", "src/y.py", "c" * 40, "python", ""),
                    ("org9997/repo9997", "src/z.py", "c" * 40, "python", None),
                ],
                columns=c.files.columns,
            ),
        ]
    )
    corpus = spark.createDataFrame(dirty)
    exports = spark.createDataFrame(c.exports)
    edges_by_name, idmap, edges = derive_edges(corpus, exports)
    got = {(r["src_repo"], r["dst_repo"]) for r in edges_by_name.collect()}
    want = {tuple(t) for t in c.edges.itertuples(index=False)}
    assert got == want  # rust row filtered, empty/null python rows yield nothing


def test_read_corpus_formats_roundtrip(spark, tmp_path):
    """A1 source formats: parquet/csv/json corpus reads must produce
    identical derived edges — source code content survives CSV quoting
    (embedded newlines/quotes) and JSON-lines escaping."""
    from linkgraph.corpus import derive_edges, read_corpus

    c = FX.gen_corpus(R=20, F=2)
    df = spark.createDataFrame(c.files).select(
        "repo", "path", "commit", "lang", "content"
    )
    exports = spark.createDataFrame(c.exports)

    def edge_set(corpus):
        _, _, edges = derive_edges(corpus, exports)
        return {(r["src"], r["dst"]) for r in edges.collect()}

    paths = {}
    paths["parquet"] = str(tmp_path / "c.parquet")
    df.write.parquet(paths["parquet"])
    paths["csv"] = str(tmp_path / "c.csv")
    df.write.option("header", True).option("escape", '"').csv(paths["csv"])
    paths["json"] = str(tmp_path / "c.json")
    df.write.json(paths["json"])

    want = edge_set(df)
    assert want  # fixture plants edges
    for fmt, path in paths.items():
        got = edge_set(read_corpus(spark, path, fmt=fmt))
        assert got == want, f"{fmt} roundtrip changed the derived edges"


def test_csv_straggler_with_reordered_header_fails(spark, tmp_path):
    """Review fix (enforceSchema=false): the start-time probe validates
    ONE file's header; a multi-file drop whose OTHER file has a
    reordered header must still fail at read time, never bind
    positionally."""
    import pytest

    d = tmp_path / "mixed"
    d.mkdir()
    good = "repo,path,commit,lang,content\norg1,a.py,c1,python,import x\n"
    bad = "path,repo,commit,lang,content\nb.py,org2,c2,python,import y\n"
    (d / "part-0.csv").write_text(good)
    (d / "part-1.csv").write_text(bad)
    from linkgraph.corpus import read_corpus

    with pytest.raises(Exception) as ei:
        read_corpus(spark, str(d), fmt="csv").collect()
    # either the one-file probe catches it (ValueError) or the per-file
    # header validation does (Spark CSV header mismatch) — never silent
    assert "pinned column order" in str(ei.value) or "header" in str(ei.value).lower()
