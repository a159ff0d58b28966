"""Training-data pipeline operator tests (dedup / similarity / text)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.pipeline import (
    cosine_topk,
    dedup_exact,
    exact_duplicates,
    ivf_build,
    ivf_topk,
    language_id,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    shingles,
    simhash_bits,
)
from linkgraph.pipeline.dedup import hamming
from linkgraph.pipeline.multimodal import extract_features, frame_sample, synth_media


def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "src0"),
        (1, "the quick brown fox jumps over the lazy dog", "src0"),   # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog!", "src0"), # near dup
        (3, "le chat et le chien et les oiseaux des bois", "src1"),
        (4, "completely different text about spark engines", "src1"),
        (5, "el perro de la casa que ladra los martes", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(spark):
    df = docs_df(spark)
    dups = exact_duplicates(df).collect()
    assert len(dups) == 1 and dups[0]["n_docs"] == 2
    kept = dedup_exact(df)
    assert kept.count() == 5
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3, 4, 5}


def test_minhash_lsh_finds_near_dup(spark):
    df = docs_df(spark)
    sh = shingles(df, k=4)
    sig = minhash_signatures(sh, num_hashes=16)
    assert sig.count() == 6
    pairs = lsh_candidate_pairs(sig, bands=8)  # 2 rows/band → sensitive
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got  # identical docs always collide
    scored = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sh, pairs).collect()
    }
    assert scored[(0, 1)] == 1.0
    # exact jaccard (no candidates) finds the near-dup pair too
    allp = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sh, threshold=0.5).collect()
    }
    assert (0, 2) in allp and allp[(0, 2)] > 0.5


def test_simhash(spark):
    df = docs_df(spark)
    bits = simhash_bits(df, nbits=32)
    rows = {r["id"]: r["simhash_bits"] for r in bits.collect()}
    assert rows[0] == rows[1]  # identical text → identical simhash
    a = bits.alias("a").filter("id=0").select(F.col("simhash_bits").alias("ba"))
    pair = a.crossJoin(bits.filter("id=4").select(F.col("simhash_bits").alias("bb")))
    d = pair.select(hamming(F.col("ba"), F.col("bb")).alias("d")).first()["d"]
    assert d > 0


def test_cosine_topk_and_ivf(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = [float(x) for x in rows[7][1]]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert exact[0] == 7  # self is its own nearest neighbor
    assigned, cents = ivf_build(emb, n_centroids=4, lloyd_iters=1)
    assert assigned.count() == 60
    approx = [r["vec_id"] for r in ivf_topk(assigned, cents, q, k=5, nprobe=4).collect()]
    # probing ALL buckets must reproduce the exact result
    assert approx == exact


def test_text_ops(spark):
    df = docs_df(spark)
    q = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert langs[0] == "en" and langs[3] == "fr" and langs[5] == "es"


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 16 for r in rows)
    # determinism: same payload → same features across separate runs
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert again == first
    frames = frame_sample(media, every_ms=500)
    vid_count = media.filter("kind='video'").count()
    assert frames.select("media_id").distinct().count() == vid_count
    assert frames.filter("ts_ms % 500 != 0").count() == 0
