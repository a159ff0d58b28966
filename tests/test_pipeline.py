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


def test_dedup_closure_assignments_and_survivors(spark):
    """VERDICT r3 #1: the end-to-end closure. docs 0/1 are exact dups,
    2 is a near-dup of 0 (jaccard > 0.5) — the cluster {0,1,2} maps to
    canonical 0; everything else survives as itself. dedup_near returns
    the filtered corpus with original columns intact."""
    from linkgraph.pipeline.dedup import dedup_assignments, dedup_near

    df = docs_df(spark)
    assign = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_assignments(
            df, k=4, num_hashes=16, bands=8, threshold=0.5
        ).collect()
    }
    assert assign == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}

    kept = dedup_near(df, k=4, num_hashes=16, bands=8, threshold=0.5)
    assert kept.columns == df.columns
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 4, 5}

    # no near-dup pairs at an impossible threshold: exact dups still
    # collapse (1 -> 0), everything else is its own canonical
    assign2 = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_assignments(
            df, k=4, num_hashes=16, bands=8, threshold=1.01
        ).collect()
    }
    assert assign2 == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4, 5: 5}


def test_lsh_validates_band_count(spark):
    import pytest

    df = docs_df(spark)
    sig = minhash_signatures(shingles(df, k=4), num_hashes=16)
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sig, bands=5)  # 5 does not divide 16
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sig, bands=32)  # bands > sig_len


def test_lsh_portable_hash_mode_recall(spark):
    # portable (md5-prefix) mode must still recall the exact-dup pair
    # and agree with ngram verification, independent of hash function
    df = docs_df(spark)
    sh = shingles(df, k=4)
    sig = minhash_signatures(sh, num_hashes=16, hash_mode="portable")
    pairs = lsh_candidate_pairs(sig, bands=8, hash_mode="portable")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got


def test_lsh_bucket_cap_prevents_quadratic_blowup(spark):
    # 2000 docs of identical boilerplate + one planted near-dup pair:
    # uncapped LSH would emit ~2M boilerplate pairs; the scale-safe
    # pipeline (exact-dedup first + capped buckets) must return a
    # small candidate set and keep the planted pair.
    from linkgraph.pipeline.dedup import near_dup_candidates

    boiler = [(i, "lorem ipsum dolor sit amet " * 8, "b") for i in range(2000)]
    planted = [
        (10_000, "a genuinely unique document about graph engines", "p"),
        (10_001, "a genuinely unique document about graph engine", "p"),
    ]
    df = spark.createDataFrame(
        boiler + planted, "doc_id long, text string, source string"
    )
    pairs = near_dup_candidates(df, k=4, bands=8, max_bucket_size=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (10_000, 10_001) in got
    # identical boilerplate collapsed by dedup_exact → no m² explosion
    assert len(got) < 100


def test_lsh_bucket_cap_drops_oversized_and_warns(spark):
    import warnings as W

    # 60 distinct docs sharing one hot band bucket is impossible to
    # fabricate portably, so test the cap path directly: low cap on a
    # fixture where every doc pair shares a bucket (identical text but
    # distinct ids survive dedup_exact only if texts differ — so skip
    # dedup and call lsh directly).
    rows = [(i, "same same same text", "s") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sig = minhash_signatures(shingles(df, k=4), num_hashes=16)
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        pairs = lsh_candidate_pairs(sig, bands=4, max_bucket_size=10)
        n = pairs.count()
    assert n == 0  # the single oversized bucket was dropped entirely
    assert any("dropped" in str(w.message) for w in caught)


def test_incremental_dedup_equals_full_recompute(spark, tmp_path):
    """Batch-incremental dedup over the persisted LSH index ==
    full dedup_assignments recompute over the union, on a planted
    fixture with exact dups and near-dups WITHIN and ACROSS batches
    (an across-batch near-dup can only be found by joining the new
    batch's bands against the stored index)."""
    from linkgraph.catalog import ParquetManifestCatalog
    from linkgraph.pipeline import IncrementalDeduper
    from linkgraph.pipeline.dedup import dedup_assignments

    batch1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup
            (2, "an unrelated essay about distributed shuffle design"),
            (3, "numerical recipes for eigenvalue decomposition at scale"),
        ],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [
            # near-dup of doc 0 — across batches, via the stored index
            (10, "the quick brown fox jumped over the lazy dog tonight!"),
            (11, "an unrelated essay about distributed shuffle design"),  # exact dup of 2
            (12, "completely novel content with no relatives anywhere"),
            # near-dup pair within batch 2
            (13, "recipes for eigenvalue decomposition at petabyte scale"),
        ],
        "doc_id long, text string",
    )
    params = dict(k=5, num_hashes=16, bands=4, threshold=0.5)
    cat = ParquetManifestCatalog(spark, str(tmp_path / "wh"))
    inc = IncrementalDeduper(cat, max_bucket_size=None, **params)

    a1 = {r["doc_id"]: r["canonical_id"] for r in inc.add_batch(batch1).collect()}
    full1 = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_assignments(batch1, max_bucket_size=None, **params).collect()
    }
    assert a1 == full1

    a2 = {r["doc_id"]: r["canonical_id"] for r in inc.add_batch(batch2).collect()}
    union = batch1.unionByName(batch2)
    full2 = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_assignments(union, max_bucket_size=None, **params).collect()
    }
    assert a2 == full2
    # the planted relations actually collapsed
    assert a2[1] == a2[0] and a2[11] == a2[2] and a2[10] == a2[0]
    assert a2[12] == 12

    # changed parameters must be rejected (they invalidate the index)
    import pytest

    bad = IncrementalDeduper(cat, k=7, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="index was built with"):
        bad.add_batch(batch2)


def test_incremental_dedup_index_stores_distinct_content_once(spark, tmp_path):
    """The index is keyed by content hash: a batch of N copies of one
    text appends exactly ONE set of shingle/band rows, and a later
    batch repeating known content appends none."""
    from linkgraph.catalog import ParquetManifestCatalog
    from linkgraph.pipeline import IncrementalDeduper

    cat = ParquetManifestCatalog(spark, str(tmp_path / "wh2"))
    inc = IncrementalDeduper(cat, k=4, num_hashes=8, bands=2)
    same = "identical boilerplate page content here"
    b1 = spark.createDataFrame(
        [(i, same) for i in range(5)], "doc_id long, text string"
    )
    inc.add_batch(b1)
    assert cat.read_all("dedupidx_banded").count() == 2  # 1 content × 2 bands
    b2 = spark.createDataFrame(
        [(100, same), (101, "something genuinely new appears")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["canonical_id"] for r in inc.add_batch(b2).collect()}
    assert cat.read_all("dedupidx_banded").count() == 4  # +1 content × 2 bands
    assert a[100] == 0 and a[101] == 101


def test_contamination_report_finds_planted_eval_leak(spark):
    """Decontamination (pipeline/decontam.py): a training doc that
    contains an eval question verbatim is flagged at 1.0; a doc with
    no eval overlap is not flagged; `decontaminate` drops exactly the
    flagged docs and keeps the rest."""
    import pytest

    from linkgraph.pipeline import contamination_report, decontaminate

    eval_rows = [
        (100, "what is the capital of france"),
        (101, "compute the determinant of a 3x3 matrix"),
    ]
    train_rows = [
        # contains eval 100 verbatim inside boilerplate -> contamination 1.0
        (0, "trivia dump: what is the capital of france? answer: paris"),
        # clean docs
        (1, "a treatise on the migratory patterns of atlantic seabirds"),
        (2, "spark engines and distributed shuffle design notes"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "eval_id long, text string")

    rep = contamination_report(train, ev, k=5, threshold=0.8)
    got = {(r["doc_id"], r["eval_id"]): r["contamination"] for r in rep.collect()}
    assert got == {(0, 100): 1.0}
    # every eval shingle of 100 appears in doc 0
    row = rep.collect()[0]
    assert row["overlap_ngrams"] == row["eval_ngrams"]

    # lower threshold surfaces partial overlaps; chance char-5-gram
    # collisions sit below 0.06 on this fixture (doc1↔eval101 shares
    # " the "-style grams at 2/35), so 0.1 still flags only doc 0, and
    # the zero-overlap doc 2 is never flagged at any threshold > 0
    rep_low = contamination_report(train, ev, k=5, threshold=0.1)
    assert {r["doc_id"] for r in rep_low.collect()} == {0}
    rep_tiny = contamination_report(train, ev, k=5, threshold=0.01)
    assert 2 not in {r["doc_id"] for r in rep_tiny.collect()}

    clean = decontaminate(train, ev, k=5, threshold=0.8)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}

    with pytest.raises(ValueError, match="threshold"):
        contamination_report(train, ev, threshold=1.5)


def test_contamination_broadcast_plan(spark):
    """The corpus side must stay map-side: the eval shingle join is a
    BroadcastHashJoin (the corpus-sized relation is never shuffled)."""
    from linkgraph.pipeline import contamination_report

    train = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(900, "document number 7 with some text")], "eval_id long, text string"
    )
    rep = contamination_report(train, ev, k=5, threshold=0.9)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert {r["doc_id"] for r in rep.collect()} >= {7}


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


def test_ivf_stored_path_prunes_partitions(spark, tmp_path):
    import random

    from linkgraph.pipeline.similarity import ivf_topk_stored, ivf_write

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = [float(x) for x in rows[3][1]]
    assigned, cents = ivf_build(emb, n_centroids=4, lloyd_iters=1)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, path)
    stored = ivf_topk_stored(spark, path, cents, q, k=5, nprobe=2)
    mem = ivf_topk(assigned, cents, q, k=5, nprobe=2)
    assert [r["vec_id"] for r in stored.collect()] == [
        r["vec_id"] for r in mem.collect()
    ]
    # the bucket filter must reach the file source as a partition filter
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf  # non-empty: pruning is real, not a full scan


def test_ivf_empty_bucket_keeps_positional_labels(spark):
    # two far clusters + 4 centroids: Lloyd empties some buckets; the
    # bucket column must still index into the returned centroid list
    # (regression: stale labels after an emptied bucket shifted ids)
    rows = [(i, [10.0 + (i % 3) * 0.01, 10.0], 0) for i in range(30)] + [
        (100 + i, [-10.0, -10.0 - (i % 3) * 0.01], 0) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    assigned, cents = ivf_build(emb, n_centroids=4, lloyd_iters=2)
    assert [i for i, _ in cents] == list(range(4))  # contiguous positional ids
    q = [10.0, 10.0]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    approx = [r["vec_id"] for r in ivf_topk(assigned, cents, q, k=5, nprobe=4).collect()]
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


def test_multimodal_decode_is_real(spark):
    """The lib-free decoders produce verifiable values, not hashes:
    a solid-red PPM must yield mean_rgb=(1,0,0); a full-scale sine WAV
    must yield rms≈1/√2; a 2-frame PPMV must count 2 frames."""
    import math

    import numpy as np

    from linkgraph.pipeline.multimodal import (
        _decode_payload,
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_ppmv,
        encode_wav_pcm16,
    )

    red = np.zeros((4, 6, 3), np.uint8)
    red[:, :, 0] = 255
    f = _decode_payload(encode_ppm(red), "image")
    assert f[2] == 1.0 and f[3] == 0.0 and f[4] == 0.0  # mean r,g,b
    assert decode_ppm(encode_ppm(red)).shape == (4, 6, 3)

    t = np.arange(8000, dtype=np.float64)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 32767).astype(np.int16)
    fa = _decode_payload(encode_wav_pcm16(sine), "audio")
    assert abs(fa[0] - 1.0) < 1e-9  # duration: 8000 samples @ 8 kHz
    assert abs(fa[1] - 1 / math.sqrt(2)) < 0.01  # rms of a sine
    samples, rate = decode_wav_pcm16(encode_wav_pcm16(sine))
    assert rate == 8000 and samples.size == 8000

    blue = np.zeros((4, 6, 3), np.uint8)
    blue[:, :, 2] = 255
    fv = _decode_payload(encode_ppmv([red, blue]), "video")
    assert fv[0] == 2 / 100.0  # frame count feature
    assert fv[15] > 0.0  # motion between a red and a blue frame

    import pytest

    with pytest.raises(ValueError):
        _decode_payload(b"garbage-bytes", "image")
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\xff\xd8\xff rest-of-jpeg", "image")  # codec seam


def test_multimodal_resize(spark):
    from linkgraph.pipeline.multimodal import decode_ppm, resize_images

    media = synth_media(spark, 12)
    small = resize_images(media, 8, 5)
    rows = small.collect()
    assert len(rows) == media.filter("kind='image'").count()
    for r in rows:
        assert decode_ppm(bytes(r["payload"])).shape == (5, 8, 3)


def test_jaccard_verify_is_candidate_driven(spark):
    """Verify stage must build intersections FROM the LSH candidates:
    no join in the plan keyed on `shingle` alone (the all-co-shingle
    self-join would cost m² rows for a hot shingle shared by m docs,
    defeating the capped-LSH stage upstream), and the scores must equal
    the exact all-pairs path restricted to the same candidates."""
    import re

    rows = [
        (i, f"common boilerplate header line with unique tail token{i}", "s")
        for i in range(50)
    ]
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta", "p"),
        (1001, "alpha beta gamma delta epsilon eta", "p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sh = shingles(df, k=4)
    sig = minhash_signatures(sh, num_hashes=16)
    pairs = lsh_candidate_pairs(sig, bands=8, num_hashes=16)
    scored = ngram_jaccard_pairs(sh, pairs)
    exact_restricted = ngram_jaccard_pairs(sh).join(
        pairs, ["id_a", "id_b"], "left_semi"
    )
    got = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in scored.collect()}
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in exact_restricted.collect()
    }
    assert got == want and (1000, 1001) in got

    plan = scored._jdf.queryExecution().executedPlan().toString()
    join_keys = re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\w*\s+\[([^\]]*)\]",
        plan,
    )
    assert join_keys  # the plan does contain joins
    for keys in join_keys:
        # every shingle-keyed join must also be keyed on a doc id —
        # i.e. candidate-restricted, never the raw shingle self-join
        assert "shingle" not in keys or "id" in keys, plan


def test_lsh_num_hashes_skips_probe_materialization(spark):
    """Passing num_hashes must eliminate the extra full execution of
    the shingle→hash→min pipeline that the size-probe `.first()` costs
    (VERDICT r2 #5): strictly fewer Spark jobs for the same result."""
    df = docs_df(spark)
    sh = shingles(df, k=4)
    sig = minhash_signatures(sh, num_hashes=16)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    sc.setJobGroup("lsh_with_nh", "lsh with num_hashes")
    with_rows = lsh_candidate_pairs(sig, bands=8, num_hashes=16).count()
    n_with = len(tracker.getJobIdsForGroup("lsh_with_nh"))

    sc.setJobGroup("lsh_probe", "lsh probing signature length")
    probe_rows = lsh_candidate_pairs(sig, bands=8).count()
    n_probe = len(tracker.getJobIdsForGroup("lsh_probe"))
    sc.setLocalProperty("spark.jobGroup.id", None)

    assert with_rows == probe_rows
    assert n_with < n_probe


def test_ivf_assign_kernel_matches_brute_force_and_handles_scale_c(spark):
    """assign_vectors (broadcast centroid matrix + batch matmul) must
    agree with exact nearest-centroid math computed in numpy, and must
    accept a centroid count far beyond what a literal expression array
    could (C=256 here; the production target is 4k-65k)."""
    import random

    import numpy as np

    from linkgraph.pipeline.similarity import assign_vectors

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    base = spark.createDataFrame(rows, "id long, v array<double>")
    cents = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(256)]
    got = {r["id"]: r["bucket"] for r in assign_vectors(base, cents).collect()}

    cm = np.asarray([c for _, c in cents])
    cn = np.linalg.norm(cm, axis=1)
    for i, v in rows:
        vv = np.asarray(v)
        cos = (cm @ vv) / (cn * np.linalg.norm(vv))
        assert got[i] == int(cos.argmax())


def test_ann_ivf_driver_entry_uses_pruned_stored_path(spark):
    """The driver's ann_ivf entry must serve from the partitionBy(bucket)
    inverted file: its plan carries a non-empty bucket PartitionFilter
    (VERDICT r2 #3 — the in-memory full-scan probe is not the default)."""
    import __spark_entry__ as E

    df = E.queries()["ann_ivf"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf


def test_lsh_num_hashes_mismatch_fails_loudly(spark):
    """A declared num_hashes that disagrees with the real signature
    length must raise (review fix): understated would silently band
    over a prefix and change the candidate set."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    df = docs_df(spark)
    sig = minhash_signatures(shingles(df, k=4), num_hashes=32)
    with pytest.raises(SparkRuntimeException, match="num_hashes"):
        lsh_candidate_pairs(sig, bands=8, num_hashes=16).count()


def test_ppr_source_validation(spark, graph_builder):
    """Review fix: duplicate sources collapse (set semantics) and
    unknown sources raise instead of silently deflating every rank."""
    import pytest

    from linkgraph.algorithms import personalized_pagerank

    g = graph_builder([(0, 1), (1, 2), (2, 0)])
    a, _ = personalized_pagerank(g, [0, 1], tol=1e-10)
    b, _ = personalized_pagerank(g, [0, 0, 1, 1], tol=1e-10)
    ra = {r["id"]: r["rank"] for r in a.collect()}
    rb = {r["id"]: r["rank"] for r in b.collect()}
    assert all(abs(ra[i] - rb[i]) < 1e-12 for i in ra)
    with pytest.raises(ValueError, match="not present"):
        personalized_pagerank(g, [0, 99])


def test_rp_lsh_signatures_deterministic_and_similarity_sensitive(spark):
    """RP-LSH: (a) identical vectors get identical signatures; (b) a
    tiny perturbation flips few bits (hamming-close signatures); (c) a
    negated vector flips ALL decided bits; (d) the signature is
    partition-invariant (integer quantization leaves no float path)."""
    import math
    import random

    from linkgraph.pipeline.similarity import rp_lsh_signatures

    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + rng.uniform(-0.001, 0.001) for x in base]
    far = [-x for x in base]
    rows = [(0, base), (1, list(base)), (2, near), (3, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sigs = {r["vec_id"]: r["sig"] for r in rp_lsh_signatures(df, nbits=16).collect()}
    assert sigs[0] == sigs[1]
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    ham_far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham_near <= 3
    assert ham_far >= 10  # opposite direction disagrees almost everywhere

    sigs8 = {
        r["vec_id"]: r["sig"]
        for r in rp_lsh_signatures(df.repartition(7), nbits=16).collect()
    }
    assert sigs8 == sigs

    import pytest

    with pytest.raises(ValueError, match="nbits"):
        rp_lsh_signatures(df, nbits=0)


def test_rp_lsh_candidates_find_planted_neardup(spark):
    """Banded RP-LSH candidates contain the planted near-dup pair and
    not the full cross product; the bucket cap drops a degenerate
    all-equal cluster."""
    import random

    from linkgraph.pipeline.similarity import rp_lsh_candidates

    rng = random.Random(9)
    rows = []
    for i in range(40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(32)]))
    base = rows[0][1]
    rows.append((100, [x + rng.uniform(-0.0005, 0.0005) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_lsh_candidates(df, nbits=16, bands=4).collect()
    }
    assert (0, 100) in pairs
    assert len(pairs) < 41 * 40 / 2  # not the cross product

    # degenerate: many identical vectors -> one hot bucket; cap drops it
    clones = [(200 + i, list(base)) for i in range(20)]
    df2 = spark.createDataFrame(rows + clones, "vec_id long, embedding array<float>")
    capped = rp_lsh_candidates(df2, nbits=16, bands=4, max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a >= 200 and b >= 200 for a, b in got)

    import pytest

    with pytest.raises(ValueError, match="must divide"):
        rp_lsh_candidates(df, nbits=16, bands=3)


def test_tfidf_and_bm25_match_python(spark):
    """tfidf_top_terms / bm25_scores == a pure-python replay of the
    pinned formulas on a literal corpus."""
    import math

    from linkgraph.pipeline.textstats import bm25_scores, tfidf_top_terms

    docs = [
        (0, "spark table query table"),
        (1, "query of the data table"),
        (2, "spark spark stream"),
        (3, "window window window agg"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = {i: t.split() for i, t in docs}
    n = len(docs)

    tf = {(i, w): toks[i].count(w) for i in toks for w in set(toks[i])}
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    want_scored = {
        (i, w): round(c * (math.log((1.0 + n) / (1.0 + dfreq[w])) + 1.0), 6)
        for (i, w), c in tf.items()
    }
    got = tfidf_top_terms(df, top_n=2).collect()
    for r in got:
        assert r["tfidf"] == want_scored[(r["doc_id"], r["term"])]
    for i in toks:  # the chosen terms are the true top-2
        mine = sorted(
            (r["term"] for r in got if r["doc_id"] == i),
        )
        true = sorted(
            w
            for w in sorted(
                {w for w in toks[i]},
                key=lambda w: (-want_scored[(i, w)], w),
            )[:2]
        )
        assert mine == true, i

    q = ["spark", "query"]
    dl = {i: len(toks[i]) for i in toks}
    avgdl = sum(dl.values()) / n
    qdf = {w: sum(1 for i in toks if w in toks[i]) for w in q}
    want_bm25 = {}
    for i in toks:
        s = 0.0
        for w in q:
            c = toks[i].count(w)
            if c == 0:
                continue
            idf = math.log(1.0 + (n - qdf[w] + 0.5) / (qdf[w] + 0.5))
            s += idf * (c * (1.2 + 1.0)) / (
                c + 1.2 * (1.0 - 0.75 + 0.75 * dl[i] / avgdl)
            )
        if s:
            want_bm25[i] = round(s, 6)
    got_bm25 = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, q).collect()}
    assert got_bm25 == want_bm25

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])
