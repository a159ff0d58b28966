"""Deterministic sampling operators vs exact python replays."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import sample_hash, sample_stratified
from linkgraph.pipeline.sampling import hash_threshold


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc-{i}", ["en", "de", "fr"][i % 3]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "id long, text string, lang string")


def test_sample_hash_portable_matches_replay(docs):
    frac = 0.25
    got = {r["id"] for r in sample_hash(docs, frac, "id", seed=7, hash_mode="portable").collect()}
    thr = hash_threshold(frac)
    expected = {i for i in range(300) if _h(f"{i}:7") < thr}
    assert got == expected
    assert 0 < len(got) < 300


def test_sample_hash_nesting_and_bounds(docs):
    # threshold sampling is monotone: the 10% sample nests inside 30%
    s10 = {r["id"] for r in sample_hash(docs, 0.1, "id").collect()}
    s30 = {r["id"] for r in sample_hash(docs, 0.3, "id").collect()}
    assert s10 <= s30
    assert {r["id"] for r in sample_hash(docs, 0.0, "id").collect()} == set()
    assert len({r["id"] for r in sample_hash(docs, 1.0, "id").collect()}) == 300
    with pytest.raises(ValueError):
        sample_hash(docs, 1.5, "id")
    with pytest.raises(ValueError):
        sample_hash(docs, -0.1, "id", hash_mode="portable")


def test_sample_stratified_exact_counts_and_membership(docs):
    frac = 0.2
    out = sample_stratified(docs, frac, "lang", "id", seed=3, hash_mode="portable")
    got = {(r["lang"], r["id"]) for r in out.collect()}
    strata: dict[str, list[int]] = {}
    for i in range(300):
        strata.setdefault(["en", "de", "fr"][i % 3], []).append(i)
    expected = set()
    for lang, ids in strata.items():
        want = math.ceil(frac * len(ids))
        keep = sorted(ids, key=lambda i: (_h(f"{i}:3"), i))[:want]
        expected |= {(lang, i) for i in keep}
    assert got == expected
    # columns pass through untouched, helper columns dropped
    assert set(out.columns) == {"id", "text", "lang"}


def test_sample_stratified_xxhash_counts(docs):
    out = sample_stratified(docs, 0.1, "lang", "id")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"en": 10, "de": 10, "fr": 10}
    again = sample_stratified(docs, 0.1, "lang", "id")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}
    with pytest.raises(ValueError):
        sample_stratified(docs, 2.0, "lang", "id")
