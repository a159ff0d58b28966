"""Incremental (batch-over-batch) near-dup dedup via a persisted LSH index.

The shape a 100 TB crawl actually uses: documents arrive in batches
(streaming.py's foreachBatch is the hook); re-running the full
`dedup_assignments` closure over the whole accumulated corpus per
batch would re-shingle and re-band everything ever seen. Instead the
LSH artifacts are persisted ONCE per distinct content through the
catalog seam and each new batch only pays for its own new content:

- `{p}_docs`     (doc_id, h)        — every doc's sha256, appended per batch
- `{p}_shingles` (h, shingle)       — k-gram sets, appended for NEW hashes only
- `{p}_banded`   (h, band, bh)      — LSH bucket rows, appended for NEW hashes only
- `{p}_pairs`    (h_a, h_b)         — verified near-dup pairs, appended

Everything content-derived is keyed by the content hash `h`, not the
doc id: byte-identical docs share shingles, signatures and buckets, so
the index stores each distinct content exactly once (the incremental
form of `dedup_assignments`' exact-dedup-before-LSH), and a doc id
appearing in a later batch never invalidates stored rows.

Bucket membership is static per content (`lsh_band_rows`), so pair
discovery is exactly incremental: a pair (old, new) is found when the
newer side is banded; old-old pairs were found when THEIR newer side
arrived. With an uncapped index, `add_batch` therefore returns
bit-identical assignments to a full `dedup_assignments` recompute over
the union of all batches (asserted in tests). With `max_bucket_size`
set, semantics diverge deliberately: a pair emitted while its bucket
was small is KEPT even if the bucket later overflows (the full
recompute would drop it) — incremental indexes don't retract, they
stop adding; the cap still bounds per-batch candidate blowup.

Scale shape per batch: one scan+sha of the batch, shingle+band of the
batch's new content only, one (band, bh) join of the new banded rows
against the stored index, candidate-bounded Jaccard verification, and
the component fixpoint over the accumulated verified pair graph
(pair-graph-bounded, not corpus-bounded). The only accumulated-corpus
work is the (doc_id, h) min-aggregate that re-derives canonical reps —
two slim columns.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import (
    lsh_band_rows,
    minhash_signatures,
    near_dup_components,
    ngram_jaccard_pairs,
    shingles,
)


class IncrementalDeduper:
    """Stateful incremental dedup over a catalog-persisted LSH index.

    catalog: any provider with append/read_all/drop (ParquetManifest or
    Iceberg). Parameters must stay fixed across batches — they are part
    of the index; a changed k/num_hashes/bands invalidates stored rows,
    so they are recorded in the first batch's meta and checked on every
    subsequent append.
    """

    def __init__(
        self,
        catalog,
        prefix: str = "dedupidx",
        k: int = 5,
        num_hashes: int = 16,
        bands: int = 4,
        threshold: float = 0.5,
        max_bucket_size: int | None = None,
        hash_mode: str = "xxhash64",
    ):
        self.catalog = catalog
        self.prefix = prefix
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self.hash_mode = hash_mode

    def _table(self, name: str) -> str:
        return f"{self.prefix}_{name}"

    def _params(self) -> dict:
        return {
            "k": self.k,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "threshold": self.threshold,
            "hash_mode": self.hash_mode,
        }

    def _read_or_none(self, name: str) -> DataFrame | None:
        try:
            return self.catalog.read_all(self._table(name))
        except FileNotFoundError:
            return None

    def _check_params(self) -> None:
        try:
            snap = self.catalog.latest(
                self._table("docs"), predicate=lambda m: "index_params" in m
            )
        except FileNotFoundError:
            snap = None
        if snap is not None and snap.meta["index_params"] != self._params():
            raise ValueError(
                "IncrementalDeduper: index was built with "
                f"{snap.meta['index_params']}, this instance has "
                f"{self._params()} — changed parameters invalidate the "
                "stored shingle/band rows; use a new prefix"
            )

    def add_batch(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Ingest a batch; return (id_col, canonical_id) for EVERY doc
        seen so far (same contract as dedup.dedup_assignments over the
        union of all batches)."""
        self._check_params()
        spark = df.sparkSession
        hashed = df.select(
            F.col(id_col).alias("doc_id"),
            F.sha2(F.col(text_col), 256).alias("h"),
        )
        old_docs = self._read_or_none("docs")
        if old_docs is not None:
            # replay idempotence (streaming foreachBatch is
            # at-least-once): a doc_id already in the index is dropped
            # from the batch — re-delivering a batch appends nothing
            # and returns the same assignments. doc_id is the identity;
            # re-ingesting an id with different text is not an update.
            hashed = hashed.join(
                old_docs.select("doc_id").distinct(), "doc_id", "left_anti"
            )
            df = df.join(
                hashed.select(F.col("doc_id").alias(id_col)),
                id_col,
                "left_semi",
            )
        # one exemplar row per NEW distinct content: shingles/signature/
        # buckets depend only on the text, so any doc of the hash works
        exemplars = (
            df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
            .join(hashed, "doc_id")
            .groupBy("h")
            .agg(F.min_by("text", "doc_id").alias("text"))
        )
        if old_docs is not None:
            exemplars = exemplars.join(
                old_docs.select("h").distinct(), "h", "left_anti"
            )
        exemplars = exemplars.localCheckpoint()

        new_sh = shingles(exemplars, id_col="h", text_col="text", k=self.k)
        new_banded = lsh_band_rows(
            minhash_signatures(
                new_sh, num_hashes=self.num_hashes, hash_mode=self.hash_mode
            ),
            bands=self.bands,
            hash_mode=self.hash_mode,
            num_hashes=self.num_hashes,
        ).select(F.col("id").alias("h"), "band", "bh")
        new_sh = new_sh.select(F.col("id").alias("h"), "shingle").localCheckpoint()
        new_banded = new_banded.localCheckpoint()

        old_banded = self._read_or_none("banded")
        all_banded = (
            new_banded if old_banded is None
            else old_banded.unionByName(new_banded)
        )
        if self.max_bucket_size is not None:
            big = (
                all_banded.groupBy("band", "bh")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > self.max_bucket_size)
            )
            n_big = big.count()
            if n_big:
                warnings.warn(
                    f"IncrementalDeduper: {n_big} bucket(s) over "
                    f"max_bucket_size={self.max_bucket_size} skipped for "
                    "this batch's candidate generation (pairs already "
                    "verified in earlier batches are kept — incremental "
                    "indexes stop adding, they don't retract)",
                    stacklevel=2,
                )
                big_b = F.broadcast(big.select("band", "bh"))
                new_banded_cand = new_banded.join(big_b, ["band", "bh"], "left_anti")
                all_banded_cand = all_banded.join(big_b, ["band", "bh"], "left_anti")
            else:
                new_banded_cand, all_banded_cand = new_banded, all_banded
        else:
            new_banded_cand, all_banded_cand = new_banded, all_banded

        # candidates touching >=1 new hash: new × (old ∪ new); h_a < h_b
        # canonicalizes; old-old pairs are already in the pair store
        cand = (
            new_banded_cand.select(F.col("h").alias("h_x"), "band", "bh")
            .join(
                all_banded_cand.select(F.col("h").alias("h_y"), "band", "bh"),
                ["band", "bh"],
            )
            .filter(F.col("h_x") != F.col("h_y"))
            .select(
                F.least("h_x", "h_y").alias("id_a"),
                F.greatest("h_x", "h_y").alias("id_b"),
            )
            .distinct()
        )
        old_sh = self._read_or_none("shingles")
        all_sh = (
            new_sh if old_sh is None else old_sh.unionByName(new_sh)
        ).select(F.col("h").alias("id"), "shingle")
        new_pairs = ngram_jaccard_pairs(
            all_sh, cand, threshold=self.threshold
        ).select(F.col("id_a").alias("h_a"), F.col("id_b").alias("h_b"))

        # commit the batch to the index
        meta = {"index_params": self._params()}
        self.catalog.append(self._table("docs"), hashed, meta=meta)
        self.catalog.append(self._table("shingles"), new_sh, meta=meta)
        self.catalog.append(self._table("banded"), new_banded, meta=meta)
        self.catalog.append(self._table("pairs"), new_pairs, meta=meta)

        # re-derive assignments from the accumulated slim state
        docs_all = self.catalog.read_all(self._table("docs"))
        groups = docs_all.groupBy("h").agg(F.min("doc_id").alias("rep"))
        pairs_all = self.catalog.read_all(self._table("pairs"))
        rep_edges = (
            pairs_all.join(
                groups.select(F.col("h").alias("h_a"), F.col("rep").alias("id_a")),
                "h_a",
            )
            .join(
                groups.select(F.col("h").alias("h_b"), F.col("rep").alias("id_b")),
                "h_b",
            )
            .select("id_a", "id_b")
        )
        comp = near_dup_components(rep_edges)
        return (
            docs_all.join(groups, "h")
            .join(comp.withColumnRenamed("id", "rep"), "rep", "left")
            .select(
                F.col("doc_id").alias(id_col),
                F.coalesce(F.col("comp"), F.col("rep")).alias("canonical_id"),
            )
        )

    def drop_index(self) -> None:
        for t in ("docs", "shingles", "banded", "pairs"):
            self.catalog.drop(self._table(t))
