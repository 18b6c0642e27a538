"""Incrementally-maintained MinHash signature index.

Near-duplicate detection over a living corpus has an O(corpus) step —
shingling every text and folding it through K hash-mins
(functions/dedup.py::minhash_signatures). Recomputing that on every
ingest batch is the dominant cost at 100 TB; the signatures themselves
are K longs per doc and only change when the doc's TEXT changes. So
keep them as a derived lake table maintained off the source's own
change feed:

- the index is a LakeTable keyed like the source id: one row
  ``(id, minhash array<bigint>)`` per live doc;
- ``refresh_signature_index`` catches up from the last maintained
  source version in ONE merge: signatures are recomputed only for
  rows whose text changed (inserts + updates), deletes drop the
  index row — O(changed docs), bucket-pruned diff I/O
  (changes.py::table_changes), never O(corpus);
- exactly-once via the index's own batch ledger (``sigidx-v{head}``,
  source version as LSN — the mirror/matview gate), so re-running a
  refresh no-ops and a crashed refresh resumes;
- retention gap (source history expired past the last refresh) falls
  back to a full rebuild: recompute signatures at head, snapshot-diff
  against the stored index, one merge — never silent divergence;
- candidate generation reads ONLY the index:
  ``functions/dedup.py::lsh_pairs_from_signatures`` band-explodes the
  stored arrays (K/B xxhash64 calls per doc — no text touched) and
  self-joins per bucket. Exact-Jaccard verification then reads texts
  for the candidate pairs alone.

Because the index stores the SAME signatures ``minhash_lsh_pairs``
would compute from scratch, the incremental path is result-identical
to the batch path by construction — the driver query
``doc_near_dup_incremental`` pins that with the exact brute-force
oracle after a replay with mid-stream text rewrites and deletions.

≙ reference: no equivalent — the reference routes opaque payloads
(RouteIngestedFile.kt:21-34) and has no content index; this is
engine-supplied corpus-curation surface per SURVEY §2.3, composed
from the lake's change feed (§2.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from dexspark.functions.dedup import minhash_signatures, ngram_jaccard
from dexspark.lake import manifest as mf
from dexspark.lake.changes import last_done_version, snapshot_diff, table_changes
from dexspark.lake.table import LakeTable

SIG_COL = "minhash"
DEFAULT_PREFIX = "sigidx"


def index_schema(id_field: StructField) -> StructType:
    return StructType(
        [id_field, StructField(SIG_COL, ArrayType(LongType()), True)]
    )


def create_signature_index(
    spark: SparkSession,
    path: str,
    source: LakeTable,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> LakeTable:
    """Create the (empty) index table for ``source``, keyed and
    bucketed on ``id_col`` — co-bucketing with the source keeps the
    maintenance merge's shuffle aligned with the feed's."""
    src_schema = source.schema()
    by_name = {f.name: f for f in src_schema.fields}
    if id_col not in by_name:
        raise ValueError(f"id column {id_col!r} not in source schema")
    return LakeTable.create(
        spark,
        path,
        index_schema(by_name[id_col]),
        bucket_key=id_col,
        num_buckets=num_buckets or source.manifest().num_buckets,
    )


def refresh_signature_index(
    src: LakeTable,
    idx: LakeTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    batch_id_prefix: str = DEFAULT_PREFIX,
) -> dict[str, Any] | None:
    """Bring ``idx`` up to date with ``src``'s head snapshot in one
    merge. Returns the merge info dict, or None when already current.

    Signature parameters (num_hashes, shingle_n, seed) must be held
    constant across refreshes of one index — they define the index's
    content, exactly like an aggregate view's spec."""
    versions = mf.available_versions(src.meta_dir)
    if not versions:
        return None
    head = versions[-1]
    maintained = last_done_version(idx, batch_id_prefix)
    if maintained is not None and maintained >= head:
        return None

    def sigs_of(rows: DataFrame) -> DataFrame:
        # output column is already SIG_COL ("minhash")
        return minhash_signatures(
            rows, text_col, id_col, num_hashes, shingle_n, seed
        )

    is_create = src.manifest(versions[0]).summary.get("operation") == "create"
    if (maintained is not None and maintained in versions) or (
        maintained is None and is_create
    ):
        feed = table_changes(
            src, versions[0] if maintained is None else maintained, head
        ).persist()
        try:
            upserts = feed.filter(F.col("op") != "D").select(id_col, text_col)
            changes = sigs_of(upserts).withColumn("op", F.lit("U"))

            def as_delete(ids: DataFrame) -> DataFrame:
                return ids.select(
                    id_col,
                    F.lit(None).cast(ArrayType(LongType())).alias(SIG_COL),
                    F.lit("D").alias("op"),
                )

            # NULL/empty texts keep a row: minhash_signatures gives
            # them the empty-shingle signature, identical to what the
            # batch path computes — the index must mirror it, not
            # editorialize
            deletes = as_delete(feed.filter(F.col("op") == "D"))
            changes = changes.unionByName(deletes)
            mode = "incremental"
            return _commit(
                idx, changes, id_col, head, maintained, mode, batch_id_prefix
            )
        finally:
            feed.unpersist()
    # retention gap: full rebuild, diffed against the stored index so
    # the merge still touches only genuinely-changed rows
    target = sigs_of(src.read(version=head).select(id_col, text_col))
    changes = snapshot_diff(
        idx.read().select(id_col, SIG_COL),
        target,
        [id_col],
        [id_col, SIG_COL],
    )
    return _commit(
        idx, changes, id_col, head, maintained, "rebuild", batch_id_prefix
    )


def _commit(
    idx: LakeTable,
    changes: DataFrame,
    id_col: str,
    head: int,
    maintained: int | None,
    mode: str,
    batch_id_prefix: str,
) -> dict[str, Any]:
    return idx.merge(
        changes.withColumn("lsn", F.lit(head).cast("long")),
        key_cols=[id_col],
        summary={
            "batch_id": f"{batch_id_prefix}-v{head}",
            "maintained_version": head,
            "index_mode": mode,
            "maintained_from": maintained,
        },
    )


def near_dup_pairs_via_index(
    idx: LakeTable,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard_x1000: int = 800,
) -> DataFrame:
    """Verified near-dup pairs with candidates generated from the
    INDEX (no corpus-wide shingling): band-explode the stored
    signatures, bucket self-join, then exact n-gram Jaccard on the
    candidate pairs' texts only. ``docs`` must be the source state the
    index is maintained to (typically ``src.read()``)."""
    from dexspark.functions.dedup import lsh_pairs_from_signatures

    sigs = idx.read().withColumnRenamed(SIG_COL, "minhash")
    cand = lsh_pairs_from_signatures(sigs, id_col, num_hashes, bands)
    verified = ngram_jaccard(docs, cand, text_col, id_col, shingle_n)
    return verified.filter(
        F.col("n_inter") * 1000 >= F.col("n_union") * F.lit(min_jaccard_x1000)
    ).select("id_a", "id_b", "n_inter", "n_union", "jaccard_x1000")


@dataclass
class SigIndexSpec:
    """Streaming subscription wrapper: drop into
    ``CdcStreamReplay(views=[...])`` next to ``AggViewSpec`` and the
    index refreshes after every applied micro-batch (ledger-gated, so
    restarts and replayed batches are no-ops) — the corpus's near-dup
    index trails the table by at most one trigger."""

    idx: LakeTable
    id_col: str = "doc_id"
    text_col: str = "text"
    num_hashes: int = 64
    shingle_n: int = 3
    seed: int = 42
    batch_id_prefix: str = DEFAULT_PREFIX

    def refresh(self, src: LakeTable) -> dict[str, Any] | None:
        return refresh_signature_index(
            src,
            self.idx,
            id_col=self.id_col,
            text_col=self.text_col,
            num_hashes=self.num_hashes,
            shingle_n=self.shingle_n,
            seed=self.seed,
            batch_id_prefix=self.batch_id_prefix,
        )


def ingest_dedup_gate(
    idx: LakeTable,
    corpus_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    min_jaccard_x1000: int = 800,
) -> DataFrame:
    """Which INCOMING docs near-duplicate the EXISTING corpus? The
    training-data ingestion gate: before a batch enters the lake, find
    its near-dups against everything already there — without touching
    corpus texts. Signatures are computed for the batch only
    (O(batch)); the batch's band keys equi-join the INDEX's band keys
    (the corpus side is K/B xxhash64 calls over stored arrays); exact
    Jaccard then verifies candidates against corpus texts for the
    candidate pairs alone.

    ``new_docs`` ids must be disjoint from corpus ids (a re-ingest of
    an existing id is an UPDATE — route it through the merge +
    ``refresh_signature_index`` path instead). Returns
    (id_corpus, id_new, n_inter, n_union, jaccard_x1000); the caller
    drops or quarantines the flagged ``id_new`` rows.

    Signature parameters must match the ones the index was built with
    — a band join between differently-seeded signatures silently finds
    nothing."""
    from dexspark.functions.dedup import band_buckets

    sigs_new = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n, seed
    )
    bb_new = band_buckets(sigs_new, id_col, num_hashes, bands).alias("n")
    bb_idx = band_buckets(
        idx.read().withColumnRenamed(SIG_COL, "minhash"),
        id_col,
        num_hashes,
        bands,
    ).alias("c")
    cand = (
        bb_idx.join(
            bb_new,
            (F.col("c.band") == F.col("n.band"))
            & (F.col("c.bucket") == F.col("n.bucket")),
        )
        .select(
            F.col(f"c.{id_col}").alias("id_corpus"),
            F.col(f"n.{id_col}").alias("id_new"),
        )
        .distinct()
    )
    texts = corpus_docs.select(id_col, text_col).unionByName(
        new_docs.select(id_col, text_col)
    )
    verified = ngram_jaccard(
        texts,
        cand.withColumnRenamed("id_corpus", "id_a").withColumnRenamed(
            "id_new", "id_b"
        ),
        text_col,
        id_col,
        shingle_n,
    )
    return verified.filter(
        F.col("n_inter") * 1000 >= F.col("n_union") * F.lit(min_jaccard_x1000)
    ).select(
        F.col("id_a").alias("id_corpus"),
        F.col("id_b").alias("id_new"),
        "n_inter",
        "n_union",
        "jaccard_x1000",
    )
