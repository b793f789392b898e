"""Content-hash media dedup + upload (SURVEY.md §2 A8/A20).

The reference dedups per-image at upload time (``object_exists`` then
``upload_bytes``, app/main.py:717-729) and has an offline migration that
dedups a whole bucket (``scripts/r2_migrate_xxhash.py``).  The batch engine
form: one columnar pass collects every kept image's content key, a
``dropDuplicates`` on the content hash makes upload exactly-once *per
content*, and a ``foreachPartition`` sink writes only blobs the store does
not already have — first-writer-wins, idempotent on re-run.

Scale shape: the only shuffle is on ``content_hash`` (uniform by
construction); upload parallelism is partition-level with per-key existence
checks, exactly like the reference but distributed.

In-sandbox the media "bytes" are the synthetic content keys (the corpus
encodes payloads as strings); a real deployment swaps ``payload_col`` for
the decoded blob column.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..hashing import media_key


def distinct_media(corpus_df: DataFrame) -> DataFrame:
    """All kept-image content payloads in the corpus, one row per distinct
    content hash (the upload work-list).

    Columnar only: explode → filter kind → parse the content key (9th field
    of the image media_ref, which may itself contain commas → split with a
    field cap, then slice).
    """
    spans = corpus_df.select(F.explode("spans").alias("s"))
    imgs = spans.filter(F.col("s.kind") == "image").select(F.col("s.media_ref").alias("ref"))
    # content key = everything after the 8th comma
    parts = F.split(F.col("ref"), ",", 9)
    payload = F.element_at(parts, 9)
    return (
        imgs.select(payload.alias("content_key"))
        .filter(F.col("content_key").isNotNull())
        .dropDuplicates(["content_key"])
        .select(
            "content_key",
            F.encode("content_key", "utf-8").alias("payload"),
        )
    )


def upload_media(corpus_df: DataFrame, base_path: Optional[str]) -> int:
    """Upload every distinct media blob; returns the distinct count.

    ``foreachPartition`` keeps the store client per-partition (reference
    builds one backend per request; we build one per task)."""
    work = distinct_media(corpus_df)

    def sink(rows) -> None:
        from ..storage import make_store

        store = make_store(base_path)
        for row in rows:
            payload = bytes(row["payload"])
            key = media_key(payload)
            if not store.exists(key):  # dedup-skip, app/main.py:721-725
                store.put_bytes(key, payload)

    work.foreachPartition(sink)
    return work.count()


def media_dedup_stats(corpus_df: DataFrame) -> DataFrame:
    """Dedup ratio report (migration `stats` analog, r2_migrate:173-179)."""
    spans = corpus_df.select(F.explode("spans").alias("s"))
    imgs = spans.filter(F.col("s.kind") == "image").select(
        F.element_at(F.split(F.col("s.media_ref"), ",", 9), 9).alias("content_key")
    )
    return imgs.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_images"),
        F.countDistinct("content_key").cast("bigint").alias("distinct_blobs"),
    )
