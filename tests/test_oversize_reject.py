"""Oversized-document reject (reference 25 MiB upload cap, app/config.py:14 +
app/main.py:1083-1087): docs over the cap route to status='rejected' without
running the extractor, and rejects are counted per-partition in lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_service_spark.corpus import corpus_df
from docling_service_spark.sparkio.batch import MAX_DOC_BYTES
from docling_service_spark.sparkio.checkpoint import SnapshotStore, run_incremental
from docling_service_spark.sparkio.pipeline import run_extraction


def test_default_cap_is_reference_25mib():
    assert MAX_DOC_BYTES == 25 * 1024 * 1024


def test_reject_routing_and_detail(spark):
    df = corpus_df(spark, 60, partitions=2)
    # Cap low enough to catch the big docs, high enough to keep small ones.
    out = run_extraction(df, max_doc_bytes=20_000).cache()
    by_status = {r["status"]: r["n"] for r in
                 out.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_status.get("rejected", 0) > 0
    assert by_status.get("completed", 0) > 0
    rej = out.filter(F.col("status") == "rejected").first()
    assert "document too large" in rej["detail"] and "20000 byte cap" in rej["detail"]
    assert rej["spans"] is None and rej["markdown"] is None
    # _bytes is still recorded for rejected rows (lineage byte totals stay true).
    assert rej["_bytes"] > 20_000
    out.unpersist()


def test_rejects_counted_in_lineage(spark, tmp_path):
    root = str(tmp_path / "t")
    df = corpus_df(spark, 60, partitions=2)
    summary = run_incremental(spark, df, root, n_buckets=2, run_id="r1",
                              max_doc_bytes=20_000)
    assert summary["docs"] == 60  # rejected rows are still rows in the table
    lineage = SnapshotStore(root).read_lineage(spark)
    totals = lineage.groupBy().sum("rejected", "parse_failures", "doc_count").collect()[0]
    assert int(totals[0]) > 0
    assert int(totals[2]) == 60


def test_no_cap_means_no_rejects(spark):
    df = corpus_df(spark, 40, partitions=2)
    n = run_extraction(df).filter(F.col("status") == "rejected").count()
    assert n == 0
