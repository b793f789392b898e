"""Streaming ingestion: arrival waves, checkpoint resume, exactly-once."""

from __future__ import annotations

import os

from docling_service_spark.corpus import corpus_df
from docling_service_spark.sparkio.streaming import read_stream_output, stream_extraction


def test_stream_two_waves_exactly_once(spark, tmp_path):
    land = str(tmp_path / "landing")
    out_root = str(tmp_path / "stream_out")

    corpus_df(spark, 40, partitions=2).write.parquet(land, mode="append")
    stream_extraction(spark, land, out_root)
    first = read_stream_output(spark, out_root)
    n1 = first.count()
    assert n1 == 40

    # Wave 2 arrives; availableNow picks up only new files.
    corpus_df(spark, 80, partitions=2).filter("doc_id > 'doc-42-00000039'") \
        .write.parquet(land, mode="append")
    stream_extraction(spark, land, out_root)
    out = read_stream_output(spark, out_root)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == 80
    assert len(set(ids)) == 80  # exactly-once across waves

    # Re-running with nothing new is a no-op.
    stream_extraction(spark, land, out_root)
    assert read_stream_output(spark, out_root).count() == 80

    # Lineage recorded per micro-batch.
    lineage_dir = os.path.join(out_root, "lineage")
    assert len(os.listdir(lineage_dir)) >= 2
