"""Structured Streaming ingestion of arriving span documents.

The reference is request/response (no streaming; SURVEY.md §2 Part B), but a
landing-zone ingest is the natural continuous form of the batch job: new
parquet files of (doc_id, spans) appear under a directory, each micro-batch
runs the SAME extraction dataflow, and Spark's streaming checkpoint provides
the resume cursor (the batch engine's manifest covers reprocessing; the
stream covers arrival).

Exactly-once: ``foreachBatch`` writes each micro-batch to its own
``data/batch={id}`` dir with overwrite — a retried batch rewrites the same
dir, so duplicates are impossible even though the file sink itself is
at-least-once.  Lineage rows append per micro-batch, tagged with the batch id.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

from .batch import INSTRUMENTED_DDL
from .pipeline import derive_lineage, run_extraction

INPUT_DDL = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def stream_extraction(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    *,
    max_files_per_trigger: Optional[int] = None,
    await_termination: bool = True,
):
    """Run the extraction dataflow over a file-source stream.

    Uses ``availableNow`` (process everything present, then stop) so the same
    call serves both tests and cron-style incremental ingestion; a continuous
    deployment drops ``availableNow`` for ``processingTime``.
    """
    reader = spark.readStream.schema(INPUT_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    out = run_extraction(stream)

    def sink(batch_df, batch_id: int) -> None:
        data_dir = os.path.join(output_root, "data", f"batch={batch_id}")
        batch_df.write.parquet(data_dir, mode="overwrite")  # idempotent on retry
        written = batch_df.sparkSession.read.schema(INSTRUMENTED_DDL).parquet(data_dir)
        lineage = derive_lineage(written, run_id=f"batch-{batch_id}", snapshot_id=batch_id)
        lineage.write.parquet(
            os.path.join(output_root, "lineage", f"batch={batch_id}"), mode="overwrite"
        )

    query = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_root, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def read_stream_output(spark: SparkSession, output_root: str):
    from .pipeline import strip_instrumentation

    data = os.path.join(output_root, "data")
    if not os.path.exists(data):
        return strip_instrumentation(spark.createDataFrame([], INSTRUMENTED_DDL))
    return strip_instrumentation(spark.read.schema(INSTRUMENTED_DDL).parquet(data + "/batch=*"))
