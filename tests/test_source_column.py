"""Ingestion-source metadata (reference ConversionSource, app/main.py:44-51 +
1091-1105): the optional `source` input column flows through the Arrow kernel
and stamps source_filename in the metadata block — upload docs by original
filename, url docs by NULL (the reference stores source.original_name, which
url-kind never sets: app/main.py:323, 1100-1105); absent column keeps output
byte-identical."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import fixture_docs as FX
from docling_service_spark.corpus import corpus_df, source_meta
from docling_service_spark.engine.extract import extract_document
from docling_service_spark.sparkio.pipeline import run_extraction, strip_instrumentation


def _meta(markdown: str) -> dict:
    block = markdown.split("```json\n", 1)[1].split("\n```", 1)[0]
    return json.loads(block)


def test_source_filename_upload_and_url():
    up = extract_document("d1", FX.DOC_WORKBOOK["spans"],
                          {"kind": "upload", "value": "tmp/abc.xlsx",
                           "original_name": "books.xlsx"})
    assert _meta(up["markdown"])["metadata"]["source_filename"] == "books.xlsx"
    url = extract_document("d2", FX.DOC_WORKBOOK["spans"],
                           {"kind": "url", "value": "https://x/a.pdf", "original_name": None})
    assert _meta(url["markdown"])["metadata"]["source_filename"] is None


def test_absent_source_is_byte_identical():
    with_none = extract_document("d", FX.DOC_REPORT["spans"], None)
    default = extract_document("d", FX.DOC_REPORT["spans"])
    assert with_none["markdown"] == default["markdown"]
    assert _meta(default["markdown"])["metadata"]["source_filename"] == "d"


def test_source_flows_through_spark_kernel(spark):
    df = corpus_df(spark, 12, partitions=2, include_source=True)
    assert "source" in df.columns
    out = strip_instrumentation(run_extraction(df))
    rows = out.filter(F.col("status") == "completed") \
              .select("doc_id", "markdown").collect()
    assert rows
    by_id = {r["doc_id"]: _meta(r["markdown"])["metadata"]["source_filename"] for r in rows}
    saw_upload = saw_url = False
    for doc_id, fname in by_id.items():
        idx = int(doc_id.rsplit("-", 1)[1])
        src = source_meta(idx, doc_id)
        assert fname == src["original_name"]  # None for url-kind
        if src["kind"] == "upload":
            saw_upload = True
            assert fname is not None
        else:
            saw_url = True
            assert fname is None
    assert saw_upload and saw_url
