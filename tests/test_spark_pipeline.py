"""Spark-shell tests: vectorized extraction, repartition invariance, lineage."""

from __future__ import annotations

import fixture_docs as FX
from docling_service_spark.corpus import corpus_df, make_corpus
from docling_service_spark.engine.extract import extract_document
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio.pipeline import (
    derive_lineage,
    run_extraction,
    strip_instrumentation,
)

N_DOCS = 120


def _key(row):
    return row["doc_id"]


def _canon(df):
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return sorted(rows, key=_key)


def test_spark_matches_pure_engine_on_fixtures(spark):
    docs = [fx for fx in FX.ALL_FIXTURES if fx["doc_id"] != "fixture-malformed"]
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    out = strip_instrumentation(run_extraction(df, num_partitions=4))
    got = {r["doc_id"]: r for r in _canon(out)}
    for fx in docs:
        expected = extract_document(fx["doc_id"], fx["spans"])
        g = got[fx["doc_id"]]
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected["spans"]
        ]
        assert g["markdown"] == expected["markdown"]
        assert g["status"] == "completed"


def test_failed_rows_isolated(spark):
    docs = [FX.DOC_REPORT, FX.DOC_MALFORMED]
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    rows = {r["doc_id"]: r for r in _canon(strip_instrumentation(run_extraction(df, num_partitions=2)))}
    assert rows["fixture-report"]["status"] == "completed"
    bad = rows["fixture-malformed"]
    assert bad["status"] == "failed"
    assert "MediaRefError" in bad["detail"]
    assert bad["spans"] is None and bad["markdown"] is None


def test_repartition_invariance(spark):
    """North-rule determinism: identical sorted output at any parallelism."""
    docs = make_corpus(N_DOCS)
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    out_small = _canon(strip_instrumentation(run_extraction(df, num_partitions=2)))
    out_large = _canon(strip_instrumentation(run_extraction(df, num_partitions=16)))
    assert out_small == out_large


def test_distributed_corpus_equals_driver_corpus(spark):
    dist = corpus_df(spark, N_DOCS, partitions=6).collect()
    local = make_corpus(N_DOCS)
    dist_map = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in dist}
    local_map = {d["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]]
                 for d in local}
    assert dist_map == local_map


def test_lineage_accounts_for_every_doc(spark):
    df = corpus_df(spark, N_DOCS, partitions=4)
    out = run_extraction(df, num_partitions=8).cache()
    try:
        lineage = derive_lineage(out, run_id="t", snapshot_id=1)
        rows = lineage.collect()
        assert sum(r["doc_count"] for r in rows) == N_DOCS
        assert sum(r["parse_failures"] for r in rows) == out.filter("status = 'failed'").count()
        assert all(r["bytes"] > 0 for r in rows)
        assert all(r["run_id"] == "t" and r["snapshot_id"] == 1 for r in rows)
        # Skew sanity on the salted partitioning: no partition hogs the corpus.
        counts = [r["doc_count"] for r in rows]
        assert len(counts) > 1
        assert max(counts) <= 4 * (N_DOCS / 8)
    finally:
        out.unpersist()


def test_corpus_contains_failure_and_both_families(spark):
    out = strip_instrumentation(run_extraction(corpus_df(spark, 300, partitions=4), num_partitions=8))
    agg = {r["status"]: r["cnt"] for r in out.groupBy("status").count().withColumnRenamed("count", "cnt").collect()}
    assert agg.get("failed", 0) >= 1          # malformed docs exist (idx 211)
    assert agg["completed"] >= 295
