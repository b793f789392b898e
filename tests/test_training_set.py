"""End-to-end training-set derivation over REAL extraction output:
body-strip → quality gate → exact dedup (first-writer-wins) → overlapping
token chunks.  The composition the task brief's training-data ops exist for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_service_spark.corpus import corpus_df, make_corpus
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio.pipeline import run_extraction, strip_instrumentation
from docling_service_spark.training import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    META_SENTINEL,
    build_training_set,
    exact_dedup,
    extracted_body,
    training_set_report,
)

N_DOCS = 48


def _extract(spark, docs_df):
    return strip_instrumentation(run_extraction(docs_df))


def test_funnel_and_chunk_invariants(spark):
    out = _extract(spark, corpus_df(spark, N_DOCS, partitions=2)).persist()
    report = training_set_report(out)
    assert report["completed_docs"] > 0
    assert report["completed_docs"] >= report["passed_quality"] >= report["after_dedup"]
    assert report["chunks"] >= report["after_dedup"]  # every kept doc chunks

    chunks = build_training_set(out).persist()
    rows = chunks.collect()
    assert len(rows) == report["chunks"]
    # Window/stride invariants: every chunk ≤ W tokens; only a doc's LAST
    # chunk may be short; chunk ids are dense per doc.
    by_doc: dict = {}
    for r in rows:
        assert 1 <= r["chunk_tokens"] <= CHUNK_TOKENS
        assert len([t for t in r["chunk_text"].split(" ") if t]) == r["chunk_tokens"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in doc_rows] == list(range(len(doc_rows)))
        for r in doc_rows[:-1]:
            assert r["chunk_tokens"] == CHUNK_TOKENS
    # No metadata block may leak into any training sample.
    assert chunks.filter(F.col("chunk_text").contains("DOCLING_METADATA")).count() == 0
    # Overlap: consecutive chunks share W - S tokens.
    multi = next((v for v in by_doc.values() if len(v) >= 2), None)
    if multi is not None:
        a = multi[0]["chunk_text"].split(" ")
        b = multi[1]["chunk_text"].split(" ")
        assert a[CHUNK_STRIDE:] == b[: CHUNK_TOKENS - CHUNK_STRIDE]
    chunks.unpersist()
    out.unpersist()


def test_exact_dedup_keeps_min_doc_id(spark):
    # Two byte-identical docs under different ids → one survivor, the MIN id.
    base = make_corpus(6)
    dup = dict(base[1], doc_id="zzz-duplicate")  # same spans, later id
    docs = spark.createDataFrame(base + [dup], INPUT_SCHEMA)
    out = _extract(spark, docs)
    body = extracted_body(out)
    kept = {r["doc_id"] for r in exact_dedup(body).collect()}
    assert base[1]["doc_id"] in kept
    assert "zzz-duplicate" not in kept
    # Everything else survives (no false dedup).
    assert len(kept) == body.count() - 1


def test_quality_gate_no_int_overflow_on_huge_body(spark):
    # int32 `alpha * 10000` overflows at ~214k alpha chars — found by the
    # sf0.1 funnel bench on oversized docs; the multiply must widen first.
    from docling_service_spark.training import quality_gate

    big = spark.createDataFrame([("d0", "abcdefgh  " * 40_000)], "doc_id string, body string")
    rows = quality_gate(big).collect()  # 400k chars, 80% alpha → passes
    assert [r["doc_id"] for r in rows] == ["d0"]


def test_q21_no_int_overflow_on_huge_text(spark, tmp_path):
    from docling_service_spark.queries.text_ops import q21_quality_score

    big = spark.createDataFrame([(0, "abcdefgh  " * 40_000, "en")],
                                "doc_id bigint, text string, lang string")
    big.write.parquet(str(tmp_path / "documents.parquet"))
    row = q21_quality_score(spark, str(tmp_path)).collect()[0]
    assert row["alpha_bp"] == 8000 and row["passes_quality"]


def test_body_split_anchors_on_last_sentinel(spark):
    # A body whose own text contains the metadata sentinel must not truncate
    # early: the block is appended at the END, so split on the LAST occurrence.
    out = spark.createDataFrame(
        [("d0", f"before{META_SENTINEL}middle{META_SENTINEL}tail-metadata", "completed"),
         ("d1", "no sentinel at all", "completed")],
        "doc_id string, markdown string, status string",
    )
    got = {r["doc_id"]: r["body"] for r in extracted_body(out).collect()}
    assert got["d0"] == f"before{META_SENTINEL}middle"
    assert got["d1"] == "no sentinel at all"


def test_failed_docs_never_reach_training(spark):
    out = _extract(spark, corpus_df(spark, 250, partitions=2))  # includes idx 211 (malformed)
    assert out.filter(F.col("status") != "completed").count() > 0
    body = extracted_body(out)
    assert body.count() == out.filter(F.col("status") == "completed").count()
    assert META_SENTINEL.strip() not in body.select("body").first()["body"]
