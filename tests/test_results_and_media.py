"""Result projections (A16), storage sink (A19), media dedup upload (A8/A20)."""

from __future__ import annotations

import os

import fixture_docs as FX
from docling_service_spark import results
from docling_service_spark.corpus import corpus_df
from docling_service_spark.hashing import media_key, xxh64_hexdigest
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio.media_sink import distinct_media, media_dedup_stats, upload_media
from docling_service_spark.sparkio.pipeline import run_extraction, strip_instrumentation
from docling_service_spark.storage import LocalMediaStore, NullMediaStore


def _out(spark):
    docs = [FX.DOC_REPORT, FX.DOC_FILTERED, FX.DOC_MALFORMED]
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    return strip_instrumentation(run_extraction(df)).cache()


def test_enhanced_result_norm_stripping(spark):
    out = _out(spark)
    full = results.enhanced_result(out, include_normalized=True)
    row = {r["doc_id"]: r for r in full.collect()}["fixture-report"]
    img = row["images"][0].asDict()
    assert "x_norm" in img and img["x_norm"] is not None

    stripped = results.enhanced_result(out, include_normalized=False)
    row = {r["doc_id"]: r for r in stripped.collect()}["fixture-report"]
    img = row["images"][0].asDict()
    assert "x_norm" not in img
    assert img["content_hash"] == xxh64_hexdigest(b"grid-image-1")
    assert row["metadata"]["total_pages"] == 2
    assert row["metadata"]["total_tables"] == 3


def test_markdown_projections_exclude_failed(spark):
    out = _out(spark)
    assert results.markdown_only(out).count() == 2  # malformed excluded
    names = {r["filename"] for r in results.markdown_json(out).collect()}
    assert names == {"fixture-report.md", "fixture-filtered.md"}


def test_status_rollup_and_failed(spark):
    out = _out(spark)
    roll = {r["status"]: r["n_docs"] for r in results.status_rollup(out).collect()}
    assert roll == {"completed": 2, "failed": 1}
    fails = results.failed_docs(out).collect()
    assert len(fails) == 1 and "MediaRefError" in fails[0]["detail"]


def test_local_media_store(tmp_path):
    store = LocalMediaStore(str(tmp_path))
    key = media_key(b"payload")
    assert not store.exists(key)
    store.put_bytes(key, b"payload")
    assert store.exists(key)
    with open(store.url_for(key), "rb") as f:
        assert f.read() == b"payload"
    # Content-addressed: rewriting the same key is a no-op semantically.
    store.put_bytes(key, b"payload")
    assert store.exists(key)


def test_distinct_media_and_upload(spark, tmp_path):
    docs = [FX.DOC_DEDUP_A, FX.DOC_DEDUP_B, FX.DOC_REPORT]
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    stats = media_dedup_stats(df).collect()[0]
    # dedup-a + dedup-b share one blob; report has one more (+ filtered-none)
    assert stats["total_images"] == 3
    assert stats["distinct_blobs"] == 2

    work = {r["content_key"] for r in distinct_media(df).collect()}
    assert work == {"shared-logo-bytes", "grid-image-1"}

    base = str(tmp_path / "media")
    n = upload_media(df, base)
    assert n == 2
    for key_src in [b"shared-logo-bytes", b"grid-image-1"]:
        path = os.path.join(base, media_key(key_src))
        assert os.path.exists(path)
        with open(path, "rb") as f:
            assert f.read() == key_src
    # Idempotent re-run: exists() short-circuits, same result.
    assert upload_media(df, base) == 2


def test_upload_media_null_store(spark):
    df = corpus_df(spark, 30, partitions=2)
    n = upload_media(df, None)  # compute-only mode
    assert n >= 0


def test_storage_status_echo(tmp_path):
    from docling_service_spark.storage import LocalMediaStore, NullMediaStore, storage_status

    s = storage_status(LocalMediaStore(str(tmp_path)))
    assert s == {"backend": "LocalMediaStore", "cloud_enabled": False,
                 "materializes": True, "base_path": str(tmp_path),
                 "bucket": None, "public_url_base": None}
    s = storage_status(NullMediaStore())
    assert s["materializes"] is False and s["base_path"] is None


def test_upload_media_kept_only(spark, tmp_path):
    import os

    docs = [FX.DOC_FILTERED]
    df = spark.createDataFrame(docs, INPUT_SCHEMA)
    out = strip_instrumentation(run_extraction(df))
    base = str(tmp_path / "kept")
    n = upload_media(df, base, output_df=out)
    # Only the 3 surviving images upload; the 5 filtered ones never do.
    assert n == 3
    uploaded = {f for _, _, fs in os.walk(base) for f in fs}
    assert uploaded == {media_key(k.encode()).split("/")[-1] for k in FX.KEPT_IMAGE_KEYS}
    # Superset mode (no output) uploads all 8 candidates.
    assert upload_media(df, str(tmp_path / "all")) == 8
