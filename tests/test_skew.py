"""Skew handling: the opt-in salted repartition spreads a pathologically
clustered input across tasks, and output is identical either way."""

from __future__ import annotations

from docling_service_spark.corpus import corpus_df
from docling_service_spark.sparkio.pipeline import derive_lineage, run_extraction, strip_instrumentation

N = 150


def _pids(spark, df, **kwargs):
    out = run_extraction(df, **kwargs)
    lineage = derive_lineage(out, run_id="t", snapshot_id=1)
    return {r["partition_id"]: r["doc_count"] for r in lineage.collect()}


def test_salted_repartition_defuses_clustered_input(spark):
    # Pathological layout: the whole corpus in ONE partition (e.g. a table
    # clustered by an unlucky key, or one giant unsplittable file).
    clustered = corpus_df(spark, N, partitions=4).coalesce(1)

    direct = _pids(spark, clustered)
    assert len(direct) == 1  # without the salt, one task does everything

    salted = _pids(spark, clustered, num_partitions=8)
    assert len(salted) == 8
    counts = list(salted.values())
    assert sum(counts) == N
    assert max(counts) <= 3 * (N / 8)  # uniform-ish spread

    # And the extracted content is identical either way (determinism).
    a = sorted(
        (r["doc_id"], [tuple(s) for s in (r["spans"] or [])])
        for r in strip_instrumentation(run_extraction(clustered)).collect()
    )
    b = sorted(
        (r["doc_id"], [tuple(s) for s in (r["spans"] or [])])
        for r in strip_instrumentation(run_extraction(clustered, num_partitions=8)).collect()
    )
    assert a == b


def test_oversized_doc_tail_is_isolated(spark):
    # idx 97 is the 40x-oversized doc; it must extract fine inside a batch
    # alongside normal docs and not poison neighbors.
    df = corpus_df(spark, 100, partitions=2)  # includes idx 97
    out = strip_instrumentation(run_extraction(df))
    rows = {r["doc_id"]: r for r in out.collect()}
    big = rows["doc-42-00000097"]
    assert big["status"] == "completed"
    assert len(big["pages"]) >= 40  # the oversized tail really is oversized
    assert all(r["status"] in ("completed", "failed") for r in rows.values())
