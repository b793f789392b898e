"""Bucket-pruned point lookups on the snapshot store: a k-doc read must
touch only the run dirs owning those docs' buckets (metadata pruning), with
doc_id/_bucket filters pushed into the parquet scan."""

from __future__ import annotations

from docling_service_spark.corpus import corpus_df
from docling_service_spark.sparkio.checkpoint import SnapshotStore, run_incremental


def _setup(spark, tmp_path, n_docs=60, n_buckets=8):
    root = str(tmp_path / "t")
    # Two runs so bucket->run pruning has something to prune between.
    inp = corpus_df(spark, n_docs, partitions=2)
    run_incremental(spark, inp, root, n_buckets=n_buckets, max_buckets_per_run=4,
                    num_partitions=2, run_id="r1")
    run_incremental(spark, inp, root, n_buckets=n_buckets, num_partitions=2, run_id="r2")
    return SnapshotStore(root)


def test_point_lookup_returns_exact_docs(spark, tmp_path):
    store = _setup(spark, tmp_path)
    want = ["doc-42-00000003", "doc-42-00000017", "doc-42-00000042"]
    got = store.read_docs(spark, want).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(want)
    assert store.read_docs(spark, ["doc-42-99999999"]).count() == 0
    assert store.read_docs(spark, []).count() == 0


def test_point_lookup_prunes_to_owning_runs(spark, tmp_path):
    store = _setup(spark, tmp_path)
    target = "doc-42-00000007"
    df = store.read_docs(spark, [target], instrumented=True)
    row = df.collect()[0]
    owning_run = store.committed_buckets()[str(row["_bucket"])]
    files = df.inputFiles()
    assert files, "expected a non-empty file scan"
    assert all(f"run={owning_run}" in f for f in files), files
    # The full table spans two runs; the lookup must not list the other one.
    all_runs = set(store.committed_buckets().values())
    assert len(all_runs) == 2
    other = (all_runs - {owning_run}).pop()
    assert not any(f"run={other}" in f for f in files)


def test_point_lookup_on_empty_store(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "empty"))
    assert store.read_docs(spark, ["doc-42-00000001"]).count() == 0
