"""Post-commit hook (webhook analog, reference app/main.py:879-915) and the
manifest-derived live doc count: payload fields on success / no-op / failure,
callback crashes never fail the run."""

from __future__ import annotations

import pytest

from docling_service_spark.corpus import corpus_df
from docling_service_spark.sparkio.checkpoint import (
    SnapshotStore,
    run_incremental,
    run_upsert,
)


def test_hook_fires_on_commit_and_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    calls = []
    inp = corpus_df(spark, 30, partitions=2)
    run_incremental(spark, inp, root, n_buckets=2, run_id="r1", on_complete=calls.append)
    assert len(calls) == 1
    p = calls[0]
    assert p["status"] == "completed" and p["detail"] is None
    assert p["run_id"] == "r1" and p["snapshot_id"] == 1
    assert p["docs"] == 30 and p["buckets"] == [0, 1]
    assert set(p["timings_ms"]) == {"extract_and_write_ms", "summarize_ms",
                                    "commit_ms", "lineage_ms"}

    run_incremental(spark, inp, root, n_buckets=2, run_id="r2", on_complete=calls.append)
    assert calls[-1]["status"] == "noop" and calls[-1]["snapshot_id"] is None
    run_upsert(spark, inp, root, n_buckets=2, run_id="r3", on_complete=calls.append)
    assert calls[-1]["status"] == "noop"


def test_hook_fires_on_failure_then_reraises(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    os.makedirs(root)
    with open(os.path.join(root, "data"), "w") as f:
        f.write("not a directory")  # the parquet write inside the run fails
    calls = []
    inp = corpus_df(spark, 10, partitions=1)
    with pytest.raises(Exception):
        run_incremental(spark, inp, root, n_buckets=2, run_id="rf",
                        on_complete=calls.append)
    assert len(calls) == 1
    assert calls[0]["status"] == "failed"
    assert calls[0]["detail"]  # "<ExceptionType>: <message>"
    assert calls[0]["run_id"] == "rf" and calls[0]["snapshot_id"] is None


def test_crashing_hook_never_fails_the_run(spark, tmp_path):
    root = str(tmp_path / "t")

    def bad_hook(_):
        raise OSError("webhook endpoint down")

    inp = corpus_df(spark, 20, partitions=2)
    with pytest.warns(UserWarning, match="completion callback failed"):
        summary = run_incremental(spark, inp, root, n_buckets=2, run_id="r1",
                                  on_complete=bad_hook)
    assert summary["snapshot_id"] == 1  # commit landed despite the hook crash


def test_live_doc_count_matches_table(spark, tmp_path):
    root = str(tmp_path / "t")
    inp = corpus_df(spark, 40, partitions=2)
    run_incremental(spark, inp, root, n_buckets=4, run_id="r1")
    store = SnapshotStore(root)
    assert store.live_doc_count() == 40
    assert store.live_doc_count() == store.read_output(spark).count()
    assert SnapshotStore(str(tmp_path / "empty")).live_doc_count() == 0
