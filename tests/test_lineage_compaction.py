"""Lineage-table compaction (round-8): ``lineage_runs`` grows by one per
commit and never shrinks — at cron cadence that is O(runs) tiny parquet dirs
unioned on every ``read_lineage`` and an O(runs) list rewritten into every
child manifest.  ``compact_lineage`` folds the dirs into ONE under the same
CAS discipline as data compaction; row content (per-run history) must
survive verbatim, and metadata-only data compactions must no longer append
phantom ids to the list."""

from __future__ import annotations

import glob
import os

import pytest

from docling_service_spark.corpus import make_corpus
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio.checkpoint import (
    SnapshotConflictError,
    SnapshotStore,
    compact,
    compact_lineage,
    run_incremental,
    run_merge_upsert,
    vacuum,
)

N_BUCKETS = 8


def _mutate(doc: dict, tag: str) -> dict:
    spans = list(doc["spans"]) + [{
        "kind": "text_block", "text": f"REV-{tag} appended.",
        "media_ref": "1,72,750,400,16,TOPLEFT,text", "offset": len(doc["spans"]),
    }]
    return {"doc_id": doc["doc_id"], "spans": spans}


def _lineage_rows(spark, store: SnapshotStore):
    rows = store.read_lineage(spark).collect()
    return sorted((r.asDict() for r in rows),
                  key=lambda d: (d["run_id"], d["partition_id"]))


def _lineage_dirs(root: str):
    return sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(root, "lineage", "run=*")))


def _fragmented_table(spark, root: str, corpus):
    run_incremental(spark, spark.createDataFrame(corpus, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, num_partitions=2, run_id="base")
    for wave in range(10):
        batch = [_mutate(corpus[(3 * wave + j) % len(corpus)], f"w{wave}")
                 for j in range(3)]
        run_merge_upsert(spark, spark.createDataFrame(batch, INPUT_SCHEMA),
                         root, n_buckets=N_BUCKETS, run_id=f"m{wave}")


def test_compact_lineage_folds_dirs_and_preserves_history(spark, tmp_path):
    root = str(tmp_path / "table")
    corpus = make_corpus(40)
    _fragmented_table(spark, root, corpus)
    store = SnapshotStore(root)
    m = store.current_manifest()
    assert len(m["lineage_runs"]) == 11  # base + 10 merge waves
    assert len(_lineage_dirs(root)) == 11
    before = _lineage_rows(spark, store)
    totals_before = store.lifetime_totals(spark)

    r = compact_lineage(spark, root, max_lineage_runs=4, run_id="lc")
    assert r["runs_before"] == 11 and r["runs_after"] == 1
    m2 = store.current_manifest()
    assert r["snapshot_id"] == m2["snapshot_id"]
    assert m2["lineage_runs"] == ["lc"]

    # Per-run history verbatim: original run_id/snapshot_id columns intact.
    assert _lineage_rows(spark, store) == before
    # Manifest lifetime totals carried forward AND still equal to the
    # lineage sum (the legacy-table fallback reads the consolidated dir).
    assert store.lifetime_totals(spark) == totals_before
    assert dict(zip(store.LIFETIME_KEYS, (
        int(v or 0) for v in store.read_lineage(spark).groupBy()
        .sum("doc_count", "parse_failures", "rejected", "wall_ms")
        .collect()[0]))) == totals_before
    # Data mapping untouched.
    assert m2["buckets"] == m["buckets"]
    assert store.live_doc_count() == 40

    # Idempotent: within budget now.
    r2 = compact_lineage(spark, root, max_lineage_runs=4, run_id="lc2")
    assert r2["snapshot_id"] is None and r2["runs_before"] == 1

    # Superseded dirs stay until retention expires the manifests referencing
    # them; then vacuum reclaims all eleven and the read is unchanged.
    vacuum(root, keep_manifests=1, min_age_hours=0)
    assert _lineage_dirs(root) == ["run=lc"]
    assert _lineage_rows(spark, store) == before


def test_compact_lineage_noop_within_budget_and_empty(spark, tmp_path):
    root = str(tmp_path / "table")
    assert compact_lineage(spark, root, run_id="lc0")["snapshot_id"] is None
    corpus = make_corpus(10)
    run_incremental(spark, spark.createDataFrame(corpus, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, run_id="base")
    r = compact_lineage(spark, root, run_id="lc1")  # default budget 32
    assert r["snapshot_id"] is None and r["runs_before"] == 1
    assert SnapshotStore(root).current_manifest()["lineage_runs"] == ["base"]


def test_data_compact_appends_no_phantom_lineage_id(spark, tmp_path):
    """compact() writes no lineage dir — its commit must carry the parent's
    lineage_runs verbatim instead of appending an id that resolves to
    nothing (the list used to grow by one per maintenance commit)."""
    root = str(tmp_path / "table")
    corpus = make_corpus(40)
    _fragmented_table(spark, root, corpus)
    store = SnapshotStore(root)
    runs = list(store.current_manifest()["lineage_runs"])
    before = _lineage_rows(spark, store)
    totals_before = store.lifetime_totals(spark)

    compact(spark, root, max_live_runs=1, run_id="cpt")
    m = store.current_manifest()
    assert m["lineage_runs"] == runs  # unchanged — no "cpt" phantom
    assert _lineage_rows(spark, store) == before
    assert store.lifetime_totals(spark) == totals_before


def test_replace_lineage_runs_requires_cas(tmp_path):
    store = SnapshotStore(str(tmp_path / "table"))
    with pytest.raises(ValueError, match="replace_lineage_runs requires"):
        store.commit([0], "r1", n_buckets=N_BUCKETS,
                     replace_lineage_runs=["r1"])


def test_compact_lineage_conflicts_when_writer_lands_first(spark, tmp_path):
    """A writer committing inside compact_lineage's read→commit window must
    make it RAISE — replacing lineage_runs against the new parent would
    silently drop the concurrent run's lineage dir from the manifest."""
    root = str(tmp_path / "table")
    corpus = make_corpus(20)
    run_incremental(spark, spark.createDataFrame(corpus, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, run_id="base")
    run_merge_upsert(spark, spark.createDataFrame([_mutate(corpus[1], "a")],
                                                  INPUT_SCHEMA),
                     root, n_buckets=N_BUCKETS, run_id="m1")
    store = SnapshotStore(root)
    planned = store.current_manifest()["snapshot_id"]

    real_commit = SnapshotStore.commit
    raced = {"done": False}

    def racing_commit(self, *a, **kw):
        if (not raced["done"]
                and kw.get("expected_parent_snapshot_id") == planned):
            raced["done"] = True
            run_merge_upsert(spark, spark.createDataFrame(
                [_mutate(corpus[2], "b")], INPUT_SCHEMA),
                root, n_buckets=N_BUCKETS, run_id="m2")
        return real_commit(self, *a, **kw)

    SnapshotStore.commit = racing_commit
    try:
        with pytest.raises(SnapshotConflictError, match="planned against snapshot"):
            compact_lineage(spark, root, max_lineage_runs=1, run_id="lc")
    finally:
        SnapshotStore.commit = real_commit
    # Nothing lost: the concurrent run's lineage is referenced and readable;
    # the failed consolidation dir is an unreferenced, vacuumable orphan.
    m = store.current_manifest()
    assert "m2" in m["lineage_runs"] and "lc" not in m["lineage_runs"]
    assert os.path.isdir(os.path.join(root, "lineage", "run=lc"))
    rows = _lineage_rows(spark, store)
    assert {r["run_id"] for r in rows} == {"base", "m1", "m2"}
    # A fresh consolidation against the new snapshot succeeds.
    r = compact_lineage(spark, root, max_lineage_runs=1, run_id="lc2")
    assert r["snapshot_id"] is not None
    assert store.current_manifest()["lineage_runs"] == ["lc2"]
    assert _lineage_rows(spark, store) == rows
