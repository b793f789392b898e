"""Manifest ``lifetime_stats``: whole-table work totals accumulate at commit
time from the extraction write's observe metrics — merge runs book only their
real work via the carried-flag conditional — so run reporting reads O(manifest)
and launches ZERO Spark jobs, on every path (fresh, incremental, merge),
instead of aggregating the lineage table per run (r6 verdict next-round #5)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from docling_service_spark.corpus import corpus_df, make_corpus
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio import checkpoint as cp
from docling_service_spark.sparkio.checkpoint import (
    SnapshotStore,
    compact,
    run_incremental,
    run_merge_upsert,
    run_upsert,
)

N_DOCS = 60
N_BUCKETS = 8


def _lineage_totals(spark, store) -> dict:
    row = (store.read_lineage(spark).groupBy()
           .sum("doc_count", "parse_failures", "rejected", "wall_ms")
           .collect()[0])
    return {k: int(v or 0) for k, v in zip(store.LIFETIME_KEYS, row)}


def _strip_lifetime(store) -> None:
    """Rewrite the CURRENT manifest without lifetime_stats (a table whose
    last commit predates the feature)."""
    name = open(os.path.join(store.manifest_dir, "CURRENT")).read().strip()
    path = os.path.join(store.manifest_dir, name)
    m = json.load(open(path))
    m.pop("lifetime_stats", None)
    with open(path, "w") as f:
        json.dump(m, f)


def test_lifetime_stats_match_lineage_across_incremental_runs(spark, tmp_path):
    root = str(tmp_path / "table")
    inp = corpus_df(spark, N_DOCS, partitions=4)
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    max_buckets_per_run=3, num_partitions=4, run_id="a")
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    num_partitions=4, run_id="b")
    store = SnapshotStore(root)
    ls = store.current_manifest()["lifetime_stats"]
    assert ls == _lineage_totals(spark, store)
    assert ls["docs"] == N_DOCS and ls["wall_ms"] > 0


def test_merge_books_only_changed_docs_and_stays_lineage_equal(spark, tmp_path):
    root = str(tmp_path / "table")
    docs = make_corpus(N_DOCS)
    run_incremental(spark, spark.createDataFrame(docs, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, num_partitions=2, run_id="base")

    changed = [{"doc_id": d["doc_id"],
                "spans": list(d["spans"]) + [{
                    "kind": "text_block", "text": "REV2.",
                    "media_ref": "1,72,750,400,16,TOPLEFT,text",
                    "offset": len(d["spans"])}]}
               for d in docs[:3]]
    fresh = [{"doc_id": f"new-{i:04d}",
              "spans": [{"kind": "text_block", "text": f"brand new {i}",
                         "media_ref": "1,72,100,400,16,TOPLEFT,text",
                         "offset": 0}]}
             for i in range(2)]
    batch = spark.createDataFrame(changed + fresh, INPUT_SCHEMA)
    s = run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS,
                         num_partitions=2, run_id="merge1")

    # The merged buckets materialize kept + changed rows, but run_stats (and
    # therefore the lifetime delta) counts only this batch's real work.
    assert s["docs_changed"] == 5
    assert s["run_stats"]["docs"] == 5
    assert s["docs"] > 5  # carried siblings were rewritten into the run dir

    store = SnapshotStore(root)
    ls = store.current_manifest()["lifetime_stats"]
    assert ls == _lineage_totals(spark, store)  # carried rows never re-booked
    assert ls["docs"] == N_DOCS + 5


def test_lifetime_totals_launch_no_spark_jobs(spark, tmp_path):
    root = str(tmp_path / "table")
    docs = make_corpus(N_DOCS)
    run_incremental(spark, spark.createDataFrame(docs, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, num_partitions=2, run_id="base")
    batch = spark.createDataFrame(
        [{"doc_id": docs[0]["doc_id"],
          "spans": [{"kind": "text_block", "text": "rewritten",
                     "media_ref": "1,72,100,400,16,TOPLEFT,text",
                     "offset": 0}]}], INPUT_SCHEMA)
    run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS,
                     num_partitions=2, run_id="merge1")

    store = SnapshotStore(root)
    sc = spark.sparkContext
    sc.setJobGroup("lifetime-stats-probe", "must stay empty")
    try:
        totals = store.lifetime_totals(spark)
    finally:
        sc.setJobGroup("lifetime-stats-after", "")
    assert totals["docs"] == N_DOCS + 1
    # The old report path ran a lineage aggregate job here on merge-bearing
    # tables; the manifest path must read metadata only.
    assert list(sc.statusTracker().getJobIdsForGroup("lifetime-stats-probe")) == []


def test_legacy_manifest_falls_back_and_never_restarts_midstream(spark, tmp_path):
    root = str(tmp_path / "table")
    inp = corpus_df(spark, N_DOCS, partitions=4)
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    num_partitions=4, run_id="a")
    store = SnapshotStore(root)
    _strip_lifetime(store)

    # Fallback: one lineage aggregate, same numbers.
    assert store.lifetime_totals(spark) == _lineage_totals(spark, store)

    # A further commit onto a stripped parent must NOT restart accumulation
    # from zero — prior work is unknown, so the field stays absent.
    batch = spark.createDataFrame(
        [{"doc_id": "new-9999",
          "spans": [{"kind": "text_block", "text": "late arrival",
                     "media_ref": "1,72,100,400,16,TOPLEFT,text",
                     "offset": 0}]}], INPUT_SCHEMA)
    run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS,
                     num_partitions=2, run_id="late")
    assert "lifetime_stats" not in store.current_manifest()
    assert store.lifetime_totals(spark)["docs"] == N_DOCS + 1


def test_stats_acc_disabled_falls_back_to_summary_scan(spark, tmp_path, monkeypatch):
    """With the in-write run-stats accumulator disabled (the same degrade
    the observe cross-check applies on any mismatch), bucket summaries and
    lineage must come out identical via the fused post-write scan, and
    no-op upsert detection must keep working from them."""
    monkeypatch.setattr(cp, "_USE_STATS_ACC", False)
    root = str(tmp_path / "table")
    inp = corpus_df(spark, N_DOCS, partitions=4)
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    num_partitions=4, run_id="a")
    store = SnapshotStore(root)
    m = store.current_manifest()
    assert sorted(m["bucket_sums"]) == [str(b) for b in sorted(range(N_BUCKETS))]
    exact = cp._bucket_summaries(
        store.read_output(spark, instrumented=True)
        .select("_bucket", "_input_hash"))
    assert m["bucket_sums"] == exact
    # Run-stat metrics still rode the observation.
    assert m["lifetime_stats"]["docs"] == N_DOCS
    # Summary-based no-op detection unaffected by the fallback path.
    r = run_upsert(spark, inp, root, n_buckets=N_BUCKETS, run_id="noop")
    assert r["snapshot_id"] is None and r["buckets"] == []


def test_stats_acc_matches_scan_bit_for_bit(spark, tmp_path, monkeypatch):
    """The kernel-side accumulator (primary) and the fused post-write scan
    (fallback) must produce IDENTICAL bucket fingerprints and lineage rows —
    the decimal hash sums included (the accumulator reimplements Spark's
    xxhash64-of-long + decimal(38,0) sums in numpy/python).  wall_ms is the
    one kernel-MEASURED field, so it cannot be bit-identical across the two
    physical runs this test needs — it is compared for presence only here;
    within a single run the observe cross-check in _process_and_commit
    already pins acc-wall == column-wall exactly (a mismatch would have
    forced the scan path and tripped the RuntimeWarning)."""
    inp = corpus_df(spark, N_DOCS, partitions=4)

    def run(root, use_acc):
        monkeypatch.setattr(cp, "_USE_STATS_ACC", use_acc)
        run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                        num_partitions=4, run_id="r")
        store = SnapshotStore(root)
        lin = sorted(
            (r["partition_id"], r["doc_count"], r["bytes"],
             r["parse_failures"], r["rejected"], r["wall_ms"] >= 0)
            for r in store.read_lineage(spark).collect())
        return store.current_manifest(), lin

    m_acc, lin_acc = run(str(tmp_path / "acc"), True)
    m_scan, lin_scan = run(str(tmp_path / "scan"), False)
    assert m_acc["bucket_sums"] == m_scan["bucket_sums"]
    lt_acc, lt_scan = m_acc["lifetime_stats"], m_scan["lifetime_stats"]
    assert {k: v for k, v in lt_acc.items() if k != "wall_ms"} \
        == {k: v for k, v in lt_scan.items() if k != "wall_ms"}
    assert lt_acc["wall_ms"] > 0 and lt_scan["wall_ms"] > 0
    assert lin_acc == lin_scan and len(lin_acc) > 0


def test_bucket_wholesale_upsert_rebooks_reprocessed_work(spark, tmp_path):
    """run_upsert rewrites dirty buckets WHOLESALE — every re-extracted doc
    is real work and must be re-booked (lineage does), so lifetime totals
    exceed the live doc count after an update wave and stay lineage-equal."""
    root = str(tmp_path / "table")
    docs = make_corpus(N_DOCS)
    run_incremental(spark, spark.createDataFrame(docs, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, num_partitions=2, run_id="base")

    v2 = [dict(d) for d in docs]
    v2[0] = {"doc_id": v2[0]["doc_id"],
             "spans": [{"kind": "text_block", "text": "fully rewritten",
                        "media_ref": "1,72,100,400,16,TOPLEFT,text",
                        "offset": 0}]}
    s = run_upsert(spark, spark.createDataFrame(v2, INPUT_SCHEMA), root,
                   n_buckets=N_BUCKETS, num_partitions=2, run_id="wave2")
    assert s["snapshot_id"] == 2 and len(s["buckets"]) >= 1

    store = SnapshotStore(root)
    ls = store.current_manifest()["lifetime_stats"]
    assert ls == _lineage_totals(spark, store)
    # N_DOCS initial + every doc in the rewritten dirty buckets re-booked.
    assert ls["docs"] == N_DOCS + s["docs"]
    assert store.live_doc_count() == N_DOCS


def test_compaction_carries_lifetime_forward_unchanged(spark, tmp_path):
    root = str(tmp_path / "table")
    inp = corpus_df(spark, N_DOCS, partitions=4)
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    max_buckets_per_run=3, num_partitions=4, run_id="a")
    run_incremental(spark, inp, root, n_buckets=N_BUCKETS,
                    num_partitions=4, run_id="b")
    store = SnapshotStore(root)
    before = dict(store.current_manifest()["lifetime_stats"])
    c = compact(spark, root, max_live_runs=1, run_id="squash")
    assert c["snapshot_id"] is not None
    after = store.current_manifest()["lifetime_stats"]
    assert after == before  # a rewrite books no new extraction work
    assert after == _lineage_totals(spark, store)


def test_streaming_merge_lifetime_stays_lineage_equal(spark, tmp_path):
    """r7 verdict #6: micro-batches commit through the merge path, so
    lifetime stats accrue transitively — assert lifetime_totals == lineage
    sum after >= 3 micro-batches INCLUDING a no-op batch (identical docs
    re-sent: a micro-batch fires, the doc-level diff finds zero changes,
    no commit and no lifetime delta)."""
    import glob
    import shutil

    from docling_service_spark.sparkio.streaming import stream_merge_upsert

    def _land(path, docs, name):
        tmp = f"{path}.{name}.tmp"
        spark.createDataFrame(docs, INPUT_SCHEMA).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.makedirs(path, exist_ok=True)
        shutil.move(part, os.path.join(path, f"{name}.parquet"))
        shutil.rmtree(tmp)

    inp = str(tmp_path / "landing")
    root = str(tmp_path / "table")
    docs = make_corpus(20)

    _land(inp, docs, "w1")                       # batch 0: 20 fresh docs
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)

    changed = {"doc_id": docs[0]["doc_id"],
               "spans": [{"kind": "text_block", "text": "stream rev",
                          "media_ref": "1,72,100,400,16,TOPLEFT,text",
                          "offset": 0}]}
    _land(inp, [changed, docs[1]], "w2")         # batch 1: 1 changed + 1 resent
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)

    _land(inp, [docs[2], docs[3]], "w3")         # batch 2: pure no-op resend
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)

    store = SnapshotStore(root)
    snaps = store.current_manifest()["snapshot_id"]
    ls = store.current_manifest()["lifetime_stats"]
    assert ls == _lineage_totals(spark, store)   # transitively exact
    # 20 initial + the single changed doc; resends booked nothing.
    assert ls["docs"] == 21
    assert store.live_doc_count() == 20

    # A 4th run with no new files = zero micro-batches; totals untouched.
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)
    assert store.current_manifest()["snapshot_id"] == snaps
    assert store.current_manifest()["lifetime_stats"] == ls
