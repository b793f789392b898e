"""Doc-level MERGE upsert: partial inputs insert/update their docs and leave
every other doc intact — including same-bucket siblings, which the
bucket-wholesale run_upsert would delete.  Plus the streaming twin:
micro-batches merge into the committed snapshot exactly once."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from docling_service_spark.corpus import make_corpus
from docling_service_spark.schemas import INPUT_SCHEMA
from docling_service_spark.sparkio.checkpoint import (
    SnapshotStore,
    run_incremental,
    run_merge_upsert,
    run_upsert,
)
from docling_service_spark.sparkio.streaming import stream_merge_upsert

N_DOCS = 60
N_BUCKETS = 8


def _mutate(doc: dict) -> dict:
    spans = list(doc["spans"]) + [{
        "kind": "text_block", "text": "MERGED-REVISION appended.",
        "media_ref": "1,72,750,400,16,TOPLEFT,text", "offset": len(doc["spans"]),
    }]
    return {"doc_id": doc["doc_id"], "spans": spans}


def _fresh_doc(idx: int) -> dict:
    return {"doc_id": f"new-{idx:04d}", "spans": [{
        "kind": "text_block", "text": f"Brand new document {idx}.",
        "media_ref": "1,72,100,400,16,TOPLEFT,text", "offset": 0,
    }]}


def test_merge_updates_and_inserts_without_deleting(spark, tmp_path):
    root = str(tmp_path / "table")
    v1 = make_corpus(N_DOCS)
    df1 = spark.createDataFrame(v1, INPUT_SCHEMA)
    run_incremental(spark, df1, root, n_buckets=N_BUCKETS, num_partitions=2, run_id="base")
    store = SnapshotStore(root)
    before = {r["doc_id"]: r for r in store.read_output(spark).collect()}

    # Partial batch: 3 changed docs + 2 brand-new ones.  Every bucket this
    # batch touches also holds docs NOT in the batch (8 buckets, 60 docs).
    batch = [_mutate(v1[3]), _mutate(v1[7]), _mutate(v1[11]),
             _fresh_doc(1), _fresh_doc(2)]
    r = run_merge_upsert(spark, spark.createDataFrame(batch, INPUT_SCHEMA),
                         root, n_buckets=N_BUCKETS, run_id="m1")
    assert r["docs_changed"] == 5
    assert 0 < len(r["buckets"]) <= N_BUCKETS
    assert r["docs"] > 5  # rewritten buckets carry their kept siblings

    after = {r_["doc_id"]: r_ for r_ in store.read_output(spark).collect()}
    assert len(after) == N_DOCS + 2
    for doc_id in (v1[3]["doc_id"], v1[7]["doc_id"], v1[11]["doc_id"]):
        assert any("MERGED-REVISION" in s["text"] for s in after[doc_id]["spans"])
    assert "new-0001" in after and "new-0002" in after
    # EVERY other doc is byte-identical — absent-from-input ≠ deleted.
    for doc_id, row in before.items():
        if doc_id in (v1[3]["doc_id"], v1[7]["doc_id"], v1[11]["doc_id"]):
            continue
        assert row["markdown"] == after[doc_id]["markdown"], doc_id

    # Replay of the same batch: doc-level diff → pure no-op.
    r2 = run_merge_upsert(spark, spark.createDataFrame(batch, INPUT_SCHEMA),
                          root, n_buckets=N_BUCKETS, run_id="m2")
    assert r2["snapshot_id"] is None and r2["docs_changed"] == 0


def test_merge_vs_wholesale_deletion_semantics(spark, tmp_path):
    """The failure mode run_merge_upsert exists to prevent: run_upsert on a
    partial batch deletes the batch's same-bucket siblings."""
    root_m = str(tmp_path / "merge")
    root_w = str(tmp_path / "whole")
    v1 = make_corpus(N_DOCS)
    df1 = spark.createDataFrame(v1, INPUT_SCHEMA)
    for root in (root_m, root_w):
        run_incremental(spark, df1, root, n_buckets=N_BUCKETS, num_partitions=2, run_id="base")
    batch = spark.createDataFrame([_mutate(v1[3])], INPUT_SCHEMA)

    run_merge_upsert(spark, batch, root_m, n_buckets=N_BUCKETS, run_id="m")
    run_upsert(spark, batch, root_w, n_buckets=N_BUCKETS, run_id="w")

    merged = SnapshotStore(root_m).read_output(spark).count()
    wholesale = SnapshotStore(root_w).read_output(spark).count()
    assert merged == N_DOCS            # nothing deleted
    assert wholesale < N_DOCS          # bucket-replacement dropped siblings


def test_merge_dedups_doc_ids_within_batch(spark, tmp_path):
    """Two versions of the same doc in ONE batch collapse to a single row
    before diffing — without this, the snapshot holds duplicate live rows
    forever (review finding)."""
    root = str(tmp_path / "table")
    v = _fresh_doc(1)
    v2 = _mutate(v)
    batch = spark.createDataFrame([v, v2, _fresh_doc(2)], INPUT_SCHEMA)
    r = run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS, run_id="m")
    assert r["docs_changed"] == 2  # doc 1 collapsed + doc 2
    store = SnapshotStore(root)
    out = store.read_output(spark)
    assert out.count() == 2
    assert out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_merge_keep_prepared_hands_off_cached_dedup_frame(spark, tmp_path):
    """keep_prepared=True (r4 advice: job.py's markdown upload re-ran
    prepare_input + the dedup window over the input just to pick names):
    the summary carries the merge's OWN persisted deduped frame — one row
    per doc_id, the max-_input_hash version — on both the commit and the
    no-op return path; the caller unpersists."""
    root = str(tmp_path / "table")
    v = _fresh_doc(1)
    v2 = _mutate(v)
    batch = spark.createDataFrame([v, v2, _fresh_doc(2)], INPUT_SCHEMA)
    r = run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS, run_id="m",
                         keep_prepared=True)
    prepared = r.pop("prepared_deduped")
    assert prepared.storageLevel.useMemory or prepared.storageLevel.useDisk
    rows = {row["doc_id"]: row for row in prepared.collect()}
    assert set(rows) == {"new-0001", "new-0002"}  # versions collapsed
    # The kept version matches what the merge committed (same dedup rule).
    committed = {row["doc_id"]: row["spans"]
                 for row in SnapshotStore(root).read_output(spark).collect()}
    assert [s["text"] for s in rows["new-0001"]["spans"]] \
        == [s["text"] for s in committed["new-0001"]]
    prepared.unpersist()

    # Replay → no-op: the frame is still handed off (job.py's upload gate
    # decides whether to use it), and without keep_prepared nothing leaks.
    r2 = run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS, run_id="m2",
                          keep_prepared=True)
    assert r2["snapshot_id"] is None
    r2["prepared_deduped"].unpersist()
    r3 = run_merge_upsert(spark, batch, root, n_buckets=N_BUCKETS, run_id="m3")
    assert "prepared_deduped" not in r3


def test_merge_conflicts_on_concurrent_snapshot_advance(spark, tmp_path):
    """CAS commit: a merge planned against snapshot S must NOT commit onto
    S+1 — its carried rows were read from S, so overwriting would silently
    drop the concurrent writer's docs (review finding)."""
    import pytest

    from docling_service_spark.sparkio.checkpoint import (
        SnapshotConflictError,
        prepare_input,
    )

    root = str(tmp_path / "table")
    v1 = make_corpus(20)
    run_incremental(spark, spark.createDataFrame(v1, INPUT_SCHEMA), root,
                    n_buckets=N_BUCKETS, num_partitions=2, run_id="base")
    store = SnapshotStore(root)
    planned_parent = store.current_manifest()["snapshot_id"]
    # A concurrent writer advances the snapshot between plan and commit.
    run_merge_upsert(spark, spark.createDataFrame([_fresh_doc(7)], INPUT_SCHEMA),
                     root, n_buckets=N_BUCKETS, run_id="other")
    assert store.current_manifest()["snapshot_id"] == planned_parent + 1
    # The stale plan's commit must raise, not clobber.
    with pytest.raises(SnapshotConflictError, match="planned against snapshot"):
        store.commit([0], "stale", allow_overwrite=True, n_buckets=N_BUCKETS,
                     expected_parent_snapshot_id=planned_parent)
    # Re-running the merge against the NEW snapshot succeeds (the replayed
    # diff just re-plans).
    r = run_merge_upsert(spark, spark.createDataFrame([_mutate(v1[2])], INPUT_SCHEMA),
                         root, n_buckets=N_BUCKETS, run_id="retry")
    assert r["docs_changed"] == 1
    assert store.read_output(spark).count() == 21  # nothing lost
    # prepare_input still importable-sane for the helper above
    assert prepare_input(spark.createDataFrame([_fresh_doc(9)], INPUT_SCHEMA),
                         N_BUCKETS).columns[-2:] == ["_bucket", "_input_hash"]


def test_merge_into_empty_table(spark, tmp_path):
    root = str(tmp_path / "table")
    batch = [_fresh_doc(i) for i in range(5)]
    r = run_merge_upsert(spark, spark.createDataFrame(batch, INPUT_SCHEMA),
                         root, n_buckets=N_BUCKETS, run_id="m0")
    assert r["docs_changed"] == 5 and r["docs"] == 5
    assert SnapshotStore(root).read_output(spark).count() == 5


def _land_wave(spark, path, docs, name, schema=INPUT_SCHEMA):
    tmp = f"{path}.{name}.tmp"
    spark.createDataFrame(docs, schema).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(path, exist_ok=True)
    shutil.move(part, os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(tmp)


def test_stream_merge_upsert_waves(spark, tmp_path):
    inp = str(tmp_path / "landing")
    root = str(tmp_path / "table")
    v1 = make_corpus(30)
    _land_wave(spark, inp, v1, "w1")
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)
    store = SnapshotStore(root)
    assert store.read_output(spark).count() == 30

    # Wave 2: one revision + one new doc; everything else must survive.
    _land_wave(spark, inp, [_mutate(v1[5]), _fresh_doc(9)], "w2")
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)
    out = {r["doc_id"]: r for r in store.read_output(spark).collect()}
    assert len(out) == 31
    assert any("MERGED-REVISION" in s["text"] for s in out[v1[5]["doc_id"]]["spans"])

    # Re-running the stream with no new files is a no-op (checkpoint cursor).
    snap_before = store.current_manifest()["snapshot_id"]
    stream_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS)
    assert store.current_manifest()["snapshot_id"] == snap_before
    # Exactly one live row per doc even though buckets were rewritten.
    assert store.read_output(spark).groupBy("doc_id").count() \
                .filter(F.col("count") > 1).count() == 0


def _store_tree(base: str) -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(base):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, base)] = fh.read()
    return out


def test_stream_merge_markdown_names_match_batch(spark, tmp_path):
    """Composition (r4 verdict next-round #6): the streaming merge's markdown
    upload must resolve conflicting same-doc versions through the SAME rule
    as the batch path — two versions of one doc in ONE micro-batch, and the
    uploaded key AND bytes must equal what run_merge_upsert + the shared
    upload helper produce for the identical input."""
    from docling_service_spark.schemas import INPUT_SCHEMA_WITH_SOURCE
    from docling_service_spark.sparkio.media_sink import upload_merge_run_markdown
    from docling_service_spark.sparkio.streaming import INPUT_DDL_WITH_SOURCE

    def _src(name):
        return {"kind": "upload", "value": f"up/{name}", "original_name": name}

    base = _fresh_doc(1)
    v_a = {**base, "source": _src("report-v1.docx")}
    v_b = {**_mutate(base), "source": _src("report-v2.docx")}
    sibling = {**_fresh_doc(2), "source": _src("notes.html")}
    batch = [v_a, v_b, sibling]

    # Batch path: merge + the shared merge-mode upload helper (job.py's path).
    root_b, md_b = str(tmp_path / "tbl_b"), str(tmp_path / "md_b")
    r = run_merge_upsert(spark, spark.createDataFrame(batch, INPUT_SCHEMA_WITH_SOURCE),
                         root_b, n_buckets=N_BUCKETS, run_id="m0", keep_prepared=True)
    prepared = r.pop("prepared_deduped")
    n_up = upload_merge_run_markdown(spark, root_b, r["run_id"], prepared, md_b)
    prepared.unpersist()
    assert n_up == 2  # versions collapsed + sibling

    # Streaming path: the same three rows land as ONE wave.
    landing, root_s, md_s = (str(tmp_path / "landing"), str(tmp_path / "tbl_s"),
                             str(tmp_path / "md_s"))
    _land_wave(spark, landing, batch, "w1", schema=INPUT_SCHEMA_WITH_SOURCE)
    stream_merge_upsert(spark, landing, root_s, n_buckets=N_BUCKETS,
                        markdown_store=md_s, input_ddl=INPUT_DDL_WITH_SOURCE)

    tree_b, tree_s = _store_tree(md_b), _store_tree(md_s)
    assert tree_b, "batch upload produced nothing"
    assert tree_s == tree_b  # same keys (kept-version filename), same bytes
    # The kept version's name and content travel together: exactly one
    # markdown key exists for the conflicted doc, named after the winner.
    keys = [k for k in tree_s if "new-0001" in k]
    assert len(keys) == 1
    assert keys[0].endswith((".docx.md",))  # reference naming: name + .md
    # Snapshot content matches too (the winner's spans were committed).
    out_b = {r_["doc_id"]: r_["markdown"]
             for r_ in SnapshotStore(root_b).read_output(spark).collect()}
    out_s = {r_["doc_id"]: r_["markdown"]
             for r_ in SnapshotStore(root_s).read_output(spark).collect()}
    assert out_b == out_s


def test_batch_merge_markdown_rerun_recovers_lost_upload(spark, tmp_path):
    """Batch twin of the streaming recovery below (r5 advice): a job.py
    --merge-upsert re-run after a crash between the merge commit and the
    markdown upload merges as a zero-changed no-op — the old gate skipped
    the upload forever.  The no-op path must route through the committed-
    snapshot upload (job.upload_run_markdown)."""
    from docling_service_spark.schemas import INPUT_SCHEMA_WITH_SOURCE

    import job as job_mod

    def _src(name):
        return {"kind": "upload", "value": f"up/{name}", "original_name": name}

    batch = [{**_fresh_doc(1), "source": _src("a.docx")},
             {**_fresh_doc(2), "source": _src("b.html")}]
    root, md = str(tmp_path / "tbl"), str(tmp_path / "md")
    inp = spark.createDataFrame(batch, INPUT_SCHEMA_WITH_SOURCE)

    def _run(run_id):
        summary = run_merge_upsert(spark, inp, root, n_buckets=N_BUCKETS,
                                   run_id=run_id, keep_prepared=True)
        prepared = summary.pop("prepared_deduped")
        try:
            return summary, job_mod.upload_run_markdown(
                spark, root, md, summary, merge_mode=True,
                merge_prepared=prepared, input_df=inp)
        finally:
            prepared.unpersist()

    s1, n1 = _run("m1")
    assert s1["snapshot_id"] is not None and n1 == 2
    complete = _store_tree(md)
    assert len(complete) == 2

    # Crash window: commit survived, upload's effects gone; the re-run's
    # merge diffs to zero changes (no-op) yet must still deliver the blobs.
    shutil.rmtree(md)
    s2, n2 = _run("m2")
    assert s2["snapshot_id"] is None and s2["docs_changed"] == 0
    assert n2 == 2
    assert _store_tree(md) == complete  # recovered, byte-identical
    assert SnapshotStore(root).current_manifest()["snapshot_id"] == 1


def test_stream_merge_markdown_replay_recovers_lost_upload(spark, tmp_path):
    """Review finding: a micro-batch that crashes AFTER its merge commit but
    BEFORE the markdown upload replays as a zero-changed no-op — the old
    gate skipped the upload forever, silently losing the batch's blobs.
    The no-op path must re-upload from the committed snapshot."""
    from docling_service_spark.schemas import INPUT_SCHEMA_WITH_SOURCE
    from docling_service_spark.sparkio.streaming import INPUT_DDL_WITH_SOURCE

    def _src(name):
        return {"kind": "upload", "value": f"up/{name}", "original_name": name}

    batch = [{**_fresh_doc(1), "source": _src("a.docx")},
             {**_fresh_doc(2), "source": _src("b.html")}]
    landing = str(tmp_path / "landing")
    root, md = str(tmp_path / "tbl"), str(tmp_path / "md")
    _land_wave(spark, landing, batch, "w1", schema=INPUT_SCHEMA_WITH_SOURCE)
    stream_merge_upsert(spark, landing, root, n_buckets=N_BUCKETS,
                        markdown_store=md, input_ddl=INPUT_DDL_WITH_SOURCE)
    complete = _store_tree(md)
    assert len(complete) == 2

    # Simulate the crash window: the commit survived (table untouched) but
    # the upload's effects are gone, and the streaming checkpoint never
    # advanced — the same files replay as a fresh query.
    shutil.rmtree(md)
    shutil.rmtree(os.path.join(root, "_stream_checkpoint"))
    stream_merge_upsert(spark, landing, root, n_buckets=N_BUCKETS,
                        markdown_store=md, input_ddl=INPUT_DDL_WITH_SOURCE)
    assert _store_tree(md) == complete  # recovered, byte-identical
    # And the replay did NOT re-commit anything (still one table snapshot).
    assert SnapshotStore(root).current_manifest()["snapshot_id"] == 1
