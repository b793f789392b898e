"""Snapshot-manifest store: incremental batch runs with idempotent resume.

Iceberg-shaped emulation (no Iceberg jars offline — SURVEY.md §4 item 2):

    root/
      data/run={run_id}/part-*.parquet              (instrumented output rows)
      lineage/run={run_id}/part-*.parquet
      _manifests/manifest-{snapshot_id}.json        (immutable)
      _manifests/CURRENT                            (atomic pointer, os.replace)

    The bucket→run mapping lives in the manifest only — buckets are a
    *logical* partition of the doc-id space (resume granularity), not a
    physical directory layout: a run commits all its buckets atomically, so
    one plain parquet dir per run is exactly-once by construction.  (A
    physical ``partitionBy("bucket")`` fanout write was measured to cost more
    than the whole extraction at 120k docs — tasks × buckets tiny files.)

Semantics that must stay honest:

- **Atomic commit**: a run's files become visible only when CURRENT is
  swapped to a manifest that references them; a crashed run leaves orphan
  files that no manifest references (vacuumable), never partial state.
- **Monotonic snapshot ids**: child = parent + 1.
- **Idempotent resume**: work is bucketed by ``pmod(xxhash64(doc_id), n_buckets)``;
  a re-run processes exactly the buckets absent from the current manifest
  (the anti-join of input against committed lineage, expressed as bucket-set
  subtraction so resume costs O(manifest), not a data-scale join).

The reference analog is the resumable migration session log
(``scripts/r2_migrate_xxhash.py:185-227``: JSON session file, processed-key
set, batch-wise persistence).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .batch import INSTRUMENTED_DDL
from .pipeline import derive_lineage, run_extraction, strip_instrumentation

LINEAGE_DDL = ("run_id string, snapshot_id bigint, partition_id int, doc_count bigint, "
               "bytes bigint, parse_failures bigint, wall_ms bigint")


class SnapshotConflictError(RuntimeError):
    """A concurrent run committed one of our buckets first (optimistic
    concurrency, the file-store analog of Iceberg's commit validation).
    The loser's files stay orphaned and vacuumable; committed state is
    untouched."""


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------

    def current_manifest(self) -> Optional[dict]:
        current = os.path.join(self.manifest_dir, "CURRENT")
        if not os.path.exists(current):
            return None
        with open(current) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def committed_buckets(self) -> dict[str, str]:
        """bucket (as str) → run_id that produced it."""
        m = self.current_manifest()
        return dict(m["buckets"]) if m else {}

    def check_n_buckets(self, n_buckets: int) -> None:
        """The bucket count is part of the table's identity: re-hashing doc
        ids into a different bucket space silently shadows unrelated docs on
        overwrite commits.  Fail loudly on mismatch."""
        m = self.current_manifest()
        committed = (m or {}).get("n_buckets")
        if committed is not None and committed != n_buckets:
            raise ValueError(
                f"store at {self.root} was committed with n_buckets={committed}; "
                f"got n_buckets={n_buckets} — bucket counts are immutable per table"
            )

    def commit(self, new_buckets: list[int], run_id: str, *, allow_overwrite: bool = False,
               n_buckets: Optional[int] = None) -> int:
        # Re-read CURRENT at commit time: a concurrent run may have advanced
        # it since this run planned its bucket set.  ``allow_overwrite`` is
        # the copy-on-write path (run_upsert): the new run's version of a
        # bucket shadows the old one in the manifest; the old data files stay
        # until vacuum.
        parent = self.current_manifest()
        already = {int(b) for b in parent["buckets"]} if parent else set()
        conflicts = sorted(set(new_buckets) & already)
        if conflicts and not allow_overwrite:
            raise SnapshotConflictError(
                f"buckets {conflicts} were committed concurrently; aborting commit of run {run_id}"
            )
        snapshot_id = (parent["snapshot_id"] + 1) if parent else 1
        buckets = dict(parent["buckets"]) if parent else {}
        for b in new_buckets:
            buckets[str(b)] = run_id
        lineage_runs = (list(parent["lineage_runs"]) if parent else []) + [run_id]
        manifest = {
            "snapshot_id": snapshot_id,
            "run_id": run_id,
            "parent_snapshot_id": parent["snapshot_id"] if parent else None,
            "committed_at_unix_ms": int(time.time() * 1000),
            "n_buckets": n_buckets if n_buckets is not None else (parent or {}).get("n_buckets"),
            "buckets": buckets,
            "lineage_runs": lineage_runs,
        }
        name = f"manifest-{snapshot_id}.json"
        path = os.path.join(self.manifest_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, path)  # immutable manifest lands first ...
        tmp_cur = os.path.join(self.manifest_dir, "CURRENT.tmp")
        with open(tmp_cur, "w") as f:
            f.write(name)
        os.replace(tmp_cur, os.path.join(self.manifest_dir, "CURRENT"))  # ... then the atomic pointer swap
        return snapshot_id

    # -- readers ---------------------------------------------------------------

    def _runs_to_buckets(self) -> dict[str, list[int]]:
        out: dict[str, list[int]] = {}
        for b, run_id in self.committed_buckets().items():
            out.setdefault(run_id, []).append(int(b))
        return out

    def read_output(self, spark: SparkSession, *, instrumented: bool = False) -> DataFrame:
        """Union of per-run reads, each filtered to the buckets the CURRENT
        manifest maps to that run — an upsert shadows a bucket's old rows by
        remapping it, and this filter (pushed into the parquet scan) is what
        makes the shadowing effective without rewriting old files."""
        runs = self._runs_to_buckets()
        if not runs:
            df = spark.createDataFrame([], INSTRUMENTED_DDL)
            return df if instrumented else strip_instrumentation(df)
        parts = []
        for run_id, buckets in sorted(runs.items()):
            df = spark.read.schema(INSTRUMENTED_DDL).parquet(
                os.path.join(self.root, "data", f"run={run_id}")
            )
            parts.append(df.filter(F.col("_bucket").isin(buckets)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df if instrumented else strip_instrumentation(df)

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        m = self.current_manifest()
        runs = m["lineage_runs"] if m else []
        paths = [os.path.join(self.root, "lineage", f"run={r}") for r in runs]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return spark.createDataFrame([], LINEAGE_DDL)
        return spark.read.schema(LINEAGE_DDL).parquet(*paths)


def register_views(spark: SparkSession, root: str, *, prefix: str = "dss") -> list[str]:
    """Expose the committed snapshot to Spark SQL: ``{prefix}_extracted``,
    ``{prefix}_lineage``, plus a flat ``{prefix}_spans`` view (posexplode of
    the ordered span arrays) so the whole engine is queryable with
    ``spark.sql`` — the DataFrame/SQL duality the reference's REST endpoints
    never had."""
    store = SnapshotStore(root)
    store.read_output(spark).createOrReplaceTempView(f"{prefix}_extracted")
    store.read_lineage(spark).createOrReplaceTempView(f"{prefix}_lineage")
    spark.sql(
        f"SELECT doc_id, s.kind, s.text, s.media_ref, s.offset "
        f"FROM {prefix}_extracted LATERAL VIEW explode(spans) AS s "
        f"WHERE status = 'completed'"
    ).createOrReplaceTempView(f"{prefix}_spans")
    return [f"{prefix}_extracted", f"{prefix}_lineage", f"{prefix}_spans"]


def vacuum(root: str, *, keep_manifests: int = 10, min_age_hours: float = 6.0) -> dict:
    """Table maintenance (reference analog: storage-quota eviction + retention
    cleanup, app/main.py:943-992 / app/storage_cleanup.py:12-53): delete
    orphan run dirs (written by crashed or conflict-losing runs, referenced by
    no manifest) and expire old manifests beyond the last ``keep_manifests``.

    CURRENT and every run it references are never touched.  ``min_age_hours``
    is the grace period protecting *in-flight* runs: a run writes its data
    dir before committing, so an unreferenced-but-recent dir may be about to
    commit — only dirs older than the grace period are treated as orphans
    (the Iceberg orphan-file retention analog).  Pass 0 only when no run can
    be in flight."""
    import shutil

    store = SnapshotStore(root)
    m = store.current_manifest()
    # Data liveness = buckets currently mapped to the run (an upsert that
    # shadows ALL of a run's buckets frees its data); lineage liveness =
    # run history (kept as long as the manifest references it).
    data_live = set(m["buckets"].values()) if m else set()
    lineage_live = set(m.get("lineage_runs", [])) if m else set()

    cutoff = time.time() - min_age_hours * 3600
    removed_runs: list[str] = []
    for kind, live in (("data", data_live), ("lineage", lineage_live)):
        base = os.path.join(root, kind)
        if not os.path.isdir(base):
            continue
        for entry in sorted(os.listdir(base)):
            path = os.path.join(base, entry)
            if (entry.startswith("run=") and entry[4:] not in live
                    and os.path.getmtime(path) <= cutoff):
                shutil.rmtree(path, ignore_errors=True)
                removed_runs.append(f"{kind}/{entry}")

    removed_manifests: list[str] = []
    current_id = m["snapshot_id"] if m else 0
    for entry in sorted(os.listdir(store.manifest_dir)):
        if entry.startswith("manifest-") and entry.endswith(".json"):
            sid = int(entry[len("manifest-"):-len(".json")])
            if sid <= current_id - keep_manifests:
                os.remove(os.path.join(store.manifest_dir, entry))
                removed_manifests.append(entry)
    return {"removed_run_dirs": removed_runs, "removed_manifests": removed_manifests}


def run_incremental(
    spark: SparkSession,
    input_df: DataFrame,
    root: str,
    *,
    n_buckets: int = 64,
    max_buckets_per_run: Optional[int] = None,
    num_partitions: Optional[int] = None,
    run_id: Optional[str] = None,
) -> dict:
    """One incremental run: process uncommitted buckets, commit a snapshot.

    Returns a summary dict.  Re-running after success is a no-op; re-running
    after a crash resumes from the last committed snapshot (exactly-once doc
    coverage — tested in tests/test_checkpoint.py).
    """
    store = SnapshotStore(root)
    store.check_n_buckets(n_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    committed = {int(b) for b in store.committed_buckets()}
    todo = sorted(set(range(n_buckets)) - committed)
    if max_buckets_per_run is not None:
        todo = todo[:max_buckets_per_run]
    if not todo:
        return {"run_id": run_id, "snapshot_id": None, "buckets": [], "docs": 0}

    prepared = prepare_input(input_df, n_buckets)
    # Bucket-set membership is the scalable resume predicate (O(manifest) and
    # pushed into the scan); when todo == everything it folds to a full scan.
    if len(todo) < n_buckets:
        prepared = prepared.filter(F.col("_bucket").isin([int(b) for b in todo]))

    return _process_and_commit(spark, store, prepared, root, todo, run_id,
                               num_partitions=num_partitions, allow_overwrite=False,
                               n_buckets=n_buckets)


def prepare_input(input_df: DataFrame, n_buckets: int) -> DataFrame:
    """Attach the passthrough columns: ``_bucket`` (resume/upsert granularity)
    and ``_input_hash`` (content fingerprint of the raw spans, for change
    detection).  Both JVM-side, columnar."""
    return input_df.withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "_input_hash", F.xxhash64("doc_id", F.to_json("spans"))
    )


def _process_and_commit(spark, store, prepared, root, buckets, run_id, *,
                        num_partitions, allow_overwrite, n_buckets) -> dict:
    out = run_extraction(prepared, num_partitions=num_partitions)

    data_dir = os.path.join(root, "data", f"run={run_id}")
    out.write.parquet(data_dir, mode="overwrite")

    written = spark.read.schema(INSTRUMENTED_DDL).parquet(data_dir)
    docs = written.count()

    # Commit FIRST, then stamp lineage with the snapshot id the commit
    # actually produced — a concurrent disjoint-bucket commit can advance
    # CURRENT between planning and commit, and a precomputed id would leave
    # the lineage table stamped with a stale snapshot.  A crash between
    # commit and the lineage write only loses metrics rows (read_lineage
    # skips missing run dirs), never data.
    snapshot_id = store.commit(buckets, run_id, allow_overwrite=allow_overwrite,
                               n_buckets=n_buckets)

    # Lineage from the written files: prunes to the instrumentation columns,
    # so this scan costs footer-reads + three narrow columns, not a re-run.
    lineage = derive_lineage(written, run_id, snapshot_id)
    lineage.write.parquet(os.path.join(root, "lineage", f"run={run_id}"), mode="overwrite")
    return {"run_id": run_id, "snapshot_id": snapshot_id, "buckets": buckets, "docs": docs}


def run_upsert(
    spark: SparkSession,
    input_df: DataFrame,
    root: str,
    *,
    n_buckets: int = 64,
    num_partitions: Optional[int] = None,
    run_id: Optional[str] = None,
) -> dict:
    """Copy-on-write upsert: reprocess only buckets containing new or changed
    documents (``_input_hash`` mismatch vs the committed snapshot), rewrite
    those buckets wholesale from the new input, and remap them in the
    manifest.  Unchanged buckets keep their existing files untouched; fully
    shadowed runs become vacuum-able orphans.

    Semantics per dirty bucket = full replacement from the new input: a doc
    absent from the new input disappears from that bucket (deletes mark the
    bucket dirty via the full-outer diff below); docs in clean buckets are
    never touched.  Change detection is a doc-level hash diff — O(input +
    table) columnar work, the unavoidable cost of diffing.
    """
    store = SnapshotStore(root)
    store.check_n_buckets(n_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    prepared = prepare_input(input_df, n_buckets)

    current = store.read_output(spark, instrumented=True).select(
        "doc_id", F.col("_input_hash").alias("_old_hash")
    )
    # Full-outer diff: new docs (old null), changed docs (hash mismatch), AND
    # deleted docs (new null — present in the table, absent from the input).
    diff = prepared.select("doc_id", "_bucket", "_input_hash").join(current, "doc_id", "full")
    dirty_docs = diff.filter(
        F.col("_old_hash").isNull()
        | F.col("_input_hash").isNull()
        | (F.col("_old_hash") != F.col("_input_hash"))
    )
    # Deleted docs carry no _bucket from the input side — recompute from doc_id.
    dirty_bucket_col = F.coalesce(
        F.col("_bucket"), F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    dirty_buckets = sorted(
        r["b"] for r in dirty_docs.select(dirty_bucket_col.alias("b")).distinct().collect()
    )
    if not dirty_buckets:
        return {"run_id": run_id, "snapshot_id": None, "buckets": [], "docs": 0}

    todo_input = prepared.filter(F.col("_bucket").isin(dirty_buckets))
    return _process_and_commit(spark, store, todo_input, root, dirty_buckets, run_id,
                               num_partitions=num_partitions, allow_overwrite=True,
                               n_buckets=n_buckets)
