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
import warnings
from typing import Optional

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from .batch import INSTRUMENTED_DDL
from .pipeline import run_extraction, strip_instrumentation

LINEAGE_DDL = ("run_id string, snapshot_id bigint, partition_id int, doc_count bigint, "
               "bytes bigint, parse_failures bigint, rejected bigint, wall_ms bigint")

# Arrow twin of LINEAGE_DDL for the driver-side lineage write (physical
# parquet types must round-trip through spark.read.schema(LINEAGE_DDL)).
_LINEAGE_FIELDS = [("run_id", "string"), ("snapshot_id", "int64"),
                   ("partition_id", "int32"), ("doc_count", "int64"),
                   ("bytes", "int64"), ("parse_failures", "int64"),
                   ("rejected", "int64"), ("wall_ms", "int64")]


def _write_lineage_rows(rows, out_dir: str) -> None:
    """Write collected lineage rows as one parquet file, driver-side.

    Lineage is metadata-sized — O(extraction partitions) rows per run, the
    same scale as a Delta/Iceberg manifest's per-file stats — so routing it
    through a Spark write job paid ~0.5 s of pure per-run fixed cost (task
    scheduling + commit protocol for a handful of rows).  The aggregate
    itself still runs as one Spark job (column-pruned scan of the run dir);
    only the tiny result crosses to the driver, which already owns the
    store root for manifest IO.  Crash-safety matches the manifest writes:
    tmp file + os.replace, so readers never see a partial parquet file (a
    crash before the replace loses metrics rows only — same contract as the
    commit→lineage window documented at the call site).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([(n, getattr(pa, t)()) for n, t in _LINEAGE_FIELDS])
    cols = {n: [r[n] for r in rows] for n, _ in _LINEAGE_FIELDS}
    table = pa.Table.from_pydict(cols, schema=schema)
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, "part-00000.parquet")
    # Overwrite semantics of the Spark write this replaces: a retried run
    # with the same run_id must not leave stale part files to double-count.
    for name in os.listdir(out_dir):
        if name != os.path.basename(final):
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


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

    def _manifest_ids(self) -> list[int]:
        return sorted(
            int(e[len("manifest-"):-len(".json")])
            for e in os.listdir(self.manifest_dir)
            if e.startswith("manifest-") and e.endswith(".json")
        )

    def current_manifest(self) -> Optional[dict]:
        """Latest committed manifest = the max-id manifest FILE.  Manifest
        creation (atomic hard-link of a fully-written temp file in commit())
        is the commit point, so the max id is authoritative even while a
        committer hasn't refreshed CURRENT yet — CURRENT is an advisory
        pointer for humans and external tools, never the source of truth
        (fixes the read-parent/swap-CURRENT TOCTOU race between concurrent
        disjoint-bucket commits)."""
        ids = self._manifest_ids()
        if not ids:
            return None
        with open(os.path.join(self.manifest_dir, f"manifest-{ids[-1]}.json")) as f:
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

    MAX_COMMIT_RETRIES = 32

    LIFETIME_KEYS = ("docs", "parse_failures", "rejected", "wall_ms")

    def commit(self, new_buckets: list[int], run_id: str, *, allow_overwrite: bool = False,
               n_buckets: Optional[int] = None,
               bucket_sums: Optional[dict] = None,
               expected_parent_snapshot_id: object = "__unset__",
               run_stats: Optional[dict] = None,
               replace_lineage_runs: Optional[list] = None) -> int:
        """Optimistic-concurrency commit.  Snapshot-id allocation is the
        atomic commit point: the manifest body is fully written to a unique
        temp file, then claimed with ``os.link`` (fails with FileExistsError
        if any concurrent committer claimed the same id first).  On a lost
        race we re-read the new latest manifest, re-check bucket conflicts
        against it, and retry with the next id — two concurrent disjoint-
        bucket runs now serialize into parent→child snapshots instead of the
        second silently clobbering the first's buckets.

        ``bucket_sums`` (bucket → [doc_count, input_hash_sum]) is carried in
        the manifest so upserts can detect clean buckets from metadata alone.

        ``replace_lineage_runs`` sets the child manifest's ``lineage_runs``
        verbatim instead of appending ``run_id`` — used by metadata-only
        commits (data compaction carries the parent's list unchanged; it
        writes no lineage dir, so appending would grow the list with phantom
        ids) and by lineage compaction (the consolidated dir REPLACES the
        list).  Replacing blindly would drop lineage runs a concurrent
        writer appended, so it requires the compare-and-swap parent check."""
        if (replace_lineage_runs is not None
                and expected_parent_snapshot_id == "__unset__"):
            raise ValueError(
                "replace_lineage_runs requires expected_parent_snapshot_id "
                "(a blind replacement could drop a concurrent commit's lineage run)"
            )
        for _ in range(self.MAX_COMMIT_RETRIES):
            parent = self.current_manifest()
            if expected_parent_snapshot_id != "__unset__":
                # Compare-and-swap commit: MERGE runs carry forward rows read
                # from a specific snapshot, so committing onto any OTHER
                # parent would silently drop a concurrent writer's docs from
                # shared buckets.  allow_overwrite covers the remap; this
                # covers the read-your-parent dependency.
                actual = parent["snapshot_id"] if parent else None
                if actual != expected_parent_snapshot_id:
                    raise SnapshotConflictError(
                        f"run {run_id}: planned against snapshot "
                        f"{expected_parent_snapshot_id} but current is {actual}; "
                        f"re-run the merge against the new snapshot"
                    )
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
            sums = dict((parent or {}).get("bucket_sums") or {})
            for b, s in (bucket_sums or {}).items():
                sums[str(b)] = s
            if replace_lineage_runs is not None:
                lineage_runs = list(replace_lineage_runs)
            else:
                lineage_runs = (list(parent["lineage_runs"]) if parent else []) + [run_id]
            # Lifetime work totals accumulate in the manifest so reporting
            # never scans the lineage table (O(runs) parquet reads on every
            # cron run at scale; and the manifest survives the commit→lineage
            # crash window that can drop lineage rows).  run_stats counts
            # only the committing run's REAL work (merge runs exclude
            # carried rows — same exclusion lineage applies); metadata-only
            # commits (compaction, summary upgrades) pass None and carry the
            # totals forward unchanged.  A parent WITHOUT lifetime_stats was
            # committed by older code after booking unknown work — starting
            # accumulation mid-stream would under-count forever, so the
            # field stays absent and readers fall back to the lineage scan.
            parent_ls = parent.get("lifetime_stats") if parent else None
            if parent is None:
                lifetime = {k: int((run_stats or {}).get(k, 0))
                            for k in self.LIFETIME_KEYS}
            elif parent_ls is not None:
                lifetime = {k: int(parent_ls.get(k, 0)) + int((run_stats or {}).get(k, 0))
                            for k in self.LIFETIME_KEYS}
            else:
                lifetime = None
            manifest = {
                "snapshot_id": snapshot_id,
                "run_id": run_id,
                "parent_snapshot_id": parent["snapshot_id"] if parent else None,
                "committed_at_unix_ms": int(time.time() * 1000),
                "n_buckets": n_buckets if n_buckets is not None else (parent or {}).get("n_buckets"),
                "buckets": buckets,
                "bucket_sums": sums,
                "lineage_runs": lineage_runs,
            }
            if lifetime is not None:
                manifest["lifetime_stats"] = lifetime
            name = f"manifest-{snapshot_id}.json"
            path = os.path.join(self.manifest_dir, name)
            tmp = os.path.join(self.manifest_dir, f".commit-{run_id}-{uuid.uuid4().hex}.tmp")
            try:
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=2)
                try:
                    os.link(tmp, path)  # atomic claim: full content appears or nothing
                except FileExistsError:
                    continue  # lost the race — re-read parent and re-check conflicts
            finally:
                # tmp never outlives the attempt — crash-window leftovers are
                # additionally swept by vacuum().
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
            self._advance_current(name, snapshot_id)
            return snapshot_id
        raise SnapshotConflictError(
            f"run {run_id}: gave up after {self.MAX_COMMIT_RETRIES} contended commit attempts"
        )

    def _advance_current(self, name: str, snapshot_id: int) -> None:
        """Refresh the advisory CURRENT pointer.  Forward-only is BEST-EFFORT
        (check-then-replace has a small race window where two committers can
        interleave); readers must never trust CURRENT — current_manifest()
        uses the max manifest file, and external tools should too when they
        need a guarantee.  The pointer exists for human inspection only."""
        current = os.path.join(self.manifest_dir, "CURRENT")
        try:
            with open(current) as f:
                existing = f.read().strip()
            if int(existing[len("manifest-"):-len(".json")]) >= snapshot_id:
                return
        except (FileNotFoundError, ValueError):
            pass
        tmp_cur = current + f".{uuid.uuid4().hex}.tmp"
        with open(tmp_cur, "w") as f:
            f.write(name)
        os.replace(tmp_cur, current)

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
        df = self._read_runs(spark, runs)
        return df if instrumented else strip_instrumentation(df)

    def _read_runs(self, spark: SparkSession, runs: dict[str, list[int]]) -> DataFrame:
        """Instrumented union over a SUBSET of run dirs, each filtered to its
        live buckets (the read_output pattern; also the binpack-compaction
        source, which must scan only the runs being merged)."""
        parts = []
        for run_id, buckets in sorted(runs.items()):
            df = spark.read.schema(INSTRUMENTED_DDL).parquet(
                os.path.join(self.root, "data", f"run={run_id}")
            )
            parts.append(df.filter(F.col("_bucket").isin(buckets)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read_docs(self, spark: SparkSession, doc_ids: list[str],
                  *, instrumented: bool = False) -> DataFrame:
        """Point lookups with bucket pruning: the manifest maps each doc's
        bucket to exactly one run dir, so a k-doc lookup scans only the
        owning runs' files with `_bucket` + `doc_id` filters pushed into the
        parquet scan — O(k buckets) of the table, not O(table).  (Iceberg's
        metadata-pruned point read, on the manifest-only bucket layout.)"""
        m = self.current_manifest()
        if not m or not doc_ids:
            df = spark.createDataFrame([], INSTRUMENTED_DDL)
            return df if instrumented else strip_instrumentation(df)
        n_buckets = m["n_buckets"]
        # Buckets via the same JVM hash the writer used (one tiny local job).
        id_df = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
        rows = id_df.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int").alias("b")
        ).collect()
        wanted: dict[str, list] = {}  # run_id -> buckets
        for r in rows:
            run = m["buckets"].get(str(r["b"]))
            if run is not None:
                wanted.setdefault(run, []).append(r["b"])
        if not wanted:
            df = spark.createDataFrame([], INSTRUMENTED_DDL)
            return df if instrumented else strip_instrumentation(df)
        parts = []
        for run_id, buckets in sorted(wanted.items()):
            df = spark.read.schema(INSTRUMENTED_DDL).parquet(
                os.path.join(self.root, "data", f"run={run_id}")
            )
            parts.append(df.filter(F.col("_bucket").isin(sorted(set(buckets)))))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df = df.filter(F.col("doc_id").isin(list(doc_ids)))
        return df if instrumented else strip_instrumentation(df)

    def live_doc_count(self) -> Optional[int]:
        """Docs in the current snapshot from manifest bucket summaries alone —
        O(manifest), no data scan (job reporting used to pay a full
        column-pruned table scan per run for this number).  None when any
        committed bucket predates summary support (fall back to counting)."""
        m = self.current_manifest()
        if not m:
            return 0
        sums = m.get("bucket_sums") or {}
        if not all(b in sums for b in m["buckets"]):
            return None
        return sum(sums[b][0] for b in m["buckets"])

    def lifetime_totals(self, spark: SparkSession) -> dict:
        """Whole-table work totals {docs, parse_failures, rejected, wall_ms}
        — WORK done across all runs (merges exclude carried rows, upserts
        re-book reprocessed docs), matching a sum over the lineage table.
        O(manifest) when the table has always carried ``lifetime_stats``
        (every commit since the stats rode the extraction write's observe
        metrics); legacy tables pay one lineage-table aggregate job."""
        m = self.current_manifest()
        ls = (m or {}).get("lifetime_stats")
        if ls is not None:
            return {k: int(ls.get(k, 0)) for k in self.LIFETIME_KEYS}
        row = (self.read_lineage(spark)
               .groupBy().sum("doc_count", "parse_failures", "rejected", "wall_ms")
               .collect()[0])
        return dict(zip(self.LIFETIME_KEYS, (int(v or 0) for v in row)))

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

    Runs referenced by ANY retained manifest are never touched (retained
    manifests stay rollback-usable, not audit-only).  ``min_age_hours``
    is the grace period protecting *in-flight* runs: a run writes its data
    dir before committing, so an unreferenced-but-recent dir may be about to
    commit — only dirs older than the grace period are treated as orphans
    (the Iceberg orphan-file retention analog).  Pass 0 only when no run can
    be in flight."""
    import shutil

    store = SnapshotStore(root)
    ids = store._manifest_ids()
    current_id = ids[-1] if ids else 0
    retained_ids = [i for i in ids if i > current_id - keep_manifests]
    # Liveness is the UNION over every manifest that survives this vacuum,
    # not just CURRENT: retained manifests stay usable for rollback/time-
    # travel, so a run dir referenced by any of them is live.  (An upsert
    # that shadows all of a run's buckets frees its data only once the last
    # retained manifest referencing it expires.)
    data_live: set = set()
    lineage_live: set = set()
    for i in retained_ids:
        with open(os.path.join(store.manifest_dir, f"manifest-{i}.json")) as f:
            m = json.load(f)
        data_live |= set(m["buckets"].values())
        lineage_live |= set(m.get("lineage_runs", []))

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
    for entry in sorted(os.listdir(store.manifest_dir)):
        if entry.startswith("manifest-") and entry.endswith(".json"):
            sid = int(entry[len("manifest-"):-len(".json")])
            if sid <= current_id - keep_manifests:
                os.remove(os.path.join(store.manifest_dir, entry))
                removed_manifests.append(entry)
        elif entry.startswith(".commit-") and entry.endswith(".tmp"):
            # Crash-window leftovers from contended commits (the committer
            # normally removes its tmp); same age grace as data orphans.
            path = os.path.join(store.manifest_dir, entry)
            if os.path.getmtime(path) <= cutoff:
                os.remove(path)
                removed_manifests.append(entry)
    return {"removed_run_dirs": removed_runs, "removed_manifests": removed_manifests}


def compact(
    spark: SparkSession,
    root: str,
    *,
    max_live_runs: int = 1,
    run_id: Optional[str] = None,
    on_complete=None,
    scope: str = "table",
) -> dict:
    """Rewrite live fragmentation: when the current snapshot's buckets
    scatter across more than ``max_live_runs`` run dirs, materialize every
    live row into ONE new run dir and commit a manifest remapping all
    buckets to it (Iceberg's ``rewrite_data_files`` shape; reference analog:
    the retention/eviction maintenance family, app/storage_cleanup.py:12-53).

    ``scope="smallest"`` is the 100-TB variant (binpack): instead of an
    O(table) full rewrite, keep the ``max_live_runs - 1`` runs holding the
    MOST live docs untouched and merge only the remaining small runs into
    one new dir — the table lands at exactly ``max_live_runs`` run dirs for
    the cost of rewriting the fragmented tail (Iceberg's binpack with a
    file-filter).  Per-run sizes come from manifest bucket summaries
    (O(manifest)); runs missing summaries rank by live-bucket count.  At
    ``max_live_runs=1`` the scopes coincide.

    Why it matters: upserts/merges are bucket-level copy-on-write — each run
    adds a ``data/run={id}`` dir and a long-lived table's read file-list
    grows with run count (vacuum removes only *orphaned* dirs).  Compaction
    is pure data movement: row CONTENT is untouched (instrumentation columns
    included), so bucket summaries carry forward from the parent manifest
    verbatim and ``read_output``/``read_docs`` results are byte-identical.

    Concurrency: the commit is compare-and-swap on the snapshot the rows
    were read from (run_merge_upsert's planned-parent discipline) — a
    writer landing first makes this compaction raise
    ``SnapshotConflictError`` and its files become vacuum-eligible orphans;
    a writer landing AFTER re-reads the post-compact manifest at its own
    commit, so it remaps only its dirty buckets and the compacted mapping
    survives for the rest.  Superseded run dirs are NOT deleted here — they
    stay referenced by retained (rollback-usable) manifests until
    ``vacuum`` expires those.

    Returns ``{"run_id", "snapshot_id", "buckets", "docs", "runs_before",
    "runs_after"}``; ``snapshot_id`` None = no-op (fragmentation within
    budget or empty table)."""
    if scope not in ("table", "smallest"):
        raise ValueError(f"compact scope must be 'table' or 'smallest', got {scope!r}")
    store = SnapshotStore(root)
    m = store.current_manifest()
    runs_to_buckets = store._runs_to_buckets()
    live_runs = sorted(runs_to_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    if m is None or len(live_runs) <= max_live_runs:
        summary = {"run_id": run_id, "snapshot_id": None, "buckets": [], "docs": 0,
                   "runs_before": len(live_runs), "runs_after": len(live_runs)}
        notify_completion(on_complete, {**summary, "status": "noop", "detail": None})
        return summary
    expected_parent = m["snapshot_id"]
    all_sums = dict(m.get("bucket_sums") or {})
    if scope == "smallest" and max_live_runs > 1:
        # Rank runs by live doc count (manifest-only; bucket count when a
        # summary is missing ranks the run LAST so legacy runs get merged
        # and their summaries upgraded).  Keep the biggest, merge the rest.
        def _run_docs(r: str):
            bs = runs_to_buckets[r]
            known = [int(all_sums[str(b)][0]) for b in bs
                     if len(all_sums.get(str(b)) or []) == len(_EMPTY_SUM)]
            return (len(known) == len(bs), sum(known), len(bs))

        ranked = sorted(live_runs, key=_run_docs, reverse=True)
        merge_runs = {r: runs_to_buckets[r] for r in ranked[max_live_runs - 1:]}
        runs_after = max_live_runs
    else:
        merge_runs = dict(runs_to_buckets)
        runs_after = 1
    buckets = sorted(b for bs in merge_runs.values() for b in bs)
    try:
        out = store._read_runs(spark, merge_runs)
        data_dir = os.path.join(root, "data", f"run={run_id}")
        out.write.parquet(data_dir, mode="overwrite")
        # Summaries: content is unchanged, so the parent's sums are exact —
        # carried forward without a scan.  Rewritten buckets missing one
        # (pre-s2 manifests) are recomputed from the rewritten files in one
        # pruned aggregate, upgrading the table's metadata as a side effect.
        sums = {str(b): all_sums[str(b)] for b in buckets
                if len(all_sums.get(str(b)) or []) == len(_EMPTY_SUM)}
        missing = [str(b) for b in buckets if str(b) not in sums]
        if missing:
            written = spark.read.schema(INSTRUMENTED_DDL).parquet(data_dir)
            fresh = _bucket_summaries(
                written.filter(F.col("_bucket").isin([int(b) for b in missing]))
                .select("_bucket", "_input_hash"))
            for b in missing:
                sums[b] = fresh.get(b, list(_EMPTY_SUM))
        # Metadata-only commit: no lineage dir is written (row content moved,
        # no work booked), so carry the parent's lineage_runs verbatim —
        # appending would grow the list with a phantom id per compaction.
        snapshot_id = store.commit(buckets, run_id, allow_overwrite=True,
                                   n_buckets=m["n_buckets"], bucket_sums=sums,
                                   expected_parent_snapshot_id=expected_parent,
                                   replace_lineage_runs=m.get("lineage_runs", []))
    except Exception as exc:
        notify_completion(on_complete, {
            "run_id": run_id, "snapshot_id": None, "buckets": buckets, "docs": 0,
            "runs_before": len(live_runs), "runs_after": len(live_runs),
            "status": "failed", "detail": f"{type(exc).__name__}: {exc}",
        })
        raise
    docs = sum(int(sums[str(b)][0]) for b in buckets)
    summary = {"run_id": run_id, "snapshot_id": snapshot_id, "buckets": buckets,
               "docs": docs, "runs_before": len(live_runs),
               "runs_after": runs_after}
    notify_completion(on_complete, {**summary, "status": "completed", "detail": None})
    return summary


def compact_lineage(
    spark: SparkSession,
    root: str,
    *,
    max_lineage_runs: int = 32,
    run_id: Optional[str] = None,
    on_complete=None,
) -> dict:
    """Fold the lineage table's per-run dirs into ONE consolidated dir when
    the manifest references more than ``max_lineage_runs`` of them.

    Why it matters at scale: ``lineage_runs`` grows by one on EVERY data
    commit and never shrinks — a 5-minute incremental cron runs ~100k
    commits/year, so (a) each commit rewrites the whole list into the child
    manifest (O(runs) JSON per commit, O(runs²) cumulative), and (b)
    ``read_lineage`` unions O(runs) parquet dirs of a few KB each — a
    100k-path DataFrameReader listing dwarfs the actual scan.  Folding the
    tiny dirs into one keeps both the manifest and the lineage read
    O(1)-ish between compactions.  Row CONTENT is untouched (lineage rows
    keep their original run_id/snapshot_id columns), so per-run history,
    lineage-scan lifetime totals for legacy tables, and the
    ``lifetime_totals == lineage sum`` invariant all survive verbatim.

    Crash/concurrency discipline mirrors ``compact``: the consolidated dir
    is written first, then claimed by a compare-and-swap metadata-only
    commit whose ``lineage_runs`` is replaced with ``[run_id]`` — a writer
    landing first turns this dir into a vacuumable orphan
    (``SnapshotConflictError``); superseded dirs stay referenced by
    retained manifests until ``vacuum`` expires those.

    Returns ``{"run_id", "snapshot_id", "runs_before", "runs_after"}``;
    ``snapshot_id`` None = no-op (within budget or empty table)."""
    store = SnapshotStore(root)
    m = store.current_manifest()
    existing = list((m or {}).get("lineage_runs", []))
    run_id = run_id or uuid.uuid4().hex[:12]
    if m is None or len(existing) <= max_lineage_runs:
        summary = {"run_id": run_id, "snapshot_id": None,
                   "runs_before": len(existing), "runs_after": len(existing)}
        notify_completion(on_complete, {**summary, "status": "noop", "detail": None})
        return summary
    expected_parent = m["snapshot_id"]
    dirs = [p for r in existing
            if os.path.exists(p := os.path.join(root, "lineage", f"run={r}"))]
    dst = os.path.join(root, "lineage", f"run={run_id}")
    try:
        src = (spark.read.schema(LINEAGE_DDL).parquet(*dirs) if dirs
               else spark.createDataFrame([], LINEAGE_DDL))
        # coalesce(1): the whole lineage table is a few KB per run — one
        # file IS the point (the data table never does this).
        src.coalesce(1).write.parquet(dst, mode="overwrite")
        snapshot_id = store.commit(
            [], run_id, n_buckets=m["n_buckets"],
            expected_parent_snapshot_id=expected_parent,
            replace_lineage_runs=[run_id])
    except Exception as exc:
        notify_completion(on_complete, {
            "run_id": run_id, "snapshot_id": None,
            "runs_before": len(existing), "runs_after": len(existing),
            "status": "failed", "detail": f"{type(exc).__name__}: {exc}",
        })
        raise
    summary = {"run_id": run_id, "snapshot_id": snapshot_id,
               "runs_before": len(existing), "runs_after": 1}
    notify_completion(on_complete, {**summary, "status": "completed", "detail": None})
    return summary


def run_incremental(
    spark: SparkSession,
    input_df: DataFrame,
    root: str,
    *,
    n_buckets: int = 64,
    max_buckets_per_run: Optional[int] = None,
    num_partitions: Optional[int] = None,
    run_id: Optional[str] = None,
    on_complete=None,
    max_doc_bytes: Optional[int] = None,
) -> dict:
    """One incremental run: process uncommitted buckets, commit a snapshot.

    Returns a summary dict.  Re-running after success is a no-op; re-running
    after a crash resumes from the last committed snapshot (exactly-once doc
    coverage — tested in tests/test_checkpoint.py).

    ``on_complete`` is the post-commit hook (webhook analog, see
    notify_completion): called with the summary + status after commit /
    no-op, and with status='failed' + detail before the exception re-raises.
    """
    store = SnapshotStore(root)
    store.check_n_buckets(n_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    committed = {int(b) for b in store.committed_buckets()}
    todo = sorted(set(range(n_buckets)) - committed)
    if max_buckets_per_run is not None:
        todo = todo[:max_buckets_per_run]
    if not todo:
        summary = {"run_id": run_id, "snapshot_id": None, "buckets": [], "docs": 0}
        notify_completion(on_complete, {**summary, "status": "noop", "detail": None})
        return summary

    prepared = prepare_input(input_df, n_buckets)
    # Bucket-set membership is the scalable resume predicate (O(manifest) and
    # pushed into the scan); when todo == everything it folds to a full scan.
    if len(todo) < n_buckets:
        prepared = prepared.filter(F.col("_bucket").isin([int(b) for b in todo]))

    return _run_with_hook(spark, store, prepared, root, todo, run_id, on_complete,
                          num_partitions=num_partitions, allow_overwrite=False,
                          n_buckets=n_buckets, max_doc_bytes=max_doc_bytes)


def _run_with_hook(spark, store, prepared, root, buckets, run_id, on_complete, *,
                   num_partitions, allow_overwrite, n_buckets, max_doc_bytes=None,
                   extra_bucket_sums=None, carry_rows=None,
                   expected_parent="__unset__", extra_summary=None) -> dict:
    try:
        summary = _process_and_commit(spark, store, prepared, root, buckets, run_id,
                                      num_partitions=num_partitions,
                                      allow_overwrite=allow_overwrite,
                                      n_buckets=n_buckets,
                                      max_doc_bytes=max_doc_bytes,
                                      extra_bucket_sums=extra_bucket_sums,
                                      carry_rows=carry_rows,
                                      expected_parent=expected_parent)
    except Exception as exc:
        notify_completion(on_complete, {
            "run_id": run_id, "snapshot_id": None, "buckets": list(buckets), "docs": 0,
            **(extra_summary or {}),
            "status": "failed", "detail": f"{type(exc).__name__}: {exc}",
        })
        raise
    summary = {**summary, **(extra_summary or {})}
    notify_completion(on_complete, {**summary, "status": "completed", "detail": None})
    return summary


def prepare_input(input_df: DataFrame, n_buckets: int) -> DataFrame:
    """Attach the passthrough columns: ``_bucket`` (resume/upsert granularity)
    and ``_input_hash`` (content fingerprint of every OUTPUT-AFFECTING input
    column, for change detection).  Both JVM-side, columnar.

    The hash covers ``source`` when present — source metadata is stamped
    into the output (source_filename), so a source-only edit must mark the
    doc dirty.  Inputs without the column keep the original (doc_id, spans)
    hash, so existing tables don't all go dirty on upgrade."""
    hash_cols = [F.col("doc_id"), F.to_json("spans")]
    if "source" in input_df.columns:
        hash_cols.append(F.to_json("source"))
    return input_df.withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "_input_hash", F.xxhash64(*hash_cols)
    )


def dedup_latest_version(prepared: DataFrame) -> DataFrame:
    """Collapse duplicate doc_ids within one batch to ONE row — THE merge-mode
    version rule (deterministic max ``_input_hash``; arbitrary between
    versions since a DataFrame carries no arrival order).  Every consumer of
    a merge batch MUST pick through this helper: ``run_merge_upsert`` uses it
    for the kept content, ``job.py --markdown-store`` for the upload
    filenames — a second inline copy of the window would silently
    desynchronize name from content if the rule ever changed."""
    from pyspark.sql.window import Window

    return (
        prepared.withColumn("_rn", F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("_input_hash").desc())))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def notify_completion(callback, payload: dict) -> None:
    """Post-commit hook — the engine's webhook analog (reference
    ``app/main.py:879-915``: POST of {task_id, status, detail, totals, url}
    on task end, errors logged and swallowed).  Batch form: ``callback`` is
    any callable invoked with the run-summary payload after a successful
    commit, after a no-op, and on failure; a crashing callback never takes
    the run down with it (the commit already happened)."""
    if callback is None:
        return
    try:
        callback(dict(payload))
    except Exception as exc:  # mirror the reference's swallow-and-log
        import warnings

        warnings.warn(f"completion callback failed: {type(exc).__name__}: {exc}",
                      stacklevel=2)


def _bucket_summaries(df) -> dict[str, list]:
    """Per-bucket [doc_count, sum(_input_hash), sum(xxhash64(_input_hash))]
    — an order-insensitive content fingerprint of each bucket's doc set.
    The decimal(38,0) sums cannot overflow (xxhash64 values are |x| < 2^63;
    10^38 headroom) and are serialized as strings so JSON round-trips
    exactly.

    Two INDEPENDENT hash sums (the raw hash and a re-hash of it), because a
    single additive sum can collide when multiple doc changes in one bucket
    cancel out (advice r2): delta_a + delta_b = 0 is a 64-bit coincidence,
    but the same docs cancelling in the re-hashed space too is a ~128-bit
    one — cancellation cannot be engineered without breaking xxhash64."""
    rows = df.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_input_hash").cast("decimal(38,0)")).alias("s"),
        F.sum(F.xxhash64(F.col("_input_hash")).cast("decimal(38,0)")).alias("s2"),
    ).collect()
    return {str(r["_bucket"]): [int(r["n"]), str(r["s"]), str(r["s2"])] for r in rows}


_EMPTY_SUM = [0, "0", "0"]

class _RunStatsParam:
    """Dict-merging accumulator param for the kernel's run stats
    (``("p", pid) -> (docs, bytes, failures, rejects, wall_ms)`` and
    ``("b", bucket) -> (n, sum_hash, sum_rehash)``; one ``add`` per task).

    Declared here (not batch.py) so the worker-side closure only pickles a
    tiny class.  Inherits nothing: pyspark's AccumulatorParam is a plain
    duck-typed interface (zero / addInPlace)."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            cur = a.get(k)
            a[k] = tuple(v) if cur is None else tuple(x + y for x, y in zip(cur, v))
        return a


# Kill-switch for the in-write stats accumulator (tests force the fallback
# path through here; operationally always on — the observe cross-check
# below already degrades to the scan on any mismatch).
_USE_STATS_ACC = True
_ACC_MISMATCH_WARNED = False


def _process_and_commit(spark, store, prepared, root, buckets, run_id, *,
                        num_partitions, allow_overwrite, n_buckets,
                        max_doc_bytes=None, extra_bucket_sums=None,
                        carry_rows=None, expected_parent="__unset__") -> dict:
    # Per-stage walls (verdict item: scan-vs-python-vs-write visibility for
    # 100x plan audits).  extract_and_write is one fused Spark action — the
    # scan, the Python extraction and the parquet write pipeline together by
    # design (no Exchange before mapInArrow), so the split of THAT stage is
    # the lineage table's per-partition wall_ms (pure Python time) vs the
    # remainder (scan + write + codec).
    timings: dict[str, int] = {}
    t0 = time.perf_counter()
    # Run stats (per-partition lineage counters + per-bucket content
    # fingerprints) fold into the write itself via an accumulator the
    # kernel bumps once per task (make_extract_kernel) — at scale the
    # alternative is a second pass over the files just written, which at
    # 100 TB is a second scan of the run's entire output.  Exactly-once:
    # the write is a single result stage, and the totals are additionally
    # cross-checked against the observe metrics below before being trusted
    # (any mismatch falls back to the exact post-write scan).
    stats_acc = (spark.sparkContext.accumulator({}, _RunStatsParam())
                 if _USE_STATS_ACC else None)
    out = run_extraction(prepared, num_partitions=num_partitions,
                         max_doc_bytes=max_doc_bytes, stats_acc=stats_acc)
    fresh = F.lit(True)
    if carry_rows is not None:
        # Doc-level merge: committed rows of the dirty buckets that the
        # input did NOT replace are carried into the new run dir verbatim
        # (their instrumentation columns included), so remapping the bucket
        # keeps them live without re-extracting.  The flag column marks
        # which side each row came from so the run-stat observation can
        # book only this run's real work (carried rows' extraction was
        # booked by the run that produced them); it is dropped again below
        # the observe node, so the written schema is unchanged.
        out = (out.withColumn("_fresh", F.lit(True))
               .unionByName(carry_rows.withColumn("_fresh", F.lit(False))))
        fresh = F.col("_fresh")

    # Whole-run stat metrics ride the WRITE action as df.observe metrics —
    # CollectMetrics is a narrow node (the zero-Exchange-before-mapInArrow
    # plan survives) and launches NO extra job.  They are restricted to
    # this run's REAL work via the carried-flag conditional, so every path
    # (fresh table, incremental, merge) books lifetime totals at commit,
    # and they double as the independent cross-check for the accumulator's
    # kernel-side stats (computed by different machinery on the same rows).
    # The per-bucket observe PIVOT that used to sit here (r5..r7) was
    # retired in round 8: its conditional aggregates cost per-ROW time
    # (measured, BENCH/OBSERVE_SWEEP.md) while the accumulator folds the
    # same fingerprints into the kernel's existing columnar pass.
    obs = Observation(f"run-stats-{run_id}")
    obs_exprs = [
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.when(fresh, F.col("_wall_ms"))).alias("_wall_ms_total"),
        F.count(F.when(fresh, 1)).alias("_fresh_total"),
        F.count(F.when(fresh & (F.col("status") == "failed"), 1)).alias("_failed"),
        F.count(F.when(fresh & (F.col("status") == "rejected"), 1)).alias("_rejected"),
    ]
    out = out.observe(obs, *obs_exprs)
    if carry_rows is not None:
        out = out.drop("_fresh")  # projection sits ABOVE the observe node

    data_dir = os.path.join(root, "data", f"run={run_id}")
    out.write.parquet(data_dir, mode="overwrite")
    timings["extract_and_write_ms"] = int((time.perf_counter() - t0) * 1000)

    t0 = time.perf_counter()
    written = spark.read.schema(INSTRUMENTED_DDL).parquet(data_dir)
    m = obs.get

    # Primary path: the kernel-side accumulator already holds both
    # post-write aggregates — per-partition lineage stats (fresh work only
    # by construction: carried merge rows never pass the kernel) and
    # per-bucket content fingerprints.  Trust it only after its totals
    # reconcile with the observe metrics computed by independent machinery
    # on the same action (guards codepath bugs and any exotic retry
    # semantics).  Merge runs still need one _bucket_summaries scan: bucket
    # fingerprints cover ALL live rows, carried included.
    lineage_stats = None  # [(pid, (docs, bytes, failures, rejects, wall))]
    bucket_sums = None
    if stats_acc is not None:
        acc = stats_acc.value
        p_stats = {int(k[1]): v for k, v in acc.items() if k[0] == "p"}
        b_stats = {int(k[1]): v for k, v in acc.items() if k[0] == "b"}
        acc_ok = (
            sum(v[0] for v in p_stats.values()) == int(m["_fresh_total"])
            and sum(v[2] for v in p_stats.values()) == int(m["_failed"])
            and sum(v[3] for v in p_stats.values()) == int(m["_rejected"])
            and sum(v[4] for v in p_stats.values()) == int(m["_wall_ms_total"] or 0)
            and sum(v[0] for v in b_stats.values()) == int(m["_fresh_total"])
        )
        if acc_ok:
            lineage_stats = sorted(p_stats.items())
            if carry_rows is None:
                bucket_sums = {str(b): [int(v[0]), str(v[1]), str(v[2])]
                               for b, v in b_stats.items()}
            else:
                bucket_sums = _bucket_summaries(written)
        else:  # pragma: no cover - exercised via _USE_STATS_ACC in tests
            global _ACC_MISMATCH_WARNED
            if not _ACC_MISMATCH_WARNED:
                _ACC_MISMATCH_WARNED = True
                warnings.warn(
                    "run-stats accumulator disagreed with observe metrics; "
                    "falling back to the post-write scan for this run",
                    RuntimeWarning, stacklevel=2)

    if lineage_stats is None:
        # Fallback: ONE fused metadata job over the just-written run dir —
        #   grouping (_pid)    -> per-partition lineage rows (fresh only)
        #   grouping (_bucket) -> per-bucket fingerprints (all live rows)
        # O(partitions + buckets) rows collected driver-side.
        if carry_rows is not None:
            agg_src = written.join(
                carry_rows.select("doc_id").withColumn("_carried", F.lit(True)),
                "doc_id", "left")
            fresh_row = F.col("_carried").isNull()
        else:
            agg_src = written
            fresh_row = F.lit(True)
        fused_rows = agg_src.groupingSets([["_pid"], ["_bucket"]], "_pid", "_bucket").agg(
            F.count(F.when(fresh_row, 1)).alias("doc_count"),
            F.sum(F.when(fresh_row, F.col("_bytes"))).alias("bytes"),
            F.count(F.when(fresh_row & (F.col("status") == "failed"), 1)).alias("parse_failures"),
            F.count(F.when(fresh_row & (F.col("status") == "rejected"), 1)).alias("rejected"),
            F.sum(F.when(fresh_row, F.col("_wall_ms"))).alias("wall_ms"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_input_hash").cast("decimal(38,0)")).alias("s"),
            F.sum(F.xxhash64(F.col("_input_hash")).cast("decimal(38,0)")).alias("s2"),
        ).collect()
        # Partitions whose every row was carried booked their work in the
        # run that produced them: doc_count 0 -> no lineage row (same rows
        # the old anti-join produced).
        lineage_stats = [
            (int(r["_pid"]), (int(r["doc_count"]), int(r["bytes"] or 0),
                              int(r["parse_failures"]), int(r["rejected"]),
                              int(r["wall_ms"] or 0)))
            for r in fused_rows if r["_pid"] is not None and r["doc_count"]]
        # ``or 0``: a bucket whose _input_hash is all-null (n > 0) must
        # store "0", not the literal string "None" (advice r8 — the old
        # observe path guarded the same way).
        bucket_sums = {str(r["_bucket"]): [int(r["n"]), str(r["s"] or 0),
                                           str(r["s2"] or 0)]
                       for r in fused_rows
                       if r["_bucket"] is not None and r["n"]}
    for b in buckets:  # a wholesale-deleted bucket has zero rows: record it
        bucket_sums.setdefault(str(b), list(_EMPTY_SUM))
    docs = sum(v[0] for v in bucket_sums.values())
    if extra_bucket_sums:
        # Summaries recomputed for CLEAN buckets (pre-s2 manifests): carried
        # in this commit so the next upsert's no-op detection is O(manifest)
        # again — without this, migrated tables re-aggregate their committed
        # data on EVERY upsert, forever.  Merged first: the dirty buckets'
        # fresh sums must win.
        bucket_sums = {**extra_bucket_sums, **bucket_sums}
    timings["summarize_ms"] = int((time.perf_counter() - t0) * 1000)
    t0 = time.perf_counter()

    # Commit FIRST, then stamp lineage with the snapshot id the commit
    # actually produced — a concurrent disjoint-bucket commit can advance
    # CURRENT between planning and commit, and a precomputed id would leave
    # the lineage table stamped with a stale snapshot.  A crash between
    # commit and the lineage write only loses metrics rows (read_lineage
    # skips missing run dirs), never data.
    run_stats = {
        "docs": int(m["_fresh_total"]),
        "parse_failures": int(m["_failed"]),
        "rejected": int(m["_rejected"]),
        "wall_ms": int(m["_wall_ms_total"] or 0),
    }
    snapshot_id = store.commit(buckets, run_id, allow_overwrite=allow_overwrite,
                               n_buckets=n_buckets, bucket_sums=bucket_sums,
                               expected_parent_snapshot_id=expected_parent,
                               run_stats=run_stats)
    timings["commit_ms"] = int((time.perf_counter() - t0) * 1000)

    # Lineage rows come from the in-write accumulator (or the fused
    # fallback job) — carried merge rows excluded in both: re-booking them
    # on every merge would inflate lineage totals without bound in a
    # streaming deployment.  Stamp them with the snapshot id the commit
    # actually produced and write driver-side (metadata-sized, no Spark
    # job — see _write_lineage_rows).
    t0 = time.perf_counter()
    _write_lineage_rows(
        [{"run_id": run_id, "snapshot_id": int(snapshot_id),
          "partition_id": int(pid), "doc_count": int(v[0]),
          "bytes": int(v[1]), "parse_failures": int(v[2]),
          "rejected": int(v[3]), "wall_ms": int(v[4])}
         for pid, v in lineage_stats],
        os.path.join(root, "lineage", f"run={run_id}"))
    timings["lineage_ms"] = int((time.perf_counter() - t0) * 1000)
    summary = {"run_id": run_id, "snapshot_id": snapshot_id, "buckets": buckets,
               "docs": docs, "timings_ms": timings,
               # This run's REAL work (carried merge rows excluded) — the
               # same quantities the lineage table books for the run.
               "run_stats": run_stats}
    return summary


def run_upsert(
    spark: SparkSession,
    input_df: DataFrame,
    root: str,
    *,
    n_buckets: int = 64,
    num_partitions: Optional[int] = None,
    run_id: Optional[str] = None,
    on_complete=None,
    max_doc_bytes: Optional[int] = None,
) -> dict:
    """Copy-on-write upsert: reprocess only buckets containing new or changed
    documents (``_input_hash`` mismatch vs the committed snapshot), rewrite
    those buckets wholesale from the new input, and remap them in the
    manifest.  Unchanged buckets keep their existing files untouched; fully
    shadowed runs become vacuum-able orphans.

    Semantics per dirty bucket = full replacement from the new input: a doc
    absent from the new input disappears from that bucket (the bucket's
    summary changes); docs in clean buckets are never touched.

    Change detection is a per-bucket summary compare: the manifest carries
    [doc_count, sum(_input_hash)] per committed bucket, and the input's
    summaries come from one aggregate over the input — so a cron-style
    no-op upsert costs O(input scan) + O(buckets) and reads ZERO committed
    data files (round-1 verdict: the old full-outer diff paid O(table) every
    run).  Buckets missing a committed summary (tables committed by older
    code) fall back to one pruned aggregate over just those buckets.
    """
    store = SnapshotStore(root)
    store.check_n_buckets(n_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    prepared = prepare_input(input_df, n_buckets)

    in_sums = _bucket_summaries(prepared.select("_bucket", "_input_hash"))
    committed = store.committed_buckets()
    committed_sums = dict((store.current_manifest() or {}).get("bucket_sums") or {})
    # Buckets with no summary, or a short [n, s] one from pre-s2 code, are
    # recomputed from their committed data (one pruned aggregate).
    missing = [b for b in committed
               if len(committed_sums.get(b) or []) != len(_EMPTY_SUM)]
    for b in missing:
        committed_sums.pop(b, None)  # drop short [n, s] entries from pre-s2 code
    if missing:  # pre-summary table: one aggregate over only those buckets
        old = store.read_output(spark, instrumented=True).filter(
            F.col("_bucket").isin([int(b) for b in missing])
        )
        committed_sums.update(_bucket_summaries(old.select("_bucket", "_input_hash")))
        for b in missing:
            committed_sums.setdefault(b, list(_EMPTY_SUM))

    dirty_buckets = sorted(
        b for b in range(n_buckets)
        if in_sums.get(str(b), _EMPTY_SUM)
        != (committed_sums.get(str(b), _EMPTY_SUM) if str(b) in committed else _EMPTY_SUM)
    )
    recomputed = {b: committed_sums[b] for b in missing if b in committed_sums}
    if not dirty_buckets:
        snapshot_id = None
        if recomputed:
            # Metadata-only commit (bucket→run mapping unchanged): persist the
            # summaries recomputed for pre-s2 manifests so the NEXT no-op
            # upsert reads zero data files again, instead of re-aggregating
            # the committed table on every cron run forever.
            snapshot_id = store.commit([], run_id, allow_overwrite=True,
                                       n_buckets=n_buckets, bucket_sums=recomputed)
        summary = {"run_id": run_id, "snapshot_id": snapshot_id, "buckets": [], "docs": 0}
        notify_completion(on_complete, {**summary, "status": "noop", "detail": None})
        return summary

    todo_input = prepared.filter(F.col("_bucket").isin(dirty_buckets))
    clean_recomputed = {b: s for b, s in recomputed.items() if int(b) not in dirty_buckets}
    return _run_with_hook(spark, store, todo_input, root, dirty_buckets, run_id, on_complete,
                          num_partitions=num_partitions, allow_overwrite=True,
                          n_buckets=n_buckets, max_doc_bytes=max_doc_bytes,
                          extra_bucket_sums=clean_recomputed or None)


def run_merge_upsert(
    spark: SparkSession,
    input_df: DataFrame,
    root: str,
    *,
    n_buckets: int = 64,
    num_partitions: Optional[int] = None,
    run_id: Optional[str] = None,
    on_complete=None,
    max_doc_bytes: Optional[int] = None,
    keep_prepared: bool = False,
) -> dict:
    """Doc-level MERGE (upsert for PARTIAL inputs): input docs are inserted
    or updated; docs absent from the input are untouched.

    ``run_upsert`` replaces dirty buckets WHOLESALE from the input — correct
    for full-corpus re-syncs (absent = deleted), catastrophic for partial
    batches: a 5-doc micro-batch would silently delete every sibling doc in
    its buckets.  This variant diffs at the DOC level (input hash vs the
    committed hash, touched buckets only — the bucket filter pushes into the
    parquet scan, so the diff costs O(touched buckets), not O(table)),
    re-extracts only the new/changed docs, and carries the dirty buckets'
    unreplaced committed rows into the new run dir verbatim.  Copy-on-write
    granularity stays bucket-level; correctness is doc-level.

    Exactly-once under replay: a re-run of an already-merged batch diffs to
    zero changed docs and no-ops.  Summary: ``docs`` counts every row
    materialized into the rewritten buckets (kept + changed — the bucket
    summaries are derived from them); ``docs_changed`` is this batch's real
    work (lineage books only the changed rows, so merge runs never re-book
    carried siblings' extraction metrics).

    Duplicate doc_ids WITHIN one batch (two versions of the same doc in one
    trigger) collapse to one row before diffing — the pick is deterministic
    (max ``_input_hash``) but arbitrary between versions, since a DataFrame
    carries no arrival order; deployments needing strict last-wins should
    bound ``maxFilesPerTrigger`` so versions land in separate batches.

    Concurrency: the commit is compare-and-swap on the PLANNED parent
    snapshot — carried rows were read from it, so committing onto any other
    parent would silently drop a concurrent writer's docs from shared
    buckets.  A lost race raises ``SnapshotConflictError``; re-run the
    merge (the replayed diff skips whatever already landed).

    ``keep_prepared=True`` attaches the deduped prepared frame (STILL
    persisted) to the summary as ``prepared_deduped`` so downstream
    consumers (job.py's merge-mode markdown upload, which needs the kept
    version's ``source.original_name``) reuse the cached frame instead of
    re-running prepare_input + the dedup window shuffle over the full input.
    The caller owns ``unpersist()``."""
    store = SnapshotStore(root)
    store.check_n_buckets(n_buckets)
    run_id = run_id or uuid.uuid4().hex[:12]
    prepared = dedup_latest_version(prepare_input(input_df, n_buckets)).persist()
    handed_off = False

    def _finish(summary: dict) -> dict:
        nonlocal handed_off
        if keep_prepared:
            summary["prepared_deduped"] = prepared
            handed_off = True
        return summary

    try:
        parent_manifest = store.current_manifest()
        expected_parent = parent_manifest["snapshot_id"] if parent_manifest else None
        touched = sorted(r["_bucket"] for r in
                         prepared.select("_bucket").distinct().collect())
        committed = store.committed_buckets()
        committed_touched = [b for b in touched if str(b) in committed]
        old = store.read_output(spark, instrumented=True)
        if committed_touched:
            old_keys = (
                old.filter(F.col("_bucket").isin(committed_touched))
                .select("doc_id", F.col("_input_hash").alias("_old_hash"))
            )
            changed = (
                prepared.join(old_keys, "doc_id", "left")
                .filter(F.col("_old_hash").isNull()
                        | (F.col("_old_hash") != F.col("_input_hash")))
                .drop("_old_hash")
            )
            changed = changed.persist()
            own_changed = True
        else:
            # No committed buckets touched: every input doc is new, so
            # ``changed`` IS the (already persisted) prepared frame — a
            # second persist/unpersist pair on the same plan would evict
            # prepared's cache entry out from under keep_prepared callers.
            changed = prepared
            own_changed = False
        try:
            dirty_buckets = sorted(r["_bucket"] for r in
                                   changed.select("_bucket").distinct().collect())
            if not dirty_buckets:
                summary = {"run_id": run_id, "snapshot_id": None, "buckets": [],
                           "docs": 0, "docs_changed": 0}
                notify_completion(on_complete, {**summary, "status": "noop", "detail": None})
                return _finish(summary)
            n_changed = changed.count()
            dirty_committed = [b for b in dirty_buckets if str(b) in committed]
            carry = None
            if dirty_committed:
                carry = (
                    old.filter(F.col("_bucket").isin(dirty_committed))
                    .join(changed.select("doc_id"), "doc_id", "left_anti")
                )
            return _finish(_run_with_hook(
                spark, store, changed, root, dirty_buckets, run_id, on_complete,
                num_partitions=num_partitions, allow_overwrite=True,
                n_buckets=n_buckets, max_doc_bytes=max_doc_bytes, carry_rows=carry,
                expected_parent=expected_parent,
                extra_summary={"docs_changed": n_changed},
            ))
        finally:
            if own_changed:
                changed.unpersist()
    finally:
        # On exception paths the frame is never handed off — unpersist even
        # when keep_prepared was requested (no handle would reach the caller).
        if not handed_off:
            prepared.unpersist()
