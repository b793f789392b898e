"""Vectorized batch extractor: Arrow RecordBatches in, Arrow RecordBatches out.

Why ``mapInArrow`` and not a pandas UDF: the input column is
``array<struct<...>>``; Series-to-Series pandas UDFs do not accept nested
struct input, while Arrow record batches carry it natively (SURVEY.md §2
Part B, UDF surface row).  There is no per-row Python at the Spark API level
(north_rule) — Python receives whole columnar batches over Arrow.

Instrumentation: every row carries its task partition id and payload byte
count; the first row of each batch carries the batch's extraction wall time.
Summing ``_wall_ms`` per partition therefore yields the partition's total
extraction time — lineage is derived downstream with one cheap columnar
aggregation instead of a second execution of the extractor.
"""

from __future__ import annotations

import time
from typing import Iterator

import pyarrow as pa

from ..engine.extract import extract_document
from ..schemas import OUTPUT_ARROW_INSTRUMENTED

INSTRUMENTED_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "images array<struct<id:string,page:int,x:double,y:double,width:double,height:double,"
    "coord_origin:string,x_norm:double,y_norm:double,width_norm:double,height_norm:double,"
    "content_hash:string>>, "
    "tables array<struct<id:string,page:int,x:double,y:double,width:double,height:double,"
    "num_rows:int,num_cols:int,caption:string>>, "
    "pages array<struct<page:int,width:double,height:double>>, "
    "markdown string, status string, detail string, "
    "_pid int, _bytes bigint, _wall_ms bigint, _bucket int, _input_hash bigint"
)

INSTRUMENTATION_COLS = ["_pid", "_bytes", "_wall_ms", "_bucket", "_input_hash"]

# Passthrough columns: computed JVM-side before the Python stage and echoed
# by the kernel — `_bucket` (resume/upsert granularity) and `_input_hash`
# (change detection for copy-on-write upserts, checkpoint.run_upsert).
PASSTHROUGH_COLS = ["_bucket", "_input_hash"]


# Oversized-document cap — the reference rejects uploads > 25 MiB with a 413
# before any conversion work (app/config.py:14 max_upload_mb,
# app/main.py:1083-1087).  The batch analog: a doc whose total span payload
# exceeds the cap is routed to a status='rejected' row WITHOUT running the
# extractor (the size check reuses the instrumentation byte count, so the
# reject path costs O(bytes-scan), not O(extraction)), and rejects are
# counted per-partition in lineage.
MAX_DOC_BYTES = 25 * 1024 * 1024


def _failed_row(doc_id: str, exc: Exception) -> dict:
    # Mirrors the reference's catch-all per-task failure path
    # (app/main.py:338-345): record detail, never kill the job.
    return {
        "doc_id": doc_id,
        "spans": None,
        "images": None,
        "tables": None,
        "pages": None,
        "markdown": None,
        "status": "failed",
        "detail": f"{type(exc).__name__}: {exc}",
    }


def _rejected_row(doc_id: str, nbytes: int, cap: int) -> dict:
    # Reference raises 413 REQUEST_ENTITY_TOO_LARGE with detail
    # "Uploaded file exceeds 25 MiB limit" (app/main.py:1084-1087).
    return {
        "doc_id": doc_id,
        "spans": None,
        "images": None,
        "tables": None,
        "pages": None,
        "markdown": None,
        "status": "rejected",
        "detail": f"document too large ({nbytes} bytes > {cap} byte cap)",
    }


def _span_bytes(spans) -> int:
    if not spans:
        return 0
    total = 0
    for s in spans:
        t = s.get("text")
        m = s.get("media_ref")
        total += (len(t) if t else 0) + (len(m) if m else 0) + 8
    return total


def make_extract_kernel(max_doc_bytes: int = MAX_DOC_BYTES):
    """Build the mapInArrow kernel with an oversized-doc cap (see
    MAX_DOC_BYTES).  Pure w.r.t. row content; safe under task retry."""

    def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        try:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
        except Exception:  # pragma: no cover - outside Spark
            pid = -1

        schema = pa.schema(list(OUTPUT_ARROW_INSTRUMENTED))
        for batch in batches:
            t0 = time.perf_counter()
            have_passthrough = "_bucket" in batch.schema.names
            out_rows: list[dict] = []
            for row in batch.to_pylist():
                doc_id = row["doc_id"]
                spans = row["spans"]
                nbytes = _span_bytes(spans)
                if nbytes > max_doc_bytes:
                    res = _rejected_row(doc_id, nbytes, max_doc_bytes)
                else:
                    try:
                        res = extract_document(doc_id, spans, row.get("source"))
                    except Exception as exc:  # noqa: BLE001 — per-doc failure isolation
                        res = _failed_row(doc_id, exc)
                res["_pid"] = pid
                res["_bytes"] = nbytes
                res["_wall_ms"] = 0
                res["_bucket"] = row.get("_bucket") if have_passthrough else None
                res["_input_hash"] = row.get("_input_hash") if have_passthrough else None
                out_rows.append(res)
            if out_rows:
                out = pa.RecordBatch.from_pylist(out_rows, schema=schema)
                # Batch wall includes the Arrow decode/encode, not just the
                # extractor — lineage wall_ms is the true Python-stage cost.
                wall = pa.array([int((time.perf_counter() - t0) * 1000)] + [0] * (len(out_rows) - 1),
                                type=pa.int64())
                yield out.set_column(out.schema.get_field_index("_wall_ms"), "_wall_ms", wall)

    return extract_batches


extract_batches = make_extract_kernel()
