#!/usr/bin/env python3
"""Freeze the q60 expected per-doc extraction summary (round-3 verdict #5).

The synthetic corpus is a pure function of (idx, seed) — corpus.build_doc —
and the extractor core is pure Python (engine.extract.extract_document), so
the expected per-doc summary can be materialized ONCE here, committed as
parquet, and q60's DuckDB oracle becomes a scan of it.  The golden is built
through the NON-Spark path on purpose: the Spark query then proves that the
distributed plumbing (mapInArrow batching, partitioning, failure isolation)
reproduces the per-doc pure function exactly — real signal, not an engine
self-comparison.

Run from the repo root:  python3 scripts/freeze_q60_golden.py
Rerun only when corpus.py, engine/extract.py, or the q60 summary shape
changes; commit the regenerated parquet.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_service_spark.corpus import build_doc  # noqa: E402
from docling_service_spark.engine.extract import extract_document  # noqa: E402
from docling_service_spark.queries.extraction import N_CORPUS_DOCS  # noqa: E402
from docling_service_spark.sparkio.batch import (  # noqa: E402
    MAX_DOC_BYTES,
    _failed_row,
    _rejected_row,
    _span_bytes,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docling_service_spark", "queries", "golden", "q60_expected.parquet",
)


def summarize(idx: int) -> dict:
    """Exactly the kernel's per-doc semantics (sparkio/batch.py:98-141):
    oversize → rejected pre-extractor, exceptions → failed, else extract."""
    doc = build_doc(idx, 42)  # corpus_df defaults: malformed_every=211, no source
    nbytes = _span_bytes(doc["spans"])
    if nbytes > MAX_DOC_BYTES:
        res = _rejected_row(doc["doc_id"], nbytes, MAX_DOC_BYTES)
    else:
        try:
            res = extract_document(doc["doc_id"], doc["spans"])
        except Exception as exc:  # noqa: BLE001 — kernel's per-doc isolation
            res = _failed_row(doc["doc_id"], exc)

    def n(col):  # q60's coalesce(size(col), -1)
        v = res[col]
        return len(v) if v is not None else -1

    return {
        "doc_id": res["doc_id"],
        "status": res["status"],
        "n_spans": n("spans"),
        "n_images": n("images"),
        "n_tables": n("tables"),
        "n_pages": n("pages"),
    }


def main() -> None:
    rows = [summarize(i) for i in range(N_CORPUS_DOCS)]
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("status", pa.string()),
        ("n_spans", pa.int64()),
        ("n_images", pa.int64()),
        ("n_tables", pa.int64()),
        ("n_pages", pa.int64()),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + 1
    print(f"wrote {len(rows)} rows to {OUT}; statuses: {by_status}")


if __name__ == "__main__":
    main()
