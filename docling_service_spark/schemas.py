"""Canonical schemas (Spark StructTypes + matching PyArrow schemas).

Input shape is fixed by BASELINE.json `input_hint`; output/lineage shapes per
FIXTURES.md §2-3 mirror the reference's ImageInfo / TableInfo / PageDimensions
records (reference: ``app/main.py:55-113, 750-761, 842-851``).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: the interleaved-span corpus (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

# Optional ingestion metadata (reference ConversionSource, app/main.py:44-51:
# kind 'upload'|'url', value = filename-or-URL, original_name).  Extra input
# columns flow through the Arrow batches untouched; the kernel reads `source`
# when present and stamps source_filename in the metadata block.
SOURCE_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("original_name", T.StringType()),
    ]
)

INPUT_SCHEMA_WITH_SOURCE = T.StructType(
    list(INPUT_SCHEMA) + [T.StructField("source", SOURCE_STRUCT)]
)

SOURCE_ARROW = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("value", pa.string()),
        pa.field("original_name", pa.string()),
    ]
)

SPAN_ARROW = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

INPUT_ARROW = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_ARROW)),
    ]
)

# ---------------------------------------------------------------------------
# Output: extracted documents (FIXTURES.md §2)
# ---------------------------------------------------------------------------

IMAGE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("coord_origin", T.StringType()),
        T.StructField("x_norm", T.DoubleType()),
        T.StructField("y_norm", T.DoubleType()),
        T.StructField("width_norm", T.DoubleType()),
        T.StructField("height_norm", T.DoubleType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

TABLE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("num_rows", T.IntegerType()),
        T.StructField("num_cols", T.IntegerType()),
        T.StructField("caption", T.StringType()),
    ]
)

PAGE_STRUCT = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("images", T.ArrayType(IMAGE_STRUCT)),
        T.StructField("tables", T.ArrayType(TABLE_STRUCT)),
        T.StructField("pages", T.ArrayType(PAGE_STRUCT)),
        T.StructField("markdown", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("detail", T.StringType()),
    ]
)

IMAGE_ARROW = pa.struct(
    [
        pa.field("id", pa.string()),
        pa.field("page", pa.int32()),
        pa.field("x", pa.float64()),
        pa.field("y", pa.float64()),
        pa.field("width", pa.float64()),
        pa.field("height", pa.float64()),
        pa.field("coord_origin", pa.string()),
        pa.field("x_norm", pa.float64()),
        pa.field("y_norm", pa.float64()),
        pa.field("width_norm", pa.float64()),
        pa.field("height_norm", pa.float64()),
        pa.field("content_hash", pa.string()),
    ]
)

TABLE_ARROW = pa.struct(
    [
        pa.field("id", pa.string()),
        pa.field("page", pa.int32()),
        pa.field("x", pa.float64()),
        pa.field("y", pa.float64()),
        pa.field("width", pa.float64()),
        pa.field("height", pa.float64()),
        pa.field("num_rows", pa.int32()),
        pa.field("num_cols", pa.int32()),
        pa.field("caption", pa.string()),
    ]
)

PAGE_ARROW = pa.struct(
    [
        pa.field("page", pa.int32()),
        pa.field("width", pa.float64()),
        pa.field("height", pa.float64()),
    ]
)

OUTPUT_ARROW = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_ARROW)),
        pa.field("images", pa.list_(IMAGE_ARROW)),
        pa.field("tables", pa.list_(TABLE_ARROW)),
        pa.field("pages", pa.list_(PAGE_ARROW)),
        pa.field("markdown", pa.string()),
        pa.field("status", pa.string()),
        pa.field("detail", pa.string()),
    ]
)

# Instrumentation columns carried through mapInArrow so lineage can be
# aggregated columnar-side (dropped before the output table is written).
OUTPUT_ARROW_INSTRUMENTED = pa.schema(
    list(OUTPUT_ARROW)
    + [
        pa.field("_pid", pa.int32()),
        pa.field("_bytes", pa.int64()),
        pa.field("_wall_ms", pa.int64()),  # batch wall time on first row of batch, else 0
        pa.field("_bucket", pa.int32()),   # resume/upsert bucket (passthrough)
        pa.field("_input_hash", pa.int64()),  # content hash of the raw spans (passthrough)
    ]
)

# ---------------------------------------------------------------------------
# Lineage / metrics table (north_rule; FIXTURES.md §3)
# ---------------------------------------------------------------------------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("doc_count", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("parse_failures", T.LongType()),
        T.StructField("rejected", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
)
