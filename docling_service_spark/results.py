"""Result-retrieval projections over the extraction output table.

The reference exposes results in three shapes (SURVEY.md §2 A15/A16;
``app/main.py:1110-1354``): raw markdown download, markdown+names JSON, and
the "enhanced" reshape that optionally strips normalized coordinates.  In the
engine these are pure DataFrame projections — nested-struct transforms, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NORM_FIELDS = ("x_norm", "y_norm", "width_norm", "height_norm")


def markdown_only(out_df: DataFrame) -> DataFrame:
    """``GET /api/result/{id}/download`` analog (app/main.py:1143-1149)."""
    return out_df.filter(F.col("status") == "completed").select("doc_id", "markdown")


def markdown_json(out_df: DataFrame) -> DataFrame:
    """``GET /api/result/{id}/markdown`` analog (app/main.py:1163-1181)."""
    return out_df.filter(F.col("status") == "completed").select(
        "doc_id",
        "markdown",
        F.concat(F.col("doc_id"), F.lit(".md")).alias("filename"),
    )


def _strip_norm(images_col):
    """Rebuild each image struct without the *_norm fields
    (include_normalized=false, app/main.py:1271-1277)."""
    kept = ["id", "page", "x", "y", "width", "height", "coord_origin", "content_hash"]
    return F.transform(
        images_col,
        lambda img: F.struct(*[img[f].alias(f) for f in kept]),
    )


def enhanced_result(out_df: DataFrame, *, include_normalized: bool = True) -> DataFrame:
    """``GET /api/result/{id}/enhanced`` analog (app/main.py:1205-1354)."""
    images = F.col("images") if include_normalized else _strip_norm(F.col("images"))
    return out_df.filter(F.col("status") == "completed").select(
        "doc_id",
        "markdown",
        images.alias("images"),
        "tables",
        "pages",
        F.struct(
            F.size("pages").alias("total_pages"),
            F.size("images").alias("total_images"),
            F.size("tables").alias("total_tables"),
            F.col("doc_id").alias("source_filename"),
        ).alias("metadata"),
    )


def status_rollup(out_df: DataFrame) -> DataFrame:
    """``GET /api/status`` over the whole corpus (app/main.py:1110-1140):
    status becomes data, polling becomes a groupBy."""
    return out_df.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.coalesce(F.col("spans"), F.array()))).cast("bigint").alias("n_spans"),
    )


def failed_docs(out_df: DataFrame) -> DataFrame:
    """Failure report (detail column mirrors app/main.py:338-345)."""
    return out_df.filter(F.col("status") == "failed").select("doc_id", "detail")
