"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: the real extraction pipeline over the sf0.001
              ``documents`` table wrapped as interleaved-span HTML docs.
``queries`` — one entry per implemented operator (SURVEY.md §2): the
              extraction dataflow itself plus relational, text-analysis,
              dedup (exact/minhash/LSH/simhash/jaccard), similarity-search
              and multimodal-plumbing operators.
``oracle_sql`` — DuckDB equivalents for every query: q60 oracles against a
              committed golden parquet (scripts/freeze_q60_golden.py), q45
              against the frozen IVF quantizer — 44/44 oracled.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from docling_service_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q61_extract_html_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
