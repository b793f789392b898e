"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The events table carries TIMESTAMP_NTZ; date/epoch queries cast it to
    # TIMESTAMP, which is session-timezone-dependent.  The DuckDB oracles
    # treat naive timestamps as UTC, so pin the session to UTC here — the
    # driver's session is not ours to configure up front.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
