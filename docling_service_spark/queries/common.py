"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The events table carries TIMESTAMP_NTZ; date/epoch queries cast it to
    # TIMESTAMP, which is session-timezone-dependent.  The DuckDB oracles
    # treat naive timestamps as UTC, so pin the session to UTC here — the
    # driver's session is not ours to configure up front.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic hash repartition to engine parallelism — input-skew
    defusal for driver-provided tables whose file layout is unsplittable
    (r9, guide §2.5 "input skew: fix at the source or repartition after the
    read").  Measured at sf1: ``documents.parquet`` is ONE file with ONE
    row group, so every narrow chain after the scan (tokenize, shingle,
    regex, hash) ran in a single task until its first Exchange — q33's
    shingling alone was 3 s serial.  The key is hashed with xxhash64 (a
    deterministic synthetic key — retried tasks reproduce the assignment,
    unlike rand-derived keys) and Spark re-hashes it with murmur3, so P
    partitions see ~uniform load.  Used by the heavy TEXT queries; the
    embedding queries skip it (their narrow work is NumPy-vectorized and a
    20k-row batch is milliseconds serial)."""
    spark = df.sparkSession
    n = max(int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            spark.sparkContext.defaultParallelism * 4)
    return df.repartition(n, F.xxhash64(F.col(key)))
