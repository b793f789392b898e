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


# Below this much compressed input the serial narrow chain is sub-second and
# the spread's own shuffle + per-task overhead costs more than it saves —
# measured crossover: 0.6 MB (sf0.1, spread loses ~0.3 s) vs 5.8 MB (sf1,
# spread wins 1.4-5.7 s).  Non-local paths skip the stat and spread (at
# cluster scale the spread is what you want).
SPREAD_MIN_BYTES = 2 * 1024 * 1024


def _local_input_bytes(path: str):
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        return sum(e.stat().st_size for e in os.scandir(path)
                   if e.is_file() and not e.name.startswith((".", "_")))
    return None  # non-local / missing: caller assumes big


def spread(df: DataFrame, key: str = "doc_id", *, path: str | None = None) -> DataFrame:
    """Deterministic hash repartition to engine parallelism — input-skew
    defusal for driver-provided tables whose file layout is unsplittable
    (r9, guide §2.5 "input skew: fix at the source or repartition after the
    read").  Measured at sf1: ``documents.parquet`` is ONE file with ONE
    row group, so every narrow chain after the scan (tokenize, shingle,
    regex, hash) ran in a single task until its first Exchange — q33's
    shingling alone was 3 s serial.  The key is hashed with xxhash64 (a
    deterministic synthetic key — retried tasks reproduce the assignment,
    unlike rand-derived keys) and Spark re-hashes it with murmur3.

    Partition count is defaultParallelism, NOT the 4× granularity the
    extraction pipeline uses for straggler amortization: these are uniform
    driver rows, and the sweep measured per-task overhead scaling with
    partition count (q61 at sf1: 0.71 s @32, 1.00 @64, 1.58 @128 — 4×
    granularity buys nothing and pays double).  ``path`` (the table's file
    path) gates the spread on SPREAD_MIN_BYTES so tiny inputs keep their
    zero-shuffle plans.  Used by the heavy TEXT queries; the embedding
    queries skip it (their narrow work is NumPy-vectorized and a 20k-row
    batch is milliseconds serial)."""
    if path is not None:
        nbytes = _local_input_bytes(path)
        if nbytes is not None and nbytes < SPREAD_MIN_BYTES:
            return df
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism,
                          F.xxhash64(F.col(key)))


def load_docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, spread iff it is big enough to pay for it."""
    return spread(load(spark, sf_dir, "documents"),
                  path=f"{sf_dir}/documents.parquet")
