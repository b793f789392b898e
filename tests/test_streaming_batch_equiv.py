"""Batch-equivalence oracles for the streaming event operators (r5 verdict
#5): the same event fixture replayed through independent BATCH logic (the
q16-style window agg, dropDuplicates, the q17-style lag/sum sessionizer)
must produce frame-equal results to the streaming output once the watermark
has closed over the fixture — turning "tested" into oracled-by-construction.

The sentinel protocol: two far-future waves for a sentinel user ratchet the
watermark past every normal event, so every closed window / expired session
flushes (finalization happens in the batch AFTER the ratchet, hence two
waves).  The sentinel's own rows stay open/unclosed and are excluded from
the comparisons that only see closed state."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from docling_service_spark.sparkio.streaming import (
    stream_dedup,
    stream_sessionize,
    stream_window_counts,
)

EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                 "event_type string, value double")
SENTINEL_USER = 999


def _t(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def _write_wave(spark, path, name, rows, mtime):
    tmp = f"{path}.{name}.tmp"
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(path, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


# Multi-user, multi-window fixture: 3 sessions for user 1, 2 for user 2,
# 1 for user 3 under the 30-min gap rule; events span the 10:00-13:00
# windows; event 21 is duplicated in-wave and replayed across waves.
_WAVE_1 = [
    (10, _t(10, 0), 1, "click", 1.0),
    (11, _t(10, 10), 1, "view", 2.0),
    (12, _t(10, 20), 1, "click", 3.0),
    (21, _t(10, 5), 2, "view", 4.0),
    (21, _t(10, 5), 2, "view", 4.0),      # in-wave duplicate
    (31, _t(10, 30), 3, "click", 5.0),
]
_WAVE_2 = [
    (13, _t(11, 30), 1, "click", 6.0),
    (14, _t(11, 40), 1, "view", 7.0),
    (21, _t(10, 5), 2, "view", 4.0),      # cross-wave replay (same bytes)
    (22, _t(12, 0), 2, "click", 8.0),
    (23, _t(12, 25), 2, "view", 9.0),
]
_WAVE_3 = [
    (15, _t(13, 0), 1, "click", 10.0),
]
# Sentinel waves: ratchet the watermark (30 min delay -> 22:50 final) past
# every normal event; 23:20 is within the gap of 23:00, so the sentinel's
# own session never closes, and its 23:00 window never finalizes.
_WAVE_S1 = [(91, _t(23, 0), SENTINEL_USER, "ping", 0.0)]
_WAVE_S2 = [(92, _t(23, 20), SENTINEL_USER, "ping", 0.0)]


def _land_fixture(spark, inp):
    os.makedirs(inp)
    base = time.time() - 1000
    for i, rows in enumerate([_WAVE_1, _WAVE_2, _WAVE_3, _WAVE_S1, _WAVE_S2]):
        _write_wave(spark, inp, f"w{i}", rows, base + 10 * i)


def _static_events(spark, inp):
    return (spark.read.schema(EVENTS_SCHEMA).parquet(inp)
            .withColumn("ts", F.col("ts").cast("timestamp")))


def test_stream_window_counts_equals_batch_window_agg(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _land_fixture(spark, inp)
    stream_window_counts(spark, inp, out, window="1 hour", watermark="30 minutes",
                         max_files_per_trigger=1)

    got = sorted(
        (r["window_start"], r["window_end"], r["event_type"],
         r["n_events"], r["total_value"])
        for r in spark.read.parquet(os.path.join(out, "data")).collect())

    # Independent batch recomputation (q16's groupBy-agg shape at the
    # stream's window granularity) over the closed part of the fixture.
    batch = sorted(
        (r["window_start"], r["window_end"], r["event_type"],
         r["n_events"], r["total_value"])
        for r in (
            _static_events(spark, inp)
            .filter(F.col("user_id") != SENTINEL_USER)  # sentinel never closes
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value")
        ).collect())
    assert got == batch
    assert len(got) >= 6  # the fixture spans >= 6 closed (window, type) groups


def test_stream_dedup_equals_batch_drop_duplicates(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _land_fixture(spark, inp)
    stream_dedup(spark, inp, out, watermark="30 minutes", max_files_per_trigger=1)

    got = sorted(tuple(r) for r in
                 spark.read.parquet(os.path.join(out, "data")).collect())
    # Batch oracle: replayed rows are byte-identical, so ANY dropDuplicates
    # survivor equals the stream's first-arrival row.  Dedup emits rows as
    # they arrive (state only suppresses), so the sentinel rows appear on
    # both sides.
    batch = sorted(tuple(r) for r in
                   _static_events(spark, inp).dropDuplicates(["event_id"]).collect())
    assert got == batch
    ids = [r[0] for r in got]
    assert len(ids) == len(set(ids))  # exactly-once by key
    assert 21 in ids  # the triple-delivered event survived exactly once


def test_stream_sessionize_equals_batch_gap_sessionizer(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _land_fixture(spark, inp)
    stream_sessionize(spark, inp, out, gap_minutes=30, watermark="30 minutes",
                      max_files_per_trigger=1)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out, "data")).collect())

    # Independent batch recomputation: q17's lag -> running-sum session
    # derivation, emitting per-session rows.  The sentinel's session never
    # closes in the stream (its timeout outruns the final watermark), so the
    # batch side drops that user.  NO dedup on either side: the sessionizer
    # counts every non-watermark-dropped arrival (the replayed 10:05 absorbs
    # into the open session, n_events +1 each time), and the batch window
    # logic counts the same three physical rows — the equivalence holds on
    # at-least-once input as long as both sides see identical rows.
    ev = (_static_events(spark, inp)
          .filter(F.col("user_id") != SENTINEL_USER))
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("t")
    sess = (
        ev.select("user_id", F.unix_micros("ts").alias("t"))
        .withColumn("new_session",
                    (F.coalesce(F.col("t") - F.lag("t").over(w),
                                F.lit(gap_us + 1)) > gap_us).cast("int"))
        .withColumn("session_no", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_no")
        .agg(F.timestamp_micros(F.min("t")).alias("session_start"),
             F.timestamp_micros(F.max("t")).alias("session_end"),
             F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    batch = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess.collect())
    assert got == batch
    assert len(got) == 6  # 3 + 2 + 1 sessions across the three users
