"""Streaming depth: watermarked windowed aggregation (late-data handling,
bounded state) and the applyInPandasWithState sessionizer — state must span
micro-batches AND query restarts via the streaming checkpoint."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from docling_service_spark.sparkio.streaming import (
    stream_sessionize,
    stream_window_counts,
)

EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                 "event_type string, value double")


def _write_wave(spark, path: str, name: str, rows, mtime: float) -> None:
    """Land ONE flat parquet file named {name}.parquet with a controlled
    mtime, so the file source sees waves in deterministic order."""
    import glob
    import shutil

    tmp = f"{path}.{name}.tmp"
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(path, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def _t(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_window_counts_watermark_finalization(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    base = time.time() - 1000
    # Three waves in three 1-hour windows, ascending mtimes so availableNow
    # with maxFilesPerTrigger=1 processes them in order and the watermark
    # ratchets between micro-batches.
    _write_wave(spark, inp, "w1", [(1, _t(10, 5), 1, "click", 1.0),
                                   (2, _t(10, 40), 2, "view", 2.0)], base)
    _write_wave(spark, inp, "w2", [(3, _t(12, 10), 1, "click", 3.0)], base + 10)
    _write_wave(spark, inp, "w3", [(4, _t(14, 20), 2, "view", 4.0)], base + 20)

    stream_window_counts(spark, inp, out, window="1 hour", watermark="30 minutes",
                         max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    rows = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in got.collect()}
    # The 10:00 window finalizes once the watermark (ratcheted by wave 2's
    # 12:10) passes 11:00 — emitted during wave-3's micro-batch.  The 14:00
    # window can never finalize (nothing later arrived).
    assert rows.get((10, "click")) == 1 and rows.get((10, "view")) == 1
    assert not any(h == 14 for h, _ in rows)
    # Exactly-once per window: no duplicate (window, type) groups.
    n_groups = got.groupBy("window_start", "event_type").count() \
                  .filter(F.col("count") > 1).count()
    assert n_groups == 0

    # Restart with a later wave: the 12:00 window finalizes now; still no dupes.
    _write_wave(spark, inp, "w4", [(5, _t(16, 0), 1, "click", 5.0)], base + 30)
    stream_window_counts(spark, inp, out, window="1 hour", watermark="30 minutes",
                         max_files_per_trigger=1)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    rows2 = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in got2.collect()}
    assert rows2.get((12, "click")) == 1
    assert got2.groupBy("window_start", "event_type").count() \
               .filter(F.col("count") > 1).count() == 0


def test_sessionize_state_spans_batches_and_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    base = time.time() - 1000
    # Wave 1: user 1 has two close events (one open session); user 2 one event.
    _write_wave(spark, inp, "w1", [(1, _t(10, 0), 1, "click", 0.0),
                                   (2, _t(10, 5), 1, "click", 0.0),
                                   (3, _t(10, 0), 2, "view", 0.0)], base)
    # Wave 2: user 1 returns 2h later -> wave-1 session closes (gap > 30min);
    # user 2 extends its open session (no emission).
    _write_wave(spark, inp, "w2", [(4, _t(12, 30), 1, "click", 0.0),
                                   (5, _t(10, 10), 2, "view", 0.0)], base + 10)

    # Huge watermark delay: event-time timeouts can't fire inside this test,
    # so every emission below is a gap-rule close — isolating the
    # state-spans-batches/restarts property (expiry has its own test).
    stream_sessionize(spark, inp, out, gap_minutes=30, watermark="10 hours",
                      max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data")).collect()
    # Exactly ONE closed session: user 1's wave-1 session, emitted in the
    # wave-2 micro-batch — state crossed the batch boundary.
    assert len(got) == 1
    s = got[0]
    assert s["user_id"] == 1 and s["n_events"] == 2
    assert (s["session_start"].hour, s["session_start"].minute) == (10, 0)
    assert (s["session_end"].hour, s["session_end"].minute) == (10, 5)

    # Restart the query (same checkpoint) with a wave that closes user 2's
    # session — state survived the restart.
    _write_wave(spark, inp, "w3", [(6, _t(15, 0), 2, "view", 0.0)], base + 20)
    stream_sessionize(spark, inp, out, gap_minutes=30, watermark="10 hours",
                      max_files_per_trigger=1)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    u2 = got2.filter(F.col("user_id") == 2).collect()
    assert len(u2) == 1
    assert u2[0]["n_events"] == 2  # 10:00 + 10:10 from waves 1-2
    assert (u2[0]["session_end"].hour, u2[0]["session_end"].minute) == (10, 10)


def test_sessionize_idle_state_expires_and_flushes(spark, tmp_path):
    """Bounded state: once the watermark passes an idle user's
    session_end + gap, the open session is EMITTED via EventTimeTimeout and
    the per-user state is removed — an idle user costs nothing forever after.
    """
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    base = time.time() - 1000
    # Wave 1: user 1 opens a session and goes idle.
    _write_wave(spark, inp, "w1", [(1, _t(10, 0), 1, "click", 0.0),
                                   (2, _t(10, 5), 1, "click", 0.0)], base)
    # Wave 2: only user 2, far in the future — ratchets the watermark to
    # 14:30 (30 min delay), past user 1's 10:35 timeout.
    _write_wave(spark, inp, "w2", [(3, _t(15, 0), 2, "view", 0.0)], base + 10)

    stream_sessionize(spark, inp, out, gap_minutes=30, watermark="30 minutes",
                      max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    u1 = got.filter(F.col("user_id") == 1).collect()
    assert len(u1) == 1, "idle user's open session must flush on timeout"
    assert u1[0]["n_events"] == 2
    assert (u1[0]["session_end"].hour, u1[0]["session_end"].minute) == (10, 5)

    # User 1 returns AFTER the flush: a fresh session opens (state was
    # removed, not resurrected) and closes by the gap rule against wave 4.
    _write_wave(spark, inp, "w3", [(4, _t(16, 0), 1, "click", 0.0)], base + 20)
    _write_wave(spark, inp, "w4", [(5, _t(20, 0), 1, "click", 0.0)], base + 30)
    stream_sessionize(spark, inp, out, gap_minutes=30, watermark="30 minutes",
                      max_files_per_trigger=1)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    u1b = sorted(got2.filter(F.col("user_id") == 1).collect(),
                 key=lambda r: r["session_start"])
    assert len(u1b) >= 2
    assert u1b[1]["n_events"] == 1
    assert (u1b[1]["session_start"].hour, u1b[1]["session_end"].hour) == (16, 16)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once input (replayed event_ids across micro-batches) →
    exactly-once output; a duplicate arriving WITHIN the watermark collapses
    even when it lands in a later wave."""
    from docling_service_spark.sparkio.streaming import stream_dedup

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    base = time.time() - 1000
    # Wave 1: events 1, 2 (2 duplicated in-batch).
    _write_wave(spark, inp, "w1", [(1, _t(10, 0), 1, "click", 1.0),
                                   (2, _t(10, 5), 2, "view", 2.0),
                                   (2, _t(10, 5), 2, "view", 2.0)], base)
    # Wave 2: event 2 REPLAYED (within the 30-min watermark of its ts) plus
    # a genuinely new event 3.
    _write_wave(spark, inp, "w2", [(2, _t(10, 5), 2, "view", 2.0),
                                   (3, _t(10, 20), 3, "click", 3.0)], base + 10)

    stream_dedup(spark, inp, out, watermark="30 minutes", max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2, 3]  # each event exactly once

    # Replay wave 3 with yet another copy of event 2 → still no new row
    # (checkpoint resume, state within watermark), plus new event 4.
    _write_wave(spark, inp, "w3", [(2, _t(10, 5), 2, "view", 2.0),
                                   (4, _t(10, 25), 4, "view", 4.0)], base + 20)
    stream_dedup(spark, inp, out, watermark="30 minutes", max_files_per_trigger=1)
    ids = sorted(r["event_id"] for r in
                 spark.read.parquet(os.path.join(out, "data")).collect())
    assert ids == [1, 2, 3, 4]
