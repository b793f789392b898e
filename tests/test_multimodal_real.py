"""Real-media swap-in gate (r5 verdict #4): when Pillow exists, the REAL
decode/frame-sample implementations must run through the exact q50/q51
mapInPandas plumbing with the same output schema and empty-payload filter
semantics as the stubs.  In containers without PIL these skip cleanly — the
point is that the swap-in is executable, not stubbed, the day the image
ships with the library.

Execution status (r6 verdict #7): this file has NOT yet run anywhere with
Pillow present — the build container has no PIL and package installation is
disallowed in the sandbox (no network, frozen environment), so the skip is
the only observable outcome to date.  The PIL-dependent assertions were
desk-checked against Pillow 10.x API docs (Image.open on BytesIO, .size,
.convert, .resize); first CI environment with Pillow should drop this note
after a green run.

Round-8 re-check (2026-08-18): PIL still absent; raw TCP connects now
succeed but HTTPS requests return no data (curl to pypi → 000), so the
environment remains effectively offline and installation is still
disallowed — status unchanged.  The same re-check applies to the R2 real
wire (boto3 1.43 IS present, but no credentials exist in the environment
and the endpoint is unreachable), so tests/test_object_store.py stays on
the FakeS3Client path."""

from __future__ import annotations

import io

import pytest

pytest.importorskip("PIL", reason="real-media path needs Pillow")

from PIL import Image  # noqa: E402

from docling_service_spark.queries.multimodal import (  # noqa: E402
    FRAME_MS,
    FRAME_STRIDE,
    MAX_SAMPLED,
    decode_image_real,
    frame_sample,
    media_features,
    sample_frames_real,
)


def _png_bytes(w: int, h: int) -> bytes:
    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, "PNG")
    return buf.getvalue()


def _gif_bytes(n_frames: int) -> bytes:
    frames = [Image.new("L", (8, 8), i * 20) for i in range(n_frames)]
    buf = io.BytesIO()
    frames[0].save(buf, "GIF", save_all=True, append_images=frames[1:])
    return buf.getvalue()


def test_real_decode_through_q50_plumbing(spark):
    rows = [(1, _png_bytes(12, 7)), (2, _gif_bytes(5)), (3, b"")]
    df = spark.createDataFrame(rows, "media_id long, media_bytes binary")

    out = media_features(df, decode=decode_image_real)
    # Interface parity with the stub path: byte-identical schema.
    assert out.schema == media_features(df).schema

    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["fake_width"] == 12 and got[1]["fake_height"] == 7
    assert got[1]["format_guess"] == "png" and got[1]["n_frames"] == 1
    assert got[2]["format_guess"] == "gif" and got[2]["n_frames"] == 5
    # Empty payload follows the stub's filter rule exactly.
    assert (got[3]["n_bytes"], got[3]["fake_width"], got[3]["fake_height"],
            got[3]["n_frames"], got[3]["format_guess"]) == (0, 0, 0, 0, "empty")


def test_real_frame_sampler_through_q51_plumbing(spark):
    gif = _gif_bytes(9)  # frames 0..8 → stride-3 sample = {0, 3, 6}
    df = spark.createDataFrame([(7, gif), (8, b"")],
                               "media_id long, media_bytes binary")

    out = frame_sample(df, sampler=sample_frames_real)
    assert out.schema == frame_sample(df).schema  # stub/real schema parity
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])

    assert [r["media_id"] for r in rows] == [7, 7, 7]  # empty payload: no rows
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert [r["ts_ms"] for r in rows] == [0, 3 * FRAME_MS, 6 * FRAME_MS]
    # Constructed grayscale frames: frame i is uniformly i*20 (GIF stores an
    # exact grayscale palette; ±2 tolerates quantizer variation across
    # Pillow versions).
    for r, expect in zip(rows, (0, 60, 120)):
        assert abs(r["luma"] - expect) <= 2, (r["frame_idx"], r["luma"])


def test_stride_cap_semantics_match_stub():
    """The real sampler obeys the stub's cap rule: a long video samples at
    most MAX_SAMPLED frames."""
    many = _gif_bytes(MAX_SAMPLED * FRAME_STRIDE + 5)
    sampled = sample_frames_real(many)
    assert len(sampled) == MAX_SAMPLED
    assert [s[0] for s in sampled] == [k * FRAME_STRIDE for k in range(MAX_SAMPLED)]
