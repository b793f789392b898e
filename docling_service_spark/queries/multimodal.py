"""Multimodal plumbing: opaque binary media columns + typed metadata, with the
decode step behind a vectorized stub (the image/audio libraries are not in
this container — the Spark-side schema/partitioning/UDF plumbing is real).

The fake "decode" derives deterministic features from the raw bytes, so the
whole flow HAS a DuckDB oracle: the oracle recomputes the same features from
the source text (bytes are its UTF-8 encoding).  The real Pillow-backed
twins (``decode_image_real`` / ``sample_frames_real``) plug into the same
``media_features`` / ``frame_sample`` plumbing — identical signature, empty-
payload rule, and output schema — and are exercised by the importorskip-
gated tests/test_multimodal_real.py wherever the library exists.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from .common import load

MEDIA_OUT_DDL = ("media_id bigint, n_bytes bigint, fake_width bigint, "
                 "fake_height bigint, n_frames bigint, format_guess string")


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for image decode: dims from the first bytes.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``; the
    signature and batch shape stay identical.
    """
    if not payload:
        return 0, 0, 0, "empty"
    w = payload[0] % 64 + 1
    h = payload[-1] % 64 + 1
    n_frames = len(payload) // 100 + 1
    fmt = "png" if payload[0] % 2 == 0 else "jpeg"
    return w, h, n_frames, fmt


def decode_image_real(payload: bytes) -> tuple[int, int, int, str]:
    """Real decode twin of ``_decode_stub`` — identical signature, empty-
    payload rule, and tuple contract, backed by Pillow.  The library is
    absent in this container, so execution is importorskip-gated
    (tests/test_multimodal_real.py); the day the cluster image carries PIL,
    ``media_features(df, decode=decode_image_real)`` is the whole swap."""
    import io

    from PIL import Image  # gated: ImportError surfaces to the caller

    if not payload:
        return 0, 0, 0, "empty"
    with Image.open(io.BytesIO(payload)) as img:
        return (img.width, img.height, int(getattr(img, "n_frames", 1)),
                (img.format or "unknown").lower())


def _decode_batches_with(decode) -> "callable":
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b) for b in pdf["media_bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [len(b) for b in pdf["media_bytes"]],
                    "fake_width": [f[0] for f in feats],
                    "fake_height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "format_guess": [f[3] for f in feats],
                }
            )
    return gen


def media_features(media_df, decode=_decode_stub):
    """The q50 plumbing with a pluggable per-payload decoder: binary column
    → mapInPandas batches → typed feature rows.  The Spark side (schema,
    batch shape, partition inheritance) is identical for stub and real
    decoders — that equivalence is what tests/test_multimodal_real.py pins."""
    return media_df.mapInPandas(_decode_batches_with(decode), MEDIA_OUT_DDL)


def _media_df(spark, sf_dir):
    """The shared binary-media view of the documents table: q50 and q51 MUST
    use the same bytes<->text correspondence (their oracles recompute stub
    features from `text` under the ASCII assumption), so the projection
    lives in exactly one place."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("media_id"),
        F.encode("text", "utf-8").alias("media_bytes"),
    )


def q50_media_features(spark, sf_dir):
    """binary column → mapInPandas(decode stub) → typed feature rows."""
    return media_features(_media_df(spark, sf_dir))


# Oracle recomputes the stub's features from text: for ASCII-safe synthetic
# text, byte[0] == ascii(first char), byte[-1] == ascii(last char),
# len(bytes) == strlen.
ORACLE_Q50 = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) % 64 + 1 AS BIGINT) AS fake_width,
       CAST(ascii(substr(text, length(text), 1)) % 64 + 1 AS BIGINT) AS fake_height,
       CAST(strlen(text) // 100 + 1 AS BIGINT) AS n_frames,
       CASE WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format_guess
FROM documents
"""


# --- q51: video frame sampling (the brief's "frame-sample" op) --------------------

FRAME_MS = 40          # 25 fps
FRAME_STRIDE = 3       # keep every 3rd frame
MAX_SAMPLED = 10       # per-video sample cap

FRAMES_OUT_DDL = "media_id bigint, frame_idx bigint, ts_ms bigint, luma bigint"


def _sample_frames_stub(payload: bytes) -> list[tuple[int, int, int]]:
    """Deterministic stand-in for ffmpeg frame extraction: the video's frame
    count comes from the q50 decode rule (len//100 + 1), sampling keeps
    every FRAME_STRIDE-th frame up to MAX_SAMPLED, and the per-frame "luma"
    feature is the byte at the frame's notional offset.  A real
    implementation seeks with ``ffmpeg -ss`` / PyAV per sampled index — the
    1→many row fan-out, the sampled-index arithmetic, and the batch shape
    are exactly what it would use."""
    if not payload:
        return []
    n_frames = len(payload) // 100 + 1
    out = []
    for k in range(MAX_SAMPLED):
        idx = k * FRAME_STRIDE
        if idx >= n_frames:
            break
        out.append((idx, idx * FRAME_MS, payload[(idx * 100) % len(payload)]))
    return out


def sample_frames_real(payload: bytes) -> list[tuple[int, int, int]]:
    """Real frame-sampler twin of ``_sample_frames_stub``: the SAME stride/
    cap arithmetic (every FRAME_STRIDE-th frame, idx < n_frames, at most
    MAX_SAMPLED) over a real multi-frame image (GIF/TIFF via Pillow
    ``seek``; an ffmpeg build would seek with ``-ss`` identically), with
    per-frame luma = mean grayscale value.  Importorskip-gated like
    decode_image_real."""
    import io

    from PIL import Image  # gated: ImportError surfaces to the caller

    if not payload:
        return []
    out = []
    with Image.open(io.BytesIO(payload)) as img:
        n_frames = int(getattr(img, "n_frames", 1))
        for k in range(MAX_SAMPLED):
            idx = k * FRAME_STRIDE
            if idx >= n_frames:
                break
            img.seek(idx)
            gray = img.convert("L").getdata()
            luma = int(sum(gray) // max(1, len(gray)))
            out.append((idx, idx * FRAME_MS, luma))
    return out


def _frame_batches_with(sampler) -> "callable":
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, lumas = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media_bytes"]):
                for idx, ts, luma in sampler(payload):
                    ids.append(int(mid))
                    idxs.append(idx)
                    tss.append(ts)
                    lumas.append(luma)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "ts_ms": pd.Series(tss, dtype="int64"),
                "luma": pd.Series(lumas, dtype="int64"),
            })
    return gen


def frame_sample(media_df, sampler=_sample_frames_stub):
    """The q51 plumbing with a pluggable per-payload frame sampler — the
    1→many fan-out happens inside the Arrow batch for stub and real alike."""
    return media_df.mapInPandas(_frame_batches_with(sampler), FRAMES_OUT_DDL)


def q51_frame_sample(spark, sf_dir):
    """binary video column → mapInPandas frame sampler → one row per sampled
    frame.  The 1→many fan-out shape (each input row yields a variable
    number of output rows inside the Arrow batch) is the frame-extraction
    pattern at any scale: no explode shuffle, no driver involvement, output
    partitioning inherits the input's."""
    return frame_sample(_media_df(spark, sf_dir))


# Same ASCII-safe byte<->char correspondence as q50's oracle; the sampled
# index set unrolls as a bounded generate_series cross join.
ORACLE_Q51 = f"""
WITH v AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id, text,
         strlen(text) // 100 + 1 AS n_frames, strlen(text) AS nb
  FROM documents WHERE strlen(text) > 0),
ks AS (SELECT unnest(generate_series(0, {MAX_SAMPLED - 1})) AS k)
SELECT media_id,
       CAST(k * {FRAME_STRIDE} AS BIGINT) AS frame_idx,
       CAST(k * {FRAME_STRIDE} * {FRAME_MS} AS BIGINT) AS ts_ms,
       CAST(ascii(substr(text, ((k * {FRAME_STRIDE} * 100) % nb) + 1, 1)) AS BIGINT) AS luma
FROM v CROSS JOIN ks
WHERE k * {FRAME_STRIDE} < n_frames
"""


QUERIES = {
    "q50_media_features": q50_media_features,
    "q51_frame_sample": q51_frame_sample,
}
ORACLES = {
    "q50_media_features": ORACLE_Q50,
    "q51_frame_sample": ORACLE_Q51,
}
