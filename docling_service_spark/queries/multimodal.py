"""Multimodal plumbing: opaque binary media columns + typed metadata, with the
decode step behind a vectorized stub (the image/audio libraries are not in
this container — the Spark-side schema/partitioning/UDF plumbing is real).

The fake "decode" derives deterministic features from the raw bytes, so the
whole flow HAS a DuckDB oracle: the oracle recomputes the same features from
the source text (bytes are its UTF-8 encoding).  Swapping ``_decode_stub``
for a real PIL/ffmpeg call changes nothing structurally.
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


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [_decode_stub(b) for b in pdf["media_bytes"]]
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


def q50_media_features(spark, sf_dir):
    """binary column → mapInPandas(decode stub) → typed feature rows."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("bigint").alias("media_id"),
        F.encode("text", "utf-8").alias("media_bytes"),
    )
    return media.mapInPandas(_decode_batches, MEDIA_OUT_DDL)


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


QUERIES = {"q50_media_features": q50_media_features}
ORACLES = {"q50_media_features": ORACLE_Q50}
