"""End-to-end training-set derivation OVER the extraction output: the
composition that makes the engine a training-data pipeline, not just an
extractor (task brief: dedup / quality / chunking as first-class ops).

    extracted snapshot ──▶ body text ──▶ quality gate ──▶ exact dedup
                      ──▶ sliding-window chunks (the training samples)

Every stage is a pure DataFrame transformation (JVM-side; no Python in the
hot path) reusing the operator recipes the driver queries prove against
DuckDB (q21 quality, q23 fingerprint/q30 dedup, q24 chunking):

- **Body text** strips the machine metadata block from the markdown (a
  training sample must not learn the fenced-JSON tail) — a split on the
  fixed sentinel, no regex.
- **Quality gate** = the q21 composite (length + alpha ratio), applied to
  the body.
- **Exact dedup** keeps the MIN doc_id per normalized fingerprint
  (first-writer-wins, the reference's migration rule) — one shuffle on the
  uniform md5 key.
- **Chunking** = q24's slice-inside-transform + posexplode (overlapping
  token windows, zero shuffles, O(n·W/S) bytes).

Scale shape: one shuffle total (the dedup groupBy); everything else is
row-local over the snapshot scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .engine.extract import META_BLOCK_PREFIX as META_SENTINEL
from .queries.text_ops import CHUNK_STRIDE, CHUNK_TOKENS, chunk_token_arrays

MIN_BODY_CHARS = 100
MIN_ALPHA_BP = 5000  # markdown bodies carry structural punctuation → laxer than q21's 7000


def extracted_body(out_df: DataFrame) -> DataFrame:
    """(doc_id, body) for completed docs: markdown minus the metadata tail.

    The metadata block is always APPENDED at the end (engine/extract.py:291),
    so the split anchors on the LAST occurrence of the sentinel — a body
    whose own text contains the sentinel sequence (possible with real
    content) must not truncate early.  ``substring_index(..., -1)`` yields
    the tail after the last occurrence; the body is everything before it."""
    after_last = F.substring_index("markdown", META_SENTINEL, -1)
    body_last = F.col("markdown").substr(
        F.lit(1),
        F.length("markdown") - F.length(after_last) - F.lit(len(META_SENTINEL)))
    body = F.when(F.length(after_last) < F.length("markdown"), body_last) \
            .otherwise(F.col("markdown"))  # sentinel absent → whole string
    return out_df.filter(F.col("status") == "completed").select(
        "doc_id", body.alias("body"),
    )


def quality_gate(body_df: DataFrame, *, min_chars: int = MIN_BODY_CHARS,
                 min_alpha_bp: int = MIN_ALPHA_BP) -> DataFrame:
    """q21-shaped composite over the extracted body (length + alpha ratio)."""
    length = F.length("body")
    alpha = F.length(F.regexp_replace("body", "[^A-Za-z]", ""))
    # bigint BEFORE the multiply: int32 `alpha * 10000` overflows at ~214k
    # alpha chars — oversized extracted bodies cross that (sf0.1 funnel bench).
    alpha_bp = F.floor(alpha.cast("bigint") * F.lit(10000) / F.greatest(length, F.lit(1)))
    return body_df.filter((length >= min_chars) & (alpha_bp >= min_alpha_bp))


def exact_dedup(body_df: DataFrame) -> DataFrame:
    """First-writer-wins on the normalized-content fingerprint (q23/q30
    recipe; reference scripts/r2_migrate_xxhash.py:256-273 keeper rule).

    Keeper selection is a WINDOW over the fingerprint, not a
    groupBy+self-join: the join form evaluates the whole upstream pipeline
    (extraction included) once per join side — measured +5.3 s on the sf0.1
    funnel bench, where the window form is one pass and one shuffle."""
    fp = F.md5(F.regexp_replace(F.lower("body"), "[^a-z0-9]", ""))
    w = Window.partitionBy("_fp")
    return (
        body_df.withColumn("_fp", fp)
        .withColumn("_keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_fp", "_keep")
    )


def chunk(body_df: DataFrame, *, window: int = CHUNK_TOKENS,
          stride: int = CHUNK_STRIDE) -> DataFrame:
    """q24's sliding-window chunker (the SAME ``chunk_token_arrays`` the
    oracled query runs) over the body column."""
    toks = body_df.select(
        "doc_id",
        F.filter(F.split("body", r"\s+"), lambda x: x != "").alias("toks"),
    )
    return chunk_token_arrays(toks, window=window, stride=stride)


def build_training_set(out_df: DataFrame, **chunk_kwargs) -> DataFrame:
    """The full composition: extraction output → training chunks."""
    return chunk(exact_dedup(quality_gate(extracted_body(out_df))), **chunk_kwargs)


def training_set_report(out_df: DataFrame) -> dict:
    """Per-stage funnel counts (the pipeline's lineage-style summary)."""
    body = extracted_body(out_df).persist()
    try:
        gated = quality_gate(body).persist()
        try:
            deduped = exact_dedup(gated).persist()
            try:
                chunks = chunk(deduped)
                return {
                    "completed_docs": body.count(),
                    "passed_quality": gated.count(),
                    "after_dedup": deduped.count(),
                    "chunks": chunks.count(),
                }
            finally:
                deduped.unpersist()
        finally:
            gated.unpersist()
    finally:
        body.unpersist()
