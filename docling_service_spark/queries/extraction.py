"""Extraction-pipeline queries for the driver contract.

q60 runs the full extractor over the synthetic interleaved corpus (rows-only
check — not SQL-expressible).  q61 wraps the driver's ``documents`` table in
HTML (boilerplate + article) JVM-side, runs the real HTML extraction path,
and has a DuckDB oracle that predicts the extractor's output independently —
an end-to-end extraction check with exact value parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..corpus import corpus_df
from ..sparkio.pipeline import run_extraction, strip_instrumentation
from .common import load

N_CORPUS_DOCS = 200


def q60_extract_corpus(spark, sf_dir):
    """Per-doc extraction summary over the synthetic corpus.  sf_dir is unused
    (the corpus is generated in executors); kept for signature uniformity."""
    out = strip_instrumentation(run_extraction(corpus_df(spark, N_CORPUS_DOCS, partitions=8)))
    return out.select(
        "doc_id",
        "status",
        F.coalesce(F.size("spans"), F.lit(-1)).cast("bigint").alias("n_spans"),
        F.coalesce(F.size("images"), F.lit(-1)).cast("bigint").alias("n_images"),
        F.coalesce(F.size("tables"), F.lit(-1)).cast("bigint").alias("n_tables"),
        F.coalesce(F.size("pages"), F.lit(-1)).cast("bigint").alias("n_pages"),
    )


_NAV = ('<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li>'
        '<li><a href="/c">Contact</a></li></ul></nav>')
_FOOTER = ("<footer><p>Copyright - <a href='/t'>Terms</a> - <a href='/p'>Privacy</a></p></footer>")


def _wrap_html(doc_id_col, text_col):
    return F.concat(
        F.lit(f"<html><body>{_NAV}<article><h1>Document "),
        doc_id_col.cast("string"),
        F.lit("</h1><p>"),
        text_col,
        F.lit(f"</p></article>{_FOOTER}</body></html>"),
    )


def q61_extract_html_docs(spark, sf_dir):
    """documents.text → HTML wrap (JVM concat) → real extraction → (heading, body)."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                _wrap_html(F.col("doc_id"), F.col("text")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    out = strip_instrumentation(run_extraction(corpus))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        F.size("spans").cast("bigint").alias("n_spans"),
        F.element_at("spans", 1)["text"].alias("heading_text"),
        F.element_at("spans", 2)["text"].alias("body_text"),
    )


# The oracle predicts the extractor's behavior from first principles:
# boilerplate (nav/footer) dropped, <h1> kept as heading, the paragraph kept
# iff its normalized text is >= 25 chars (engine MIN_TEXT_LEN).  Whitespace
# normalization mirrors engine/html_extract._norm_text.
ORACLE_Q61 = r"""
WITH norm AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
  FROM documents)
SELECT doc_id,
       'completed' AS status,
       CAST(CASE WHEN length(body) >= 25 THEN 2 ELSE 1 END AS BIGINT) AS n_spans,
       CONCAT('Document ', CAST(doc_id AS VARCHAR)) AS heading_text,
       CASE WHEN length(body) >= 25 THEN body ELSE NULL END AS body_text
FROM norm
"""


EXTRACTION_QUERIES = {
    "q60_extract_corpus": q60_extract_corpus,
    "q61_extract_html_docs": q61_extract_html_docs,
}

# q60 is intentionally oracle-less (full custom dataflow); the driver records
# the weaker rows-only check for it.
EXTRACTION_ORACLES = {
    "q61_extract_html_docs": ORACLE_Q61,
}
