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


def q62_extract_spreadsheet(spark, sf_dir):
    """documents → one-sheet workbook (JVM to_json grid) → real sheet_grid
    extraction path → (sheet heading, rendered grid, table metadata).

    Exercises the spreadsheet family (reference whitelist .xlsx,
    app/main.py:1072-1079) end-to-end with exact value parity: the oracle
    predicts the extractor's markdown rendering from first principles."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).cast("string")
    cells = F.array(
        F.array(F.lit("doc"), F.lit("lang"), F.lit("n_tokens")),
        F.array(F.col("doc_id").cast("string"), F.col("lang"), ntok),
    )
    payload = F.to_json(F.struct(
        F.concat(F.lit("Sheet "), F.col("lang")).alias("name"),
        cells.alias("cells"),
    ))
    corpus = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(F.struct(
            F.lit("sheet_grid").alias("kind"),
            payload.alias("text"),
            F.lit("sheet=1").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )).alias("spans"),
    )
    out = strip_instrumentation(run_extraction(corpus))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        F.size("spans").cast("bigint").alias("n_spans"),
        F.element_at("spans", 1)["text"].alias("sheet_name"),
        F.element_at("spans", 2)["text"].alias("table_md"),
        F.element_at("tables", 1)["num_rows"].cast("bigint").alias("num_rows"),
        F.element_at("tables", 1)["num_cols"].cast("bigint").alias("num_cols"),
    )


ORACLE_Q62 = r"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS VARCHAR) AS n
  FROM documents)
SELECT doc_id, 'completed' AS status, CAST(2 AS BIGINT) AS n_spans,
       'Sheet ' || lang AS sheet_name,
       '| doc | lang | n_tokens |' || chr(10) || '|---|---|---|' || chr(10) ||
         '| ' || CAST(doc_id AS VARCHAR) || ' | ' || lang || ' | ' || n || ' |' AS table_md,
       CAST(2 AS BIGINT) AS num_rows, CAST(3 AS BIGINT) AS num_cols
FROM t
"""


def q63_extract_slides(spark, sf_dir):
    """documents → two-slide deck (title/bullet/notes placeholders) → real
    slide_block extraction path → per-slide page markers + ordered blocks.

    Slide family (reference whitelist .pptx): slides are pages with declared
    dims, blocks order by placeholder order."""
    docs = load(spark, sf_dir, "documents")

    def span(kind, text_col, ref, off):
        return F.struct(
            F.lit(kind).alias("kind"), text_col.alias("text"),
            F.lit(ref).alias("media_ref"), F.lit(off).cast("int").alias("offset"),
        )

    corpus = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            span("page_dims", F.lit(""), "1,720.0,540.0", 0),
            span("page_dims", F.lit(""), "2,720.0,540.0", 1),
            span("slide_block", F.concat(F.lit("Doc "), F.col("doc_id").cast("string")),
                 "slide=1,0,title", 2),
            span("slide_block", F.substring("text", 1, 40), "slide=1,1,bullet", 3),
            span("slide_block", F.lit("Summary"), "slide=2,0,title", 4),
            span("slide_block", F.col("lang"), "slide=2,1,notes", 5),
        ).alias("spans"),
    )
    out = strip_instrumentation(run_extraction(corpus))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        F.size("spans").cast("bigint").alias("n_spans"),
        F.element_at("spans", 2)["text"].alias("title_text"),
        F.element_at("spans", 3)["text"].alias("bullet_text"),
        F.element_at("spans", 6)["text"].alias("notes_text"),
        F.size("pages").cast("bigint").alias("n_pages"),
    )


ORACLE_Q63 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'completed' AS status,
       CAST(6 AS BIGINT) AS n_spans,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title_text,
       substr(text, 1, 40) AS bullet_text,
       lang AS notes_text,
       CAST(2 AS BIGINT) AS n_pages
FROM documents
"""


def q64_extract_flowdoc(spark, sf_dir):
    """documents → styled flowed-blocks doc (.docx analog; reference
    whitelist app/main.py:1072-1079) → real flow_block extraction path.

    Spans are fed in SCRAMBLED array order (list, table, heading, para,
    list) — the extractor must recover document order from the flow-order
    refs alone.  The nested list's markdown indentation is checked via the
    markdown column (nesting depth renders as two spaces per level), and
    the inline no-geometry table via its rendered grid + metadata."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).cast("string")
    table_payload = F.to_json(F.struct(
        F.array(
            F.array(F.lit("k"), F.lit("v")),
            F.array(F.lit("lang"), F.col("lang")),
            F.array(F.lit("doc"), F.col("doc_id").cast("string")),
        ).alias("cells"),
    ))

    def span(text_col, ref, off):
        return F.struct(
            F.lit("flow_block").alias("kind"), text_col.alias("text"),
            F.lit(ref).alias("media_ref"), F.lit(off).cast("int").alias("offset"),
        )

    corpus = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(  # scrambled: flow order is 3, 4, 0, 1, 2
            span(F.concat(F.lit("tokens: "), ntok), "block=3,list,1", 0),
            span(table_payload, "block=4,table,0", 1),
            span(F.concat(F.lit("Doc "), F.col("doc_id").cast("string")),
                 "block=0,heading,1", 2),
            span(F.col("text"), "block=1,para,0", 3),
            span(F.col("lang"), "block=2,list,0", 4),
        ).alias("spans"),
    )
    out = strip_instrumentation(run_extraction(corpus))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        F.size("spans").cast("bigint").alias("n_spans"),
        F.element_at("spans", 1)["text"].alias("heading_text"),
        F.element_at("spans", 2)["text"].alias("body_text"),
        # The depth-1 list item renders with a two-space indent — extracted
        # by an ANCHORED line regex, not a chunk index, so multi-paragraph
        # document text (blank lines) can never shift what this column sees.
        F.regexp_extract("markdown", r"(?m)^(  - tokens: \d+)$", 1).alias("nested_md"),
        F.element_at("spans", 5)["text"].alias("table_md"),
        F.element_at("tables", 1)["num_rows"].cast("bigint").alias("num_rows"),
        F.element_at("tables", 1)["num_cols"].cast("bigint").alias("num_cols"),
        F.size("pages").cast("bigint").alias("n_pages"),
    )


ORACLE_Q64 = r"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, text,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS VARCHAR) AS n
  FROM documents)
SELECT doc_id, 'completed' AS status, CAST(5 AS BIGINT) AS n_spans,
       'Doc ' || CAST(doc_id AS VARCHAR) AS heading_text,
       text AS body_text,
       '  - tokens: ' || n AS nested_md,
       '| k | v |' || chr(10) || '|---|---|' || chr(10) ||
         '| lang | ' || lang || ' |' || chr(10) ||
         '| doc | ' || CAST(doc_id AS VARCHAR) || ' |' AS table_md,
       CAST(3 AS BIGINT) AS num_rows, CAST(2 AS BIGINT) AS num_cols,
       CAST(0 AS BIGINT) AS n_pages
FROM t
"""


EXTRACTION_QUERIES = {
    "q60_extract_corpus": q60_extract_corpus,
    "q61_extract_html_docs": q61_extract_html_docs,
    "q62_extract_spreadsheet": q62_extract_spreadsheet,
    "q63_extract_slides": q63_extract_slides,
    "q64_extract_flowdoc": q64_extract_flowdoc,
}

# q60 is intentionally oracle-less (full custom dataflow); the driver records
# the weaker rows-only check for it.
EXTRACTION_ORACLES = {
    "q61_extract_html_docs": ORACLE_Q61,
    "q62_extract_spreadsheet": ORACLE_Q62,
    "q63_extract_slides": ORACLE_Q63,
    "q64_extract_flowdoc": ORACLE_Q64,
}
