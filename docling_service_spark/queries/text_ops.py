"""Text-analysis operators for training-data pipelines (task brief: langid,
quality scoring, token counting, fingerprinting) over the ``documents`` table.

All JVM-side (`pyspark.sql.functions` only — no Python in the hot path); every
score is integer-scaled (`floor(x*10^k)`) so cross-engine hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

# --- q20: token counting --------------------------------------------------------


def q20_token_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
    )


ORACLE_Q20 = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS n_unique_tokens
FROM documents
"""


# --- q21: quality scoring ---------------------------------------------------------

def q21_quality_score(spark, sf_dir):
    """Length / alpha-ratio / mean-token-length features, basis-point scaled.
    The composite mirrors classic corpus-quality filters (C4/Gopher style)."""
    docs = load(spark, sf_dir, "documents")
    length = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks)
    alpha_bp = F.floor(alpha * F.lit(10000) / length).cast("bigint")
    mean_tok_len_e2 = F.floor(alpha * F.lit(100) / n_tokens).cast("bigint")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        length.cast("bigint").alias("n_chars_actual"),
        alpha_bp.alias("alpha_bp"),
        mean_tok_len_e2.alias("mean_tok_len_e2"),
        ((length >= 100) & (alpha_bp >= 7000)).alias("passes_quality"),
    )


ORACLE_Q21 = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(FLOOR(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10000 / length(text)) AS BIGINT) AS alpha_bp,
       CAST(FLOOR(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100
            / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS mean_tok_len_e2,
       (length(text) >= 100 AND
        FLOOR(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10000 / length(text)) >= 7000) AS passes_quality
FROM documents
"""


# --- q22: language-ID (stopword-marker heuristic) ------------------------------------

_MARKERS = {"en": " the ", "fr": " le ", "es": " el ", "de": " der ", "zh": " zh "}


def _hits(col, marker):
    return (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit("")))) / len(marker)


def q22_langid(spark, sf_dir):
    """N-gram/stopword-marker language guess; ties break by fixed preference
    order (en > fr > es > de > zh) so the result is deterministic."""
    docs = load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    cols = {lang: _hits(padded, m).cast("bigint").alias(f"hits_{lang}") for lang, m in _MARKERS.items()}
    scored = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang", *cols.values())
    best = F.greatest(*[F.col(f"hits_{lo}") for lo in _MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _MARKERS:  # fixed preference order on ties
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("pred_lang"),
        "hits_en", "hits_fr", "hits_es", "hits_de",
    )


_H = {lo: f"CAST((length(p) - length(replace(p, '{m}', ''))) / {len(m)} AS BIGINT)"
      for lo, m in _MARKERS.items()}
ORACLE_Q22 = f"""
WITH padded AS (SELECT doc_id, lang, CONCAT(' ', lower(text), ' ') AS p FROM documents),
hits AS (SELECT doc_id, lang,
    {_H['en']} AS hits_en, {_H['fr']} AS hits_fr, {_H['es']} AS hits_es,
    {_H['de']} AS hits_de, {_H['zh']} AS hits_zh
  FROM padded)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS labeled_lang,
       CASE WHEN GREATEST(hits_en, hits_fr, hits_es, hits_de, hits_zh) = 0 THEN 'und'
            WHEN hits_en = GREATEST(hits_en, hits_fr, hits_es, hits_de, hits_zh) THEN 'en'
            WHEN hits_fr = GREATEST(hits_en, hits_fr, hits_es, hits_de, hits_zh) THEN 'fr'
            WHEN hits_es = GREATEST(hits_en, hits_fr, hits_es, hits_de, hits_zh) THEN 'es'
            WHEN hits_de = GREATEST(hits_en, hits_fr, hits_es, hits_de, hits_zh) THEN 'de'
            ELSE 'zh' END AS pred_lang,
       hits_en, hits_fr, hits_es, hits_de
FROM hits
"""


# --- q23: document fingerprint (normalization + hash) ----------------------------------

def q23_fingerprint(spark, sf_dir):
    """Content fingerprint over normalized text (case/punct/whitespace-
    insensitive) — the exact-dedup key for noisy corpora."""
    docs = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


ORACLE_Q23 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
       CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS norm_len
FROM documents
"""


QUERIES = {
    "q20_token_stats": q20_token_stats,
    "q21_quality_score": q21_quality_score,
    "q22_langid": q22_langid,
    "q23_fingerprint": q23_fingerprint,
}

ORACLES = {
    "q20_token_stats": ORACLE_Q20,
    "q21_quality_score": ORACLE_Q21,
    "q22_langid": ORACLE_Q22,
    "q23_fingerprint": ORACLE_Q23,
}
