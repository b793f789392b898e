"""Text-analysis operators for training-data pipelines (task brief: langid,
quality scoring, token counting, fingerprinting — plus sliding-window
chunking, PII-pattern redaction, and corpus vocabulary build) over the
``documents`` table.

All JVM-side (`pyspark.sql.functions` only — no Python in the hot path); every
score is integer-scaled (`floor(x*10^k)`) so cross-engine hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load, load_docs_spread

# --- q20: token counting --------------------------------------------------------


def q20_token_stats(spark, sf_dir):
    # No spread here (r9): q20 is a pure per-row projection with no
    # Exchange; at sf1 its serial tokenize (~0.7 s) ≈ the shuffle a spread
    # would add, so the zero-shuffle plan stays.
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
    docs = load_docs_spread(spark, sf_dir)
    length = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks)
    # bigint BEFORE the multiply: int32 `length * 10000` overflows at ~214k
    # chars — real web documents cross that easily (found by the sf0.1
    # training-funnel bench on oversized docs).
    alpha_bp = F.floor(alpha.cast("bigint") * F.lit(10000) / length).cast("bigint")
    mean_tok_len_e2 = F.floor(alpha.cast("bigint") * F.lit(100) / n_tokens).cast("bigint")
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
    docs = load_docs_spread(spark, sf_dir)
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
    docs = load_docs_spread(spark, sf_dir)
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


# --- q24: sliding-window chunking (training-sample construction) -----------------

CHUNK_TOKENS = 64   # window size
CHUNK_STRIDE = 48   # overlap = 16 tokens


def chunk_token_arrays(toks_df, *, window: int = CHUNK_TOKENS,
                       stride: int = CHUNK_STRIDE):
    """(doc_id, toks) → overlapping token-window chunks.  THE chunker —
    q24 (DuckDB-proven) and training.build_training_set both call this, so
    the oracled recipe and the training-set output cannot diverge.

    Chunks slice INSIDE a transform and then ``posexplode`` — exploding
    chunk ids first and slicing after would carry the whole token array
    into every exploded row (O(n²/S) bytes per doc); slicing first keeps it
    at the output size, O(n·W/S).  No Python, no shuffle."""
    n = F.size("toks")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - window + stride - 1) / stride).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice("toks", i * stride + 1, window),
    )
    exploded = toks_df.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
        F.size("chunk").cast("bigint").alias("chunk_tokens"),
    )


def q24_chunking(spark, sf_dir):
    """Token-window chunking with overlap — the training-sample constructor:
    every doc becomes ceil((n-W)/S)+1 chunks of ≤W tokens at stride S.

    Tokens materialize ONCE as a column (lambda-inlining trap); chunking
    itself is ``chunk_token_arrays`` — see its docstring for the
    slice-before-explode size analysis."""
    docs = load_docs_spread(spark, sf_dir)
    toks = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("toks"),
    )
    return chunk_token_arrays(toks)


ORACLE_Q24 = rf"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
              ELSE CAST(FLOOR((len(toks) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                              / {CHUNK_STRIDE}) AS BIGINT) + 1 END AS n_chunks
  FROM t),
e AS (SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM c)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                                  chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ') AS chunk_text,
       CAST(len(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                           chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS BIGINT) AS chunk_tokens
FROM e
"""


# --- q25: pattern redaction (PII-style scrubbing) ---------------------------------

# The synthetic corpus carries no emails/URLs, so the query INJECTS a
# deterministic contact line per doc before scrubbing — the redaction is then
# non-vacuous (round-1 lesson: a 0-rows-affected oracle row carries no
# signal) and both engines construct and scrub the identical string.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_URL_RE = "https?://[^ ]+"


def q25_redaction(spark, sf_dir):
    docs = load_docs_spread(spark, sf_dir)
    dirty = F.concat(
        "text",
        F.lit(" contact: user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.lit(" see https://docs.example.org/item/"), F.col("doc_id").cast("string"),
    )
    masked = F.regexp_replace(F.regexp_replace(dirty, _EMAIL_RE, "<EMAIL>"),
                              _URL_RE, "<URL>")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.regexp_count(dirty, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(dirty, F.lit(_URL_RE)).cast("bigint").alias("n_urls"),
        F.md5(masked).alias("masked_md5"),
        F.length(masked).cast("bigint").alias("masked_len"),
    )


ORACLE_Q25 = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
              || ' see https://docs.example.org/item/' || CAST(doc_id AS VARCHAR) AS dirty
  FROM documents),
m AS (SELECT doc_id, dirty,
             regexp_replace(regexp_replace(dirty, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_URL_RE}', '<URL>', 'g') AS masked
      FROM d)
SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '{_URL_RE}')) AS BIGINT) AS n_urls,
       md5(masked) AS masked_md5,
       CAST(length(masked) AS BIGINT) AS masked_len
FROM m
"""


# --- q26: corpus vocabulary (term/document frequency, top terms) ------------------

VOCAB_TOP = 100


def q26_vocabulary(spark, sf_dir):
    """Corpus-level vocabulary build: one explode + one groupBy(token) with
    map-side partial aggregation (tf = count, df = distinct docs), top-k by
    (tf DESC, token ASC) for a deterministic cut.  The shuffle key is the
    token — uniform enough after the explode that no salting is needed; at
    100 TB this is the canonical word-count shape."""
    docs = load_docs_spread(spark, sf_dir)
    tok = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("token"),
    )
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    return agg.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(VOCAB_TOP)


ORACLE_Q26 = rf"""
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
  FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM tok GROUP BY token
ORDER BY tf DESC, token ASC LIMIT {VOCAB_TOP}
"""


QUERIES = {
    "q20_token_stats": q20_token_stats,
    "q21_quality_score": q21_quality_score,
    "q22_langid": q22_langid,
    "q23_fingerprint": q23_fingerprint,
    "q24_chunking": q24_chunking,
    "q25_redaction": q25_redaction,
    "q26_vocabulary": q26_vocabulary,
}

ORACLES = {
    "q20_token_stats": ORACLE_Q20,
    "q21_quality_score": ORACLE_Q21,
    "q22_langid": ORACLE_Q22,
    "q23_fingerprint": ORACLE_Q23,
    "q24_chunking": ORACLE_Q24,
    "q25_redaction": ORACLE_Q25,
    "q26_vocabulary": ORACLE_Q26,
}
