"""Relational operator queries, each grounded in a reference behavior
(SURVEY.md §2 Part B: evidence column) and scale-conscious in its Spark form.

Physical notes per query are in the docstrings; the broad rules:
- dimension joins are broadcast (`F.broadcast`) — no shuffle of the fact side;
- window ordinals partition by a high-cardinality key (doc/lang/user), never
  a global ORDER BY without partitioning — except q04, whose reference analog
  (mtime-ordered quota eviction, app/main.py:983-992) is inherently a global
  ordered scan; at scale it runs on a pre-aggregated, size-bounded input.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import load


# --- q01: pricing summary (aggregation: partial+final, decimal-exact) ---------

def q01_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped agg; reference analog: doc totals (app/main.py:316-327)."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- q02: status rollup (reference A15: GET /status → counts) -----------------

def q02_status_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


ORACLE_Q02 = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --- q03: first-occurrence-wins dedup (reference A20, r2_migrate:256-299) -----

def q03_dedup_first_wins(spark, sf_dir):
    """Window rank per content hash; at scale the hash is the shuffle key
    (uniform by construction — no skew)."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("doc_id").cast("bigint").alias("keeper_id"), "content_hash")
    )


ORACLE_Q03 = """
SELECT CAST(doc_id AS BIGINT) AS keeper_id, content_hash FROM (
  SELECT doc_id, md5(text) AS content_hash,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


# --- q04: running-total eviction cutoff (reference A14, app/main.py:983-992) --

EVICT_BUDGET = 2500.0


def q04_running_total_eviction(spark, sf_dir):
    """Oldest-first cumulative size until the budget — the quota-eviction
    keep-set.  Same-order prefix sums are FP-identical across engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("running_value", F.sum("value").over(w))
        .filter(F.col("running_value") <= EVICT_BUDGET)
        .select("event_id", F.floor(F.col("running_value") * 10000).cast("bigint").alias("running_value_e4"))
    )


ORACLE_Q04 = f"""
SELECT event_id, CAST(FLOOR(running_value * 10000) AS BIGINT) AS running_value_e4 FROM (
  SELECT event_id, SUM(value) OVER (ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
  FROM events) WHERE running_value <= {EVICT_BUDGET}
"""


# --- q05: ordinal ids (reference A8/A10: picture-n / table-n) ------------------

def q05_ordinal_ids(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.concat(F.lit("doc-"), F.row_number().over(w).cast("string")).alias("ordinal_id"),
    )


ORACLE_Q05 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CONCAT('doc-', CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS VARCHAR)) AS ordinal_id
FROM documents
"""


# --- q06: JSON extraction (reference A12: metadata block) ----------------------

def q06_json_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.count(k).cast("bigint").alias("n_with_k"),
    )


ORACLE_Q06 = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
FROM events GROUP BY event_type
"""


# --- q07: resume anti-join (checkpoint resume; SURVEY §2 Part B joins row) -----

def q07_resume_anti_join(spark, sf_dir):
    """Uncommitted = input ⟕̸ committed.  At scale committed is a bucket list
    (O(manifest)); here the doc-id form exercises the anti-join operator."""
    docs = load(spark, sf_dir, "documents")
    committed = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (
        docs.join(committed, "doc_id", "left_anti")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang", "n_chars")
    )


ORACLE_Q07 = """
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.doc_id % 7 = 0 AND c.doc_id = d.doc_id)
"""


# --- q08: semi join --------------------------------------------------------------

def q08_customers_with_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi")
        .select("c_custkey", "c_name")
    )


ORACLE_Q08 = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- q09: broadcast dimension join (star join) ------------------------------------

def q09_revenue_by_nation(spark, sf_dir):
    """Fact side never shuffles for the dims: supplier and nation broadcast.
    `.explain()` shows BroadcastHashJoin on both hops."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).cast("bigint").alias("n_items"))
    )


ORACLE_Q09 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --- q10: top-k (order + limit with deterministic tiebreak) -------------------------

def q10_topk_largest_docs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "n_chars")
    )


ORACLE_Q10 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 50
"""


# --- q11: lag window (span-adjacency / offset-monotonicity analog) -------------------

def q11_event_gaps(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; session TZ is pinned to UTC so the
    # cast is exact and matches DuckDB's naive-as-UTC epoch_us.
    ts = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    return (
        ev.withColumn("gap_us", gap_us)
        .groupBy("user_id")
        .agg(
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
            F.count("gap_us").cast("bigint").alias("n_gaps"),
        )
    )


ORACLE_Q11 = """
SELECT user_id,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps
FROM (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
GROUP BY user_id
"""


# --- q12: set difference ----------------------------------------------------------

def q12_langs_without_large_docs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    all_langs = docs.select("lang").distinct()
    large = docs.filter(F.col("n_chars") > 900).select("lang").distinct()
    return all_langs.exceptAll(large)


ORACLE_Q12 = """
SELECT DISTINCT lang FROM documents
EXCEPT
SELECT DISTINCT lang FROM documents WHERE n_chars > 900
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_status_rollup": q02_status_rollup,
    "q03_dedup_first_wins": q03_dedup_first_wins,
    "q04_running_total_eviction": q04_running_total_eviction,
    "q05_ordinal_ids": q05_ordinal_ids,
    "q06_json_props": q06_json_props,
    "q07_resume_anti_join": q07_resume_anti_join,
    "q08_customers_with_orders": q08_customers_with_orders,
    "q09_revenue_by_nation": q09_revenue_by_nation,
    "q10_topk_largest_docs": q10_topk_largest_docs,
    "q11_event_gaps": q11_event_gaps,
    "q12_langs_without_large_docs": q12_langs_without_large_docs,
}

ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_status_rollup": ORACLE_Q02,
    "q03_dedup_first_wins": ORACLE_Q03,
    "q04_running_total_eviction": ORACLE_Q04,
    "q05_ordinal_ids": ORACLE_Q05,
    "q06_json_props": ORACLE_Q06,
    "q07_resume_anti_join": ORACLE_Q07,
    "q08_customers_with_orders": ORACLE_Q08,
    "q09_revenue_by_nation": ORACLE_Q09,
    "q10_topk_largest_docs": ORACLE_Q10,
    "q11_event_gaps": ORACLE_Q11,
    "q12_langs_without_large_docs": ORACLE_Q12,
}


# --- q13: rollup (multi-level metrics, Part B aggregation row) ------------------

def q13_rollup_doc_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("bigint").alias("sum_chars"),
    )


ORACLE_Q13 = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


# --- q15: ordered explode + lag (span-adjacency analog over token sequences) ----

def q15_token_bigrams(spark, sf_dir):
    """posexplode keeps element order; lag over (doc, position) builds the
    bigram — the same window shape that validates span-offset monotonicity."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.posexplode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.withColumn("prev", F.lag("tok").over(w)).filter(F.col("prev").isNotNull())
    return (
        bigrams.groupBy(F.concat_ws(" ", "prev", "tok").alias("bigram"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 5)
    )


ORACLE_Q15 = r"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok,
         generate_subscripts(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), 1) AS pos
  FROM documents WHERE doc_id < 50),
bigrams AS (
  SELECT CONCAT(LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos), ' ', tok) AS bigram,
         LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bigrams WHERE prev IS NOT NULL
GROUP BY bigram HAVING COUNT(*) >= 5
"""


# --- q16: time-series daily stats (date/time fns row) ----------------------------

def q16_daily_event_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.col("ts").cast("timestamp")).alias("day")
    return ev.groupBy(day).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


ORACLE_Q16 = """
SELECT CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""

QUERIES.update({
    "q13_rollup_doc_stats": q13_rollup_doc_stats,
    "q15_token_bigrams": q15_token_bigrams,
    "q16_daily_event_stats": q16_daily_event_stats,
})
ORACLES.update({
    "q13_rollup_doc_stats": ORACLE_Q13,
    "q15_token_bigrams": ORACLE_Q15,
    "q16_daily_event_stats": ORACLE_Q16,
})


# --- q17: sessionization (gap-based; the batch form of stateful streaming) ------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def q17_sessionization(spark, sf_dir):
    """Per-user sessions: a new session starts when the gap from the previous
    event exceeds 30 min.  Two stacked windows (lag → running sum) — the
    standard batch sessionizer; the streaming twin would be
    applyInPandasWithState, unnecessary here (north_rule is batch)."""
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gapped = ev.select("user_id", "event_id", ts_us.alias("t")).withColumn(
        "new_session",
        (F.coalesce(F.col("t") - F.lag("t").over(w), F.lit(SESSION_GAP_US + 1)) > SESSION_GAP_US)
        .cast("int"),
    )
    sessions = gapped.withColumn("session_no", F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        ((F.max("t") - F.min("t")) / 1_000_000).cast("bigint").alias("duration_sec"),
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.sum("duration_sec").cast("bigint").alias("total_session_sec"),
    )


ORACLE_Q17 = f"""
WITH gapped AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, {SESSION_GAP_US + 1})
              > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, event_id, t,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM gapped),
per_session AS (
  SELECT user_id, session_no, COUNT(*) AS n_events,
         (MAX(t) - MIN(t)) // 1000000 AS duration_sec
  FROM sessions GROUP BY user_id, session_no)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(SUM(duration_sec) AS BIGINT) AS total_session_sec
FROM per_session GROUP BY user_id
"""

QUERIES["q17_sessionization"] = q17_sessionization
ORACLES["q17_sessionization"] = ORACLE_Q17


# --- q14: pivot (wide per-entity metrics via conditional aggregation) ------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q14_event_type_pivot(spark, sf_dir):
    """Events pivoted to one row per user with per-type counts.  Expressed as
    conditional aggregation (portable, and exactly what Spark's pivot()
    compiles to after its extra distinct-values job — skipping that job is
    the scale win when the pivot domain is known)."""
    ev = load(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("bigint").alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs)


_pivot_cols = ",\n       ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
    for t in _EVENT_TYPES
)
ORACLE_Q14 = f"""
SELECT user_id,
       {_pivot_cols}
FROM events GROUP BY user_id
"""

QUERIES["q14_event_type_pivot"] = q14_event_type_pivot
ORACLES["q14_event_type_pivot"] = ORACLE_Q14


# --- q18: map functions (map_from_entries / map_keys / element_at lookup) --------

def q18_map_rollup(spark, sf_dir):
    """Per-user event-type → value-total MAP, then map-side reads: key
    cardinality, sorted key list, and point lookups with absent-key default.

    Closes SURVEY §2 Part B 'map fns' (previously superseded by joins): the
    map is built with map_from_entries over per-type pre-aggregates (entries
    sorted so map key order is deterministic), read with map_keys /
    element_at.  Per-type totals go through DECIMAL(18,2) per row before
    summing so both engines do exact decimal arithmetic; the exposed totals
    are floor-scaled BIGINT cents (``*_e2``) per the module parity convention
    (queries/__init__.py) — returning raw decimals hash-mismatched in round 2
    because DuckDB's COALESCE/CAST rendered them as DOUBLE."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "total")))
        ).alias("totals")
    )

    def lookup(key):
        total = F.coalesce(F.element_at("totals", F.lit(key)), F.lit(0)) \
                 .cast("decimal(18,2)")
        return F.floor(total * 100).cast("bigint")

    return m.select(
        "user_id",
        F.size(F.map_keys("totals")).cast("bigint").alias("n_types"),
        F.concat_ws(",", F.sort_array(F.map_keys("totals"))).alias("types_csv"),
        lookup("click").alias("click_total_e2"),
        lookup("purchase").alias("purchase_total_e2"),
    )


ORACLE_Q18 = """
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
       CAST(FLOOR(CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                                 THEN CAST(value AS DECIMAL(18,2)) END), 0)
                       AS DECIMAL(18,2)) * 100) AS BIGINT) AS click_total_e2,
       CAST(FLOOR(CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,2)) END), 0)
                       AS DECIMAL(18,2)) * 100) AS BIGINT) AS purchase_total_e2
FROM events GROUP BY user_id
"""

QUERIES["q18_map_rollup"] = q18_map_rollup
ORACLES["q18_map_rollup"] = ORACLE_Q18
