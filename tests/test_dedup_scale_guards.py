"""Scale guards on the dedup operators (round-2 verdict items):

- q33 must be NON-vacuous: the full-table LSH band-join finds the corpus's
  real near-dups (Jaccard 0.96-0.99 mutation pairs), so a green oracle row
  proves collision behavior, not just that both engines emit nothing.
- q31's stop-shingle cap must bound the self-join fan-out: a boilerplate
  shingle present in d docs would otherwise contribute d(d-1)/2 join rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_service_spark.queries.dedup import (
    MAX_SHINGLE_DF,
    jaccard_pairs,
    q33_lsh_candidate_pairs,
)

SF_DIR = "/root/testdata/sf0.01"


def test_q33_non_vacuous(spark):
    n = q33_lsh_candidate_pairs(spark, SF_DIR).count()
    assert n > 0, "q33 must produce candidate pairs at sf0.01 (was vacuous in round 1)"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_hot_shingle_is_capped(spark):
    # 40 docs (> MAX_SHINGLE_DF) share ONE boilerplate shingle and nothing
    # else pairwise: without the cap this yields 40*39/2 = 780 candidate
    # pairs; with the cap the hot shingle is dropped and no pair survives.
    assert 40 > MAX_SHINGLE_DF
    rows = [(i, f"copyright footer boilerplate unique{i} tail{i}") for i in range(40)]
    out = jaccard_pairs(_docs(spark, rows), min_jaccard_e4=1)
    assert out.count() == 0

    uncapped = jaccard_pairs(_docs(spark, rows), max_df=1000, min_jaccard_e4=1)
    assert uncapped.count() == 40 * 39 // 2


def test_cap_preserves_true_near_dups(spark):
    # Two genuinely similar docs (high Jaccard) still pair under the cap.
    base = " ".join(f"w{i}" for i in range(30))
    rows = [(1, base), (2, base + " extra"), (3, "totally different words entirely here")]
    out = jaccard_pairs(_docs(spark, rows)).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]


def test_sampled_df_catches_hot_shingles(spark):
    # 100-TB path: DF estimated on a deterministic 1/4 doc slice. 200 docs
    # share one boilerplate shingle — it shows up ~50 times in the slice,
    # far above the scaled threshold (32/4 = 8), and is dropped.
    rows = [(i, f"copyright footer boilerplate unique{i} tail{i}") for i in range(200)]
    out = jaccard_pairs(_docs(spark, rows), min_jaccard_e4=1, df_sample_mod=4)
    assert out.count() == 0


def test_sampled_df_preserves_true_near_dups(spark):
    # Rare shingles (true DF ~2) never reach the scaled threshold, so real
    # near-dup pairs survive the sampled cap with EXACT intersection counts.
    base = " ".join(f"w{i}" for i in range(30))
    rows = [(1, base), (2, base + " extra"), (3, "totally different words entirely here")]
    exact = {(r.id_a, r.id_b, r.n_shared, r.jaccard_e4)
             for r in jaccard_pairs(_docs(spark, rows)).collect()}
    sampled = {(r.id_a, r.id_b, r.n_shared, r.jaccard_e4)
               for r in jaccard_pairs(_docs(spark, rows), df_sample_mod=4).collect()}
    assert sampled == exact == {(1, 2, next(iter(exact))[2], next(iter(exact))[3])}


def test_cap_bounds_join_rows_not_scores(spark):
    # Docs overlapping only via sub-cap shingles keep exact intersection
    # counts; sizes use the UNCAPPED sets (score is a lower bound).
    shared = "alpha beta gamma delta"
    rows = [(1, shared + " one1 one2"), (2, shared + " two1 two2")]
    r = jaccard_pairs(_docs(spark, rows), min_jaccard_e4=1).collect()[0]
    assert r.n_shared == 2  # 'alpha beta gamma', 'beta gamma delta'
