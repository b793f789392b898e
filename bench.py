#!/usr/bin/env python3
"""Per-round benchmark.  Prints ONE JSON line:

    {"metric": "extraction_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...extras}

Headline: docs/sec of the full extraction pipeline (synthetic interleaved
corpus generated in executors → salted repartition → mapInArrow extract →
noop sink).  The queries dict times the flagship + representative operators
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Reference baseline (BASELINE.md): 0.07-0.125 docs/sec single-stream CPU.
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Corpus scaled to the sf of the oracle tables: sf0.1 → 6000 docs (~2 pages each).
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_DOCS = max(600, int(60000 * SF))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_dedup_first_wins",
    "q09_revenue_by_nation",
    "q20_token_stats",
    "q24_chunking",
    "q26_vocabulary",
    "q31_ngram_jaccard_pairs",
    "q32_minhash_signatures",
    "q33_lsh_candidate_pairs",
    "q34_simhash",
    "q40_cosine_topk",
    "q42_lsh_bucketed_neighbors",
    "q44_ivf_assignments",
    "q50_media_features",
    "q61_extract_html_docs",
    "q62_extract_spreadsheet",
    "q64_extract_flowdoc",
]


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import pathlib

    if not pathlib.Path(SF_DIR, "lineitem.parquet").exists():
        raise SystemExit(f"SPARK_GRAFT_SF_DIR={SF_DIR} has no lineitem.parquet")

    from docling_service_spark.corpus import corpus_df
    from docling_service_spark.queries import QUERIES
    from docling_service_spark.sparkio.pipeline import derive_lineage, run_extraction
    from docling_service_spark.sparkio.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="dss-bench", shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + python workers (excluded from timings).
    materialize(run_extraction(corpus_df(spark, 100, partitions=CPUS)))

    timings: dict[str, float] = {}

    # Headline: extraction throughput (no-shuffle fast path: generator/scan
    # splits are the partitioner; see sparkio/pipeline.py).
    t0 = time.perf_counter()
    out = run_extraction(corpus_df(spark, N_DOCS, partitions=CPUS * 4))
    materialize(out)
    extract_sec = time.perf_counter() - t0
    timings["extraction_pipeline"] = round(extract_sec, 3)

    # Python-stage wall (classify-stage dominance evidence): sum of per-batch
    # extractor wall time vs end-to-end wall.
    lineage = derive_lineage(
        run_extraction(corpus_df(spark, N_DOCS, partitions=CPUS * 4)),
        run_id="bench", snapshot_id=0,
    )
    stats = lineage.groupBy().sum("wall_ms", "doc_count").collect()[0]
    classify_ms, n_docs_seen = int(stats[0]), int(stats[1])

    for name in BENCH_QUERIES:
        q = QUERIES[name]
        t0 = time.perf_counter()
        materialize(q(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    docs_per_sec = N_DOCS / extract_sec
    print(json.dumps({
        "metric": "extraction_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "n_docs": n_docs_seen,
        "cpus": CPUS,
        "classify_stage_cpu_ms": classify_ms,
        "classify_share_of_cpu_budget": round(classify_ms / (extract_sec * CPUS * 1000), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
