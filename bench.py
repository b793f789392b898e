#!/usr/bin/env python3
"""Per-round benchmark.  Prints ONE JSON line:

    {"metric": "extraction_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...extras}

Headline: docs/sec of the full extraction pipeline (synthetic interleaved
corpus generated in executors → salted repartition → mapInArrow extract →
noop sink).  The queries dict times the flagship + representative operators
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Best-of-N protocol (round-3 verdict #4 — the repo's own rule, CLAUDE.md:
host shows up to 2.4x run variance, so a single sample cannot distinguish a
slow window from a regression): the headline runs HEADLINE_RUNS=3 times and
reports the MIN; each query runs QUERY_RUNS=2 times and reports the MIN.
All samples are recorded in the ``samples`` extra for post-hoc variance
checks.

Window telemetry (round-8, r7 verdict #1): BENCH_r07 ran in memory-contended
host windows (-17% headline, +19-36% on untouched queries) and carried no
provenance to prove it was host noise.  The bench now (a) GATES on the
window-watcher's own probe — hypervisor steal + ALU/DRAM busy-loop
calibrations — waiting a bounded number of probes for a clean window before
starting (SPARK_GRAFT_BENCH_GATE_PROBES=0 disables), and (b) stamps the
report with the pre/post probe readings and the /proc/stat steal absorbed
during the headline section and the whole bench, so every BENCH_rN.json
carries the evidence to adjudicate its own round-over-round swings.

Reference baseline (BASELINE.md): 0.07-0.125 docs/sec single-stream CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
from scaling_bench import _steal_jiffies  # noqa: E402
from window_watch import probe as window_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Corpus scaled to the sf of the oracle tables: sf0.1 → 6000 docs (~2 pages each).
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_DOCS = max(600, int(60000 * SF))

HEADLINE_RUNS = 3
QUERY_RUNS = 2

# Pre-bench window gate (r7 verdict #1): same thresholds as the scaling
# watcher.  Bounded — the per-round driver must never stall on a bad hour,
# so after GATE_PROBES dirty probes the bench proceeds and the stamped
# readings say so.
GATE_PROBES = int(os.environ.get("SPARK_GRAFT_BENCH_GATE_PROBES", "6"))
GATE_SLEEP_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_SLEEP", "45"))
CPU_GATE, MEM_GATE, STEAL_GATE = 0.90, 0.80, 1.5


def _probe_clean(p: dict) -> bool:
    return (p["cpu_ceiling"] >= CPU_GATE and p["mem_ceiling"] >= MEM_GATE
            and p["steal_sec"] <= STEAL_GATE)


def wait_for_window() -> dict:
    """Probe until clean or the probe budget runs out; returns the window
    record to stamp into the report (all probes kept — a decaying window is
    diagnosable only if the misses are visible)."""
    probes = []
    for i in range(max(1, GATE_PROBES)):
        p = window_probe()
        p["clean"] = _probe_clean(p)
        probes.append(p)
        if p["clean"] or GATE_PROBES == 0:
            break
        if i < GATE_PROBES - 1:
            time.sleep(GATE_SLEEP_SEC)
    return {"pre_probes": probes, "gated_clean": probes[-1]["clean"],
            "probes_waited": len(probes) - 1}

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
    "q43_embedding_near_dup_keepers",
    "q44_ivf_assignments",
    "q45_ivf_ann_topk",
    "q46_ivf_cluster_pairs",
    "q47_ivf2_assignments",
    "q48_ivf2_ann_topk",
    "q50_media_features",
    "q51_frame_sample",
    "q61_extract_html_docs",
    "q62_extract_spreadsheet",
    "q63_extract_slides",
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

    window = wait_for_window()
    steal_bench0 = _steal_jiffies()

    spark = get_spark(f"local[{CPUS}]", app_name="dss-bench", shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + python workers (excluded from timings).
    materialize(run_extraction(corpus_df(spark, 100, partitions=CPUS)))

    from docling_service_spark.training import build_training_set

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    sample_outliers: dict[str, dict] = {}

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def best_of(name: str, fn, runs: int) -> float:
        secs = [round(timed(fn), 3) for _ in range(runs)]
        samples[name] = secs
        best = min(secs)
        timings[name] = best
        # Reverse-warm-up outlier flag (r5 verdict #7: q24 once sampled
        # [0.399, 1.87] — FIRST run fastest, opposite the warm-up pattern,
        # i.e. the later sample timed a concurrent GC/eviction, not the
        # query).  Surfacing it in the report keeps round-over-round
        # comparisons honest without changing the best-of rule.
        if len(secs) > 1 and secs[0] == best and max(secs) > 2.5 * best:
            sample_outliers[name] = {
                "note": "first-run-fastest; later sample >2.5x", "secs": secs}
        return best

    # Headline: extraction throughput (no-shuffle fast path: generator/scan
    # splits are the partitioner; see sparkio/pipeline.py).  Best of
    # HEADLINE_RUNS full passes.
    steal_head0 = _steal_jiffies()
    extract_sec = best_of(
        "extraction_pipeline",
        lambda: materialize(run_extraction(corpus_df(spark, N_DOCS, partitions=CPUS * 4))),
        HEADLINE_RUNS,
    )
    steal_sec_headline = round((_steal_jiffies() - steal_head0) / 100.0, 1)

    # Python-stage wall (classify-stage dominance evidence): sum of per-batch
    # extractor wall time vs end-to-end wall — BOTH measured on this same
    # lineage pass (mixing this numerator with the min-of-3 headline wall
    # would systematically inflate the share under host variance).  The
    # denominator times ONLY the lineage-producing extraction action: the
    # lineage frame is persisted so the groupBy().sum() stats job reads the
    # ~P cached rows, not a second extraction, and is excluded from the wall.
    lineage = derive_lineage(
        run_extraction(corpus_df(spark, N_DOCS, partitions=CPUS * 4)),
        run_id="bench", snapshot_id=0,
    ).persist()
    t0 = time.perf_counter()
    materialize(lineage)
    lineage_wall = time.perf_counter() - t0
    stats = lineage.groupBy().sum("wall_ms", "doc_count").collect()[0]
    lineage.unpersist()
    classify_ms, n_docs_seen = int(stats[0]), int(stats[1])

    # Training-set funnel over the extracted output (body strip → quality
    # gate → exact dedup → chunk): times the end-to-end derivation the way a
    # data pipeline would run it.  Extraction cost is included (the funnel
    # consumes the extractor's output); compare against extraction_pipeline
    # to isolate the funnel itself.
    out_df = run_extraction(corpus_df(spark, N_DOCS, partitions=CPUS * 4))
    best_of("training_funnel", lambda: materialize(build_training_set(out_df)), QUERY_RUNS)

    for name in BENCH_QUERIES:
        q = QUERIES[name]
        best_of(name, lambda q=q: materialize(q(spark, SF_DIR)), QUERY_RUNS)

    # Skewed-corpus section (r4 verdict next-round #4): a heavy-tailed corpus
    # with 1% of docs 100x larger, CLUSTERED (oversize_first + spark.range's
    # contiguous splits) and MATERIALIZED to a 4-file parquet table — a
    # clustered-key table whose row-group boundaries keep the giants clumped,
    # the pathological layout run_extraction's opt-in salted repartition
    # exists for.  (Timing the generator pipeline directly would hide the
    # contrast: generation itself runs at the input's parallelism either
    # way and dominates.)  Timed both ways so the salting knob has a
    # measured crossover, not folklore: salt when the straggler tail
    # (max-split doc-equivalents / per-core rate) exceeds the salted wall
    # (total work over all cores PLUS the shuffle's nested-row codec toll,
    # ~2x the extraction of the moved rows — CLAUDE.md gotcha).  With
    # uniformly-sized or pre-spread inputs direct wins (measured: sf0.01
    # spread layout, direct 0.55 s vs salted 1.28 s); on this clustered
    # table salting wins — see BENCH_r{N} for the recorded pair.
    import shutil
    import tempfile

    skew_n = max(600, N_DOCS)
    giants = max(6, skew_n // 100)
    skew_dir = tempfile.mkdtemp(prefix="dss-bench-skew-")
    try:
        corpus_df(spark, skew_n, partitions=4,
                  oversize_first=giants, oversize_factor=100) \
            .write.parquet(skew_dir + "/corpus", mode="overwrite")
        skew_ddl = ("doc_id string, spans array<struct<kind:string,text:string,"
                    "media_ref:string,offset:int>>")
        scan = spark.read.schema(skew_ddl).parquet(skew_dir + "/corpus")
        best_of("skew_direct", lambda: materialize(run_extraction(scan)), QUERY_RUNS)
        best_of("skew_salted",
                lambda: materialize(run_extraction(scan, num_partitions=CPUS * 4)),
                QUERY_RUNS)
    finally:
        shutil.rmtree(skew_dir, ignore_errors=True)

    window["steal_sec_headline"] = steal_sec_headline
    window["steal_sec_total"] = round((_steal_jiffies() - steal_bench0) / 100.0, 1)
    post = window_probe()
    post["clean"] = _probe_clean(post)
    window["post_probe"] = post

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
        "classify_share_of_cpu_budget": round(classify_ms / (lineage_wall * CPUS * 1000), 3),
        "skew": {"n_docs": skew_n, "giants": giants, "giant_factor": 100,
                 "layout": "4-file clustered parquet table, giants in file 0; "
                           f"salted = num_partitions={CPUS * 4}"},
        "protocol": {"headline_runs": HEADLINE_RUNS, "query_runs": QUERY_RUNS,
                     "report": "min",
                     # The share is a SINGLE sample (the headline is min-of-3)
                     # — treat its variance accordingly; numerator and
                     # denominator come from the same run by design.
                     "classify_share_runs": 1},
        "samples": samples,
        "sample_outliers": sample_outliers,
        "window": window,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
