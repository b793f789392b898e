#!/usr/bin/env python3
"""Observe-pivot vs summary-scan crossover sweep (r7 verdict #5).

``_OBSERVE_BUCKET_CAP`` (sparkio/checkpoint.py) decides whether per-bucket
summaries ride the extraction write as df.observe conditional aggregates
(3 expressions per processed bucket in one CollectMetrics node — plan +
codegen cost grows linearly with the bucket count, but zero extra jobs) or
come from a post-write ``_bucket_summaries`` scan (one extra job of fixed
shape, independent of bucket count).  The 64 cap was asserted from plan-cost
reasoning; this sweep MEASURES the crossover: the same fixed corpus is
committed into a fresh table at each bucket count with the cap forced to
each mode, best-of-N walls per cell.

Usage: python3 scripts/observe_sweep.py [--n-docs 6000] [--repeats 2]
Writes BENCH/OBSERVE_SWEEP.md and prints one JSON line per cell + a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET_COUNTS = (8, 32, 64, 128, 256)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=6000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--buckets", default=",".join(map(str, BUCKET_COUNTS)),
                    help="comma-separated bucket counts to sweep")
    ap.add_argument("--no-md", action="store_true",
                    help="print cells only; don't rewrite BENCH/OBSERVE_SWEEP.md")
    args = ap.parse_args()
    bucket_counts = tuple(int(b) for b in args.buckets.split(","))

    from docling_service_spark.corpus import corpus_df
    from docling_service_spark.sparkio import checkpoint as cp
    from docling_service_spark.sparkio.checkpoint import run_incremental
    from docling_service_spark.sparkio.session import get_spark

    spark = get_spark(f"local[{args.cpus}]", app_name="observe-sweep",
                      shuffle_partitions=args.cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="dss-observe-sweep-")
    corpus_path = os.path.join(scratch, "corpus")
    corpus_df(spark, args.n_docs, partitions=args.cpus * 2) \
        .write.parquet(corpus_path, mode="overwrite")
    ddl = ("doc_id string, spans array<struct<kind:string,text:string,"
           "media_ref:string,offset:int>>")
    scan = spark.read.schema(ddl).parquet(corpus_path)
    # Warm JVM + python workers (untimed).
    run_incremental(spark, scan, os.path.join(scratch, "warm"), n_buckets=8,
                    num_partitions=args.cpus, run_id="warm")

    cap0 = cp._OBSERVE_BUCKET_CAP
    cells: dict[str, dict[int, float]] = {"pivot": {}, "scan": {}}
    try:
        for n_buckets in bucket_counts:
            for mode, cap in (("pivot", 10**9), ("scan", -1)):
                cp._OBSERVE_BUCKET_CAP = cap
                walls, summarize_ms = [], []
                for rep in range(args.repeats):
                    root = os.path.join(scratch, f"t{n_buckets}-{mode}-{rep}")
                    t0 = time.perf_counter()
                    s = run_incremental(spark, scan, root, n_buckets=n_buckets,
                                        num_partitions=args.cpus, run_id="r")
                    walls.append(round(time.perf_counter() - t0, 3))
                    summarize_ms.append(s["timings_ms"]["summarize_ms"])
                    shutil.rmtree(root, ignore_errors=True)
                cells[mode][n_buckets] = min(walls)
                print(json.dumps({"buckets": n_buckets, "mode": mode,
                                  "wall_sec": min(walls), "samples": walls,
                                  "summarize_ms": summarize_ms}),
                      flush=True)
    finally:
        cp._OBSERVE_BUCKET_CAP = cap0
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()

    # Crossover: largest bucket count where the pivot still wins (walls are
    # best-of-N on a 2.4x-variance host — treat sub-5% deltas as a tie).
    rows, crossover = [], None
    for n in bucket_counts:
        p, s = cells["pivot"][n], cells["scan"][n]
        delta = (s - p) / s
        verdict = "tie" if abs(delta) < 0.05 else ("pivot" if p < s else "scan")
        if verdict != "scan":
            crossover = n
        rows.append((n, p, s, delta, verdict))
    summary = {"pivot_wins_through": crossover,
               "cells": {m: cells[m] for m in cells},
               "n_docs": args.n_docs, "repeats": args.repeats}
    print(json.dumps({"observe_sweep": summary}))
    if args.no_md:
        return

    md = ["# Observe-pivot vs summary-scan crossover (r7 verdict #5)", "",
          f"Fixed corpus: {args.n_docs} docs, local[{args.cpus}], "
          f"best-of-{args.repeats} walls of a full `run_incremental` into a "
          "fresh table at each bucket count, `_OBSERVE_BUCKET_CAP` forced to "
          "each mode.  The pivot books 3 conditional aggregates per bucket "
          "in one CollectMetrics node riding the extraction write (zero "
          "extra jobs); the scan is one extra fixed-shape job.", "",
          "| buckets | pivot wall (s) | scan wall (s) | scan-vs-pivot | winner |",
          "|---|---|---|---|---|"]
    for n, p, s, delta, verdict in rows:
        md.append(f"| {n} | {p:.3f} | {s:.3f} | {delta:+.1%} | {verdict} |")
    md += ["", f"Pivot wins (or ties) through **{crossover}** buckets on this "
           "measurement; ties below 5% are within the host's documented "
           "run-to-run variance."]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "OBSERVE_SWEEP.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
