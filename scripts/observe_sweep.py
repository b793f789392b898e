#!/usr/bin/env python3
"""Run-stats accumulator vs fused post-write scan sweep (round 8).

Round-8 history: the per-bucket observe PIVOT this script originally
swept (r7 verdict #5) measured as per-ROW cost and was retired — the
measured record lives in BENCH/OBSERVE_SWEEP.md §"historical".  Its
replacement is the kernel-side run-stats ACCUMULATOR
(``_USE_STATS_ACC``, sparkio/checkpoint.py): lineage counters + bucket
fingerprints fold into the extraction write itself (one numpy pass per
batch, one accumulator add per task, observe cross-checked), with the
degrade path being ONE fused groupingSets scan over the written files.
This sweep measures acc vs scan the same way the pivot sweep did: same
fixed corpus committed into a fresh table at each bucket count via
``run_incremental``, knob forced to each mode, best-of-N walls.

Usage: python3 scripts/observe_sweep.py [--n-docs 6000] [--repeats 2]
Writes the round-8 section of BENCH/OBSERVE_SWEEP.md and prints one
JSON line per cell + a summary.
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
                    help="print cells only; don't write the md section")
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

    knob0 = cp._USE_STATS_ACC
    cells: dict[str, dict[int, float]] = {"acc": {}, "scan": {}}
    summarize: dict[str, dict[int, int]] = {"acc": {}, "scan": {}}
    try:
        for n_buckets in bucket_counts:
            for mode, use_acc in (("acc", True), ("scan", False)):
                cp._USE_STATS_ACC = use_acc
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
                summarize[mode][n_buckets] = min(summarize_ms)
                print(json.dumps({"buckets": n_buckets, "mode": mode,
                                  "wall_sec": min(walls), "samples": walls,
                                  "summarize_ms": summarize_ms}),
                      flush=True)
    finally:
        cp._USE_STATS_ACC = knob0
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()

    rows = []
    for n in bucket_counts:
        a, s = cells["acc"][n], cells["scan"][n]
        delta = (s - a) / s
        verdict = "tie" if abs(delta) < 0.05 else ("acc" if a < s else "scan")
        rows.append((n, a, s, delta, verdict))
    summary = {"cells": cells, "summarize_ms": summarize,
               "n_docs": args.n_docs, "repeats": args.repeats}
    print(json.dumps({"acc_vs_scan_sweep": summary}))
    if args.no_md:
        return

    md = ["", f"## Round 8: accumulator vs fused scan "
          f"({args.n_docs} docs, local[{args.cpus}], best-of-{args.repeats})", "",
          "| buckets | acc wall (s) | scan wall (s) | scan-vs-acc | winner "
          "| acc summarize_ms | scan summarize_ms |",
          "|---|---|---|---|---|---|---|"]
    for n, a, s, delta, verdict in rows:
        md.append(f"| {n} | {a:.3f} | {s:.3f} | {delta:+.1%} | {verdict} "
                  f"| {summarize['acc'][n]} | {summarize['scan'][n]} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "OBSERVE_SWEEP.md")
    with open(out, "a") as f:
        f.write("\n".join(md) + "\n")
    print(f"appended round-8 section to {out}")


if __name__ == "__main__":
    main()
