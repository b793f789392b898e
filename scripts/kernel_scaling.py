#!/usr/bin/env python3
"""Kernel-only N vs 4N scaling: the REAL extraction workload, zero Spark.

The job-level study (scaling_bench.py) measures spark-submit end-to-end;
its ratio therefore includes Spark's fixed per-run component (scan, write,
summarize/lineage jobs, driver).  This tool isolates the question the
north-rule cares about — does the EXTRACTION STAGE itself scale? — by
running the exact mapInArrow kernel body (Arrow decode → extract → Arrow
encode, scripts/kernel_profile.py's workload) in N and 4N pinned worker
processes, each extracting the same per-process batch set.

Per-process wall at N vs 4N IS the scaling efficiency for fixed per-core
work: throughput_N = N/t_N, so eff(4→16) = (thr16/thr4)/4 = t4/t16.  This
is the same-shape measurement as the study's busy-loop / DRAM calibrations,
but with the production workload — whatever it reads IS the extraction
stage's same-window hardware envelope, with no dataflow component at all.

Usage: python3 scripts/kernel_scaling.py [n_docs_per_proc]
Appends one JSON line to BENCH/kernel_scaling.jsonl and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = (4, 16)


def _worker(args):
    core, n_docs = args
    os.sched_setaffinity(0, {core})
    import pyarrow as pa

    from docling_service_spark.corpus import make_corpus
    from docling_service_spark.sparkio.batch import make_extract_kernel

    docs = make_corpus(n_docs)
    tbl = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs])
    batches = tbl.to_batches(max_chunksize=256)
    kernel = make_extract_kernel()
    for _ in kernel(iter(batches)):  # warm (imports, regex caches)
        pass
    t0 = time.perf_counter()
    n = 0
    for out in kernel(iter(batches)):
        n += out.num_rows
    return time.perf_counter() - t0, n


def run_level(n_procs: int, n_docs: int) -> float:
    """Mean per-process kernel wall with each worker pinned to its own core."""
    ctx = mp.get_context("spawn")  # fresh interpreters: no COW-shared state
    with ctx.Pool(n_procs) as pool:
        walls = pool.map(_worker, [(c, n_docs) for c in range(n_procs)])
    return sum(w for w, _ in walls) / n_procs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    results = {}
    for n in LEVELS:
        results[n] = round(run_level(n, n_docs), 3)
    eff = round(results[LEVELS[0]] / results[LEVELS[1]], 3)
    rec = {
        "n_docs_per_proc": n_docs,
        "per_proc_wall_sec": {str(k): v for k, v in results.items()},
        "kernel_eff_4_16": eff,
        "docs_per_sec_4": round(LEVELS[0] * n_docs / results[LEVELS[0]], 1),
        "docs_per_sec_16": round(LEVELS[1] * n_docs / results[LEVELS[1]], 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "kernel_scaling.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
