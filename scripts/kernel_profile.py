#!/usr/bin/env python3
"""Extract-kernel allocation/throughput profile (no Spark).

Round-4 verdict item #1: the scaling study's DRAM-streaming calibration
shows the extraction stage tracking the MEMORY-bandwidth ceiling, not the
ALU ceiling — the kernel is allocation-bound.  This tool measures the two
signals that matter for that claim, on the same synthetic corpus the
scaling study extracts:

- throughput (docs/s, single thread, kernel only — Arrow decode + extract +
  Arrow encode, exactly the mapInArrow body);
- allocation churn:
  * gen0 GC collections per 1000 docs — every collection is ~`gc.get_threshold()[0]`
    container allocations, so this is a cumulative allocation-COUNT proxy;
  * per-batch transient peak (tracemalloc reset_peak per batch, averaged) —
    the working set the allocator churns through per 256-doc batch.

Usage:  python3 scripts/kernel_profile.py [n_docs]
Prints one JSON line; compare before/after kernel changes.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000

    from docling_service_spark.corpus import make_corpus
    from docling_service_spark.sparkio.batch import make_extract_kernel

    docs = make_corpus(n_docs)
    tbl = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs])
    batches = tbl.to_batches(max_chunksize=256)
    kernel = make_extract_kernel()

    def run() -> int:
        n = 0
        for out in kernel(iter(batches)):
            n += out.num_rows
        return n

    run()  # warm (regex caches, code objects)
    gc.collect()

    # Allocation-count proxy: gen0 collections during one full pass.
    gen0_before = gc.get_stats()[0]["collections"]
    t0 = time.perf_counter()
    n = run()
    wall = time.perf_counter() - t0
    gen0 = gc.get_stats()[0]["collections"] - gen0_before

    # Transient per-batch peak (tracemalloc slows the run ~3x; wall above is
    # the honest one — this pass only reads peaks).
    gc.collect()
    tracemalloc.start()
    peaks = []
    for b in batches:
        tracemalloc.reset_peak()
        base = tracemalloc.get_traced_memory()[0]
        for _ in kernel(iter([b])):
            pass
        peaks.append(tracemalloc.get_traced_memory()[1] - base)
    tracemalloc.stop()

    alloc_per_gen0 = gc.get_threshold()[0]
    print(json.dumps({
        "n_docs": n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n / wall, 1),
        "gen0_collections": gen0,
        "gen0_per_1k_docs": round(gen0 * 1000 / n, 1),
        "approx_container_allocs_per_doc": round(gen0 * alloc_per_gen0 / n),
        "batch_peak_mb_avg": round(sum(peaks) / len(peaks) / 1e6, 2),
        "batch_peak_mb_max": round(max(peaks) / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
