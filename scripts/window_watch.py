#!/usr/bin/env python3
"""Clean-window hunter for the N→4N scaling study (r5 verdict #1a).

Round 5 ran every study into contended windows (busy-loop ceilings
0.74–0.83) and never observed the job-level raw ≥ 0.8 the kernel already
demonstrates.  This watcher inverts the workflow: probe the host every
--interval seconds with the study's own calibrations, and the moment a
probe reads clean (cpu ceiling ≥ --cpu-gate, DRAM ceiling ≥
--mem-gate, hypervisor steal ≤ --steal-gate during the probe), fire a short
alternating-pairs study against a pre-materialized corpus.  Repeats until a
raw sample ≥ 0.8 lands in BENCH/history.jsonl or the attempt/time budget
runs out.

Usage: python3 scripts/window_watch.py [--corpus /tmp/corpus500k]
       [--n-docs 500000] [--max-attempts 3] [--max-hours 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import _steal_jiffies, cpu_calibration, mem_calibration  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    s0 = _steal_jiffies()
    calib = cpu_calibration(levels=(4, 16))
    mcalib = mem_calibration(levels=(4, 16))
    steal = (_steal_jiffies() - s0) / 100.0
    return {
        "cpu_ceiling": round(calib[4] / calib[16], 3),
        "mem_ceiling": round(mcalib[4] / mcalib[16], 3),
        "steal_sec": round(steal, 1),
        "ts": time.strftime("%H:%M:%S"),
    }


def last_eff() -> float | None:
    path = os.path.join(REPO, "BENCH", "history.jsonl")
    if not os.path.exists(path):
        return None
    lines = [ln for ln in open(path) if ln.strip()]
    return json.loads(lines[-1])["eff_4_16"] if lines else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/corpus500k")
    ap.add_argument("--n-docs", type=int, default=500000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--interval", type=float, default=75.0)
    ap.add_argument("--cpu-gate", type=float, default=0.90)
    ap.add_argument("--mem-gate", type=float, default=0.80)
    ap.add_argument("--steal-gate", type=float, default=1.5)
    ap.add_argument("--max-attempts", type=int, default=3)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--short", action="store_true",
                    help="fire studies with --short (4/16-only calibration; "
                         "pair with --repeats 1 and a ~250-350k corpus): the "
                         "r7 hunt's repeated failure mode was probe-clean -> "
                         "ceiling decays inside the ~9-min full study, so the "
                         "whole measurement must fit one clean window")
    ap.add_argument("--streak", type=int, default=1,
                    help="consecutive clean probes required before firing. "
                         "Default 1 = fire on a SINGLE clean probe: host "
                         "windows decay at the ~1-2 min scale (shorter than "
                         "a probe gap), so streak-2 never fires in practice "
                         "(validated round 6, 51 samples).")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    attempts = 0
    streak = 0
    while time.time() < deadline and attempts < args.max_attempts:
        p = probe()
        clean = (p["cpu_ceiling"] >= args.cpu_gate
                 and p["mem_ceiling"] >= args.mem_gate
                 and p["steal_sec"] <= args.steal_gate)
        streak = streak + 1 if clean else 0
        print(json.dumps({**p, "clean": clean, "streak": streak}), flush=True)
        if streak >= args.streak:
            streak = 0
            attempts += 1
            print(json.dumps({"firing": attempts}), flush=True)
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
                 "--n-docs", str(args.n_docs), "--corpus", args.corpus,
                 "--skip-8-32", "--repeats", str(args.repeats)]
                + (["--short"] if args.short else []),
                cwd=REPO, capture_output=True, text=True, timeout=3600)
            tail = (r.stdout or "").strip().splitlines()
            print(json.dumps({"study_rc": r.returncode,
                              "tail": tail[-3:] if tail else [],
                              "err": (r.stderr or "")[-500:] if r.returncode else ""}),
                  flush=True)
            eff = last_eff()
            print(json.dumps({"attempt": attempts, "eff_4_16": eff}), flush=True)
            if eff is not None and eff >= 0.8:
                print(json.dumps({"done": True, "eff_4_16": eff}), flush=True)
                return
            continue  # re-probe immediately; maybe the window held
        time.sleep(args.interval)
    print(json.dumps({"done": False, "attempts": attempts}), flush=True)


if __name__ == "__main__":
    main()
