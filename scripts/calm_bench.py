"""Calm-window bench hunter (round-5 VERDICT item 4).

This host's hypervisor steal moves identical-code suite times by ±40%
(see BENCH/BASELINE.md run history), so a per-query comparison against
the round-2 table is only meaningful from a steal-free window. Windows
decay in 2-5 minutes, so the loop probes cheaply and fires the full
bench the moment a window opens:

  1. every cycle: ~4 s pure-python burn probe at 1/16/32 procs
  2. if p32 >= --t32 (default 0.80) or p16 >= --t16 (default 0.90),
     run bench.py at local[32] immediately
  3. keep every capture in /tmp/calm_bench_runs.jsonl; stop early when
     a capture's own in-run hw_eff stamp clears --t32, else report the
     best found at the deadline

Note the structural context: the host advertises 32 vCPUs but delivers
~22-24 under full load, so hw_eff measured AT 32 procs has a ceiling
well below 1.0 even in a perfectly calm window (~0.7-0.75 observed);
the 16-proc probe separates "host busy" from that cap.

Usage: python scripts/calm_bench.py [--minutes 60] [--t32 0.8] [--t16 0.9]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import hardware_ceiling  # noqa: E402  (shared burn probe)


def probe() -> dict:
    # ONE probe implementation repo-wide (r5 review: a parallel _burn
    # with different constants here could drift from the numbers
    # scaling_bench/calm_scaling report for the same host state)
    eff, _raw = hardware_ceiling(proc_counts=(1, 16, 32))
    return {"p16": eff[16], "p32": eff[32]}


def run_bench() -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        # a steal-wedged bench is the very condition this loop hunts
        # around — skip the capture, keep hunting (r5 review)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60)
    ap.add_argument("--t32", type=float, default=0.80)
    ap.add_argument("--t16", type=float, default=0.90)
    ap.add_argument("--log", default="/tmp/calm_bench_runs.jsonl")
    args = ap.parse_args()
    deadline = time.time() + args.minutes * 60
    best = None
    while time.time() < deadline:
        p = probe()
        calm = p["p32"] >= args.t32 or p["p16"] >= args.t16
        print(f"probe {p} calm={calm}", flush=True)
        if not calm:
            time.sleep(20)
            continue
        res = run_bench()
        if res is None:
            continue
        res["probe_before"] = p
        with open(args.log, "a") as fh:
            fh.write(json.dumps(res) + "\n")
        if best is None or (res.get("hw_eff") or 0) > (best.get("hw_eff") or 0):
            best = res
        print(f"captured hw_eff={res.get('hw_eff')} suite={res.get('value')}", flush=True)
        if (res.get("hw_eff") or 0) >= args.t32:
            break
    print("BEST: " + json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
