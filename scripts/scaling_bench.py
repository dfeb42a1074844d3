"""Scaling-efficiency evidence (north_rule: >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so "N vs 4N executors" is proxied
by the same job at two pinned parallelism levels: taskset-limited CPU
sets sized to the Spark parallelism (local[4] on 4 CPUs vs local[16] on
16 CPUs), so each configuration's JVM + python workers share exactly the
resources an executor would — the honest analog of adding machines.

The box advertises 32 vCPUs but a pure-CPU burn test shows the
virtualized host delivers only ~22-24 cores under full load (steal
time), so configurations above 16 cores measure the hypervisor, not the
engine; the headline pair is 4 -> 16. The 8 -> 32 pair is reported too,
with the measured hardware ceiling alongside.

Results → BENCH/BASELINE.md. Usage: python scripts/scaling_bench.py [n_convs]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

HAND_MARKER = "## Run history"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i % 7
    return time.time() - t0


def hardware_ceiling(proc_counts=(1, 4, 8, 16, 32)) -> dict:
    """Pure-python CPU burn at the given proc counts → what the host
    really delivers (isolates hypervisor throttling from engine
    behavior)."""
    out = {}
    for procs in proc_counts:
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(_burn, [3_000_000] * procs)
            out[procs] = round(procs * 0.000003 * 1_000_000 / (time.time() - t0), 2)
    base = out[1]
    return {k: round(v / (k * base), 3) for k, v in out.items()}, out


def run_bench(cpus: int, cpuset: str, n_convs: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "BENCH_CONVS": str(n_convs),
            "BENCH_TMP": "/tmp/bench_transcripts_scaling",
            # honor a caller override — the written evidence cites this
            "BENCH_REPEATS": os.environ.get("BENCH_REPEATS", "3"),
        }
    )
    out = subprocess.run(
        ["taskset", "-c", cpuset, sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at cpus={cpus}:\n{out.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    reps = max(1, int(os.environ.get("SCALING_REPS", "3")))
    hw_eff, hw_tp = hardware_ceiling()

    # headline pair 4->16, repeated: hypervisor steal moves single runs
    # by ±0.07 (round-2/3 history: 0.888/0.755/0.808/0.705/0.78), so one
    # sample proves little either way — report every rep + the median,
    # with a per-rep hardware probe so steal spikes are visible in-row.
    rep_rows = []
    for rep in range(reps):
        # probe IMMEDIATELY before each leg: the hw ratio bounds what a
        # zero-overhead engine could measure in that window — on this
        # host the pure-python 4->16 burn itself fails 0.8 in most
        # windows, so raw efficiency conflates engine and hypervisor
        probe4, raw4 = hardware_ceiling(proc_counts=(1, 4))
        r_n = run_bench(4, "0-3", n_convs)
        probe16, raw16 = hardware_ceiling(proc_counts=(1, 16))
        r_n4 = run_bench(16, "0-15", n_convs)
        eff = r_n4["turns_per_sec"] / (r_n["turns_per_sec"] * 4.0)
        # ratio of RAW aggregate burn throughputs — dividing the two
        # per-probe efficiencies instead would smuggle in the ratio of
        # their separate (noisy) 1-proc baselines
        hw_ratio = round(raw16[16] / (4.0 * raw4[4]), 3) if raw4[4] else 1.0
        rep_rows.append(
            {
                "tps_n": r_n["turns_per_sec"],
                "tps_4n": r_n4["turns_per_sec"],
                "turns": r_n["turns"],
                "efficiency": round(eff, 3),
                "hw4": probe4[4],
                "hw16": probe16[16],
                "hw_ratio": hw_ratio,
                "normalized": round(min(eff / hw_ratio, 1.0), 3),
            }
        )

    median_eff = round(statistics.median(r["efficiency"] for r in rep_rows), 3)
    median_norm = round(statistics.median(r["normalized"] for r in rep_rows), 3)
    best = max(r["efficiency"] for r in rep_rows)

    results = {"4->16": {"reps": rep_rows, "median": median_eff,
                          "median_norm": median_norm,
                          "best": best, "turns": rep_rows[0]["turns"]}}
    r_n = run_bench(8, "0-7", n_convs)
    r_n4 = run_bench(32, "0-31", n_convs)
    results["8->32"] = {
        "tps_n": r_n["turns_per_sec"],
        "tps_4n": r_n4["turns_per_sec"],
        "efficiency": round(r_n4["turns_per_sec"] / (r_n["turns_per_sec"] * 4.0), 3),
        "full": r_n4,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # everything from the hand-maintained marker down survives the
    # regeneration (run history, calm-window tables, soak reports — the
    # r5 run learned this the hard way by clobbering them)
    hand = ""
    if os.path.exists(path):
        prior = open(path).read()
        idx = prior.find(HAND_MARKER)
        if idx >= 0:
            hand = prior[idx:]
    r416 = results["4->16"]
    r832 = results["8->32"]
    with open(path, "w") as fh:
        rep_md = "".join(
            f"| {i + 1} | {r['tps_n']} | {r['tps_4n']} | {r['efficiency']} | "
            f"{r['hw4']} | {r['hw16']} | {r['hw_ratio']} | {r['normalized']} |\n"
            for i, r in enumerate(r416["reps"])
        )
        fh.write(
            f"""# BENCH/BASELINE — measured numbers

Generated by scripts/scaling_bench.py on {time.strftime('%Y-%m-%d %H:%M:%SZ', time.gmtime())}.

## Methodology

No real cluster in this sandbox; "N vs 4N executors" is proxied by the
same job at two pinned parallelism levels (taskset CPU sets sized to the
Spark parallelism), so JVM + python workers of each configuration share
exactly the resources an executor set would.

**Hardware ceiling (pure-python CPU burn, no Spark):** per-core
efficiency vs 1 proc = {json.dumps(hw_eff)} — the 32-vCPU host delivers
~{round(32 * hw_eff[32])} effective cores under full load (virtualization
steal), so the 8→32 pair partially measures the hypervisor. The honest
engine-scaling pair is 4→16.

## Extraction throughput + scaling efficiency (north_rule evidence)

Full pipeline (materialized synthetic transcripts, {r416['turns']} turns:
readability extraction + stats + 8 scores). The headline 4→16 pair is
run {len(r416['reps'])}× (each leg best-of-{os.environ.get('BENCH_REPEATS', '3')});
single runs swing ±0.07 with hypervisor steal, so the decision number is
the MEDIAN. hw4/hw16 are the pure-python burn efficiencies measured
immediately before the matching leg — a depressed hw16 flags steal
landing on the 16-core window.

| rep | tps @ 4 | tps @ 16 | efficiency | hw4 | hw16 | hw 4→16 ceiling | hw-normalized |
|---|---|---|---|---|---|---|---|
{rep_md}
**4→16 efficiency: raw median {r416['median']} (best {r416['best']}),
hardware-normalized median {r416['median_norm']}** (target ≥ 0.8,
BASELINE.json). The "hw 4→16 ceiling" column is the pure-python burn
ratio hw16/hw4 measured immediately before each leg — what a
ZERO-overhead engine would score in that window; normalized = raw /
ceiling (capped at 1.0). When the ceiling itself is below 0.8 the
window cannot evidence the target regardless of engine quality.

Secondary pair (measures the hypervisor above ~22 effective cores, not
the engine):

| pair | tps @ N | tps @ 4N | efficiency |
|---|---|---|---|
| local[8] → local[32] (pinned) | {r832['tps_n']} | {r832['tps_4n']} | {r832['efficiency']} (hw ceiling ≈ {hw_eff[32]/hw_eff[8]:.2f}) |

## Full suite at local[32] (sf{r832['full']['sf']})

| query | sec |
|---|---|
"""
        )
        for name, sec in r832["full"]["queries"].items():
            fh.write(f"| {name} | {sec} |\n")
        fh.write(
            f"\nSuite total: {r832['full']['value']} s; extraction throughput "
            f"{r832['full']['turns_per_sec']} turns/sec at local[32].\n\n"
            "Reference baseline: the reference publishes no benchmarks "
            "(BASELINE.md); its design ceiling is 5 concurrent HTTP "
            "extractions with 100 ms inter-request delay "
            "(news-scanner/config.py:43-44), i.e. O(10) articles/sec on a "
            "single node vs the numbers above.\n"
        )
        if hand:
            fh.write("\n" + hand)
    print(json.dumps({
        "4->16": {"median": r416["median"], "median_norm": r416["median_norm"],
                   "best": r416["best"],
                   "effs": [r["efficiency"] for r in r416["reps"]],
                   "norms": [r["normalized"] for r in r416["reps"]]},
        "8->32": {x: r832[x] for x in ("tps_n", "tps_4n", "efficiency")},
    }))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
