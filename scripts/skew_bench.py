"""Skew evidence for the salted repartition (pipeline.py::salted_repartition).

The 100 TB risk the salt exists for: ONE mega-conversation whose turns all
hash to the same shuffle partition pins a whole executor while the rest of
the cluster idles. This bench builds deliberately skewed corpora and runs
the SAME extraction job under three distributions:

  unsalted  — repartition(hash(conv_id)) only: the naive key partitioning,
  salted    — repartition(hash(conv_id, turn_idx // SALT_SPAN)): the
              pipeline default,
  rebalance — REBALANCE(conv_id) hint with AQE skew-splitting
              (spark.sql.adaptive.optimizeSkewsInRebalancePartitions):
              Spark's own answer when key co-location is NOT required —
              AQE may split an oversized partition mid-key. Extraction is
              per-row, so this is semantically legal here, same as the
              salt; measuring it shows how the hand salt compares to the
              engine's adaptive splitter.

Two corpora (VERDICT r3 #9): skew concentrated on ONE key, and the same
turn mass split across TWO mega keys — the cap must hold when the skew
lands on multiple keys that can co-hash.

Expected shape: unsalted max-task ≈ a whole mega conversation (the
straggler); salted max-task ≤ SALT_SPAN-ish regardless of corpus.

Results → BENCH/SKEW.md. Usage: python scripts/skew_bench.py [mega_turns]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from readability_scanner_spark.config import build_session  # noqa: E402
from readability_scanner_spark.plans.pipeline import (  # noqa: E402
    SALT_SPAN,
    extract_and_score,
    salted_repartition,
)
from readability_scanner_spark.sources.transcripts import (  # noqa: E402
    generate_conversation,
    transcripts_df,
)

# let AQE's rebalance splitter actually fire at this corpus size: the
# skewed partition is ~10-25 MB, under the 64 MB default advisory size
# (at real 100 TB scale partitions exceed it naturally)
_REBALANCE_ADVISORY = str(1 * 1024 * 1024)


def build_skewed(spark, mega_sizes: list[int], normal_convs: int, parts: int, path: str):
    """len(mega_sizes) mega-conversations + a normal tail, written to
    parquet so every mode scans identical bytes."""
    texts = []
    for c in range(40):  # realistic turn HTML, recycled into the mega convs
        texts += [t["text"] for t in generate_conversation(c, seed=11)]
    mega_rows = []
    for m, n in enumerate(mega_sizes):
        mega_rows += [
            (f"mega-{m}", i, "user", texts[i % len(texts)], None, "2025-06-01 00:00:00")
            for i in range(n)
        ]
    mega = spark.createDataFrame(
        mega_rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    normal = transcripts_df(spark, n_conversations=normal_convs, seed=11, partitions=parts)
    mega.unionByName(normal.select(*mega.columns)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_mode(spark, table, mode: str, parts: int) -> dict:
    if mode == "unsalted":
        shaped = table.repartition(parts, F.col("conv_id"))
    elif mode == "salted":
        shaped = salted_repartition(table, parts)
    else:  # rebalance
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", _REBALANCE_ADVISORY
        )
        shaped = table.hint("rebalance", "conv_id")
    try:
        # input-rows-per-task distribution of the extraction stage (the
        # rows each python worker will grind through), measured with a
        # mapInPandas counter — the SAME plan shape as extraction, so the
        # exchange survives. (A groupBy(spark_partition_id()) probe adds
        # its own shuffle, and the optimizer then elides the rebalance
        # exchange entirely — it measured the scan, not the stage.)
        import pandas as _pd

        def _count_parts(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield _pd.DataFrame({"n": [n]})

        sizes = [r.n for r in shaped.mapInPandas(_count_parts, "n long").collect()]
        t0 = time.time()
        row = (
            extract_and_score(shaped, repartition_to=0)  # 0: keep shaped partitioning
            .agg(F.count("*").alias("n"), F.bit_xor(F.xxhash64(F.struct("*"))).alias("h"))
            .first()
        )
        wall = time.time() - t0
    finally:
        if mode == "rebalance":
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    return {
        "mode": mode,
        "turns": row["n"],
        "wall_s": round(wall, 2),
        "tasks": len(sizes),
        "max_task_rows": max(sizes),
        "median_task_rows": int(statistics.median(sizes)),
        "turns_per_sec": round(row["n"] / wall, 1),
    }


MODES = ("unsalted", "salted", "rebalance")


def main() -> None:
    mega_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    parts = 4 * cpus
    spark = build_session("skew-bench", master=f"local[{cpus}]", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {
        "one mega key": [mega_turns],
        "two mega keys": [mega_turns // 2, mega_turns // 2],
    }
    lines = [
        "# Skew evidence: salted vs unsalted vs AQE-rebalance",
        "",
        f"local[{cpus}], {parts} partitions, SALT_SPAN={SALT_SPAN}; every mode "
        "scans the same parquet bytes through the same unpruned hash aggregate; "
        "best of 2 interleaved runs per mode. `rebalance` = REBALANCE(conv_id) "
        "hint with AQE skew-splitting on and a 1 MiB advisory partition size "
        "(the corpus partition is smaller than the 64 MiB default — at real "
        "scale the splitter fires without the nudge).",
        "",
    ]
    summary = {}
    for label, sizes in corpora.items():
        path = f"/tmp/skew_bench_transcripts_{len(sizes)}"
        table = build_skewed(spark, sizes, normal_convs=150, parts=parts, path=path)
        total = table.count()
        results = []
        for mode in MODES * 2:  # interleave vs drift
            results.append(run_mode(spark, table, mode, parts))
            print(label, results[-1], flush=True)
        best = {
            m: min((r for r in results if r["mode"] == m), key=lambda r: r["wall_s"])
            for m in MODES
        }
        u, s = best["unsalted"], best["salted"]
        speedup = round(u["wall_s"] / s["wall_s"], 2)
        summary[label] = (best, speedup, total)
        lines += [
            f"## {label}: {' + '.join(str(n) for n in sizes)} mega turns "
            f"+ 150 normal conversations = {total} turns",
            "",
            "| mode | wall s | turns/s | tasks | max task rows | median task rows |",
            "|---|---|---|---|---|---|",
        ]
        for m in MODES:
            r = best[m]
            lines.append(
                f"| {r['mode']} | {r['wall_s']} | {r['turns_per_sec']} | {r['tasks']} "
                f"| {r['max_task_rows']} | {r['median_task_rows']} |"
            )
        lines += [
            "",
            f"Salting beats unsalted **{speedup}x** on wall time here "
            f"(max task {u['max_task_rows']} → {s['max_task_rows']} rows).",
            "",
        ]
    lines += [
        "## Reading",
        "",
        "- Unsalted: each mega key lands whole on one task — the straggler "
        "scales with the largest conversation, and splitting the same mass "
        "across two keys only helps if the keys hash apart (they can just as "
        "easily co-hash onto one executor).",
        "- Salted: max task ≈ SALT_SPAN plus co-hashing normal conversations, "
        "for ANY number of mega keys — the cap is per (conv, salt) shard, so "
        "the guarantee is independent of key count or conversation size.",
        "- Rebalance+AQE: when key co-location is not required (true for "
        "per-row extraction) Spark's adaptive splitter also bounds task size, "
        "converging on wall times close to the salt. The salt remains the "
        "right default for THIS pipeline because downstream per-conv "
        "aggregation re-uses the (conv_id, salt) distribution for two-stage "
        "aggs, while REBALANCE guarantees nothing about co-location; but the "
        "measurement shows the engine path is viable where semantics allow.",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "SKEW.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
