"""Benchmark harness (driver contract: prints ONE JSON line).

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  * extract_pipeline — the flagship: synthesize transcripts (seeded,
    distributed) and run the full extract+stats+scores pipeline;
    reports turns/sec (the BASELINE.json metric)
  * a representative slice of the analytics/dedup/similarity operators

Output: {"metric": "suite_seconds", "value": <total>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "turns_per_sec": <tps>, ...}

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N): run
    SPARK_GRAFT_CPUS=8 python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
and compare turns_per_sec (see scripts/scaling_bench.py which automates
this and writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from readability_scanner_spark.config import build_session


def _burn(n: int) -> int:  # module-level: mp.Pool must pickle it
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def _hw_probe(cpus: int) -> dict:
    """Pure-python CPU burn at 1 and `cpus` procs — how much of the
    advertised parallelism the host is actually delivering RIGHT NOW.
    Stamped into the output JSON so every recorded bench carries its
    own hypervisor-steal context (this host's run history shows ±40%
    suite swings on identical code purely from steal windows; see
    BENCH/BASELINE.md run history)."""
    import multiprocessing as mp
    import time as _time

    out = {}
    for procs in (1, cpus):
        with mp.Pool(procs) as pool:
            t0 = _time.time()
            pool.map(_burn, [3_000_000] * procs)
            out[procs] = procs / (_time.time() - t0)
    # fraction of perfect linear scaling the HOST delivers in this
    # window; when this is low, suite seconds measure the hypervisor,
    # not the engine. (The proc count is the `cpus` key already in the
    # output line.)
    return {"hw_eff": round(out[cpus] / (cpus * out[1]), 3) if out[1] else None}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("BENCH_CONVS", "3000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    probe = _hw_probe(cpus)

    spark = build_session("bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from readability_scanner_spark.plans.pipeline import extract_and_score
    from readability_scanner_spark.sources.transcripts import transcripts_df

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- flagship: extraction throughput -----------------------------------
    # The north metric is turns/sec over a MATERIALIZED transcript table
    # (the production shape: read Iceberg → extract), so generation is not
    # part of the timed section. A small warmup run amortizes JVM/python
    # worker startup out of the measurement.
    tmp_tbl = os.environ.get("BENCH_TMP", "/tmp/bench_transcripts")
    transcripts_df(spark, n_conversations=n_convs, seed=42, partitions=4 * cpus).write.mode(
        "overwrite"
    ).parquet(tmp_tbl)
    table = spark.read.parquet(tmp_tbl)

    def run_extract(df, parts):
        # force EVERY output column: hash the whole row and bit_xor the
        # hashes. Aggregating a column subset lets Catalyst prune the
        # rest — the previous form silently excluded the F1-F9 score
        # projections from the flagship measurement (the CLAUDE.md
        # bare-count gotcha, half-applied).
        row = (
            extract_and_score(df, repartition_to=parts)
            .agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(F.struct("*"))).alias("h"),
            )
            .first()
        )
        return row["n"]

    run_extract(table.limit(1024), cpus)  # warmup (JVM + python workers)

    best, n_turns = float("inf"), 0
    for _ in range(max(1, int(os.environ.get("BENCH_REPEATS", "2")))):
        t0 = time.time()
        n_turns = run_extract(table, 4 * cpus)
        best = min(best, time.time() - t0)
    timings["extract_pipeline"] = round(best, 3)
    extra["turns"] = n_turns
    extra["turns_per_sec"] = round(n_turns / best, 1)

    # --- analytics / dedup / similarity slice ------------------------------
    queries = em.queries()
    bench_set = [
        "readability_by_source",
        "sql_text_stats",
        "word_topk",
        "lang_quality",
        "daily_event_buckets",
        "latest_order_per_customer",
        "broadcast_lookup_join",
        "orders_topk",
        "exact_dedup",
        "minhash_candidates",
        "simhash_near_dups",
        "knn_topk",
        "rolling_7d_by_type",
    ]
    for name in bench_set:
        best = float("inf")
        for _ in range(2):  # best-of-2: absorbs codegen/worker cold start
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            # hash every output column and aggregate: forces full
            # evaluation of computed projections (a bare count() lets
            # Catalyst prune them) without driver-side collect cost
            df.select(F.xxhash64(F.struct("*")).alias("_h")).agg(F.bit_xor("_h")).first()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **probe,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
