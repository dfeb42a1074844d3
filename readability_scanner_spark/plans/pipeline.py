"""The flagship extraction pipeline (SURVEY.md §3.1 Spark shape).

    read transcripts
      → explicit repartition on salted conv_id hash (skew-safe)
      → ONE fused mapInPandas pass (extraction + cleaning + dates +
        image + T1–T7 stats in a single Arrow round trip — a chained
        two-UDF plan would pay the Python transfer twice;
        tests/test_plans.py asserts the single MapInPandas node)
      → F1–F9 as native Column expressions (JVM, whole-stage codegen)
      → future-date clamp (reference rss_parser.py:166-172)
      → idempotent partition-bucket commit + _meta lineage/metrics row

Replaces the reference's celery fan-out / HTTP extraction / Mongo upsert
loop (news-scanner/celery_app/jobs/rss_jobs.py:94-192,
scanner/scanner.py:32-114, database/articles.py:89-200). The retry /
semaphore / stagger machinery disappears: there are no network calls
inside the job.

Scale design (north_rule):
  * conv_id is the natural shuffle key; mega-conversations are salted
    with turn_idx ranges so no single task owns a 10^7-turn conversation:
    salt = turn_idx // SALT_SPAN → repartition(hash(conv_id, salt)).
    Extraction is per-row, so salting changes no results — it only
    flattens task sizes. Downstream per-conv aggregations re-aggregate
    partials across salts (two-stage agg), which is cheap because
    partials are tiny.
  * checkpoint/resume: the work unit is a deterministic conv bucket
    (pmod(hash(conv_id), n_buckets)). Each bucket commits its output
    under bucket=K/ and appends a _meta row (turns, parse failures, mean
    content ratio — the analog of the reference's ScanStats,
    models/scan_result.py:10-57). A killed run resumes by anti-joining
    buckets against committed _meta rows. On Iceberg this becomes
    MERGE/overwritePartitions; parquet subdirs + a manifest give the
    same idempotency in this sandbox.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from readability_scanner_spark.functions.formulas import with_readability_scores
from readability_scanner_spark.functions.udfs import extract_stats_partition

SALT_SPAN = 1000  # turns per salt shard within one conversation

_PASSTHROUGH = ["conv_id", "turn_idx", "role", "tool", "ts"]

_SCORED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField("content", StringType()),
        StructField("text_content", StringType()),
        StructField("title", StringType()),
        StructField("image_url", StringType()),
        StructField("published_ts", TimestampType()),
        StructField("spans", ArrayType(ArrayType(LongType()))),
        StructField("parse_failed", BooleanType()),
        StructField("content_ratio", DoubleType()),
        StructField("words", LongType()),
        StructField("sentences", LongType()),
        StructField("paragraphs", LongType()),
        StructField("characters", LongType()),
        StructField("syllables", LongType()),
        StructField("word_syllables", DoubleType()),
        StructField("complex_polysyllabic_words", LongType()),
    ]
)


def salted_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Explicit repartition on (conv_id, turn_idx // SALT_SPAN).

    hash-partitioning on conv_id alone sends a mega-conversation's 10^7
    turns to one task; the salt bounds any task's share of a single
    conversation to SALT_SPAN turns while keeping normal conversations
    (< SALT_SPAN turns) on a single partition.
    """
    salt = (F.col("turn_idx") / SALT_SPAN).cast("int").alias("_salt")
    if num_partitions:
        return df.repartition(num_partitions, F.col("conv_id"), salt)
    return df.repartition(F.col("conv_id"), salt)


def extract_and_score(
    df: DataFrame, repartition_to: int | None = None, redact_pii: bool = False
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → scored docs.

    One wide row per turn: extraction fields, stats, 8 scores + grade,
    with the future-date clamp applied to ts. Extraction + stats run in
    ONE fused mapInPandas pass (a single Arrow round trip per partition;
    a chained two-UDF plan pays the Python transfer twice); formulas are
    JVM Column expressions on top.

    ``redact_pii=True`` scrubs emails/phones/IPs from the extracted text
    as a JVM regexp stage AFTER stats (counts reflect the original text;
    the stored text is clean) — zero extra Python passes.
    """
    out = salted_repartition(df, repartition_to) if repartition_to != 0 else df
    out = out.mapInPandas(
        lambda batches: extract_stats_partition(batches, _PASSTHROUGH),
        schema=_SCORED_SCHEMA,
    )
    now = F.current_timestamp()
    out = out.withColumns(
        {
            # future-date clamps (reference rss_parser.py:166-172) — both
            # the transcript ts AND the extracted publication date
            # (dates.py defers this clamp to pipeline level)
            "ts": F.when(F.col("ts") > now, now).otherwise(F.col("ts")),
            "publication_date": F.when(
                F.col("published_ts") > now, now
            ).otherwise(F.col("published_ts")),
        }
    ).withColumnRenamed("text_content", "cleaned_data").drop("published_ts")
    if redact_pii:
        from readability_scanner_spark.operators.textquality import redact_pii_col

        out = out.withColumn("cleaned_data", redact_pii_col(F.col("cleaned_data")))
    return with_readability_scores(out)


# ---------------------------------------------------------------------------
# resumable batch runner (checkpoint `_meta` protocol)
# ---------------------------------------------------------------------------

def diagnose(meta_row: dict) -> str:
    """X5 per-scan diagnosis generation (reference:
    models/scan_result.py:84-112 builds human-readable diagnoses from
    counter ratios). Same idea over the bucket metrics."""
    turns = meta_row.get("turns_processed") or 0
    if turns == 0:
        return "empty bucket"
    failure_rate = (meta_row.get("parse_failures") or 0) / turns
    issues = []
    if failure_rate > 0.5:
        issues.append("critical parse-failure rate")
    elif failure_rate > 0.1:
        issues.append("elevated parse-failure rate")
    if (meta_row.get("mean_content_ratio") or 0.0) < 0.1:
        issues.append("low content ratio (boilerplate-dominated input?)")
    return "; ".join(issues) if issues else "healthy"


def _meta_path(output_path: str) -> str:
    return os.path.join(output_path, "_meta")


def committed_buckets(output_path: str) -> set[int]:
    meta = _meta_path(output_path)
    if not os.path.isdir(meta):
        return set()
    done = set()
    for name in os.listdir(meta):
        if name.endswith(".json"):
            with open(os.path.join(meta, name)) as fh:
                done.add(json.load(fh)["bucket"])
    return done


def committed_n_buckets(output_path: str):
    """n_buckets recorded by a prior run's meta rows (None if fresh or
    written before the field existed)."""
    meta = _meta_path(output_path)
    if not os.path.isdir(meta):
        return None
    for name in sorted(os.listdir(meta)):
        if name.endswith(".json"):
            with open(os.path.join(meta, name)) as fh:
                n = json.load(fh).get("n_buckets")
            if n is not None:
                return n
    return None


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    n_buckets: int = 8,
    repartition_to: int | None = None,
) -> dict:
    """Resumable run: process conv buckets not yet committed to _meta.

    Returns a summary dict {buckets_run, turns, parse_failures}.
    On Iceberg the bucket loop becomes df.writeTo(t).overwritePartitions()
    per bucket with the _meta row in an Iceberg `_meta` table — same
    protocol, transactional commit. Here: parquet dir per bucket + a JSON
    manifest written after the parquet job succeeds (write-then-commit
    ordering makes a killed run re-do at most the in-flight bucket).

    NOTE: each bucket job re-evaluates `transcripts` with its bucket
    predicate. Against a real table that's a pruned scan (cheap); against
    a synthetic generator it recomputes the source per bucket — pass a
    materialized table for large synthetic runs.
    """
    os.makedirs(_meta_path(output_path), exist_ok=True)
    done = committed_buckets(output_path)
    # resume-safety: bucket membership is pmod(hash, n_buckets) — resuming
    # with a DIFFERENT n_buckets would silently duplicate and drop
    # conversations across bucket dirs. Every meta row records n_buckets;
    # a mismatch is an error, not a guess.
    prior_n = committed_n_buckets(output_path)
    if prior_n is not None and prior_n != n_buckets:
        raise ValueError(
            f"resume with n_buckets={n_buckets} over a run committed with "
            f"n_buckets={prior_n}; re-run with {prior_n} or a fresh output dir"
        )
    bucketed = transcripts.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )
    summary = {"buckets_run": 0, "turns": 0, "parse_failures": 0}
    for bucket in range(n_buckets):
        if bucket in done:
            continue
        started = time.time()
        part = bucketed.where(F.col("_bucket") == bucket).drop("_bucket")
        scored = extract_and_score(part, repartition_to)
        bucket_dir = os.path.join(output_path, f"bucket={bucket}")
        scored.write.mode("overwrite").parquet(bucket_dir)
        # metrics pass over the committed output (reads the small parquet
        # we just wrote — no recompute of the UDFs)
        metrics = (
            spark.read.parquet(bucket_dir)
            .agg(
                F.count("*").alias("turns"),
                F.sum(F.col("parse_failed").cast("long")).alias("failures"),
                F.avg("content_ratio").alias("mean_content_ratio"),
            )
            .first()
        )
        meta_row = {
            "bucket": bucket,
            "n_buckets": n_buckets,
            "turns_processed": metrics["turns"],
            "parse_failures": metrics["failures"] or 0,
            "mean_content_ratio": float(metrics["mean_content_ratio"] or 0.0),
            "duration_seconds": round(time.time() - started, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        meta_row["diagnosis"] = diagnose(meta_row)
        tmp = os.path.join(_meta_path(output_path), f".bucket-{bucket}.json.tmp")
        final = os.path.join(_meta_path(output_path), f"bucket-{bucket}.json")
        with open(tmp, "w") as fh:
            json.dump(meta_row, fh)
        os.replace(tmp, final)  # atomic commit point
        summary["buckets_run"] += 1
        summary["turns"] += meta_row["turns_processed"]
        summary["parse_failures"] += meta_row["parse_failures"]
    return summary


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    """Read ONLY committed buckets: a run killed between the parquet
    write and the _meta commit leaves an uncommitted bucket=N/ dir that
    the resume protocol will overwrite — readers must not see it."""
    done = committed_buckets(output_path)
    dirs = [
        os.path.join(output_path, f"bucket={b}")
        for b in sorted(done)
        if os.path.isdir(os.path.join(output_path, f"bucket={b}"))
    ]
    if not dirs:
        # No committed buckets: a bucket=* glob here would expose the one
        # state this reader exists to hide — a run killed after writing
        # bucket parquet but before the _meta commit (and it throws
        # path-not-found on an empty-but-initialized output dir). Refuse
        # loudly instead of returning uncommitted rows.
        raise FileNotFoundError(
            f"no committed buckets under {output_path!r} — either the "
            "pipeline has not completed any bucket yet, or a killed run "
            "left only uncommitted output (resume will rewrite it)"
        )
    return spark.read.option("basePath", output_path).parquet(*dirs)
