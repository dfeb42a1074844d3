"""Structured Streaming variant of the extraction pipeline.

The reference runs batch + cron (celery beat hourly,
news-scanner/celery_app/celery_worker.py:116-144); the streaming form
replaces the cron rescan: new transcript files land → extraction keeps
up incrementally with exactly-once sink semantics via checkpointing.
`Trigger.AvailableNow` gives the cron-like catch-up-then-stop behavior;
a processing-time trigger gives continuous tailing.

Watermarked windowed aggregation covers the reference's per-scan stats
(ScanStats, models/scan_result.py:10-57) as a live metric stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_scanner_spark.functions.udfs import extract_stats_partition
from readability_scanner_spark.plans.pipeline import _PASSTHROUGH, _SCORED_SCHEMA
from readability_scanner_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def read_transcript_stream(spark: SparkSession, input_path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )


def extract_stream(transcripts: DataFrame) -> DataFrame:
    """Same fused extract+stats mapInPandas as the batch plan — the
    logical plan is trigger-agnostic; only source/sink differ. The batch
    path's future-date clamp applies here too: without it a single
    far-future ts row would poison every downstream WATERMARK and make
    append-mode sinks drop all later normal rows as 'late'."""
    out = transcripts.mapInPandas(
        lambda batches: extract_stats_partition(batches, _PASSTHROUGH),
        schema=_SCORED_SCHEMA,
    )
    now = F.current_timestamp()
    return out.withColumn("ts", F.when(F.col("ts") > now, now).otherwise(F.col("ts")))


def run_extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """File-source → extraction → parquet sink with checkpointed
    exactly-once file commits; resume = restart with same checkpoint
    (the streaming analog of the batch _meta protocol)."""
    scored = extract_stream(read_transcript_stream(spark, input_path))
    writer = (
        scored.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def parse_metrics_stream(transcripts: DataFrame, window: str = "1 day") -> DataFrame:
    """Watermarked per-window extraction metrics (streaming ScanStats):
    turns, parse failures, mean content ratio per event-time window.
    Late rows beyond the watermark are dropped, state is bounded."""
    scored = extract_stream(transcripts)
    return (
        scored.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("turns"),
            F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
            F.avg("content_ratio").alias("mean_content_ratio"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "turns",
            "parse_failures",
            "mean_content_ratio",
        )
    )


def run_metrics_stream(
    spark: SparkSession, input_path: str, checkpoint_path: str, query_name: str = "metrics"
):
    """Metrics stream into an in-memory sink (tests/diagnostics ONLY).
    complete mode re-emits all windows and never evicts state — fine for
    a bounded diagnostic run; a production sink takes parse_metrics_stream
    in APPEND mode, where the watermark actually drops late rows and
    bounds state."""
    metrics = parse_metrics_stream(read_transcript_stream(spark, input_path))
    return (
        metrics.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(events: DataFrame, key_cols: list[str], watermark_col: str, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup via dropDuplicatesWithinWatermark: the
    first arrival of a key wins, duplicate arrivals within the watermark
    horizon are dropped, and — unlike plain dropDuplicates on a stream —
    per-key state is EVICTED once the watermark passes, so state stays
    bounded at 10^12-key scale. The batch counterpart is
    operators/dedup.exact_dedup."""
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_rollup_minute(events: DataFrame, ts_col: str, value_col: str, watermark: str = "2 minutes") -> DataFrame:
    """Streaming leg of the continuous-aggregate pattern: watermarked
    minute-level PARTIALS (count/sum/min/max — never avg, which cannot
    re-aggregate). A batch job rolls these up to hour/day with
    operators/rollup.rollup_up; equality with a direct batch rollup is
    the correctness contract (tested)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 minute"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(F.col("window.start").alias("bucket"), "cnt", "sum_v", "min_v", "max_v")
    )
