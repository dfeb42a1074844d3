"""Structured Streaming pipeline tests: stream output equals batch
output; metrics stream aggregates with watermark; checkpoint resume."""

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark.plans.pipeline import extract_and_score
from readability_scanner_spark.sources.transcripts import transcripts_df
from readability_scanner_spark.streaming.jobs import run_extract_stream, run_metrics_stream


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    transcripts_df(spark, n_conversations=8, seed=42).write.mode("overwrite").parquet(path)
    return path


def test_stream_matches_batch(spark, stream_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_extract_stream(spark, stream_input, out, ckpt)
    q.awaitTermination(180)

    streamed = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "text_content", "words", "parse_failed")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    batch = (
        extract_and_score(spark.read.parquet(stream_input), repartition_to=0)
        .select(
            "conv_id", "turn_idx", F.col("cleaned_data").alias("text_content"), "words", "parse_failed"
        )
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert streamed == batch


def test_stream_resume_no_duplicates(spark, stream_input, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = run_extract_stream(spark, stream_input, out, ckpt)
    q.awaitTermination(180)
    n1 = spark.read.parquet(out).count()
    # restart with same checkpoint, no new input → no new rows
    q2 = run_extract_stream(spark, stream_input, out, ckpt)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == n1


def test_metrics_stream(spark, stream_input, tmp_path):
    q = run_metrics_stream(spark, stream_input, str(tmp_path / "ckpt3"), query_name="m1")
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM m1").collect()
    assert rows
    total = sum(r.turns for r in rows)
    assert total == spark.read.parquet(stream_input).count()
    for r in rows:
        assert 0.0 <= r.mean_content_ratio <= 1.0
