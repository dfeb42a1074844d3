"""Hierarchical time rollups (hypertable continuous-aggregate pattern).

Multi-resolution aggregates (minute → hour → day) where every coarser
level is computed FROM the finer level's partials, never from raw rows —
the property that makes continuous aggregates incremental at 10^12
rows: a new raw partition touches one minute bucket, and the hour/day
levels re-aggregate O(buckets), not O(rows).

Partials carry (count, sum, min, max); avg is derived at read time so
re-aggregation is exact (avg-of-avgs would be wrong for uneven buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = {"minute": "minute", "hour": "hour", "day": "day"}


def rollup_base(df: DataFrame, ts_col: str, value_col: str, level: str = "minute") -> DataFrame:
    """Finest-level partials straight from raw rows."""
    return df.groupBy(
        F.date_trunc(LEVELS[level], F.col(ts_col)).alias("bucket")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_up(partials: DataFrame, level: str) -> DataFrame:
    """Coarser level FROM finer partials (exact re-aggregation)."""
    return partials.groupBy(
        F.date_trunc(LEVELS[level], F.col("bucket")).alias("bucket")
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(partials: DataFrame) -> DataFrame:
    """Read-time view: derive avg from partials."""
    return partials.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "cnt",
        F.round("sum_v", 2).alias("sum_v"),
        F.round(F.col("sum_v") / F.col("cnt"), 4).alias("avg_v"),
        "min_v",
        "max_v",
    )


def rollup_hierarchy(df: DataFrame, ts_col: str, value_col: str) -> dict[str, DataFrame]:
    """minute/hour/day levels; each built from the previous level."""
    minute = rollup_base(df, ts_col, value_col, "minute")
    hour = rollup_up(minute, "hour")
    day = rollup_up(hour, "day")
    return {"minute": minute, "hour": hour, "day": day}
