"""Sink / maintenance operators (S4–S7, M1–M4 from SURVEY.md §2.1).

The reference's Mongo mutations become set-oriented batch rewrites —
the Iceberg forms are MERGE INTO / DELETE FROM; the parquet-sandbox
forms below have identical dataflow semantics and are what the tests
exercise.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_by_key(existing: DataFrame, incoming: DataFrame, key: str, order_col: str) -> DataFrame:
    """S4 upsert-by-unique-key (articles.py:89-200 replace_one): incoming
    rows win over existing on key collision; within incoming, newest by
    order_col wins. Iceberg: MERGE INTO ... WHEN MATCHED UPDATE."""
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        incoming.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.desc("_src"), F.desc(order_col))
    return tagged.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop(
        "_rn", "_src"
    )


def overwrite_table(df: DataFrame, path: str) -> None:
    """S5 full-refresh (delete_many({}) + insert_many,
    daily_topics_jobs.py:157-162) = INSERT OVERWRITE."""
    df.write.mode("overwrite").parquet(path)


def export_csv(df: DataFrame, path: str) -> None:
    """S6 CSV export (api/routes/export.py:19-72)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    """S6 JSON export."""
    df.write.mode("overwrite").json(path)


def export_ml_dataset(
    df: DataFrame, path: str, label_col: str, text_col: str, train_frac: float = 0.8, seed: int = 42
) -> None:
    """S7 ML dataset sink (hug/api.py:95-221): per-label text files under
    split/label dirs. partitionBy replaces the reference's per-doc file
    loop; the split is a deterministic hash, not a python RNG."""
    split = F.when(
        F.pmod(F.xxhash64(F.col(text_col), F.lit(seed)), 100) < int(train_frac * 100), "train"
    ).otherwise("test")
    df.select(
        split.alias("split"), F.col(label_col).alias("label"), F.col(text_col).alias("value")
    ).write.mode("overwrite").partitionBy("split", "label").text(path)


def delete_where(df: DataFrame, predicate) -> DataFrame:
    """M4 delete-by-predicate (articles.py:373-381) = keep the complement;
    Iceberg: DELETE FROM ... WHERE."""
    return df.where(~predicate)


def set_columns_where(df: DataFrame, predicate, assignments: dict) -> DataFrame:
    """M1 $set field update (articles.py:620-659): conditional column
    rewrite; Iceberg: MERGE ... WHEN MATCHED UPDATE SET."""
    return df.withColumns(
        {
            col: F.when(predicate, value).otherwise(F.col(col))
            for col, value in assignments.items()
        }
    )


def migrate_legacy_columns(df: DataFrame, target: str, legacy_priority: list[str]) -> DataFrame:
    """M2 field migration (backfill_jobs.py:200-258): coalesce legacy
    column aliases into the canonical one (priority order), drop legacy."""
    present = [c for c in legacy_priority if c in df.columns]
    cols = [F.col(c) for c in ([target] if target in df.columns else [])] + [
        F.col(c) for c in present
    ]
    out = df.withColumn(target, F.coalesce(*cols)) if cols else df
    return out.drop(*[c for c in present if c != target])


def backfill_remaining(
    full: DataFrame, processed_keys: DataFrame, key: str
) -> DataFrame:
    """M3 resumable backfill (backfill_jobs.py:20-133): the work queue is
    an anti-join against already-processed keys — the set-oriented form
    of the reference's 'rows matching predicate' batch loop."""
    return full.join(processed_keys.select(key).distinct(), key, "left_anti")
