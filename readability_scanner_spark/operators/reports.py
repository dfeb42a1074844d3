"""Reference-parity reports over the scored pipeline output.

Covers the analytics read path (SURVEY.md §3.2, /daily endpoint) and the
compat field-name view: the reference stores space-containing legacy
field names ("word syllables", "Flesch Kincaid", "Dale Chall: Grade",
"Cleaned Data" — news-scanner/models/readability.py:20-32,
readability/analyzer.py:164-193). The engine's canonical schema is
snake_case; this view re-aliases for golden-file parity with systems
consuming the reference's output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical column -> reference legacy field name (analyzer.py:173-193,
# models/article.py:42-59)
COMPAT_ALIASES = {
    "words": "words",
    "sentences": "sentences",
    "paragraphs": "paragraphs",
    "characters": "characters",
    "syllables": "syllables",
    "word_syllables": "word syllables",
    "complex_polysyllabic_words": "complex polysillabic words",  # sic, reference spelling
    "flesch": "Flesch",
    "flesch_kincaid": "Flesch Kincaid",
    "smog": "Smog",
    "dale_chall": "Dale Chall",
    "dale_chall_grade": "Dale Chall: Grade",
    "coleman_liau": "Coleman Liau",
    "gunning_fog": "Gunning Fog",
    "spache": "Spache",
    "automated_readability": "Automated Readability",
    "cleaned_data": "Cleaned Data",
    "title": "title",
    "content": "content",
    "publication_date": "publication_date",
}


def compat_view(scored: DataFrame) -> DataFrame:
    """Re-alias canonical snake_case columns to the reference's legacy
    names; keeps any extra columns untouched."""
    cols = []
    for c in scored.columns:
        cols.append(F.col(c).alias(COMPAT_ALIASES[c]) if c in COMPAT_ALIASES else F.col(c))
    return scored.select(*cols)


# the 15 avg'd metrics of the A1 report (articles.py:305-330)
A1_METRICS = [
    "words",
    "sentences",
    "paragraphs",
    "characters",
    "syllables",
    "word_syllables",
    "complex_polysyllabic_words",
    "flesch",
    "flesch_kincaid",
    "smog",
    "dale_chall",
    "coleman_liau",
    "gunning_fog",
    "spache",
    "automated_readability",
]


def readability_report(
    scored: DataFrame,
    group_col: str = "conv_id",
    start=None,
    end=None,
    min_docs: int = 1,
    ts_col: str = "ts",
) -> DataFrame:
    """A1 flagship report over the FULL scored output (all 15 metrics):
    match(range) → groupBy: avg×15 + count → having → sort Flesch desc
    (news-scanner/database/articles.py:278-371; consumed by /daily and
    /export, api/routes/daily.py:46-51). One scan, partial+final hash
    aggregation; at cluster scale the group key is low-cardinality so the
    shuffle is the reduced partials, not the rows."""
    df = scored.where(~F.col("parse_failed"))
    if start is not None:
        df = df.where(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.where(F.col(ts_col) <= F.lit(end))
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count("*").alias("documents"),
            *[F.avg(m).alias(f"avg_{m}") for m in A1_METRICS],
        )
        .where(F.col("documents") >= min_docs)
        .orderBy(F.desc("avg_flesch"), F.asc("grp"))
    )


def daily_report_windows(scored: DataFrame, ts_col: str = "ts") -> DataFrame:
    """W2/W3: per-day report rows (the trend graph the reference left as
    TODO, api/routes/graph.py:46-52) — day × avg metrics."""
    return (
        scored.where(~F.col("parse_failed"))
        .groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(
            F.count("*").alias("documents"),
            F.avg("flesch").alias("avg_flesch"),
            F.avg("words").alias("avg_words"),
            F.avg("content_ratio").alias("avg_content_ratio"),
        )
        .orderBy("day")
    )
