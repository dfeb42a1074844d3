"""Arrow-vectorized pandas UDFs — the only Python in the hot path.

Per BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python) throughout". Spark hands each UDF an Arrow batch (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch, see config.py); inside the
batch we run a tight Python loop over strings — one DOM parse per
document, parser state reused, no per-row Spark↔Python round trip.

Fuses the reference's per-article stages into two UDF stages
(SURVEY.md §2.1 UDF surface):
  extract_udf: E1 readability extraction + E2 cleaning + E4 dates +
               S3 image, one shared DOM parse
               (reference round-trips HTTP per article instead,
               news-scanner/scanner/content_extractor.py:54-110)
  stats_udf:   T1–T7 text statistics
               (news-scanner/readability/text_stats.py:136-201)

Failure policy: a row never throws — parse failures become
parse_failed=True rows (the reference's 204/no-content path,
content_extractor.py:107-110; task-fatal errors would kill 10^12-turn
jobs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("content", StringType()),
        StructField("text_content", StringType()),
        StructField("title", StringType()),
        StructField("image_url", StringType()),
        StructField("published_ts", TimestampType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [StructField("start", LongType()), StructField("end", LongType())]
                )
            ),
        ),
        StructField("parse_failed", BooleanType()),
        StructField("content_ratio", DoubleType()),
    ]
)

STATS_SCHEMA = StructType(
    [
        StructField("words", LongType()),
        StructField("sentences", LongType()),
        StructField("paragraphs", LongType()),
        StructField("characters", LongType()),
        StructField("syllables", LongType()),
        StructField("word_syllables", DoubleType()),
        StructField("complex_polysyllabic_words", LongType()),
    ]
)


@pandas_udf(EXTRACT_SCHEMA)
def extract_udf(texts: pd.Series) -> pd.DataFrame:
    # imports inside the UDF body: resolved once per python worker
    from readability_scanner_spark.dom import parse_html
    from readability_scanner_spark.extraction.dates import extract_publication_date
    from readability_scanner_spark.extraction.images import extract_primary_image
    from readability_scanner_spark.extraction.readability import extract_main_content

    rows = []
    for raw in texts:
        try:
            if raw is None or not raw.strip():
                rows.append(("", "", "", None, None, [], True, 0.0))
                continue
            result = extract_main_content(raw)
            # dates/images read head metadata — parse once more only on
            # success (head was stripped from the article tree)
            image_url = None
            published = None
            if not result.parse_failed:
                meta_root = parse_html(raw[:8192])
                image_url = extract_primary_image(meta_root)
                published = extract_publication_date(meta_root, result.text_content)
                if published is not None:
                    published = published.replace(tzinfo=None)  # spark naive-UTC
            rows.append(
                (
                    result.content,
                    result.text_content,
                    result.title,
                    image_url,
                    published,
                    [{"start": s, "end": e} for s, e in result.spans],
                    result.parse_failed,
                    result.content_ratio,
                )
            )
        except Exception:
            rows.append(("", "", "", None, None, [], True, 0.0))
    return pd.DataFrame(
        rows,
        columns=[
            "content",
            "text_content",
            "title",
            "image_url",
            "published_ts",
            "spans",
            "parse_failed",
            "content_ratio",
        ],
    )


@pandas_udf(STATS_SCHEMA)
def stats_udf(cleaned: pd.Series) -> pd.DataFrame:
    from readability_scanner_spark.functions.textstats import calculate_text_statistics

    rows = []
    for text in cleaned:
        try:
            s = calculate_text_statistics(text or "")
            rows.append(
                (
                    s.words,
                    s.sentences,
                    s.paragraphs,
                    s.characters,
                    s.syllables,
                    s.word_syllables,
                    s.complex_polysyllabic_words,
                )
            )
        except Exception:
            rows.append((1, 1, 1, 0, 1, 1.0, 0))  # reference's error sentinel
    return pd.DataFrame(
        rows,
        columns=[
            "words",
            "sentences",
            "paragraphs",
            "characters",
            "syllables",
            "word_syllables",
            "complex_polysyllabic_words",
        ],
    )


@pandas_udf(StringType())
def clean_html_udf(html: pd.Series) -> pd.Series:
    """E2 cleaning alone (analyzer.py:34-74) for callers that skip
    extraction (e.g. scoring pre-extracted content)."""
    from readability_scanner_spark.extraction.cleaning import clean_html_content

    return html.map(lambda h: clean_html_content(h) if h is not None else "")
