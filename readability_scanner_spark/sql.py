"""SQL surface: register the engine's functions so plain Spark SQL can
use them — `SELECT extract_text(text), flesch(words, sentences,
syllables) FROM transcripts`.

The reference has no SQL interface (everything is Python service code);
this makes the engine usable from spark.sql / Thrift / notebooks without
importing the package, completing the "switchable engine" story.
"""

# NOTE: no `from __future__ import annotations` here — pyspark resolves
# pandas_udf type hints at registration time and string-ified hints for
# locally-imported pandas fail to resolve.
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import StringType

from readability_scanner_spark.functions.udfs import EXTRACT_SCHEMA, STATS_SCHEMA


def register_all(spark: SparkSession) -> None:
    """Idempotently register UDFs: extract_content, extract_text,
    text_stats, clean_html, estimate_syllables."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(EXTRACT_SCHEMA)
    def _extract(texts: pd.Series) -> pd.DataFrame:
        from readability_scanner_spark.functions.udfs import _EXTRACT_COLS, extract_one

        return pd.DataFrame([extract_one(t) for t in texts], columns=_EXTRACT_COLS)

    @pandas_udf(StringType())
    def _extract_text(texts: pd.Series) -> pd.Series:
        from readability_scanner_spark.extraction.readability import extract_main_content

        return pd.Series(
            [extract_main_content(t).text_content if t else "" for t in texts]
        )

    @pandas_udf(STATS_SCHEMA)
    def _stats(cleaned: pd.Series) -> pd.DataFrame:
        from readability_scanner_spark.functions.udfs import _STATS_COLS, stats_one

        return pd.DataFrame([stats_one(t) for t in cleaned], columns=_STATS_COLS)

    @pandas_udf(StringType())
    def _clean(html: pd.Series) -> pd.Series:
        from readability_scanner_spark.extraction.cleaning import clean_html_content

        return html.map(lambda h: clean_html_content(h) if h is not None else "")

    @pandas_udf("long")
    def _syllables(words: pd.Series) -> pd.Series:
        from readability_scanner_spark.functions.syllables import estimate_syllables

        return words.map(lambda w: estimate_syllables(w or ""))

    spark.udf.register("extract_content", _extract)
    spark.udf.register("extract_text", _extract_text)
    spark.udf.register("text_stats", _stats)
    spark.udf.register("clean_html", _clean)
    spark.udf.register("estimate_syllables", _syllables)
