from readability_scanner_spark.functions.textstats import (  # noqa: F401
    TextStatistics,
    calculate_text_statistics,
)
from readability_scanner_spark.functions.syllables import estimate_syllables  # noqa: F401
