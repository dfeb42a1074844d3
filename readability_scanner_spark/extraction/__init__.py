from readability_scanner_spark.extraction.readability import (  # noqa: F401
    ExtractionResult,
    extract_main_content,
)
from readability_scanner_spark.extraction.cleaning import clean_html_content  # noqa: F401
