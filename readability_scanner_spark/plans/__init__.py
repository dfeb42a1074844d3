from readability_scanner_spark.plans.pipeline import (  # noqa: F401
    extract_and_score,
    run_pipeline,
)
