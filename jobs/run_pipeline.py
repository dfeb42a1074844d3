"""spark-submit entry point for the flagship extraction pipeline.

Cluster usage (north_star deployment shape):

    zip -r engine.zip readability_scanner_spark
    spark-submit --py-files engine.zip jobs/run_pipeline.py \\
        --input  <iceberg-or-parquet transcripts path> \\
        --output <output table path> \\
        --buckets 256 --repartition 4096

Local smoke:
    python jobs/run_pipeline.py --synthetic 200 --output /tmp/out

Resumable: re-running with the same --output continues from the last
committed bucket (_meta protocol, plans/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from readability_scanner_spark.config import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table path (parquet)")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic conversations instead of --input")
    ap.add_argument("--pdf-rate", type=float, default=0.0,
                    help="fraction of synthetic turns carrying PDF payloads "
                    "(format-dispatch soak; 0.0 = historical HTML corpus)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--repartition", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session("extract-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    from readability_scanner_spark.plans.pipeline import run_pipeline
    from readability_scanner_spark.sources.transcripts import transcripts_df

    if args.synthetic and args.input:
        ap.error("--input and --synthetic are mutually exclusive (the old "
                 "behavior silently ignored --input)")
    if args.pdf_rate and not args.synthetic:
        ap.error("--pdf-rate only applies to --synthetic generation; real "
                 "--input tables carry whatever payloads they carry")
    if args.synthetic:
        transcripts = transcripts_df(
            spark, n_conversations=args.synthetic, pdf_rate=args.pdf_rate
        )
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    summary = run_pipeline(
        spark, transcripts, args.output, n_buckets=args.buckets, repartition_to=args.repartition
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
