"""spark-submit entry point for the training-corpus curation chain.

Cluster usage (same deployment shape as jobs/run_pipeline.py):

    zip -r engine.zip readability_scanner_spark
    spark-submit --py-files engine.zip jobs/curate.py \\
        --input  <documents parquet/iceberg path> \\
        --benchmark <eval-suite parquet path> \\
        --output /data/curated --span-k 13 --seq-len 4096

Local smoke:
    python jobs/curate.py --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/curated --span-k 4 --min-tokens 3

Idempotent: a completed output (matching params + input fingerprint in
_meta/curate.json) is skipped; --force re-runs.
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
    ap.add_argument("--input", required=True, help="documents table path (parquet)")
    ap.add_argument("--benchmark", help="eval-suite table to decontaminate against")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--span-k", type=int, default=None,
                    help="duplicated-span removal gram size (omit to skip)")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--salt", type=int, default=3)
    ap.add_argument("--no-stats", action="store_true",
                    help="skip per-stage counts (100 TB mode)")
    ap.add_argument("--repartition", type=int, default=None,
                    help="spread the scan before per-row regex/gram "
                    "compute (single-row-group parquet reads as ONE task)")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--delta", action="store_true",
                    help="incremental mode: append --input as a new batch "
                    "to an existing curated output (gate params come from "
                    "its _meta/curate.json)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.delta:
        # delta batches take every gate from the base run's meta — a
        # flag here would be silently ignored, so reject it loudly
        # (defaults read back from argparse: one source of truth)
        gate_flags = ["decontam_n", "min_tokens", "min_quality",
                      "span_k", "seq_len", "n_shards", "salt"]
        overridden = [
            k for k in gate_flags if getattr(args, k) != ap.get_default(k)
        ]
        if overridden:
            ap.error(
                f"--delta ignores gate flags (they come from the base "
                f"_meta/curate.json): remove {overridden}"
            )

    spark = build_session("curate-corpus", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    from readability_scanner_spark.plans.curate import curate_corpus, curate_delta

    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    if args.delta:
        meta = curate_delta(
            spark,
            docs,
            args.output,
            id_col=args.id_col,
            text_col=args.text_col,
            benchmark=bench,
            stats=not args.no_stats,
            force=args.force,
            repartition_to=args.repartition,
        )
    else:
        meta = curate_corpus(
            spark,
            docs,
            args.output,
            id_col=args.id_col,
            text_col=args.text_col,
            benchmark=bench,
            decontam_n=args.decontam_n,
            min_tokens=args.min_tokens,
            min_quality=args.min_quality,
            span_k=args.span_k,
            seq_len=args.seq_len,
            n_shards=args.n_shards,
            salt=args.salt,
            stats=not args.no_stats,
            force=args.force,
            repartition_to=args.repartition,
        )
    print(json.dumps(meta, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
