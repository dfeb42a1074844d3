"""Materialize a multilingual sf-dir for selfcheck (corpus-realism guard).

Builds ``<out>/documents.parquet`` from sources/multilingual.py and
symlinks every other table from a base sf dir, producing a directory
scripts/selfcheck.py can run verbatim:

    python scripts/make_multilingual.py                     # /tmp/rss_ml_sf
    python scripts/selfcheck.py --exact /tmp/rss_ml_sf \
        sql_text_stats lang_quality text_quality_filters \
        full_report_sql readability_by_source doc_previews ...

Green --exact rows here certify the unicode word/whitespace paths on
text the driver's ASCII testdata never exercises.

Usage: make_multilingual.py [out_dir] [n_docs] [base_sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from readability_scanner_spark.sources.multilingual import multilingual_documents

TABLES = "region nation customer supplier part orders lineitem events embeddings".split()


def materialize(out_dir: str, n_docs: int = 500, base: str = "/root/testdata/sf0.01") -> str:
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(multilingual_documents(n_docs))
    # Spark can't read ns timestamps; no ts cols here, but keep the
    # repo-wide convention anyway
    df.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        src = os.path.join(base, f"{t}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rss_ml_sf"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    print(materialize(out, n, base))
