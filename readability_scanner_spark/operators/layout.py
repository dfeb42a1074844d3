"""Multi-dimensional data layout (z-order clustering) + file-skipping
manifests — the scan-pruning lever for 100 TB tables.

Sorting a table on one column makes parquet min/max statistics prune
scans on THAT column only; interleaving the bits of two key columns
(Morton / z-order — the technique behind Delta/Iceberg ``OPTIMIZE
ZORDER BY``) gives every written file a tight bounding box in BOTH
dimensions, so predicates on either (or both) skip most files. The key
is computed with pure JVM bitwise ops (shiftleft/AND/OR on BIGINT), so
it is also exactly recomputable by a DuckDB oracle — the layout
decision itself is hash-verifiable.

:func:`file_stats_manifest` then reads per-file parquet footer
statistics DISTRIBUTEDLY (one Arrow-batch task per file chunk — at
100 TB the footers alone are too many for a driver loop) into a
manifest table, and :func:`prune_files` intersects a predicate's
bounds with it — a minimal Iceberg-manifest analog that makes the
skipping measurable (files_matched / files_total) instead of trusting
the reader's internal row-group filter.

Reference surface: none (graft extension; the reference's MongoDB has
B-tree indexes, `database/articles.py:67` — this is the columnar-
layout equivalent for immutable parquet/Iceberg data files).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Morton-2D spread masks: distribute the low 30 bits of x over the even
# bit positions of a 60-bit result (the standard magic-number ladder).
# 30-bit inputs keep every intermediate AND the final interleaved key
# (<= bit 61) inside signed-64 range on BOTH engines — DuckDB raises on
# BIGINT shift overflow where the JVM would wrap silently.
_SPREAD_MASKS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
_DIM_BITS = 30
_DIM_MOD = 1 << _DIM_BITS


def _spread_bits(c: Column) -> Column:
    for shift, mask in _SPREAD_MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zorder_key(x: Column, y: Column) -> Column:
    """Interleave the low 30 bits of two non-negative integer columns
    into one BIGINT z-order key (x on even bits, y on odd). Inputs are
    folded with pmod(2^30) so any BIGINT is safe; callers clustering on
    wider domains should pre-bucket (e.g. days-since-epoch, id ranges,
    rank buckets) — z-order locality only means anything over a bounded
    grid anyway."""
    xs = _spread_bits(F.pmod(x.cast("long"), F.lit(_DIM_MOD)))
    ys = _spread_bits(F.pmod(y.cast("long"), F.lit(_DIM_MOD)))
    return xs.bitwiseOR(F.shiftleft(ys, 1)).alias("zkey")


def zorder_key_sql(x: str, y: str) -> str:
    """DuckDB spelling of :func:`zorder_key` over column expressions —
    the exact same mask ladder, for engines that want to verify a
    layout written by this module. NOTE each ladder step embeds the
    previous expression twice, so the text doubles per level (2^5
    copies of the folded input) — fine for a one-off check (DuckDB
    CSEs it), but oracles and anything generated should prefer
    :func:`zorder_key_select`, which is linear-size."""

    def spread(expr: str) -> str:
        # CAST matches the Spark side's .cast("long"): narrow (INT32)
        # inputs would overflow DuckDB's typed << at shift 16
        e = f"((CAST({expr} AS BIGINT)) % {_DIM_MOD} + {_DIM_MOD}) % {_DIM_MOD}"
        for shift, mask in _SPREAD_MASKS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"


def zorder_key_select(
    source: str, x: str, y: str, keep: Sequence[str], out_alias: str = "zkey"
) -> str:
    """Linear-size SQL for :func:`zorder_key`: a chain of nested
    SELECTs, one per mask level, each binding the running ``_zx``/
    ``_zy`` ONCE from the previous level (vs :func:`zorder_key_sql`'s
    single expression that doubles in size per level). ``source`` is a
    table name or parenthesised subquery; ``x``/``y`` are evaluated
    only in the innermost level, so they may reference any ``source``
    column; ``keep`` columns are threaded through to the final SELECT
    alongside ``out_alias``. Result-identical to the expression form
    (pinned in tests)."""
    cols = ", ".join(keep)
    q = (  # CAST: see zorder_key_sql — parity with Spark's .cast("long")
        f"SELECT {cols}, ((CAST({x} AS BIGINT)) % {_DIM_MOD} + {_DIM_MOD}) % {_DIM_MOD} AS _zx,"
        f" ((CAST({y} AS BIGINT)) % {_DIM_MOD} + {_DIM_MOD}) % {_DIM_MOD} AS _zy FROM {source}"
    )
    for shift, mask in _SPREAD_MASKS:
        q = (
            f"SELECT {cols}, ((_zx | (_zx << {shift})) & {mask}) AS _zx,"
            f" ((_zy | (_zy << {shift})) & {mask}) AS _zy FROM ({q})"
        )
    return f"SELECT {cols}, (_zx | (_zy << 1)) AS {out_alias} FROM ({q})"


def write_zordered(
    df: DataFrame, path: str, x: Column, y: Column, n_files: int
) -> None:
    """Cluster ``df`` on zorder_key(x, y) into ``n_files`` range
    partitions (each sorted within) and write parquet. Range
    partitioning on the key gives files DISJOINT key ranges — i.e.
    tight, non-overlapping bounding boxes in (x, y) — which is what
    makes the min/max manifest prune. The z-key is a transient sort
    column, not part of the table schema."""
    (
        df.withColumn("_zkey", zorder_key(x, y))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_manifest(
    spark: SparkSession, path: str, stat_cols: Sequence[str]
) -> DataFrame:
    """Per-data-file min/max manifest for ``stat_cols``, built from
    parquet FOOTERS only (no data pages), one task per file — the
    distributed shape that still works when a 100 TB table has millions
    of files. Output: file (string), n_rows (bigint), then
    ``<col>_min``/``<col>_max`` (bigint) per requested column.

    File listing goes through Spark's Hadoop-FS reader
    (``inputFiles()``), so any scheme the session can read is listed
    correctly; the footer reads themselves use pyarrow, which in this
    build resolves local paths (``file:`` URIs are localised below) —
    on an object store, point pyarrow at the matching filesystem."""
    import pandas as pd

    files = sorted(spark.read.parquet(path).inputFiles())
    cols = list(stat_cols)

    out_schema = ", ".join(
        ["file string", "n_rows long"]
        + [f"{c}_min long, {c}_max long" for c in cols]
    )

    def read_footers(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            recs = []
            for fp in pdf["file"]:
                local = fp
                if local.startswith("file:"):
                    local = local[5:]
                    while local.startswith("//"):
                        local = local[1:]
                md = pq.read_metadata(local)
                name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                rec: dict = {"file": fp, "n_rows": md.num_rows}
                for c in cols:
                    lo, hi = None, None
                    ci = name_to_idx[c]
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            lo, hi = None, None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    rec[f"{c}_min"], rec[f"{c}_max"] = lo, hi
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=["file", "n_rows"] + [f"{c}_{s}" for c in cols for s in ("min", "max")]
            )

    paths_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        max(1, min(len(files), 64))
    )
    return paths_df.mapInPandas(read_footers, out_schema)


def prune_files(
    manifest: DataFrame, bounds: dict[str, tuple[int, int]]
) -> list[str]:
    """Files whose [min,max] ranges intersect every ``col: (lo, hi)``
    bound — the candidate set a predicate scan must read. Files with
    missing stats are conservatively kept (never an incorrect skip)."""
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        has = F.col(f"{c}_min").isNotNull() & F.col(f"{c}_max").isNotNull()
        cond = cond & (~has | ((F.col(f"{c}_max") >= lo) & (F.col(f"{c}_min") <= hi)))
    return [r["file"] for r in manifest.where(cond).select("file").collect()]
