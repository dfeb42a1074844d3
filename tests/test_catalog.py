"""Catalog sink tests: parquet staging-swap protocol always; the Iceberg
MERGE path runs only when the runtime ships the jars (skipped otherwise —
the capability gate itself is asserted either way)."""

import os

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark import catalog


def test_parquet_upsert_newest_wins_and_was_new(spark, tmp_path):
    path = str(tmp_path / "tbl")
    first = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (2, 20, "b2")], "k long, ver long, v string"
    )
    stats = catalog.merge_upsert(spark, path, first, "k", "ver")
    assert stats == {"inserted": 2, "updated": 0}  # incoming deduped per key
    got = {r.k: (r.ver, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: (10, "a"), 2: (20, "b2")}

    second = spark.createDataFrame(
        [(2, 30, "b3"), (3, 5, "c")], "k long, ver long, v string"
    )
    stats = catalog.merge_upsert(spark, path, second, "k", "ver")
    assert stats == {"inserted": 1, "updated": 1}
    got = {r.k: (r.ver, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: (10, "a"), 2: (30, "b3"), 3: (5, "c")}
    # reference replace_one semantics (default): stale incoming still
    # replaces — the write is a full-document replace keyed on url
    stale = spark.createDataFrame([(3, 1, "old")], "k long, ver long, v string")
    catalog.merge_upsert(spark, path, stale, "k", "ver")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[3] == "old"
    # newest mode: an older incoming row must NOT clobber a newer stored one
    catalog.merge_upsert(
        spark,
        path,
        spark.createDataFrame([(3, 9, "newer")], "k long, ver long, v string"),
        "k",
        "ver",
    )
    staler = spark.createDataFrame([(3, 2, "staler")], "k long, ver long, v string")
    catalog.merge_upsert(spark, path, staler, "k", "ver", mode="newest")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[3] == "newer"
    # no staging/backup debris
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__old__")


def test_parquet_delete_and_overwrite(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    df = spark.range(10).withColumn("flag", F.col("id") % 2 == 0)
    catalog.overwrite_all(spark, path, df)
    assert spark.read.parquet(path).count() == 10
    catalog.delete_rows(spark, path, "flag")
    kept = [r.id for r in spark.read.parquet(path).collect()]
    assert sorted(kept) == [1, 3, 5, 7, 9]
    catalog.overwrite_all(spark, path, spark.range(3))
    assert spark.read.parquet(path).count() == 3


def test_table_target_requires_iceberg(spark):
    if catalog.iceberg_available(spark):
        pytest.skip("iceberg present: gate not exercised")
    df = spark.range(1).withColumn("ver", F.lit(1))
    with pytest.raises(RuntimeError, match="Iceberg"):
        catalog.merge_upsert(spark, "lake.db.tbl", df, "id", "ver")
    with pytest.raises(RuntimeError, match="Iceberg"):
        catalog.delete_rows(spark, "lake.db.tbl", "id = 1")


@pytest.mark.skipif(True, reason="evaluated at runtime below")
def _never():  # pragma: no cover
    pass


def test_iceberg_merge_roundtrip(spark, tmp_path):
    """Real MERGE INTO path — runs only on a runtime with Iceberg jars
    (this sandbox ships none; the parquet protocol above is the tested
    equivalence)."""
    if not catalog.iceberg_available(spark):
        pytest.skip("no Iceberg runtime on classpath")
    wh = str(tmp_path / "warehouse")
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
    spark.sql("CREATE TABLE lake.db.t (k BIGINT, ver BIGINT, v STRING) USING iceberg")
    spark.createDataFrame([(1, 1, "a")], "k long, ver long, v string").writeTo(
        "lake.db.t"
    ).append()
    stats = catalog.merge_upsert(
        spark,
        "lake.db.t",
        spark.createDataFrame([(1, 2, "a2"), (2, 1, "b")], "k long, ver long, v string"),
        "k",
        "ver",
    )
    assert stats == {"inserted": 1, "updated": 1}
    got = {r.k: r.v for r in spark.table("lake.db.t").collect()}
    assert got == {1: "a2", 2: "b"}


def test_swap_crash_recovery(spark, tmp_path):
    """Simulated crash between the two swap renames (table dir missing,
    backup present): the next write OR read path must restore the old
    table instead of treating it as empty."""
    import shutil

    path = str(tmp_path / "tbl3")
    catalog.overwrite_all(spark, path, spark.range(5).withColumn("ver", F.lit(1)))
    # simulate the crash window: path renamed away, staging never landed
    os.rename(path, path + ".__old__")
    assert not os.path.exists(path)

    # upsert after the crash: old rows must survive and merge
    stats = catalog.merge_upsert(
        spark,
        path,
        spark.createDataFrame([(99, 2)], "id long, ver long"),
        "id",
        "ver",
    )
    assert stats == {"inserted": 1, "updated": 0}
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == [0, 1, 2, 3, 4, 99]
    assert not os.path.exists(path + ".__old__")

    # and the standalone recovery helper
    os.rename(path, path + ".__old__")
    assert catalog.recover_swap(path) is True
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == got
    assert catalog.recover_swap(path) is False  # idempotent no-op


def test_read_table_serves_backup_mid_swap(spark, tmp_path):
    """A reader racing the swap window (path renamed away, staging not
    yet landed) must see the OLD snapshot via read_table, not a
    path-not-found."""
    path = str(tmp_path / "tbl_rt")
    catalog.overwrite_all(spark, path, spark.range(7).withColumn("ver", F.lit(1)))
    assert catalog.read_table(spark, path).count() == 7
    # freeze the mid-swap instant: backup exists, table path does not,
    # and a staging dir is still being written
    os.rename(path, path + ".__old__")
    os.makedirs(path + ".__staging__")
    try:
        assert sorted(r.id for r in catalog.read_table(spark, path).collect()) == list(range(7))
        # the reader must NOT have healed (that would break the live
        # writer's staging→path rename) — backup still in place
        assert os.path.exists(path + ".__old__") and not os.path.exists(path)
    finally:
        os.rmdir(path + ".__staging__")
    # writer died in the window: reads still serve the old snapshot, and
    # the next WRITE heals (recover_swap runs at the start of every write)
    assert catalog.read_table(spark, path).count() == 7
    catalog.overwrite_all(spark, path, spark.range(3))
    assert catalog.read_table(spark, path).count() == 3
    assert not os.path.exists(path + ".__old__")


def test_upsert_replay_idempotent(spark, tmp_path):
    """Resume safety: re-applying the same incoming batch (both modes)
    must leave the table byte-identical — a killed writer can always be
    re-run."""
    path = str(tmp_path / "tbl4")
    batch = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(50)], "k long, ver long, v string"
    )
    catalog.merge_upsert(spark, path, batch, "k", "ver")
    once = sorted(map(tuple, spark.read.parquet(path).collect()))
    catalog.merge_upsert(spark, path, batch, "k", "ver")
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == once
    catalog.merge_upsert(spark, path, batch, "k", "ver", mode="newest")
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == once


def test_was_new_accounting_newest_mode(spark, tmp_path):
    """A replayed STALE batch in newest mode must report updated=0 (the
    MERGE's >= clause rejects every row), not count key matches."""
    path = str(tmp_path / "tbl5")
    catalog.merge_upsert(
        spark, path, spark.createDataFrame([(1, 10), (2, 10)], "k long, ver long"), "k", "ver"
    )
    stale = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "k long, ver long")
    stats = catalog.merge_upsert(spark, path, stale, "k", "ver", mode="newest")
    assert stats == {"inserted": 1, "updated": 0}
    fresh = spark.createDataFrame([(1, 99)], "k long, ver long")
    stats = catalog.merge_upsert(spark, path, fresh, "k", "ver", mode="newest")
    assert stats == {"inserted": 0, "updated": 1}


# ---------------------------------------------------------------------------
# Iceberg-leg emitted SQL: contract-locked by golden text (VERDICT r3 #8).
# No iceberg-spark-runtime jar exists in this sandbox, so the statements
# below have never executed here — these goldens pin EXACTLY what a
# jar-equipped runtime would run, so the unexecutable leg can't drift
# silently. Semantics mirror the reference's replace_one upsert
# (news-scanner/database/articles.py:128-132) and delete/refresh paths.
# ---------------------------------------------------------------------------


def test_merge_sql_golden_replace_mode():
    assert catalog.merge_sql("db.docs", "src_v", "url", "analysis_date", "replace") == (
        "MERGE INTO db.docs t USING src_v s\n"
        "ON t.url = s.url\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_sql_golden_newest_mode():
    assert catalog.merge_sql("db.docs", "src_v", "url", "ver", "newest") == (
        "MERGE INTO db.docs t USING src_v s\n"
        "ON t.url = s.url\n"
        "WHEN MATCHED AND s.ver >= t.ver THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_delete_and_overwrite_sql_golden():
    assert (
        catalog.delete_sql("db.docs", "host = 'x.com' AND words < 10")
        == "DELETE FROM db.docs WHERE host = 'x.com' AND words < 10"
    )
    assert (
        catalog.overwrite_sql("db.docs", "src_v")
        == "INSERT OVERWRITE db.docs SELECT * FROM src_v"
    )


def test_merge_upsert_iceberg_leg_emits_golden_sql(spark, monkeypatch):
    """Drive merge_upsert down the Iceberg branch with spark.sql stubbed:
    proves the RUNTIME path feeds exactly the golden statement (modulo
    the per-call uuid view name) to the SQL engine."""
    executed = []
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)

    class _SparkProxy:
        def __getattr__(self, name):
            return getattr(spark, name)

        def sql(self, stmt):
            executed.append(stmt)
            raise RuntimeError("stop before real execution")

        def table(self, name):
            return None  # no existing table -> inserted-only accounting

    batch = spark.createDataFrame([(1, 5)], "url long, ver long")
    with pytest.raises(RuntimeError, match="stop before real execution"):
        catalog.merge_upsert(_SparkProxy(), "db.docs", batch, "url", "ver")
    assert len(executed) == 1
    import re as _re

    view = _re.search(r"USING (\S+) s", executed[0]).group(1)
    assert view.startswith("_merge_src_")
    assert executed[0] == catalog.merge_sql("db.docs", view, "url", "ver", "replace")
