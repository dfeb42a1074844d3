"""Z-order layout + file-skipping manifest (operators/layout.py):
key correctness vs a bit-twiddling Python twin, write→manifest→prune
end-to-end equality, and the actual skipping (fewer files read)."""

import shutil

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark.operators.layout import (
    _DIM_MOD,
    file_stats_manifest,
    prune_files,
    write_zordered,
    zorder_key,
)


def _py_spread(x: int) -> int:
    x &= _DIM_MOD - 1
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def _py_zkey(x: int, y: int) -> int:
    return _py_spread(x % _DIM_MOD) | (_py_spread(y % _DIM_MOD) << 1)


def test_zorder_key_matches_python_twin(spark):
    pts = [(0, 0), (1, 0), (0, 1), (5, 3), (2**30 - 1, 2**30 - 1), (12345, 67890), (-3, 7)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y"))).collect()
    for r in rows:
        assert r["zkey"] == _py_zkey(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_key_locality():
    # morton property: adjacent grid cells differ in few low bits —
    # the key of (x, y) and (x+1, y) share all bits above the changed one
    assert _py_zkey(0, 0) == 0
    assert _py_zkey(1, 0) == 1
    assert _py_zkey(0, 1) == 2
    assert _py_zkey(1, 1) == 3
    assert _py_zkey(2, 2) == 12  # next 2x2 block


@pytest.fixture(scope="module")
def zordered_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "grid")
    # 64x64 grid, 4 rows per cell: both dims uniformly populated
    rows = [(x, y, x * 1000 + y) for x in range(64) for y in range(64) for _ in range(4)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    write_zordered(df, path, F.col("x"), F.col("y"), n_files=16)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_manifest_covers_all_rows(spark, zordered_path):
    man = file_stats_manifest(spark, zordered_path, ["x", "y"])
    rows = man.collect()
    assert len(rows) == 16
    assert sum(r["n_rows"] for r in rows) == 64 * 64 * 4
    for r in rows:
        assert r["x_min"] is not None and r["x_max"] >= r["x_min"]
        assert r["y_min"] is not None and r["y_max"] >= r["y_min"]


def test_prune_skips_files_and_preserves_results(spark, zordered_path):
    man = file_stats_manifest(spark, zordered_path, ["x", "y"]).cache()
    total = man.count()
    for bounds in ({"x": (0, 7), "y": (0, 7)}, {"x": (10, 20)}, {"y": (40, 50)}):
        files = prune_files(man, bounds)
        # z-order gives tight boxes in BOTH dims: every one of these
        # selective predicates must skip at least one file
        assert 0 < len(files) < total, bounds
        pred = F.lit(True)
        for c, (lo, hi) in bounds.items():
            pred = pred & F.col(c).between(lo, hi)
        full = {tuple(r) for r in spark.read.parquet(zordered_path).where(pred).collect()}
        part = {tuple(r) for r in spark.read.parquet(*files).where(pred).collect()}
        assert part == full
        assert full  # non-vacuous


def test_prune_keeps_files_with_missing_stats(spark):
    man = spark.createDataFrame(
        [("f1", 10, 0, 5), ("f2", 10, None, None), ("f3", 10, 50, 60)],
        "file string, n_rows long, x_min long, x_max long",
    )
    files = prune_files(man, {"x": (100, 200)})
    assert files == ["f2"]  # no stats -> conservatively kept; others skipped


def test_manifest_empty_stat_cols(spark, zordered_path):
    # a row-count-only manifest is legitimate (and the DDL must not
    # end in a trailing comma)
    man = file_stats_manifest(spark, zordered_path, [])
    rows = man.collect()
    assert len(rows) == 16
    assert sum(r["n_rows"] for r in rows) == 64 * 64 * 4
    assert man.columns == ["file", "n_rows"]


def test_zorder_key_select_equals_expression_form():
    # the linear nested-SELECT chain must be result-identical to the
    # exponentially-duplicated single expression, incl. negative and
    # boundary inputs
    duckdb = pytest.importorskip("duckdb")
    from readability_scanner_spark.operators.layout import (
        zorder_key_select,
        zorder_key_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        "(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 5, 3), "
        "(5, 1073741823, 1073741823), (6, 12345, 67890), (7, -3, 7), "
        "(8, -1073741824, -1)) t(i, x, y)"
    )
    expr = con.execute(
        f"SELECT i, {zorder_key_sql('x', 'y')} AS zkey FROM pts ORDER BY i"
    ).fetchall()
    linear = con.execute(
        f"SELECT i, zkey FROM ({zorder_key_select('pts', 'x', 'y', ['i'])}) ORDER BY i"
    ).fetchall()
    assert expr == linear
    for _, z in expr:
        assert 0 <= z < 1 << 62
