"""Bucketed on-disk inverted index: pruning evidence + incremental
maintenance (SURVEY P9 scale path — the layout build_token_index's
docstring promises, demonstrated with plan text and file counts)."""

import shutil

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark.operators.search import (
    append_to_token_index,
    build_token_index,
    search_bucketed_index,
    search_token_index,
    write_token_index,
)

N_BUCKETS = 8


def _fresh(spark, table):
    """DROP the table and its managed location (a crashed earlier run
    can leave the directory behind after the metadata is gone)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)


@pytest.fixture()
def docs(spark):
    texts = [
        (i, f"doc {i} talks about data and tables plus topic{i % 7}")
        for i in range(60)
    ]
    return spark.createDataFrame(texts, "doc_id long, text string")


def test_bucketed_index_prunes_and_matches(spark, docs):
    # warehouse.dir is static per JVM; use the session default and DROP after
    table = "tok_idx_prune"
    _fresh(spark, table)
    write_token_index(build_token_index(docs, "doc_id", "text"), table, N_BUCKETS)

    # autoBucketedScan would downgrade the scan (the agg shuffles on
    # doc_id, so bucketing saves no exchange) and silently drop bucket
    # pruning with it — force the bucketed read for the pruned plan
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = search_bucketed_index(spark, table, "data topic3", limit=50)
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    # bucket pruning must be IN the plan: the term IN-list selects only
    # the buckets those tokens hash to
    assert "SelectedBucketsCount" in plan, plan[:2000]
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(2)) == N_BUCKETS
    assert int(m.group(1)) < N_BUCKETS  # genuinely pruned, not 8/8

    # and the pruned read returns exactly the in-memory index's answer
    expect = search_token_index(
        build_token_index(docs, "doc_id", "text"), "data topic3", limit=50
    ).collect()
    assert sorted((r.doc_id, r.relevance) for r in q.collect()) == sorted(
        (r.doc_id, r.relevance) for r in expect
    )
    spark.sql(f"DROP TABLE {table}")


def test_incremental_append_equals_full_rebuild(spark, docs):
    table = "tok_idx_incr"
    _fresh(spark, table)
    old = docs.where(F.col("doc_id") < 40)
    new = docs.where(F.col("doc_id") >= 40)
    write_token_index(build_token_index(old, "doc_id", "text"), table, N_BUCKETS)
    append_to_token_index(spark, table, new, "doc_id", "text")

    # postings after append == postings of a full rebuild
    got = sorted(
        (r.token, r.doc_id, r.tf) for r in spark.table(table).collect()
    )
    want = sorted(
        (r.token, r.doc_id, r.tf)
        for r in build_token_index(docs, "doc_id", "text").collect()
    )
    assert got == want

    # the appended table still prunes (insertInto preserved the spec)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            search_bucketed_index(spark, table, "topic5", limit=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount: 1 out of 8" in plan
    spark.sql(f"DROP TABLE {table}")


def test_bucketed_positional_index_prunes_for_phrase(spark, docs):
    """The positional index uses the same (token)-keyed layout, so
    write_token_index buckets it unchanged and phrase_search's term
    IN-list prunes the on-disk scan — the phrase/proximity family
    inherits the 100-TB layout without new writer code."""
    from readability_scanner_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    table = "pos_idx_prune"
    _fresh(spark, table)
    idx = build_positional_index(docs, "doc_id", "text", extract_then_lower=True)
    write_token_index(idx, table, N_BUCKETS)

    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = phrase_search(spark.table(table), "about data", limit=50)
        rows = [(r["doc_id"], r["occurrences"]) for r in q.collect()]
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(2)) == N_BUCKETS and int(m.group(1)) < N_BUCKETS
    # disk-backed result == in-memory result ('about data' occurs once
    # per doc by construction)
    mem = [(r["doc_id"], r["occurrences"]) for r in phrase_search(idx, "about data", limit=50).collect()]
    assert rows == mem and len(rows) == 50
    _fresh(spark, table)


def test_bucketed_bm25_indexed_prunes(spark, docs):
    """bm25_search_indexed's postings scan is term-IN-filtered, so a
    bucketBy(token) layout prunes it to the terms' buckets — the
    interactive-scale BM25 path demonstrated on disk (the one-pass
    bm25_search deliberately scans everything; this is its latency
    twin)."""
    from readability_scanner_spark.operators.search import (
        bm25_search,
        bm25_search_indexed,
        build_token_index,
        doc_lengths,
    )

    table = "bm25_idx_prune"
    _fresh(spark, table)
    idx = build_token_index(docs, "doc_id", "text", extract_then_lower=True)
    write_token_index(idx, table, N_BUCKETS)
    lens = doc_lengths(idx)

    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = bm25_search_indexed(spark.table(table), lens, "data topic3", limit=50)
        rows = [(r["doc_id"], r["score_q"]) for r in q.collect()]
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(2)) == N_BUCKETS and int(m.group(1)) < N_BUCKETS
    mem = [(r["doc_id"], r["score_q"]) for r in bm25_search(idx, "data topic3", limit=50).collect()]
    assert rows == mem and len(rows) == 50
    _fresh(spark, table)
