"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan (predicate pushdown, column pruning,
broadcast joins, top-k without full sort, whole-stage codegen).
A plan regression here is a scale bug even when results stay correct."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 400000)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)" in plan


def test_column_pruning_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_lookup_join_is_broadcast(spark):
    from readability_scanner_spark.operators.analytics import lookup_join

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    df = lookup_join(orders, cust, "o_custkey", "c_custkey", ["c_name"])
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    from readability_scanner_spark.operators.analytics import top_k

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plan = _plan(top_k(orders, "o_totalprice", 10, "o_orderkey"))
    assert "TakeOrderedAndProject" in plan


def test_formulas_stay_in_codegen(spark):
    """F1-F9 must be JVM expressions inside WholeStageCodegen, not
    python calls."""
    from readability_scanner_spark.functions.formulas import with_readability_scores

    df = spark.createDataFrame(
        [(10, 2, 40, 15, 1)],
        "words long, sentences long, characters long, syllables long, complex_polysyllabic_words long",
    )
    plan = _plan(with_readability_scores(df))
    assert "codegen id" in plan  # '*' nodes = inside WholeStageCodegen
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sql_text_stats_has_no_python(spark):
    """T1-T4 fast path is pure JVM."""
    from readability_scanner_spark.operators.analytics import sql_text_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(sql_text_stats(docs, "doc_id", "text"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan  # pruned scan


def test_pipeline_single_python_stage(spark):
    """The fused pipeline must contain exactly one python eval node
    (FlatMapGroupsInPandas/MapInPandas) — a second one means the
    extract/stats fusion regressed."""
    from readability_scanner_spark.plans.pipeline import extract_and_score

    src = spark.createDataFrame(
        [("c", 0, "user", "<p>text</p>", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = _plan(extract_and_score(src, repartition_to=4))
    # formatted output lists each node twice (tree + detail section)
    assert plan.count("MapInPandas") == 2
    assert "ArrowEvalPython" not in plan


def test_semi_join_planned(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where("o_totalprice > 450000")
    df = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    assert "LeftSemi" in _plan(df)


def test_rolling_window_default_anchor_is_one_plan(spark):
    """The default anchor must be a broadcast scalar-subquery join inside
    the SAME plan — no driver-side .first() action hidden in the builder."""
    from readability_scanner_spark.operators.analytics import rolling_window

    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = rolling_window(ev, "ts", 7)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # correctness vs explicit anchor
    anchor = ev.agg(F.max("ts")).first()[0]
    explicit = rolling_window(ev, "ts", 7, anchor=anchor).count()
    assert df.count() == explicit


def test_status_claim_is_broadcast(spark):
    from readability_scanner_spark.operators.statusflow import claim_batch

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("status", F.when(F.pmod("event_id", 2) == 0, "pending").otherwise("completed"))
    )
    plan = _plan(claim_batch(ev, "event_id", "status", 10))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_near_dups_no_nested_loop(spark):
    from readability_scanner_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(embedding_near_dups(emb, "vec_id", "embedding", threshold=0.95, n_planes=4))
    assert "CartesianProduct" not in plan


def test_dedup_pipeline_never_goes_quadratic(spark):
    """candidates → verify must be equi-joins end to end: the all-pairs
    product may not appear anywhere in the physical plan."""
    from readability_scanner_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_verify,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand = minhash_lsh_candidates(docs, "doc_id", "text")
    out = ngram_jaccard_verify(cand, docs, "doc_id", "text", 0.5)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_plan_shape(spark):
    """r6 pins: the blocked self-join must (a) read ONE materialized
    signature table on both sides (no second MapInPandas lineage), (b)
    stay a broadcast join (skewed group keys make a shuffled join
    quadratic on one task), (c) carry no distinct aggregate (the
    canonical-group filter dedups), and (d) keep an exchange between the
    join and the final sort (range sampling must not re-execute the
    join)."""
    from readability_scanner_spark.operators.dedup import simhash_near_dups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(simhash_near_dups(docs, "doc_id", "text", max_hamming=3))
    assert "MapInPandas" not in plan  # signatures pre-materialized once
    # both sides read the checkpoint: 2 nodes, each printed in the tree
    # AND the details section of the formatted plan
    assert plan.count("Scan ExistingRDD") == 4
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" not in plan  # no distinct
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # a repartition exchange sits between the join and the sort
    assert plan.index("Sort ") < plan.index("BroadcastHashJoin")


def test_repetition_signals_df_form_binds_tokens(spark):
    """r6 pin: with_repetition_signals must not re-tokenize per bigram —
    the token array appears as a bound column, so the physical plan
    contains exactly ONE split() of the text column."""
    from readability_scanner_spark.operators.textquality import with_repetition_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = with_repetition_signals(docs, "text").select("doc_id", "dup_word_frac", "top_bigram_frac")
    plan = _plan(out)
    assert plan.count("split(lower(text") <= 1
