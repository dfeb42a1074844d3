"""Exact repeated-substring dedup (operators/dedup.py: duplicated_spans
/ remove_duplicated_spans) — span boundaries, self-repeats, the
short-doc sequence guard, apply-side reconstruction, and plan shape.
"""

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
)

# Six-token phrase shared by doc 1 and doc 2; with k=3 every position of
# the phrase is covered in both docs and nowhere else (every other
# 3-gram is unique across the corpus).
_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta unique1 unique2"),
    (2, "pre1 pre2 alpha beta gamma delta epsilon zeta"),
    (3, "only once words that never repeat anywhere at all"),
    (4, "short doc"),  # shorter than k: must yield no grams, no spans
    (5, ""),  # empty text
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text"])


def test_shared_span_detected_in_both_docs(spark, docs):
    rows = {
        (r.doc_id, r.start_tok, r.end_tok): (r.span_tokens, r.span_text)
        for r in duplicated_spans(docs, "doc_id", "text", k=3).collect()
    }
    phrase = "alpha beta gamma delta epsilon zeta"
    assert rows == {
        (1, 0, 5): (6, phrase),
        (2, 2, 7): (6, phrase),
    }


def test_self_repeat_within_one_doc_counts(spark):
    # the 3-gram "x y z" occurs twice inside ONE doc — still duplicated
    df = spark.createDataFrame(
        [(7, "x y z mid1 mid2 x y z tail")], ["doc_id", "text"]
    )
    spans = {
        (r.doc_id, r.start_tok, r.end_tok, r.span_tokens)
        for r in duplicated_spans(df, "doc_id", "text", k=3).collect()
    }
    assert spans == {(7, 0, 2, 3), (7, 5, 7, 3)}


def test_adjacent_dup_grams_merge_into_one_island(spark):
    # two docs share an 8-token run; k=4 grams overlap/abut -> ONE span
    shared = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.createDataFrame(
        [(1, shared + " solo1"), (2, "other " + shared)], ["doc_id", "text"]
    )
    spans = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicated_spans(df, "doc_id", "text", k=4).collect()
    }
    assert spans == {(1, 0, 7), (2, 1, 8)}


def test_remove_spans_reconstruction(spark, docs):
    out = {
        r.doc_id: (r.clean_text, r.tokens_removed)
        for r in remove_duplicated_spans(docs, "doc_id", "text", k=3).collect()
    }
    # every doc survives, including span-free / short / empty ones
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1] == ("unique1 unique2", 6)
    assert out[2] == ("pre1 pre2", 6)
    assert out[3] == (_DOCS[2][1], 0)
    assert out[4] == ("short doc", 0)
    assert out[5] == ("", 0)


def test_fully_covered_doc_yields_empty_clean_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.clean_text, r.tokens_removed)
           for r in remove_duplicated_spans(df, "doc_id", "text", k=4).collect()}
    assert out == {1: ("", 4), 2: ("", 4)}


def test_short_docs_produce_no_fabricated_grams(spark):
    # the sequence(0, size-k) negative-step trap: two identical 2-token
    # docs with k=3 must yield NOTHING (no grams exist), not spans
    # fabricated from a descending start sequence
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    assert duplicated_spans(df, "doc_id", "text", k=3).count() == 0


def test_repeated_single_spaces_do_not_mint_tokens(spark):
    # split on ' ' leaves empty strings which are filtered: positions
    # must index the FILTERED token stream on both engines
    df = spark.createDataFrame(
        [(1, "a  b   c d e"), (2, "a b c d e")], ["doc_id", "text"]
    )
    spans = {(r.doc_id, r.start_tok, r.end_tok)
             for r in duplicated_spans(df, "doc_id", "text", k=5).collect()}
    assert spans == {(1, 0, 4), (2, 0, 4)}


def test_null_text_behaves_as_empty(spark):
    # ws_tokens_col coalesces NULL -> '' so clean_text is '' (not NULL)
    # and tokens_removed is 0 — the DuckDB oracle coalesces the same way;
    # a NULL here would be a driver-hash breaker (r5 review finding)
    df = spark.createDataFrame(
        [(1, None), (2, "a b c d"), (3, "a b c d")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.clean_text, r.tokens_removed)
           for r in remove_duplicated_spans(df, "doc_id", "text", k=4).collect()}
    assert out[1] == ("", 0)
    assert duplicated_spans(df, "doc_id", "text", k=4).where("doc_id = 1").count() == 0


def test_long_doc_gram_build_is_linear(spark):
    # regression pin for the lambda-captured tokenize trap: with the raw
    # split+filter expression inlined into the gram transform, ONE
    # 20k-token doc took 330 s (O(n^2) re-tokenization per gram); with
    # tokens projected into a bound column first it is sub-second. The
    # generous bound still fails by minutes if the quadratic shape comes
    # back.
    import time

    text = " ".join(f"w{i % 97}x{i % 89}" for i in range(20_000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    t0 = time.monotonic()
    duplicated_spans(df, "doc_id", "text", k=13).count()
    assert time.monotonic() - t0 < 60


def test_plan_no_python_and_no_cartesian(spark, docs):
    for df in (
        duplicated_spans(docs, "doc_id", "text", k=3),
        remove_duplicated_spans(docs, "doc_id", "text", k=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
