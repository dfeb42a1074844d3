"""The engine ships some operators twice — a pure-Python form (used in
goldens/UDFs) and a JVM Column form (used in SQL-path queries). They
must agree on the same inputs, or the oracle checks and the golden
checks would silently verify different engines."""

import pytest
from pyspark.sql import functions as F

from readability_scanner_spark.extraction.cleaning import clean_html_content, make_preview
from readability_scanner_spark.extraction.links import extract_article_url, reddit_link_col
from readability_scanner_spark.functions import columns as C
from readability_scanner_spark.functions import textstats as T
from readability_scanner_spark.sources.fixtures import fixture_classes, make_fixture

SAMPLES = [make_fixture(cls, s) for cls in fixture_classes() for s in (0, 5)]
# make_fixture emits pure ASCII — exactly why the r4 \b divergence went
# unseen. Adversarial non-ASCII rows keep this suite able to catch
# Python-vs-JVM drift (the full 3-engine pin is test_word_unicode.py).
ADVERSARIAL = [
    "café brûlée naïve. data表 and ①items!\n\nsecond ²nd ½ paragraph.",
    "laïcité le pour la. 日本語のテキストです。under_score one_token",
    "Mixed: résumé naïveté — em-dash, ellipsis… 电话 10.0.0.1表 end.",
    "unicode　space. nbsp here.\n　\npara after ws-only line.",
]
PLAIN = [clean_html_content(h) for h in SAMPLES] + ADVERSARIAL


@pytest.fixture(scope="module")
def plain_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(PLAIN)], "id long, text string"
    )


def test_stats_columns_match_python(spark, plain_df):
    out = plain_df.select(
        "id",
        C.words_col(F.col("text")).alias("w"),
        C.sentences_col(F.col("text")).alias("s"),
        C.paragraphs_col(F.col("text")).alias("p"),
        C.characters_col(F.col("text")).alias("c"),
    ).collect()
    for row in out:
        text = PLAIN[row.id]
        assert row.w == T.count_words(text), row.id
        assert row.s == T.count_sentences(text), row.id
        assert row.p == T.count_paragraphs(text), row.id
        assert row.c == T.count_characters(text), row.id


def test_preview_col_matches_python(spark, plain_df):
    for k in (40, 150):
        out = plain_df.select("id", C.preview_col(F.col("text"), k).alias("p")).collect()
        for row in out:
            assert row.p == make_preview(PLAIN[row.id], k), (row.id, k)


def test_clean_html_col_matches_reference_fallback(spark):
    """The SQL cleaning path implements the reference's regex FALLBACK
    semantics (tags → space, analyzer.py:74), not the DOM path (adjacent
    text concatenates). Both exist in the reference; assert each against
    its own contract."""
    import re

    def reference_fallback(html):
        no_script = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", html)
        no_style = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", no_script)
        text = re.sub(r"<[^>]+>", " ", no_style)
        for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
            text = text.replace(ent, rep)
        return re.sub(r"\s+", " ", text).strip()

    simple = [
        "<p>plain text, nothing fancy.</p>",
        "<div>a<script>x()</script>b</div>",
        "<style>p{}</style><p>kept</p>",
        "a &amp; b &lt;c&gt;",
    ]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(simple)], "id long, html string")
    out = df.select("id", C.clean_html_col(F.col("html")).alias("t")).collect()
    for row in out:
        assert row.t == reference_fallback(simple[row.id]), row.id


def test_reddit_link_col_matches_python(spark):
    htmls = [make_fixture("reddit_link", s) for s in range(6)]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(htmls)], "id long, c string")
    out = df.select("id", reddit_link_col(F.col("c")).alias("u")).collect()
    for row in out:
        assert row.u == extract_article_url(htmls[row.id]), row.id


def test_reddit_link_col_parity_edge_cases(spark):
    """Column fast path must agree with extract_article_url on the cases
    the generator never produces: uppercase [LINK], reddit-host fallback
    exclusion, entity-escaped hrefs."""
    from readability_scanner_spark.extraction.links import extract_article_url, reddit_link_col

    cases = [
        '<a href="/rel">[LINK]</a> https://reddit.com/r/y',
        "<p>see https://reddit.com/r/x/1 and https://example.com/story</p>",
        '<a href="https://e.com/a?x=1&amp;y=2">[link]</a>',
        "<p>no urls at all</p>",
        None,
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, content string")
    got = {r.i: r.url for r in df.select("i", reddit_link_col(F.col("content")).alias("url")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == extract_article_url(c), (i, c)
