"""T1–T8 semantics vs the reference definitions
(news-scanner/readability/text_stats.py:27-201)."""

from readability_scanner_spark.functions.syllables import estimate_syllables
from readability_scanner_spark.functions.textstats import (
    calculate_text_statistics,
    count_characters,
    count_paragraphs,
    count_sentences,
    count_words,
)


def test_count_sentences_basic():
    assert count_sentences("One. Two! Three?") == 3
    assert count_sentences("No terminal punctuation") == 1
    assert count_sentences("Multiple!!! punctuation?! runs.") == 3
    assert count_sentences("") == 0


def test_count_sentences_trailing_eos():
    assert count_sentences("Ends with period.") == 1


def test_count_paragraphs():
    assert count_paragraphs("a\n\nb\n\n\nc") == 3
    assert count_paragraphs("single block\nwith newline") == 1
    assert count_paragraphs("") == 0


def test_count_words():
    assert count_words("hello world, it's 42") == 5  # it + s split on apostrophe
    assert count_words("") == 0


def test_count_characters_excludes_whitespace():
    assert count_characters("a b\tc\nd") == 4


def test_syllables_pinned_values():
    # pinned algorithm outputs (functions/syllables.py) — these ARE the goldens
    cases = {
        "cat": 1,
        "table": 2,
        "make": 1,
        "reading": 2,
        "university": 5,
        "considerable": 5,
        "walked": 1,
        "wanted": 2,
        "rhythm": 1,
        "a": 1,
        "": 1,
    }
    for word, expected in cases.items():
        assert estimate_syllables(word) == expected, word


def test_statistics_floors_and_zero_text():
    zero = calculate_text_statistics("")
    assert (zero.words, zero.sentences, zero.syllables) == (0, 0, 0)

    s = calculate_text_statistics("word")
    assert s.sentences == 1 and s.words == 1  # floors (text_stats.py:173-175)


def test_word_syllables_uses_raw_word_count():
    # word_syllables computed BEFORE floors (text_stats.py:170)
    s = calculate_text_statistics("university")
    assert s.word_syllables == 5.0


def test_complex_word_threshold():
    s = calculate_text_statistics("cat university dog considerable")
    assert s.complex_polysyllabic_words == 2


def test_unicode_words_match_reference_semantics():
    # Python \w is unicode (the reference uses Python re): CJK runs and
    # accented words count as words
    assert count_words("café naïve") == 2
    assert count_words("数据处理 系统") == 2
    s = calculate_text_statistics("Überraschung! Schön.")
    assert s.words == 2 and s.sentences == 2


def test_count_characters_fast_path_exact():
    """count_characters switched from len(re.sub(r"\\s","",t)) to
    sum-of-split-token-lengths; the two are equal iff str.split()
    splits on exactly the codepoints \\s matches. Verify on targeted
    edges (the full-Unicode sweep was run once: zero differing
    codepoints on CPython 3.11) plus a property check."""
    import re

    _ws = re.compile(r"\s")
    samples = [
        "",
        "   ",
        "a b\tc\nd\re\x0bf\x0cg",
        "\x1c\x1d\x1e\x1f\x85\xa0",  # info separators, NEL, NBSP
        "      　zero​width",
        "word" * 50,
        "mixé 数据 st­ring",  # soft hyphen is NOT whitespace
    ]
    for s in samples:
        assert count_characters(s) == len(_ws.sub("", s)), repr(s)
