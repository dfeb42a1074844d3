"""Pinned deterministic English syllable estimator.

The reference uses the third-party ``syllables.estimate`` heuristic with a
vowel-group fallback (news-scanner/readability/text_stats.py:77-106). That
library is not available here and its exact outputs are not a public
contract; SURVEY.md §7.3 pins one algorithm for golden parity. This is
that algorithm: classic vowel-group counting with standard adjustments
(silent 'e', consonant-le, common diphthong collapsing already handled by
grouping). Golden test values are produced by THIS implementation.

Pure function, no dependencies — safe inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re

_VOWEL_GROUP = re.compile(r"[aeiouy]+")
_SILENT_E = re.compile(r"[^aeiouy]e$")
_CONSONANT_LE = re.compile(r"[^aeiouy]le$")

# word→count memo: natural-language vocabulary is Zipf-distributed, so
# the cache hit rate in a corpus batch is very high; capped so a
# pathological vocabulary can't grow worker memory unboundedly
_CACHE: dict[str, int] = {}
_CACHE_CAP = 200_000


def _estimate(w: str) -> int:
    groups = len(_VOWEL_GROUP.findall(w))
    if groups == 0:
        return 1
    # silent trailing 'e' (e.g. 'make'), but NOT consonant-le ('table')
    if _SILENT_E.search(w) and not _CONSONANT_LE.search(w) and groups > 1:
        groups -= 1
    # trailing 'ed' after a consonant is usually non-syllabic ('walked'),
    # except after t/d ('wanted', 'added')
    if len(w) > 3 and w.endswith("ed") and w[-3] not in "aeiouytd" and groups > 1:
        groups -= 1
    return max(groups, 1)


def estimate_syllables(word: str) -> int:
    """Estimate syllables in a single word; always >= 1 (the reference
    floors at 1, text_stats.py:86)."""
    w = word.lower()
    if not w:
        return 1
    hit = _CACHE.get(w)
    if hit is not None:
        return hit
    n = _estimate(w)
    if len(_CACHE) < _CACHE_CAP:
        _CACHE[w] = n
    return n
