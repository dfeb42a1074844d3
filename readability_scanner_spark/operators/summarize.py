"""Summary / headline enrichment — the reference's LLM seam, engine-side.

The reference generates article summaries and topic headlines by calling
a hosted LLM (news-scanner/services/summary_service.py:205-313 builds the
prompt + retries; celery_app/jobs/daily_topics_jobs.py:113-154 the
headline variant) — the one behavior a self-contained engine cannot
reproduce verbatim. This module supplies its analog the same way the
embedding operator handles its model (operators/embeddings.py): a
**pluggable per-worker factory seam** an LLM client can be dropped into,
with a **deterministic extractive default** so the engine works — and is
driver-verifiable — with no network and no model weights.

The default summarizer is frequency-scored extraction, specified
integer-only so a SQL oracle can reproduce it bit-for-bit:

1. sentences = non-empty segments of ``re.split("[.!?]+(?:\\s+|$)")``,
   each whitespace-normalized (single spaces, trimmed), in order;
2. token frequency = counts of ``[0-9a-z_]+`` matches over the
   lowercased sentences (ASCII classes: identical in Python re, Java
   regex, and RE2 — CLAUDE.md's cross-engine \\w rule);
3. sentence score = sum of its tokens' document frequencies (every
   occurrence counts; pure integers, no float drift);
4. summary = top-``k`` sentences by (score desc, position asc),
   re-joined in document order with ". " and a closing "."; headline =
   the single top-scored sentence.

Scale shape: one shuffle-free mapInPandas pass (the whole computation is
per-document), so it composes with the extraction pipeline at any
partition count; an LLM-backed ``make_summarize_fn`` keeps the same
plan — batches flow to whatever endpoint the factory's closure holds.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

# Whitespace class spelled out on BOTH engines: Python \s/str.split()
# are Unicode-aware, RE2's \s is ASCII-only AND excludes \x0b — the
# oracle SQL uses this exact class too, so the two sides stay
# bit-identical even for documents carrying VT/NBSP/U+2028 whitespace
_ASCII_WS = "[ \t\n\x0b\x0c\r]"
_SENTENCE_SPLIT = re.compile(rf"[.!?]+(?:{_ASCII_WS}+|$)")
_WS_RUN = re.compile(rf"{_ASCII_WS}+")
_TOKEN = re.compile(r"[0-9a-z_]+")


def split_sentences(text: str) -> list[str]:
    """Ordered, whitespace-normalized, non-empty sentence segments."""
    out = []
    for seg in _SENTENCE_SPLIT.split(text or ""):
        seg = _WS_RUN.sub(" ", seg).strip(" ")
        if seg:
            out.append(seg)
    return out


def extractive_summary(text: str, k: int = 2) -> tuple[str, str]:
    """(headline, summary) per the module spec. Deterministic; ties on
    score resolve to the earlier sentence."""
    sents = split_sentences(text)
    if not sents:
        return "", ""
    tokens_per_sent = [_TOKEN.findall(s.lower()) for s in sents]
    freq: dict[str, int] = {}
    for toks in tokens_per_sent:
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
    scores = [sum(freq[t] for t in toks) for toks in tokens_per_sent]
    order = sorted(range(len(sents)), key=lambda i: (-scores[i], i))
    top = sorted(order[:k])
    return sents[order[0]], ". ".join(sents[i] for i in top) + "."


def default_summarize_fn(k: int = 2) -> Callable[[Iterable[str]], list[tuple[str, str]]]:
    """Batch form of the extractive default: texts → [(headline, summary)]."""

    def summarize(texts: Iterable[str]) -> list[tuple[str, str]]:
        return [extractive_summary(t if isinstance(t, str) else "", k) for t in texts]

    return summarize


def summarize_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    make_summarize_fn: Optional[
        Callable[[], Callable[[Iterable[str]], list[tuple[str, str]]]]
    ] = None,
) -> DataFrame:
    """(id, headline, summary) for every row.

    ``make_summarize_fn`` mirrors make_embed_udf's contract: invoked
    ONCE per python worker (client/model construction amortized across
    Arrow batches), must return ``fn(texts) -> [(headline, summary)]``
    of the same length — exactly what an LLM-client closure satisfies.
    Default: :func:`default_summarize_fn` (deterministic extractive).
    ``k`` parameterizes the extractive DEFAULT only; a custom factory
    owns its output shape entirely (close over your own k if needed).
    """
    factory = make_summarize_fn or (lambda: default_summarize_fn(k))
    id_field = df.schema[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = factory()  # once per worker task, outside the batch loop
        for pdf in batches:
            pairs = fn(pdf[text_col].fillna(""))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "headline": [p[0] for p in pairs],
                    "summary": [p[1] for p in pairs],
                }
            )

    schema = f"{id_col} {id_field.dataType.simpleString()}, headline string, summary string"
    return df.select(id_col, text_col).mapInPandas(run, schema)
