"""Deterministic multilingual documents generator (corpus-realism guard,
round-5).

The driver's testdata documents table is pure ASCII — which is exactly
how the round-4 bare-``\\b`` divergence stayed invisible. This module
synthesizes a documents table with the SAME schema
(doc_id, text, lang, source, n_chars) whose rows exercise every unicode
branch the text operators claim:

  - de/fr/es stopword-rich prose (lang_id marker sets actually fire)
  - ja (kana+kanji), ko (hangul), zh (han-only) — the CJK density branch
  - accented-adjacency traps ("laïcité" contains marker 'la'; RE2 \\b
    would miscount it)
  - No-category numerics (①, ²), combining marks, CJK-glued digits/PII
  - unicode whitespace (U+3000, U+00A0, U+2028) inside sentences and as
    blank-line paragraph separators

Everything is seeded (zlib.crc32-based like sources/fixtures.py — no
process-salted hash()), so the same (n, seed) always yields the same
table on any worker. scripts/make_multilingual.py materializes a full
sf-dir from this for selfcheck runs against the DuckDB oracles.
"""

from __future__ import annotations

import random
import zlib

_SENT_BANK = {
    "en": (
        "the report covers the state of the market and the outlook for it",
        "analysis shows that the trend is likely to continue in the region",
        "officials said that the plan was approved for the coming year",
        # carries the selfcheck search terms (data/table/query) as TRUE
        # standalone tokens so text_search greens on this corpus are
        # non-vacuous, next to the data表 boundary near-miss in _TRAPS
        "the data in the table supports the query and the wider analysis",
    ),
    "de": (
        "der bericht zeigt dass die lage nicht einfach ist und die zahlen steigen",
        "das ist ein wichtiges ergebnis und die regierung will mit einem plan antworten",
        "die untersuchung ist noch nicht abgeschlossen und der minister äußert sich zu den fragen",
    ),
    "fr": (
        "le rapport montre que la situation est difficile pour les familles dans la région",
        "les résultats sont publiés et le gouvernement prépare une réponse pour que tout avance",
        "la laïcité est une valeur importante dans le débat public et les écoles",
    ),
    "es": (
        "el informe muestra que la situación es difícil para las familias del país",
        "los resultados es una señal clara para el gobierno y las regiones",
        "el plan fue aprobado por el congreso con una mayoría amplia para el año",
    ),
    "ja": (
        "日本語のテキストです。これは本物のかな文字を含みます。",
        "経済の状況について、新しい報告書が公開されました。",
        "研究者たちは、このデータを分析しています。",
    ),
    "ko": (
        "이것은 한국어 텍스트입니다. 보고서가 공개되었습니다.",
        "경제 상황에 대한 새로운 분석이 나왔습니다.",
        "연구자들이 데이터를 검토하고 있습니다.",
    ),
    "zh": (
        "这是一份关于经济形势的报告。数据显示趋势持续。",
        "政府公布了新的计划。分析人员正在研究结果。",
        "报告涵盖了市场状况和未来展望。",
    ),
}

# adversarial fragments spliced into ~1/4 of rows (deterministically):
# each is a known cross-engine divergence trap for \b / \w / \s forms
_TRAPS = (
    "café brûlée naïve",
    "data表 and ①items",
    "data表 near-miss but data alone matches",
    "²nd ½ measure",
    "laïcité le pour la",
    "电话555-123-4567 and 10.0.0.1表",
    "under_score stays one_token",
    "İstanbul DATA and KELVINKSIGN units",  # engine-divergent case folds
    "verticaltabbetween tokens",  # Java-vs-RE2 \s differs on VT
    "unicode　space and nbsp here",
    "line separator inside",
)

_SOURCES = ("world", "tech", "local", "culture", "science")

LANGS = tuple(_SENT_BANK)


def _rng(seed: int, doc_id: int) -> random.Random:
    return random.Random(zlib.crc32(f"mldoc:{seed}:{doc_id}".encode()))


def make_document(doc_id: int, seed: int = 42) -> dict:
    """One deterministic multilingual document row (documents schema)."""
    r = _rng(seed, doc_id)
    lang = LANGS[doc_id % len(LANGS)]
    bank = _SENT_BANK[lang]
    n_sents = r.randint(3, 8)
    sents = [bank[r.randrange(len(bank))] for _ in range(n_sents)]
    if doc_id % 4 == 1:  # splice a trap fragment mid-document
        sents.insert(n_sents // 2, _TRAPS[doc_id % len(_TRAPS)] + ".")
    # CJK rows end sentences with 。 already; latin rows get [.!?]
    if lang in ("ja", "ko", "zh"):
        body = "".join(sents)
        if doc_id % 5 == 2:  # ideographic-space padded blank line
            body += "\n　\n" + bank[0]
    else:
        enders = [". ", "! ", "? "]
        body = "".join(s + enders[r.randrange(3)] for s in sents).strip()
        if doc_id % 5 == 2:
            body += "\n\n" + bank[1] + "."
    if doc_id % 7 == 3:
        body = "　" + body + " "  # unicode-ws padding at edges
    if doc_id % 97 == 95:
        # whitespace-only document (unicode ws incl. U+3000): exercises
        # every emptiness guard (quality_score hard zero, jaccard
        # token-less exclusion, simhash sentinel)
        body = "\n　 \t\n"
    return {
        "doc_id": doc_id,
        "text": body,
        "lang": lang,
        "source": _SOURCES[zlib.crc32(f"src:{seed}:{doc_id}".encode()) % len(_SOURCES)],
        "n_chars": len(body),
    }


def multilingual_documents(n: int = 500, seed: int = 42) -> list[dict]:
    return [make_document(i, seed) for i in range(n)]
