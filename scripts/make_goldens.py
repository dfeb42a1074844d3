"""Generate golden extraction outputs from the pinned implementation.

Run once per intentional algorithm change:
    python scripts/make_goldens.py
The committed goldens are the per-turn text-equality contract
(BASELINE.json north_rule) that tests/test_readability.py and
tests/test_pipeline.py enforce.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from readability_scanner_spark.extraction.readability import extract_main_content
from readability_scanner_spark.functions.formulas import all_scores
from readability_scanner_spark.functions.textstats import calculate_text_statistics
from readability_scanner_spark.sources.fixtures import fixture_classes, make_fixture

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "extraction_goldens.json")


def main() -> None:
    goldens = []
    for cls in fixture_classes():
        for seed in (0, 1, 2, 17, 33, 71):
            html = make_fixture(cls, seed)
            r = extract_main_content(html)
            stats = calculate_text_statistics(r.text_content)
            scores = all_scores(stats)
            goldens.append(
                {
                    "cls": cls,
                    "seed": seed,
                    "text_content": r.text_content,
                    "title": r.title,
                    "parse_failed": r.parse_failed,
                    "spans": [[s, e] for s, e in r.spans],
                    "stats": {
                        "words": stats.words,
                        "sentences": stats.sentences,
                        "paragraphs": stats.paragraphs,
                        "characters": stats.characters,
                        "syllables": stats.syllables,
                        "word_syllables": stats.word_syllables,
                        "complex_polysyllabic_words": stats.complex_polysyllabic_words,
                    },
                    "scores": {k: v for k, v in scores.items()},
                }
            )
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(goldens, fh, indent=1)
    print(f"wrote {len(goldens)} goldens to {OUT}")


if __name__ == "__main__":
    main()
