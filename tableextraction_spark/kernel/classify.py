"""Fuzzy keyword table classifier — optional filter stage.

Exact semantic port of ``table_extraction/recognition.py:37-75``
(``classify_table`` + inner ``partial_compare``): a keyword "matches" a word
when the positional character-error ratio (count of differing characters over
``zip`` of the two strings, divided by the max length) is ≤ 0.2 — note this
is NOT Levenshtein; insertions shift everything and count as errors, exactly
like the reference.  A table is kept when
``0.8 · (keywords_found / total_keywords) ≥ 0.2``.

Off by default, mirroring the reference (``filter_tables_by_classification``
is never called from ``extractor.extract``); enable with
``extract_spans(..., classify=True)`` / the ``--classify`` job flag.
"""

from __future__ import annotations

# reference keyword set (steel-standard RU terms, recognition.py:49-50)
KEYWORDS = (
    "марка", "стали", "временное", "сопротивление",
    "предел", "текучести", "относительное", "удлинение",
)
ERROR_THRESHOLD = 0.2
KEYWORD_IMPORTANCE = 0.8


def partial_compare(a: str, b: str, threshold: float = ERROR_THRESHOLD) -> bool:
    """Positional char-error ratio ≤ threshold (recognition.py:55-59)."""
    max_length = max(len(a), len(b))
    if max_length == 0:
        return False
    errors = sum(1 for x, y in zip(a, b) if x != y)
    return errors / max_length <= threshold


def classify_table(table_text: str, keywords: tuple[str, ...] = KEYWORDS) -> bool:
    """True iff enough keywords fuzzy-match words of the table's text."""
    words = [w.lower() for w in table_text.split()]
    found = sum(
        1 for kw in keywords if any(partial_compare(kw, w) for w in words)
    )
    confidence = KEYWORD_IMPORTANCE * (found / len(keywords))
    return confidence >= ERROR_THRESHOLD
