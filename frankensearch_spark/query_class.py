"""Query classification (SURVEY.md Q2) — the adaptive-retrieval heuristics.

Two reference surfaces, both ported faithfully:

* :func:`classify` — ``QueryClass::classify``
  (crates/frankensearch-core/src/query_class.rs:38-200): Empty /
  Identifier / ShortKeyword / NaturalLanguage, driving per-class
  candidate budgets (identifiers lean lexical, prose leans semantic).
* :func:`classify_query` — the shipping explanation surface
  (quill/query.rs:461-477): empty / simple / phrase / boolean from the
  raw string shape only.

:func:`perf_class` combines them into the five QG-6 bench classes
(identifier / short_keyword / natural_language / phrase / boolean —
gauntlet perf.rs:258-272), which ``bench.py`` uses to derive class_p50
instead of hand-labeled query ids.
"""

from __future__ import annotations

EMPTY = "empty"
IDENTIFIER = "identifier"
SHORT_KEYWORD = "short_keyword"
NATURAL_LANGUAGE = "natural_language"
PHRASE = "phrase"
BOOLEAN = "boolean"
SIMPLE = "simple"

# lexical/semantic candidate budget multipliers per class
# (query_class.rs:195-215)
LEXICAL_BUDGET = {
    EMPTY: 0.0,
    IDENTIFIER: 2.0,
    SHORT_KEYWORD: 1.0,
    NATURAL_LANGUAGE: 0.5,
}
SEMANTIC_BUDGET = {
    EMPTY: 0.0,
    IDENTIFIER: 0.5,
    SHORT_KEYWORD: 1.0,
    NATURAL_LANGUAGE: 2.0,
}


def _looks_like_identifier(s: str) -> bool:
    """query_class.rs:80-190 (ASCII and Unicode variants share this
    logic: the byte-level fast path is an optimization, not a semantic
    fork — Python str ops are already Unicode-aware)."""
    if not any(c.isspace() for c in s):
        # path separators, dots, Rust path separators
        if "/" in s or "\\" in s or "." in s or "::" in s:
            return True
        # snake_case
        if "_" in s:
            return True
        # camelCase / PascalCase: mixed case that isn't one capitalized word
        has_lower = False
        has_upper = False
        first_upper = False
        rest_lower = True
        for i, c in enumerate(s):
            is_lower = c.islower()
            is_upper = c.isupper()
            has_lower |= is_lower
            has_upper |= is_upper
            if i == 0:
                first_upper = is_upper
            elif not is_lower:
                rest_lower = False
        if has_lower and has_upper and not (first_upper and rest_lower):
            return True
        # issue/ticket pattern: prefix-digits (bd-123, JIRA-456)
        prefix, sep, suffix = s.rpartition("-")
        if (
            sep
            and prefix
            and suffix
            and suffix.isascii()
            and suffix.isdigit()
            and all(
                (c.isascii() and c.isalnum()) or c in "-_" for c in prefix
            )
        ):
            return True
    # common code prefixes (these contain a space)
    return s.startswith(("fn ", "struct ", "impl "))


def classify(query: str) -> str:
    """Empty / identifier / short_keyword / natural_language
    (QueryClass::classify, query_class.rs:38-66)."""
    trimmed = query.strip()
    if not trimmed:
        return EMPTY
    if _looks_like_identifier(trimmed):
        return IDENTIFIER
    word_count = len(trimmed.split()[:4])
    return SHORT_KEYWORD if word_count <= 3 else NATURAL_LANGUAGE


def classify_query(query: str) -> str:
    """The shipping explanation surface (quill/query.rs:461-477):
    empty / phrase (quote-wrapped) / simple (one fragment) / boolean."""
    trimmed = query.strip()
    if not trimmed:
        return EMPTY
    if (trimmed.startswith('"') and trimmed.endswith('"')) or (
        trimmed.startswith("'") and trimmed.endswith("'")
    ):
        return PHRASE
    return SIMPLE if len(trimmed.split()) <= 1 else BOOLEAN


def _has_boolean_grammar(trimmed: str) -> bool:
    toks = trimmed.split()
    if any(t in ("AND", "OR", "NOT") for t in toks):
        return True
    if any(t.startswith(("+", "-")) and len(t) > 1 for t in toks):
        return True
    return "(" in trimmed or ")" in trimmed


def perf_class(query: str) -> str:
    """The five QG-6 bench classes (gauntlet perf.rs:258-272): grammar
    shape first (quotes -> phrase, operators -> boolean), then the
    QueryClass heuristics for bare queries."""
    trimmed = query.strip()
    if not trimmed:
        return EMPTY
    if '"' in trimmed or (
        trimmed.startswith("'") and trimmed.endswith("'")
    ):
        return PHRASE
    if _has_boolean_grammar(trimmed):
        return BOOLEAN
    return classify(trimmed)
