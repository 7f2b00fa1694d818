"""Q2 query classification parity (query_class.rs heuristics +
quill/query.rs:461 explanation surface) on the QG-6 frozen seeds
(qg6_prepared.rs:615-700)."""

import pytest

from frankensearch_spark.query_class import (
    BOOLEAN,
    EMPTY,
    IDENTIFIER,
    NATURAL_LANGUAGE,
    PHRASE,
    SHORT_KEYWORD,
    SIMPLE,
    classify,
    classify_query,
    perf_class,
)

# QG-6 identifier seeds with the class the REFERENCE classifier assigns
# (the gauntlet groups seeds by construction; plain lowercase tokens like
# "term00042" classify ShortKeyword under query_class.rs — pinned here).
IDENTIFIER_SEEDS = {
    "term00042": SHORT_KEYWORD,
    "term00137": SHORT_KEYWORD,
    "src/main.rs": IDENTIFIER,
    r"crate\::module\::TypeName": IDENTIFIER,
    "snake_case_identifier": IDENTIFIER,
    "camelCaseIdentifier": IDENTIFIER,
    "HTTPServer2": IDENTIFIER,
    "config.toml": IDENTIFIER,
    "path/to/module.rs": IDENTIFIER,
    "qgupdateg7d42": SHORT_KEYWORD,
    "sha256deadbeef": SHORT_KEYWORD,
    "user_id": IDENTIFIER,
    "nonexistentIdentifierAlpha": IDENTIFIER,
    "missing/path/file.rs": IDENTIFIER,
    r"UnknownModule\::Type": IDENTIFIER,
    "qg6_nohit_identifier_15": IDENTIFIER,
}

SHORT_KEYWORD_SEEDS = [
    "term00001", "term00002", "generated", "record", "term00005",
    "term00011", "term00017", "term00029", "term02048", "term04096",
    "term06000", "term08190", "missingkeywordalpha", "missingkeywordbeta",
    "missingkeywordgamma", "missingkeyworddelta",
]

NATURAL_LANGUAGE_SEEDS = [
    "term00001 term00007 generated record",
    "term00002 term00013 generated record",
    "search record containing term00023 term00031",
    "generated document mentions term00037 term00041",
    "find term00043 beside term00047 in record",
    "which generated record includes term00053 term00059",
    "locate term04096 with term05003 in generated content",
    "where is qg6missingthree in this corpus",
    "adversarial but valid prose alpha term08191",
]

PHRASE_SEEDS = [
    '"term00001 term00002"',
    '"generated record"',
    '"term00005 term00006 term00007"',
    '"qg6 missing phrase alpha"',
]

BOOLEAN_SEEDS = [
    "term00001 OR term00002",
    "term00003 AND term00004",
    "(term00013 OR term00017) AND term00019",
    "term00023 AND NOT term08191",
    "term08180 AND NOT (term00001 OR term00002)",
    "qg6missingboolzeta AND NOT (term00001 OR term00002 OR term00003)",
]


@pytest.mark.parametrize("seed,expected", sorted(IDENTIFIER_SEEDS.items()))
def test_identifier_seed_classes(seed, expected):
    assert classify(seed) == expected


@pytest.mark.parametrize("seed", SHORT_KEYWORD_SEEDS)
def test_short_keyword_seeds(seed):
    assert classify(seed) == SHORT_KEYWORD
    assert perf_class(seed) in (SHORT_KEYWORD, IDENTIFIER)


@pytest.mark.parametrize("seed", NATURAL_LANGUAGE_SEEDS)
def test_natural_language_seeds(seed):
    assert classify(seed) == NATURAL_LANGUAGE
    assert perf_class(seed) == NATURAL_LANGUAGE


@pytest.mark.parametrize("seed", PHRASE_SEEDS)
def test_phrase_seeds(seed):
    assert perf_class(seed) == PHRASE
    assert classify_query(seed) == PHRASE


@pytest.mark.parametrize("seed", BOOLEAN_SEEDS)
def test_boolean_seeds(seed):
    assert perf_class(seed) == BOOLEAN


def test_heuristic_edges():
    # ticket ids (query_class.rs:110-120 rsplit_once('-') rule)
    assert classify("bd-123") == IDENTIFIER
    assert classify("JIRA-456") == IDENTIFIER
    assert classify("my-project-789") == IDENTIFIER
    assert classify("not-a-ticket-x1a") == SHORT_KEYWORD  # suffix not digits
    # code prefixes (contain a space)
    assert classify("fn main") == IDENTIFIER
    assert classify("struct Foo") == IDENTIFIER
    assert classify("impl Display") == IDENTIFIER
    # capitalized single word is NOT camelCase
    assert classify("Hello") == SHORT_KEYWORD
    assert classify("") == EMPTY
    assert classify("   ") == EMPTY
    # explanation surface (quill/query.rs:461-477)
    assert classify_query("") == EMPTY
    assert classify_query("hello") == SIMPLE
    assert classify_query("hello world") == BOOLEAN
    assert classify_query("'one two'") == PHRASE


def test_budget_multipliers():
    from frankensearch_spark.query_class import LEXICAL_BUDGET, SEMANTIC_BUDGET

    assert LEXICAL_BUDGET[IDENTIFIER] == 2.0
    assert SEMANTIC_BUDGET[NATURAL_LANGUAGE] == 2.0
    assert LEXICAL_BUDGET[EMPTY] == SEMANTIC_BUDGET[EMPTY] == 0.0
