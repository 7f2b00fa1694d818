"""The four direct_boolean contract cases: scorer-level matching semantics
(minimum_should_match behavior) evaluated through the shared kernel.

Fixture source: quill_language_contract.json parse_tree_cases with
``parser: direct_boolean`` — trees constructed directly, no parsing.
"""

from frankensearch_spark.oracle import OracleIndex
from frankensearch_spark.query_ast import (
    ENGINE_FIELDS,
    Boolean,
    Clause,
    Term,
)

DOCS = [
    (0, "required bonus"),
    (1, "required"),
    (2, "required excluded"),
    (3, "bonus"),
    (4, "first"),
    (5, "second"),
    (6, "first second"),
    (7, "included"),
    (8, "included excluded"),
    (9, "excluded"),
    (10, "other"),
]


def term(text):
    return Term(ENGINE_FIELDS, text)


def _ids(oracle, ast):
    return {d for d, _s in oracle.search_ast(ast, k=50)}


def test_should_optional_with_must():
    # Must determines matching; Should only adds score (min_should_match 0)
    oracle = OracleIndex(DOCS)
    ast = Boolean(
        (
            Clause("Must", term("required")),
            Clause("Should", term("bonus")),
            Clause("MustNot", term("excluded")),
        ),
        None,
    )
    assert _ids(oracle, ast) == {0, 1}
    scores = dict(oracle.search_ast(ast, k=10))
    assert scores[0] > scores[1]  # bonus-matching doc scores higher


def test_should_only_required():
    # no Must -> at least one Should must match (min_should_match 1)
    oracle = OracleIndex(DOCS)
    ast = Boolean(
        (Clause("Should", term("first")), Clause("Should", term("second"))),
        None,
    )
    assert _ids(oracle, ast) == {4, 5, 6}


def test_should_plus_mustnot_required():
    oracle = OracleIndex(DOCS)
    ast = Boolean(
        (
            Clause("Should", term("included")),
            Clause("MustNot", term("excluded")),
        ),
        None,
    )
    assert _ids(oracle, ast) == {7}


def test_mustnot_only_is_empty():
    # a DIRECT MustNot-only tree matches nothing — the All repair happens
    # only in the lenient parser, never at the scorer (matching_semantics:
    # empty)
    oracle = OracleIndex(DOCS)
    ast = Boolean((Clause("MustNot", term("excluded")),), None)
    assert _ids(oracle, ast) == set()
