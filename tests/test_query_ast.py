"""Parser parity vs the reference's default_lenient parse_tree_cases.

The fixture (`/root/reference/tests/fixtures/quill_language_contract.json`)
is engine-neutral JSON; every ``parser: default_lenient`` case is converted
to our AST dataclasses and asserted equal to ``parse_lenient`` output under
the reference two-field schema (content^1 + title^2 + id keyword).
"""

from __future__ import annotations

import json

import pytest

from frankensearch_spark.query_ast import (
    REFERENCE_SCHEMA,
    All,
    Boolean,
    Boost,
    Clause,
    Empty,
    Phrase,
    PositionedTerm,
    QueryField,
    RangeBound,
    RangeStr,
    SetStr,
    Term,
    canonicalize,
    parse_lenient,
)

FIXTURE = "/root/reference/tests/fixtures/quill_language_contract.json"


def _load_cases():
    with open(FIXTURE) as fh:
        data = json.load(fh)
    return [
        c for c in data["parse_tree_cases"] if c.get("parser") == "default_lenient"
    ]


CASES = _load_cases()


def _field(j) -> QueryField:
    f = REFERENCE_SCHEMA.by_name(j["name"])
    assert f is not None, f"fixture field {j['name']} missing from schema"
    assert f.boost == j["boost"]
    return f


def convert(j):
    t = j["type"]
    if t == "Empty":
        return Empty()
    if t == "All":
        return All()
    if t == "Term":
        return Term(tuple(_field(f) for f in j["fields"]), j["text"])
    if t == "Phrase":
        return Phrase(
            tuple(_field(f) for f in j["fields"]),
            tuple(PositionedTerm(i, s) for i, s in enumerate(j["terms"])),
            j.get("slop", 0),
            j.get("prefix", False),
        )
    if t == "Boolean":
        return Boolean(
            tuple(Clause(c["occur"], convert(c["query"])) for c in j["children"]),
            j.get("operator"),
        )
    if t == "Boost":
        return Boost(convert(j["query"]), j["factor"])
    if t == "RangeStr":
        return RangeStr(
            j["field"],
            RangeBound(j["lower"]["bound"], j["lower"].get("value")),
            RangeBound(j["upper"]["bound"], j["upper"].get("value")),
        )
    if t == "SetStr":
        return SetStr(j["field"], tuple(j["values"]))
    raise AssertionError(f"unsupported fixture node {t}")


@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_default_lenient_parse_tree_cases(case):
    expected = convert(case["expected_ast"])
    parsed = parse_lenient(case["input"], REFERENCE_SCHEMA)
    assert parsed.query == expected, (
        f"{case['id']}: got {parsed.query!r}\nexpected {expected!r}"
    )
    if "expected_diagnostic" in case:
        assert parsed.diagnostics, f"{case['id']}: expected a diagnostic"


def test_case_count_is_complete():
    # all 18 default_lenient cases are exercised — none skipped
    assert len(CASES) == 18


# --- grammar details beyond the fixture -----------------------------------


def test_must_marker():
    q = parse_lenient("+rust ownership", REFERENCE_SCHEMA).query
    assert isinstance(q, Boolean)
    assert q.clauses[0].occur == "Must"
    assert q.clauses[1].occur == "Should"


def test_not_keyword_equivalent_to_minus():
    a = parse_lenient("rust NOT deprecated", REFERENCE_SCHEMA).query
    b = parse_lenient("rust -deprecated", REFERENCE_SCHEMA).query
    assert a == b


def test_glob_leaf():
    q = parse_lenient("ru*t", REFERENCE_SCHEMA).query
    from frankensearch_spark.query_ast import Glob

    assert isinstance(q, Glob)
    assert q.pattern == "ru*t"


def test_phrase_slop_and_prefix_parse():
    q = parse_lenient('"error handling"~2', REFERENCE_SCHEMA).query
    assert isinstance(q, Phrase) and q.slop == 2
    q2 = parse_lenient('"error handling"*', REFERENCE_SCHEMA).query
    assert isinstance(q2, Phrase) and q2.prefix


def test_truncation_flag():
    p = parse_lenient("x " * 9_000, REFERENCE_SCHEMA)
    assert p.was_truncated


def test_canonicalize_dedups_mustnot():
    raw = parse_lenient("rust -old -old", REFERENCE_SCHEMA).query
    q = canonicalize(raw)
    nots = [c for c in q.clauses if c.occur == "MustNot"]
    assert len(nots) == 1


def test_depth_limit_drops_group():
    text = "(" * 70 + "rust" + ")" * 70
    p = parse_lenient(text, REFERENCE_SCHEMA)
    assert any("depth" in d for d in p.diagnostics)


def test_empty_input():
    assert parse_lenient("", REFERENCE_SCHEMA).query == Empty()
    assert parse_lenient("   ", REFERENCE_SCHEMA).query == Empty()
    assert parse_lenient('""', REFERENCE_SCHEMA).query == Empty()
