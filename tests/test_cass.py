"""CASS parser parity — all 39 ``parser: cass`` parse_tree_cases."""

from __future__ import annotations

import json

import pytest

from frankensearch_spark.cass import (
    CASS_SCHEMA,
    CassQueryFilters,
    classify_wildcard,
    parse_cass,
)
from frankensearch_spark.query_ast import (
    All,
    Boolean,
    Clause,
    Glob,
    Phrase,
    PositionedTerm,
    RangeBound,
    RangeI64,
    Term,
)

FIXTURE = "/root/reference/tests/fixtures/quill_language_contract.json"

with open(FIXTURE) as _fh:
    _DATA = json.load(_fh)
CASES = [c for c in _DATA["parse_tree_cases"] if c.get("parser") == "cass"]
BY_ID = {c["id"]: c for c in CASES}


def _resolve(case):
    ast = case["expected_ast"]
    while isinstance(ast, dict) and "ref" in ast:
        ast = BY_ID[ast["ref"]]["expected_ast"]
    return ast


def _field(j):
    f = CASS_SCHEMA.by_name(j["name"])
    assert f is not None and f.boost == j["boost"], j
    return f


def convert(j):
    t = j["type"]
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
    if t == "RangeI64":
        def bound(b):
            return RangeBound(b["bound"], b.get("value"))
        return RangeI64(j["field"], bound(j["lower"]), bound(j["upper"]))
    raise AssertionError(f"unhandled fixture node {t}")


def _filters(case) -> CassQueryFilters:
    f = case.get("filters", {})
    return CassQueryFilters(
        agents=list(f.get("agents", [])),
        workspaces=list(f.get("workspaces", [])),
        created_from=f.get("created_from"),
        created_to=f.get("created_to"),
        source_filter=f.get("source_filter", "all"),
        source_id=f.get("source_id"),
    )


GLOB_CASES = [c for c in CASES if _resolve(c).get("type") == "Glob"]
AST_CASES = [c for c in CASES if _resolve(c).get("type") != "Glob"]


@pytest.mark.parametrize("case", AST_CASES, ids=[c["id"] for c in AST_CASES])
def test_cass_parse_tree_cases(case):
    expected = convert(_resolve(case))
    parsed = parse_cass(case["input"], _filters(case))
    assert parsed.query == expected, (
        f"{case['id']}: got {parsed.query!r}\nexpected {expected!r}"
    )
    if "expected_diagnostic" in case:
        frag = case["expected_diagnostic"]
        assert any(frag in d for d in parsed.diagnostics), (
            f"{case['id']}: no diagnostic containing {frag!r} in "
            f"{parsed.diagnostics}"
        )


@pytest.mark.parametrize("case", GLOB_CASES, ids=[c["id"] for c in GLOB_CASES])
def test_cass_glob_classification_cases(case):
    exp = _resolve(case)
    wc = classify_wildcard(exp["pattern"])
    assert wc.kind == exp["class"], case["id"]
    if "regex" in exp:
        assert wc.to_regex() == exp["regex"], case["id"]
    if "normalized_term" in exp:
        assert wc.core == exp["normalized_term"], case["id"]

    parsed = parse_cass(case["input"]).query
    if exp["strategy"] == "TermQuery":
        # Exact / Prefix lower through exact terms over the 4 searchable
        # fields (query.rs:3803-3820)
        assert isinstance(parsed, Term), case["id"]
        assert parsed.text == (exp.get("normalized_term") or exp["pattern"])
        assert [f.name for f in parsed.fields] == exp["fields"]
    else:  # RegexQuery
        assert isinstance(parsed, Glob), case["id"]
        assert parsed.pattern == exp["pattern"].lower()
        assert [f.name for f in parsed.fields] == exp["fields"]


def test_case_count_complete():
    assert len(CASES) == 39
    assert len(GLOB_CASES) + len(AST_CASES) == 39


def test_source_id_filter_requires_id():
    """source_filter='source_id' with source_id=None previously applied
    NO filter (silently widening to all sources); the reference makes
    that state unrepresentable, so it now raises."""
    import pytest

    from frankensearch_spark.cass import CassQueryFilters, _apply_filters
    from frankensearch_spark.query_ast import All

    with pytest.raises(ValueError, match="source_id"):
        _apply_filters(
            All(), CassQueryFilters(source_filter="source_id", source_id=None)
        )
