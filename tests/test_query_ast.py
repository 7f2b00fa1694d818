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
    walk_leaf_terms,
)

from frankensearch_spark.query_ast import ENGINE_SCHEMA, Glob

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


class TestLenientEdgeRecovery:
    """Unpinned-by-fixture edge behaviors aligned with the reference
    parser (query.rs lex/unary), found by review round 2."""

    def test_deep_not_and_or_chains_never_error(self):
        for q in ("NOT " * 2000 + "rust", "AND " * 2000 + "rust",
                  "OR " * 3000 + "x", "NOT " * 2001 + "rust"):
            parse_lenient(q, ENGINE_SCHEMA)  # must not raise

    def test_negated_group(self):
        r = parse_lenient("-(deprecated legacy) rust", ENGINE_SCHEMA)
        q = r.query
        assert isinstance(q, Boolean)
        occurs = [c.occur for c in q.clauses]
        assert occurs == ["MustNot", "Should"]
        inner = q.clauses[0].query
        assert isinstance(inner, Boolean)
        assert {c.query.text for c in inner.clauses} == {
            "deprecated", "legacy"
        }

    def test_unmatched_rparen_drops_remainder_with_diagnostic(self):
        r = parse_lenient("rust) ownership", ENGINE_SCHEMA)
        assert isinstance(r.query, Term) and r.query.text == "rust"
        assert any("unmatched closing parenthesis" in d
                   for d in r.diagnostics)

    def test_numeric_in_set_parses_ints(self):
        r = parse_lenient("doclen: IN [5 10 xx]", ENGINE_SCHEMA)
        assert isinstance(r.query, SetStr)
        assert r.query.values == (5, 10)
        assert any("non-numeric" in d for d in r.diagnostics)

    def test_field_scoped_quoted_phrase(self):
        r = parse_lenient('title:"error handling"', REFERENCE_SCHEMA)
        q = r.query
        assert isinstance(q, Phrase)
        assert [f.name for f in q.fields] == ["title"]
        assert [t.text for t in q.terms] == ["error", "handling"]

    def test_empty_group_under_and_does_not_poison(self):
        r = parse_lenient("rust AND ()", ENGINE_SCHEMA)
        terms = [t for t, _ in walk_leaf_terms(r.query)]
        assert terms == ["rust"]
        assert any("empty group" in d for d in r.diagnostics)

    def test_double_not_composes(self):
        # reference NOT-stacking law: NOT NOT x nests a MustNot boolean
        # under the outer MustNot — matching docs CONTAIN x after the
        # all-negative repair, never the complement
        r = parse_lenient("NOT NOT rust", ENGINE_SCHEMA)
        q = r.query
        assert isinstance(q, Boolean)
        outer = [c for c in q.clauses if c.occur == "MustNot"]
        assert len(outer) == 1 and isinstance(outer[0].query, Boolean)

    def test_keyword_glob_keeps_case(self):
        r = parse_lenient("repo:Foo*", ENGINE_SCHEMA)
        assert isinstance(r.query, Glob) and r.query.pattern == "Foo*"
        r = parse_lenient("Fo*", ENGINE_SCHEMA)
        assert isinstance(r.query, Glob) and r.query.pattern == "fo*"

    def test_quadratic_dedup_is_gone(self):
        import time
        text = " ".join(f"t{i:05d}" for i in range(2400))
        t0 = time.perf_counter()
        parse_lenient(text, ENGINE_SCHEMA)
        assert time.perf_counter() - t0 < 2.0


def test_range_with_trailing_junk_dropped():
    """'path:[a TO b]x' previously folded the junk into the upper bound
    (matching 'b]x') and silently read a '}' close as inclusive; a
    closing bracket followed by junk now drops with a diagnostic, while
    a genuinely UNCLOSED range keeps its lenient recovery."""
    from frankensearch_spark.query_ast import (
        ENGINE_SCHEMA,
        RangeStr,
        parse_lenient,
    )

    p = parse_lenient("path:[a TO b]x", ENGINE_SCHEMA)
    assert any("malformed range" in d for d in p.diagnostics), p.diagnostics

    p2 = parse_lenient("path:[a TO b", ENGINE_SCHEMA)  # unclosed: recovers
    node = p2.query
    assert isinstance(node, RangeStr) and node.upper.value == "b", node
