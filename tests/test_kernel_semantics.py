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


def test_phrase_mixed_position_formats_per_cell():
    """The dual position formats (vbyte bytes from the fused build,
    int arrays from the SQL path) can MIX within one candidate batch
    when differently-built segments merge; format dispatch must be
    per cell, not sniffed from cells[0]."""
    import numpy as np

    from frankensearch_spark.functions.vbyte import vbyte_encode
    from frankensearch_spark.kernel import eval_query
    from frankensearch_spark.query_ast import (
        ENGINE_SCHEMA,
        parse_lenient,
    )

    docs = [
        (0, "alpha beta gamma"),
        (1, "alpha gamma beta"),
        (2, "beta alpha beta gamma"),
        (3, "alpha beta"),
    ]
    oracle = OracleIndex(docs)
    ast = parse_lenient('"alpha beta"', ENGINE_SCHEMA).query
    ctx = oracle._eval_context(ast)
    _mask_ref, scores_ref = eval_query(ast, ctx)

    # re-encode every EVEN row's cells as vbyte buffers (odd rows stay
    # lists) in both orders, so each variant has a different cells[0]
    for flip in (0, 1):
        ctx2 = oracle._eval_context(ast)
        view = next(iter(ctx2.views.values()))
        for term, parr in view.positions.items():
            mixed = parr.copy()
            for r in range(len(mixed)):
                c = mixed[r]
                if c is not None and len(c) and r % 2 == flip:
                    mixed[r] = vbyte_encode(
                        np.asarray(c, dtype=np.uint64)
                    )
            view.positions[term] = mixed
        _m2, scores2 = eval_query(ast, ctx2)
        assert np.array_equal(
            scores_ref.view(np.uint32), scores2.view(np.uint32)
        ), flip
