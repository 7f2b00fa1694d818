"""RRF fusion operator vs the reference's pinned semantics.

Pins (fusion/rrf.rs):

* the contribution law ``1/(K + rank + 1)`` over 0-based ranks, K=60
  (rrf.rs:22,116-118), contributions summed across sources;
* the exact fused order of the reference's own dispatch-parity fixture
  (rrf.rs:1068-1100 ``default_strategy_is_byte_identical_to_rrf``:
  lexical a/b/c × semantic a/d/b);
* the 4-level deterministic ordering (rrf.rs:154-173): rrf desc,
  in-both first, lexical score desc (absent = -inf), id asc — exercised
  through a crafted three-way rrf tie at ``rrf_k=0``.

The driver-facing ``hybrid_rrf_fusion`` query is oracle-checked
separately in test_pipeline_queries.py.
"""

import pytest

from frankensearch_spark.operators.fusion import pool_minmax_fuse, rrf_fuse


def _fuse(spark, lex_rows, sem_rows, **kw):
    lex = spark.createDataFrame(lex_rows, "docid string, lex_score double")
    sem = spark.createDataFrame(sem_rows, "docid string, sem_score double")
    return rrf_fuse(lex, sem, **kw).collect()


def _mmfuse(spark, lex_rows, sem_rows, **kw):
    lex = spark.createDataFrame(lex_rows, "docid string, lex_score double")
    sem = spark.createDataFrame(sem_rows, "docid string, sem_score double")
    return pool_minmax_fuse(lex, sem, **kw).collect()


def test_reference_fixture_order_and_scores(spark):
    # rrf.rs:1068-1080 fixture; expected contributions at K=60:
    #   a = 1/61 + 1/61, b = 1/62 + 1/63, d = 1/62, c = 1/63
    out = _fuse(
        spark,
        [("a", 10.0), ("b", 2.0), ("c", 1.0)],
        [("a", 0.9), ("d", 0.5), ("b", 0.4)],
        limit=10,
    )
    assert [r.docid for r in out] == ["a", "b", "d", "c"]
    exp = {
        "a": 1 / 61 + 1 / 61,
        "b": 1 / 62 + 1 / 63,
        "d": 1 / 62,
        "c": 1 / 63,
    }
    for r in out:
        assert r.rrf_score == pytest.approx(exp[r.docid], abs=0, rel=0), r.docid
    assert [r.in_both for r in out] == [True, True, False, False]
    a = out[0]
    assert (a.lex_rank, a.sem_rank, a.lex_score, a.sem_score) == (1, 1, 10.0, 0.9)
    d = out[2]
    assert (d.lex_rank, d.sem_rank, d.lex_score) == (None, 2, None)


def test_tie_order_in_both_then_lexical_then_id(spark):
    # rrf_k=0 forces a three-way rrf tie at 1.0:
    #   A: both lists at rank 2 -> 1/2 + 1/2;  B: lex rank 1 -> 1/1;
    #   C: sem rank 1 -> 1/1.
    # Order law: A (in_both) > B (has a lexical score) > C.
    out = _fuse(
        spark,
        [("B", 10.0), ("A", 5.0)],
        [("C", 0.9), ("A", 0.8)],
        limit=10,
        rrf_k=0.0,
    )
    assert [r.docid for r in out] == ["A", "B", "C"]
    assert [r.rrf_score for r in out] == [1.0, 1.0, 1.0]


def test_rank_law_is_score_desc_then_id_asc(spark):
    # equal lexical scores rank by id asc -> x before y, so x gets the
    # larger contribution.
    out = _fuse(spark, [("y", 1.0), ("x", 1.0)], [], limit=2)
    assert [(r.docid, r.lex_rank) for r in out] == [("x", 1), ("y", 2)]
    assert out[0].rrf_score == pytest.approx(1 / 61, abs=0, rel=0)


def test_limit_applies_after_fuse(spark):
    out = _fuse(
        spark,
        [("a", 3.0), ("b", 2.0), ("c", 1.0)],
        [("d", 0.9)],
        limit=2,
    )
    # a and d tie at 1/61 (lex rank 1 / sem rank 1); a wins on having a
    # lexical score, d (1/61) still beats b (1/62)
    assert [r.docid for r in out] == ["a", "d"]


# ── pool-local min-max fusion (rrf.rs:436-520) ──────────────────────────


def test_minmax_norms_within_pool_and_sums_tiers(spark):
    # lex pool [1, 3, 10] -> a=1.0, b=2/9, c=0.0
    # sem pool [0.4, 0.5, 0.9] -> a=1.0, d=0.2, b=0.0
    out = _mmfuse(
        spark,
        [("a", 10.0), ("b", 3.0), ("c", 1.0)],
        [("a", 0.9), ("d", 0.5), ("b", 0.4)],
        limit=10,
    )
    exp = {"a": 2.0, "b": 2.0 / 9.0 + 0.0, "d": 0.2, "c": 0.0}
    assert [r.docid for r in out] == ["a", "b", "d", "c"]
    for r in out:
        assert r.rrf_score == pytest.approx(exp[r.docid], rel=1e-12), r.docid
    # absent tier contributes exactly 0.0 (rrf.rs:473-474); d is sem-only
    d = out[2]
    assert (d.lex_rank, d.lex_score, d.sem_rank) == (None, None, 2)


def test_minmax_degenerate_pool_maps_to_zero(spark):
    # flat lexical pool (max == min) -> every lex contribution 0.0
    # (rrf.rs:452-462); ordering falls to in_both, lex score, id
    out = _mmfuse(
        spark,
        [("a", 5.0), ("b", 5.0)],
        [("b", 0.9), ("c", 0.1)],
        limit=10,
    )
    exp = {"b": 1.0, "a": 0.0, "c": 0.0}
    for r in out:
        assert r.rrf_score == pytest.approx(exp[r.docid], rel=1e-12), r.docid
    # a (has a lexical score) orders before c at fused 0.0 (rrf.rs:162)
    assert [r.docid for r in out] == ["b", "a", "c"]


def test_minmax_empty_tier_contributes_nothing(spark):
    # empty sem pool -> (+inf, -inf) stats -> all-zero sem side
    # (rrf.rs:436-438)
    out = _mmfuse(spark, [("a", 2.0), ("b", 1.0)], [], limit=10)
    assert [(r.docid, r.rrf_score) for r in out] == [("a", 1.0), ("b", 0.0)]


def test_minmax_tier_weights_reweight_the_sum(spark):
    # rrf.rs pool_minmax_tier_weights_reweight_the_sum analogue:
    # semantic_weight=3 triples the sem contribution; non-finite /
    # non-positive weights sanitize to 1.0 (rrf.rs:90-100)
    out = _mmfuse(
        spark,
        [("a", 2.0), ("b", 1.0)],
        [("b", 0.9), ("a", 0.1)],
        limit=10,
        lexical_weight=1.0,
        semantic_weight=3.0,
    )
    exp = {"a": 1.0 * 1.0 + 3.0 * 0.0, "b": 0.0 + 3.0 * 1.0}
    for r in out:
        assert r.rrf_score == pytest.approx(exp[r.docid], rel=1e-12), r.docid
    out2 = _mmfuse(
        spark,
        [("a", 2.0), ("b", 1.0)],
        [("b", 0.9), ("a", 0.1)],
        limit=10,
        lexical_weight=float("nan"),
        semantic_weight=-4.0,
    )
    exp2 = {"a": 1.0, "b": 1.0}
    for r in out2:
        assert r.rrf_score == pytest.approx(exp2[r.docid], rel=1e-12), r.docid


def test_rrf_tier_weights_scale_contributions(spark):
    # rrf.rs:274,312 — contribution = (1/(K+rank)) * weight; sanitize
    # non-finite/non-positive to 1.0 (rrf.rs:90-100)
    out = _fuse(
        spark,
        [("a", 2.0), ("b", 1.0)],
        [("b", 0.9), ("a", 0.1)],
        limit=10,
        lexical_weight=2.0,
        semantic_weight=0.5,
    )
    exp = {
        "a": (1 / 61) * 2.0 + (1 / 62) * 0.5,
        "b": (1 / 62) * 2.0 + (1 / 61) * 0.5,
    }
    for r in out:
        assert r.rrf_score == pytest.approx(exp[r.docid], rel=1e-12), r.docid
    out2 = _fuse(
        spark,
        [("a", 2.0), ("b", 1.0)],
        [("b", 0.9), ("a", 0.1)],
        limit=10,
        lexical_weight=float("inf"),
        semantic_weight=0.0,
    )
    exp2 = {"a": 1 / 61 + 1 / 62, "b": 1 / 62 + 1 / 61}
    for r in out2:
        assert r.rrf_score == pytest.approx(exp2[r.docid], rel=1e-12), r.docid


def test_local_twins_bit_match_dataframe_fusion(spark):
    """The driver-local fusion twins (engine.search_hybrid's round-4
    path) produce EXACTLY the DataFrame operators' rows — same fused
    f64 bits, same ranks, same 4-level order — on randomized bounded
    pools including ties, one-sided docs, flat pools and weights."""
    import random

    from frankensearch_spark.operators.fusion import (
        pool_minmax_fuse, pool_minmax_fuse_local, rrf_fuse, rrf_fuse_local,
    )

    rng = random.Random(41)
    for trial in range(12):
        n_lex, n_sem = rng.randint(0, 12), rng.randint(0, 12)
        pool = list(range(1, 16))
        lex = [(d, rng.choice([0.25, 1.5, 3.0, 3.0]))
               for d in rng.sample(pool, n_lex)]
        sem = [(d, rng.choice([0.1, 0.9, 0.9]))
               for d in rng.sample(pool, n_sem)]
        if trial == 5:
            sem = [(d, 0.7) for d, _ in sem]  # flat pool
        if trial == 7 and sem:
            # NaN in the pool: Spark's total order ranks NaN first
            # (greatest double) and NaN poisons max() -> flat pool;
            # the twins must mirror both
            sem = [(sem[0][0], float("nan"))] + sem[1:]
        lw = rng.choice([1.0, 2.0, 0.0, float("nan")])
        sw = rng.choice([1.0, 0.5])
        for fuse_df, fuse_loc in (
            (rrf_fuse, rrf_fuse_local),
            (pool_minmax_fuse, pool_minmax_fuse_local),
        ):
            ldf = spark.createDataFrame(
                [(d, float(s)) for d, s in lex] or [(None, None)],
                "docid long, lex_score double",
            )
            sdf = spark.createDataFrame(
                [(d, float(s)) for d, s in sem] or [(None, None)],
                "docid long, sem_score double",
            )
            if not lex:
                ldf = ldf.filter("docid IS NOT NULL")
            if not sem:
                sdf = sdf.filter("docid IS NOT NULL")
            want = [
                (r["docid"], r["rrf_score"], r["lex_rank"], r["sem_rank"],
                 r["lex_score"], r["sem_score"], r["in_both"])
                for r in fuse_df(
                    ldf, sdf, limit=10,
                    lexical_weight=lw, semantic_weight=sw,
                ).collect()
            ]
            got = [
                (d, s, lr, sr, ls, ss, b)
                for d, s, lr, sr, ls, ss, b in fuse_loc(
                    lex, sem, limit=10,
                    lexical_weight=lw, semantic_weight=sw,
                )
            ]

            def canon_nan(rows):
                # NaN != NaN breaks tuple equality; map it to a sentinel
                return [
                    tuple(
                        "NaN" if isinstance(v, float) and v != v else v
                        for v in r
                    )
                    for r in rows
                ]

            assert canon_nan(got) == canon_nan(want), (
                trial, fuse_df.__name__, got, want,
            )
