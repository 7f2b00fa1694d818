"""Reciprocal Rank Fusion — the reference's product-path tier fuse.

Re-expresses ``frankensearch-fusion``'s RRF law over DataFrames:

* rank contribution ``1/(K + rank + 1)`` with 0-based ranks and the
  default ``K = 60`` (fusion/rrf.rs:22,116-118);
* contributions SUM across sources for documents present in both lists
  (rrf.rs:195-236 rrf_fuse);
* the 4-level deterministic ordering of rrf.rs:154-173 (the default
  ``LexicalThenId`` tiebreak): rrf score desc, in-both-sources first,
  lexical score desc (absent lexical score = -inf), doc id asc.

Scale shape: both inputs are already top-``depth`` candidate lists
(``TakeOrderedAndProject`` upstream), exactly like the in-memory
candidate vectors the reference fuses driver-side — so the
``row_number`` rank windows below run over <= depth rows, a query-time
constant, and nothing corpus-scale flows through an unpartitioned sort.
The fuse itself is one full-outer join on the id column between two
k-row relations (broadcast-sized at any corpus scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60.0  # fusion/rrf.rs:22


def rank_by_score(df: DataFrame, score_col: str, id_col: str, rank_col: str) -> DataFrame:
    """1-based rank by (score desc, id asc) — the pinned list order the
    reference's callers establish before fusing (descending relevance,
    rrf.rs:210-214).  ``1/(K + rank0 + 1)`` over 0-based ranks equals
    ``1/(K + rank)`` over these 1-based ranks.

    The input must already be a bounded candidate list (top-depth); the
    unpartitioned window is over that constant-size list by contract.
    """
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn(rank_col, F.row_number().over(w).cast("long"))


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    *,
    limit: int,
    rrf_k: float = DEFAULT_RRF_K,
    lexical_weight: float = 1.0,
    semantic_weight: float = 1.0,
    id_col: str = "docid",
    lex_score_col: str = "lex_score",
    sem_score_col: str = "sem_score",
) -> DataFrame:
    """Fuse two ranked candidate lists with Reciprocal Rank Fusion.

    ``lexical`` carries (id_col, lex_score_col), ``semantic`` carries
    (id_col, sem_score_col); both must already be bounded top-depth
    lists.  Returns the fused top-``limit`` with columns
    ``(id_col, rrf_score, lex_rank, sem_rank, lex_score, sem_score,
    in_both)`` — ranks/scores are null for the side a doc is absent
    from, mirroring ``FusedHit``'s Option fields (rrf.rs:175-188).
    Tier weights multiply each side's contribution (rrf.rs:274,312),
    sanitized like the reference (non-finite/non-positive -> 1.0).
    """
    lw = _sanitize_tier_weight(lexical_weight)
    sw = _sanitize_tier_weight(semantic_weight)
    lex = rank_by_score(
        lexical.select(id_col, lex_score_col), lex_score_col, id_col, "lex_rank"
    )
    sem = rank_by_score(
        semantic.select(id_col, sem_score_col), sem_score_col, id_col, "sem_rank"
    )
    fused = lex.join(sem, id_col, "full_outer")
    contrib = lambda rank_col, w: F.when(  # noqa: E731
        F.col(rank_col).isNotNull(),
        (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double")))
        * F.lit(w),
    ).otherwise(F.lit(0.0))
    # lexical + semantic in that order — matches the reference's
    # accumulation order so the f64 sum is bit-identical (rrf.rs:845+
    # merge inner folds lexical contributions first); weights multiply
    # AFTER the division exactly as rank_contribution(k, rank) * weight
    # does (rrf.rs:274,312), preserving the op-order contract.
    rrf = (
        contrib("lex_rank", lw) + contrib("sem_rank", sw)
    ).alias("rrf_score")
    in_both = (
        F.col("lex_rank").isNotNull() & F.col("sem_rank").isNotNull()
    ).alias("in_both")
    out = fused.select(
        id_col, rrf, "lex_rank", "sem_rank", lex_score_col, sem_score_col, in_both
    )
    return _ordered_limit(out, limit, id_col, lex_score_col)


def _ordered_limit(out: DataFrame, limit: int, id_col: str, lex_score_col: str) -> DataFrame:
    """4-level deterministic ordering (rrf.rs:154-173, LexicalThenId
    tiebreak): fused score desc, in-both-sources first, lexical score
    desc (absent compares as NEG_INFINITY, rrf.rs:162), id asc."""
    return out.orderBy(
        F.desc("rrf_score"),
        F.desc("in_both"),
        F.desc(F.coalesce(F.col(lex_score_col), F.lit(float("-inf")))),
        F.asc(id_col),
    ).limit(limit)


def _sanitize_tier_weight(weight: float) -> float:
    """Non-finite or non-positive tier weights degrade to the neutral 1.0
    (rrf.rs:90-100 sanitize_tier_weight)."""
    w = float(weight)
    return w if math.isfinite(w) and w > 0.0 else 1.0


def pool_minmax_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    *,
    limit: int,
    lexical_weight: float = 1.0,
    semantic_weight: float = 1.0,
    id_col: str = "docid",
    lex_score_col: str = "lex_score",
    sem_score_col: str = "sem_score",
) -> DataFrame:
    """Pool-local min-max score fusion — the reference's magnitude-
    preserving alternative to RRF (rrf.rs:465-520 pool_minmax_fuse):

    * each tier's raw scores min-max normalize to [0, 1] **within its
      retrieved pool** (the bounded input list, rrf.rs:438-450);
    * a degenerate pool (max == min, or empty) maps every score to 0.0
      (rrf.rs:456-463 minmax_norm — no divide-by-zero, no spurious
      signal from a flat tier);
    * a doc a tier did not retrieve contributes that tier's pool
      minimum normalized value = 0.0;
    * fused score = tier-weighted sum of the normalized scores, sorted
      under the same 4-level deterministic ordering as RRF.

    Same bounded-input contract and output schema as :func:`rrf_fuse`
    (fused value in ``rrf_score``, as the reference stores it).
    """
    lw = _sanitize_tier_weight(lexical_weight)
    sw = _sanitize_tier_weight(semantic_weight)
    lex = rank_by_score(
        lexical.select(id_col, lex_score_col), lex_score_col, id_col, "lex_rank"
    )
    sem = rank_by_score(
        semantic.select(id_col, sem_score_col), sem_score_col, id_col, "sem_rank"
    )
    lex_stats = lex.agg(
        F.min(lex_score_col).alias("_lmin"), F.max(lex_score_col).alias("_lmax")
    )
    sem_stats = sem.agg(
        F.min(sem_score_col).alias("_smin"), F.max(sem_score_col).alias("_smax")
    )
    fused = (
        lex.join(sem, id_col, "full_outer")
        .crossJoin(F.broadcast(lex_stats))
        .crossJoin(F.broadcast(sem_stats))
    )

    def norm(score_col: str, mn: str, mx: str):
        rng = F.col(mx) - F.col(mn)
        return F.when(
            F.col(score_col).isNotNull() & (rng > F.lit(0.0)),
            (F.col(score_col) - F.col(mn)) / rng,
        ).otherwise(F.lit(0.0))

    fscore = (
        F.lit(lw) * norm(lex_score_col, "_lmin", "_lmax")
        + F.lit(sw) * norm(sem_score_col, "_smin", "_smax")
    ).alias("rrf_score")
    in_both = (
        F.col("lex_rank").isNotNull() & F.col("sem_rank").isNotNull()
    ).alias("in_both")
    out = fused.select(
        id_col, fscore, "lex_rank", "sem_rank", lex_score_col, sem_score_col, in_both
    )
    return _ordered_limit(out, limit, id_col, lex_score_col)


# --- driver-local twins ----------------------------------------------------
#
# engine.search_hybrid fuses two BOUNDED top-depth rank lists.  The
# reference fuses those in-process over Vec<FusedHit> (rrf.rs:195-236) —
# and at depth <= a few thousand rows that is also the right Spark
# design: the tiers are already reduced, so fusing via a full-outer JOIN
# pays 4-6 stages of per-job constants to merge <= 2*depth rows.  These
# twins replicate the DataFrame operators' f64 math op-for-op (same
# contribution order, same sanitization, same 4-level ordering law), so
# the engine can collect both tiers concurrently and fuse driver-side;
# equality with the DataFrame path is pinned in test_fusion/test_engine.
# The DataFrame operators above remain the scale path for UNBOUNDED
# relations (the driver-contract hybrid queries use them directly).


def _rank_local(hits, id_idx: int = 0, score_idx: int = 1) -> dict:
    """1-based rank map by (score desc, id asc) — rank_by_score's law.

    NaN mirrors Spark's total order (NaN sorts as the GREATEST double,
    so it ranks FIRST under desc); Python's native comparisons would
    make NaN placement order-dependent."""

    def key(h):
        s = float(h[score_idx])
        return (0 if math.isnan(s) else 1, -s if not math.isnan(s) else 0.0,
                h[id_idx])

    orders = sorted(hits, key=key)
    return {h[id_idx]: r + 1 for r, h in enumerate(orders)}


def _ordered_limit_local(rows: list, limit: int) -> list:
    """The 4-level deterministic ordering of _ordered_limit, locally.

    rows: (docid, fused, lex_rank, sem_rank, lex_score, sem_score,
    in_both); absent lexical score compares as -inf (rrf.rs:162); NaN
    compares as the GREATEST double at both score levels (Spark's
    total order — Python-native NaN comparisons would be
    order-dependent)."""
    neg_inf = float("-inf")

    def desc(x: float):
        # descending sort key under Spark's NaN-greatest total order
        return (0 if math.isnan(x) else 1, -x if not math.isnan(x) else 0.0)

    rows.sort(
        key=lambda r: (
            desc(float(r[1])),
            not r[6],
            desc(float(r[4]) if r[4] is not None else neg_inf),
            r[0],
        )
    )
    return rows[:limit]


def rrf_fuse_local(
    lex_hits,
    sem_hits,
    *,
    limit: int,
    rrf_k: float = DEFAULT_RRF_K,
    lexical_weight: float = 1.0,
    semantic_weight: float = 1.0,
) -> list:
    """Driver-side twin of :func:`rrf_fuse` over [(docid, score)] lists.

    Returns [(docid, rrf_score, lex_rank|None, sem_rank|None,
    lex_score|None, sem_score|None, in_both)], float math identical to
    the DataFrame path: contribution = (1/(k + rank)) * weight, summed
    lexical-first (rrf.rs:274,312 op order)."""
    lw = _sanitize_tier_weight(lexical_weight)
    sw = _sanitize_tier_weight(semantic_weight)
    k = float(rrf_k)
    lex_rank = _rank_local(lex_hits)
    sem_rank = _rank_local(sem_hits)
    lex_score = {d: float(s) for d, s in lex_hits}
    sem_score = {d: float(s) for d, s in sem_hits}
    rows = []
    for d in set(lex_rank) | set(sem_rank):
        lr, sr = lex_rank.get(d), sem_rank.get(d)
        fused = ((1.0 / (k + float(lr))) * lw if lr is not None else 0.0) + (
            (1.0 / (k + float(sr))) * sw if sr is not None else 0.0
        )
        rows.append(
            (d, fused, lr, sr, lex_score.get(d), sem_score.get(d),
             lr is not None and sr is not None)
        )
    return _ordered_limit_local(rows, limit)


def pool_minmax_fuse_local(
    lex_hits,
    sem_hits,
    *,
    limit: int,
    lexical_weight: float = 1.0,
    semantic_weight: float = 1.0,
) -> list:
    """Driver-side twin of :func:`pool_minmax_fuse`: pool-local min-max
    normalization (flat/empty pool or absent doc -> 0.0), tier-weighted
    sum, same output row shape and ordering as :func:`rrf_fuse_local`."""
    lw = _sanitize_tier_weight(lexical_weight)
    sw = _sanitize_tier_weight(semantic_weight)
    lex_rank = _rank_local(lex_hits)
    sem_rank = _rank_local(sem_hits)
    lex_score = {d: float(s) for d, s in lex_hits}
    sem_score = {d: float(s) for d, s in sem_hits}

    def norm_fn(scores: dict):
        if not scores:
            return lambda d: 0.0
        vals = list(scores.values())
        finite = [v for v in vals if not math.isnan(v)]
        # Spark NaN semantics, mirrored exactly: NaN is the GREATEST
        # double in BOTH ordering and comparisons — max() of a pool
        # containing NaN is NaN, min() picks the smallest non-NaN, and
        # crucially `NaN > 0.0` is TRUE, so a NaN range does NOT take
        # the flat-pool branch: present docs normalize to NaN
        # ((s-mn)/NaN) while absent docs stay 0.0
        mx = float("nan") if len(finite) < len(vals) else max(vals)
        mn = min(finite) if finite else float("nan")
        rng = mx - mn
        if not (math.isnan(rng) or rng > 0.0):
            return lambda d: 0.0
        return lambda d: (
            (scores[d] - mn) / rng if d in scores else 0.0
        )

    nl, ns = norm_fn(lex_score), norm_fn(sem_score)
    rows = []
    for d in set(lex_rank) | set(sem_rank):
        lr, sr = lex_rank.get(d), sem_rank.get(d)
        fused = lw * nl(d) + sw * ns(d)
        rows.append(
            (d, fused, lr, sr, lex_score.get(d), sem_score.get(d),
             lr is not None and sr is not None)
        )
    return _ordered_limit_local(rows, limit)
