"""Exhaustive BM25 query execution (the correctness anchor, SURVEY.md E1-E2/E9).

Plan shape (all Catalyst-optimized, one custom UDF):

    postings.filter(term IN q)            # partition-prunable, pushed to scan
      -> groupBy(docid).pivot(term)       # one shuffle, near-unique keys
      -> score = f32 pandas UDF           # pinned op order, clause-ordered sum
      -> ORDER BY score DESC, docid ASC LIMIT k   # TakeOrderedAndProject

The per-query term statistics are collected to the driver (a handful of
rows) and shipped inside the UDF closure — the reference's
"snapshot-global broadcast term statistics" (argus.rs:1279-1350).

Bit parity: the UDF computes scores in numpy float32 in the contract's
operation order; clause scores accumulate in clause order (required
aggregate before optional — argus.rs:2835-3195), so emitted bits equal the
oracle's.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from frankensearch_spark.analyze import tokenize_fast
from frankensearch_spark.contract import (
    compute_avgdl,
    compute_tf_cache,
    term_weight,
)
from frankensearch_spark.operators.build import BuiltIndex


@dataclass
class QuerySpec:
    """Boolean query: Should union, Must intersection, MustNot exclusion.

    ``boosts``: optional per-term boost (default 1.0) — multiplies the
    term's weight exactly like the reference's inherited boost
    (argus.rs:1521-1523), so boosted flat/boolean shapes stay prunable.
    A term must carry ONE boost across all its clauses."""

    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    boosts: dict = field(default_factory=dict)

    @staticmethod
    def from_text(text: str) -> "QuerySpec":
        return QuerySpec(should=[t for t, _ in tokenize_fast(text)])

    def clause_terms(self) -> list[str]:
        """Scored clauses in accumulation order: Must first, then Should."""
        return list(self.must) + list(self.should)

    def boost_of(self, term: str) -> float:
        return float(self.boosts.get(term, 1.0))


def _make_score_udf(clause_terms, col_of_term, weights, tf_cache):
    """f32 scorer over pivoted tf columns.

    ``clause_terms``: scored clauses in accumulation order (may repeat);
    ``col_of_term``: term -> pivot column position; ``weights``: term -> f32.
    """
    order = [(col_of_term[t], np.float32(weights[t])) for t in clause_terms
             if t in col_of_term]
    cache = tf_cache.copy()

    @pandas_udf(T.FloatType())
    def score_udf(doclen: pd.Series, *tf_cols: pd.Series) -> pd.Series:
        from frankensearch_spark.contract import fieldnorm_to_id

        fids = fieldnorm_to_id(doclen.to_numpy(dtype=np.int64)).astype(np.int64)
        norms = cache[fids]
        acc = np.zeros(len(fids), dtype=np.float32)
        for col_idx, w in order:
            tf = tf_cols[col_idx].to_numpy(dtype=np.float64)
            tf = np.nan_to_num(tf, nan=0.0).astype(np.float32)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = (w * tf / (tf + norms)).astype(np.float32)
            s = np.where(tf > 0, s, np.float32(0.0))
            acc = (acc + s).astype(np.float32)
        return pd.Series(acc)

    return score_udf


def score_dataframe(index: BuiltIndex, spec: QuerySpec) -> DataFrame:
    """All matching docs with their f32 scores: (docid, score)."""
    spark = index.postings.sparkSession
    empty = spark.createDataFrame(
        [], T.StructType(
            [
                T.StructField("docid", T.LongType()),
                T.StructField("score", T.FloatType()),
            ]
        )
    )
    uniq: list[str] = []
    for t in spec.clause_terms():
        if t not in uniq:
            uniq.append(t)
    if not uniq:
        return empty

    stats = index.df_of_terms(uniq)
    if any(t not in stats for t in spec.must):
        return empty  # a required term is absent from the index
    present = [t for t in uniq if t in stats]
    if not present:
        return empty

    doc_count, total_tokens = index.stats()
    avgdl = compute_avgdl(total_tokens, doc_count)
    tf_cache = compute_tf_cache(avgdl)
    weights = {
        t: term_weight(stats[t], doc_count, spec.boost_of(t)) for t in present
    }

    p = index.postings.filter(F.col("term").isin(present)).select(
        "term", "docid", "tf", "doclen"
    )
    pivoted = (
        p.groupBy("docid", "doclen").pivot("term", present).agg(F.first("tf"))
    )
    safe = ["docid", "doclen"] + [f"t{i}" for i in range(len(present))]
    pivoted = pivoted.toDF(*safe)

    if index.tombstones is not None:
        pivoted = pivoted.join(index.tombstones, "docid", "left_anti")
    for t in spec.must:
        pivoted = pivoted.filter(F.col(f"t{present.index(t)}").isNotNull())
    if spec.must_not:
        excl = (
            index.postings.filter(F.col("term").isin(list(spec.must_not)))
            .select("docid")
            .distinct()
        )
        pivoted = pivoted.join(excl, "docid", "left_anti")

    col_of_term = {t: i for i, t in enumerate(present)}
    udf = _make_score_udf(spec.clause_terms(), col_of_term, weights, tf_cache)
    tf_cols = [F.col(f"t{i}") for i in range(len(present))]
    return pivoted.select(
        "docid", udf(F.col("doclen"), *tf_cols).alias("score")
    )


def topk(index: BuiltIndex, spec: QuerySpec, k: int = 10, offset: int = 0) -> DataFrame:
    """Top-k under the pinned total order (score f32 desc, docid asc) —
    Catalyst lowers this to TakeOrderedAndProject: per-partition partial
    top-k + driver merge, exactly the reference's collector fold (E9/E11)."""
    scored = score_dataframe(index, spec)
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(offset + k)


def search_collect(
    index: BuiltIndex, query, k: int = 10, offset: int = 0, **spec_kw
) -> list[tuple[int, np.float32]]:
    """Driver-side materialization: [(docid, f32 score)] like the oracle."""
    if isinstance(query, QuerySpec):
        spec = query
    elif isinstance(query, str):
        spec = QuerySpec.from_text(query)
        for key, val in spec_kw.items():
            # dict kwargs (boosts) pass through; clause lists copy —
            # list(dict) would silently keep only the KEYS
            setattr(spec, key, dict(val) if isinstance(val, dict) else list(val))
    else:
        spec = QuerySpec(should=list(query), **spec_kw)
    rows = topk(index, spec, k, offset).collect()
    return [(int(r["docid"]), np.float32(r["score"])) for r in rows][
        offset : offset + k
    ]


def search_bits(index: BuiltIndex, query, k: int = 10, **kw):
    return [
        (d, int(np.float32(s).view(np.uint32)))
        for d, s in search_collect(index, query, k, **kw)
    ]
