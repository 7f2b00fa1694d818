"""Spark execution of parsed query trees (SURVEY.md Q1-Q5, E1-E2, E7-E9).

The plan keeps every relational step declarative — posting-table filter by
the query's terms (partition-prunable), one pivot shuffle, an optional
positions join for phrase clauses — and runs the *scoring* through the
same numpy kernel the oracle uses (:mod:`frankensearch_spark.kernel`),
inside one ``mapInPandas`` pass.  Rank/bit parity with the oracle is
therefore structural, not coincidental.

Glob expansion (Q5) probes the term-stats table with a LIKE filter
(grimoire.rs:1374-1460 analogue; cap 16,384 per config.rs:33) and rewrites
the tree to a Should union before execution, exactly like the reference's
lowering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frankensearch_spark.contract import compute_avgdl, compute_tf_cache
from frankensearch_spark.operators.build import BuiltIndex
from frankensearch_spark.query_ast import (
    ENGINE_SCHEMA,
    GLOB_EXPANSION_LIMIT,
    Boolean,
    Clause,
    ParserSchema,
    Query,
    Term,
    collect_globs,
    contains_all_node,
    glob_to_like,
    parse_lenient,
    substitute_globs,
    walk_leaf_terms,
    walk_metadata_fields,
)


def expand_globs(index: BuiltIndex, ast: Query) -> Query:
    globs = collect_globs(ast)
    if not globs:
        return ast
    expansion = {}
    for g in globs:
        rows = (
            index.termstats.filter(F.col("term").like(glob_to_like(g.pattern)))
            .select("term")
            .orderBy("term")
            .limit(GLOB_EXPANSION_LIMIT)
            .collect()
        )
        expansion[g] = Boolean(
            tuple(Clause("Should", Term(g.fields, r["term"])) for r in rows), None
        )
    return substitute_globs(ast, expansion)


def _as_ast(query, schema: ParserSchema = ENGINE_SCHEMA) -> Query:
    if isinstance(query, str):
        return parse_lenient(query, schema).query
    return query


def score_ast(index: BuiltIndex, query, schema: ParserSchema = ENGINE_SCHEMA) -> DataFrame:
    """(docid, score) for every matching document of a parsed query tree."""
    spark = index.postings.sparkSession
    out_schema = T.StructType(
        [
            T.StructField("docid", T.LongType()),
            T.StructField("score", T.FloatType()),
        ]
    )
    empty = spark.createDataFrame([], out_schema)

    ast = expand_globs(index, _as_ast(query, schema))
    leaves = walk_leaf_terms(ast)
    has_all = contains_all_node(ast)
    meta_fields = walk_metadata_fields(ast)
    for mf in meta_fields:
        if mf not in index.docmeta.columns:
            raise ValueError(
                f"metadata field {mf!r} not present in docmeta"
            )  # capability validation (query.rs:699-752)
    if not leaves and not has_all:
        return empty

    terms = [t for t, _ in leaves]
    phrase_terms = [t for t, needs_pos in leaves if needs_pos]
    if phrase_terms and index.positions is None:
        raise ValueError(
            "phrase query on an index built with with_positions=False"
        )  # capability validation (query.rs:699-752)

    df_stats = {
        r["term"]: int(r["df"])
        for r in index.termstats.filter(F.col("term").isin(terms)).collect()
    } if terms else {}
    doc_count, total_tokens = index.stats()
    if doc_count == 0:
        return empty
    tf_cache = compute_tf_cache(compute_avgdl(total_tokens, doc_count))

    # candidate rows: pivot tf per query term (explicit value list — one
    # shuffle on near-unique (docid) keys)
    tcols = [f"t{i}" for i in range(len(terms))]
    if terms:
        base = (
            index.postings.filter(F.col("term").isin(terms))
            .groupBy("docid", "doclen")
            .pivot("term", terms)
            .agg(F.first("tf"))
            .toDF("docid", "doclen", *tcols)
        )
    else:
        base = None
    extra_meta = [f for f in meta_fields if f not in ("docid", "doclen")]
    if has_all:
        meta = index.docmeta.select("docid", "doclen", *extra_meta)
        if base is None:
            base = meta
        else:
            base = meta.join(base.drop("doclen"), "docid", "left")
    elif extra_meta:
        base = base.join(
            index.docmeta.select("docid", *extra_meta), "docid", "left"
        )

    pcols = []
    if phrase_terms:
        pos_pivot = (
            index.positions.filter(F.col("term").isin(phrase_terms))
            .groupBy("docid")
            .pivot("term", phrase_terms)
            .agg(F.first("positions"))
        )
        pcols = [f"p{i}" for i in range(len(phrase_terms))]
        pos_pivot = pos_pivot.toDF("docid", *pcols)
        base = base.join(pos_pivot, "docid", "left")

    if index.tombstones is not None:
        base = base.join(index.tombstones, "docid", "left_anti")

    term_col = dict(zip(terms, tcols))
    phrase_col = dict(zip(phrase_terms, pcols))
    cache = tf_cache.copy()

    def run(batches):
        from frankensearch_spark.kernel import EvalContext, eval_query

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            tf = {
                t: np.nan_to_num(
                    pdf[c].to_numpy(dtype=np.float64), nan=0.0
                ).astype(np.float32)
                for t, c in term_col.items()
            }
            positions = {}
            for t, c in phrase_col.items():
                positions[t] = pdf[c].to_numpy(dtype=object)
            from frankensearch_spark.contract import fieldnorm_to_id

            ctx = EvalContext(
                n=n,
                fieldnorm_id=fieldnorm_to_id(
                    pdf["doclen"].to_numpy(dtype=np.int64)
                ).astype(np.int64),
                tf=tf,
                positions=positions,
                df=df_stats,
                doc_count=doc_count,
                tf_cache=cache,
                meta={f: pdf[f].to_numpy(dtype=object) for f in meta_fields},
            )
            mask, scores = eval_query(ast, ctx)
            rows = np.nonzero(mask)[0]
            if rows.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"].to_numpy(dtype=np.int64)[rows],
                    "score": scores[rows],
                }
            )

    return base.mapInPandas(run, "docid long, score float")


def topk_ast(
    index: BuiltIndex, query, k: int = 10, offset: int = 0,
    schema: ParserSchema = ENGINE_SCHEMA,
) -> DataFrame:
    """Top-k DataFrame under the pinned total order (TakeOrderedAndProject)."""
    scored = score_ast(index, query, schema)
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(offset + k)


def search_ast_collect(
    index: BuiltIndex, query, k: int = 10, offset: int = 0,
    schema: ParserSchema = ENGINE_SCHEMA,
) -> list[tuple[int, np.float32]]:
    rows = topk_ast(index, query, k, offset, schema).collect()
    out = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
    return out[offset : offset + k]


def search_ast_bits(index: BuiltIndex, query, k: int = 10, **kw):
    return [
        (d, int(np.float32(s).view(np.uint32)))
        for d, s in search_ast_collect(index, query, k, **kw)
    ]
