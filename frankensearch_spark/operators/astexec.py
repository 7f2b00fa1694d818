"""Spark execution of parsed query trees (SURVEY.md Q1-Q5, E1-E2, E7-E9).

The plan keeps every relational step declarative — per-field posting-table
filters by the query's terms (partition-prunable), one pivot shuffle per
queried field, an optional positions join for phrase clauses — and runs
the *scoring* through the same numpy kernel the oracle uses
(:mod:`frankensearch_spark.kernel`), inside one ``mapInPandas`` pass.
Rank/bit parity with the oracle is therefore structural, not coincidental.

Multi-field queries (the reference's default ``content^1 + title^2``
expansion, quill/index.rs:11168-11191) join the per-field candidate
pivots FULL OUTER on docid: a doc matching only one field still
candidates, each field scores with its own df/avgdl/fieldnorms, and the
kernel sums per-field contributions in field order.

Glob expansion (Q5) probes the term-stats tables of the glob's fields
with a LIKE filter (grimoire.rs:1374-1460 analogue; cap 16,384 per
config.rs:33) and rewrites the tree to a Should union before execution,
exactly like the reference's lowering.
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
    KEYWORD,
    MUST,
    MUST_NOT,
    NUMERIC,
    Boolean,
    Boost,
    Clause,
    ParserSchema,
    Query,
    RangeI64,
    RangeStr,
    SetStr,
    Term,
    cap_glob_expansion,
    collect_globs,
    contains_all_node,
    glob_to_like,
    parse_lenient,
    substitute_globs,
    walk_leaf_terms,
    walk_metadata_fields,
    walk_text_fields,
)


def _field_indexes(index) -> tuple[dict[str, BuiltIndex], BuiltIndex]:
    # duck-typed so the serving twins (ServingIndex / ServingMultiIndex)
    # share glob expansion: anything with .fields is multi-field
    if hasattr(index, "fields"):
        return index.fields, index.primary
    return {"content": index}, index


def expand_globs(index, ast: Query) -> Query:
    globs = collect_globs(ast)
    if not globs:
        return ast
    from frankensearch_spark.query_ast import KEYWORD, TEXT, Glob

    fidx, _primary = _field_indexes(index)
    expansion = {}
    for g in globs:
        names = [
            f.name for f in g.fields if f.kind == TEXT and f.name in fidx
        ]
        terms: list[str] = []
        for name in names:
            rows = (
                fidx[name]
                .termstats.filter(F.col("term").like(glob_to_like(g.pattern)))
                .select("term")
                .collect()
            )
            terms.extend(r["term"] for r in rows)
        uniq = cap_glob_expansion(terms)
        clauses = tuple(Clause("Should", Term(g.fields, t)) for t in uniq)
        kw_fields = tuple(f for f in g.fields if f.kind == KEYWORD)
        if kw_fields:
            # keyword fields don't expand over a term dictionary here
            # (they live in docmeta): keep a keyword-scoped Glob leaf
            # for the kernel's raw-text wildcard match — previously the
            # keyword side of a glob silently expanded to NOTHING
            clauses += (Clause("Should", Glob(kw_fields, g.pattern)),)
        expansion[g] = Boolean(clauses, None)
    return substitute_globs(ast, expansion)


def _meta_leaf_condition(q: Query):
    """Spark Column for a pure keyword/numeric metadata leaf, else None.

    Only single-field leaves translate (multi-field Terms mix text
    scoring and can't reduce to a row predicate)."""
    while isinstance(q, Boost):
        q = q.query
    if isinstance(q, Term):
        if len(q.fields) != 1:
            return None
        f = q.fields[0]
        if f.kind == KEYWORD:
            return F.col(f.name) == q.text
        if f.kind == NUMERIC:
            try:
                return F.col(f.name) == int(q.text)
            except ValueError:
                return None  # dropped leaf; the kernel decides
        return None
    if isinstance(q, (RangeStr, RangeI64)):
        col = F.col(q.field)
        conds = []
        if q.lower.bound == "Included":
            conds.append(col >= q.lower.value)
        elif q.lower.bound == "Excluded":
            conds.append(col > q.lower.value)
        if q.upper.bound == "Included":
            conds.append(col <= q.upper.value)
        elif q.upper.bound == "Excluded":
            conds.append(col < q.upper.value)
        if not conds:
            # fully unbounded matches null metadata in the kernel — a
            # column predicate would wrongly drop null rows
            return None
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        return cond
    if isinstance(q, SetStr):
        return F.col(q.field).isin(list(q.values))
    return None


def metadata_pushdown(ast: Query):
    """(must_conds, must_not_conds): top-level conjunctive metadata
    predicates as Spark Columns — a pure candidate-set reduction.

    Rows failing a Must metadata predicate (or matching a MustNot one)
    can never match the full query, so filtering them BEFORE the pivot /
    kernel is score-neutral; the kernel still evaluates the complete AST
    on the survivors.  This keeps keyword/numeric filtering in Catalyst
    (predicate pushdown to the scan) instead of Python — the E8 leaves
    read NUMERIC fast columns natively in the reference too
    (quill/index.rs:11399-11935)."""
    node = ast
    while isinstance(node, Boost):
        node = node.query
    cond = _meta_leaf_condition(node)
    if cond is not None:
        return [cond], []
    must_conds, not_conds = [], []
    if isinstance(node, Boolean):
        for cl in node.clauses:
            c = _meta_leaf_condition(cl.query)
            if c is None:
                continue
            if cl.occur == MUST:
                must_conds.append(c)
            elif cl.occur == MUST_NOT:
                not_conds.append(c)
    return must_conds, not_conds


def apply_metadata_pushdown(base: DataFrame, ast: Query) -> DataFrame:
    must_conds, not_conds = metadata_pushdown(ast)
    for c in must_conds:
        base = base.filter(c)  # null predicate -> dropped, like the kernel
    for c in not_conds:
        # null predicate must KEEP the row (the kernel's MustNot misses
        # null metadata), so fold null to false before negating
        base = base.filter(~F.coalesce(c, F.lit(False)))
    return base


def _as_ast(query, schema: ParserSchema = ENGINE_SCHEMA) -> Query:
    if isinstance(query, str):
        return parse_lenient(query, schema).query
    return query


def score_ast(index, query, schema: ParserSchema = ENGINE_SCHEMA) -> DataFrame:
    """(docid, score) for every matching document of a parsed query tree."""
    fidx, primary = _field_indexes(index)
    spark = primary.postings.sparkSession
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
        if mf not in primary.docmeta.columns:
            raise ValueError(
                f"metadata field {mf!r} not present in docmeta"
            )  # capability validation (query.rs:699-752)
    if not leaves and not has_all:
        return empty

    terms = [t for t, _ in leaves]
    phrase_terms = [t for t, needs_pos in leaves if needs_pos]
    qfields = [f for f in walk_text_fields(ast) if f in fidx]
    from frankensearch_spark.operators.serving_exec import _phrase_fields

    pfields = set(_phrase_fields(ast))
    if phrase_terms:
        # scoped to the fields of PHRASE leaves only (query.rs:699-752
        # checks per-field capability): a positions-less field queried
        # by plain terms must not reject a query whose phrases never
        # touch it — the serving_exec/batchexec rule
        for f in pfields:
            if f in fidx and fidx[f].positions is None:
                raise ValueError(
                    f"phrase query on field {f!r} built with with_positions=False"
                )

    doc_count, _tt = primary.stats()
    if doc_count == 0:
        return empty

    # per-field snapshot statistics: df map + tf cache (field avgdl)
    field_df: dict[str, dict[str, int]] = {}
    field_cache: dict[str, np.ndarray] = {}
    for f in qfields:
        sub = fidx[f]
        field_df[f] = sub.df_of_terms(terms)
        _n, total_tokens = sub.stats()
        field_cache[f] = compute_tf_cache(compute_avgdl(total_tokens, doc_count))

    # candidate assembly: one pivot per queried field, full-outer joined
    base: DataFrame | None = None
    tf_col: dict[tuple[str, str], str] = {}
    pos_col: dict[tuple[str, str], str] = {}
    dl_col: dict[str, str] = {}
    for fi, f in enumerate(qfields):
        if not terms:
            continue
        sub = fidx[f]
        tcols = [f"f{fi}t{j}" for j in range(len(terms))]
        dl_col[f] = f"dl{fi}"
        for j, t in enumerate(terms):
            tf_col[(f, t)] = tcols[j]
        full = getattr(sub, "postings_full", None)
        if (
            phrase_terms
            and full is not None
            and set(terms) <= set(phrase_terms)
        ):
            # pure-phrase query: ONE pivot over the fused frame carries
            # tf AND positions together — no second shuffle, no join
            names = ["docid", f"dl{fi}"]
            for j in range(len(terms)):
                names += [f"f{fi}t{j}", f"f{fi}p{j}"]
            pivot = (
                full.filter(F.col("term").isin(terms))
                .groupBy("docid", "doclen")
                .pivot("term", terms)
                .agg(F.first("tf").alias("t"), F.first("positions").alias("p"))
                .toDF(*names)
            )
            for j, t in enumerate(terms):
                pos_col[(f, t)] = f"f{fi}p{j}"
        else:
            pivot = (
                sub.postings.filter(F.col("term").isin(terms))
                .groupBy("docid", "doclen")
                .pivot("term", terms)
                .agg(F.first("tf"))
                .toDF("docid", f"dl{fi}", *tcols)
            )
            if phrase_terms and f in pfields:
                # positions pivot only for fields a phrase leaf touches
                # (pfields): a plain-term-only field never reads
                # pos_col, and when persisted without positions it has
                # no positions frame to pivot at all — the scoped
                # capability check above guarantees pfields members do
                pcols = [f"f{fi}p{j}" for j in range(len(phrase_terms))]
                ppivot = (
                    sub.positions.filter(F.col("term").isin(phrase_terms))
                    .groupBy("docid")
                    .pivot("term", phrase_terms)
                    .agg(F.first("positions"))
                    .toDF("docid", *pcols)
                )
                for j, t in enumerate(phrase_terms):
                    pos_col[(f, t)] = pcols[j]
                pivot = pivot.join(ppivot, "docid", "left")
        base = pivot if base is None else base.join(pivot, "docid", "full_outer")

    if base is None and not has_all:
        # every text leaf references a field absent from this index:
        # nothing can score — empty, not an AttributeError (same guard
        # as serving_exec)
        return empty

    extra_meta = [c for c in meta_fields if c not in ("docid", "doclen")]
    # 'doclen' metadata leaves read the PRIMARY field's doclen
    needs_primary_doclen = "doclen" in meta_fields
    if has_all:
        sel = ["docid"] + (["doclen"] if needs_primary_doclen else []) + extra_meta
        meta = primary.docmeta.select(*sel)
        base = meta if base is None else meta.join(base, "docid", "left")
    elif extra_meta or needs_primary_doclen:
        sel = ["docid"] + (["doclen"] if needs_primary_doclen else []) + extra_meta
        base = base.join(primary.docmeta.select(*sel), "docid", "left")

    if primary.tombstones is not None:
        base = base.join(primary.tombstones, "docid", "left_anti")
    base = apply_metadata_pushdown(base, ast)

    ast_b = ast
    meta_list = list(meta_fields)
    basic_of = {f.name: getattr(f, "basic", False) for f in schema.fields}

    def run(batches):
        from frankensearch_spark.contract import fieldnorm_to_id
        from frankensearch_spark.kernel import EvalContext, FieldView, eval_query

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            views = {}
            for f in qfields:
                tf = {
                    t: np.nan_to_num(
                        pdf[c].to_numpy(dtype=np.float64), nan=0.0
                    ).astype(np.float32)
                    for (ff, t), c in tf_col.items()
                    if ff == f
                }
                positions = {
                    t: pdf[c].to_numpy(dtype=object)
                    for (ff, t), c in pos_col.items()
                    if ff == f
                }
                if f in dl_col:
                    dl = np.nan_to_num(
                        pdf[dl_col[f]].to_numpy(dtype=np.float64), nan=0.0
                    ).astype(np.int64)
                else:
                    dl = np.zeros(n, dtype=np.int64)
                views[f] = FieldView(
                    n=n,
                    fieldnorm_id=fieldnorm_to_id(dl).astype(np.int64),
                    tf=tf,
                    positions=positions,
                    df=field_df[f],
                    tf_cache=field_cache[f],
                    basic=basic_of.get(f, False),
                )
            ctx = EvalContext(
                n=n,
                views=views,
                doc_count=doc_count,
                meta={m: pdf[m].to_numpy(dtype=object) for m in meta_list},
            )
            mask, scores = eval_query(ast_b, ctx)
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
    index, query, k: int = 10, offset: int = 0,
    schema: ParserSchema = ENGINE_SCHEMA,
) -> DataFrame:
    """Top-k DataFrame under the pinned total order (TakeOrderedAndProject)."""
    scored = score_ast(index, query, schema)
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(offset + k)


def search_ast_collect(
    index, query, k: int = 10, offset: int = 0,
    schema: ParserSchema = ENGINE_SCHEMA,
) -> list[tuple[int, np.float32]]:
    rows = topk_ast(index, query, k, offset, schema).collect()
    out = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
    return out[offset : offset + k]


def search_ast_bits(index, query, k: int = 10, **kw):
    return [
        (d, int(np.float32(s).view(np.uint32)))
        for d, s in search_ast_collect(index, query, k, **kw)
    ]
