"""Full-grammar query execution over the COMPRESSED serving index.

The durable index (``plans/manifest.py``) stores delta+vbyte posting
blocks; this module decodes only the query's candidate blocks (tpart +
term parquet pruning) back into posting rows inside a mapInPandas pass,
then reuses the exact same candidate-pivot + numpy-kernel path as the
primary executor — so boolean / phrase / metadata AST queries served
from disk are bit-identical to the in-memory index and the oracle.

Phrase queries decode the per-block POSITIONS sidecar (``pos_bytes``,
the quiver.rs:3456-3530 section-kind-3 analogue) for the phrase terms
only; indexes persisted without positions raise a capability error
(query.rs:699-752 validation analogue).  Flat bag-of-words queries can
also take the block-max WAND pruned path (:mod:`operators.wand`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.contract import compute_avgdl, compute_tf_cache
from frankensearch_spark.operators.merge import decode_blocks_pdf, term_partition
from frankensearch_spark.operators.wand import ServingIndex
from frankensearch_spark.query_ast import (
    ENGINE_SCHEMA,
    ParserSchema,
    parse_lenient,
    walk_leaf_terms,
    walk_metadata_fields,
)


def blocks_to_postings(
    index: ServingIndex, terms: list[str], with_positions: bool = False
) -> DataFrame:
    """Decode the candidate blocks of ``terms`` into posting rows
    (docid, term, tf, fieldnorm_id[, positions]) — parquet-pruned by
    tpart + term; the positions sidecar is only decoded when asked."""
    tparts = sorted({term_partition(t, index.n_term_partitions) for t in terms})
    cand = index.blocks.filter(
        F.col("tpart").isin(tparts) & F.col("term").isin(terms)
    )
    shift = index.bucket_shift

    def decode(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            out = decode_blocks_pdf(pdf, shift, with_positions=with_positions)
            docids, tfs, fids, rows = out[:4]
            cols = {
                "docid": docids.astype(np.int64),
                "term": pdf["term"].to_numpy(dtype=object)[rows],
                "tf": tfs.astype(np.int32),
                "fieldnorm_id": fids.astype(np.int32),
            }
            if with_positions:
                cols["positions"] = out[4]
            yield pd.DataFrame(cols)

    schema = "docid long, term string, tf int, fieldnorm_id int"
    if with_positions:
        schema += ", positions array<int>"
    return cand.mapInPandas(decode, schema)


def serving_score_ast(
    index: ServingIndex, query, schema: ParserSchema = ENGINE_SCHEMA
) -> DataFrame:
    """(docid, score) over the compressed index via the shared kernel."""
    spark = index.blocks.sparkSession
    empty = spark.createDataFrame([], "docid long, score float")
    ast = parse_lenient(query, schema).query if isinstance(query, str) else query
    from frankensearch_spark.operators.astexec import expand_globs

    ast = expand_globs(index, ast)  # duck-typed: ServingIndex has termstats

    leaves = walk_leaf_terms(ast)
    phrase_terms = [t for t, needs_pos in leaves if needs_pos]
    if phrase_terms and not index.has_positions:
        raise ValueError(
            "phrase queries need positions; this serving index was "
            "persisted without the pos_bytes sidecar (rebuild/save with "
            "with_positions=True)"
        )
    from frankensearch_spark.query_ast import contains_all_node

    has_all = contains_all_node(ast)
    meta_fields = walk_metadata_fields(ast)
    terms = [t for t, _ in leaves]
    if not terms and not has_all:
        return empty

    doc_count, total_tokens = index.stats()
    if doc_count == 0:
        return empty
    tf_cache = compute_tf_cache(compute_avgdl(total_tokens, doc_count))
    df_stats = index.df_of_terms(terms)

    base = None
    tcols = [f"t{i}" for i in range(len(terms))]
    pcols = [f"p{j}" for j in range(len(phrase_terms))]
    if terms:
        postings = blocks_to_postings(
            index, terms, with_positions=bool(phrase_terms)
        )
        base = (
            postings.groupBy("docid", "fieldnorm_id")
            .pivot("term", terms)
            .agg(F.first("tf"))
            .toDF("docid", "fnid", *tcols)
        )
        if phrase_terms:
            ppivot = (
                postings.filter(F.col("term").isin(phrase_terms))
                .groupBy("docid")
                .pivot("term", phrase_terms)
                .agg(F.first("positions"))
                .toDF("docid", *pcols)
            )
            base = base.join(ppivot, "docid", "left")
    extra_meta = [c for c in meta_fields if c not in ("docid", "doclen")]
    needs_doclen = "doclen" in meta_fields
    if has_all:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + extra_meta
        meta = index.docmeta.select(*sel)
        base = meta if base is None else meta.join(base, "docid", "left")
    elif extra_meta or needs_doclen:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + extra_meta
        base = base.join(index.docmeta.select(*sel), "docid", "left")
    if index.tombstones is not None:
        base = base.join(index.tombstones.select("docid"), "docid", "left_anti")
    from frankensearch_spark.operators.astexec import apply_metadata_pushdown

    base = apply_metadata_pushdown(base, ast)

    term_col = dict(zip(terms, tcols))
    pos_col = dict(zip(phrase_terms, pcols))
    meta_list = list(meta_fields)
    cache = tf_cache.copy()

    def run(batches):
        from frankensearch_spark.kernel import EvalContext, FieldView, eval_query

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
            if "fnid" in pdf.columns:
                fnid = np.nan_to_num(
                    pdf["fnid"].to_numpy(dtype=np.float64), nan=0.0
                ).astype(np.int64)
            else:
                fnid = np.zeros(n, dtype=np.int64)
            positions = {
                t: pdf[c].to_numpy(dtype=object) for t, c in pos_col.items()
            }
            view = FieldView(
                n=n, fieldnorm_id=fnid, tf=tf, positions=positions,
                df=df_stats, tf_cache=cache,
            )
            ctx = EvalContext(
                n=n,
                views={"content": view},
                doc_count=doc_count,
                meta={m: pdf[m].to_numpy(dtype=object) for m in meta_list},
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


def ast_to_queryspec(ast):
    """Lower a prunable AST shape to a flat QuerySpec, else None.

    Convertible: single-field unboosted content Terms under one Boolean
    level (Must/Should/MustNot) or alone — including glob expansions that
    substituted a Should union at the root.  Phrases, metadata leaves,
    boosts, All and nested booleans stay on the decode-and-score path.
    The conversion is score-exact: QuerySpec clause order (Must then
    Should) matches the kernel's aggregation order, and both paths score
    f32 ``weight * tf / (tf + norm)`` per clause occurrence."""
    from frankensearch_spark.operators.query import QuerySpec
    from frankensearch_spark.query_ast import (
        MUST,
        MUST_NOT,
        SHOULD,
        TEXT,
        Boolean,
        Term,
    )

    def term_of(q):
        if (
            isinstance(q, Term)
            and len(q.fields) == 1
            and q.fields[0].kind == TEXT
            and q.fields[0].name == "content"
            and float(q.fields[0].boost) == 1.0
        ):
            return q.text
        return None

    t = term_of(ast)
    if t is not None:
        return QuerySpec(should=[t])
    if not isinstance(ast, Boolean):
        return None
    spec = QuerySpec()
    for cl in ast.clauses:
        t = term_of(cl.query)
        if t is None:
            return None
        if cl.occur == MUST:
            spec.must.append(t)
        elif cl.occur == SHOULD:
            spec.should.append(t)
        elif cl.occur == MUST_NOT:
            spec.must_not.append(t)
        else:
            return None
    if not spec.must and not spec.should:
        return None  # pure-negative shapes need the All-repair path
    return spec


def serving_search_bits(index: ServingIndex, query, k: int = 10,
                        schema: ParserSchema = ENGINE_SCHEMA,
                        prune: bool = True):
    """Top-k bits over the durable index.  Prunable flat/boolean shapes
    take the block-max WAND path (rank-identical by the conservative-
    bound theorem, and cheaper: only buckets that can beat θ decode);
    everything else decodes-and-scores through the shared kernel."""
    ast = parse_lenient(query, schema).query if isinstance(query, str) else query
    from frankensearch_spark.operators.astexec import expand_globs

    expanded = expand_globs(index, ast)
    if prune:
        spec = ast_to_queryspec(expanded)
        if spec is not None:
            from frankensearch_spark.operators.wand import wand_topk

            return [
                (int(d), int(np.float32(s).view(np.uint32)))
                for d, s in wand_topk(index, spec, k)
            ]
    rows = (
        serving_score_ast(index, expanded, schema)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .collect()
    )
    return [
        (int(r["docid"]), int(np.float32(r["score"]).view(np.uint32)))
        for r in rows
    ]
