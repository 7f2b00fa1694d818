"""Batched top-k execution: MANY queries per Spark job.

Single-query serving pays Spark's fixed per-job constant (~150-250 ms of
scheduling + exchange setup, measured in BENCH.md §3) once PER QUERY —
the FAIR-pool concurrent arm only overlaps those constants (~3×).  A
real cluster serving a query stream amortizes them instead: this module
executes a BATCH of parsed queries in ONE job that

* scans/decodes each queried field's postings ONCE, filtered to the
  UNION of all batch terms (parquet tpart/term pruning still applies —
  the scan reads exactly the union's blocks, not the store);
* pivots candidates ONCE per field (one shuffle per field, same as a
  single query: batch size multiplies the row count, not the plan);
* evaluates EVERY query's AST over the shared candidate batch inside
  the one mapInPandas kernel pass (numpy-vectorized per query), with a
  per-query support mask restricting each query to the docs its own
  single-query plan would have seen;
* emits a per-partition local top-k per query, so the only extra
  exchange is a (batch × k × partitions)-row window for the global cut.

Bit parity with the single-query executors is structural: same pivots,
same FieldView/EvalContext construction, same kernel, same (score DESC,
docid ASC) total order.  A doc that candidates only because of ANOTHER
query's terms contributes tf=0 to every leaf of this query, scores 0,
and is mask-excluded — and the support mask removes the remaining
candidate-set difference (pure-NOT / metadata-only subtrees that could
match docs the single-query pivot never materializes).

Reference parity note: the reference serves one query per call
(quill/argus.rs); batching is the Spark-idiomatic throughput shape the
north rule's cluster setting implies, not a reference operator.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.contract import compute_avgdl, compute_tf_cache
from frankensearch_spark.query_ast import (
    ENGINE_SCHEMA,
    ParserSchema,
    Query,
    contains_all_node,
    walk_leaf_terms,
    walk_metadata_fields,
    walk_text_fields,
)


@dataclass
class _QuerySpecB:
    qid: int
    ast: Query
    terms: list[str]
    qfields: list[str]
    has_all: bool


def _prepare(index, queries, schema: ParserSchema):
    """Parse/expand/validate every query; return (specs, union sets)."""
    from frankensearch_spark.operators.astexec import (
        _as_ast,
        _field_indexes,
        expand_globs,
    )

    fidx, primary = _field_indexes(index)
    specs: list[_QuerySpecB] = []
    u_terms: set[str] = set()
    u_phrase: set[str] = set()
    u_fields: set[str] = set()
    u_meta: set[str] = set()
    for qid, q in enumerate(queries):
        ast = expand_globs(index, _as_ast(q, schema))
        leaves = walk_leaf_terms(ast)
        has_all = contains_all_node(ast)
        meta_fields = walk_metadata_fields(ast)
        for mf in meta_fields:
            if mf not in primary.docmeta.columns:
                raise ValueError(
                    f"metadata field {mf!r} not present in docmeta "
                    f"(batch query #{qid})"
                )
        terms = [t for t, _ in leaves]
        if not terms and not has_all:
            continue  # single-query path returns empty: emit nothing
        phrase_terms = [t for t, needs_pos in leaves if needs_pos]
        qfields = [f for f in walk_text_fields(ast) if f in fidx]
        if phrase_terms:
            for f in qfields:
                sub = fidx[f]
                has_pos = (
                    sub.has_positions
                    if hasattr(sub, "has_positions")
                    else sub.positions is not None
                )
                if not has_pos:
                    raise ValueError(
                        f"phrase query on field {f!r} without positions "
                        f"(batch query #{qid})"
                    )
        specs.append(_QuerySpecB(qid, ast, terms, qfields, has_all))
        u_terms.update(terms)
        u_phrase.update(phrase_terms)
        u_fields.update(qfields)
        u_meta.update(meta_fields)
    return fidx, primary, specs, u_terms, u_phrase, u_fields, u_meta


def topk_ast_batch(
    index,
    queries,
    k: int = 10,
    schema: ParserSchema = ENGINE_SCHEMA,
) -> DataFrame:
    """(qid, docid, score) of each query's top-k, one Spark job.

    ``qid`` is the position in ``queries``.  Queries whose single-query
    execution would be empty (no text leaves and no All node, or all
    fields absent) simply emit no rows.  Works over both the in-memory
    BuiltIndex family and the durable ServingIndex family (duck-typed
    per field, exactly like the single-query executors)."""
    fidx, primary, specs, u_terms, u_phrase, u_fields, u_meta = _prepare(
        index, queries, schema
    )
    spark = primary.docmeta.sparkSession
    out_schema = "qid int, docid long, score float"
    empty = spark.createDataFrame([], out_schema)
    if not specs:
        return empty
    doc_count, _tt = primary.stats()
    if doc_count == 0:
        return empty

    terms = sorted(u_terms)
    phrase_terms = sorted(u_phrase)
    qfields = [f for f in fidx if f in u_fields]
    has_all_any = any(s.has_all for s in specs)

    field_df: dict[str, dict[str, int]] = {}
    field_cache: dict[str, np.ndarray] = {}
    for f in qfields:
        sub = fidx[f]
        field_df[f] = sub.df_of_terms(terms)
        _n, total_tokens = sub.stats()
        field_cache[f] = compute_tf_cache(
            compute_avgdl(total_tokens, doc_count)
        )

    base: DataFrame | None = None
    tf_col: dict[tuple[str, str], str] = {}
    pos_col: dict[tuple[str, str], str] = {}
    norm_col: dict[str, str] = {}
    serving_field: dict[str, bool] = {}
    for fi, f in enumerate(qfields):
        if not terms:
            continue
        sub = fidx[f]
        is_serving = hasattr(sub, "blocks")
        serving_field[f] = is_serving
        tcols = [f"f{fi}t{j}" for j in range(len(terms))]
        for j, t in enumerate(terms):
            tf_col[(f, t)] = tcols[j]
        norm_col[f] = f"nm{fi}"
        if is_serving:
            from frankensearch_spark.operators.serving_exec import (
                blocks_to_postings,
            )

            postings = blocks_to_postings(
                sub, terms, with_positions=bool(phrase_terms)
            )
            pivot = (
                postings.groupBy("docid", "fieldnorm_id")
                .pivot("term", terms)
                .agg(F.first("tf"))
                .toDF("docid", f"nm{fi}", *tcols)
            )
            pos_src = postings
        else:
            pivot = (
                sub.postings.filter(F.col("term").isin(terms))
                .groupBy("docid", "doclen")
                .pivot("term", terms)
                .agg(F.first("tf"))
                .toDF("docid", f"nm{fi}", *tcols)
            )
            pos_src = sub.positions
        if phrase_terms and pos_src is not None:
            pcols = [f"f{fi}p{j}" for j in range(len(phrase_terms))]
            ppivot = (
                pos_src.filter(F.col("term").isin(phrase_terms))
                .groupBy("docid")
                .pivot("term", phrase_terms)
                .agg(F.first("positions"))
                .toDF("docid", *pcols)
            )
            for j, t in enumerate(phrase_terms):
                pos_col[(f, t)] = pcols[j]
            pivot = pivot.join(ppivot, "docid", "left")
        base = (
            pivot if base is None else base.join(pivot, "docid", "full_outer")
        )

    if base is None and not has_all_any:
        return empty

    extra_meta = [c for c in u_meta if c not in ("docid", "doclen")]
    needs_doclen = "doclen" in u_meta
    if has_all_any:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + sorted(
            extra_meta
        )
        meta = primary.docmeta.select(*sel)
        base = meta if base is None else meta.join(base, "docid", "left")
    elif extra_meta or needs_doclen:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + sorted(
            extra_meta
        )
        base = base.join(primary.docmeta.select(*sel), "docid", "left")
    if primary.tombstones is not None:
        base = base.join(
            primary.tombstones.select("docid"), "docid", "left_anti"
        )
    # no metadata pushdown in batch: different queries carry different
    # predicates; the kernel re-checks every metadata leaf, so pushdown
    # is purely a single-query optimization

    meta_list = sorted(u_meta)
    basic_of = {fl.name: getattr(fl, "basic", False) for fl in schema.fields}
    specs_b = list(specs)
    qfields_b = list(qfields)
    k_b = int(k)

    def run(batches):
        from frankensearch_spark.contract import fieldnorm_to_id
        from frankensearch_spark.kernel import (
            EvalContext,
            FieldView,
            eval_query,
        )

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            views = {}
            for f in qfields_b:
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
                nm = norm_col.get(f)
                if nm is not None and nm in pdf.columns:
                    raw = np.nan_to_num(
                        pdf[nm].to_numpy(dtype=np.float64), nan=0.0
                    ).astype(np.int64)
                    fnid = (
                        raw
                        if serving_field[f]
                        else fieldnorm_to_id(raw).astype(np.int64)
                    )
                else:
                    fnid = np.zeros(n, dtype=np.int64)
                views[f] = FieldView(
                    n=n,
                    fieldnorm_id=fnid,
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
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            out_q, out_d, out_s = [], [], []
            for s in specs_b:
                mask, scores = eval_query(s.ast, ctx)
                if not s.has_all:
                    # restrict to the docs this query's OWN single-query
                    # pivot would contain: >=1 of its terms in >=1 of
                    # its fields
                    sup = np.zeros(n, dtype=bool)
                    for f in s.qfields:
                        v = views.get(f)
                        if v is None:
                            continue
                        for t in s.terms:
                            tfv = v.tf.get(t)
                            if tfv is not None:
                                sup |= tfv > 0
                    mask = mask & sup
                rows = np.nonzero(mask)[0]
                if rows.size == 0:
                    continue
                if rows.size > k_b:
                    # local top-k under the pinned total order
                    # (score DESC, docid ASC): lexsort's last key is
                    # primary
                    order = np.lexsort(
                        (docids[rows], -scores[rows].astype(np.float32))
                    )
                    rows = rows[order[:k_b]]
                out_q.append(np.full(rows.size, s.qid, dtype=np.int32))
                out_d.append(docids[rows])
                out_s.append(scores[rows])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "docid": np.concatenate(out_d),
                    "score": np.concatenate(out_s),
                }
            )

    scored = base.mapInPandas(run, out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("docid")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k_b)
        .drop("_rk")
    )


def search_batch_collect(
    index, queries, k: int = 10, schema: ParserSchema = ENGINE_SCHEMA
) -> list[list[tuple[int, np.float32]]]:
    """Per-query top-k hit lists, ONE job for the whole batch."""
    rows = topk_ast_batch(index, queries, k, schema).collect()
    out: list[list] = [[] for _ in queries]
    for r in rows:
        out[r["qid"]].append((int(r["docid"]), np.float32(r["score"])))
    for hits in out:
        hits.sort(key=lambda h: (-float(np.float32(h[1])), h[0]))
    return out
