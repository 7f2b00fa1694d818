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

import threading

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


def _interval_keep_mask(pdf: pd.DataFrame, wl: np.ndarray,
                        shift: int) -> np.ndarray:
    """True for block rows whose docid interval CAN intersect the sorted
    whitelist ``wl`` — the phrase candidate restriction applied at block-
    METADATA level, before any decode (round 4; argus.rs:4474-4520 skips
    at the same granularity).

    Within one (term, bucket) group, blocks partition the term's sorted
    posting stream, so block ``i`` covers ``[first_doc_i,
    first_doc_{i+1} - 1]`` (last block: the bucket's end).  A group
    split across Arrow chunks only OVERESTIMATES the last visible
    block's end (bucket end instead of the true next first_doc) — keeps
    a superset, never drops a block holding a whitelisted doc."""
    n = len(pdf)
    keep = np.zeros(n, dtype=bool)
    if wl.size == 0:
        return keep
    fd = pdf["first_doc"].to_numpy(dtype=np.int64)
    for (_t, b), idx in pdf.groupby(["term", "bucket"], sort=False).indices.items():
        fds = fd[idx]
        order = np.argsort(fds, kind="stable")
        ends = np.empty(len(idx), dtype=np.int64)
        ends[order[:-1]] = fds[order[1:]] - 1
        ends[order[-1]] = ((int(b) + 1) << shift) - 1
        lo = np.searchsorted(wl, fds, side="left")
        hi = np.searchsorted(wl, ends, side="right")
        keep[idx] = hi > lo
    return keep


def blocks_to_postings(
    index: ServingIndex, terms: list[str] | None, with_positions: bool = False,
    docid_whitelist=None, local_whitelist_terms: list[str] | None = None,
) -> DataFrame:
    """Decode the candidate blocks of ``terms`` into posting rows
    (docid, term, tf, fieldnorm_id[, positions]) — parquet-pruned by
    tpart + term.  ``terms=None`` decodes the WHOLE block store (the
    serving->builder reconstruction path).  Positions are NOT decoded
    here: the sidecar is sliced into per-posting LEB128 buffers
    (``binary``), so they stay compressed through the pivot exchange and
    the phrase kernel decodes only the candidate cells it actually
    scores.

    ``docid_whitelist``: sorted int64 numpy array shipped to executors
    as a broadcast — only those docids' postings are emitted (and only
    their positions sliced), the root-phrase candidate restriction.

    ``local_whitelist_terms``: the SCALE form of the same restriction —
    instead of collecting the rare-slot docids to the driver (a >500k
    collect+broadcast costs more than it saves, and at 100-TB scale is
    a driver OOM), the candidate blocks are cogrouped BY BUCKET with the
    rare-slot terms' blocks, and each bucket task decodes its own local
    whitelist before decoding anything else.  Valid because bucket =
    docid >> shift: a doc's rare-slot postings live in exactly the
    bucket of its other postings.  No driver materialization, no
    broadcast, one exchange of still-compressed block rows."""
    if terms is None:
        cand = index.blocks
    else:
        tparts = sorted(
            {term_partition(t, index.n_term_partitions) for t in terms}
        )
        cand = index.blocks.filter(
            F.col("tpart").isin(tparts) & F.col("term").isin(terms)
        )
    if not with_positions:
        # non-phrase decodes never touch the positions sidecar: prune
        # pos_bytes (the heaviest block column) so the parquet scan
        # skips its pages entirely
        cand = cand.select(
            *[c for c in cand.columns if c != "pos_bytes"]
        )
    shift = index.bucket_shift
    bc = None
    if docid_whitelist is not None:
        from pyspark.broadcast import Broadcast

        if isinstance(docid_whitelist, Broadcast):
            bc = docid_whitelist
        else:
            bc = index.blocks.sparkSession.sparkContext.broadcast(
                np.unique(np.asarray(docid_whitelist, dtype=np.int64))
            )

    def decode_one(pdf: pd.DataFrame, wl) -> pd.DataFrame | None:
        if len(pdf) == 0:
            return None
        if wl is not None:
            # block-interval pruning (round 4): a block whose docid
            # interval cannot intersect the whitelist never decodes at
            # all — for a mega-term slot, decode cost drops from "every
            # posting block" to "blocks actually covering candidate
            # docs".  Metadata-only, bit-transparent: the per-posting
            # whitelist filter inside decode_blocks_pdf would drop every
            # posting of a skipped block anyway.
            pdf = pdf[_interval_keep_mask(pdf, wl, shift)]
            if len(pdf) == 0:
                return None
        out = decode_blocks_pdf(
            pdf, shift,
            with_positions="vbyte" if with_positions else False,
            docid_whitelist=wl,
        )
        docids, tfs, fids, rows = out[:4]
        cols = {
            "docid": docids.astype(np.int64),
            "term": pdf["term"].to_numpy(dtype=object)[rows],
            "tf": tfs.astype(np.int32),
            "fieldnorm_id": fids.astype(np.int32),
        }
        if with_positions:
            cols["positions"] = out[4]
        return pd.DataFrame(cols)

    schema = "docid long, term string, tf int, fieldnorm_id int"
    if with_positions:
        schema += ", positions binary"
    if local_whitelist_terms:
        # the rare-slot blocks are a SUBSET of the candidate blocks, so
        # one bucket-grouped pass suffices (no self-cogroup — Spark
        # cannot disambiguate a dataset cogrouped with itself): each
        # bucket task first decodes its local rare-slot docids (doc
        # stream only, positions untouched), then decodes everything
        # under that whitelist
        wl_terms = set(local_whitelist_terms)

        def empty_typed() -> pd.DataFrame:
            cols = {
                "docid": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int32),
                "fieldnorm_id": pd.Series([], dtype=np.int32),
            }
            if with_positions:
                cols["positions"] = pd.Series([], dtype=object)
            return pd.DataFrame(cols)

        def decode_grouped(pdf: pd.DataFrame) -> pd.DataFrame:
            rare_mask = pdf["term"].isin(wl_terms).to_numpy()
            if not rare_mask.any():
                # no rare-slot posting in this bucket: no doc here can
                # match the root phrase — emit nothing
                return empty_typed()
            d = decode_blocks_pdf(pdf[rare_mask], shift)[0]
            out = decode_one(pdf, np.unique(d))
            return empty_typed() if out is None else out

        return cand.groupBy("bucket").applyInPandas(decode_grouped, schema)

    def decode(pdfs):
        wl = bc.value if bc is not None else None
        for pdf in pdfs:
            out = decode_one(pdf, wl)
            if out is not None:
                yield out

    return cand.mapInPandas(decode, schema)


PHRASE_WL_CAP = 500_000  # rare-slot dfs above this skip the driver
# collect+broadcast and take the bucket-cogrouped local whitelist
_WL_CACHE_MAX = 32  # per-index cached rare-slot whitelists (FIFO evict)
_WL_CACHE_LOCK = threading.Lock()


def _rare_slot_whitelist(sub, rare_slot_terms: list[str], rare_df: int):
    """Broadcast whitelist of docids holding any rare-slot term, cached
    on the (immutable-snapshot) serving index.

    Concurrency (the bench's 8-thread FAIR-pool serving mode): cache
    mutations take a lock, and eviction UNPERSISTs (never destroys) —
    an in-flight or lazily-held plan that still references an evicted
    broadcast refetches it from the driver instead of failing with
    "used after destroy"; only executor copies are dropped eagerly.
    The whitelist-building collect runs OUTSIDE the lock (it is a Spark
    job); a concurrent miss on the same key keeps the first-registered
    broadcast and unpersists the duplicate."""
    key = tuple(sorted(rare_slot_terms))
    with _WL_CACHE_LOCK:
        cache = getattr(sub, "_phrase_wl_cache", None)
        if cache is None:
            cache = {}
            sub._phrase_wl_cache = cache
        bc = cache.get(key)
    if bc is not None:
        return bc
    if rare_df == 0:
        ids = np.empty(0, dtype=np.int64)
    else:
        pdf = (
            blocks_to_postings(sub, rare_slot_terms)
            .select("docid")
            .distinct()
            .toPandas()
        )
        ids = np.unique(pdf["docid"].to_numpy(dtype=np.int64))
    bc = sub.blocks.sparkSession.sparkContext.broadcast(ids)
    with _WL_CACHE_LOCK:
        race = cache.get(key)
        drop = []
        if race is not None:
            drop.append(bc)
            bc = race
        else:
            cache[key] = bc
            while len(cache) > _WL_CACHE_MAX:
                drop.append(cache.pop(next(iter(cache))))
    for old in drop:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # context already cleaned up
    return bc


def _serving_fields(index):
    # shared duck-typing rule with the pruned executor — one definition
    from frankensearch_spark.operators.wand import _wand_fields

    return _wand_fields(index)


def _phrase_fields(ast) -> list[str]:
    """TEXT field names referenced by position-requiring (Phrase)
    leaves only — the scope of the positions capability check."""
    from frankensearch_spark.query_ast import (
        TEXT,
        Boolean,
        Boost,
        Phrase,
    )

    out: list[str] = []

    def collect(node) -> None:
        if isinstance(node, Phrase):
            for f in node.fields:
                if f.kind == TEXT and f.name not in out:
                    out.append(f.name)
        elif isinstance(node, Boolean):
            for c in node.clauses:
                collect(c.query)
        elif isinstance(node, Boost):
            collect(node.query)

    collect(ast)
    return out


def serving_score_ast(
    index, query, schema: ParserSchema = ENGINE_SCHEMA
) -> DataFrame:
    """(docid, score) over the compressed index via the shared kernel.

    Handles single-field ServingIndex and multi-field ServingMultiIndex
    (the durable content + title^2 shape): one tf/positions pivot per
    queried field from that field's blocks, full-outer joined on docid,
    each field scored with its own df/avgdl/fieldnorms — mirroring the
    primary executor, so served bits equal in-memory bits."""
    fidx, primary = _serving_fields(index)
    spark = primary.blocks.sparkSession
    empty = spark.createDataFrame([], "docid long, score float")
    ast = parse_lenient(query, schema).query if isinstance(query, str) else query
    from frankensearch_spark.operators.astexec import expand_globs

    ast = expand_globs(index, ast)  # duck-typed over .termstats

    leaves = walk_leaf_terms(ast)
    phrase_terms = [t for t, needs_pos in leaves if needs_pos]
    from frankensearch_spark.query_ast import (
        contains_all_node,
        walk_text_fields,
    )

    qfields = [f for f in walk_text_fields(ast) if f in fidx]
    if phrase_terms:
        # capability check scoped to the fields of PHRASE leaves only:
        # a non-phrase field persisted without positions must not block
        # a query whose phrases never touch it (query.rs:699-752 checks
        # per-field capability, not query-wide)
        for f in _phrase_fields(ast):
            if f in fidx and not fidx[f].has_positions:
                raise ValueError(
                    f"phrase queries need positions; field {f!r} was "
                    "persisted without the pos_bytes sidecar "
                    "(rebuild/save with with_positions=True)"
                )
    has_all = contains_all_node(ast)
    meta_fields = walk_metadata_fields(ast)
    terms = [t for t, _ in leaves]
    if not terms and not has_all:
        return empty

    doc_count, _tt = primary.stats()
    if doc_count == 0:
        return empty
    field_df: dict[str, dict[str, int]] = {}
    field_cache: dict[str, np.ndarray] = {}
    for f in qfields:
        sub = fidx[f]
        field_df[f] = sub.df_of_terms(terms)
        _n, total_tokens = sub.stats()
        field_cache[f] = compute_tf_cache(
            compute_avgdl(total_tokens, doc_count)
        )

    # Root-phrase candidate restriction: when the WHOLE query is one
    # phrase (possibly boosted), a scoring doc must contain every slot —
    # so the per-field pivot can be semi-joined down to docs holding the
    # RAREST slot's terms before any positions ride the exchange.  A
    # "foo bar"-style phrase whose first term is a mega-term then ships
    # ~df(rarest) rows instead of ~df(largest).  Rank-safe: docs dropped
    # here can never have phrase freq > 0 in that field.
    root = ast
    from frankensearch_spark.query_ast import Boost, Phrase

    while isinstance(root, Boost):
        root = root.query
    rare_slot_terms: list[str] | None = None
    if isinstance(root, Phrase) and phrase_terms:
        from frankensearch_spark.kernel import _phrase_slots

        slots = _phrase_slots(root)
        if len(slots) >= 2:
            all_df = {}
            for f in qfields:
                for t, d in field_df[f].items():
                    all_df[t] = all_df.get(t, 0) + d
            rare_slot_terms = min(
                (s[1] for s in slots),
                key=lambda ts: sum(all_df.get(t, 0) for t in ts),
            )

    base = None
    tf_col: dict[tuple[str, str], str] = {}
    pos_col: dict[tuple[str, str], str] = {}
    fn_col: dict[str, str] = {}
    for fi, f in enumerate(qfields):
        if not terms:
            continue
        rare_df_f = (
            sum(field_df[f].get(t, 0) for t in rare_slot_terms)
            if rare_slot_terms is not None
            else None
        )
        # cap: past ~500k candidate docids the collect+broadcast costs
        # more than the position slices it saves (and at 100-TB scale
        # would be a driver OOM) — switch to the bucket-cogrouped LOCAL
        # whitelist below instead of the old full pivot
        if rare_df_f is not None and rare_df_f <= PHRASE_WL_CAP:
            # one cheap tf-only decode of the rarest slot -> its docid
            # set rides to executors as a broadcast whitelist, so the
            # mega-terms' postings (and especially their per-posting
            # position slices) are never materialized for docs that
            # cannot match the phrase.  Whitelists are cached per
            # (field index, slot terms) with bounded eviction —
            # repeated phrases in a long-lived process skip the collect
            # job AND broadcasts never accumulate unboundedly.
            bc = _rare_slot_whitelist(fidx[f], rare_slot_terms, rare_df_f)
            postings = blocks_to_postings(
                fidx[f], terms, with_positions=True, docid_whitelist=bc
            )
        elif rare_df_f is not None:
            # beyond the whitelist cap: same candidate restriction at
            # BUCKET granularity, decoded task-locally (no driver
            # collect, no broadcast — the 100-TB mega-phrase path); a
            # bucket without the rare slot emits nothing at all
            postings = blocks_to_postings(
                fidx[f], terms, with_positions=True,
                local_whitelist_terms=rare_slot_terms,
            )
        else:
            ph = [t for t in terms if t in set(phrase_terms)]
            nonph = [t for t in terms if t not in set(phrase_terms)]
            if ph and nonph:
                # positions decode ONLY for the phrase terms (the
                # bucket lane's rule, batchexec): a mixed non-root-
                # phrase query ('+"foo bar" megaterm') must not scan
                # the mega term's pos_bytes pages nor slice a LEB128
                # buffer per posting that the phrase kernel never
                # reads — the position pivot below filters to
                # phrase_terms anyway
                postings = blocks_to_postings(
                    fidx[f], ph, with_positions=True
                ).unionByName(
                    blocks_to_postings(
                        fidx[f], nonph, with_positions=False
                    ).withColumn(
                        "positions", F.lit(None).cast("binary")
                    )
                )
            else:
                postings = blocks_to_postings(
                    fidx[f], terms, with_positions=bool(phrase_terms)
                )
        tcols = [f"f{fi}t{j}" for j in range(len(terms))]
        pivot = (
            postings.groupBy("docid", "fieldnorm_id")
            .pivot("term", terms)
            .agg(F.first("tf"))
            .toDF("docid", f"fn{fi}", *tcols)
        )
        fn_col[f] = f"fn{fi}"
        for j, t in enumerate(terms):
            tf_col[(f, t)] = tcols[j]
        if phrase_terms:
            pcols = [f"f{fi}p{j}" for j in range(len(phrase_terms))]
            ppivot = (
                postings.filter(F.col("term").isin(phrase_terms))
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
        # every text leaf references a field absent from this index (or
        # the query has no text leaves at all): nothing can score —
        # return empty instead of crashing, matching the pruned path's
        # [] for the same shapes
        return empty

    extra_meta = [c for c in meta_fields if c not in ("docid", "doclen")]
    needs_doclen = "doclen" in meta_fields
    docmeta = primary.docmeta
    if has_all:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + extra_meta
        meta = docmeta.select(*sel)
        base = meta if base is None else meta.join(base, "docid", "left")
    elif extra_meta or needs_doclen:
        sel = ["docid"] + (["doclen"] if needs_doclen else []) + extra_meta
        base = base.join(docmeta.select(*sel), "docid", "left")
    tombstones = primary.tombstones
    if tombstones is not None:
        base = base.join(tombstones.select("docid"), "docid", "left_anti")
    from frankensearch_spark.operators.astexec import apply_metadata_pushdown

    base = apply_metadata_pushdown(base, ast)

    meta_list = list(meta_fields)
    basic_of = {f.name: getattr(f, "basic", False) for f in schema.fields}
    qfields_b = list(qfields)

    def run(batches):
        from frankensearch_spark.kernel import EvalContext, FieldView, eval_query

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
                if f in fn_col and fn_col[f] in pdf.columns:
                    fnid = np.nan_to_num(
                        pdf[fn_col[f]].to_numpy(dtype=np.float64), nan=0.0
                    ).astype(np.int64)
                else:
                    fnid = np.zeros(n, dtype=np.int64)
                views[f] = FieldView(
                    n=n, fieldnorm_id=fnid, tf=tf, positions=positions,
                    df=field_df[f], tf_cache=field_cache[f],
                    basic=basic_of.get(f, False),
                )
            ctx = EvalContext(
                n=n,
                views=views,
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


def ast_to_queryspec_fields(ast):
    """Lower a prunable AST shape to ``(QuerySpec, term_fields)``, else
    None.  ``term_fields``: term -> ordered tuple of (field name, f32
    field boost) — the WAND kernels score each clause per field in this
    order, mirroring the kernel's ``_eval_term`` nesting exactly.

    Convertible: Terms over TEXT non-basic fields — single-field
    (``content`` queries) AND multi-field (the reference's default
    content + title^2 expansion, or explicit ``title:x`` scopes) —
    boosted or not (Boost chains fold into the spec's per-term boost in
    the kernel's exact f32 multiplication order), under one Boolean
    level (Must/Should/MustNot) or alone, including glob expansions
    that substituted a Should union at the root.  Phrases, metadata
    leaves, All, nested booleans, basic (tf=1) fields, and terms with
    CONFLICTING boosts or field scopes stay on the decode-and-score
    path.  The conversion is score-exact: QuerySpec clause order (Must
    then Should) matches the kernel's aggregation order, and both paths
    score f32 ``weight * tf / (tf + norm)`` per (clause, field)."""
    from frankensearch_spark.operators.query import QuerySpec
    from frankensearch_spark.query_ast import (
        MUST,
        MUST_NOT,
        SHOULD,
        TEXT,
        Boolean,
        Boost,
        Term,
    )

    def term_of(q):
        """(term, f32 clause boost, fields tuple) for a TEXT-field Term
        (Boost chains folded step-by-step in f32, mirroring kernel
        eval), else None."""
        b = np.float32(1.0)
        while isinstance(q, Boost):
            b = np.float32(b * np.float32(q.factor))
            q = q.query
        if (
            isinstance(q, Term)
            and q.fields
            and all(f.kind == TEXT and not f.basic for f in q.fields)
        ):
            flds = tuple(
                (f.name, float(np.float32(f.boost))) for f in q.fields
            )
            return q.text, b, flds
        return None

    spec = QuerySpec()
    term_fields: dict = {}

    def add(t, b, flds, lst):
        # scope conflicts check against ANY earlier clause of the term —
        # including a MustNot, which records fields but no boost
        if t in term_fields and term_fields[t] != flds:
            return False  # conflicting field scopes: not per-term
        prev = spec.boosts.get(t)
        if prev is not None and np.float32(prev) != b:
            return False  # conflicting boosts: not expressible per-term
        spec.boosts[t] = float(b)
        term_fields[t] = flds
        lst.append(t)
        return True

    tb = term_of(ast)
    if tb is not None:
        add(tb[0], tb[1], tb[2], spec.should)
        return spec, term_fields
    if not isinstance(ast, Boolean):
        return None
    for cl in ast.clauses:
        tb = term_of(cl.query)
        if tb is None:
            return None
        t, b, flds = tb
        if cl.occur == MUST:
            ok = add(t, b, flds, spec.must)
        elif cl.occur == SHOULD:
            ok = add(t, b, flds, spec.should)
        elif cl.occur == MUST_NOT:
            ok = True
            spec.must_not.append(t)
            if t not in term_fields:
                term_fields[t] = flds
            elif term_fields[t] != flds:
                return None
        else:
            return None
        if not ok:
            return None
    if not spec.must and not spec.should:
        return None  # pure-negative shapes need the All-repair path
    return spec, term_fields


def ast_to_queryspec(ast):
    """Single-field (content) form of :func:`ast_to_queryspec_fields`:
    the flat QuerySpec alone, or None when the shape is unprunable or
    spans fields other than bare ``content``."""
    out = ast_to_queryspec_fields(ast)
    if out is None:
        return None
    spec, term_fields = out
    for t, flds in term_fields.items():
        if len(flds) != 1 or flds[0][0] != "content":
            return None
        # fold the field boost into the per-term boost (the historical
        # single-field contract: weight = w(df, N, clause_b * field_b))
        spec.boosts[t] = float(
            np.float32(np.float32(spec.boosts.get(t, 1.0))
                       * np.float32(flds[0][1]))
        )
    return spec


def serving_topk_plan(
    index, query, k: int = 10, schema: ParserSchema = ENGINE_SCHEMA,
) -> DataFrame:
    """The top-k as a LAZY DataFrame (docid long, score float) under the
    pinned total order — the composable form of
    :func:`serving_search_bits` for callers that fuse or join the
    lexical tier into a larger plan (engine.search_hybrid): everything
    downstream collects in ONE Spark action instead of
    collect -> createDataFrame -> second job.

    Single scored-clause shapes take the shuffle-free stream path
    (:func:`wand._single_term_stream_plan` — bit-exact, no bucket
    exchange); everything else decodes-and-scores through the shared
    kernel + TakeOrderedAndProject.  The multi-collect WAND θ ceremony
    cannot compose into one action, so prunable multi-term shapes run
    exhaustive here — rank-identical by the conservative-bound theorem
    (the pruned path's own invariant)."""
    ast = (
        parse_lenient(query, schema).query if isinstance(query, str) else query
    )
    from frankensearch_spark.operators.astexec import expand_globs

    expanded = expand_globs(index, ast)
    lowered = ast_to_queryspec_fields(expanded)
    if lowered is not None and index.tombstones is None:
        spec, term_fields = lowered
        from frankensearch_spark.operators.wand import (
            _prepare,
            _single_term_stream_plan,
            _wand_fields,
        )

        if not spec.must_not and len(spec.clause_terms()) == 1:
            prep = _prepare(index, spec, term_fields)
            if prep is not None:
                weights, tf_caches, _avgdls, cand, _stats, _tfo = prep
                if len(weights) == 1:
                    (fname, _t), w = next(iter(weights.items()))
                    _fidx, primary = _wand_fields(index)
                    return _single_term_stream_plan(
                        cand, w, tf_caches[fname], primary.bucket_shift, k
                    )
            else:
                spark = _wand_fields(index)[1].blocks.sparkSession
                return spark.createDataFrame([], "docid long, score float")
    return (
        serving_score_ast(index, expanded, schema)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def serving_search_collect(
    index, query, k: int = 10, offset: int = 0,
    schema: ParserSchema = ENGINE_SCHEMA, prune: bool = True,
) -> list:
    """[(docid, np.float32 score)] over the durable index — the loaded-
    engine analogue of ``astexec.search_ast_collect`` (same pinned total
    order; offset handled by over-fetching the prefix)."""
    bits = serving_search_bits(index, query, k + offset, schema, prune)
    out = [
        (int(d), np.uint32(b).view(np.float32)) for d, b in bits
    ]
    return out[offset : offset + k]


def serving_search_bits(index: ServingIndex, query, k: int = 10,
                        schema: ParserSchema = ENGINE_SCHEMA,
                        prune: bool = True):
    """Top-k bits over the durable index.  Prunable flat/boolean shapes
    take the block-max WAND path (rank-identical by the conservative-
    bound theorem, and cheaper: only buckets that can beat θ decode);
    everything else — nested booleans, phrases, mixed shapes — executes
    through the batch bucket lane as a batch of ONE (round 4): the
    query's candidate blocks cross one docid-colocating exchange still
    compressed and decode exactly once, instead of the old
    decode→explode→pivot chain (second exchange of decoded posting
    rows + a per-term pivot).  Measured at 2M docs warm: nested boolean
    7.7 → 1.6 s, mega-phrase 3.2 → 1.9 s, bit-identical (the batch
    path's parity with single-query execution is pinned by
    test_batchexec and the random-grammar fuzz).  All/metadata shapes
    fall back to the decode-and-score pivot inside the batch executor
    itself."""
    ast = parse_lenient(query, schema).query if isinstance(query, str) else query
    from frankensearch_spark.operators.astexec import expand_globs

    expanded = expand_globs(index, ast)
    if prune:
        out = ast_to_queryspec_fields(expanded)
        if out is not None:
            spec, term_fields = out
            from frankensearch_spark.operators.wand import wand_topk

            return [
                (int(d), int(np.float32(s).view(np.uint32)))
                for d, s in wand_topk(index, spec, k,
                                      term_fields=term_fields)
            ]
        from frankensearch_spark.operators.batchexec import (
            search_batch_collect,
        )

        hits = search_batch_collect(index, [expanded], k, schema)[0]
        return [
            (int(d), int(np.float32(s).view(np.uint32))) for d, s in hits
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
