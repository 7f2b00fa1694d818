"""Index-build dataflow (SURVEY.md §2.3 B1-B13, Spark-first).

The build is a declarative DataFrame pipeline; Catalyst supplies partial
(map-side) aggregation, shuffle, and pushdown.  Custom logic lives in three
Arrow-vectorized UDFs only: the tokenizer, the fieldnorm quantizer, and
(in :mod:`frankensearch_spark.operators.merge`) the posting-block codec.

Scale design notes (100 TB / 1000 executors):

* **Docid discipline** — the reference's invariant Q1 (global u32 docids,
  disjoint per-shard leases, quill/scribe.rs:77-83) maps to two modes:
  ``mode="global"`` uses a global ``row_number`` over the natural key
  (exact, parallelism-invariant; fine to ~10^8 rows), ``mode="lease"``
  range-partitions by the natural key and assigns
  ``partition_id * LEASE + local_ordinal`` — disjoint, never reused,
  monotone with the key, no global sort.
* **Skew** — posting-list construction groups by ``(term, docid bucket)``
  rather than bare ``term`` (quill/scribe.rs radix partition analogue,
  B4): the docid bucket is a *deterministic salt*, so the 'fn'/'import'
  mega-terms never concentrate on one task, and bucket-ordered
  concatenation reproduces the reference's concat-merge theorem (M2).
* **tf aggregation** — ``groupBy(term, docid)`` has near-unique keys and
  map-side combine; no salting needed there.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

DOC_ORDS_PER_LEASE = 1 << 33  # scale-mode lease width (Q1 analogue)


@pandas_udf(T.IntegerType())
def fieldnorm_id_udf(doclen: pd.Series) -> pd.Series:
    """Tantivy fieldnorm quantization (contract.rs:291-295), vectorized."""
    import numpy as np

    from frankensearch_spark.contract import fieldnorm_to_id

    return pd.Series(
        fieldnorm_to_id(doclen.to_numpy(dtype=np.int64)).astype("int32")
    )


def assign_docids(
    corpus: DataFrame, key_cols: list[str], mode: str = "global"
) -> DataFrame:
    """Deterministic, parallelism-invariant global docid (SURVEY.md B3)."""
    if mode == "global":
        w = Window.orderBy(*[F.col(c) for c in key_cols])
        return corpus.withColumn("docid", F.row_number().over(w).cast("long") - 1)
    if mode == "lease":
        ranged = corpus.repartitionByRange(*[F.col(c) for c in key_cols])
        w = Window.partitionBy(F.spark_partition_id()).orderBy(
            *[F.col(c) for c in key_cols]
        )
        return ranged.withColumn(
            "docid",
            F.spark_partition_id().cast("long") * F.lit(DOC_ORDS_PER_LEASE)
            + F.row_number().over(w).cast("long")
            - 1,
        )
    raise ValueError(f"unknown docid mode {mode!r}")


def build_docmeta(
    corpus_with_docid: DataFrame,
    key_cols: list[str],
    postings: DataFrame,
    content_col: str = "content",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """IDMAP + DOCLEN analogue (B10/B11): one row per document with the
    external key, the per-row content witness sha256 (quiver.rs:5824-5850
    analogue), the admitted-token doclen and its fieldnorm id, plus any
    extra keyword metadata columns (``meta_cols``; default: every
    non-key non-content column, e.g. ``lang``) so metadata query leaves
    (Range/Set/keyword Term, E8) can filter on them.

    doclen is recovered from the (persisted) postings rather than by
    re-tokenizing the corpus — tokenization is the build's dominant CPU
    cost and must run exactly once.  Docs with zero admitted tokens get
    doclen 0 via the left join (scribe.rs:1743 zero-fieldnorm rule)."""
    if meta_cols is None:
        skip = set(key_cols) | {content_col, "docid"}
        meta_cols = [c for c in corpus_with_docid.columns if c not in skip]
    lens = postings.groupBy("docid").agg(F.first("doclen").alias("doclen"))
    ids = corpus_with_docid.select(
        "docid",
        *key_cols,
        *meta_cols,
        F.sha2(F.col(content_col), 256).alias("content_sha256"),
    )
    return (
        ids.join(lens, "docid", "left")
        .withColumn("doclen", F.coalesce(F.col("doclen"), F.lit(0)))
        .withColumn("fieldnorm_id", fieldnorm_id_udf(F.col("doclen")))
    )


TOKEN_ROWS_SCHEMA = (
    "docid long, term string, pos int, doclen int"
)


def build_token_rows(
    corpus_with_docid: DataFrame, content_col: str = "content", code_aware: bool = False
) -> DataFrame:
    """(docid, term, pos, doclen) — the tokenize+explode projection (T1/B2).

    One ``mapInPandas`` pass: the tokenizer runs exactly once per document
    (an ``F.size`` + ``F.explode`` over the same UDF column gets re-inlined
    by Catalyst's project collapse into TWO tokenizer invocations — measured
    on the physical plan).  doclen rides along per token row (constant per
    doc, dictionary-encodes to ~nothing in shuffle files) so postings never
    need a docid-side join against DOCLEN at query time.
    """
    from frankensearch_spark.analyze import tokenize_code_aware, tokenize_fast

    tok_fn = tokenize_code_aware if code_aware else tokenize_fast

    def gen(batches):
        import numpy as np

        for pdf in batches:
            docids: list = []
            terms: list[str] = []
            poss: list[int] = []
            dls: list[int] = []
            for docid, content in zip(pdf["docid"], pdf[content_col]):
                toks = tok_fn(content) if content is not None else []
                n = len(toks)
                if n == 0:
                    continue
                docids.extend([docid] * n)
                terms.extend(t for t, _ in toks)
                poss.extend(p for _, p in toks)
                dls.extend([n] * n)
            yield pd.DataFrame(
                {
                    "docid": np.asarray(docids, dtype=np.int64),
                    "term": terms,
                    "pos": np.asarray(poss, dtype=np.int32),
                    "doclen": np.asarray(dls, dtype=np.int32),
                }
            )

    return corpus_with_docid.select("docid", content_col).mapInPandas(
        gen, TOKEN_ROWS_SCHEMA
    )


def build_postings(
    token_rows: DataFrame, with_positions: bool = True
) -> DataFrame:
    """(term, docid, tf, doclen, fieldnorm_id[, positions]) (B2/B5).

    Reference path from token rows; ``groupBy(term, docid)`` keys are
    near-unique so Catalyst's partial aggregation absorbs skewed terms
    before shuffle.  The production build uses the fused zero-shuffle
    :func:`build_postings_fused` — this one remains as the differential
    check (tests assert both produce identical postings).
    """
    aggs = [
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.first("doclen").alias("doclen"),
    ]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    out = token_rows.groupBy("term", "docid").agg(*aggs)
    return out.withColumn("fieldnorm_id", fieldnorm_id_udf(F.col("doclen")))


POSTINGS_SCHEMA = (
    "docid long, term string, tf int, positions array<int>, "
    "doclen int, fieldnorm_id int"
)


def build_postings_fused(
    corpus_with_docid: DataFrame,
    content_col: str = "content",
    code_aware: bool = False,
    with_positions: bool = True,
) -> DataFrame:
    """Fused tokenize→aggregate: one mapInPandas pass, ZERO shuffles.

    A (term, docid) posting is local to its document, and a document is
    local to its partition — so per-doc tf/positions aggregation never
    needs the cluster.  This is the Spark analogue of the reference's
    shard-local columnar accumulation (scribe.rs:2285-2900): the only
    wide exchanges left in the whole build are the small termstats agg
    and the merge job's repartition-by-term.

    Inner aggregation is vectorized numpy (factorize + lexsort +
    run-length boundaries), not per-token Python.
    """
    from frankensearch_spark.analyze import tokenize_code_aware, tokenize_fast
    from frankensearch_spark.contract import fieldnorm_to_id

    tok_fn = tokenize_code_aware if code_aware else tokenize_fast

    def gen(batches):
        import numpy as np

        for pdf in batches:
            doc_col: list = []
            term_col: list[str] = []
            pos_col: list[int] = []
            dl_col: list[int] = []
            for docid, content in zip(pdf["docid"], pdf[content_col]):
                toks = tok_fn(content) if content is not None else []
                n = len(toks)
                if n == 0:
                    continue
                doc_col.extend([docid] * n)
                term_col.extend(t for t, _ in toks)
                pos_col.extend(p for _, p in toks)
                dl_col.extend([n] * n)
            if not term_col:
                continue
            docids = np.asarray(doc_col, dtype=np.int64)
            poss = np.asarray(pos_col, dtype=np.int32)
            dls = np.asarray(dl_col, dtype=np.int32)
            codes, uniq_terms = pd.factorize(np.asarray(term_col, dtype=object))
            order = np.lexsort((poss, codes, docids))
            d_s, c_s, p_s, l_s = docids[order], codes[order], poss[order], dls[order]
            # run boundaries where (docid, term-code) changes
            change = np.empty(len(d_s), dtype=bool)
            change[0] = True
            change[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], len(d_s))
            tf = (ends - starts).astype(np.int32)
            out = {
                "docid": d_s[starts],
                "term": uniq_terms[c_s[starts]],
                "tf": tf,
                "positions": (
                    np.split(p_s, starts[1:])
                    if with_positions
                    else [None] * len(starts)
                ),
                "doclen": l_s[starts],
                "fieldnorm_id": fieldnorm_to_id(l_s[starts]).astype(np.int32),
            }
            yield pd.DataFrame(out)

    return corpus_with_docid.select("docid", content_col).mapInPandas(
        gen, POSTINGS_SCHEMA
    )


def build_termstats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — TERMDICT metadata analogue (B9).

    Pure count/sum aggregation: map-side combine makes the skewed terms a
    non-issue (each task contributes one partial row per term).
    """
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def build_fieldstats(docmeta: DataFrame) -> DataFrame:
    """(doc_count, total_tokens) — STATS section analogue (B12).

    Computed from the same table the postings were built from — df/N
    include tombstoned docs until compaction (argus.rs:1327-1344 rule).
    """
    return docmeta.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.coalesce(F.sum("doclen"), F.lit(0)).alias("total_tokens"),
    )


@dataclass
class BuiltIndex:
    """In-memory handle over the four index tables."""

    postings: DataFrame  # serving table: docid, term, tf, doclen, fieldnorm_id
    docmeta: DataFrame
    termstats: DataFrame
    fieldstats: DataFrame
    positions: DataFrame | None = None  # (docid, term, positions) — phrase path
    _cached_stats: tuple[int, int] | None = None

    def stats(self) -> tuple[int, int]:
        if self._cached_stats is None:
            row = self.fieldstats.collect()[0]
            self._cached_stats = (int(row["doc_count"]), int(row["total_tokens"]))
        return self._cached_stats


def build_index(
    corpus: DataFrame,
    key_cols: list[str],
    content_col: str = "content",
    docid_mode: str = "global",
    with_positions: bool = True,
    code_aware: bool = False,
    cache: bool = True,
) -> BuiltIndex:
    """Full batch build: corpus -> postings/docmeta/termstats/fieldstats.

    If the corpus already carries a ``docid`` column it is trusted as the
    global docid (e.g. the driver testdata's ``doc_id``)."""
    if "docid" in corpus.columns:
        with_docid = corpus
    else:
        with_docid = assign_docids(corpus, key_cols, docid_mode)
    postings_src = build_postings_fused(
        with_docid, content_col, code_aware, with_positions
    )
    positions = None
    if with_positions:
        # positions live outside the serving table: query scans must not
        # pay their deserialization (measured 2.4x scan cost otherwise)
        positions = postings_src.select("docid", "term", "positions")
        postings = postings_src.drop("positions")
    else:
        postings = postings_src
    if cache:
        postings = postings.persist()
    docmeta = build_docmeta(with_docid, key_cols, postings, content_col)
    if cache:
        docmeta = docmeta.persist()
    termstats = build_termstats(postings)
    fieldstats = build_fieldstats(docmeta)
    return BuiltIndex(postings, docmeta, termstats, fieldstats, positions)
