"""Streaming exact deduplication over a document stream.

The streaming twin of ``driver_queries.q_dedup_exact``: documents arrive
on an unbounded stream; each row's content hashes to sha256 and only the
FIRST arrival of each distinct content emits (append mode — dedup emits
rows as they arrive, no window finalization wait).  The watermark bounds
the dedup state: a key's state is evicted once the watermark passes its
event time + delay, so state size is (arrival rate x watermark span),
not stream length — the property a 100-TB ingest needs.  The documented
tradeoff (pinned in the test): a duplicate arriving AFTER its
original's state was evicted re-emits; exact-once dedup holds only
within the watermark horizon.  Cross-horizon dedup is the batch job's
role (run ``dedup_batch`` over the landed table, or the driver's
``dedup_exact`` / ``near_dup_pairs`` pipeline).

Timezone contract: as with ``streaming/windows.py``, the watermark
column must be TIMESTAMP (with timezone), so an NTZ ``ts`` casts
through the session zone — pin ``spark.sql.session.timeZone`` (UTC on
clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    content_col: str = "content",
) -> DataFrame:
    """(docid, ts, content) stream -> first-arrival-per-content rows.

    Uses ``dropDuplicatesWithinWatermark`` keyed on the content sha256:
    exact duplicates within the watermark horizon are dropped; state for
    a key is evicted once the watermark passes (bounded state).  The
    emitted row keeps its arrival identity (docid, ts) plus the hash.
    """
    d = docs.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )
    return (
        d.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_sha"])
        .select("docid", "ts", "content_sha")
    )


def lsh_band_buckets_rowwise(
    docs: DataFrame,
    content_col: str = "content",
    n_seeds: int = 12,
    n_bands: int = 4,
) -> DataFrame:
    """Per-ROW shingle → MinHash → LSH band buckets: (input cols…, band,
    bucket) with one output row per band.

    The batch near-dup pipeline (`driver_queries._near_dup_pairs_df`)
    derives the same values through explode + groupBy aggregates; this
    twin computes them inside a single projection — `transform` over the
    token array, `array_min` per seed, `md5(sorted band triple)` — so it
    is STREAM-SAFE (no shuffle, no state) and whole-stage-codegen on a
    batch DataFrame.  Equality with the aggregate path is pinned in
    tests (min over exploded duplicates == min over the distinct set).

    Docs with fewer than 3 tokens have no shingles and therefore NO
    bucket rows (matching the batch pipeline, where explode of an empty
    shingle set drops the doc) — they can never be near-dup candidates.
    """
    toks = F.filter(
        F.split(F.lower(F.col(content_col)), "[^0-9a-z]+"),
        lambda x: x != F.lit(""),
    )
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    per_band = n_seeds // n_bands

    def _minhash(seed: int):
        # NOTE: the hash lambda must stay UNARY — F.transform hands a
        # 2-parameter lambda (element, index), so a `s=s` default arg
        # would silently receive the element index instead of the seed
        return F.array_min(
            F.transform(
                shingles,
                lambda x: F.md5(F.concat_ws("#", x, F.lit(str(seed)))),
            )
        )

    mh = [_minhash(s) for s in range(n_seeds)]
    buckets = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.sort_array(
                            F.array(*mh[b * per_band : (b + 1) * per_band])
                        ),
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    out = docs.withColumn(
        "_bb",
        F.when(F.size(toks) >= 3, buckets).otherwise(
            F.array().cast("array<struct<band:int,bucket:string>>")
        ),
    )
    return (
        out.select("*", F.explode("_bb").alias("_b"))
        .select(*docs.columns, F.col("_b.band").alias("band"),
                F.col("_b.bucket").alias("bucket"))
    )


def near_dup_candidates_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    content_col: str = "content",
) -> DataFrame:
    """Streaming LSH near-dup candidate filter: emits only FIRST-SEEN
    (band, bucket) rows within the watermark horizon.

    A document all of whose band buckets emit is LSH-novel; one whose
    buckets were (partly) absorbed by earlier docs is a near-dup
    CANDIDATE — at 100 TB this is the streaming front of the dedup
    pipeline (the exact-Jaccard verify stays a batch join over landed
    candidates, as in `near_dup_pairs`).  The bucket signature per row
    is computed with the stream-safe row-wise projection above (no
    shuffle); the only state is the first-seen bucket set, evicted past
    the watermark like `dedup_stream`.
    """
    b = lsh_band_buckets_rowwise(
        docs.withColumn("ts", F.col("ts").cast("timestamp")),
        content_col=content_col,
    )
    return (
        b.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["band", "bucket"])
        .select("docid", "ts", "band", "bucket")
    )


def dedup_batch(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic batch twin: one row per distinct content, the
    (ts, docid)-minimal arrival (plain ``dropDuplicates`` keeps an
    arbitrary row; a per-key window keeps the law engine-independent).
    Single hash-partitioned window per content key — linear, no global
    sort."""
    d = docs.withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("content_sha").orderBy(F.asc("ts"), F.asc("docid"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("docid", "ts", "content_sha")
    )
