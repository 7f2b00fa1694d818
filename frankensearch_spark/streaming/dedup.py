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
