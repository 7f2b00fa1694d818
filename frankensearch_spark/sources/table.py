"""Corpus-table ingestion front door (SURVEY.md S1 — the
``spark.read.format("iceberg")`` mapping of ``QuillIndex::
index_documents``, quill/index.rs:9119).

The engine's input contract is the BASELINE input_hint table

    (repo string, path string, commit string, lang string, content string)

delivered either as an Iceberg catalog table (the production shape: time
travel, snapshot isolation, partition pruning all come from the table
format) or as a plain Parquet directory (the sandbox/test shape — this
container ships no Iceberg runtime jars, so that branch is exercised by
tests and the Iceberg branch is a thin, documented dispatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def validate_corpus_schema(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Check the input-table contract: key + content columns present,
    content is a string column.  Raises with the full expected shape so
    misconfigured catalogs fail loudly at plan time, not mid-build."""
    required = [
        c for c in CORPUS_COLUMNS if c != "content"
    ] + [content_col]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus table is missing columns {sorted(set(missing))}; "
            f"expected at least (repo, path, commit, lang, content) — "
            f"got {df.columns}"
        )
    kind = dict(df.dtypes)[content_col]
    if kind != "string":
        raise ValueError(
            f"corpus column {content_col!r} must be string, got {kind}"
        )
    return df


def read_corpus_table(
    spark: SparkSession, ref: str, content_col: str = "content"
) -> DataFrame:
    """Load the corpus from a table reference:

    * ``iceberg:catalog.db.tbl`` (or any bare ``a.b.c`` name when an
      Iceberg catalog is configured) -> ``spark.read.format("iceberg")``
      — snapshot-isolated scan; filter/partition pruning pushes into the
      table format.
    * ``parquet:/path`` or a filesystem path -> ``spark.read.parquet``.

    Either way the result is schema-validated against the engine's
    input contract before any build runs."""
    import os

    if ref.startswith("iceberg:"):
        df = spark.read.format("iceberg").load(ref[len("iceberg:"):])
    elif ref.startswith("parquet:"):
        # same Python-cwd normalization as bare paths: Spark resolves
        # relative paths against the JVM cwd, which may differ
        p = ref[len("parquet:"):]
        if "://" not in p and not os.path.isabs(p):
            p = os.path.abspath(p)
        df = spark.read.parquet(p)
    elif "/" in ref:
        # relative path -> resolve against the PYTHON cwd (Spark
        # resolves relative paths against the JVM cwd, which may
        # differ); URIs and absolute paths pass through untouched
        if "://" not in ref and not os.path.isabs(ref):
            ref = os.path.abspath(ref)
        df = spark.read.parquet(ref)
    elif os.path.exists(ref):
        # bare existing directory name: same cwd rule
        df = spark.read.parquet(os.path.abspath(ref))
    else:
        # bare dotted name — an Iceberg/catalog table identifier
        df = spark.read.table(ref)
    return validate_corpus_schema(df, content_col)
