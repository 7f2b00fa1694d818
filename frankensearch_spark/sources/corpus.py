"""Corpus sources: synthetic source-code corpus + driver testdata adapter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frankensearch_spark.corpus import make_corpus

CORPUS_KEY = ["repo", "path", "commit"]
CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def synthetic_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """The BASELINE.json input_hint table, synthesized deterministically."""
    df = spark.createDataFrame(make_corpus(n_docs, seed), schema=CORPUS_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def load_documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents.parquet``
    (doc_id, text, lang, source, n_chars) to the engine's corpus shape.
    ``doc_id`` is already a unique long — it becomes the global docid
    directly (no ordering pass needed)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("docid"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("HEAD").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
