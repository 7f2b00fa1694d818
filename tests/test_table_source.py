"""Corpus-table front door: parquet branch end-to-end + schema contract."""

import os

import pytest

from frankensearch_spark.sources.corpus import synthetic_corpus_df
from frankensearch_spark.sources.table import (
    read_corpus_table,
    validate_corpus_schema,
)


def test_parquet_ref_round_trip(spark, tmp_path):
    src = synthetic_corpus_df(spark, 30, partitions=2)
    dest = str(tmp_path / "corpus")
    src.write.parquet(dest)
    for ref in (dest, f"parquet:{dest}"):
        df = read_corpus_table(spark, ref)
        assert df.count() == 30
        assert set(df.columns) >= {"repo", "path", "commit", "lang", "content"}


def test_missing_columns_fail_loudly(spark):
    bad = spark.createDataFrame([(1, "x")], "repo int, body string")
    with pytest.raises(ValueError, match="missing columns"):
        validate_corpus_schema(bad)


def test_non_string_content_rejected(spark):
    bad = spark.createDataFrame(
        [("r", "p", "c", "l", 7)],
        "repo string, path string, commit string, lang string, content int",
    )
    with pytest.raises(ValueError, match="must be string"):
        validate_corpus_schema(bad)


def test_custom_content_col_accepted(spark):
    df = spark.createDataFrame(
        [("r", "p", "c", "l", "some code")],
        "repo string, path string, commit string, lang string, body string",
    )
    assert validate_corpus_schema(df, content_col="body") is df


def test_bare_existing_dir_reads_parquet(spark, tmp_path, monkeypatch):
    src = synthetic_corpus_df(spark, 8, partitions=1)
    dest = tmp_path / "barecorpus"
    src.write.parquet(str(dest))
    monkeypatch.chdir(tmp_path)
    assert read_corpus_table(spark, "barecorpus").count() == 8


def test_catalog_ref_dispatches_to_table(spark, tmp_path):
    src = synthetic_corpus_df(spark, 10, partitions=1)
    src.createOrReplaceTempView("corpus_view_t")
    df = read_corpus_table(spark, "corpus_view_t")
    assert df.count() == 10
