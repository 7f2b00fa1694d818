"""Differential check: fused zero-shuffle postings == groupBy reference path."""

from frankensearch_spark.operators.build import (
    assign_docids,
    build_postings,
    build_postings_fused,
    build_token_rows,
)
from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df


def canon(df):
    rows = df.collect()
    return sorted(
        (
            r["docid"],
            r["term"],
            r["tf"],
            tuple(r["positions"]),
            r["doclen"],
        )
        for r in rows
    )


def test_fused_equals_reference_postings(spark):
    corpus = assign_docids(
        synthetic_corpus_df(spark, 120, partitions=3), CORPUS_KEY
    )
    ref = build_postings(build_token_rows(corpus))
    fused = build_postings_fused(corpus)
    assert canon(fused) == canon(ref)


def test_sql_path_equals_arrow_postings(spark):
    """The pure-JVM codegen tokenizer emits the exact posting table of the
    reference Arrow tokenizer on the (ASCII) synthetic corpus."""
    from frankensearch_spark.operators.build import build_postings_sql

    corpus = assign_docids(
        synthetic_corpus_df(spark, 120, partitions=3), CORPUS_KEY
    )
    arrow = canon(build_postings_fused(corpus))
    sql = canon(build_postings_sql(corpus))
    assert sql == arrow


def test_fused_handles_empty_and_null_content(spark):
    corpus = spark.createDataFrame(
        [(0, "a b a"), (1, ""), (2, None), (3, "b")],
        "docid long, content string",
    )
    rows = canon(build_postings_fused(corpus))
    assert rows == [
        (0, "a", 2, (0, 2), 3),
        (0, "b", 1, (1,), 3),
        (3, "b", 1, (0,), 1),
    ]
