"""Vectorized tokenizer UDFs (Arrow batch transfer — the reference's SIMD
tokenizer analogue, SURVEY.md T1/T2: vectorization comes from Arrow+numpy,
no per-row Python at the Spark boundary).

The hot path is :func:`frankensearch_spark.analyze.tokenize_fast`, shared
verbatim with the oracle so the Spark and oracle token streams cannot
diverge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from frankensearch_spark.analyze import tokenize_code_aware, tokenize_fast

TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )
)


@pandas_udf(TOKEN_SCHEMA)
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """content -> array<struct<term,pos>> (admitted tokens, gapped positions)."""
    return texts.map(lambda s: tokenize_fast(s) if s is not None else [])


@pandas_udf(TOKEN_SCHEMA)
def tokenize_code_aware_udf(texts: pd.Series) -> pd.Series:
    """Default stream + camelCase sub-tokens (north-star code-aware stage)."""
    return texts.map(lambda s: tokenize_code_aware(s) if s is not None else [])


@pandas_udf(T.IntegerType())
def doclen_udf(texts: pd.Series) -> pd.Series:
    """Admitted-token count per document (fieldnorm source, scribe.rs:186)."""
    return texts.map(lambda s: len(tokenize_fast(s)) if s is not None else 0).astype(
        "int32"
    )


def tokens_col(content_col: str = "content", code_aware: bool = False):
    fn = tokenize_code_aware_udf if code_aware else tokenize_udf
    return fn(F.col(content_col))
