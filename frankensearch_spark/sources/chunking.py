"""fsfs chunking pipeline (SURVEY.md S6 — re-expression of
crates/frankensearch-fsfs/src/lexical_pipeline.rs:60-200).

Deterministic overlap chunking: windows of ``max_chars`` BYTES (floored
to UTF-8 char boundaries — the reference's field name says chars but the
pinned arithmetic is byte offsets), adjacent chunks overlap by
``overlap_chars`` bytes; token counts use the fsfs token class
``alnum | _ - . / :`` (lexical_pipeline.rs:304-313).

Spark shape: a per-document Arrow kernel emits the chunk array, then
``posexplode`` lands the FSFS_CHUNK_SCHEMA-style table
(id, parent_id, chunk_ordinal, byte_start, byte_end, content,
token_count — schema.rs:300-380).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_CHARS = 768  # lexical_pipeline.rs:70
DEFAULT_OVERLAP_CHARS = 96

_TOKEN_EXTRA = {"_", "-", ".", "/", ":"}


def is_token_char(ch: str) -> bool:
    return ch.isalnum() or ch in _TOKEN_EXTRA


def count_lexical_tokens(text: str) -> int:
    count = 0
    in_token = False
    for ch in text:
        if is_token_char(ch):
            in_token = True
        elif in_token:
            in_token = False
            count += 1
    return count + (1 if in_token else 0)


@dataclass(frozen=True)
class LexicalChunk:
    ordinal: int
    byte_start: int
    byte_end: int
    text: str
    token_count: int


def chunk_text(
    text: str,
    max_chars: int = DEFAULT_MAX_CHARS,
    overlap_chars: int = DEFAULT_OVERLAP_CHARS,
) -> list[LexicalChunk]:
    """Deterministic overlap chunking (lexical_pipeline.rs:112-163)."""
    if not text:
        return []
    b = text.encode("utf-8")
    n = len(b)
    max_chars = max(max_chars, 1)
    if overlap_chars < 0:
        # a negative overlap would SKIP bytes between chunks (silent
        # data loss in the indexed text) or run past the buffer
        raise ValueError(f"overlap_chars must be >= 0, got {overlap_chars}")
    overlap_chars = min(overlap_chars, max_chars - 1)

    chunks: list[LexicalChunk] = []
    start = 0
    ordinal = 0
    while start < n:
        raw_end = start + max_chars
        if raw_end >= n:
            end = n
        else:
            end = raw_end
            while end > 0 and (b[end] & 0xC0) == 0x80:
                end -= 1  # floor to char boundary
        if end <= start:
            end = min(raw_end, n)
            while end < n and (b[end] & 0xC0) == 0x80:
                end += 1  # ceil to char boundary
        if end <= start:
            break
        chunk = b[start:end].decode("utf-8")
        chunks.append(
            LexicalChunk(ordinal, start, end, chunk, count_lexical_tokens(chunk))
        )
        ordinal += 1
        if end == n:
            break
        next_start = end - overlap_chars
        while next_start > 0 and (b[next_start] & 0xC0) == 0x80:
            next_start -= 1
        if next_start <= start:
            next_start = end
        start = next_start
    return chunks


CHUNK_COLS_SCHEMA = (
    "array<struct<chunk_ordinal:int, byte_start:long, byte_end:long, "
    "content:string, token_count:long>>"
)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    max_chars: int = DEFAULT_MAX_CHARS,
    overlap_chars: int = DEFAULT_OVERLAP_CHARS,
) -> DataFrame:
    """Chunk a document table into the FSFS_CHUNK_SCHEMA-style table."""

    @F.pandas_udf(CHUNK_COLS_SCHEMA)
    def chunker(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            out.append(
                [
                    {
                        "chunk_ordinal": c.ordinal,
                        "byte_start": c.byte_start,
                        "byte_end": c.byte_end,
                        "content": c.text,
                        "token_count": c.token_count,
                    }
                    for c in chunk_text(t or "", max_chars, overlap_chars)
                ]
            )
        return pd.Series(out)

    exploded = docs.select(
        F.col(id_col).alias("parent_id"),
        F.explode(chunker(F.col(content_col))).alias("c"),
    )
    return exploded.select(
        F.concat_ws(
            "#", F.col("parent_id").cast("string"), F.col("c.chunk_ordinal").cast("string")
        ).alias("id"),
        "parent_id",
        F.col("c.chunk_ordinal").alias("chunk_ordinal"),
        F.col("c.byte_start").alias("byte_start"),
        F.col("c.byte_end").alias("byte_end"),
        F.col("c.content").alias("content"),
        F.col("c.token_count").alias("token_count"),
    )
