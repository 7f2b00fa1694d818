"""fsfs chunking policy (S6) — overlap/boundary/token-count semantics."""

import pytest

from frankensearch_spark.sources.chunking import (
    DEFAULT_MAX_CHARS,
    DEFAULT_OVERLAP_CHARS,
    chunk_text,
    count_lexical_tokens,
)


def test_empty():
    assert chunk_text("") == []


def test_short_doc_single_chunk():
    chunks = chunk_text("short document text")
    assert len(chunks) == 1
    c = chunks[0]
    assert (c.ordinal, c.byte_start, c.byte_end) == (0, 0, 19)
    assert c.token_count == 3


def test_token_class_matches_fsfs():
    # token chars: alnum | _ - . / :  (lexical_pipeline.rs:304-306)
    assert count_lexical_tokens("src/main.rs foo_bar x:y a-b") == 4
    assert count_lexical_tokens("a, b; c") == 3
    assert count_lexical_tokens("") == 0
    assert count_lexical_tokens("...") == 1


def test_overlap_and_coverage():
    text = "word " * 400  # 2000 bytes
    chunks = chunk_text(text)
    assert len(chunks) > 1
    # full coverage, correct overlap stride
    assert chunks[0].byte_start == 0
    assert chunks[-1].byte_end == len(text.encode())
    for a, b in zip(chunks, chunks[1:]):
        assert b.byte_start == a.byte_end - DEFAULT_OVERLAP_CHARS
        assert a.byte_end - a.byte_start <= DEFAULT_MAX_CHARS
    # ordinals dense
    assert [c.ordinal for c in chunks] == list(range(len(chunks)))


def test_utf8_boundary_never_split():
    text = "é" * 1000  # 2 bytes per char
    chunks = chunk_text(text)
    for c in chunks:
        # decodable slices by construction; boundaries at even offsets
        assert c.byte_start % 2 == 0 and c.byte_end % 2 == 0
        assert c.text == "é" * ((c.byte_end - c.byte_start) // 2)


def test_tiny_max_chars():
    chunks = chunk_text("abcdef", max_chars=2, overlap_chars=5)
    # overlap is clamped to max_chars-1; ordinals advance, text covered
    assert "".join(dict.fromkeys(c.text for c in chunks))  # non-degenerate
    assert chunks[-1].byte_end == 6


def test_spark_chunk_documents(spark):
    from frankensearch_spark.sources.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, "alpha " * 300), (2, "short"), (3, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs).collect()
    by_parent = {}
    for r in out:
        by_parent.setdefault(r["parent_id"], []).append(r)
    assert len(by_parent[1]) > 1
    assert len(by_parent[2]) == 1
    assert 3 not in by_parent  # empty/None yields no chunks
    first = sorted(by_parent[1], key=lambda r: r["chunk_ordinal"])[0]
    assert first["id"] == "1#0"
    ref = chunk_text("alpha " * 300)
    assert len(by_parent[1]) == len(ref)
    assert first["token_count"] == ref[0].token_count
