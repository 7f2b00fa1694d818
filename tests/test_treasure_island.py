"""Treasure Island long-prose fixture (SURVEY.md §5.4): real text with
chapter-attributed lexical queries — exercises large doclens (geometric
fieldnorm buckets), the fsfs chunker on real prose, and end-to-end
retrieval quality on non-synthetic data."""

from __future__ import annotations

import json
import re

import pytest

FIX = "/root/reference/tests/fixtures/treasure_island"
CHAPTER_RE = re.compile(r"^== CHAPTER (\d+) :: ", re.MULTILINE)


def _chapters() -> list[tuple[int, str]]:
    with open(f"{FIX}/treasure_island.txt") as fh:
        text = fh.read()
    marks = list(CHAPTER_RE.finditer(text))
    out = []
    for i, m in enumerate(marks):
        end = marks[i + 1].start() if i + 1 < len(marks) else len(text)
        out.append((int(m.group(1)), text[m.start() : end]))
    return out


@pytest.fixture(scope="module")
def eng(spark):
    from frankensearch_spark.engine import FrankensearchSpark

    rows = [
        ("treasure-island", f"chapter-{n:02d}", "HEAD", "en", body)
        for n, body in _chapters()
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return FrankensearchSpark.build(corpus, ["repo", "path", "commit"])


def _hit_chapters(eng, query, k=5):
    return [
        int(ext.split("/")[1].split("-")[1])
        for ext, _s in eng.search(query, limit=k)
    ]


def test_chapter_corpus_shape(eng):
    n, total_tokens = eng.index.stats()
    assert n == 34  # sequential 1..34 chapters
    assert total_tokens > 60_000  # real book-length doclens


def test_lexical_queries_precision_and_recall(eng):
    """Fixture semantics: PRECISION for every query (each hit's text
    contains must_contain, case-insensitively); RECALL only where the
    fixture declares an honest chapter expectation."""
    with open(f"{FIX}/lexical_queries.json") as fh:
        fixture = json.load(fh)
    chapters = dict(_chapters())
    recall_limit = fixture.get("recall_limit", 40)
    for q in fixture["queries"]:
        got = _hit_chapters(eng, q["term"], k=recall_limit)
        assert got, q["term"]
        needle = q["must_contain"].lower()
        for ch in got:
            assert needle in chapters[ch].lower(), (q["term"], ch)
        if q["expect_chapters"]:
            assert set(got) & set(q["expect_chapters"]), (
                q["term"], got, q["expect_chapters"]
            )


def test_nothing_queries_return_nothing(eng):
    with open(f"{FIX}/lexical_queries.json") as fh:
        fixture = json.load(fh)
    for term in fixture.get("must_return_nothing", []):
        q = term["term"] if isinstance(term, dict) else term
        assert eng.search_docids(q, limit=3) == [], q


def test_long_doc_fieldnorm_buckets(eng):
    """Chapter doclens reach the geometric region of the fieldnorm table
    (>40 tokens — contract.rs table octaves)."""
    import pyspark.sql.functions as F

    from frankensearch_spark.contract import fieldnorm_to_id

    rows = eng.index.docmeta.select("doclen").collect()
    ids = [int(fieldnorm_to_id(r["doclen"])) for r in rows]
    assert min(ids) > 40  # every chapter is comfortably past exact codes
    assert max(ids) < 256


def test_chunked_chapters_match_policy(eng):
    from frankensearch_spark.sources.chunking import chunk_text

    _n, body = _chapters()[0]
    chunks = chunk_text(body)
    assert len(chunks) > 5
    assert all(c.byte_end - c.byte_start <= 768 for c in chunks[:-1])
