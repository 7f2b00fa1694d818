"""End-to-end quality fixtures (SURVEY.md §5.4): the reference's 120-doc
corpus + 26 queries + relevance expectations, scored with the same soft
metrics its own search_quality_harness uses (nDCG@10 / MRR / recall@10 —
asserted positive with pinned ratchet floors), plus the 21 edge-case
strings which must never error."""

from __future__ import annotations

import json
import math

import numpy as np
import pytest

FIX = "/root/reference/tests/fixtures"
TOP_K = 10


def _load(name):
    with open(f"{FIX}/{name}.json") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def eng(spark):
    from frankensearch_spark.engine import FrankensearchSpark

    docs = _load("corpus")["documents"]
    rows = [
        ("fixtures", d["doc_id"], "HEAD", "en",
         (d.get("title", "") + "\n" + d.get("content", "")))
        for d in docs
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return FrankensearchSpark.build(corpus, ["repo", "path", "commit"])


def _doc_ids(eng, query, k=TOP_K):
    hits = eng.search(query, limit=k)
    # external id = repo/path/commit; path carries the fixture doc_id
    return [ext.split("/", 1)[1].rsplit("/", 1)[0] for ext, _s in hits]


def _ndcg(retrieved, expected, k=TOP_K):
    gains = [1.0 if d in set(expected) else 0.0 for d in retrieved[:k]]
    dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains))
    ideal = sum(1.0 / math.log2(i + 2) for i in range(min(len(expected), k)))
    return dcg / ideal if ideal else 0.0


def _mrr(retrieved, expected):
    exp = set(expected)
    for i, d in enumerate(retrieved):
        if d in exp:
            return 1.0 / (i + 1)
    return 0.0


def _recall(retrieved, expected, k=TOP_K):
    exp = set(expected)
    if not exp:
        return 0.0
    return len(exp & set(retrieved[:k])) / min(len(exp), k)


def test_quality_vs_relevant_ids(eng):
    queries = _load("queries")
    ndcgs, mrrs, recalls = [], [], []
    for q in queries:
        retrieved = _doc_ids(eng, q["query"])
        expected = q["relevant_ids"]
        ndcgs.append(_ndcg(retrieved, expected))
        mrrs.append(_mrr(retrieved, expected))
        recalls.append(_recall(retrieved, expected))
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # relevant_ids grade the TWO-TIER system (lexical + semantic); the
    # reference's own harness only asserts these metrics are positive for
    # the lexical tier.  Floors pinned from measured lexical-only quality
    # (ndcg 0.162 / mrr 0.404 / recall 0.127) as regression ratchets.
    assert mean(ndcgs) > 0.10, mean(ndcgs)
    assert mean(mrrs) > 0.25, mean(mrrs)
    assert mean(recalls) > 0.08, mean(recalls)


def test_quality_vs_expected_top10(eng):
    rel = _load("relevance")["queries"]
    ndcgs, mrrs = [], []
    for q in rel:
        retrieved = _doc_ids(eng, q["query"])
        expected = q["expected_top_10"]
        ndcgs.append(_ndcg(retrieved, expected))
        mrrs.append(_mrr(retrieved, expected))
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(ndcgs) > 0.4, mean(ndcgs)
    assert mean(mrrs) > 0.6, mean(mrrs)


def test_edge_cases_never_error(eng):
    cases = _load("edge_cases")["cases"]
    assert len(cases) >= 20
    for c in cases:
        hits = eng.search_docids(c["text"], limit=5)
        assert isinstance(hits, list)
        for _d, s in hits:
            assert np.isfinite(np.float32(s))
    # empty / whitespace queries return no hits
    assert eng.search_docids("", limit=5) == []
    assert eng.search_docids("   \n\t   ", limit=5) == []
