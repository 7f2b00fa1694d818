"""Facade surface: build/search/snippets/count/lifecycle round-trip."""

import pytest

from frankensearch_spark.engine import FrankensearchSpark
from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df

N_DOCS = 150


@pytest.fixture(scope="module")
def eng(spark):
    corpus = synthetic_corpus_df(spark, N_DOCS, partitions=3)
    return FrankensearchSpark.build(corpus, CORPUS_KEY)


def test_search_returns_external_ids(eng):
    hits = eng.search("fn import", limit=5)
    assert hits
    for ext, score in hits:
        repo, rest = ext.split("/", 1)
        assert repo.startswith("org")
        assert float(score) > 0


def test_boolean_and_phrase_queries(eng):
    assert eng.search("fn AND import", limit=5) == []  # disjoint by corpus
    ph = eng.search('"term00001 term00002"', limit=5)
    loose = eng.search("term00001 term00002", limit=5)
    assert len(loose) >= len(ph)


def test_count(eng):
    n = eng.count("fn")
    assert 0 < n < N_DOCS
    assert eng.count("nosuchtermzzz") == 0


def test_snippets(eng):
    out = eng.search_with_snippets("snake_case_identifier", limit=3)
    assert out
    for _ext, _score, snip in out:
        assert snip is not None and "<b>" in snip


def test_lifecycle_roundtrip(eng):
    baseline = eng.search_docids("fn import", limit=3)
    victim = int(baseline[0][0])
    after = eng.delete_documents([victim])
    got = after.search_docids("fn import", limit=3)
    assert victim not in {d for d, _ in got}
    compacted = after.compact()
    assert compacted.index.tombstones is None
    still = compacted.search_docids("fn import", limit=3)
    assert victim not in {d for d, _ in still}


def test_ranked_query_cache(eng):
    """E14: per-snapshot result cache — second call hits the cache (no
    recompute), mutations get a fresh engine and a fresh cache."""
    import time

    q = "term00001 term00002"
    first = eng.search_docids(q, limit=5)
    t0 = time.perf_counter()
    second = eng.search_docids(q, limit=5)
    cached_secs = time.perf_counter() - t0
    assert second == first
    assert cached_secs < 0.05  # dict hit, no Spark job
    assert (q, 5, 0) in eng._query_cache
    # a mutation produces a NEW engine whose cache starts empty and
    # whose results reflect the mutation
    victim = int(first[0][0])
    after = eng.delete_documents([victim])
    assert after._query_cache == {}
    got = after.search_docids(q, limit=5)
    assert victim not in {d for d, _ in got}
