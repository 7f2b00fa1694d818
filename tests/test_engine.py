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


def test_search_hybrid_two_tier(eng, spark):
    """Hybrid facade == manual composition: lexical top-depth fused with
    a caller-provided semantic tier under both strategies."""
    lex_hits = eng.search_docids("fn import", limit=5)
    assert len(lex_hits) == 5
    lex_ids = [int(d) for d, _ in lex_hits]
    # semantic tier: top lexical doc is absent; one foreign doc present
    foreign = max(lex_ids) + 1
    sem_rows = [(lex_ids[1], 0.9), (foreign, 0.8), (lex_ids[2], 0.1)]
    sem = spark.createDataFrame(sem_rows, "docid long, sem_score double")

    out = eng.search_hybrid("fn import", sem, limit=10, depth=5)
    assert [d for d, *_ in out][0] == lex_ids[1]  # in-both, best sem
    by_id = {d: (s, lr, sr) for d, s, lr, sr in out}
    # RRF law: lex rank 2 + sem rank 1 for the winner (1-based ranks)
    assert by_id[lex_ids[1]][0] == pytest.approx(1 / 62 + 1 / 61, rel=1e-12)
    assert by_id[lex_ids[1]][1:] == (2, 1)
    # semantic-only doc carries no lexical rank
    assert by_id[foreign][1] is None and by_id[foreign][2] == 2
    # lexical-only top doc keeps rank 1, contribution 1/61
    assert by_id[lex_ids[0]][0] == pytest.approx(1 / 61, rel=1e-12)

    mm = eng.search_hybrid("fn import", sem, limit=10, depth=5,
                           strategy="minmax")
    mm_by_id = {d: s for d, s, *_ in mm}
    # pool min-max: best-in-both doc normalizes to sem 1.0; the lexical
    # pool max (rank-1 doc) normalizes to lex 1.0
    assert mm_by_id[lex_ids[0]] == pytest.approx(1.0, rel=1e-12)
    with pytest.raises(ValueError):
        eng.search_hybrid("fn import", sem, strategy="bogus")


def test_upsert_refreshes_snippet_corpus(spark):
    """Snippets after an upsert must render from the NEW content —
    the engine's snippet corpus replaces rows by key and admits
    inserted docs."""
    eng = FrankensearchSpark.build(
        synthetic_corpus_df(spark, 50, partitions=2), CORPUS_KEY
    )
    row = eng.index.docmeta.limit(1).collect()[0]
    new_rows = [
        (row["repo"], row["path"], row["commit"], row["lang"],
         "zzreplaced wholly new body about qqmarker"),
        ("newrepo", "new.rs", "c9", "rust",
         "zzinserted fresh doc also qqmarker text"),
    ]
    nc = spark.createDataFrame(
        new_rows,
        "repo string, path string, commit string, lang string, content string",
    )
    up = eng.upsert(nc)
    hits = up.search_with_snippets("qqmarker", limit=5)
    assert len(hits) == 2
    for _ext, _score, snip in hits:
        assert snip is not None and "qqmarker" in snip.replace("<b>", "").replace("</b>", "")
