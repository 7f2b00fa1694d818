"""FrankensearchSpark.load: the full read surface over a reopened durable
index (traits.rs LexicalRead over a committed snapshot), plus tombstone
durability through delete -> save -> load (keeper.rs:929)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from frankensearch_spark.engine import FrankensearchSpark
from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df

N_DOCS = 120

QUERIES = [
    "fn import",
    "fn AND error",
    '"term00001 term00002"',
    "term0000*",
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = synthetic_corpus_df(spark, N_DOCS, partitions=3)
    return FrankensearchSpark.build(corpus, CORPUS_KEY)


@pytest.fixture(scope="module")
def loaded(spark, built, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("engload") / "idx")
    built.save(path)
    return FrankensearchSpark.load(spark, path)


def _bits(hits):
    return [(int(d), int(np.float32(s).view(np.uint32))) for d, s in hits]


def test_key_cols_round_trip(loaded):
    assert loaded.key_cols == CORPUS_KEY


def test_loaded_search_docids_bit_equal(built, loaded):
    for q in QUERIES:
        assert _bits(loaded.search_docids(q, limit=10)) == _bits(
            built.search_docids(q, limit=10)
        ), q


def test_loaded_search_external_ids(built, loaded):
    got = loaded.search("fn import", limit=5)
    want = built.search("fn import", limit=5)
    assert [e for e, _ in got] == [e for e, _ in want]
    assert [int(np.float32(s).view(np.uint32)) for _, s in got] == [
        int(np.float32(s).view(np.uint32)) for _, s in want
    ]


def test_loaded_offset(built, loaded):
    full = loaded.search_docids("fn import", limit=6)
    tail = loaded.search_docids("fn import", limit=3, offset=3)
    assert _bits(tail) == _bits(full[3:6])


def test_loaded_count(built, loaded):
    assert loaded.count("fn") == built.count("fn")
    assert loaded.count("nosuchtermzzz") == 0


def test_loaded_warm_bits_stable(loaded):
    cold = _bits(loaded.search_docids("fn error import", limit=10))
    loaded._query_cache.clear()
    warm = _bits(loaded.warm().search_docids("fn error import", limit=10))
    assert warm == cold


def test_loaded_self_warms_on_first_search(spark, built, loaded,
                                           tmp_path_factory):
    """QG-9 cold-open analogue: a freshly loaded serving engine
    self-warms on its FIRST search (one bounded preload) instead of
    paying per-query planning collects forever — and the self-warmed
    bits equal an explicitly warm()'d engine's and the builder's."""
    path = str(tmp_path_factory.mktemp("engselfwarm") / "idx")
    built.save(path)
    fresh = FrankensearchSpark.load(spark, path)
    sub = fresh.index
    assert getattr(sub, "_term_df_cache", None) is None
    got = _bits(fresh.search_docids("fn error import", limit=10))
    # the first search populated the planning caches
    assert sub._term_df_cache is not None
    assert sub._bucket_cov is not None
    assert got == _bits(built.search_docids("fn error import", limit=10))
    # built in-session engines do NOT self-warm (frames already
    # resident; the explicit warm() remains available)
    assert getattr(built.index, "_term_df_cache", None) is None


def test_delete_save_load_round_trip(spark, loaded, tmp_path_factory):
    """ADVICE: delete -> save -> load must NOT resurrect deleted docs."""
    base = loaded.search_docids("fn import", limit=3)
    victim = int(base[0][0])
    after = loaded.delete_documents([victim])
    assert victim not in {d for d, _ in after.search_docids("fn import", limit=3)}
    path2 = str(tmp_path_factory.mktemp("engload2") / "idx")
    after.save(path2)
    reopened = FrankensearchSpark.load(spark, path2)
    assert reopened.key_cols == CORPUS_KEY
    got = reopened.search_docids("fn import", limit=3)
    assert victim not in {d for d, _ in got}
    assert _bits(got) == _bits(after.search_docids("fn import", limit=3))


def test_loaded_snippets_with_corpus(spark, built, loaded):
    """A loaded engine regains snippets once the source corpus is
    re-attached (the index stores postings, not raw content)."""
    corpus = synthetic_corpus_df(spark, N_DOCS, partitions=3)
    got = loaded.with_corpus(corpus).search_with_snippets(
        "snake_case_identifier", limit=3
    )
    want = built.search_with_snippets("snake_case_identifier", limit=3)
    assert [(e, s) for e, _sc, s in got] == [(e, s) for e, _sc, s in want]
    assert all(s is not None and "<b>" in s for _e, _sc, s in got)


def test_multifield_snippets(spark):
    corpus = synthetic_corpus_df(spark, 50, partitions=2).withColumn(
        "title", F.col("path")
    )
    eng = FrankensearchSpark.build_multifield(
        corpus, CORPUS_KEY, {"content": "content", "title": "title"},
    )
    out = eng.search_with_snippets("snake_case_identifier", limit=3)
    assert out and all(s and "<b>" in s for _e, _sc, s in out)


def test_loaded_upsert_parity(spark, built, loaded):
    """upsert on a loaded engine (whole-store decode, serving_to_built)
    is bit-identical to upsert on the original builder engine."""
    keys = built.index.docmeta.select(*CORPUS_KEY).limit(3).collect()
    batch = spark.createDataFrame(
        [
            (r["repo"], r["path"], r["commit"], "rust",
             "loadupsert_sentinel fn import")
            for r in keys
        ],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    a = built.upsert(batch)
    b = loaded.upsert(batch)
    for q in ("loadupsert_sentinel", "fn import", '"term00001 term00002"'):
        assert _bits(b.search_docids(q, limit=10)) == _bits(
            a.search_docids(q, limit=10)
        ), q
    assert len(b.search_docids("loadupsert_sentinel", limit=10)) == 3


def test_loaded_compact_parity(spark, built, loaded):
    victims = [int(d) for d, _ in built.search_docids("fn import", limit=2)]
    a = built.delete_documents(victims).compact()
    b = loaded.delete_documents(victims).compact()
    assert b.index.tombstones is None
    for q in QUERIES:
        assert _bits(b.search_docids(q, limit=10)) == _bits(
            a.search_docids(q, limit=10)
        ), q


def test_loaded_compact_noop_without_tombstones(loaded):
    assert loaded.compact() is loaded


def test_save_refuses_committed_target(spark, built, loaded, tmp_path):
    """Snapshots are immutable: re-saving onto a committed path raises
    instead of silently no-oping (built) or deleting the very files the
    loaded blocks DataFrame lazily reads (loaded)."""
    p = str(tmp_path / "immutable")
    built.save(p)
    with pytest.raises(FileExistsError):
        built.delete_documents([1]).save(p)
    with pytest.raises(FileExistsError):
        loaded.delete_documents([1]).save(p)
    # and the committed index is untouched
    assert FrankensearchSpark.load(spark, p).search_docids("fn", limit=3)


def test_delete_preserves_warm_state(loaded):
    warm = loaded.warm()
    after = warm.delete_documents([0])
    assert after.index._term_df_cache is not None
    assert after.index._bucket_cov is not None


def test_multifield_loaded_upsert(spark, tmp_path):
    """field_cols persists in the root manifest, so a LOADED multifield
    engine can upsert — parity with the builder-path upsert."""
    corpus = synthetic_corpus_df(spark, 40, partitions=2).withColumn(
        "title", F.col("path")
    )
    eng = FrankensearchSpark.build_multifield(
        corpus, CORPUS_KEY, {"content": "content", "title": "title"},
    )
    p = str(tmp_path / "mfup")
    eng.save(p)
    ld = FrankensearchSpark.load(spark, p)
    keys = eng.index.docmeta.select(*CORPUS_KEY).limit(2).collect()
    batch = spark.createDataFrame(
        [
            (r["repo"], r["path"], r["commit"], "rust",
             "mfup_sentinel fn import", "mfup_title")
            for r in keys
        ],
        "repo string, path string, commit string, lang string, "
        "content string, title string",
    )
    a = eng.upsert(batch)
    b = ld.upsert(batch)
    for q in ("mfup_sentinel", "fn import"):
        assert _bits(b.search_docids(q, limit=10)) == _bits(
            a.search_docids(q, limit=10)
        ), q


def test_multifield_load_round_trip(spark, tmp_path_factory):
    corpus = synthetic_corpus_df(spark, 60, partitions=2).withColumn(
        "title", F.col("path")
    )
    eng = FrankensearchSpark.build_multifield(
        corpus, CORPUS_KEY, {"content": "content", "title": "title"},
    )
    path = str(tmp_path_factory.mktemp("engloadmf") / "idx")
    eng.save(path)
    got = FrankensearchSpark.load(spark, path)
    assert got.key_cols == CORPUS_KEY
    for q in ("fn import", "fn AND error"):
        assert _bits(got.search_docids(q, limit=10)) == _bits(
            eng.search_docids(q, limit=10)
        ), q
    # delete -> save -> load on the multifield serving form
    base = got.search_docids("fn import", limit=3)
    victim = int(base[0][0])
    after = got.delete_documents([victim])
    path2 = str(tmp_path_factory.mktemp("engloadmf2") / "idx")
    after.save(path2)
    reopened = FrankensearchSpark.load(spark, path2)
    assert victim not in {
        d for d, _ in reopened.search_docids("fn import", limit=3)
    }


def test_schema_round_trips_through_save_load(spark, tmp_path):
    """A custom parser schema (extra field boost) must survive
    save/load — otherwise the reopened engine silently re-ranks."""
    from frankensearch_spark.engine import FrankensearchSpark
    from frankensearch_spark.query_ast import (
        KEYWORD,
        TEXT,
        ParserSchema,
        QueryField,
    )

    schema = ParserSchema(
        fields=(
            QueryField("content", 1.5, TEXT),
            QueryField("lang", 1.0, KEYWORD),
        ),
        default_names=("content",),
    )
    eng = FrankensearchSpark.build(
        synthetic_corpus_df(spark, 60, partitions=2), CORPUS_KEY
    )
    eng.schema = schema
    p = str(tmp_path / "idx")
    eng.save(p)
    ld = FrankensearchSpark.load(spark, p)
    assert ld.schema == schema
    assert ld.search_docids("fn import", limit=5) == eng.search_docids(
        "fn import", limit=5
    )


def test_resume_refuses_mismatched_docid_assignment(spark, tmp_path):
    """A crash-resume whose recomputed corpus yields a DIFFERENT docid
    assignment must refuse to continue (mixing two assignments in one
    index is silent corruption)."""
    import pytest

    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.plans.manifest import load_manifest, write_index

    corpus = synthetic_corpus_df(spark, 80, partitions=2)
    built = build_index(corpus, CORPUS_KEY, docid_mode="global")
    p = str(tmp_path / "idx")
    write_index(built, p, n_groups=2)
    # simulate the crash: committed groups present, completion cleared
    m = load_manifest(p)
    m.completed = False
    m.tables = {}
    from frankensearch_spark.plans.manifest import _publish

    _publish(p, m)
    os.remove(os.path.join(p, "_COMMITTED"))
    # resume with the SAME assignment works (idempotent skip)
    write_index(built, p, n_groups=2)
    # different assignment (one doc dropped) must refuse
    m = load_manifest(p)
    m.completed = False
    m.tables = {}
    _publish(p, m)
    os.remove(os.path.join(p, "_COMMITTED"))
    other = build_index(corpus.limit(70), CORPUS_KEY, docid_mode="global")
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        write_index(other, p, n_groups=2)


def test_loaded_hybrid_one_job_parity(spark, built, loaded):
    """search_hybrid on a LOADED engine composes the lexical tier as a
    lazy plan (serving_topk_plan) — its fused output must equal the
    built engine's (whose lexical tier collects through astexec), for
    both fusion strategies and for the single-clause fast-path shape
    ('fn') AND a multi-term shape ('fn import')."""
    sem = spark.range(0, 40).select(
        F.col("id").cast("long").alias("docid"),
        (F.lit(1.0) / (F.col("id") + F.lit(1.0))).alias("sem_score"),
    )
    for q in ("fn", "fn import"):
        for strat in ("rrf", "minmax"):
            built._query_cache.clear()
            loaded._query_cache.clear()
            got = loaded.search_hybrid(q, sem, limit=10, depth=15,
                                       strategy=strat)
            want = built.search_hybrid(q, sem, limit=10, depth=15,
                                       strategy=strat)
            assert got == want, (q, strat)


def test_loaded_hybrid_uses_snapshot_cache(spark, loaded):
    """A cached (query, depth) lexical result short-circuits the plan
    path; fused output must be identical either way."""
    sem = spark.range(0, 40).select(
        F.col("id").cast("long").alias("docid"),
        (F.lit(1.0) / (F.col("id") + F.lit(1.0))).alias("sem_score"),
    )
    loaded._query_cache.clear()
    cold = loaded.search_hybrid("fn import", sem, limit=10, depth=15)
    loaded.search_docids("fn import", 15)  # populate the snapshot cache
    warm = loaded.search_hybrid("fn import", sem, limit=10, depth=15)
    assert cold == warm
