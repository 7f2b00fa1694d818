"""Randomized lifecycle-sequence fuzz: seeded random interleavings of
delete / upsert / compact / save+load, each step checked against the
reference's exact metamorphic rules (index.rs:9104-9270 lifecycle,
grimoire.rs:68-71 delete-score stability, keeper.rs:929 tombstone
durability):

* delete(D): surviving docs keep BIT-IDENTICAL scores (df/N still count
  tombstones); deleted docids vanish from every result list.
* upsert(batch): every old revision's docid is gone; every new revision
  is findable by its sentinel term.
* compact(): match SET per query unchanged (scores may move — df/N fold).
* save+load: loaded engine's top-k is bit-identical to the live one.

Deterministic: one seed drives the whole op sequence."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from frankensearch_spark.engine import FrankensearchSpark
from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df

N_DOCS = 90
K = 12
QUERIES = ["fn import", "fn AND error", '"term00001 term00002"', "term0000*"]


def _bits(hits):
    return [(int(d), int(np.float32(s).view(np.uint32))) for d, s in hits]


def _results(eng, k=K):
    return {q: eng.search_docids(q, limit=k) for q in QUERIES}


@pytest.mark.parametrize("seed", [7, 1301])
def test_lifecycle_sequence_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    corpus = synthetic_corpus_df(spark, N_DOCS, partitions=3)
    eng = FrankensearchSpark.build(corpus, CORPUS_KEY)
    upsert_gen = 0

    for step in range(6):
        op = rng.choice(["delete", "upsert", "compact", "saveload"])

        if op == "delete":
            # deep top-k BEFORE, so the after-delete list is predictable
            before = {
                q: eng.search_docids(q, limit=K + 4) for q in QUERIES
            }
            pool = [int(d) for d, _ in before["fn import"]]
            if not pool:
                continue
            victims = set(rng.sample(pool, min(3, len(pool))))
            eng = eng.delete_documents(sorted(victims))
            for q in QUERIES:
                want = [
                    (d, s) for d, s in before[q] if int(d) not in victims
                ][:K]
                got = eng.search_docids(q, limit=K)
                assert _bits(got) == _bits(want), (op, q, step)

        elif op == "upsert":
            upsert_gen += 1
            sentinel = f"fuzzsentinel{seed}g{upsert_gen}"
            # new revisions of 4 random existing docs: same external key,
            # content replaced by a unique sentinel term + common term
            keys = eng.index.docmeta.select("docid", *CORPUS_KEY).limit(
                40
            ).collect()
            picked = rng.sample(keys, min(4, len(keys)))
            old_ids = {int(r["docid"]) for r in picked}
            batch = spark.createDataFrame(
                [
                    (r["repo"], r["path"], r["commit"], "rust",
                     f"{sentinel} fn common_fuzz_term")
                    for r in picked
                ],
                "repo string, path string, commit string, lang string, "
                "content string",
            )
            eng = eng.upsert(batch)
            hits = eng.search_docids(sentinel, limit=10)
            assert len(hits) == len(picked), (op, step)
            assert not (old_ids & {int(d) for d, _ in hits})
            for q in QUERIES:  # no old revision leaks into any result
                got = {int(d) for d, _ in eng.search_docids(q, limit=K)}
                assert not (old_ids & got), (op, q, step)

        elif op == "compact":
            before = _results(eng)
            eng = eng.compact()
            assert eng.index.tombstones is None
            for q in QUERIES:
                got = eng.search_docids(q, limit=K)
                assert {int(d) for d, _ in got} == {
                    int(d) for d, _ in before[q]
                }, (op, q, step)

        else:  # saveload: durable round-trip is bit-exact at every point
            path = str(tmp_path / f"fuzz{seed}_{step}")
            eng.save(path)
            loaded = FrankensearchSpark.load(spark, path)
            assert loaded.key_cols == CORPUS_KEY
            for q in QUERIES:
                assert _bits(loaded.search_docids(q, limit=K)) == _bits(
                    eng.search_docids(q, limit=K)
                ), (op, q, step)
            # CONTINUE from the reopened engine: later delete/upsert/
            # compact steps then run against the serving->built
            # reconstruction path, pinning its bit-parity in sequence
            eng = loaded
