"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Each entry in ``QUERIES`` is ``name -> (spark, sf_dir) -> DataFrame``; the
matching ``ORACLE_SQL[name]`` is ANSI SQL DuckDB runs over the same parquet
(views pre-registered by the driver).  Column names/aliases match exactly —
the driver's compare hashes values after sorting columns by name.

Float policy: driver-checked queries compute scores in **float64** with
the same expression shape on both sides and ``ROUND(x, 6)``; the engine's
rank-exact **float32** contract is enforced separately by the pytest suite
(bit-equality vs the numpy oracle) because DuckDB cannot evaluate strict
f32 op order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frankensearch_spark.operators.build import BuiltIndex, build_index
from frankensearch_spark.sources.corpus import load_documents_as_corpus

# ---------------------------------------------------------------------------
# shared index cache (one build per sf_dir per session)

_INDEX_CACHE: dict[str, BuiltIndex] = {}


def documents_index(spark: SparkSession, sf_dir: str) -> BuiltIndex:
    key = f"{id(spark)}:{sf_dir}"
    if key not in _INDEX_CACHE:
        corpus = load_documents_as_corpus(spark, sf_dir)
        _INDEX_CACHE[key] = build_index(corpus, ["repo", "path", "commit"])
    return _INDEX_CACHE[key]


# DuckDB-side tokenizer, equivalent to analyze.tokenize_fast on the
# documents charset (verified: text is strictly [a-z0-9 ]).
_SQL_TOKENS = """
SELECT doc_id AS docid,
       list_filter(string_split_regex(lower(text), '[^0-9a-z]+'),
                   x -> x <> '') AS l
FROM documents
"""

_SQL_TOKEN_ROWS = f"""
SELECT docid, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
FROM ({_SQL_TOKENS}) d
"""

# BM25 f64 CTE scaffold shared by the scoring oracle queries
_SQL_BM25_BASE = f"""
WITH tok AS ({_SQL_TOKEN_ROWS}),
tf AS (
  SELECT term, docid, count(*)::BIGINT AS tf FROM tok GROUP BY term, docid
),
dl AS (
  SELECT docid, count(*)::BIGINT AS doclen FROM tok GROUP BY docid
),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(doclen)::BIGINT AS total_tokens,
         sum(doclen)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM dl
),
df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
)
"""


def _bm25_sql(terms: list[str], k: int) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return (
        _SQL_BM25_BASE
        + f"""
, scored AS (
  SELECT tf.docid,
         sum(
           ln(1.0 + ((stats.n_docs - df.df)::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5))
           * 2.2
           * tf.tf::DOUBLE
           / (tf.tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl.doclen::DOUBLE / stats.avgdl))
         ) AS score
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.docid = dl.docid
  CROSS JOIN stats
  WHERE tf.term IN ({tlist})
  GROUP BY tf.docid
)
SELECT docid, round(score, 6) AS score_r
FROM scored ORDER BY score DESC, docid ASC LIMIT {k}
"""
    )


def _bm25_spark(spark, sf_dir, terms: list[str], k: int) -> DataFrame:
    """f64 BM25 with the identical expression shape as :func:`_bm25_sql`."""
    idx = documents_index(spark, sf_dir)
    n_docs, total_tokens = idx.stats()
    avgdl = total_tokens / n_docs  # f64, same division as the SQL
    p = idx.postings.filter(F.col("term").isin(terms)).select(
        "term", "docid", F.col("tf").cast("double").alias("tf"),
        F.col("doclen").cast("double").alias("doclen"),
    )
    ts = idx.termstats.filter(F.col("term").isin(terms)).select(
        "term", F.col("df").cast("double").alias("df")
    )
    joined = p.join(F.broadcast(ts), "term")
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = (
        idf
        * F.lit(2.2)
        * F.col("tf")
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doclen") / F.lit(avgdl)))
    )
    scored = joined.groupBy("docid").agg(F.sum(score).alias("score"))
    return (
        scored.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", F.round("score", 6).alias("score_r"))
    )


# ---------------------------------------------------------------------------
# individual queries


def q_tokenize_explode(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    p = idx.positions.filter(F.col("docid") < 100)
    return p.select("docid", "term", F.explode("positions").alias("pos"))


def q_term_tf(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    return idx.postings.select("term", "docid", F.col("tf").cast("long").alias("tf"))


def q_term_df(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    return idx.termstats.select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )


def q_doclen(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    return idx.docmeta.select("docid", F.col("doclen").cast("long").alias("doclen"))


def q_corpus_stats(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    return idx.fieldstats.select(
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.col("total_tokens").cast("double") / F.col("doc_count").cast("double"), 6
        ).alias("avgdl_r"),
    )


def q_bm25_topk_single(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["merge"], 10)


def q_bm25_topk_multi(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["key", "order", "merge"], 10)


def q_dedup_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def q_doc_fingerprint(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    # fingerprint = md5 of the sorted distinct term list (rolling-hash class)
    return idx.postings.groupBy("docid").agg(
        F.md5(F.concat_ws(" ", F.sort_array(F.collect_set("term")))).alias(
            "fingerprint"
        )
    )


def q_token_quality(spark, sf_dir):
    idx = documents_index(spark, sf_dir)
    stop = ["the", "a", "of", "and", "in", "on"]
    p = idx.postings
    return p.groupBy("docid").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.sum(F.length("term") * F.col("tf")).cast("double")
            / F.sum("tf").cast("double"),
            6,
        ).alias("avg_token_len_r"),
        F.round(
            F.sum(F.when(F.col("term").isin(stop), F.col("tf")).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum("tf").cast("double"),
            6,
        ).alias("stopword_ratio_r"),
    )


def q_minhash_signature(spark, sf_dir):
    """MinHash signature, 8 seeds, md5-based (engine-portable hash)."""
    idx = documents_index(spark, sf_dir)
    terms = idx.postings.select("docid", "term")
    seeds = spark.range(8).select(F.col("id").cast("int").alias("seed"))
    h = F.md5(F.concat_ws("#", F.col("term"), F.col("seed").cast("string")))
    return (
        terms.crossJoin(F.broadcast(seeds))
        .groupBy("docid", "seed")
        .agg(F.min(h).alias("minhash"))
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-20 vs the vec_id=0 embedding (f64, rounded)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != 0)
    # elements are float32: cast to double BEFORE multiplying, matching the
    # oracle's x::DOUBLE * x::DOUBLE op order
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    norm_a = F.sqrt(sq("embedding"))
    norm_q = F.sqrt(sq("qv"))
    sim = dot / (norm_a * norm_q)
    return (
        joined.select("vec_id", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(20)
        .select("vec_id", F.round("sim", 6).alias("sim_r"))
    )


def q_embedding_norms(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return emb.select("vec_id", "label", F.round(norm, 6).alias("l2_r"))


QUERIES = {
    "tokenize_explode": q_tokenize_explode,
    "term_tf": q_term_tf,
    "term_df": q_term_df,
    "doclen": q_doclen,
    "corpus_stats": q_corpus_stats,
    "bm25_topk_single": q_bm25_topk_single,
    "bm25_topk_multi": q_bm25_topk_multi,
    "dedup_exact": q_dedup_exact,
    "doc_fingerprint": q_doc_fingerprint,
    "token_quality": q_token_quality,
    "minhash_signature": q_minhash_signature,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_norms": q_embedding_norms,
}


ORACLE_SQL = {
    "tokenize_explode": f"SELECT * FROM ({_SQL_TOKEN_ROWS}) t WHERE docid < 100",
    "term_tf": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS})
        SELECT term, docid, count(*)::BIGINT AS tf FROM tok GROUP BY term, docid
    """,
    "term_df": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS}),
        tf AS (SELECT term, docid, count(*)::BIGINT AS tf FROM tok GROUP BY term, docid)
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
    """,
    "doclen": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS})
        SELECT d.doc_id AS docid, coalesce(t.doclen, 0)::BIGINT AS doclen
        FROM documents d LEFT JOIN
          (SELECT docid, count(*)::BIGINT AS doclen FROM tok GROUP BY docid) t
          ON d.doc_id = t.docid
    """,
    "corpus_stats": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS}),
        dl AS (SELECT docid, count(*)::BIGINT AS doclen FROM tok GROUP BY docid)
        SELECT count(*)::BIGINT AS doc_count, sum(doclen)::BIGINT AS total_tokens,
               round(sum(doclen)::DOUBLE / count(*)::DOUBLE, 6) AS avgdl_r
        FROM dl
    """,
    "bm25_topk_single": _bm25_sql(["merge"], 10),
    "bm25_topk_multi": _bm25_sql(["key", "order", "merge"], 10),
    "dedup_exact": """
        SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_docs,
               min(doc_id) AS keeper
        FROM documents GROUP BY text HAVING count(*) > 1
    """,
    "doc_fingerprint": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS})
        SELECT docid, md5(string_agg(DISTINCT term, ' ' ORDER BY term)) AS fingerprint
        FROM tok GROUP BY docid
    """,
    "token_quality": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS})
        SELECT docid,
               count(*)::BIGINT AS n_tokens,
               count(DISTINCT term)::BIGINT AS n_distinct,
               round(sum(len(term))::DOUBLE / count(*)::DOUBLE, 6) AS avg_token_len_r,
               round(sum(CASE WHEN term IN ('the','a','of','and','in','on')
                         THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
                 AS stopword_ratio_r
        FROM tok GROUP BY docid
    """,
    "minhash_signature": f"""
        WITH tok AS ({_SQL_TOKEN_ROWS}),
        terms AS (SELECT DISTINCT docid, term FROM tok),
        seeds AS (SELECT unnest(range(8))::INT AS seed)
        SELECT docid, seed, min(md5(term || '#' || seed::VARCHAR)) AS minhash
        FROM terms CROSS JOIN seeds GROUP BY docid, seed
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        s AS (
          SELECT e.vec_id,
                 list_sum(list_transform(list_zip(e.embedding, q.qv),
                          x -> x[1]::DOUBLE * x[2]::DOUBLE))
                 / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                    * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE))))
                 AS sim
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        )
        SELECT vec_id, round(sim, 6) AS sim_r
        FROM s ORDER BY sim DESC, vec_id ASC LIMIT 20
    """,
    "embedding_norms": """
        SELECT vec_id, label,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_r
        FROM embeddings
    """,
}
