"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship dedup-cluster query on /root/testdata/sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2 + the
                 training-data extras); each takes (spark, sf_dir).
oracle_sql()   — DuckDB-runnable ANSI SQL equivalents. Non-SQL-expressible
                 ops (MinHash LSH candidates, SimHash, full pipeline,
                 connected components) are intentionally omitted → driver
                 records rows-only checks for those.

Column aliases in Spark results and oracle SQL match exactly; float outputs
are floored to integer ppm / e4 scales so value hashes are representation-
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from webdedup import ann, textstats as TS
from webdedup.config import DedupConfig
from webdedup.pipeline import dedup

CFG = DedupConfig(
    number_of_hash_functions=128,
    rows_per_band=4,
    shingle_size=3,
    jaccard_threshold=0.8,
)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline → (doc_id, cluster_id) on sf0.001."""
    docs = _load(spark, "/root/testdata/sf0.001", "documents")
    res = dedup(docs, CFG, id_col="doc_id")
    return res.clusters.orderBy("doc_id")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

@pandas_udf(LongType())
def _wang32_udf(x: pd.Series) -> pd.Series:
    import numpy as np

    from webdedup import kernels as K

    return pd.Series(
        K.wang32(x.to_numpy(dtype="int64").astype(np.uint32)).astype("int64")
    )


def q_wang32_parity(spark, sf_dir):
    """P1 bit-parity: numpy wang32 kernel vs pure-SQL uint32 emulation."""
    return (
        _load(spark, sf_dir, "documents")
        .select("doc_id", _wang32_udf(F.col("doc_id")).alias("h"))
    )


def q_exact_dup_clusters(spark, sf_dir):
    return TS.exact_dup_clusters(_load(spark, sf_dir, "documents"))


def q_exact_dup_pairs(spark, sf_dir):
    return TS.exact_dup_pairs(_load(spark, sf_dir, "documents"))


def q_doc_stats(spark, sf_dir):
    return TS.doc_stats(_load(spark, sf_dir, "documents"))


def q_lang_distribution(spark, sf_dir):
    return TS.lang_distribution(_load(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    return TS.ngram_jaccard_pairs(_load(spark, sf_dir, "documents"), n=3, min_ppm=100_000)


def q_top_similar_per_doc(spark, sf_dir):
    return TS.top_similar_per_doc(_load(spark, sf_dir, "documents"), n=3, k=3, min_ppm=10_000)


def q_knn_graph_sym(spark, sf_dir):
    return TS.knn_graph_sym(_load(spark, sf_dir, "documents"), n=3, min_ppm=100_000)


def q_quality_scores(spark, sf_dir):
    return TS.quality_scores(_load(spark, sf_dir, "documents"))


def q_lang_scores(spark, sf_dir):
    return TS.lang_scores(_load(spark, sf_dir, "documents"))


def q_token_topk(spark, sf_dir):
    return TS.token_topk(_load(spark, sf_dir, "documents"), k=20)


def q_cosine_topk(spark, sf_dir):
    return ann.cosine_topk(_load(spark, sf_dir, "embeddings"), k=5)


def q_tpch_q1_counts(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.floor(F.sum("l_quantity")).cast("long").alias("sum_qty"),
        )
    )


def q_orders_by_segment(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def q_events_daily(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        ).agg(F.count("*").alias("n"))
    )


def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity cut) via window functions
    — the stateful-stream-style operator expressed as a batch window chain."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    new_sess = (
        F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0)
    )
    sess = (
        ev.withColumn("_new", new_sess)
        .withColumn("session_no", F.sum("_new").over(w).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    return sess


# ---- non-SQL-expressible (rows-only checks) ----

def q_dedup_clusters(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return dedup(docs, CFG, id_col="doc_id").clusters


def q_near_dup_pairs(spark, sf_dir):
    """Pipeline's verified near-dup pairs (a, b, jaccard_ppm) at J >= 0.8.

    Oracle = brute-force word-3-gram Jaccard (SQL). The Spark side found the
    same pairs via MinHash-LSH + SimHash candidates + exact verify — a
    hash-vs-oracle match here IS the dup-pair recall gate at sf scale.
    jaccard here is over crc32-hashed gram ids (collision probability per
    doc ~1e-5; tolerated by the driver gate, revisit if it ever flips a bit).
    """
    docs = _load(spark, sf_dir, "documents")
    cfg = CFG
    res = dedup(docs, cfg, id_col="doc_id")
    return (
        res.pairs.where(F.col("kind") == "near")
        .select(
            "a",
            "b",
            F.floor(F.lit(1_000_000.0) * F.col("jaccard")).cast("long").alias("jaccard_ppm"),
        )
    )


def q_lsh_candidate_pairs(spark, sf_dir):
    from webdedup import lsh
    from webdedup.signatures import featurize

    docs = _load(spark, sf_dir, "documents")
    feat = featurize(docs.withColumnRenamed("doc_id", "_id").withColumn(
        "doc_id", F.col("_id")
    ), CFG)
    return lsh.candidate_pairs(feat, CFG)


def q_simhash_fingerprints(spark, sf_dir):
    from webdedup.signatures import featurize

    docs = _load(spark, sf_dir, "documents")
    return featurize(docs, CFG).select("doc_id", "simhash")


def q_cosine_topk_lsh(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return ann.cosine_topk_lsh(emb, dim=dim, k=5)


def q_substring_pairs(spark, sf_dir):
    """Winnowed-Rabin exact-substring candidate+verify pass (north-rule extra)."""
    from webdedup.substring import substring_pairs

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    return substring_pairs(docs, CFG)


def q_index_stats(spark, sf_dir):
    """B6 per-slot inverse-index stats via the MinHashNeighbors API."""
    from webdedup.api import MinHashNeighbors
    from webdedup.signatures import make_featurize_udf

    docs = _load(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("id"), F.split("text", " ").alias("_toks")
    ).select("id", F.transform(F.col("_toks"), lambda t: F.crc32(t)).alias("features"))
    nn = MinHashNeighbors(number_of_hash_functions=16, max_bin_size=100000).fit(feats)
    return nn.index_stats()


def q_api_kneighbors(spark, sf_dir):
    """Q1-Q9 chain through the public API on crc32 token sets."""
    from webdedup.api import MinHashNeighbors

    docs = _load(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("id"), F.split("text", " ").alias("_toks")
    ).select("id", F.array_distinct(F.transform(F.col("_toks"), lambda t: F.crc32(t))).alias("features"))
    nn = MinHashNeighbors(
        n_neighbors=3, number_of_hash_functions=32, max_bin_size=100000, fast=True
    ).fit(feats)
    return nn.kneighbors()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wang32_parity": q_wang32_parity,
        "exact_dup_clusters": q_exact_dup_clusters,
        "exact_dup_pairs": q_exact_dup_pairs,
        "doc_stats": q_doc_stats,
        "lang_distribution": q_lang_distribution,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "top_similar_per_doc": q_top_similar_per_doc,
        "knn_graph_sym": q_knn_graph_sym,
        "quality_scores": q_quality_scores,
        "lang_scores": q_lang_scores,
        "token_topk": q_token_topk,
        "cosine_topk": q_cosine_topk,
        "tpch_q1_counts": q_tpch_q1_counts,
        "orders_by_segment": q_orders_by_segment,
        "events_daily": q_events_daily,
        "sessionization": q_sessionization,
        "near_dup_pairs": q_near_dup_pairs,
        # rows-only (no oracle): LSH / SimHash / full pipeline / ANN-LSH
        "dedup_clusters": q_dedup_clusters,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "simhash_fingerprints": q_simhash_fingerprints,
        "cosine_topk_lsh": q_cosine_topk_lsh,
        "substring_pairs": q_substring_pairs,
        "index_stats": q_index_stats,
        "api_kneighbors": q_api_kneighbors,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL) — formulas mirror the Spark DataFrame code 1:1
# --------------------------------------------------------------------------

_NGRAM_CTE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
    THEN list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE t END) AS gs
  FROM toks),
sizes AS (SELECT doc_id, len(gs) AS n FROM grams),
g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_inter
  FROM g l JOIN g r ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT i.a, i.b,
         CAST(floor(1000000.0 * i.n_inter / (sa.n + sb.n - i.n_inter)) AS BIGINT) AS jaccard_ppm,
         1000000.0 * i.n_inter / (sa.n + sb.n - i.n_inter) AS jraw
  FROM inter i
  JOIN sizes sa ON i.a = sa.doc_id
  JOIN sizes sb ON i.b = sb.doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "wang32_parity": """
WITH k0 AS (SELECT doc_id, doc_id % 4294967296 AS k FROM documents),
s1 AS (SELECT doc_id, ((4294967295 - k) + ((k * 32768) % 4294967296)) % 4294967296 AS k FROM k0),
s2 AS (SELECT doc_id, xor(k, k // 4096) AS k FROM s1),
s3 AS (SELECT doc_id, (k + ((k * 4) % 4294967296)) % 4294967296 AS k FROM s2),
s4 AS (SELECT doc_id, xor(k, k // 16) AS k FROM s3),
s5 AS (SELECT doc_id, (k * 2057) % 4294967296 AS k FROM s4)
SELECT doc_id, xor(k, k // 65536) AS h FROM s5
""",
        "exact_dup_clusters": """
SELECT md5(text) AS fingerprint, count(*) AS n_members, min(doc_id) AS rep_id
FROM documents GROUP BY 1 HAVING count(*) > 1
""",
        "exact_dup_pairs": """
WITH fp AS (SELECT doc_id, md5(text) AS f FROM documents)
SELECT l.doc_id AS a, r.doc_id AS b
FROM fp l JOIN fp r ON l.f = r.f AND l.doc_id < r.doc_id
""",
        "doc_stats": """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars
FROM documents
""",
        "lang_distribution": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "ngram_jaccard_pairs": _NGRAM_CTE
        + "SELECT a, b, jaccard_ppm FROM pairs WHERE jraw >= 100000",
        "top_similar_per_doc": _NGRAM_CTE
        + """,
bothdir AS (
  SELECT a AS doc_id, b AS other_id, jaccard_ppm FROM pairs WHERE jraw >= 10000
  UNION ALL
  SELECT b AS doc_id, a AS other_id, jaccard_ppm FROM pairs WHERE jraw >= 10000),
ranked AS (
  SELECT doc_id, other_id, jaccard_ppm,
         rank() OVER (PARTITION BY doc_id ORDER BY jaccard_ppm DESC, other_id ASC) AS rnk
  FROM bothdir)
SELECT doc_id, other_id, jaccard_ppm, rnk FROM ranked WHERE rnk <= 3
""",
        "knn_graph_sym": _NGRAM_CTE
        + """,
directed AS (
  SELECT a AS src, b AS dst, jaccard_ppm FROM pairs WHERE jraw >= 100000
  UNION ALL
  SELECT b AS src, a AS dst, jaccard_ppm FROM pairs WHERE jraw >= 100000)
SELECT src, dst, CAST(floor(avg(jaccard_ppm)) AS BIGINT) AS weight_ppm
FROM directed GROUP BY src, dst
""",
        "quality_scores": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       CAST(floor(1000000.0 * len(list_distinct(toks)) / len(toks)) AS BIGINT) AS ttr_ppm
FROM t
""",
        "lang_scores": """
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(list_intersect(toks, ['the','and','for'])) AS en_hits,
         len(list_intersect(toks, ['der','und','nicht'])) AS de_hits,
         len(list_intersect(toks, ['le','et','pour'])) AS fr_hits,
         len(list_intersect(toks, ['el','y','para'])) AS es_hits
  FROM t)
SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
       CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
            WHEN fr_hits >= es_hits THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM s
""",
        "token_topk": """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
ranked AS (
  SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rnk FROM cnts)
SELECT token, cnt, rnk FROM ranked WHERE rnk <= 20
""",
        "cosine_topk": """
WITH e AS (
  SELECT vec_id, embedding AS v,
         sqrt(list_sum(list_transform(range(1, len(embedding)+1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
  FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
         list_sum(list_transform(range(1, len(a.v)+1),
              i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))) / (a.nrm * b.nrm) AS cos
  FROM e a, e b
  WHERE a.vec_id <> b.vec_id AND a.nrm > 0 AND b.nrm > 0),
r AS (
  SELECT vec_id, nn_id, CAST(floor(10000.0 * cos) AS BIGINT) AS cos_e4,
         row_number() OVER (PARTITION BY vec_id
             ORDER BY CAST(floor(10000.0 * cos) AS BIGINT) DESC, nn_id ASC) AS rnk
  FROM p)
SELECT vec_id, nn_id, cos_e4, rnk FROM r WHERE rnk <= 5
""",
        "tpch_q1_counts": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "orders_by_segment": """
SELECT c_mktsegment, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
        "events_daily": """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
FROM events GROUP BY 1, 2
""",
        "sessionization": """
WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
l AS (SELECT user_id, t, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
m AS (SELECT user_id, t, CASE WHEN t - pt > 1800 THEN 1 ELSE 0 END AS _new FROM l),
s AS (SELECT user_id, t,
        CAST(sum(_new) OVER (PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      FROM m)
SELECT user_id, session_no, min(t) AS session_start, max(t) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_no
""",
        "near_dup_pairs": _NGRAM_CTE
        + "SELECT a, b, jaccard_ppm FROM pairs WHERE jraw >= 800000",
    }
