"""Similarity search over embedding columns (array<float>).

Two tiers, per the build plan (SURVEY.md §7 Phase 6):

- brute-force cosine top-k: exact baseline. Queries are broadcast, the
  corpus streams; per-corpus-partition partial top-k happens before the
  final shuffle (WindowGroupLimit), so the plan is a single broadcast
  join + one small shuffle of k*|queries| rows — valid at 100 TB corpus
  as long as |queries| is broadcast-sized.
- LSH-bucketed (random-hyperplane signs): restricts candidates to
  matching buckets; the scale path when queries are also huge. Bucket
  ids use deterministic pseudo-random hyperplanes derived from the
  md5-portable hash so results are reproducible across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ssp_spark.functions import cosine, portable_hash64


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded).

    Deterministic: ties broken by neighbor id.
    """
    from ssp_spark.functions import dot, norm

    # norms once per vector on each side; corpus rebalanced so the
    # quadratic scoring stage uses every core even off few row groups
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")).withColumn(
        "qn", norm("qv")
    )
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism).withColumn("nn", norm("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", F.round(dot("qv", "nv") / (F.col("qn") * F.col("nn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Plane p's component for dimension d is a deterministic +-1 derived
    from portable_hash64('p:d') — reproducible in SQL, no stored model.
    bucket = sum over planes of sign-bit << p.
    """
    dims = F.size(F.col(vec_col))
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    ids = F.sequence(F.lit(0), dims - 1)

    def plane_dot(p):
        comps = F.transform(
            ids,
            lambda d: (
                (portable_hash64(F.concat(p.cast("string"), F.lit(":"), d.cast("string")))
                 .bitwiseAND(F.lit(1)) * 2 - 1).cast("double")
                * F.element_at(F.col(vec_col), d + 1).cast("double")
            ),
        )
        return F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.aggregate(
        F.transform(
            planes,
            lambda p: F.when(plane_dot(p) > 0, F.pow(F.lit(2.0), p).cast("int")).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("bucket", bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Join is an equi-join on bucket (shuffle-hash, no cross product) —
    the 100 TB-scale path when the query set itself is large.
    """
    from ssp_spark.functions import dot, norm

    qb = lsh_buckets(queries, id_col, vec_col, n_planes).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    ).withColumn("qn", norm("qv"))
    cb = lsh_buckets(
        corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism),
        id_col,
        vec_col,
        n_planes,
    ).select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket").withColumn(
        "nn", norm("nv")
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", F.round(dot("qv", "nv") / (F.col("qn") * F.col("nn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    )
