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
- IVF (inverted-file index): a small centroid codebook is collected to
  the driver and baked into the plan as literals (the standard "broadcast
  the model" pattern — the codebook is tiny by construction, the corpus
  is not). Cell assignment is then a pure map-side Catalyst expression:
  the 100 TB corpus is never shuffled to be indexed, and search is an
  equi-join on cell id.
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) index
# ---------------------------------------------------------------------------


def ivf_codebook(
    centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Collect a (small) centroid set to a driver-side codebook.

    Collecting is deliberate and scale-safe: an IVF codebook is O(n_cells)
    (hundreds to tens of thousands of vectors), a model artifact — the
    analogue of broadcasting a k-means model. Everything downstream stays
    distributed.
    """
    rows = centroids.select(id_col, vec_col).collect()
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def _py_norm(vals: list[float]) -> float:
    """Sequential index-order L2 norm — the exact IEEE op sequence DuckDB's
    sqrt(list_dot_product(v, v)) performs, so centroid norms baked in as
    literals stay bit-identical to the oracle's."""
    import math

    acc = 0.0
    for x in vals:
        acc += x * x
    return math.sqrt(acc)


def ivf_cells(
    df: DataFrame,
    codebook: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_col: str = "cells",
) -> DataFrame:
    """array<bigint> of the nprobe nearest centroid ids per vector.

    Pure map-side Catalyst expression (no shuffle, no Python at row
    level): per centroid, an index-order dot product against the literal
    codebook vector; nearest-cell choice via array_sort on
    (2 - round(cos, 6), cid) structs. The +2 offset keeps the sort key
    strictly positive so IEEE ±0.0 can never make engines disagree on
    ordering; ties break on centroid id, matching the oracle's
    ORDER BY cos DESC, cid.
    """
    from ssp_spark.functions import dot, norm

    vn = norm(F.col(vec_col))
    entries = []
    for cid, cv in codebook:
        arr = F.array(*[F.lit(float(x)).cast("double") for x in cv])
        cos = F.round(dot(F.col(vec_col), arr) / (vn * F.lit(_py_norm(cv))), 6)
        entries.append(
            F.struct((F.lit(2.0) - cos).alias("negkey"), F.lit(cid).cast("long").alias("cid"))
        )
    cells = F.transform(
        F.slice(F.array_sort(F.array(*entries)), 1, nprobe), lambda s: s["cid"]
    )
    return df.withColumn(out_col, cells)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file index.

    Plan shape (the IVF contract at scale): corpus vectors are assigned
    map-side to exactly one cell; each query probes its nprobe nearest
    cells; search is a shuffle-hash equi-join on cell id touching only
    ~nprobe/n_cells of the corpus per query, followed by WindowGroupLimit
    partial top-k. No cross product anywhere.
    """
    from ssp_spark.functions import dot, norm

    codebook = ivf_codebook(centroids, id_col, vec_col)
    c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    c = (
        ivf_cells(c, codebook, vec_col, nprobe=1)
        .select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nv"),
            F.element_at("cells", 1).alias("cell"),
        )
        .withColumn("nn", norm("nv"))
    )
    q = (
        ivf_cells(queries, codebook, vec_col, nprobe=nprobe)
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.explode("cells").alias("cell"),
        )
        .withColumn("qn", norm("qv"))
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", F.round(dot("qv", "nv") / (F.col("qn") * F.col("nn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    )
