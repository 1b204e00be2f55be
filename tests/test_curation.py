"""Hand-computed goldens for the round-3 curation operators: repetition
filtering, cross-document n-gram sharing, TF-IDF, and k-means clustering.
The DuckDB parity suite checks these against SQL oracles on the fixtures;
these tests pin the SEMANTICS on inputs small enough to verify by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark.operators import cluster, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_golden(spark):
    # "a a a a": bigrams [a a, a a, a a] -> top 3/3, distinct 1 -> dup 2/3
    # "x y z": bigrams [x y, y z] -> top 1/2, dup 0
    out = {
        r["doc_id"]: r
        for r in text.repetition_stats(
            _docs(spark, [(1, "a a a a"), (2, "x y z")])
        ).collect()
    }
    assert out[1]["n_bigrams"] == 3
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_bigram_frac"] == round(2 / 3, 4)
    assert out[1]["keep"] == 0
    assert out[2]["n_bigrams"] == 2
    assert out[2]["top_bigram_frac"] == 0.5
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["keep"] == 0  # top frac 0.5 > 0.18


def test_repetition_stats_excludes_short_docs(spark):
    out = text.repetition_stats(_docs(spark, [(1, "solo"), (2, "two words")])).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_corpus_ngram_stats_golden(spark):
    # doc 1 and 2 share their only 3-gram; doc 3 is unique
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "q r s")])
    out = {r["doc_id"]: r for r in text.corpus_ngram_stats(df, n=3).collect()}
    assert out[1]["n_shared"] == 1 and out[1]["dup_flag"] == 1
    assert out[2]["n_shared"] == 1 and out[2]["dup_flag"] == 1
    assert out[3]["n_shared"] == 0 and out[3]["dup_flag"] == 0 and out[3]["shared_frac"] == 0.0


def test_kmeans_separates_two_blobs(spark):
    # two well-separated 2-d blobs; seeds = ids 0 (blob A) and 1 (blob B)
    pts = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (1, [10.0, 10.0]), (4, [10.1, 10.0]), (5, [10.0, 10.1]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"] for r in cluster.kmeans(df, k=2, iters=3).collect()}
    assert {out[0], out[2], out[3]} == {0}
    assert {out[1], out[4], out[5]} == {1}


def test_kmeans_k1_groups_everything(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    rows = cluster.kmeans(df, k=1, iters=2).collect()
    assert {r["cluster"] for r in rows} == {0}
    # centroid after 1 update = mean (2.0); dist2 = (i-2)^2
    assert {r["vec_id"]: r["dist2"] for r in rows} == {0: 4.0, 1: 1.0, 2: 0.0, 3: 1.0, 4: 4.0}


def test_kmeans_assign_tiebreak_lowest_cid(spark):
    df = spark.createDataFrame([(7, [0.5, 0.5])], "vec_id long, embedding array<double>")
    pts = df.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
    # equidistant centroids: the (d2, cid) struct-min must pick cid 3
    out = cluster.assign(pts, [(9, [1.0, 1.0]), (3, [0.0, 0.0])], vec_col="__v").collect()
    assert out[0]["cluster"] == 3
