#!/usr/bin/env python
"""Round-14 experiment (VERDICT r13 #2): the triangle closing stage at
the 10x fixture. Builds the oriented edge list ek ONCE (the exact
query-code shape: day-capped pair stage, >=28 shared days, degree
orientation), materializes it, then A/Bs closing forms over the same
blocks:

  wedge  — the shipped w1 x broadcast(w2) join + broadcast closing probe
  inter  — per-edge sorted-adjacency intersection: n_triangles =
           sum over oriented edges (u,v) of |out(u) & out(v)| (each
           triangle counted once at its lowest edge under the total
           order), via two broadcast adjacency joins + array_intersect.

Also prints the wedge count and out-degree tail, the skew evidence.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ssp_spark.catalog import load_table
from ssp_spark.queries import _capped_user_days
from ssp_spark.session import (
    adaptive_enabled_for,
    get_spark,
    sized_shuffle_partitions,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scalefix/sf1")
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    spark = get_spark(
        "ab-triangle-close",
        shuffle_partitions=sized_shuffle_partitions(SF_DIR),
        adaptive=adaptive_enabled_for(SF_DIR),
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, "events", SF_DIR)
    ud = _capped_user_days(ev, min_days=28).persist()
    a = ud.select(F.col("user_id").alias("u1"), "day")
    b = ud.select(F.col("user_id").alias("u2"), "day")
    pair = F.shiftleft(F.col("u1").cast("long"), 32) + F.col("u2")
    edges = (
        a.join(b, "day")
        .filter(F.col("u1") < F.col("u2"))
        .select(pair.alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("shared_days"))
        .filter(F.col("shared_days") >= 28)
        .select(
            F.shiftrightunsigned("p", 32).cast("long").alias("u1"),
            F.col("p").bitwiseAND(F.lit((1 << 32) - 1)).alias("u2"),
        )
        .persist()
    )
    t0 = time.perf_counter()
    edge_cnt = edges.count()
    print(f"pair stage: {time.perf_counter() - t0:.2f} s, {edge_cnt} edges")
    ud.unpersist()
    deg = (
        edges.select(F.col("u1").alias("u"))
        .unionAll(edges.select(F.col("u2").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    k = lambda d, u: F.shiftleft(F.col(d).cast("long"), 32) + F.col(u)
    ek = (
        edges.join(F.broadcast(deg.select(F.col("u").alias("u1"), F.col("d").alias("d1"))), "u1")
        .join(F.broadcast(deg.select(F.col("u").alias("u2"), F.col("d").alias("d2"))), "u2")
        .select(
            F.when(k("d1", "u1") < k("d2", "u2"), F.col("u1")).otherwise(F.col("u2")).alias("src"),
            F.when(k("d1", "u1") < k("d2", "u2"), k("d2", "u2")).otherwise(k("d1", "u1")).alias("kdst"),
            F.when(k("d1", "u1") < k("d2", "u2"), F.col("u2")).otherwise(F.col("u1")).alias("dst"),
        )
        .localCheckpoint()
    )
    edges.unpersist()

    # skew evidence: out-degree tail + wedge count
    od = ek.groupBy("src").agg(F.count("*").alias("od"))
    stats = od.agg(
        F.max("od").alias("max"),
        F.expr("percentile_approx(od, 0.5)").alias("p50"),
        F.expr("percentile_approx(od, 0.99)").alias("p99"),
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("wedges"),
        F.count("*").alias("n_src"),
    ).collect()[0]
    print("out-degree: max", stats["max"], "p50", stats["p50"], "p99",
          stats["p99"], "n_src", stats["n_src"], "wedges", int(stats["wedges"]))

    def close_wedge():
        w1 = ek.select("src", F.col("dst").alias("b"), F.col("kdst").alias("kb"))
        w2 = ek.select("src", F.col("dst").alias("c"), F.col("kdst").alias("kc"))
        wedges = w1.join(F.broadcast(w2), "src").filter(F.col("kb") < F.col("kc"))
        closing = ek.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        return wedges.join(F.broadcast(closing), ["b", "c"]).agg(
            F.count("*").cast("long").alias("n_triangles")
        )

    def close_inter():
        adj = ek.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        au = adj.select(F.col("src").alias("ju"), F.col("nbrs").alias("nu"))
        av = adj.select(F.col("src").alias("jv"), F.col("nbrs").alias("nv"))
        return (
            ek.select("src", "dst")
            .join(F.broadcast(au), F.col("src") == F.col("ju"))
            .join(F.broadcast(av), F.col("dst") == F.col("jv"))
            .select(F.size(F.array_intersect("nu", "nv")).alias("t"))
            .agg(F.sum("t").cast("long").alias("n_triangles"))
        )

    forms = {"wedge": close_wedge, "inter": close_inter}
    vals = {}
    best = {k: float("inf") for k in forms}
    for name, fn in forms.items():  # warm + value check
        vals[name] = fn().collect()[0][0]
    print("n_triangles:", vals, "equal:", len(set(vals.values())) == 1)
    for _ in range(REPS):
        for name, fn in forms.items():
            gc.collect()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    for kk, v in best.items():
        print(f"{kk:6s} min-of-{REPS}: {v:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
