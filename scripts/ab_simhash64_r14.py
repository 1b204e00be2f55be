#!/usr/bin/env python
"""Round-14 adjacent-state A/B for dedup_simhash64_pairs (VERDICT r13 #1).

2x2 interleaved min-of-N at sf0.1, one session, noop-sinked:
  dedup form: NEW lowest-surviving-band emission vs OLD packed-long DISTINCT
  spread:     hash-on-id (r13) vs round-robin (r12)

The OLD dedup form and the round-robin spread are reconstructed inline,
byte-for-byte the r12/r13 shapes, so each cell differs from its
neighbors by exactly one change.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import ssp_spark.operators.dedup as dedup
from ssp_spark.catalog import load_table
from ssp_spark.functions import portable_hash64, tokens
from ssp_spark.session import (
    adaptive_enabled_for,
    get_spark,
    sized_shuffle_partitions,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

_simhash_hash_spread = dedup.simhash


def _simhash_rr(df, id_col="doc_id", text_col="text", bits=32):
    """r12 shape: round-robin spread (keyless repartition) instead of
    hash-on-id; everything else identical to dedup.simhash."""
    spread = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    spread = spread.filter(F.col("__text").rlike(r"\S"))
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    ths = spread.select(
        "doc_id",
        F.transform(F.array_distinct(tokens(F.col("__text"))), portable_hash64).alias("ths"),
    )
    packed = F.expr(
        f"""
        aggregate(
          aggregate(ths,
            array_repeat(cast(0 as bigint), {bits}),
            (acc, th) -> zip_with(acc, sequence(0, {bits - 1}),
                                  (a, b) -> a + (shiftright(th, b) & 1))),
          named_struct('v', cast(0 as bigint), 'i', 0),
          (s, c) -> named_struct(
            'v', s.v + IF(2 * c > size(ths),
                          shiftleft(cast(1 as bigint), s.i),
                          cast(0 as bigint)),
            'i', s.i + 1),
          s -> s.v)
        """
    )
    return ths.select("doc_id", packed.alias("simhash"))


def pairs_old_distinct(df):
    """r13 tail: band self-join + packed-long DISTINCT + unpack."""
    banded = dedup.banded_fingerprints(df, bits=60, bands=4).persist()
    a = banded.select(F.col("doc_id").alias("id1"), "band", "band_val")
    b = banded.select(F.col("doc_id").alias("id2"), "band", "band_val")
    p = F.shiftleft(F.col("id1").cast("long"), 32) + F.col("id2")
    out = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select(p.alias("p"))
        .distinct()
        .select(
            F.shiftrightunsigned("p", 32).cast("long").alias("id1"),
            F.col("p").bitwiseAND(F.lit((1 << 32) - 1)).alias("id2"),
        )
        .localCheckpoint()
    )
    banded.unpersist()
    return out


def pairs_new(df):
    return dedup.simhash_pairs(df, bits=60, bands=4)


def main() -> None:
    spark = get_spark(
        "ab-simhash64",
        shuffle_partitions=sized_shuffle_partitions(SF_DIR),
        adaptive=adaptive_enabled_for(SF_DIR),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", SF_DIR)

    cells = {
        "new+hash": (pairs_new, _simhash_hash_spread),
        "new+rr": (pairs_new, _simhash_rr),
        "old+hash": (pairs_old_distinct, _simhash_hash_spread),
        "old+rr": (pairs_old_distinct, _simhash_rr),
    }
    best = {k: float("inf") for k in cells}
    # warmup (codegen + listing)
    for name, (fn, sh) in cells.items():
        dedup.simhash = sh
        fn(docs).write.format("noop").mode("overwrite").save()
    counts = {}
    for rep in range(REPS):
        for name, (fn, sh) in cells.items():
            dedup.simhash = sh
            gc.collect()
            t0 = time.perf_counter()
            out = fn(docs)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            if rep == 0:
                counts[name] = out.count()
    dedup.simhash = _simhash_hash_spread
    print("row counts (must all match):", counts)
    for k, v in best.items():
        print(f"{k:10s} min-of-{REPS}: {v:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
