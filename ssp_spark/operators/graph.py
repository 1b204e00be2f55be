"""Iterative graph algorithms over edge-list DataFrames.

The reference has no graph surface (its dedup-adjacent capability is the
hand-rolled keyed fold, /root/reference/node.go:57-64); connected
components already lives in operators/dedup.py (hash-to-min label
propagation). This module adds fixed-iteration PageRank — the canonical
"iterative join + re-aggregate" Spark workload, and a useful curation
signal (authority scoring over citation / link / interaction graphs).

Scale design: per iteration, contributions = ranks ⋈ out-degreed edges
(shuffle on src) then a groupBy on dst (map-side combined, shuffle =
|nodes| × partitions). The edge frame is degree-joined ONCE and cached —
iterations never recompute it. The alternating src/dst keys mean two
exchanges per iteration; that is inherent to expressing PageRank
relationally (GraphX-style vertex-cut partitioning is the specialized
alternative), and both exchanges are key-partitioned with no skew beyond
the graph's own degree distribution (salt hot hubs upstream if needed).

Determinism: fixed iteration count, no RNG; float summation order across
partitions differs from a serial engine by ~1e-15 relative, far inside
the round-6 output contract. The DuckDB oracle replays every iteration
with the same literals and operations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` rounds of r' = (1-d)/N + d·Σ r_u/deg_u.

    Contract: ``edges`` must be distinct and SYMMETRIC (every edge also
    reversed) — then every node has out- and in-edges, so no dangling-mass
    redistribution is needed and the source-node set IS the node set.
    """
    deg = edges.groupBy(src).agg(F.count("*").alias("__deg"))
    ed = edges.join(deg, src).persist()
    nodes = ed.select(F.col(src).alias("node")).distinct()
    n = nodes.count()  # one scalar to the driver, like any count()
    if n == 0:
        # empty graph: the empty rank frame, not 1.0/0 (round-6 sweep)
        return nodes.select("node", F.lit(None).cast("double").alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = ed.join(ranks, ed[src] == ranks["node"]).select(
            F.col(dst).alias("node"), (F.col("rank") / F.col("__deg")).alias("__c")
        )
        ranks = contribs.groupBy("node").agg(
            (F.lit((1 - damping) / n) + F.lit(damping) * F.sum("__c")).alias("rank")
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
