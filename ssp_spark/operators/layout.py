"""Data-layout operators: total-order range sharding (and the boundary
computation that drives it).

Not in the reference (it has no storage-layout surface); §6-extension
territory: producing globally-ordered output shards is how a 100 TB
export gets both balanced files and range-prunable reads (time-ordered
training shards, key-range handoffs to downstream systems).

Design for scale — total order WITHOUT a global sort:

- A global ``orderBy`` funnels everything through one task chain; the
  scalable shape is the one Spark itself uses in ``repartitionByRange``:
  pick S-1 split points, then assign each row to its range map-side
  (zero-shuffle projection) and let each shard sort locally if needed.
- Here the split points are EXACT rank-based order statistics computed
  from the value histogram (groupBy(value).count -> cumulative count):
  one partial-aggregated shuffle over the distinct-value space, a
  window over the histogram (value-cardinality-sized, far smaller than
  the data), and a model-sized collect of S-1 boundary values — the
  broadcast-a-model pattern (cf. cluster.assign, similarity.ivf_topk).
  Exactness makes the assignment deterministic and SQL-replayable —
  the oracle property. At 100 TB with near-unique keys the histogram
  approaches data size; the documented swap is approximate boundaries
  (``percentile_approx`` or reservoir sampling, exactly what
  repartitionByRange does) — the assignment stage is unchanged.
- Boundary semantics: b_k = the r_k-th smallest value (1-based,
  multiset rank), r_k = max(1, floor(n·k/S)); a row lands in shard
  ``count(b_k < value)``, so ties never straddle a shard boundary and
  every engine computing the same definition lands identical shards.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_range_boundaries(df: DataFrame, value_col: str, n_shards: int) -> list:
    """S-1 exact rank-based split points of ``value_col``.

    One histogram shuffle + a histogram-sized window + an S-1-row
    collect (the model artifact). The single-partition window runs over
    DISTINCT values with counts — the exact path; swap for
    percentile_approx at near-unique-key scale (see module docstring).

    Round 13 (optimization): the total row count used for the rank
    targets r_k = max(1, floor(n·k/S)) is derived INSIDE the histogram
    pass (an unbounded-frame sum over the same single-partition window
    the cumulative counts already run on) instead of a separate
    ``df.count()`` action — one job instead of two, and for DERIVED
    inputs (several consumers pass filtered/joined frames) the count
    was a full recomputation of the upstream subtree. Ranks, boundary
    semantics, and ties are bit-identical (exact integer arithmetic on
    both paths; the property tests cover n < n_shards).
    """
    return _boundaries_from_hist(
        df.groupBy(F.col(value_col).alias("v")).agg(F.count("*").alias("cnt")),
        n_shards,
    )


def _boundaries_from_hist(hist: DataFrame, n_shards: int) -> list:
    """exact_range_boundaries' rank computation over an already-built
    (v, cnt) histogram — factored out (round 13) so consumers that also
    AGGREGATE per value (range_shard_manifest) can persist the histogram
    once and reuse it for both the boundary collect and the manifest,
    instead of scanning the base twice."""
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.withColumn("cumn", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    # key the probe rows by the shard INDEX k, not the rank value: with
    # n < n_shards several split points share a rank, and grouping by
    # the rank value would collapse them into one boundary (returning
    # S-2 or fewer split points — caught by the property test)
    bounds = (
        cum.select(
            "v",
            "cumn",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(n_shards - 1))).alias("k"),
        )
        .filter(
            F.col("cumn")
            >= F.expr(
                f"greatest(CAST(1 AS BIGINT), (n * CAST(k AS BIGINT)) div {n_shards})"
            )
        )
        .groupBy("k")
        .agg(F.min("v").alias("b"))
        .collect()
    )
    return [r["b"] for r in sorted(bounds, key=lambda r: r["k"])]


def shard_expr(value_col: str, boundaries: list) -> F.Column:
    """Zero-shuffle shard assignment: count of boundaries strictly below
    the value, with the boundaries compiled in as literals."""
    lit = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(lit, lambda b: b < F.col(value_col))).cast("int")


def range_shard_manifest(
    df: DataFrame, value_col: str, n_shards: int = 8, checkpoint: bool = True
) -> DataFrame:
    """(shard, n_rows, min_v, max_v) for the exact range sharding —
    the manifest a writer would use to emit globally-ordered shards
    (shard s holds exactly the rows between split points s-1 and s).

    Round 13 (guide §2.4): the manifest aggregates (count/min/max per
    shard) are all computable from the (v, cnt) HISTOGRAM the boundary
    pass already built — grouping by distinct value first loses nothing
    for count/min/max — so the histogram is persisted once and reused
    for both the boundary collect and the manifest, instead of scanning
    and re-aggregating the base table a second time. The 8-row manifest
    is localCheckpoint-ed so the histogram blocks release before
    return; output is bit-identical (same boundaries, same shard
    function, exact integer counts).

    WARNING — ``checkpoint=False`` LEAKS the persisted histogram by
    design (ADVICE r13): it exists ONLY for plan inspection in tests
    (the eager checkpoint would truncate the manifest plan to an
    ExistingRDD scan), and the histogram stays pinned in the block
    manager until the caller's session ends or something unpersists it.
    Production callers must use the default ``checkpoint=True``; a
    caller who needs the lazy plan AND block hygiene must
    ``.unpersist()`` the InMemoryRelation themselves."""
    hist = (
        df.select(F.col(value_col).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    bounds = _boundaries_from_hist(hist, n_shards)
    out = (
        hist.withColumn("shard", shard_expr("v", bounds))
        .groupBy("shard")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
    if not checkpoint:
        return out
    out = out.localCheckpoint()
    hist.unpersist()
    return out


def global_order_positions(
    df: DataFrame,
    order_col: str,
    id_col: str,
    n_shards: int = 32,
    boundaries: list | None = None,
) -> DataFrame:
    """Exact 0-based global rank by ``(order_col, id_col)`` WITHOUT a
    global sort — the deterministic-corpus-shuffle primitive: stamp every
    training example with its reproducible position in the shuffled
    order (order_col = a seeded hash), so any worker can stream its
    slice of the corpus in the exact same order every epoch.

    Plan (the repartitionByRange decomposition, completed to exact
    ranks): (1) approximate range boundaries of ``order_col`` via
    ``approxQuantile`` (one partial-aggregated pass; boundary QUALITY
    only affects shard balance — position EXACTNESS never depends on
    where the cuts land, so the approximate sketch is safe here in a
    way it would not be for the range_shard_manifest contract);
    (2) map-side shard assignment against the S-1 literal boundaries;
    (3) per-shard counts -> an S-row driver collect -> prefix-sum
    offsets compiled back as a literal map (the broadcast-a-model
    pattern); (4) position = offset[shard] + (per-shard row_number by
    (order, id) - 1). The only sorts are shard-local and run in
    parallel; no stage funnels the corpus through one task. Rows with
    equal ``order_col`` always share a shard (strict-less boundary
    comparison), so the within-shard (order, id) tie-break reproduces
    the exact global (order, id) order.

    ``boundaries``: precomputed split points to reuse instead of paying
    the approxQuantile sketch again — ANY value list yields exact
    positions (boundary quality only moves shard balance), so a caller
    ranking several same-distribution frames (or a derived column such
    as a negation) can amortize one sketch across the calls.
    """
    if boundaries is not None:
        bounds = list(boundaries)
    else:
        probs = [k / n_shards for k in range(1, n_shards)]
        bounds = df.stat.approxQuantile(order_col, probs, 0.001)
    # keep integral boundaries integral (the literal list compiles into
    # the comparison expression — int vs double literals change nothing
    # semantically, but int keeps codegen on the long path); fractional
    # order columns (e.g. Theil-Sen slopes) keep their double boundaries
    if dict(df.dtypes).get(order_col) in {"tinyint", "smallint", "int", "bigint"}:
        bounds = [int(b) for b in bounds]
    sharded = df.withColumn("__shard", shard_expr(order_col, bounds))
    counts = {
        r["__shard"]: r["n"]
        for r in sharded.groupBy("__shard").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for s in range(len(bounds) + 1):
        offsets[s] = acc
        acc += counts.get(s, 0)
    off_map = F.create_map(
        *[x for s, o in offsets.items() for x in (F.lit(s), F.lit(o))]
    )
    w = Window.partitionBy("__shard").orderBy(order_col, id_col)
    return sharded.withColumn(
        "position",
        (off_map[F.col("__shard")] + F.row_number().over(w) - 1).cast("long"),
    ).drop("__shard")


def compaction_plan(
    df: DataFrame,
    part_col: str,
    id_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner: group ``part_col``'s items (files /
    docs) into contiguous ~``target_bytes`` bins in ``id_col`` order —
    the manifest a lakehouse compactor or shard writer executes (one
    rewrite task per (partition, bin)). Not in the reference (no storage
    surface); §6-extension territory alongside range sharding above.

    Bin rule — exclusive-prefix-sum offset binning:
    ``bin = floor((cumsum_inclusive - size) / target)``, i.e. an item
    belongs to the bin its START offset falls in. Deterministic and
    engine-replayable (one window cumsum; no sequential greedy state),
    and every bin's total is < target + its last item — the same bound a
    first-fit sequential packer gives on sorted-by-position input.

    Scale: ONE keyed exchange (window partitioned by ``part_col``,
    ordered by ``id_col``) plus a map-side-combined groupBy on
    (partition, bin); no global sort, no driver collect. A pathological
    single giant partition serializes into one task — the documented
    swap is pre-splitting it with ``global_order_positions`` and binning
    on the stamped rank, which this operator's bin rule survives
    unchanged (offsets are what it consumes).
    """
    w = Window.partitionBy(part_col).orderBy(id_col)
    binned = (
        df.select(
            F.col(part_col),
            F.col(id_col),
            F.col(size_col).cast("long").alias("__sz"),
        )
        .withColumn("__start", F.sum("__sz").over(w) - F.col("__sz"))
        # integer div, not double /: exact past 2^53 cumulative bytes
        .withColumn("bin", F.expr(f"__start div {int(target_bytes)}"))
    )
    return binned.groupBy(part_col, "bin").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("__sz").cast("long").alias("bin_bytes"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
