"""Distributed sketch operators: Count-Min and Bloom.

The reference engine has no sketch operators; these are §6-style
training-pipeline extensions (the reference's analogue would be a
stateful node folding per-key counters, node.go:66-73). Both sketches
are built with plain aggregations, so they inherit Spark's partial
aggregation: every executor folds its partition into sketch cells
map-side and only the (tiny, bounded-size) cell space shuffles — the
defining property that makes a sketch preferable to exact counting at
100 TB.

Determinism: cell indexes come from the md5-portable hash family
(functions.portable_hash64 / seeded_hash32), so a DuckDB oracle
reproduces every cell bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ssp_spark.functions import portable_hash64, seeded_hash32


def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch of a column: (d, w, cnt) cell rows.

    One explode by `depth` (constant fan-out), ONE shuffle of at most
    depth*width cells after map-side partial counts. The sketch is a
    bounded-size summary regardless of input size — the point at scale.
    """
    base = df.select(portable_hash64(F.col(col)).alias("h64"))
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (seeded_hash32(F.col("h64"), d, depth) % width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        rows.select(F.col("cell.d").alias("d"), F.col("cell.w").alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates from a CMS: est(key) = min over d of cell(d, h_d(key)).

    The sketch is depth*width rows — broadcast it; keys never shuffle.
    Overestimates only (classic CMS guarantee), exact when no collision.
    """
    probes = keys.select(
        F.col(key_col), portable_hash64(F.col(key_col)).alias("h64")
    ).select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (seeded_hash32(F.col("h64"), d, depth) % width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.d").alias("d"), F.col("cell.w").alias("w"))
    return (
        probes.join(F.broadcast(sketch), ["d", "w"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def bloom_bits(
    df: DataFrame,
    col: str,
    num_hashes: int = 5,
    num_bits: int = 4096,
) -> DataFrame:
    """Bloom filter as its set-bit positions: one `bit` column, distinct.

    Build = constant fan-out explode + distinct over at most num_bits
    values; the filter is bounded-size no matter the input. (Spark's own
    Bloom push-down uses an opaque binary; emitting positions keeps the
    artifact engine-portable and oracle-checkable.)
    """
    base = df.select(portable_hash64(F.col(col)).alias("h64"))
    return (
        base.select(
            F.explode(
                F.array(
                    *[
                        (seeded_hash32(F.col("h64"), s, num_hashes) % num_bits).alias("b")
                        for s in range(num_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_might_contain(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_hashes: int = 5,
    num_bits: int = 4096,
) -> DataFrame:
    """(key, member) — member=true iff ALL k probe bits are set.

    Probe = left join of the key's k positions against the broadcast bit
    set; no false negatives, bounded false-positive rate (the standard
    Bloom contract).
    """
    probes = keys.select(
        F.col(key_col), portable_hash64(F.col(key_col)).alias("h64")
    ).select(
        key_col,
        F.explode(
            F.array(
                *[
                    (seeded_hash32(F.col("h64"), s, num_hashes) % num_bits).alias("b")
                    for s in range(num_hashes)
                ]
            )
        ).alias("bit"),
    )
    marked = probes.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(key_col).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0)))).alias("member")
    )


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """HyperLogLog register table: (group..., j, r) with j in [0, 2^p) and
    r = max over the bucket of rho(w), the 1-based leading-zero rank of
    the hash suffix.

    Split of the 60-bit portable hash: j = low p bits, w = high 60-p bits;
    rho(w) = (60-p) - bitlen(w) + 1, with the all-zero suffix pinned to
    the max rank 61-p. bitlen comes from length(bin(w)) — an exact
    integer-string op both engines compute identically, so no float log2
    enters the register math.

    ONE shuffle of at most |groups| * 2^p register rows after map-side
    partial max — the register table is a bounded mergeable summary
    (merge = elementwise max), which is what makes HLL the distinct-count
    path at 100 TB: substreams sketch independently and max-combine.
    """
    m = 1 << p
    max_rho = 61 - p
    base = df.select(*group_cols, portable_hash64(F.col(col)).alias("h64"))
    w = F.shiftright(F.col("h64"), p)
    rho = F.when(w == 0, F.lit(max_rho)).otherwise(
        F.lit(max_rho) - F.length(F.bin(w))
    )
    return (
        base.select(
            *group_cols,
            F.col("h64").bitwiseAND(F.lit(m - 1)).alias("j"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Cardinality estimates from an HLL register table (Flajolet et al.
    2007): E = alpha_m * m^2 / sum(2^-M_j), with the small-range linear-
    counting correction m*ln(m/V) when E <= 2.5m and V (empty registers)
    > 0.

    Determinism across engines: the indicator sum is kept EXACT by
    summing 2^(maxr - r) as integers (S <= m * 2^maxr < 2^63 for p >= 6),
    and alpha*m^2*2^maxr is folded into one Python-float literal both
    engines parse identically — so the only cross-engine float ops are a
    single IEEE division and (on the small-range branch) one ln, rounded
    to an integer estimate. Input is register rows (bounded), so this
    aggregate is O(groups * 2^p) regardless of data size.
    """
    m = 1 << p
    max_rho = 61 - p
    const = hll_alpha_m2_pow(p)
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - r)")).alias("s_nz"),
    )
    s = F.col("s_nz") + (F.lit(m) - F.col("nz")) * F.lit(1 << max_rho)
    e_raw = F.lit(const) / s.cast("double")
    v = F.lit(m) - F.col("nz")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))),
    ).otherwise(F.round(e_raw))
    return per.select(
        *group_cols,
        F.col("nz").cast("int").alias("registers_used"),
        est.cast("long").alias("est"),
    )


def hll_alpha_m2_pow(p: int) -> float:
    """alpha_m * m^2 * 2^(61-p) as one Python float — the single literal
    constant both the Spark plan and the SQL oracle embed (repr round-
    trips exactly, so both engines parse the identical IEEE double)."""
    m = 1 << p
    return 0.7213 / (1.0 + 1.079 / m) * m * m * 2.0 ** (61 - p)


def bloom_mask_words(bits: list[int], num_bits: int = 4096) -> list[int]:
    """Pack set-bit positions into num_bits/64 signed 64-bit words — the
    driver-side literal form of the filter (num_bits/8 bytes total, a
    model artifact like the IVF codebook, never proportional to data)."""
    words = [0] * (num_bits // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member(
    col: Column,
    mask_words: list[int],
    num_hashes: int = 5,
    num_bits: int = 4096,
) -> Column:
    """Row-level Bloom membership against a literal word mask: TRUE iff
    all k probe bits are set. No false negatives, so it is a sound
    PRE-filter before an exact join — the runtime-filter/semi-join-
    reduction pattern: the big side drops non-matching rows BEFORE the
    shuffle, paying k integer hashes per row against a baked-in literal
    (zero joins, zero extra scans, full codegen)."""
    h = portable_hash64(col)
    mask = F.array(*[F.lit(w).cast("long") for w in mask_words])
    cond = F.lit(True)
    for s in range(num_hashes):
        p = seeded_hash32(h, s, num_hashes) % num_bits
        word = F.element_at(mask, (p / F.lit(64)).cast("int") + 1)
        cond = cond & (F.getbit(word, p % 64) == 1)
    return cond


def kmv_signatures(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k theta) signature:
    the k smallest DISTINCT portable 60-bit hashes of ``item_col`` —
    (group, h, rk) with rk = 1..k ascending. The one sketch family
    whose set ALGEBRA (union/intersection/Jaccard, kmv_pair_estimates)
    stays exact-to-the-sketch under merge, which HLL cannot do for
    intersections.

    Scale: the distinct pass is one map-side-combined shuffle on
    (group, h); the bottom-k filter compiles to WindowGroupLimit, so
    every task keeps only its local k smallest before the exchange —
    the signature leaving each executor is k-bounded. Deterministic by
    construction (md5-derived hashes, integer order) and replayable in
    ANSI SQL — the oracle property."""
    h = portable_hash64(F.col(item_col).cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("h")
    return (
        df.select(F.col(group_col), h.alias("h"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_pair_estimates(sigs: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Pairwise distinct-set estimates from KMV signatures: for every
    unordered group pair, merge the two signatures, keep the k smallest
    of the union, and read off

    - ``est_union``  = (k'-1) · 2^60 / h_k'   (k' = min(k, |union sig|)),
      exact when the union sketch isn't full (then it IS the union);
    - ``est_jaccard`` = |bottom-k'(A ∪ B) ∩ A ∩ B| / k'  (the standard
      KMV coincidence estimator);
    - ``est_intersection`` = round(est_jaccard · est_union).

    Cost is sketch-sized end to end: |groups|² · k rows max through the
    merge window — model data, never corpus data. The pair frame is
    built from the signatures alone, so at 100 TB this stage runs on a
    few KB per group regardless of input size."""
    from pyspark.sql import Window

    a = sigs.select(
        F.col(group_col).alias("ga"), F.col("h").alias("h")
    )
    b = sigs.select(
        F.col(group_col).alias("gb"), F.col("h").alias("h")
    )
    pairs = (
        a.select("ga").distinct()
        .join(b.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    merged = (
        sigs.withColumnRenamed(group_col, "g")
        .join(
            F.broadcast(pairs),
            (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "h")
        .agg(
            F.max(F.when(F.col("g") == F.col("ga"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("g") == F.col("gb"), 1).otherwise(0)).alias("in_b"),
        )
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    bottom = merged.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    est_u = F.when(
        F.col("ku") < F.lit(k),
        F.col("ku").cast("double"),  # union sketch not full -> exact
    ).otherwise(
        (F.col("ku") - 1).cast("double") * F.lit(float(1 << 60)) / F.col("hk")
    )
    return (
        bottom.groupBy("ga", "gb")
        .agg(
            F.count("*").alias("ku"),
            F.max("h").alias("hk"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("both"),
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.col("ku").cast("long").alias("k_used"),
            F.round(est_u, 4).alias("est_union"),
            F.round(
                F.col("both").cast("double") / F.col("ku").cast("double"), 6
            ).alias("est_jaccard"),
            F.round(
                est_u * F.col("both").cast("double")
                / F.col("ku").cast("double"),
                4,
            ).alias("est_intersection"),
        )
    )
