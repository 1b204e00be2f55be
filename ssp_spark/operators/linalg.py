"""Distributed linear algebra over embedding columns: exact quantized
covariance/gram moments and a driver-side PCA power iteration.

Not in the reference (no numeric-array surface exists there); this is a
§6-extension family — covariance structure and principal components are
standard curation diagnostics (embedding-drift checks, whitening,
low-rank projection before clustering).

Design for 100 TB:

- **One pass, one bounded shuffle.** All first moments (S_i), second
  moments (S_ij, upper triangle) and the row count ride ONE groupBy:
  each row explodes its d(d+1)/2 in-row products plus d first-moment
  cells, and map-side combine collapses every partition to <= d(d+3)/2
  cells before the exchange — shuffle volume is O(d² × partitions),
  independent of row count (the kmeans-update pattern, one order up).
  The d² result is model-sized; assembling covariance from moments is
  arithmetic on a tiny frame.
- **Exact by quantization.** Float sums are summation-order-dependent,
  so cross-engine/cross-partitioning bit-parity is impossible in
  doubles. Instead values are fixed-point quantized (floor(x·2^s),
  BIGINT) and the moments are summed in EXACT integer arithmetic —
  order-independent, partitioning-independent, replayable in ANSI SQL.
  The statistic is the covariance OF THE QUANTIZED values — within
  2^-s of the float covariance, and a legitimate statistic in its own
  right (the int8-quantization query already establishes the pattern).
  Overflow bound: |q|_max² · n_rows must stay under 2^63 — for unit-ish
  embeddings at s=13 that is n < ~1e10 rows per aggregation; drop s as
  n grows (documented knob, same trade as any fixed-point sketch).
- **PCA is broadcast-a-model.** The d×d matrix collects driver-side
  (model-sized, like the IVF codebook / kmeans centroids — O(d²), not
  O(data)); power iteration runs on the driver and the resulting
  component vector is compiled back into a zero-shuffle projection
  expression for scoring.

At d beyond a few hundred the in-row explode (d²/2 cells) dominates
CPU; the documented upgrade path is block-wise gram accumulation via
mapInPandas + BLAS (Arrow-batched, still one bounded shuffle), which
changes the kernel, not the plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def quantize_expr(x: F.Column, scale_bits: int) -> F.Column:
    """floor(x · 2^scale_bits) as BIGINT — floor, not round: no tie
    semantics to match across engines."""
    return F.floor(x.cast("double") * F.lit(float(1 << scale_bits))).cast("long")


def covariance_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 13,
) -> DataFrame:
    """(i, j, s, n) exact integer moments of the quantized vectors.

    Rows with j >= 0 carry S_ij = Σ q_i·q_j for the upper triangle
    (j >= i); rows with j = -1 carry the first moments S_i = Σ q_i.
    n is the contributing-row count (identical across cells for
    fixed-width vectors).

    Kernel shape (round 8): the per-row cells are a FLAT LONG ARRAY
    ([q_0..q_{d-1}] ++ row-major upper-tri products), posexploded so
    the data-sized stage moves primitive (d, pos, v) rows — no struct
    allocation per cell (the struct-cell form measured 1.55x slower at
    sf0.1). The DATA pays one partial-aggregated shuffle keyed by
    (d, pos); a second, MODEL-SIZED stage (distinct widths x d(d+3)/2
    rows) maps pos -> (i, j) and re-aggregates, so ragged widths merge
    exactly like before. The triangular inverse there is exact: k is
    the 0-based product offset, i = floor((2d+1 - sqrt((2d+1)^2-8k))/2)
    — the discriminant is a perfect square precisely at run starts, and
    IEEE sqrt of a small perfect square is exact, so floor never
    wavers for d < 2^25.
    """
    # Materialize the quantized array as a named column FIRST: the cell
    # builders below read it via element_at ~d² times per row, and if
    # ``q`` stayed an expression each element_at would re-evaluate the
    # whole d-element quantize transform (measured: 41 s -> ~2 s at
    # sf0.1 for d=64 — the d³ trap).
    base = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)).select(
        F.transform(F.col(vec_col), lambda x: quantize_expr(x, scale_bits)).alias("__q")
    )
    q = F.col("__q")
    d = F.size(q)
    vals = F.concat(
        q,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), d - 1),
                lambda i: F.transform(
                    F.sequence(i, d - 1),
                    lambda j: F.element_at(q, i + 1) * F.element_at(q, j + 1),
                ),
            )
        ),
    )
    cells = base.select(
        F.size("__q").alias("__d"), F.posexplode(vals).alias("pos", "v")
    )
    g1 = cells.groupBy("__d", "pos").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    # model-sized from here: decode (d, pos) -> (i, j), merge widths
    dd = F.col("__d").cast("long")
    pos = F.col("pos").cast("long")
    k = pos - dd
    i_tri = F.floor(
        (2 * dd + 1 - F.sqrt(((2 * dd + 1) * (2 * dd + 1) - 8 * k).cast("double")))
        / 2
    ).cast("long")
    off = i_tri * dd - ((i_tri * (i_tri - 1)) / 2).cast("long")
    i = F.when(pos < dd, pos).otherwise(i_tri).cast("int")
    j = (
        F.when(pos < dd, F.lit(-1).cast("long"))
        .otherwise(i_tri + (k - off))
        .cast("int")
    )
    return (
        g1.select(i.alias("i"), j.alias("j"), "s", "n")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )


def covariance_moments_blas(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 13,
) -> DataFrame:
    """The documented d-beyond-256 kernel swap, made real: identical
    integer moments via Arrow-batched numpy — per batch, Q = floor(X·2^s)
    as int64 and the partial gram is ONE ``Q.T @ Q`` BLAS-shaped matmul
    instead of d(d+3)/2 interpreted HOF cells per row. Each Arrow batch
    emits its d² partial cells (model-sized), and the same
    map-side-combined groupBy finishes the reduction — the PLAN is
    unchanged from covariance_moments (one bounded shuffle), only the
    per-row kernel moved from Catalyst expressions to vectorized numpy.
    int64 accumulation keeps the moments EXACTLY the integers the
    expression kernel produces (same floor, same overflow bound), so the
    two kernels are hash-interchangeable under the same oracle."""
    import numpy as np
    import pandas as pd

    scale = float(1 << scale_bits)

    def gram(batches):
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v) > 0]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            q = np.floor(x * scale).astype(np.int64)
            n, d = q.shape
            g = q.T @ q  # exact: int64 matmul
            s1 = q.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([np.arange(d), iu]).astype("int32"),
                    "j": np.concatenate([np.full(d, -1), ju]).astype("int32"),
                    "s": np.concatenate([s1, g[iu, ju]]),
                    "cnt": np.full(d + len(iu), n, dtype=np.int64),
                }
            )

    cells = df.mapInPandas(gram, schema="i int, j int, s long, cnt long")
    return cells.groupBy("i", "j").agg(
        F.sum("s").alias("s"), F.sum("cnt").alias("n")
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 13,
    kernel: str = "expr",
) -> DataFrame:
    """(i, j, cov) population covariance of the quantized vectors,
    upper triangle (j >= i), de-scaled back to value units.

    cov = ((S_ij - S_i·S_j / n) / n) / 2^(2·scale_bits), evaluated in
    doubles over EXACT integer moments — the division sequence is fixed
    so any engine replaying the integer moments lands on the identical
    float (S_ij and S_i·S_j stay < 2^53 at model sizes, so even the
    double casts are exact).

    The moment frame is localCheckpointed before the branch split:
    without it the first-moment lookups would re-run the full data
    scan+explode per branch (three scans in the static plan); the
    checkpoint pins the d(d+3)/2-row result (model-sized — same
    materialize-the-model rule as the IVF codebook) so the corpus is
    scanned exactly once.

    ``kernel``: 'expr' (Catalyst expression cells — fully JVM, the
    oracle-shaped default) or 'blas' (Arrow-batched numpy gram matmul —
    same exact integers, vectorized CPU; the d-beyond-256 path).
    """
    mk = covariance_moments if kernel == "expr" else covariance_moments_blas
    m = mk(df, vec_col, scale_bits).localCheckpoint()
    firsts = m.filter(F.col("j") == -1).select(
        F.col("i").alias("fi"), F.col("s").alias("fs"), F.col("n").alias("fn")
    )
    cross = m.filter(F.col("j") >= 0)
    descale = float(1 << (2 * scale_bits))
    return (
        cross.join(F.broadcast(firsts.select(F.col("fi").alias("i"), F.col("fs").alias("si"), F.col("fn").alias("n0"))), "i")
        .join(F.broadcast(firsts.select(F.col("fi").alias("j"), F.col("fs").alias("sj"))), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("s").cast("double")
                    - F.col("si").cast("double") * F.col("sj").cast("double") / F.col("n0").cast("double")
                )
                / F.col("n0").cast("double")
                / F.lit(descale)
            ).alias("cov"),
        )
    )


def correlation_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 13,
    kernel: str = "expr",
) -> DataFrame:
    """(i, j, corr) Pearson correlation of the quantized vectors, upper
    triangle — cov(i,j) / sqrt(var_i · var_j) assembled from the SAME
    one-pass exact integer moments as covariance_matrix (cost: the same
    single bounded shuffle; the corr assembly is arithmetic on the
    model-sized cov frame, diagonal joined back twice via broadcast).

    Determinism: the covariance values are bit-identical across engines
    (integer moments, fixed division sequence), and sqrt / divide are
    IEEE correctly-rounded single ops — so the correlations are
    bit-identical too, with no rounding needed. Zero-variance
    dimensions yield NULL (0/0 guarded), same rule both engines. The
    standard embedding-drift / redundant-feature diagnostic: |corr|
    near 1 across dims flags a collapsed or duplicated axis."""
    cov = covariance_matrix(df, vec_col, scale_bits, kernel).localCheckpoint()
    diag = cov.filter(F.col("i") == F.col("j"))
    vi = diag.select(F.col("i"), F.col("cov").alias("var_i"))
    vj = diag.select(F.col("j").alias("j2"), F.col("cov").alias("var_j"))
    return (
        cov.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), F.col("j") == F.col("j2"))
        .select(
            "i",
            "j",
            F.when(
                (F.col("var_i") > 0) & (F.col("var_j") > 0),
                F.col("cov") / F.sqrt(F.col("var_i") * F.col("var_j")),
            ).alias("corr"),
        )
    )


def top_component(cov_rows: list, d: int, iters: int = 50) -> list[float]:
    """Driver-side power iteration on the collected (i, j, cov) upper
    triangle — the model artifact is O(d²), never data-sized. Fixed
    iteration count and a fixed all-ones start vector keep it exactly
    reproducible; the sign convention is component[argmax|component|]>0."""
    mat = [[0.0] * d for _ in range(d)]
    for r in cov_rows:
        mat[r["i"]][r["j"]] = r["cov"]
        mat[r["j"]][r["i"]] = r["cov"]
    v = [1.0] * d
    for _ in range(iters):
        w = [sum(mat[i][k] * v[k] for k in range(d)) for i in range(d)]
        nrm = sum(x * x for x in w) ** 0.5
        if nrm == 0.0:
            return v
        v = [x / nrm for x in w]
    mx = max(range(d), key=lambda i: abs(v[i]))
    if v[mx] < 0:
        v = [-x for x in v]
    return v


def project_expr(vec_col: str, component: list[float]) -> F.Column:
    """Zero-shuffle scoring expression: dot(vec, component) with the
    component compiled in as literals (broadcast-a-model, cf.
    cluster.assign)."""
    lit = F.array(*[F.lit(float(x)) for x in component])
    prods = F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def rp_coefficients(k: int, dims: int, tag: str = "rp") -> list[list[int]]:
    """The k x dims sparse sign-projection matrix, derived from the
    md5-portable hash family (functions.portable_hash64's md5-hex
    profile): coef(j, d) = +1 / -1 / 0 as md5('{tag}|j|d')'s 60-bit
    prefix mod 6 lands on 0 / 1 / rest — Achlioptas' sqrt(3)-sparse
    distribution (2/3 zeros), so each projected dim touches ~dims/3
    inputs. Pure Python, deterministic, replayable cell-for-cell in
    ANSI SQL; the matrix is k x dims literals riding the plan (no
    broadcast join)."""
    import hashlib

    out = []
    for j in range(k):
        row = []
        for d in range(dims):
            h = int(
                hashlib.md5(f"{tag}|{j}|{d}".encode()).hexdigest()[:15], 16
            ) % 6
            row.append(1 if h == 0 else (-1 if h == 1 else 0))
        out.append(row)
    return out


def random_project(
    df: DataFrame,
    k: int = 16,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, proj) — Johnson-Lindenstrauss sparse random projection of a
    ``dims``-dim embedding down to ``k`` integer coordinates (micro
    units): proj[j] = Σ_d coef(j,d) · floor(x_d · scale + 0.5).

    Exact by construction: inputs are quantized to BIGINT micro-units
    FIRST, coefficients are ±1/0, so every projected coordinate is an
    exact integer sum — order-independent, partition-independent,
    bit-identical on any engine (the linalg moment-quantization
    contract). Zero shuffles, zero Python crossings: the coefficient
    matrix is literals, each output dim one zip_with/aggregate fold in
    whole-stage codegen — a pure corpus-scan projection at 100 TB, the
    standard cheap pre-clustering / pre-ANN dimensionality cut.

    Contract: rows where len(vec) != dims are EXCLUDED (the
    ann_lsh_topk ragged-vector rule). Overflow bound: dims · scale ·
    |x|_max must stay far under 2^63 — at unit-ish embeddings and
    micro-unit scale that is ~1e8 headroom per coordinate.
    """
    coefs = rp_coefficients(k, dims)
    # floor(x·scale + 0.5), NOT round(): pure IEEE arithmetic, identical
    # on every engine — Spark's HALF_UP-on-decimal round and DuckDB's
    # differ by 1 near .5 boundaries (the quantize_int8 lesson).
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x * scale + F.lit(0.5)).cast("long")
    )
    projs = [
        F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(c).cast("long") for c in coefs[j]]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"p{j}")
        for j in range(k)
    ]
    return (
        df.filter(F.size(vec_col) == dims)
        .select(F.col(id_col), *projs)
        .select(
            id_col, F.array(*[F.col(f"p{j}") for j in range(k)]).alias("proj")
        )
    )
