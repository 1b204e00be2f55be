"""Distributed linear algebra: quantized covariance semantics vs numpy,
power-iteration PCA vs numpy.linalg.eigh, and the one-scan/one-shuffle
plan contract. The cross-engine bit-parity signal is the
embedding_covariance oracle row; these pin the numeric semantics."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ssp_spark import plans
from ssp_spark.operators import linalg


def _toy(spark, n=40, d=6, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, 2) @ rng.randn(2, d) + 0.05 * rng.randn(n, d)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return base, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_covariance_matches_numpy_on_quantized_values(spark):
    base, df = _toy(spark)
    got = {(r.i, r.j): r.cov for r in linalg.covariance_matrix(df, scale_bits=13).collect()}
    q = np.floor(base * 8192.0) / 8192.0
    expected = np.cov(q, rowvar=False, bias=True)  # population covariance
    d = base.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), c in got.items():
        assert abs(c - expected[i][j]) < 1e-9, (i, j, c, expected[i][j])


def test_power_iteration_matches_numpy_eigh(spark):
    base, df = _toy(spark, n=60, d=8)
    cov_rows = linalg.covariance_matrix(df, scale_bits=13).collect()
    v = np.array(linalg.top_component(cov_rows, d=8))
    mat = np.zeros((8, 8))
    for r in cov_rows:
        mat[r.i][r.j] = mat[r.j][r.i] = r.cov
    w, vecs = np.linalg.eigh(mat)
    top = vecs[:, np.argmax(w)]
    assert abs(abs(float(np.dot(v, top))) - 1.0) < 1e-6  # same direction
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9


def test_projection_is_zero_shuffle_jvm_side(spark):
    base, df = _toy(spark)
    comp = [1.0 / (i + 1) for i in range(6)]
    proj = df.select("vec_id", linalg.project_expr("embedding", comp).alias("score"))
    s = plans.plan_string(proj, "simple")
    assert plans.exchange_count(proj) == 0
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    # spot-check one value
    row = {r.vec_id: r.score for r in proj.collect()}
    assert abs(row[0] - float(np.dot(base[0], comp))) < 1e-6


def test_covariance_moments_single_scan_data_shuffle_plus_model_stage(spark):
    """The DATA pays exactly one scan and one partial-aggregated
    shuffle (keyed by (width, pos), primitive rows, no struct cells);
    the second exchange feeds the MODEL-SIZED (i, j) decode/merge stage
    — distinct widths x d(d+3)/2 rows, never data-sized."""
    _, df = _toy(spark)
    m = linalg.covariance_moments(df)
    s = plans.plan_string(m, "simple")
    assert plans.exchange_count(m) == 2
    assert s.count("Scan") == 1
    assert "partial_sum" in plans.plan_string(m)  # map-side combine


def test_covariance_handles_null_and_empty_vectors(spark):
    rows = [(1, [1.0, 2.0]), (2, [3.0, 5.0]), (3, None), (4, [])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {(r.i, r.j): r.cov for r in linalg.covariance_matrix(df).collect()}
    # only the two real rows contribute: var over {1,3} and {2,5}
    assert abs(got[(0, 0)] - 1.0) < 1e-6
    assert abs(got[(1, 1)] - 2.25) < 1e-6
    assert abs(got[(0, 1)] - 1.5) < 1e-6


def test_blas_kernel_moments_bit_identical_to_expression_kernel(spark):
    """The Arrow/numpy gram kernel must produce EXACTLY the integers the
    Catalyst expression kernel produces — floor semantics and int64
    accumulation included — so the two are hash-interchangeable under
    one oracle."""
    base, df = _toy(spark, n=50, d=7, seed=11)
    a = {(r.i, r.j): (r.s, r.n) for r in linalg.covariance_moments(df).collect()}
    b = {(r.i, r.j): (r.s, r.n) for r in linalg.covariance_moments_blas(df).collect()}
    assert a == b
    # and on a frame with nulls/empties mixed in
    extra = spark.createDataFrame(
        [(100, None), (101, [])], "vec_id: long, embedding: array<double>"
    )
    df2 = df.union(extra)
    a2 = {(r.i, r.j): (r.s, r.n) for r in linalg.covariance_moments(df2).collect()}
    b2 = {(r.i, r.j): (r.s, r.n) for r in linalg.covariance_moments_blas(df2).collect()}
    assert a2 == b2 == a


def test_random_projection_portable_and_ragged_safe(spark):
    """rp_coefficients is ±1/0 with the documented md5 derivation; the
    projection excludes ragged vectors, is an exact integer map, and
    compiles to a ZERO-exchange, zero-Python plan."""
    import hashlib

    import pyspark.sql.functions as F

    from ssp_spark import plans
    from ssp_spark.operators import linalg

    coefs = linalg.rp_coefficients(4, 8)
    assert all(c in (-1, 0, 1) for row in coefs for c in row)
    h = int(hashlib.md5(b"rp|0|0").hexdigest()[:15], 16) % 6
    assert coefs[0][0] == (1 if h == 0 else (-1 if h == 1 else 0))

    rows = [
        (1, [1.0] * 8),
        (2, [0.5] * 7),          # ragged -> excluded
        (3, [-0.25] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = linalg.random_project(df, k=4, dims=8)
    got = {r.vec_id: list(r.proj) for r in out.collect()}
    assert set(got) == {1, 3}
    # exact closed form: proj[j] = rowsum(coefs[j]) * q where q=floor(x*1e6+0.5)
    for j in range(4):
        s = sum(coefs[j])
        assert got[1][j] == s * 1_000_000
        assert got[3][j] == s * -250_000
    assert plans.exchange_count(out) == 0
    ps = plans.plan_string(out)
    assert "BatchEvalPython" not in ps and "ArrowEvalPython" not in ps


def test_correlation_matrix_closed_forms(spark):
    """Identical dims correlate 1.0, negated dims -1.0, constant dims
    NULL (zero variance) — on dyadic values the whole chain is exact."""
    from ssp_spark.operators import linalg

    rows = [
        (1, [0.5, 0.5, -0.5, 0.25]),
        (2, [0.25, 0.25, -0.25, 0.25]),
        (3, [0.0, 0.0, 0.0, 0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.i, r.j): r.corr for r in linalg.correlation_matrix(df).collect()}
    assert got[(0, 0)] == 1.0
    assert got[(0, 1)] == 1.0    # dim1 == dim0
    assert got[(0, 2)] == -1.0   # dim2 == -dim0 (dyadics: exact floor)
    assert got[(0, 3)] is None   # constant dim -> zero variance -> NULL
    assert got[(3, 3)] is None
