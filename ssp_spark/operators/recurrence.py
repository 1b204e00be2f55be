"""Keyed sequential recurrences (scans): EMA smoothing, CUSUM drift
detection.

Window functions cover ASSOCIATIVE running aggregates (sums, counts,
min/max — running_user_spend et al.); a recurrence like EMA
(y_t = (x_t + 3*y_{t-1}) / 4) or CUSUM (s_t = max(0, s_{t-1} + x_t - k))
is non-associative, so no frame rewrite exists. This is precisely the
case the build rules reserve Python for: the per-key fold runs inside
applyInPandas (Arrow-batched, one key's ordered series at a time), which
is also the reference's own O2 shape — its keyed stateful fold
(/root/reference/node.go:57-73) IS a sequential scan; Spark expresses
the same thing with keyed Arrow batches instead of per-record channel
hops.

Scale: one hash exchange on the key (the applyInPandas groupBy), then a
per-key in-memory fold — linear, state one scalar per key; a single
key's history must fit a worker (the sessionization cost class; salt or
window upstream if one key dominates). Determinism: EMA with a
power-of-two rational alpha folds the IDENTICAL float64 op sequence both
engines replay (the oracle steps the same recursion in a recursive CTE);
CUSUM is pure integer arithmetic — exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import math

import pyspark.sql.functions as F  # noqa: F401 (kept for API symmetry)
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def keyed_ema(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """(key, step, value, ema) — exponential moving average per key over
    the ``order``-sorted series: y_1 = x_1;
    y_t = (alpha_num*x_t + (alpha_den-alpha_num)*y_{t-1}) / alpha_den.

    With alpha_den a power of two the fold is a reproducible float64
    instruction sequence — the DuckDB oracle replays it step by step in
    a recursive CTE and matches bit-for-bit (output rounded to 6dp as
    belt-and-suspenders, same convention as every float query here).
    """
    import pandas as pd

    a, b = alpha_num, alpha_den - alpha_num

    def _round6(y: float) -> float:
        # sign-aware HALF_UP to match DuckDB round(): Python's round()
        # is half-EVEN, and EMA values are dyadic rationals (4^-t
        # fractions), so exact .5e-6 ties ARE reachable and would
        # diverge — e.g. round(0.0078125, 6)
        return math.copysign(math.floor(abs(y) * 1e6 + 0.5) / 1e6, y)
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("step", T.IntegerType()),
            T.StructField("value", T.LongType()),
            T.StructField("ema", T.DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        y = None
        out = []
        for step, x in enumerate(pdf[value], start=1):
            x = float(x)
            y = x if y is None else (a * x + b * y) / alpha_den
            out.append((int(pdf[key].iloc[0]), step, int(x), _round6(y)))
        return pd.DataFrame(out, columns=["key", "step", "value", "ema"])

    return df.groupBy(key).applyInPandas(fold, schema)


def _round6(y: float) -> float:
    # sign-aware HALF_UP to match DuckDB round(): Python's round() is
    # half-EVEN, and dyadic-alpha recurrence values are binary fractions,
    # so exact .5e-6 ties ARE reachable and would diverge — e.g.
    # round(0.0078125, 6)
    return math.copysign(math.floor(abs(y) * 1e6 + 0.5) / 1e6, y)


def keyed_holt(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """(key, step, value, level, trend, forecast) — Holt's linear
    (double-exponential) smoothing per key over the ``order``-sorted
    series, alpha = 1/2, beta = 1/4 (dyadic, so the fold is a
    reproducible float64 instruction sequence):

        l_1 = x_1,  b_1 = 0
        l_t = (x_t + (l_{t-1} + b_{t-1})) / 2
        b_t = ((l_t - l_{t-1}) + 3 * b_{t-1}) / 4
        forecast_t = l_t + b_t   (the one-step-ahead prediction)

    The two-state recurrence EMA cannot express (trend feeds back into
    level); the DuckDB oracle replays the identical op sequence step by
    step in a recursive CTE carrying (l, b) unrounded — output rounds at
    6dp with the same sign-aware HALF_UP as keyed_ema. Same scale shape
    as every recurrence here: one hash exchange on the key, then an
    Arrow-batched per-key fold with two scalars of state."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("step", T.IntegerType()),
            T.StructField("value", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        l = b = None
        out = []
        for step, x in enumerate(pdf[value], start=1):
            x = float(x)
            if l is None:
                l, b = x, 0.0
            else:
                l_new = (x + (l + b)) / 2
                b = ((l_new - l) + 3 * b) / 4
                l = l_new
            out.append(
                (
                    int(pdf[key].iloc[0]),
                    step,
                    int(x),
                    _round6(l),
                    _round6(b),
                    _round6(l + b),
                )
            )
        return pd.DataFrame(
            out, columns=["key", "step", "value", "level", "trend", "forecast"]
        )

    return df.groupBy(key).applyInPandas(fold, schema)


def keyed_cusum(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    drift: int,
    threshold: int,
) -> DataFrame:
    """(key, step, s, alarm) — one-sided CUSUM drift detector per key:
    s_t = max(0, s_{t-1} + x_t - drift); alarm when s_t >= threshold,
    after which s resets to 0 (restart detection). Pure integer
    arithmetic — exact on any engine. The standard cheap monitor for
    'did this source's volume/quality drift upward' in ingest pipelines.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("step", T.IntegerType()),
            T.StructField("s", T.LongType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        s = 0
        out = []
        for step, x in enumerate(pdf[value], start=1):
            s = max(0, s + int(x) - drift)
            alarm = s >= threshold
            out.append((int(pdf[key].iloc[0]), step, s, alarm))
            if alarm:
                s = 0
        return pd.DataFrame(out, columns=["key", "step", "s", "alarm"])

    return df.groupBy(key).applyInPandas(fold, schema)


def keyed_km_survival(
    df: DataFrame,
    key: str,
    time: str,
    deaths: str,
    at_risk: str,
) -> DataFrame:
    """(key, t, n_risk, d, survival) — Kaplan-Meier product-limit
    estimator per key over an already-aggregated risk table:
    S(t) = prod_{s <= t} (1 - d_s / n_s) over ascending event times.

    The cumulative product is the same non-associative-fold class as
    keyed_ema above (no window-frame rewrite), and the same determinism
    contract: each factor (1 - d/n) is one float64 division, the fold
    multiplies ascending — the DuckDB oracle replays the identical op
    sequence in a recursive CTE, and the 6dp output uses the sign-aware
    HALF_UP so both engines round alike.

    Scale: the input is a RISK TABLE (one row per (key, distinct event
    time)), which is time-bounded — days-in-window rows per key, not
    data-sized; the fold is trivially cheap. Building that table
    upstream is one groupBy + one window cumsum, all associative.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("t", T.LongType()),
            T.StructField("n_risk", T.LongType()),
            T.StructField("d", T.LongType()),
            T.StructField("survival", T.DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        s = 1.0
        out = []
        for t, d, n in zip(pdf[time], pdf[deaths], pdf[at_risk]):
            s = s * (1.0 - float(d) / float(n))
            out.append((str(pdf[key].iloc[0]), int(t), int(n), int(d), _round6(s)))
        return pd.DataFrame(out, columns=["key", "t", "n_risk", "d", "survival"])

    return df.groupBy(key).applyInPandas(fold, schema)
