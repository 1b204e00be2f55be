"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python UDFs): language-ID, quality
scoring, token counting, and fingerprinting each compile into a single
projection over the documents scan, so they stream through 100 TB with
zero shuffles and full whole-stage codegen.

Not present in the reference (its users write Go closures,
/root/reference/node.go:57-64); these are the §6-extension operators the
build plan calls for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ssp_spark.functions import portable_hash64, tokens

# Marker-word language heuristic: score each language by counts of its
# marker tokens; highest count wins, 'und' when all zero. Deliberately
# simple so the DuckDB oracle can replicate it exactly; a real pipeline
# would swap in a charset/ngram model behind the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("data", "value", "row"),
    "fr": ("query", "filter", "merge"),
}

STOPWORDS = ("the", "a", "of", "and")

WORD_RE = r"[a-z0-9]+"  # BPE-ish word pieces: lowercase alnum runs


def _count_occurrences(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    toks = tokens(F.col(text_col))
    scores = {lang: _count_occurrences(toks, ws) for lang, ws in LANG_MARKERS.items()}
    # deterministic argmax: tie broken by fixed language order en > de > fr
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return df.withColumn(out_col, pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, avg_token_len, stopword_ratio, quality (0..1)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = _count_occurrences(toks, STOPWORDS)
    avg_len = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    # length factor saturates at 200 tokens; mild stopword presence is good
    quality = F.round(
        F.least(n / F.lit(200.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
        + F.least(avg_len / F.lit(8.0), F.lit(1.0)) * 0.2,
        4,
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("avg_token_len", F.round(avg_len, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality", quality)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count (regexp-extracted)."""
    ws = F.size(tokens(F.col(text_col)))
    pieces = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0))
    return df.withColumn("ws_tokens", ws).withColumn("piece_tokens", pieces)


ROLL_B = 31  # polynomial base
ROLL_P = 1_000_000_007  # modulus; acc < p (~2^30), acc*B + h64 < 2^63: no overflow


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints over normalized text.

    fp_md5: full md5 hex; fp64: 60-bit integer prefix (portable_hash64),
    usable as a shuffle/dedup key anywhere; fp_roll: token-level
    polynomial ROLLING hash acc = (acc*B + h64(token)) mod P — the
    order-sensitive fingerprint (reordered tokens change it, unlike a
    bag-of-words hash), folded left-to-right so DuckDB's list_reduce
    reproduces it exactly.
    """
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    roll = F.aggregate(
        tokens(F.col(text_col)),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_B + portable_hash64(t)) % ROLL_P,
    )
    return (
        df.withColumn("fp_md5", F.md5(normalized))
        .withColumn("fp64", portable_hash64(normalized))
        .withColumn("fp_roll", roll)
    )
