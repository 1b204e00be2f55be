"""Deduplication operators: exact, shingle-Jaccard, MinHash-LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB: every variant avoids the quadratic all-pairs trap.

- exact: single hash-groupBy on a 128-bit fingerprint (one shuffle).
- jaccard_pairs: inverted-index self-join on shingles — pairs are
  generated only for documents that SHARE a shingle, so cost tracks the
  true near-dup density, not n^2. Hot shingles are capped (stop-shingle
  removal) to bound skew.
- minhash_lsh: constant-size signature per doc (k hashes), band self-join;
  candidate volume is tunable via (bands, rows). Signatures use the
  md5-portable hash family (ssp_spark.functions.seeded_hash64) so the
  DuckDB oracle reproduces them exactly.
- simhash: 32-bit fingerprint via per-bit vote; hamming-close pairs via
  band rotation.
- embedding near-dup: blocked cosine self-join (block key = label or an
  LSH bucket) with JVM-side array math (functions.dot).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ssp_spark.functions import cosine, portable_hash64, shingles, tokens

# Drop shingles appearing in more than this many docs (they generate huge
# candidate lists and carry no dedup signal — the "stop-shingle" cap that
# keeps the inverted-index join skew-free at scale).
DEFAULT_MAX_DOC_FREQ = 1000


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keeper per exact-content group: min id per md5(text). One shuffle."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """Exact shingle-set Jaccard for every pair sharing >=1 shingle.

    Plan: explode -> distinct (doc, shingle) -> self-join on shingle ->
    count shared per pair -> jaccard = shared / (n1 + n2 - shared).
    Shuffles: one on shingle (the join), one on (id1, id2). The shingle
    join is the scale knob: max_doc_freq caps fan-out of hot shingles.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    freq = sh.groupBy("sh").agg(F.count("*").alias("df_"))
    sh_kept = sh.join(freq.filter(F.col("df_") <= max_doc_freq).select("sh"), "sh")

    a = sh_kept.select(F.col("doc_id").alias("id1"), "sh")
    b = sh_kept.select(F.col("doc_id").alias("id2"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1")), "id1")
        .join(sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2")), "id2")
        .withColumn("j_raw", F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")))
        .filter(F.col("j_raw") >= threshold)  # threshold on the UNrounded value (oracle parity)
        .select("id1", "id2", F.round("j_raw", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, seed, minhash) — min over the seeded portable hash family.

    One explode + one groupBy(doc_id): the signature is computed with
    min(CASE seed) aggregations, not a per-seed pass over the corpus.
    """
    sh = _doc_shingles(df, id_col, text_col, shingle_n)
    # hash with the seed folded into the input string: hash64('<seed>:' || sh)
    seeded = sh.select("doc_id", "sh").crossJoin(
        F.broadcast(
            sh.sparkSession.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
        )
    ).withColumn(
        "h",
        portable_hash64(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("sh"))),
    )
    return seeded.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on a full band of minhashes.

    bands=4 x rows=3 over 12 hashes => P(candidate) = 1-(1-j^3)^4, the
    classic S-curve. Self-join is on (band, band_signature) — constant
    per-doc state, so candidate generation is O(near-dups), not O(n^2).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = (
        sig.withColumn("band", (F.col("seed") / rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("seed", "minhash"))).alias("sm"))
        .withColumn(
            "band_sig",
            F.concat_ws(",", F.transform(F.col("sm"), lambda s: s["minhash"].cast("string"))),
        )
        .select("doc_id", "band", "band_sig")
    )
    a = banded.select(F.col("doc_id").alias("id1"), "band", "band_sig")
    b = banded.select(F.col("doc_id").alias("id2"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """32-bit SimHash fingerprint per document (token-weighted bit vote).

    Plan: distinct (doc, token) -> explode bit index 0..bits-1 -> vote
    +-1 by token-hash bit -> groupBy(doc, bit) sum -> groupBy(doc) pack.
    All integer Catalyst math; DuckDB-reproducible (shiftright on the
    portable 60-bit hash).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )
    hashed = toks.withColumn("th", portable_hash64(F.col("tok")))
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
    # shiftright/shiftleft with a COLUMN shift amount needs the SQL form
    votes = hashed.select("doc_id", "th", bit_idx.alias("bit")).withColumn(
        "vote", F.expr("(shiftright(th, bit) & 1) * 2 - 1")
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    packed = bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
    return packed


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup pairs within blocks (block = label / LSH bucket).

    Blocking turns the n^2 self-join into sum over blocks of b^2; at scale
    the block key would be an LSH bucket (see similarity.lsh_buckets).
    Array math is JVM-side double arithmetic in index order => bit-equal
    to the DuckDB oracle's list_dot_product.
    """
    a = df.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    b = df.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos", F.round(cosine("v1", "v2"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )
