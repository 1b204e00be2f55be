"""Property test for the cross-engine determinism foundation: every
oracle-parity claim in this repo ultimately rests on portable_hash64
(md5-hex -> 60-bit int) computing the SAME value in Spark, DuckDB, and
Python. Hypothesis drives arbitrary unicode through all three.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F
from ssp_spark.functions import portable_hash64


def _py_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# Excluded: NUL (DuckDB VARCHARs reject embedded \x00) and lone surrogates
# (category Cs — not encodable as UTF-8 at all, so no engine can hash them).
# The contract is therefore "valid UTF-8, NUL-free", which is what real
# tokenized text is.
_strings = st.lists(
    st.text(
        alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(_strings)
def test_hash64_identical_across_engines(spark, strings):
    sdf = spark.createDataFrame([(s,) for s in strings], ["s"])
    got_spark = [r[0] for r in sdf.select(portable_hash64("s")).collect()]
    got_duck = [
        r[0]
        for r in duckdb.execute(
            "SELECT ('0x' || substr(md5(s), 1, 15))::BIGINT FROM (SELECT unnest(?) AS s)",
            [strings],
        ).fetchall()
    ]
    got_py = [_py_hash64(s) for s in strings]
    assert got_spark == got_py == got_duck


def test_production_profile_same_domain_and_same_minhash_pairs(spark, monkeypatch):
    """SSP_PORTABLE_HASH=off swaps md5 for xxhash64: values differ, but the
    60-bit non-negative domain contract holds, and the minhash-LSH pair SET
    over real documents is profile-invariant (signatures are different
    uniform hashes of the same shingle sets, so band collisions land on the
    same near-dup structure at these similarity levels)."""
    from ssp_spark.operators import dedup
    from tests.conftest import SF_SMOKE
    from ssp_spark.catalog import load_table

    docs = load_table(spark, "documents", SF_SMOKE)

    def pair_set():
        return {
            (r.id1, r.id2)
            for r in dedup.minhash_lsh_pairs(docs).select("id1", "id2").collect()
        }

    sdf = spark.createDataFrame([("a",), ("b c",), ("",)], ["s"])

    portable = pair_set()
    monkeypatch.setenv("SSP_PORTABLE_HASH", "off")
    vals = [r[0] for r in sdf.select(portable_hash64("s")).collect()]
    assert all(0 <= v < 1 << 60 for v in vals)
    production = pair_set()
    monkeypatch.delenv("SSP_PORTABLE_HASH")
    assert production == portable
