"""Sequence packing for LLM training-data pipelines.

Training jobs consume fixed-length token sequences; corpora are variable
length documents. The standard batch strategy is concat-and-chunk: lay
documents end-to-end in a deterministic order and cut every ``budget``
tokens. The deliverable is the *packing manifest* — for every document,
which output sequence its first token lands in and at what offset — which
downstream loaders use to materialize sequences without another pass.

Scale design: a single global concatenation would serialize the corpus
through one task (a total order is one partition's window). Real
pipelines therefore pack per *shard* — documents are hash-sharded, each
shard is an independent token stream packed in parallel, and sequence ids
are namespaced by shard. The only shuffle is the hash partition by shard
key; within a shard the running total is one sorted window scan. At
100 TB, shards ~ O(total tokens / a few hundred M) keep every window
partition memory-resident.

Not in the reference (no corpus tooling there); part of the SURVEY.md §6
training-pipeline extension family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ssp_spark.functions import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the other half of sequence
    preparation (pack_sequences lays SHORT docs end-to-end; this splits
    LONG docs into model-window-sized pieces with ``overlap`` tokens of
    context carried across each boundary, the standard long-document
    treatment before packing).

    Per input doc: rows (doc_id, chunk_idx, chunk_text, n_tok_chunk),
    chunk i covering tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is the remainder
    (never an extra chunk fully contained in the previous one). Chunk
    count is exact integer arithmetic — 1 if n <= chunk_tokens else
    (n - chunk_tokens + stride - 1) div stride + 1 — so any SQL engine
    reproduces the boundaries bit-for-bit. Zero-token docs are dropped
    (no chunk is defined for them).

    Plan: scan -> tokenize projection -> generate(explode over the chunk
    index sequence) -> slice/concat projection. ZERO shuffles — at 100 TB
    this is a pure map stage that runs at IO speed, and the output
    inherits the input's partitioning (no chunk_idx skew: fan-out per doc
    is ~n/stride, bounded by the longest document).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") > 0)
    n_chunks = F.expr(
        f"CASE WHEN size(__t) <= {chunk_tokens} THEN 1 "
        f"ELSE ((size(__t) - {chunk_tokens} + {stride - 1}) div {stride}) + 1 END"
    )
    return (
        base.select(
            "doc_id", "__t", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("__i")
        )
        .select(
            "doc_id",
            F.col("__i").cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice("__t", F.col("__i") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size("__t") - F.col("__i") * stride)
            .cast("int")
            .alias("n_tok_chunk"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing manifest.

    Per document: ``shard`` (= id mod n_shards — deterministic so the
    oracle reproduces it; production would use a uniform hash), ``n_tok``,
    ``seq_in_shard`` (index of the budget-sized sequence its first token
    lands in), ``seq_offset`` (token offset inside that sequence), and
    ``n_seqs`` (how many sequences the document spans — >1 when it
    crosses chunk boundaries).

    Documents with zero tokens are excluded (they occupy no positions in
    the stream; a packing entry for them is undefined).

    Plan: projection (token count) -> one shuffle (hash by shard) ->
    per-shard window cumsum -> projection. No global order anywhere.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            (F.col(id_col) % n_shards).cast("int").alias("shard"),
            n_tok.alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)  # stream position AFTER this doc
    start = (cum - F.col("n_tok")).alias("tok_start")  # position of first token
    out = base.select("doc_id", "shard", "n_tok", cum.alias("__cum"), start)
    # integer `div`, not double `/`: exact at any stream length (a double
    # quotient is only exact to 2^53 — fine today, wrong at extreme scale)
    return out.select(
        "doc_id",
        "shard",
        "n_tok",
        F.expr(f"tok_start div {budget}").alias("seq_in_shard"),
        (F.col("tok_start") % budget).cast("int").alias("seq_offset"),
        # sequences spanned = index of last token's chunk - index of first's + 1
        (
            F.expr(f"(__cum - 1) div {budget}") - F.expr(f"tok_start div {budget}") + 1
        )
        .cast("int")
        .alias("n_seqs"),
    )
