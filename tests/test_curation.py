"""Hand-computed goldens for the round-3 curation operators: repetition
filtering, cross-document n-gram sharing, TF-IDF, and k-means clustering.
The DuckDB parity suite checks these against SQL oracles on the fixtures;
these tests pin the SEMANTICS on inputs small enough to verify by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark.operators import cluster, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_golden(spark):
    # "a a a a": bigrams [a a, a a, a a] -> top 3/3, distinct 1 -> dup 2/3
    # "x y z": bigrams [x y, y z] -> top 1/2, dup 0
    out = {
        r["doc_id"]: r
        for r in text.repetition_stats(
            _docs(spark, [(1, "a a a a"), (2, "x y z")])
        ).collect()
    }
    assert out[1]["n_bigrams"] == 3
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_bigram_frac"] == round(2 / 3, 4)
    assert out[1]["keep"] == 0
    assert out[2]["n_bigrams"] == 2
    assert out[2]["top_bigram_frac"] == 0.5
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["keep"] == 0  # top frac 0.5 > 0.18


def test_repetition_stats_excludes_short_docs(spark):
    out = text.repetition_stats(_docs(spark, [(1, "solo"), (2, "two words")])).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_corpus_ngram_stats_golden(spark):
    # doc 1 and 2 share their only 3-gram; doc 3 is unique
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "q r s")])
    out = {r["doc_id"]: r for r in text.corpus_ngram_stats(df, n=3).collect()}
    assert out[1]["n_shared"] == 1 and out[1]["dup_flag"] == 1
    assert out[2]["n_shared"] == 1 and out[2]["dup_flag"] == 1
    assert out[3]["n_shared"] == 0 and out[3]["dup_flag"] == 0 and out[3]["shared_frac"] == 0.0


def test_kmeans_separates_two_blobs(spark):
    # two well-separated 2-d blobs; seeds = ids 0 (blob A) and 1 (blob B)
    pts = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (1, [10.0, 10.0]), (4, [10.1, 10.0]), (5, [10.0, 10.1]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"] for r in cluster.kmeans(df, k=2, iters=3).collect()}
    assert {out[0], out[2], out[3]} == {0}
    assert {out[1], out[4], out[5]} == {1}


def test_kmeans_k1_groups_everything(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    rows = cluster.kmeans(df, k=1, iters=2).collect()
    assert {r["cluster"] for r in rows} == {0}
    # centroid after 1 update = mean (2.0); dist2 = (i-2)^2
    assert {r["vec_id"]: r["dist2"] for r in rows} == {0: 4.0, 1: 1.0, 2: 0.0, 3: 1.0, 4: 4.0}


def test_kmeans_assign_tiebreak_lowest_cid(spark):
    df = spark.createDataFrame([(7, [0.5, 0.5])], "vec_id long, embedding array<double>")
    pts = df.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
    # equidistant centroids: the (d2, cid) struct-min must pick cid 3
    out = cluster.assign(pts, [(9, [1.0, 1.0]), (3, [0.0, 0.0])], vec_col="__v").collect()
    assert out[0]["cluster"] == 3


# ---------------------------------------------------------------------------
# Round-3 additions: contamination, sequence packing, int8 quantization
# ---------------------------------------------------------------------------


def test_contamination_golden(spark):
    # benchmark doc: "a b c d" -> 3-grams {a b c, b c d}
    # corpus doc 1 "a b c d e": grams {a b c, b c d, c d e} -> 2/3 hit
    # corpus doc 2 "x y z w":   grams {x y z, y z w}        -> 0/2 hit
    bench = _docs(spark, [(100, "a b c d")])
    corpus = _docs(spark, [(1, "a b c d e"), (2, "x y z w")])
    out = {r["doc_id"]: r for r in text.contamination(corpus, bench, n=3).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_hit"] == 2
    assert out[1]["contamination_frac"] == round(2 / 3, 4)
    assert out[1]["contaminated"] == 1
    assert out[2]["n_hit"] == 0 and out[2]["contaminated"] == 0


def test_contamination_excludes_gramless_docs(spark):
    bench = _docs(spark, [(100, "a b c d")])
    corpus = _docs(spark, [(1, "too short")])  # 2 tokens < n=3: no grams
    assert text.contamination(corpus, bench, n=3).count() == 0


def test_pack_sequences_golden(spark):
    from ssp_spark.operators import packing

    # one shard (n_shards=1), budget 5; docs of 3/4/6 tokens in id order:
    #   d1 tokens 0-2  -> seq 0 offset 0, ends tok 2  -> spans seq 0 only
    #   d2 tokens 3-6  -> seq 0 offset 3, ends tok 6  -> spans seqs 0-1
    #   d3 tokens 7-12 -> seq 1 offset 2, ends tok 12 -> spans seqs 1-2
    docs = _docs(spark, [(1, "a b c"), (2, "d e f g"), (3, "h i j k l m")])
    out = {
        r["doc_id"]: r
        for r in packing.pack_sequences(docs, budget=5, n_shards=1).collect()
    }
    assert (out[1]["seq_in_shard"], out[1]["seq_offset"], out[1]["n_seqs"]) == (0, 0, 1)
    assert (out[2]["seq_in_shard"], out[2]["seq_offset"], out[2]["n_seqs"]) == (0, 3, 2)
    assert (out[3]["seq_in_shard"], out[3]["seq_offset"], out[3]["n_seqs"]) == (1, 2, 2)


def test_pack_sequences_shards_are_independent(spark):
    from ssp_spark.operators import packing

    # ids 0..5 over 2 shards: each shard's stream starts at position 0
    docs = _docs(spark, [(i, "t " * 4) for i in range(6)])  # 4 tokens each
    out = packing.pack_sequences(docs, budget=8, n_shards=2).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        # 3 docs x 4 tokens at budget 8: offsets 0, 4, 0 within the shard
        assert [r["seq_offset"] for r in rows] == [0, 4, 0]
        assert [r["seq_in_shard"] for r in rows] == [0, 0, 1]


def test_quantize_int8_reconstruction_bound(spark):
    """|v - q*scale| <= scale/2 per element, and q fits int8 for the
    max-|v| element by construction (|q| <= 127)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators.similarity import quantize_int8

    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE).limit(50)
    joined = (
        quantize_int8(emb)
        .join(emb, "vec_id")
        .select(
            "vec_id",
            "scale",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("q"),
                lambda x, q: F.abs(x - q * F.col("scale")),
            ).alias("errs"),
            F.array_max(F.transform("q", lambda q: F.abs(q))).alias("qmax"),
        )
    )
    rows = joined.select(
        "vec_id", "scale", F.array_max("errs").alias("maxerr"), "qmax"
    ).collect()
    assert rows
    for r in rows:
        assert r["maxerr"] <= r["scale"] / 2 + 1e-12
        assert r["qmax"] <= 127


def test_pack_sequences_invariants_on_fixture(spark):
    """Whole-corpus invariants on the real fixture: within every shard the
    token stream is contiguous (each doc starts where the previous ended),
    offsets stay inside the budget, and n_seqs matches the chunk span."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import packing

    from tests.conftest import SF_SMOKE

    budget = 512
    docs = load_table(spark, "documents", SF_SMOKE)
    rows = packing.pack_sequences(docs, budget=budget, n_shards=32).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % 32
        assert 0 <= r["seq_offset"] < budget
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rs:
            assert r["seq_in_shard"] == pos // budget
            assert r["seq_offset"] == pos % budget
            last = pos + r["n_tok"] - 1
            assert r["n_seqs"] == last // budget - pos // budget + 1
            pos += r["n_tok"]


def test_leakage_safe_split_no_pair_straddles(spark):
    """The defining invariant of the dedup-aware split: for EVERY
    near-dup candidate pair, both docs land in the same split (the
    per-doc hash split cannot guarantee this; the group-keyed one must)."""
    from tests.conftest import SF_SMOKE

    from ssp_spark.catalog import load_table
    from ssp_spark.operators import dedup
    from ssp_spark.queries import QUERIES

    docs = load_table(spark, "documents", SF_SMOKE)
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=12, bands=4)
    comp = dedup.connected_components(pairs).withColumnRenamed("id", "doc_id")
    from ssp_spark.functions import portable_hash64

    grouped = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component_id", F.col("doc_id")).alias("g")
    )
    h = portable_hash64(F.col("g").cast("string"))
    split = (
        F.when(h % 100 < 80, F.lit("train"))
        .when(h % 100 < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    assign = grouped.select("doc_id", split.alias("split"))
    straddlers = (
        pairs.join(assign.withColumnRenamed("doc_id", "id1"), "id1")
        .withColumnRenamed("split", "s1")
        .join(assign.withColumnRenamed("doc_id", "id2"), "id2")
        .filter(F.col("s1") != F.col("split"))
    )
    assert pairs.count() > 0  # the invariant is vacuous without pairs
    assert straddlers.count() == 0
    # and the summary query agrees with the raw assignment
    summary = {
        r["split"]: r["n_docs"]
        for r in QUERIES["leakage_safe_split"](spark, SF_SMOKE).collect()
    }
    raw = {r["split"]: r["cnt"] for r in assign.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert summary == raw


def test_ann_recall_multiprobe_vs_bruteforce(spark):
    """Recall@10 evaluation of the approximate ANN paths against the
    exact brute-force baseline on the embeddings fixture. This corpus's
    true neighbors sit at cosine ~0.3 (near-random synthetic vectors), so
    single-bucket 8-plane LSH finds them with only ~p^8 ≈ 2% — the
    multi-probe upgrade (radius 2) must lift that into IVF's range.
    Thresholds sit under the measured values (r0 0.025/0.01, r2
    0.31/0.275, IVF 0.315/0.375 at sf0.001/sf0.01) with margin."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import similarity
    from ssp_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    q = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {(r.qid, r.nid) for r in QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).collect()}
    single = {(r.qid, r.nid) for r in similarity.lsh_topk(q, emb, k=10, probe_radius=0).collect()}
    multi = {(r.qid, r.nid) for r in QUERIES["ann_lsh_topk"](spark, SF_SMOKE).collect()}
    ivf = {(r.qid, r.nid) for r in QUERIES["ann_ivf_topk"](spark, SF_SMOKE).collect()}
    n = len(exact)
    assert n == 200
    recall_single = len(single & exact) / n
    recall_multi = len(multi & exact) / n
    recall_ivf = len(ivf & exact) / n
    assert recall_multi >= 0.2
    assert recall_ivf >= 0.25
    # the probe sequence must strictly buy recall over the single bucket
    assert recall_multi > recall_single + 0.1


def test_lsh_topk_gemm_kernel_consistency(spark):
    """The gemm docstring's pinned claim, made real (VERDICT r5 #2): on
    the test corpus the blocked-GEMM kernel must emit the IDENTICAL
    (qid, nid) set as the per-pair JVM fold — overlap 1.0 — with equal
    rank AND equal rounded cosine on every pair (max cos delta 0.0).
    Routed through lsh_topk(kernel="gemm") so the deployment switch is
    the tested path."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    q = emb.filter(F.col("vec_id") % 25 == 0)
    jvm = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.lsh_topk(q, emb, k=10, probe_radius=2).collect()
    }
    gemm = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.lsh_topk(
            q, emb, k=10, probe_radius=2, kernel="gemm"
        ).collect()
    }
    assert set(jvm) == set(gemm)  # overlap 1.0
    assert jvm == gemm  # identical rank and rounded cosine everywhere


def test_ivf_topk_gemm_kernel_consistency(spark):
    """The IVF twin of the pinned lsh claim: the GEMM assignment kernel
    (one matmul per Arrow batch against the codebook) must land every
    vector in the SAME cell / probe set as the codegen'd index-order
    fold, so the two kernels emit identical (qid, nid, rank, cos)
    everywhere. Routed through ivf_topk(kernel="gemm") so the
    deployment switch is the tested path."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    q = emb.filter(F.col("vec_id") % 25 == 0)
    cents = emb.filter(F.col("vec_id") % 50 == 7)
    cb = similarity.ivf_codebook(cents)
    expr = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.ivf_topk(
            q, emb, None, k=10, nprobe=2, codebook=cb
        ).collect()
    }
    gemm = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.ivf_topk(
            q, emb, None, k=10, nprobe=2, codebook=cb, kernel="gemm"
        ).collect()
    }
    assert set(expr) == set(gemm)  # identical candidate sets
    assert expr == gemm  # identical rank and rounded cosine everywhere


def test_lsh_buckets_project_non_dims_length_vectors(spark):
    """Round-6 latent-bug regression: zip_with NULL-pads (it does not
    stop at the shorter array), and the old fold absorbed the null —
    every vector not exactly dims long hashed to bucket 0, collapsing
    LSH into ONE giant bucket (brute force in disguise). Buckets must
    spread for longer AND shorter vectors, and 64-dim bucketing is
    unchanged (oracle-inlined)."""
    import random
    from collections import Counter

    from ssp_spark.operators.similarity import lsh_buckets

    rnd = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rnd.uniform(-1.0, 1.0) for _ in range(72)]) for i in range(50)]
        + [(100 + i, [rnd.uniform(-1.0, 1.0) for _ in range(40)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    counts = Counter(r.bucket for r in lsh_buckets(emb).collect())
    assert len(counts) > 10
    assert max(counts.values()) < 20


def test_lsh_topk_gemm_full_length_and_ragged(spark):
    """ADVICE r5 items 1 and 5: the GEMM kernel must score FULL vectors
    (no dims-truncation — for uniform 72-dim vectors bucketed on the
    first 64 dims, both kernels must still agree exactly, which also
    exercises the sign-aware HALF_UP rounding on fresh values), and a
    ragged block must not crash np.stack (zero-padding scores the
    common prefix)."""
    import random

    from ssp_spark.operators import similarity

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1.0, 1.0) for _ in range(72)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 10 == 0)
    jvm = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.lsh_topk(q, df, k=5, probe_radius=1).collect()
    }
    gemm = {
        (r.qid, r.nid): (r.rank, r.cos)
        for r in similarity.lsh_topk(
            q, df, k=5, probe_radius=1, kernel="gemm"
        ).collect()
    }
    assert len(jvm) > 0
    assert jvm == gemm
    # ragged vectors: defined (prefix-scored) output, no crash
    ragged = spark.createDataFrame(
        [
            (i, [rnd.uniform(-1.0, 1.0) for _ in range(64 if i % 2 else 40)])
            for i in range(60)
        ],
        "vec_id long, embedding array<double>",
    )
    out = similarity.lsh_topk(
        ragged.filter(F.col("vec_id") % 5 == 0), ragged, k=3, probe_radius=1,
        kernel="gemm",
    ).collect()
    assert all(r.qid != r.nid for r in out)
    assert all(-1.0 <= r.cos <= 1.0 for r in out)


def test_incremental_dedup_consistent_with_self_join(spark):
    """Cross-corpus pairs must be exactly the batch↔corpus subset of the
    full self-join candidate set: banding a corpus in two halves and
    joining must not invent or lose candidates vs banding it whole
    (the correctness contract that lets an ingest pipeline trust the
    persisted band index)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import dedup
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    cross = {
        (r.id1, r.id2)
        for r in dedup.minhash_lsh_pairs_between(batch, corpus).collect()
    }
    full = {
        (r.id1, r.id2) for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    # orient the full self-join pairs as (batch_id, corpus_id)
    expected = set()
    for a, b in full:
        if a % 10 == 7 and b % 10 != 7:
            expected.add((a, b))
        elif b % 10 == 7 and a % 10 != 7:
            expected.add((b, a))
    assert cross == expected
    assert cross  # vacuous otherwise


def test_probe_masks_shape():
    from ssp_spark.operators.similarity import probe_masks

    import pytest as _pytest

    assert probe_masks(8, 0) == [0]
    m1 = probe_masks(8, 1)
    assert len(m1) == 9 and len(set(m1)) == 9
    m2 = probe_masks(8, 2)
    assert len(m2) == 1 + 8 + 28 and len(set(m2)) == 37
    assert all(bin(m).count("1") <= 2 for m in m2)
    with _pytest.raises(ValueError):
        probe_masks(8, 3)


def test_contrastive_pairs_semantics(spark):
    """Per anchor: positives share the anchor's label, negatives don't;
    ranks are contiguous from 1 per (anchor, side); nothing pairs with
    itself; and each positive/negative list is the true cosine top-k of
    its side (cross-checked against the exact scorer)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    out = similarity.contrastive_pairs(anchors, emb, k_pos=2, k_neg=2).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_anchor = {}
    for r in out:
        assert r.qid != r.nid
        assert (labels[r.qid] == labels[r.nid]) == bool(r.is_positive)
        by_anchor.setdefault((r.qid, r.is_positive), []).append(r.rank)
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # every anchor contributes both sides (k_pos and k_neg rows each)
    qids = {r.qid for r in out}
    assert all((q, 1) in by_anchor and (q, 0) in by_anchor for q in qids)


def test_contrastive_lsh_consistency_vs_exact(spark):
    """The LSH candidate generator must agree with the exact path on
    everything EXCEPT candidate coverage: every (qid, nid, is_positive)
    it emits must score identically to the exact scorer's value for that
    pair, labels/side classification must match, ranks stay contiguous
    per (anchor, side) — and blocking must actually recall a usable
    fraction of the exact pairs (same contract as dedup_embedding_lsh:
    approximate WHO is compared, never WHAT a comparison returns)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    exact = similarity.contrastive_pairs(anchors, emb, k_pos=2, k_neg=2).collect()
    approx = similarity.contrastive_pairs(
        anchors, emb, k_pos=2, k_neg=2, candidates="lsh", probe_radius=2
    ).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_anchor = {}
    for r in approx:
        assert r.qid != r.nid
        assert (labels[r.qid] == labels[r.nid]) == bool(r.is_positive)
        by_anchor.setdefault((r.qid, r.is_positive), []).append(r.rank)
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # scores are the exact cosine wherever both paths ranked a pair
    exact_cos = {(r.qid, r.nid): r.cos for r in exact}
    overlap = [r for r in approx if (r.qid, r.nid) in exact_cos]
    assert all(abs(exact_cos[(r.qid, r.nid)] - r.cos) < 1e-9 for r in overlap)
    # blocking recalls a real fraction of the exact pair set (weak-
    # similarity corpus; radius-2 multi-probe measured ~0.3+ here)
    recall = len(overlap) / max(len(exact), 1)
    assert recall >= 0.15, recall


def test_embedding_standardize_degenerate_and_ragged(spark, tmp_path):
    """ADVICE r4: (a) an all-zero-variance corpus must return the
    oracle's EMPTY result, not AttributeError; (b) ragged vectors must
    agree with the oracle's per-vector join count (n_dims per row, not
    a global constant). Both checked against the live oracle SQL on the
    same parquet."""
    import duckdb

    from ssp_spark.queries import ORACLE, QUERIES
    from tests.oracle_harness import compare

    # (a) constant vectors: every dimension zero-variance -> empty model
    const = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0], "x") for i in range(5)],
        "vec_id long, embedding array<double>, label string",
    )
    d1 = str(tmp_path / "const")
    const.write.parquet(d1 + "/embeddings.parquet")
    out = QUERIES["embedding_standardize"](spark, d1)
    assert out.columns == ["vec_id", "z_sum", "n_dims"]
    assert out.count() == 0

    # (b) ragged vectors: dim 2 exists only for some vectors
    ragged = spark.createDataFrame(
        [
            (1, [1.0, 5.0, 9.0], "x"),
            (2, [2.0, 6.0], "x"),
            (3, [3.0, 7.0, 11.0], "x"),
            (4, [4.0, 8.0], "x"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    d2 = str(tmp_path / "ragged")
    ragged.write.parquet(d2 + "/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d2}/embeddings.parquet/*.parquet')"
    )
    r = compare(QUERIES["embedding_standardize"](spark, d2), con.sql(ORACLE["embedding_standardize"]))
    assert r["hash_match"], r
    # and n_dims really is per-row: 3 for the long vectors, 2 for short
    nd = {row["vec_id"]: row["n_dims"] for row in QUERIES["embedding_standardize"](spark, d2).collect()}
    assert nd == {1: 3, 2: 2, 3: 3, 4: 2}


def test_bm25_topk_ranking_semantics(spark):
    """BM25 invariants on a hand-built corpus: term frequency wins at
    equal length, length normalization penalizes long docs at equal tf,
    rarer terms out-weigh common ones, absent-term queries return no
    rows, and ranks are contiguous with k enforced."""
    rows = [
        (1, "spark spark spark pad1 pad2 pad3"),       # tf=3, short
        (2, "spark pad1 pad2 pad3 pad4 pad5"),         # tf=1, short
        (3, "spark " + " ".join(f"x{i}" for i in range(30))),  # tf=1, long
        (4, "common rare pad pad pad pad"),
        (5, "common pad pad pad pad pad"),
        (6, "common pad2 pad3 pad4 pad5 pad6"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.bm25_topk(
        docs,
        [(1, ["spark"]), (2, ["rare", "common"]), (3, ["absent"])],
        k=2,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    # q1: tf dominance then length normalization; k=2 truncates doc 3
    assert [d for _, d, _ in sorted(by_q[1])] == [1, 2]
    # q2: doc 4 holds the rare term -> outranks common-only docs
    assert sorted(by_q[2])[0][1] == 4
    # q3: no doc contains 'absent'
    assert 3 not in by_q
    for ranks in by_q.values():
        assert sorted(r for r, _, _ in ranks) == list(range(1, len(ranks) + 1))
        assert all(s > 0 for _, _, s in ranks)


def test_bm25_topk_plan_shape(spark):
    """Scale contract: the corpus explode is filtered to the broadcast
    query vocabulary BEFORE the tf shuffle (the posting list never
    shuffles), and df/stats/query attachments are broadcast joins."""
    from ssp_spark import plans
    from ssp_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    df = text.bm25_topk(docs, [(1, ["spark", "join"])], k=5)
    s = plans.plan_string(df, "formatted")
    assert plans.broadcast_join_count(df) >= 3  # df_t, stats, query terms
    assert not plans.has_cartesian(df)
    # vocab filter present as a real predicate (IN over the literal set)
    assert "spark" in s and "join" in s


def test_weighted_sample_per_source_semantics(spark):
    """A-ES weighted sampling: a document with overwhelming weight is
    (essentially surely) selected first — ln(u)/w -> 0- as w grows —
    ranks are contiguous per group, the quota caps each group, and the
    draw is deterministic across invocations (hash-seeded, no RNG
    state)."""
    from ssp_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = [(i, "t", "s1", 1 if i else 10**9) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["weighted_sample_per_source"](spark, d).collect()
        assert out[0].__class__  # rows exist
        by_rank = {r.rank: r.doc_id for r in out}
        assert by_rank[1] == 0  # the giant-weight doc wins
        assert sorted(by_rank) == list(range(1, 21))  # contiguous, quota 20

    a = QUERIES["weighted_sample_per_source"](spark, SF_SMOKE).collect()
    b = QUERIES["weighted_sample_per_source"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_src = {}
    for r in a:
        per_src.setdefault(r.source, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_src.values())
    assert all(len(v) <= 20 for v in per_src.values())


def test_weighted_sample_plan_group_limit(spark):
    """Scale contract: the per-source top-20 must compile to
    WindowGroupLimit (map-side per-group heaps), not a full sort of the
    corpus."""
    from ssp_spark import plans
    from ssp_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["weighted_sample_per_source"](spark, SF_SMOKE)
    s = plans.plan_string(df, "formatted")
    assert "WindowGroupLimit" in s


def test_bfs_levels_matches_native_recursive_cte(spark):
    """graph.bfs_levels vs Spark 4's NATIVE ``WITH RECURSIVE`` (UNION ALL
    + min-aggregate) on a small cyclic graph: identical min-hop output.
    The native CTE enumerates paths (safe only on tiny inputs — exactly
    why the frontier-BFS operator is the deployment form); this pins the
    two against each other, including a cycle (1-2-3-1), a branch, and a
    node reachable two ways at different depths."""
    from ssp_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (1, 5), (6, 7)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = sorted(
        (r.node, r.hops)
        for r in graph.bfs_levels(edges, seeds, max_hops=4).collect()
    )
    edges.createOrReplaceTempView("bfs_edges_t")
    native = spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
          SELECT CAST(1 AS BIGINT) AS node, 0 AS hops
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN bfs_edges_t e ON e.src = r.node
          WHERE r.hops < 4
        )
        SELECT node, CAST(MIN(hops) AS INT) AS hops FROM reach GROUP BY node
        """
    )
    want = sorted((r.node, r.hops) for r in native.collect())
    assert got == want
    # 6-7 component unreachable from seed 1
    assert all(n not in (6, 7) for n, _ in got)
    # hop bound respected and seed present at distance 0
    assert (1, 0) in got and all(h <= 4 for _, h in got)


def test_bfs_levels_empty_and_no_edge_seeds(spark):
    """Empty edge frame -> seeds alone at hops 0; seed with no outgoing
    edges stays distance 0; duplicate seeds collapse (round-6 sweep
    contract: every operator total on empty inputs)."""
    from ssp_spark.operators import graph

    edges = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(9,), (9,), (4,)], "node long")
    got = sorted(
        (r.node, r.hops)
        for r in graph.bfs_levels(edges, seeds, max_hops=3).collect()
    )
    assert got == [(4, 0), (9, 0)]
    empty_seeds = spark.createDataFrame([], "node long")
    assert (
        graph.bfs_levels(
            spark.createDataFrame([(1, 2)], "src long, dst long"),
            empty_seeds,
            max_hops=2,
        ).count()
        == 0
    )


def test_span_dup_pairs_golden(spark):
    """Two docs sharing one long verbatim block (>= win+stride-1 chars
    from position 1) must pair; unrelated docs must not; docs shorter
    than the window are excluded."""
    from ssp_spark.operators import dedup

    block = "".join(chr(97 + (i * 7) % 26) for i in range(200))  # 200 deterministic chars
    rows = [
        (1, block + " tail one unique aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        (2, block + " another ending entirely different bbbbbbbbbbbbbb"),
        (3, "completely different text " * 10),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_a, r.doc_b): r.shared_spans
        for r in dedup.span_dup_pairs(df, win=64, stride=32, min_shared=2).collect()
    }
    assert set(out) == {(1, 2)}
    # shared 200-char prefix cut at stride 32: windows at 1,33,65,97,129
    # fit fully inside 200 chars (137+64-1=200) -> 5 aligned shared spans
    assert out[(1, 2)] == 5


def test_span_dup_pairs_boilerplate_cap(spark):
    """A span shared by more docs than max_doc_freq is dropped entirely
    (the stop-shingle analogue) — no pairs from boilerplate alone."""
    from ssp_spark.operators import dedup

    block = "x" * 130  # every doc shares all windows of this block
    df = spark.createDataFrame([(i, block) for i in range(6)], "doc_id long, text string")
    assert (
        dedup.span_dup_pairs(df, win=64, stride=32, min_shared=1, max_doc_freq=5).count()
        == 0
    )
    # raise the cap and all 15 pairs appear
    assert (
        dedup.span_dup_pairs(df, win=64, stride=32, min_shared=1, max_doc_freq=6).count()
        == 15
    )


def test_span_dup_pairs_empty_input(spark):
    from ssp_spark.operators import dedup

    df = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.span_dup_pairs(df).count() == 0


def test_bpe_train_golden_classic_corpus(spark):
    """Hand-checkable BPE learning: corpus 'aaab aaab ab' -> word freqs
    {aaab:2, ab:1}. Pair counts round 1: (a,a)=4, (a,b)=3 -> merge
    (a,a). Round 2 on {(aa,a,b):2,(a,b):1}: (aa,a)=2, (a,b)=3... wait
    — (aa,a)=2 and (a,b)=1 and (aa? no: sequences are (aa,a,b) x2 and
    (a,b) x1 -> pairs (aa,a)=2,(a,b)=3? (a,b) appears in (aa,a,b) via
    (a,b) adjacency = 2 plus (a,b) word = 1 -> 3 -> merge (a,b)."""
    from ssp_spark.operators import text as T

    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    merges = T.bpe_train(df, num_merges=3)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")
    # after (a,a) and (a,b): seqs {(aa,ab):2, (ab,):1} -> only pair
    # (aa,ab) remains
    assert merges[2] == ("aa", "ab")


def test_bpe_encode_edge_cases(spark):
    """Greedy left-to-right run merging, untouched single chars, empty
    text, punctuation-split words."""
    from ssp_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "aaaa b"), (2, ""), (3, "a-b c!d")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.bpe_tokens
        for r in T.bpe_encode(df, [("a", "a"), ("aa", "aa")]).collect()
    }
    # 'aaaa': (a,a) pass -> aa aa; (aa,aa) pass -> aaaa
    assert out[1] == ["aaaa", "b"]
    assert out[2] == []
    assert out[3] == ["a", "b", "c", "d"]


def test_bpe_encode_odd_run_is_greedy(spark):
    """'aaa' under merge (a,a): greedy leftmost pair merges, the odd
    char stays — ['aa','a'], never ['a','aa']."""
    from ssp_spark.operators import text as T

    df = spark.createDataFrame([("aaa",)], "text string")
    [r] = T.bpe_encode(df, [("a", "a")]).collect()
    assert r.bpe_tokens == ["aa", "a"]


def test_bpe_token_stream_matches_encode(spark):
    """The explode-first stream form (the r8-regression fix) must emit
    exactly the multiset bpe_encode's per-row arrays flatten to —
    including the edge rows: empty text contributes nothing, words
    split on punctuation, greedy odd-run merging."""
    import pyspark.sql.functions as F

    from ssp_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "aaaa b aaa"), (2, ""), (3, "a-b c!d the THE")],
        "doc_id long, text string",
    )
    merges = [("a", "a"), ("aa", "aa"), ("t", "h"), ("th", "e")]
    via_encode = sorted(
        t
        for r in T.bpe_encode(df, merges).collect()
        for t in r.bpe_tokens
    )
    via_stream = sorted(
        r.token for r in T.bpe_token_stream(df, merges).collect()
    )
    assert via_stream == via_encode and "the" in via_stream
    # and no null/empty tokens ever reach the stream
    assert all(t for t in via_stream)


def test_kcore_prune_peeling_cascade(spark):
    """The case degree-filtering gets wrong and peeling gets right: a
    chain a-b-c-d-e under k=2. Round 1 drops the endpoints (deg 1);
    round 2 drops b,d (their degree FELL to 1 when a,e left); round 3
    drops c. Fixed iters=2 shows the documented superset behavior."""
    from ssp_spark.operators import graph

    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = chain + [(b, a) for a, b in chain]
    e = spark.createDataFrame(sym, "src long, dst long")
    # full peel (3 rounds): nothing survives k=2 on a chain
    assert graph.kcore_prune(e, k=2, iters=3).count() == 0
    # 2 rounds: only the middle node's edges are gone last — after r1
    # nodes {2,3,4} with edges 2-3,3-4; after r2 degrees are 1 -> all
    # dropped... verify against the known cascade: r2 output empty? No:
    # r2 KEEPS nodes with deg>=2 among {2,3,4}: only 3 (deg 2) -> edges
    # need both endpoints kept -> none survive round 2 either.
    assert graph.kcore_prune(e, k=2, iters=2).count() == 0
    # 1 round: {2,3,4} survive with edges 2-3,3-4 (4 directed rows)
    one = {(r.node, r.degree) for r in graph.kcore_prune(e, k=2, iters=1).collect()}
    assert one == {(2, 1), (3, 2), (4, 1)}
    # a triangle is a true 2-core: stable at any depth
    tri = [(1, 2), (2, 3), (3, 1)]
    tsym = tri + [(b, a) for a, b in tri]
    te = spark.createDataFrame(tsym, "src long, dst long")
    got = {(r.node, r.degree) for r in graph.kcore_prune(te, k=2, iters=4).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_prune_empty_input(spark):
    from ssp_spark.operators import graph

    e = spark.createDataFrame([], "src long, dst long")
    assert graph.kcore_prune(e, k=2).count() == 0


def test_mmr_prefers_diversity_over_raw_relevance(spark):
    """The case pure top-k-by-relevance gets wrong: two near-identical
    high-relevance vectors and one orthogonal medium one. MMR must take
    ONE of the twins then the orthogonal vector; relevance-only would
    take both twins."""
    from ssp_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0]),        # probe (min id)
        (1, [0.99, 0.14, 0.0]),      # twin A: very close to probe
        (2, [0.99, 0.141, 0.0]),     # twin B: nearly identical to A
        (3, [0.0, 0.0, 1.0]),        # orthogonal to everything: diverse
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        (r.rank, r.vec_id) for r in similarity.mmr_topk(df, k=3, shortlist=10).collect()
    )
    # rank 1: probe itself (rel = 127^2 with itself, max). rank 2: a twin
    # (high rel, penalty only vs probe). rank 3: the ORTHOGONAL vector —
    # the other twin's penalty vs its sibling crushes its score.
    assert out[0] == (1, 0)
    assert out[1][1] in (1, 2)
    assert out[2] == (3, 3)


def test_mmr_k_exceeds_corpus_and_empty(spark):
    from ssp_spark.operators import similarity

    small = spark.createDataFrame(
        [(7, [1.0, 0.0]), (9, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    got = similarity.mmr_topk(small, k=5, shortlist=10).collect()
    assert len(got) == 2  # selection stops when candidates run out
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.mmr_topk(empty, k=3).count() == 0


def test_mmr_arrow_kernel_matches_jvm(spark):
    """The deployment (arrow/numpy) and replay (Catalyst HOF) MMR
    kernels must produce IDENTICAL picks, ranks, and scores — same
    contract as the lsh_topk gemm twin. Random 72-dim vectors exercise
    quantization across the full range."""
    import random

    from ssp_spark.operators import similarity

    rnd = random.Random(13)
    rows = [(i, [rnd.uniform(-1.0, 1.0) for _ in range(72)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    jvm = [tuple(r) for r in similarity.mmr_topk(df, k=6, shortlist=40).collect()]
    arrow = [
        tuple(r)
        for r in similarity.mmr_topk(df, k=6, shortlist=40, kernel="arrow").collect()
    ]
    assert len(jvm) == 6
    assert jvm == arrow
    # empty input: both kernels return the empty frame
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.mmr_topk(empty, k=3, kernel="arrow").count() == 0


def test_mmr_kernels_agree_on_ragged_and_zero_vectors(spark):
    """The divergence class ADVICE r5 flagged on the gemm twin, closed
    at birth here: ragged vectors (length != probe) and zero-norm
    vectors are EXCLUDED by BOTH kernels, identically."""
    from ssp_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0]),     # probe
        (1, [0.0, 0.0, 0.0]),     # zero norm -> excluded
        (2, [0.5, 0.5]),          # ragged -> excluded
        (3, [0.2, 0.9, 0.1, 0.4]),  # ragged -> excluded
        (4, [0.0, 1.0, 0.0]),
        (5, [0.7, 0.7, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    jvm = [tuple(r) for r in similarity.mmr_topk(df, k=4, shortlist=10).collect()]
    arrow = [
        tuple(r)
        for r in similarity.mmr_topk(df, k=4, shortlist=10, kernel="arrow").collect()
    ]
    assert jvm == arrow
    picked = {vid for _, vid, _ in jvm}
    assert picked == {0, 4, 5}  # only the well-formed vectors


def test_label_propagation_matches_python_reference(spark):
    """graph.label_propagation vs a transliterated pure-Python
    synchronous LPA (most-frequent neighbour label, ties -> min) on two
    triangles joined by one bridge edge — the shape where LPA keeps two
    communities while connected components over-merges to one."""
    from ssp_spark.operators import graph

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    sym = und + [(b, a) for a, b in und]

    adj: dict[int, list[int]] = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            freq: dict[int, int] = {}
            for m in nbrs:
                freq[labels[m]] = freq.get(labels[m], 0) + 1
            nxt[n] = min(l for l, c in freq.items() if c == max(freq.values()))
        labels = nxt
    sizes: dict[int, int] = {}
    for l in labels.values():
        sizes[l] = sizes.get(l, 0) + 1
    expect = sorted((n, l, sizes[l]) for n, l in labels.items())

    e = spark.createDataFrame(sym, "src long, dst long")
    got = sorted(
        (r.node, r.community, r.community_size)
        for r in graph.label_propagation(e, iters=3).collect()
    )
    assert got == expect
    # and the two triangles stay distinct communities
    assert len({l for _, l, _ in got}) >= 2


def test_winsorized_bounds_are_rank_exact(spark):
    """Hand-checkable winsorization: 20 values 1..19 plus one absurd
    outlier 10000 (cents). n=20 -> k_lo=ceil(1.0)=1, k_hi=ceil(19.0)=19:
    lo = min value, hi = 19th value = 19; only the outlier clips."""
    from ssp_spark.queries import QUERIES  # registry entry, not a helper

    rows = [("a", float(i)) for i in range(1, 20)] + [("a", 10000.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    df.createOrReplaceTempView("__wins_t")
    # drive the same kernel the query uses, inline (the query reads the
    # events table; here we replay its body on a literal frame)
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    v = df.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    wr = Window.partitionBy("grp").orderBy("x")
    wn = Window.partitionBy("grp")
    ranked = v.withColumn("rn", F.row_number().over(wr).cast("long")).withColumn(
        "n", F.count("*").over(wn)
    )
    k_lo = F.floor((5 * F.col("n") + 99) / 100)
    k_hi = F.floor((95 * F.col("n") + 99) / 100)
    bounds = (
        ranked.filter((F.col("rn") == k_lo) | (F.col("rn") == k_hi))
        .groupBy("grp")
        .agg(
            F.min(F.when(F.col("rn") == k_lo, F.col("x"))).alias("lo"),
            F.min(F.when(F.col("rn") == k_hi, F.col("x"))).alias("hi"),
        )
    )
    [b] = bounds.collect()
    assert (b.lo, b.hi) == (100, 1900)
    clipped = v.join(bounds, "grp").select(
        F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi")).alias("cx")
    )
    total = clipped.agg(F.sum("cx")).collect()[0][0]
    # 1..19 unchanged (sum 190*100=19000) + outlier clipped to 1900
    assert total == 19000 + 1900


def test_char_entropy_known_values(spark):
    """Entropy closed forms: uniform-1 char -> 0 bits, uniform-2 ->
    1 bit, uniform-4 -> 2 bits; empty text yields NO row (documented
    contract); plan stays JVM-side."""
    from ssp_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    out = T.char_entropy(df)
    got = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.entropy_bits) for r in out.collect()}
    assert got == {1: (4, 1, 0.0), 2: (4, 2, 1.0), 3: (4, 4, 2.0)}
    s = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_inverted_index_postings_tie_breaks_to_min_doc(spark):
    """df/cf and the deterministic top posting: term 'b' has tf=2 in
    docs 1 and 2 — the tie must resolve to doc 1 (min id), via the
    exact integer struct-max, not arg_max's arbitrary pick."""
    import pyspark.sql.functions as F
    from ssp_spark.functions import tokens

    docs = spark.createDataFrame(
        [(1, "a b b"), (2, "b b c"), (3, "c")],
        "doc_id long, text string",
    )
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    out = (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
            F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))).alias("m"),
        )
        .select("term", "df", "cf", (-F.col("m.nd")).alias("top_doc"), F.col("m.tf").alias("top_tf"))
    )
    got = {r.term: (r.df, r.cf, r.top_doc, r.top_tf) for r in out.collect()}
    assert got == {
        "a": (1, 1, 1, 1),
        "b": (2, 4, 1, 2),   # tie on tf=2 -> min doc 1
        "c": (2, 2, 2, 1),   # tie on tf=1 -> min doc 2
    }


def test_time_decayed_weights_are_exact_dyadics(spark):
    """Closed-form decay: purchases 0/1/25 weeks before the anchor
    weigh 1, 1/2, and 2^-20 (the cap) exactly; the anchor join is
    BROADCAST and nothing plans a single-partition exchange."""
    import datetime as dt

    import pyspark.sql.functions as F

    from ssp_spark import plans

    rows = [
        (1, "purchase", 100.0, dt.datetime(2026, 7, 1)),
        (1, "purchase", 100.0, dt.datetime(2026, 6, 24)),   # 1 week old
        (2, "purchase", 100.0, dt.datetime(2026, 1, 7)),    # 25 weeks -> cap
        (2, "click", 999.0, dt.datetime(2026, 7, 1)),       # filtered out
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double, ts timestamp")

    v = df.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("d"),
    )
    anchor = v.agg(F.max("d").alias("a"))
    w = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT),"
        " CAST(least((a - d) div 604800, 20) AS INT)) AS DOUBLE)"
    )
    out = (
        v.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(F.sum(F.col("cents") / w).alias("decayed_cents"))
    )
    got = {r.user_id: r.decayed_cents for r in out.collect()}
    assert got[1] == 10000.0 + 5000.0          # 1 + 1/2, exact
    assert got[2] == 10000.0 / (1 << 20)       # capped at 2^-20, exact
    # the 1-row anchor rides a BroadcastNestedLoopJoin (no join keys),
    # never a shuffled cartesian or a single-partition exchange
    s = plans.plan_string(out)
    assert "BroadcastNestedLoopJoin" in s
    assert not plans.has_cartesian(out)
