"""Physical-plan assertions: the properties that make these queries safe
at 100 TB must actually be planned, not just intended.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark import plans
from ssp_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_q1_pushes_filter_and_prunes_columns(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "PushedFilters: [" in s and "IsNotNull(l_shipdate)" in s
    # column pruning: o_comment-like unused columns absent; ReadSchema
    # must not contain l_orderkey (not referenced by q1)
    read_schema = [line for line in s.splitlines() if "ReadSchema" in line]
    assert read_schema and "l_orderkey" not in read_schema[0]


def test_q5_broadcasts_dimensions(spark):
    df = QUERIES["q5_nation_revenue"](spark, SF_SMOKE)
    assert plans.broadcast_join_count(df) >= 1
    assert not plans.has_cartesian(df)


def test_word_count_stays_jvm_side(spark):
    df = QUERIES["word_count"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert plans.codegen_stage_count(df) >= 1
    # map-side partial aggregation before the exchange
    assert "partial_count" in s


def test_dedup_jaccard_no_cartesian(spark):
    df = QUERIES["dedup_jaccard_pairs"](spark, SF_SMOKE)
    assert not plans.has_cartesian(df)


def test_topk_uses_window_group_limit(spark):
    df = QUERIES["top_customers_per_nation"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s  # partial top-k before the shuffle


def test_range_join_broadcasts_bands(spark):
    df = QUERIES["range_join_value_bands"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BroadcastNestedLoopJoin" in s  # 4-row side broadcast, fact side streams


def test_asof_join_single_shuffle_per_side(spark):
    """The as-of join must be the linear union+window plan: exactly one
    hash exchange for the window (plus AQE reads), no join blow-up."""
    df = QUERIES["asof_join_purchase_signup"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "CartesianProduct" not in s
    assert "SortMergeJoin" not in s  # no pairwise join at all
    assert plans.exchange_count(df) == 1


def test_running_agg_single_shuffle(spark):
    df = QUERIES["running_user_spend"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 1


def test_q6_pushes_all_predicates(spark):
    """TPC-H Q6: the whole conjunctive WHERE must reach the parquet scan."""
    df = QUERIES["q6_forecast_revenue"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    pushed = [line for line in s.splitlines() if "PushedFilters" in line]
    assert pushed
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed[0]
    read_schema = [line for line in s.splitlines() if "ReadSchema" in line]
    assert read_schema and "l_orderkey" not in read_schema[0]


def test_exists_rewrites_to_semi_join(spark):
    """Catalyst must turn the correlated EXISTS into a semi join, not a
    per-row subquery or a cross product."""
    df = QUERIES["q4_priority_exists"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "LeftSemi" in s
    assert not plans.has_cartesian(df)


def test_not_exists_rewrites_to_anti_join(spark):
    df = QUERIES["q22_idle_rich_customers"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "LeftAnti" in s
    assert not plans.has_cartesian(df)


def test_ivf_search_is_equi_join_no_python(spark):
    """IVF: assignment is map-side Catalyst (no Python eval), search is an
    equi-join on cell id — never a cross product over the corpus."""
    df = QUERIES["ann_ivf_topk"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert not plans.has_cartesian(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet layout: a filter on the partition column
    must become a PartitionFilter (directories never listed/read), not a
    post-scan filter — the difference between reading one partition and
    reading 100 TB."""
    from ssp_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, "events", SF_SMOKE).select("event_id", "user_id", "event_type")
    path = str(tmp_path / "ev_part")
    ev.write.partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    s = plans.plan_string(back)
    assert "PartitionFilters" in s and "purchase" in s.split("PartitionFilters", 1)[1][:200]
    got = back.count()
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert got == want


def test_q2_correlated_min_decorrelates(spark):
    """The per-part MIN subquery must become an aggregate+join (2 bounded
    scans of lineitem), never a per-row correlated probe or a cartesian."""
    df = QUERIES["q2_min_cost_supplier"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert s.count("lineitem.parquet") <= 2
    assert "BroadcastHashJoin" in s  # dims (region/nation/supplier) broadcast


def test_q11_global_total_subquery_bounded(spark):
    """The fraction-of-global-total threshold reuses the val CTE as one
    extra aggregate — two lineitem scans total, no cartesian."""
    df = QUERIES["q11_important_parts"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert s.count("lineitem.parquet") <= 2


def test_q21_aggregation_form_bounded_scans(spark):
    """Q21's EXISTS/NOT-EXISTS pair is written as per-order aggregates:
    the plan must touch lineitem a bounded number of times (3: late,
    late_stats, supplier-count) with no correlated re-probe loop."""
    df = QUERIES["q21_waiting_supplier"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert s.count("lineitem.parquet") <= 3


def test_pipeline_manifest_two_scans_two_shuffles(spark):
    """The composed curation pipeline must read the corpus exactly twice
    (enrichment chain on one scan + the dedup aggregate) and shuffle
    exactly twice (dedup groupBy + final rollup) — composition must not
    multiply scans via self-joins."""
    df = QUERIES["pipeline_train_manifest"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("documents.parquet") == 2
    assert plans.exchange_count(df) == 2


def test_q8_single_fact_shuffle(spark):
    """7-table market-share join: dimensions broadcast, the fact chain
    shuffles once for the final year rollup — never a cartesian."""
    df = QUERIES["q8_market_share"](spark, SF_SMOKE)
    assert not plans.has_cartesian(df)
    assert plans.exchange_count(df) <= 2
    assert plans.broadcast_join_count(df) >= 4


def test_sketch_queries_bounded_shuffles(spark):
    """CMS build+probe and Bloom build+probe each shuffle only the
    bounded sketch space (2 exchanges: sketch aggregate + probe rollup);
    the probe side joins against a BROADCAST sketch."""
    for name in ("cms_user_counts", "bloom_customer_names"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert plans.exchange_count(df) <= 2, name
        assert plans.broadcast_join_count(df) >= 1, name


def test_rollup_single_pass_expand(spark):
    """Multi-grain time rollup must be one scan + Expand + one exchange,
    not one scan per granularity."""
    df = QUERIES["time_rollup_multigrain"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert "Expand" in s
    assert s.count("events.parquet") == 1
    assert plans.exchange_count(df) == 1


def test_stratified_sample_zero_shuffle(spark):
    """Hash-threshold sampling is a pure map-side filter: no exchange at
    all — the property that lets it run on 100 TB as a scan."""
    df = QUERIES["stratified_sample_events"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 0


def test_repetition_filter_zero_shuffle(spark):
    """The Gopher repetition filter is a sorted-gram run-length fold — a
    pure projection. Zero exchanges, zero Python: corpus quality
    filtering must stream through the scan at IO speed."""
    df = QUERIES["quality_repetition_filter"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 0
    s = plans.plan_string(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_corpus_ngram_two_keyed_exchanges(spark):
    """Cross-doc repeated n-grams: exactly the two key-partitioned
    exchanges (n-gram window, then doc re-group) — no joins, nothing
    all-pairs."""
    df = QUERIES["dedup_ngram_corpus"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 2
    assert not plans.has_cartesian(df)


def test_tfidf_single_token_pass(spark):
    """tf, doc-frequency and the top-k all hang off ONE tokenize+aggregate
    pass (df_ and tot are windows over the same tf table, and the final
    per-doc top-k inherits the doc_id partitioning): exactly one Generate
    (explode), 3 exchanges total, corpus size joined as a broadcast."""
    df = QUERIES["tfidf_top_terms"](spark, SF_SMOKE)
    tree = plans.plan_string(df).split("\n\n")[0]
    assert tree.count("Generate") == 1  # the token stream is scanned once
    assert plans.exchange_count(df) == 3
    # the 1-row corpus-size agg rides in as a broadcast (nested-loop cross
    # of a single row), never a collected literal or a shuffle
    assert "BroadcastExchange" in tree and not plans.has_cartesian(df)
    assert "WindowGroupLimit" in tree  # partial top-k before the final window


def test_kmeans_assignment_is_projection(spark):
    """Lloyd's assignment against the driver-side model compiles to a
    zero-exchange, JVM-only projection — per iteration the only shuffle
    is the k x d-bounded centroid update."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import cluster

    emb = load_table(spark, "embeddings", SF_SMOKE)
    pts = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
    seed = [(r["vec_id"], list(r["__v"])) for r in pts.orderBy("vec_id").limit(4).collect()]
    assigned = cluster.assign(pts, seed, vec_col="__v")
    assert plans.exchange_count(assigned) == 0
    s = plans.plan_string(assigned)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_contamination_broadcasts_benchmark(spark):
    """The eval-suite n-gram set rides in as a broadcast; the corpus side
    never shuffles for the membership probe (its only exchange is the
    final per-doc aggregation)."""
    df = QUERIES["contamination_check"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s and not plans.has_cartesian(df)


def test_sequence_packing_single_shard_exchange(spark):
    """Concat-and-chunk packs per shard: one hash exchange on the shard
    key feeds the window cumsum; there is no global sort (a total order
    would serialize the corpus through one task)."""
    df = QUERIES["sequence_packing"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 1
    tree = plans.plan_string(df).split("\n\n")[0]
    # rangepartitioning = global sort; the only exchange must be hash
    assert "rangepartitioning" not in tree.lower()


def test_quantize_int8_zero_shuffle(spark):
    """Quantization is a pure projection over the scan: zero exchanges,
    no Python in the plan (array HOFs are Catalyst expressions)."""
    df = QUERIES["embedding_quantize_int8"](spark, SF_SMOKE)
    assert plans.exchange_count(df) == 0
    s = plans.plan_string(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_skew_stats_partial_topk(spark):
    """Heavy-hitter diagnostic: the global top-10 is pruned map-side
    (Spark 4 rewrites the rank filter to TakeOrderedAndProject — partial
    per-partition top-k, same property as WindowGroupLimit); the grand
    total joins as a broadcast, not a collected literal, and its scan
    reads zero columns (parquet metadata count)."""
    df = QUERIES["skew_key_stats"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "TakeOrderedAndProject" in s or "WindowGroupLimit" in s
    assert "BroadcastExchange" in s
    read_schemas = [l for l in s.splitlines() if "ReadSchema" in l]
    assert any("struct<>" in l for l in read_schemas)  # metadata-only count scan


def test_null_safe_join_is_hash_join(spark):
    """eqNullSafe must still plan as a hash-equi-join (null-safe equality
    is a valid hash key) — never a nested-loop over the fact side."""
    df = QUERIES["null_safe_join_props"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "HashJoin" in s  # Broadcast- or ShuffledHashJoin both fine
    assert not plans.has_cartesian(df)


def test_lsh_buckets_no_per_row_constant_hashing(spark):
    """The LSH hyperplane sign matrix is row-independent: it must be baked
    into the plan as literals (precomputed driver-side), never recomputed
    per row — the plan must contain NO md5 (VERDICT r3 inefficiency #1),
    no Python, and no cartesian join."""
    df = QUERIES["ann_lsh_topk"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "md5" not in s.lower()
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_lsh_buckets_expr_form_is_canonically_identical(spark):
    """Round-13 optimization: lsh_buckets assembles its bucket column as
    ONE parsed SQL expression instead of ~512 py4j Column calls (plan
    CONSTRUCTION dropped ~0.7 s -> ~0.08 s per call). The rewrite must
    be a pure build-time change: the optimized plan must canonicalize
    EQUAL to the reference Column-API form it replaced."""
    import pyspark.sql.functions as F

    from ssp_spark.catalog import load_table
    from ssp_spark.operators.similarity import lsh_buckets, plane_signs

    emb = load_table(spark, "embeddings", SF_SMOKE)

    # the pre-r13 Column-API reference form, verbatim
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    terms = []
    for p, row in enumerate(plane_signs(8, 64)):
        lit_arr = F.array(*[F.lit(s) for s in row])
        d = F.aggregate(
            F.zip_with(v, lit_arr, lambda x, s: F.coalesce(x * s, F.lit(0.0))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        terms.append(F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    ref = emb.withColumn("bucket", bucket)

    new = lsh_buckets(emb, id_col="vec_id", vec_col="embedding")
    ref_c = ref._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    new_c = new._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert new_c == ref_c


def test_standardize_model_literal_expr_form_identical(spark):
    """Round-13 optimization: embedding_standardize assembles its
    (mean, sd) model literal as ONE parsed SQL string instead of
    d_model x ~5 py4j Column calls. The string form (repr-formatted
    D-suffixed doubles inside named_struct) must canonicalize EQUAL to
    the Column-API tree it replaced — checked here on a synthetic model
    including a negative, a subnormal-ish sci-notation value and the
    0.0 padding the query emits for excluded dims."""
    import pyspark.sql.functions as F

    model = {0: (1.5, 0.25), 2: (-3.75e-05, 123456.78125)}
    d_model = 3
    df = spark.range(3).select(F.array(F.lit(1.0), F.lit(2.0)).alias("__q"))

    ms_old = F.array(
        *[
            F.struct(
                F.lit(model[i][0] if i in model else 0.0).alias("m"),
                F.lit(model[i][1] if i in model else 0.0).alias("sd"),
            )
            for i in range(d_model)
        ]
    )
    ms_new = F.expr(
        "array("
        + ",".join(
            "named_struct('m',{m!r}D,'sd',{sd!r}D)".format(
                m=model.get(i, (0.0, 0.0))[0], sd=model.get(i, (0.0, 0.0))[1]
            )
            for i in range(d_model)
        )
        + ")"
    )
    a = df.select(ms_old.alias("ms"))
    b = df.select(ms_new.alias("ms"))
    ca = a._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    cb = b._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert ca == cb


def test_text_spreads_are_hash_partitioned_not_roundrobin(spark):
    """Round-13 optimization (guide §2.5): the pre-explode rebalance in
    the text/dedup operators hashes on the unique doc id instead of a
    keyless round-robin repartition — a keyless repartition pays a
    retry-determinism local sort of the full text rows before every
    shuffle write (spark.sql.execution.sortBeforeRepartition), while
    hashing a unique key spreads identically without the sort. Pinned
    on the suite queries whose final plan is not checkpoint-truncated
    (round 14 adds bpe_token_stats — the family's last round-robin text
    spread, now hashed on the doc_id the caller already has); the codec
    gates' _spread_for_cpu stays round-robin by design (no id column;
    asserted in test_codec_gates_decode_map_shape)."""
    for name in ("dedup_simhash", "bigram_lm_score", "bpe_token_stats"):
        df = QUERIES[name](spark, SF_SMOKE)
        s = plans.plan_string(df, "simple")
        assert "RoundRobinPartitioning" not in s, name
        assert "Exchange hashpartitioning(doc_id" in s, name


def test_fuzzy_ingest_single_exchange(spark):
    """Round-13 optimization (guide §2.4): fuzzy_pairs' ingest dedups
    the (id, string) rows on ONE hash exchange — repartition by the
    distinct keys at the core count, then dropDuplicates reuses that
    exchange — instead of the old distinct-exchange + keyless
    repartition pair. The plan must show exactly one ingest exchange
    on (fid, fstr) and no RoundRobin anywhere."""
    from ssp_spark.operators import fuzzy

    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    df = fuzzy.fuzzy_pairs(
        part, "p_name", "p_name", max_dist=2, checkpoint=False,
        short_strings="ignore",
    )
    s = plans.plan_string(df, "simple")
    assert "RoundRobinPartitioning" not in s
    import re

    ingest = {
        m.group(0)
        for m in re.finditer(r"Exchange hashpartitioning\(fid[^\]]*?REPARTITION_BY_NUM", s)
    }
    assert len(ingest) == 1, s


def test_fuzzy_verify_broadcast_reused(spark):
    """Round-13 optimization (guide §2.4): the verify step's two name
    lookups broadcast the IDENTICAL subtree (one shared projection with
    its not-null conjuncts written explicitly so constraint inference
    cannot reorder them per side), so ReuseExchange collapses the second
    broadcast build into a ReusedExchange — one broadcast job + one
    in-memory relation instead of two."""
    from ssp_spark.operators import fuzzy

    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    # assert on the STATIC (non-AQE) plan — the benched sf0.1 config
    # (AQE is input-gated off below 1 GiB): there ReuseExchangeAndSubquery
    # rewrites the second broadcast statically. Under AQE each cache use
    # becomes its own TableCacheQueryStage and the equivalent stage-level
    # reuse is a runtime concern, not this pin's.
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = fuzzy.fuzzy_pairs(
            part, "p_name", "p_name", max_dist=2, checkpoint=False,
            short_strings="ignore",
        )
        s = plans.plan_string(df, "simple")
        assert "ReusedExchange" in s, s
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_keeper_single_documents_scan(spark):
    """Round-13 optimization (guide §2.4): cluster_dedup_keeper computes
    quality INLINE on the grouped frame (quality_score is a pure per-row
    projection), so the old corpus self-join on doc_id — whose only
    purpose was to glue two projections of the same documents row back
    together — is gone: the plan reads documents exactly once."""
    df = QUERIES["cluster_dedup_keeper"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("documents.parquet") == 1, s


def test_simhash64_fingerprint_stays_map_side(spark):
    """The production-width simhash: the fingerprint fold must stay a
    map-side projection (no per-doc aggregation exchange — the only
    exchanges are the input rebalance and the band self-join), with no
    Python and no cartesian anywhere."""
    df = QUERIES["dedup_simhash64_pairs"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)
    # the vote fold is one expression over the token-hash array: the plan
    # must contain no hash-aggregate keyed on doc_id for the fingerprint
    # (banding explodes AFTER the fingerprint; distinct dedups pairs)
    assert "partial_min" not in s and "partial_sum" not in s


def test_doc_chunking_zero_shuffle(spark):
    """Sliding-window chunking is a pure map stage: tokenize -> explode
    -> slice projection, NO exchange anywhere — at 100 TB it must run at
    IO speed with the input's partitioning."""
    df = QUERIES["doc_chunk_overlap"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert plans.exchange_count(df) == 0
    assert "Generate" in s  # the explode over the chunk-index sequence
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_vocab_coverage_topk_no_global_window(spark):
    """Round-10 shape (VERDICT r9 #5): the vocabulary is data-shaped at
    100 TB (~1e9 types), so NOTHING may move all vocab rows to one
    partition. The rank pass must be the distributed top-k heap
    (TakeOrderedAndProject — the output is capped at rank <= 1000), no
    Window operator anywhere (the old form ran global rank/cumsum/total
    windows on one single-partition exchange), and the corpus must
    still be tokenized ONCE: the total-sum branch reuses the word
    hash-shuffle exchange at runtime (AQE stage reuse — asserted on the
    executed final plan)."""
    df = QUERIES["vocab_coverage"](spark, SF_SMOKE)
    df.collect()  # AQE: exchange reuse is decided at runtime
    s = plans.plan_string(df, "simple")
    final = s.split("== Initial Plan ==")[0]
    assert "Window" not in final  # no global-window rank/cumsum/total
    assert "TakeOrderedAndProject" in final  # distributed top-k heap
    # ONE materialized word shuffle: the total branch reads the reused
    # exchange, so exactly one subtree tokenizes the corpus
    assert final.count("ReusedExchange") == 1
    assert "partial_count" in final  # map-side combine on the tokens
    assert not plans.has_cartesian(df)


def test_scd1_merge_broadcasts_delta_keys(spark):
    """The CDC shape: big base, small delta. The left_anti key-suppression
    join must broadcast the delta's key set so the base table never
    shuffles; no cartesian anywhere."""
    df = QUERIES["scd1_customer_merge"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BroadcastHashJoin" in s and "LeftAnti" in s
    assert plans.exchange_count(df) == 0  # base carries over unshuffled
    assert not plans.has_cartesian(df)


def test_bucketed_join_no_fact_exchange(spark):
    """The bucketed co-located join: both fact sides must read their
    bucketed layout with NO exchange feeding the SortMergeJoin — the
    only shuffle is the tiny per-priority aggregate."""
    df = QUERIES["bucketed_join_order_revenue"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SortMergeJoin" in s
    assert plans.exchange_count(df) == 1  # groupBy(o_orderpriority) only
    assert not plans.has_cartesian(df)


def test_sink_partitioned_scan_prunes(spark):
    """The partitioned-sink round-trip query: the lang filter must be a
    PartitionFilter on the read-back scan (one directory subtree read),
    never a post-scan predicate over all partitions."""
    df = QUERIES["sink_partitioned_scan"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "PartitionFilters" in s
    assert "lang" in s.split("PartitionFilters", 1)[1][:200]
    assert plans.exchange_count(df) == 1  # the per-source aggregate only


def test_mixture_weights_windows_on_domain_frame(spark):
    """Temperature mixing: the corpus collapses through ONE map-side-
    combined groupBy before any window — the single-partition windows run
    on the #domains-row aggregate, so the plan is partial agg -> exchange
    -> final agg -> single-partition exchange, with the corpus scanned
    once."""
    df = QUERIES["domain_mixture_weights"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert s.count("Location:") == 1  # one documents scan
    assert "partial_count" in s  # map-side combine before the shuffle
    assert plans.exchange_count(df) == 1  # hash(source) for the groupBy
    assert plans.plan_string(df, "simple").count("Exchange SinglePartition") == 1


def test_cluster_keeper_no_cartesian_cluster_sized_window(spark):
    """Keeper selection: label join + quality join + one row_number window
    keyed by cluster — no cartesian, no Python, and the window is
    PARTITIONED (never a move-everything-to-one-task window)."""
    df = QUERIES["cluster_dedup_keeper"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert not plans.has_cartesian(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "row_number" in s
    assert "Exchange SinglePartition" not in plans.plan_string(df, "simple")


def test_cc_driver_path_labels_broadcast(spark):
    """Round-13 optimization: under the driver-union-find gate the CC
    label frame's size is KNOWN (<= driver_edge_threshold nodes), so
    connected_components hints it broadcastable — consumers must plan
    the docs-side label lookup as a broadcast join, not the sort-merge
    join (2 exchanges + big-side sorts) Spark picked without stats.
    The distributed fallback stays unhinted (scale safety)."""
    for name in ("cluster_dedup_keeper", "entity_resolution_parts"):
        df = QUERIES[name](spark, SF_SMOKE)
        s = plans.plan_string(df)
        assert "SortMergeJoin" not in s, name
    # keeper's label join must actually BE a broadcast (ER's label frame
    # is EMPTY at smoke scale, so PropagateEmptyRelation deletes its
    # join outright — no join node of any kind to assert on)
    df = QUERIES["cluster_dedup_keeper"](spark, SF_SMOKE)
    assert plans.broadcast_join_count(df) >= 1


def test_bigram_lm_single_scan_cached_stream_broadcast_model(spark):
    """Round 13 (guide §5): under the input-size gate the exploded
    bigram stream is CACHED between its two consumers (model build +
    scoring), so the corpus scans once and the tokenize+shingle+explode
    runs once instead of twice (measured 6.38 -> 3.29 s at the 10x
    fixture). The prefix counts stay a model-sized rollup (never a
    third pass); the model still joins back as a broadcast with no
    Python and no cartesian."""
    df = QUERIES["bigram_lm_score"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    # BOTH consumers (model aggregate, scoring join) read the cache —
    # one runtime materialization of the explode. (The plan STRING
    # prints the relation's child under each InMemoryTableScan, so the
    # FileScan line appears twice; the relation itself is one cache.)
    assert s.count("InMemoryTableScan") == 2
    assert "InMemoryRelation" in s
    assert plans.broadcast_join_count(df) >= 1  # model into the stream
    full = plans.plan_string(df)
    assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full
    assert not plans.has_cartesian(df)


def test_bigram_lm_over_gate_recomputes_two_scans(spark, monkeypatch):
    """Over the gate (the 100 TB posture) lm_score must NOT cache the
    data-sized stream: the plan falls back to the prior two-scan shape
    — and both shapes return identical rows."""
    from ssp_spark.operators import text as text_ops

    # drop any live stream cache first: the CacheManager substitutes a
    # registered fragment into EVERY later matching plan, gated or not
    spark.catalog.clearCache()
    text_ops._LM_STREAM_CACHE.pop(spark, None)
    orig_gate = text_ops._LM_PERSIST_INPUT_BYTES
    monkeypatch.setattr(text_ops, "_LM_PERSIST_INPUT_BYTES", 0)
    df = QUERIES["bigram_lm_score"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("documents.parquet") == 2
    assert "InMemoryRelation" not in s
    b = sorted(map(tuple, df.collect()))
    monkeypatch.setattr(text_ops, "_LM_PERSIST_INPUT_BYTES", orig_gate)
    cached = QUERIES["bigram_lm_score"](spark, SF_SMOKE)
    a = sorted(map(tuple, cached.collect()))
    assert a == b


def test_histogram_partial_aggregates(spark):
    """The histogram's shuffle is |types| x |buckets| cells: map-side
    partial aggregation must appear before the exchange."""
    df = QUERIES["value_histogram"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "partial_count" in s
    assert plans.exchange_count(df) == 1


def test_profile_table_single_scan(spark):
    """The column profiler must read the table ONCE: all per-column
    distinct+null aggregates hang off a single Aggregate (one Expand for
    the multi-distinct), never a scan per column like the oracle's
    UNION ALL."""
    df = QUERIES["profile_table"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("orders.parquet") == 1
    assert "Expand" in s  # the multi-distinct rewrite


def test_bloom_prefilter_is_literal_scan_filter(spark):
    """The Bloom membership test must be a literal-mask filter ON THE
    SCAN (no join, no subquery feeding it); the only join in the plan is
    the exact broadcast join that removes false positives."""
    df = QUERIES["bloom_prefilter_join"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("BroadcastHashJoin") == 1  # just the exact fp-removal join
    assert "SortMergeJoin" not in s and not plans.has_cartesian(df)
    # the membership test is a literal-mask getbit filter pushed onto the
    # orders scan — no join/subquery feeds it
    assert "getbit" in s.split("BroadcastHashJoin", 1)[1]
    assert plans.exchange_count(df) == 1  # only the final aggregate


def test_embedding_lsh_dedup_equi_join_no_cartesian(spark):
    """The LSH-blocked embedding near-dup must be a bucket equi-join fed
    by the probe-mask explode — no cartesian/nested-loop over the vector
    set, no Python, no per-row md5 of constants (the sign matrix is
    literal)."""
    df = QUERIES["dedup_embedding_lsh"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert not plans.has_cartesian(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "md5" not in s.lower()


def test_cooccurrence_never_self_joins_events(spark):
    """Pair generation is per-user in-row combinatorics: the only joins
    in the plan are the two broadcast per-type count lookups on the
    |types|²-bounded pair frame — no event-stream self-join."""
    df = QUERIES["event_cooccurrence"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s
    assert s.count("BroadcastHashJoin") == 2


def test_mixture_resample_draw_is_broadcast_filter(spark):
    """The sampling draw must read the corpus once under a broadcast
    rate lookup (map-side filter) — the corpus never shuffles on the
    domain key for the draw; only the kept-count aggregate exchanges."""
    df = QUERIES["mixture_resample"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert "BroadcastHashJoin" in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_groupwise_regression_partial_moments(spark):
    """The OLS moments must combine map-side (6 longs per group per
    partition through the exchange) with no quadratic stage."""
    df = QUERIES["groupwise_regression"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "partial_sum" in s and "partial_count" in s
    assert not plans.has_cartesian(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_snapshot_diff_single_full_outer_join(spark):
    df = QUERIES["snapshot_diff_customers"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("FullOuter") == 1
    assert not plans.has_cartesian(df)


def test_daily_spine_fill_two_event_scans(spark):
    """Densification reads events exactly twice (bounds + daily agg);
    the spine side is a generated explode, not a table."""
    df = QUERIES["daily_spine_fill"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("Scan parquet") == 2


def test_embedding_standardize_zero_shuffle_projection(spark):
    """After the O(d) model collect, scoring must be a pure projection:
    no exchange, no Python, the per-dimension stats inlined as
    literals."""
    df = QUERIES["embedding_standardize"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert plans.exchange_count(df) == 0
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_triangle_day_cap_is_window_group_limit(spark):
    """The per-day user cap (queries._TRIANGLE_DAY_CAP) must compile to
    WindowGroupLimit — a map-side per-day top-k heap — so no task ever
    materializes a hot day's full user list just to rank it. Asserted on
    the capped stage itself (the query's localCheckpoint truncates it
    out of the final plan)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.queries import _capped_user_days

    df = _capped_user_days(load_table(spark, "events", SF_SMOKE))
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s


def test_triangle_capped_stage_two_exchanges(spark):
    """The r12 fold (VERDICT r11 #1): distinct-(user, day) + the
    min-days prune ride ONE user-keyed collect_set aggregate, then the
    day-keyed cap window — exactly TWO hash exchanges on the capped
    stage. The r11 shape (distinct + count window + cap window) had
    three; this pins the creep fix against regression."""
    from ssp_spark.catalog import load_table
    from ssp_spark.queries import _capped_user_days

    df = _capped_user_days(load_table(spark, "events", SF_SMOKE), min_days=28)
    assert plans.exchange_count(df) == 2
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s       # the cap still compiles map-side
    assert "collect_set" in s            # the fold is the aggregate


def test_triangle_driver_closing_matches_distributed(spark, monkeypatch):
    """Round-13 optimization: a surviving edge set at or under
    _TRIANGLE_DRIVER_EDGES closes its wedges in one exact in-memory
    driver pass (the connected_components driver-union-find precedent)
    instead of the localCheckpoint + broadcast-join stage. Both paths
    must produce the IDENTICAL (n_edges, n_triangles) row, and the
    distributed fallback must still exist: forcing the gate to 0 takes
    the old plan (asserted via its broadcast joins)."""
    import ssp_spark.queries as q
    from tests.conftest import SF_CORRECT

    # sf0.01: 281 surviving edges, 188 triangles — a real closing stage
    # on both paths (the smoke fixture's edge set is empty, which would
    # vacuously pass)
    drv = QUERIES["triangle_count_users"](spark, SF_CORRECT).collect()
    assert drv[0]["n_edges"] > 0
    monkeypatch.setattr(q, "_TRIANGLE_DRIVER_EDGES", -1)
    dist_df = QUERIES["triangle_count_users"](spark, SF_CORRECT)
    dist = dist_df.collect()
    assert [tuple(r) for r in drv] == [tuple(r) for r in dist]
    # the fallback is the broadcast-wedge plan, not a driver literal
    assert plans.broadcast_join_count(dist_df) >= 1


def test_simhash_filter_carries_no_hash_fold(spark):
    """The r12 simhash fix: the zero-token prune is a cheap RLIKE on the
    raw text, pushed to the scan. The r11 form filtered on size() of the
    hash-transformed array, and Catalyst substituted the ENTIRE
    tokenize+md5 fold into the pushed-down filter — every doc paid the
    fingerprint twice. Pinned: no Filter node may contain the md5/conv
    fingerprint expression."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import dedup

    df = dedup.simhash(load_table(spark, "documents", SF_SMOKE), bits=60)
    for line in plans.plan_string(df).splitlines():
        if "Filter" in line and "PushedFilters" not in line:
            assert "md5" not in line, f"hash fold leaked into a filter: {line[:120]}"
    # the rlike prune must still exist (zero-token docs are dropped)
    assert "RLIKE" in plans.plan_string(df)


def test_lsh_gemm_no_corpus_repartition(spark):
    """The r12 gemm change: no RoundRobin repartition anywhere in the
    plan — the groupBy(bucket) exchange is the only redistribution the
    corpus needs before the per-bucket GEMM (the jvm path keeps its
    spread and is not asserted here)."""
    df = QUERIES["ann_lsh_topk_gemm"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "RoundRobinPartitioning" not in s
    assert "REPARTITION_BY_NUM" not in s


def test_token_budget_selection_no_global_sort(spark):
    """Budget selection must be keyed windows only — no single-partition
    exchange (global sort) anywhere, no Python — asserted on the
    UN-checkpointed selection plan (the query's localCheckpoint would
    truncate it), with the cut thresholds inlined as a literal map
    (InMemoryTableScan of the cached scored frame, not a re-score)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.queries import _token_budget_frames

    q, out = _token_budget_frames(load_table(spark, "documents", SF_SMOKE))
    try:
        s = plans.plan_string(out)
        assert "SinglePartition" not in s
        assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
        assert not plans.has_cartesian(out)
        assert "InMemoryTableScan" in s  # survivors reuse the cached score
    finally:
        q.unpersist()


def test_scd2_two_windows_share_one_exchange(spark):
    """Change detection (lag) and interval close (lead) must ride ONE
    keyed exchange — Catalyst reuses the (user_id -> sort) distribution
    for both windows; no join, no second shuffle, no Python."""
    df = QUERIES["scd2_user_state_history"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert plans.exchange_count(df) == 1
    assert "Window" in s  # both lag and lead planned as Window over that one exchange
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_outlier_mad_no_global_sort_and_broadcast_models(spark):
    """The median/MAD screen must stay keyed: no single-partition
    exchange anywhere (rank windows are per-group), and the per-group
    median/MAD frames join back via BROADCAST (model-sized sides)."""
    df = QUERIES["outlier_mad_orders"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert plans.broadcast_join_count(df) >= 2
    assert not plans.has_cartesian(df)


def test_key_skew_report_reuses_count_exchange(spark):
    """The skew advisor must pay ONE count shuffle: the top-k branch and
    the total branch read the same exchange (ReusedExchange), the top-k
    compiles to TakeOrderedAndProject (per-partition heap, no global
    sort), and the 1-row total broadcasts."""
    df = QUERIES["key_skew_report_events"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "TakeOrderedAndProject" in s
    assert "BroadcastExchange" in s or "BroadcastQueryStage" in s
    # exchange REUSE is an AQE runtime decision — visible only in the
    # final adaptive plan of THIS Dataset's QueryExecution, so collect()
    # (a .write would build a separate execution), then re-read the plan
    df.collect()
    s_final = plans.plan_string(df)
    assert "isFinalPlan=true" in s_final
    assert "ReusedExchange" in s_final


def test_bpe_encode_zero_shuffle_before_count(spark):
    """The BPE encode pass is one codegen projection: no Python eval, no
    exchange until the token count, merge table inlined as literals."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import text as T
    from ssp_spark.queries import _BPE_MERGES

    enc = T.bpe_encode(load_table(spark, "documents", SF_SMOKE), _BPE_MERGES)
    s = plans.plan_string(enc)
    assert "Exchange" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_simhash_band_cap_is_window_group_limit(spark):
    """The per-bucket band cap (dedup.DEFAULT_BAND_CAP, the round-9
    sf10-JVM-death guard) must compile to WindowGroupLimit — map-side
    per-bucket top-k heaps — so no task ever materializes a hot band
    bucket just to rank it. Asserted on the capped stage itself (the
    pair query's localCheckpoint truncates it from the final plan)."""
    from ssp_spark.catalog import load_table
    from ssp_spark.operators import dedup

    df = dedup.banded_fingerprints(
        load_table(spark, "documents", SF_SMOKE), bits=60, bands=4
    )
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_bpe_token_stats_codegen_encode(spark):
    """The r9 stream form: the 12-replace chain must be a plain
    whole-stage-codegen projection — the merge chain appears exactly
    ONCE in the formatted plan (the HOF form carried THREE copies: the
    inferred size/isnotnull filter re-evaluated the whole chain twice),
    no interpreted lambdafunction wrapper, no Python eval, and exactly
    two exchanges (the pre-explode rebalance + the token count)."""
    df = QUERIES["bpe_token_stats"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "lambdafunction" not in s
    assert s.count(" e  r ") == 1  # first merge literal: one copy only
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert plans.exchange_count(df) <= 2


def test_dedup_span_pairs_no_cartesian(spark):
    """Substring dedup must stay an inverted-index equi-join — any
    cartesian/nested-loop product means the boilerplate cap failed to
    reach the plan."""
    df = QUERIES["dedup_span_pairs"](spark, SF_SMOKE)
    assert not plans.has_cartesian(df)


def test_pit_enrich_single_exchange_carry(spark):
    """Point-in-time enrichment must be the linear union+window carry:
    no SortMergeJoin of facts against the history (the quadratic
    validity-range plan it replaces)."""
    df = QUERIES["pit_enrich_events"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SortMergeJoin" not in s
    assert not plans.has_cartesian(df)


def test_winsorized_stats_no_global_sort_and_broadcast_bounds(spark):
    """The winsorized mean must stay keyed: the rank window is
    per-group (no single-partition exchange), and the |groups|-row
    bounds frame joins back via BROADCAST."""
    df = QUERIES["winsorized_stats_events"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert plans.broadcast_join_count(df) >= 1
    assert not plans.has_cartesian(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_skyline_no_global_sort_no_join(spark):
    """The skyline must be the range-sharded plan: windows partitioned
    by shard (no single-partition exchange anywhere), the carry-in an
    array LITERAL (no join of any kind — the broadcast-join variant hit
    Catalyst's constraint-inference binding bug, see
    relational.skyline_min_max), no dominance cartesian."""
    df = QUERIES["skyline_pareto_parts"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert not plans.has_cartesian(df)
    assert "Join" not in s  # carry is compiled in, not joined
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_anomaly_dow_partial_topk_and_broadcast_baseline(spark):
    """The anomaly monitor's per-type top-3 must compile to
    WindowGroupLimit (partial top-k before the shuffle) and the
    |types|x7 baseline must broadcast back."""
    df = QUERIES["anomaly_dow_events"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s
    assert plans.broadcast_join_count(df) >= 1
    assert "SinglePartition" not in s


def test_assoc_rules_broadcasts_all_dims(spark):
    """Association rules: the basket self-join is user-keyed; the
    |types|-sized n_a/n_b lookups and the 1-row universe count all
    broadcast (no data-sized exchange after the pair count)."""
    df = QUERIES["assoc_rules_events"](spark, SF_SMOKE)
    assert plans.broadcast_join_count(df) >= 2
    assert "BroadcastNestedLoopJoin" in plans.plan_string(df)  # 1-row N
    assert not plans.has_cartesian(df)


def test_time_split_zero_shuffle_stamp(spark):
    """After the (eager, separate-job) boundary pass, the split stamp is
    map-side: the returned plan holds one aggregate exchange and no
    sort."""
    df = QUERIES["time_split_embargo_events"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert "Sort " not in s and "SinglePartition" not in s


def test_ks_test_windows_stay_keyed(spark):
    """KS cumulative windows run over the histogram keyed BY SEGMENT:
    the only single-partition exchange allowed is the 1-row grand-total
    aggregate (the same model-artifact exception welch_ttest uses); dim
    + model lookups broadcast; no cartesian."""
    df = QUERIES["ks_test_segments"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("Exchange SinglePartition") <= 1  # the 1-row total
    assert plans.broadcast_join_count(df) >= 2
    assert not plans.has_cartesian(df)


def test_rfm_stamp_is_zero_shuffle_after_boundaries(spark):
    """After the (eager) boundary passes, the RFM triple bin stamp is a
    literal-compiled projection: the returned plan is stamp + one
    rollup exchange — no ntile-style single-partition window, no
    joins."""
    df = QUERIES["rfm_customer_segments"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert "Join" not in s  # bounds are literals, not joined frames
    assert "WindowGroupLimit" not in s and "Window" not in s.replace(
        "WindowGroupLimit", ""
    )


def test_copurchase_partial_topk_no_cartesian(spark):
    """Co-purchase link scoring: per-customer top-5 compiles to
    WindowGroupLimit; candidate pairs come from array combinatorics
    (no cartesian, no nested-loop self-join)."""
    df = QUERIES["copurchase_similar_customers"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "WindowGroupLimit" in s
    assert not plans.has_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in s


def test_chisq_broadcasts_margins(spark):
    """Chi-square: both margins and the 1-row total broadcast back onto
    the contingency frame; the only single-partition exchanges are the
    1-row total and the single-row output aggregate."""
    df = QUERIES["chisq_type_dow_events"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("Exchange SinglePartition") <= 2
    assert plans.broadcast_join_count(df) >= 2
    assert not plans.has_cartesian(df)


def test_entropy_single_key_exchange_family(spark):
    """User entropy: the (user, type) count, the per-user total, and the
    rollup all hash on user_id — no single-partition exchange, no
    Python eval."""
    df = QUERIES["user_event_entropy"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_interarrival_two_keyed_exchanges(spark):
    """Interarrival stats: one user-keyed lag window + one moment
    aggregate — both exchanges hash on user_id, nothing global."""
    df = QUERIES["interarrival_stats_users"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert plans.exchange_count(df) <= 2


def test_pmi_topk_partial_heap(spark):
    """PMI collocations: the global top-50 must compile to
    TakeOrderedAndProject (per-partition heap), never a global sort of
    the bigram table."""
    df = QUERIES["pmi_collocations_docs"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "TakeOrderedAndProject" in s
    assert not plans.has_cartesian(df)


def test_acf_model_frame_broadcast_joins(spark):
    """ACF: the lag self-join and the totals join both broadcast the
    time-bounded daily frame — nothing data-sized reaches a shuffle
    join, and the only aggregation exchanges hash on the day/lag keys."""
    df = QUERIES["acf_daily_orders"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert plans.broadcast_join_count(df) >= 2
    assert "SortMergeJoin" not in s
    assert not plans.has_cartesian(df)


def test_mann_kendall_pair_join_is_broadcast(spark):
    """Mann-Kendall: the i<j pair join runs as a broadcast
    nested-loop over the DAILY model frame (days², time-bounded) —
    never a data-sized shuffle join; all other frames are 1-row
    broadcasts."""
    df = QUERIES["mann_kendall_trend_orders"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BroadcastNestedLoopJoin" in s  # the intended pair join
    assert "SortMergeJoin" not in s
    assert "CartesianProduct" not in s


def test_benford_digit_table_stays_tiny(spark):
    """Benford: one map-side-combined groupBy on a 9-value key; the
    literal digit table and the 1-row total broadcast — no sort, no
    Python eval."""
    df = QUERIES["benford_order_totals"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert plans.broadcast_join_count(df) >= 1
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "SortMergeJoin" not in s


def test_cuped_welch_shape_no_window(spark):
    """CUPED: one user-keyed aggregation plus 1-row broadcast moment
    frames (the welch_ttest shape) — no window, no single-partition
    funnel beyond the 1-row aggregates."""
    df = QUERIES["cuped_adjusted_spend"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "Window" not in s
    assert "SortMergeJoin" not in s


def test_bootstrap_resample_path_is_one_map_side_explode(spark):
    """The Poisson bootstrap's data path must be join-free and
    JVM-side: the 64-way resample is a Generate (explode) feeding a
    partial-aggregated 64-key groupBy — no Python eval, no cartesian,
    and the only unpartitioned window sits on the bounded 64-row
    resample frame, never on data rows."""
    df = QUERIES["bootstrap_ci_spend"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    # exactly TWO Generates in one linear pipeline — the 11-way hash-k
    # explode and the 6-draw posexplode — and exactly ONE scan: the CI
    # endpoints AND the point statistics all ride the single ranked
    # branch (a second branch would re-scan events; seen in the plan
    # before round 8 folded the point stats into the 64-key aggregate)
    assert s.count("Generate (") == 2 and "explode(" in s
    assert plans.plan_string(df, "simple").count("Scan ") == 1
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_streaks_all_windows_are_keyed(spark):
    """Gaps-and-islands must never funnel through one task: every
    window partitions by user_id, so no SinglePartition exchange exists
    anywhere in the plan."""
    df = QUERIES["streaks_user_activity"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "SinglePartition" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_calibration_bins_rank_pass_is_sharded(spark):
    """Reliability bins ride the range-sharded rank pass: windows are
    keyed by shard (no SinglePartition), the 1-row total broadcasts,
    and the bin rollup is a 10-key hash aggregate. The rank pass itself
    is the memoized+checkpointed family artifact, so its shape is
    asserted on the pre-checkpoint frame — the checkpoint would hide it
    from the query's own plan."""
    from ssp_spark.operators import layout
    from ssp_spark.queries import _scored_embeddings

    pre = layout.global_order_positions(
        _scored_embeddings(spark, SF_SMOKE), "s", "vec_id"
    )
    assert "SinglePartition" not in plans.plan_string(pre)
    df = QUERIES["calibration_bins_embeddings"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    # the ONLY single-partition exchange is the 1-row totals aggregate
    # that immediately broadcasts; rank windows stay sharded
    assert s.count("SinglePartition") <= 1
    assert "BroadcastExchange" in s or "BroadcastQueryStage" in s
    assert not plans.has_cartesian(df)


def test_isotonic_minimax_runs_on_bounded_frame(spark):
    """The PAV minimax evaluation must be broadcast-joined over the
    100-row centile frame — the data pays ONE rank pass; everything
    after the 100-key rollup is bounded by cell count, so the
    (i,k,j) expansion never touches an exchange."""
    df = QUERIES["isotonic_calibration_embeddings"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert "BroadcastNestedLoopJoin" in s  # the bounded range joins
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_attribution_windows_all_keyed(spark):
    """Position-based attribution must never leave user-keyed state:
    the reverse running-min and the position/size windows partition by
    (user) / (user, conversion) — no SinglePartition anywhere except
    the 1-row conversion total that broadcasts."""
    df = QUERIES["attribution_position_based"](spark, SF_SMOKE)
    s = plans.plan_string(df)
    assert s.count("SinglePartition") <= 1
    assert "BroadcastExchange" in s or "BroadcastQueryStage" in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_quantile_normalize_one_source_exchange(spark):
    """The source-rank window (row_number) and the source-size window
    (count) must ride ONE source-keyed exchange — Catalyst reuses the
    (source -> sort) distribution for both; the pooled rank pass stays
    shard-keyed and the 1-row total broadcasts."""
    df = QUERIES["quantile_normalize_quality"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert s.count("Exchange hashpartitioning(source") == 1
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert not plans.has_cartesian(df)


def test_codec_gates_decode_map_shape(spark):
    """The multimodal decode gates must stay pure decode maps: one
    parquet scan, at most the ONE RoundRobin spread exchange
    (_spread_for_cpu — no hash/range shuffle, no join, no aggregate
    below the kernel), Arrow-batched python (MapInPandas), and no
    cartesian products. A hash-partitioned Exchange appearing here
    would mean a gate silently grew a shuffle that 100 TB would pay
    per decoded row."""
    for name in (
        "multimodal_decode_gif",
        "multimodal_decode_tiff",
        "multimodal_decode_audio_flac",
        "multimodal_decode_jpeg12",
        "multimodal_decode_bmp_rle8",
        "multimodal_decode_webp",
        "multimodal_gif_anim_index",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        s = plans.plan_string(df, "simple")
        assert "hashpartitioning" not in s, name
        assert "rangepartitioning" not in s, name
        assert s.count("Exchange") <= 1, name  # the RoundRobin spread only
        assert "MapInPandas" in s, name
        assert "Join" not in s, name
        assert not plans.has_cartesian(df), name
