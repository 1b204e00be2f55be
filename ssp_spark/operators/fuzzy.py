"""Approximate string matching: q-gram-blocked fuzzy (edit-distance) join.

The reference has no string-similarity surface at all (its closest
analogue is user Go closures over strings, engine_test.go:549-573); this
module is part of the §6 training-pipeline extension family — entity
resolution over noisy names/titles is a standard curation step (merging
near-identical source names before per-domain mixing, collapsing scraped
title variants before dedup).

Design for 100 TB — never n² on strings:

- Candidate generation is **prefix-filtered q-gram blocking** (the
  classic filter from the similarity-join literature, e.g. Chaudhuri et
  al. SSJoin / Xiao et al. ppjoin): a single edit operation destroys at
  most ``q`` character q-grams, so two strings within edit distance
  ``d`` share all but at most ``d*q`` of their grams. By the prefix
  filter, if every string keeps only its ``d*q + 1`` globally RAREST
  grams (rarest-first is the universal order that minimizes candidates),
  any qualifying pair still collides on at least one kept gram. Each
  string therefore feeds a CONSTANT number of index entries regardless
  of its length — the inverted index is O(n), not O(n·len).
- The gram document-frequency table used for the rarest-first order is
  bounded by the alphabet: |Σ|^q distinct grams (~thousands for q=2), so
  it is ALWAYS broadcast — the corpus never shuffles to learn gram
  frequencies; it shuffles once keyed by string id to pick its prefix,
  and once keyed by gram to build the inverted index.
- Verification is exact ``levenshtein`` on the candidate pairs only,
  after a free length prefilter (|len(a)-len(b)| <= d is implied by
  edit distance <= d). Candidate volume tracks the true match density.

Exactness contract: the prefix filter's overlap bound is stated on the
positional gram multiset; this implementation indexes DISTINCT grams,
which can only weaken the bound for strings with internally repeated
grams, and short strings (fewer than ``q*(d+1) - q + 1`` characters,
i.e. gram count <= d*q) keep ALL their grams but may still share none
with a qualifying partner. Callers needing provable losslessness should
ensure min string length >= q*(d+1) and low internal gram repetition —
both hold for the word-like name columns this targets; the oracle query
verifies the blocked result hash-equals the naive all-pairs ground truth
at two scales.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ssp_spark.functions import qgrams


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "name",
    str_col: str = "name",
    max_dist: int = 2,
    q: int = 2,
    checkpoint: bool = True,
    short_strings: str = "exact",
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(str1, str2) <= max_dist.

    Plan shape (asserted in test_plans.py): gram doc-freq aggregate
    (|Σ|^q rows) broadcast back onto the exploded grams; one shuffle
    keyed by id collects each string's grams and keeps the d*q+1 rarest
    (array_sort on (freq, gram) structs + slice — no per-id window); one
    shuffle keyed by gram builds the inverted index; candidate pairs by
    per-row sorted-array combinatorics (the jaccard_pairs pattern — no
    self-join); distinct; then a broadcast-joined length prefilter and
    the exact levenshtein verify. No stage is quadratic in n.

    ``short_strings`` closes the precondition gap ADVICE r4 flagged
    (fuzzy.py:63): a string shorter than ``q*(max_dist+1)`` has at most
    ``max_dist*q`` grams, so the prefix-filter overlap bound is void —
    blocking can silently miss its qualifying pairs (a string shorter
    than ``q`` has NO grams and could never be a candidate at all).

    - ``"exact"`` (default): such strings are routed through an exact
      side path. Any qualifying pair with a short member has BOTH
      members shorter than ``q*(max_dist+1) + max_dist`` (edit distance
      bounds the length gap), so the side path verifies short x
      near-short at the DISTINCT-STRING level: a broadcast nested-loop
      of the distinct short strings against the distinct near-short
      strings (both alphabet-bounded, |Σ|^len — the only broadcast
      payloads), then IDs re-attach via plain equi-joins on the string
      key, unioned and deduped against the blocked result. ID rows are
      never broadcast (ADVICE r5: a corpus where millions of ids share
      one short string must not OOM the build side); the id x id
      expansion per matched string pair is the true output size —
      those pairs all qualify.
    - ``"ignore"``: prior behavior (blocked path only; documented
      losslessness requires min length >= q*(max_dist+1)).
    - ``"error"``: raise ValueError if any short string is present.
    """
    if short_strings not in ("exact", "ignore", "error"):
        raise ValueError(f"unknown short_strings mode {short_strings!r}")
    keep = max_dist * q + 1
    short_len = q * (max_dist + 1)
    # One exchange, not two (round 13, guide §2.4): the old shape was
    # distinct() (hash exchange on (fid, fstr) at the session's shuffle
    # partition count) followed by a keyless repartition (a SECOND full
    # exchange, plus the round-robin retry-determinism local sort) to
    # spread the gram explode across cores. Hash-repartitioning on the
    # distinct keys FIRST at the core count lets the dedup aggregate
    # reuse that exchange (EnsureRequirements: hash(fid, fstr) satisfies
    # the aggregate's clustered distribution), so the same rows arrive
    # in the same spread with one exchange and no sort.
    base = (
        df.select(F.col(id_col).alias("fid"), F.col(str_col).alias("fstr"))
        .filter(F.col("fstr").isNotNull())
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "fid", "fstr"
        )
        .dropDuplicates()
        .persist()
    )

    grams = base.select("fid", F.explode(F.array_distinct(qgrams(F.col("fstr"), q))).alias("g"))
    # Gram vocabulary is alphabet-bounded (|Σ|^q) — broadcast by contract.
    gram_df = grams.groupBy("g").agg(F.count("*").alias("gdf"))

    # Per-string prefix: rarest keep grams under the universal
    # (frequency, gram) order. collect_list + array_sort + slice keeps
    # the whole selection in one keyed exchange.
    prefix = (
        grams.join(F.broadcast(gram_df), "g")
        .groupBy("fid")
        .agg(F.array_sort(F.collect_list(F.struct("gdf", "g"))).alias("sg"))
        .select("fid", F.explode(F.slice("sg", 1, keep)).alias("kg"))
        .select("fid", F.col("kg.g").alias("g"))
    )

    # Inverted index -> i<j candidate pairs via suffix-slice combinatorics
    # (see jaccard_pairs for the degenerate-sequence re-filter rationale).
    inv = prefix.groupBy("g").agg(F.array_sort(F.collect_set("fid")).alias("ids"))
    ids = F.col("ids")
    idx = F.filter(
        F.sequence(F.lit(1), F.size(ids) - 1),
        lambda i: (i >= 1) & (i < F.size(ids)),
    )
    pair_arr = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids) - i),
                lambda y: F.struct(F.element_at(ids, i).alias("id1"), y.alias("id2")),
            ),
        )
    )
    cand = (
        inv.select(F.explode(pair_arr).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )

    # Verify: length prefilter (free: |len1-len2| <= d is implied by
    # edit distance <= d) then exact levenshtein. The name table is tiny
    # next to the pair stream — broadcast both lookups. Both lookups
    # broadcast the IDENTICAL subtree (same projection, aliased at the
    # join, not re-projected per side) so ReuseExchange collapses the
    # two broadcast builds into one driver job + one in-memory relation
    # (round 13, guide §2.4 — same rows, same joins, one exchange).
    # The explicit isnotnull conjuncts make constraint inference a no-op:
    # without them each join side receives the SAME inferred not-null
    # set in a DIFFERENT conjunct order (join-1 infers from its keys
    # first, join-2 from the length prefilter first), the canonicalized
    # subtrees stop being equal, and ReuseExchange cannot fire. The
    # predicates themselves are already implied (inner equi-join on fid
    # + the length prefilter), so the filter changes no rows.
    names = (
        base.select(F.col("fid"), F.col("fstr"), F.length("fstr").alias("flen"))
        .filter(
            F.col("fid").isNotNull()
            & F.col("fstr").isNotNull()
            & F.col("flen").isNotNull()
        )
    )
    bnames = F.broadcast(names)
    out = (
        cand.join(bnames.alias("n1"), F.col("id1") == F.col("n1.fid"))
        .join(bnames.alias("n2"), F.col("id2") == F.col("n2.fid"))
        .filter(F.abs(F.col("n1.flen") - F.col("n2.flen")) <= max_dist)
        .withColumn("dist", F.levenshtein(F.col("n1.fstr"), F.col("n2.fstr")))
        .filter(F.col("dist") <= max_dist)
        .select(
            "id1",
            "id2",
            F.col("n1.fstr").alias("s1"),
            F.col("n2.fstr").alias("s2"),
            "dist",
        )
    )
    if short_strings == "error":
        # Same single-job min(length) probe as the 'exact' branch below
        # (ADVICE r13): the old filter(...).limit(1).count() is the
        # global-limit incremental-take pattern — log-many driver jobs
        # exactly when no short string exists and every partition must
        # be scanned to conclude zero. One aggregate over the persisted
        # base doubles as its materializing action.
        min_len = base.agg(F.min(F.length("fstr"))).collect()[0][0]
        if min_len is not None and min_len < short_len:
            raise ValueError(
                f"fuzzy_pairs(short_strings='error'): input contains strings "
                f"shorter than q*(max_dist+1) = {short_len}; blocking is not "
                f"lossless for them (use short_strings='exact')"
            )
    elif short_strings == "exact":
        # exact side path for the strings the prefix filter cannot cover
        # (see docstring); both sides of any such pair are < short_len +
        # max_dist chars, so this never touches the long tail. Verify at
        # the DISTINCT-STRING level (alphabet-bounded — the only
        # broadcastable invariant; per-id rows are unbounded, ADVICE r5),
        # then re-attach ids via equi-joins on the string key.
        # Gate (round 10, the triangle count-gate precedent): when the
        # corpus has NO short strings the blocked path is already
        # lossless by the documented precondition, and the side path's
        # broadcasts PLUS the union's full-output distinct are pure
        # overhead. Results are identical either way: with no short
        # strings `extra` is empty and distinct(out) == out (candidate
        # pairs are distinct-ed before verify).
        #
        # Probe shape (round 13, guide §5): the old probe was
        # filter(len < short_len).limit(1).count() — a global limit,
        # which executes as an incremental take (1 partition, then 4x
        # more, ...), i.e. LOG-MANY driver jobs in exactly the common
        # case where no short string exists and every partition must be
        # scanned to conclude zero (the connected_components gate hit
        # the same trap). min(length) over the persisted base is ONE
        # job, costs one pass over the distinct names the persist
        # retains anyway, and doubles as the materializing action the
        # downstream broadcast builds (gram_df, names x2) reuse.
        min_len = base.agg(F.min(F.length("fstr"))).collect()[0][0]
        shorts = (
            base.filter(F.length("fstr") < short_len)
            if min_len is not None and min_len < short_len
            else None
        )
    if short_strings == "exact" and shorts is not None:
        near = base.filter(F.length("fstr") < short_len + max_dist)
        sa_strs = shorts.select(F.col("fstr").alias("sa")).distinct()
        sb_strs = near.select(F.col("fstr").alias("sb")).distinct()
        spairs = (
            sb_strs.join(
                F.broadcast(sa_strs),
                F.abs(F.length("sa") - F.length("sb")) <= max_dist,
            )
            .withColumn("dist", F.levenshtein("sa", "sb"))
            .filter(F.col("dist") <= max_dist)
        )
        # matched string-pair table is alphabet-bounded too -> broadcast;
        # the two id joins are plain equi-joins on the string columns
        # (shuffle-safe however many ids share a string)
        a_ids = shorts.select(F.col("fid").alias("ida"), F.col("fstr").alias("sa"))
        b_ids = near.select(F.col("fid").alias("idb"), F.col("fstr").alias("sb"))
        extra = (
            b_ids.join(F.broadcast(spairs), "sb")
            .join(a_ids, "sa")
            .filter(F.col("ida") != F.col("idb"))
            .select(
                F.least("ida", "idb").alias("id1"),
                F.greatest("ida", "idb").alias("id2"),
                F.when(F.col("ida") < F.col("idb"), F.col("sa"))
                .otherwise(F.col("sb"))
                .alias("s1"),
                F.when(F.col("ida") < F.col("idb"), F.col("sb"))
                .otherwise(F.col("sa"))
                .alias("s2"),
                "dist",
            )
        )
        out = out.unionByName(extra).distinct()
    if not checkpoint:
        # plan-inspection path (tests assert on the REAL plan; eager
        # localCheckpoint would truncate it to an ExistingRDD scan) —
        # callers keep `base` persisted for the plan's lifetime
        return out
    out = out.localCheckpoint()
    base.unpersist()
    return out
