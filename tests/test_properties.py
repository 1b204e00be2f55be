"""Property tests for operator invariants that goldens can't sweep:
arbitrary shapes/sizes driven by hypothesis (few examples — each round
trips through Spark jobs).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from ssp_spark.functions import shingles, tokens
from ssp_spark.stream import Stream


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    parts=st.integers(min_value=1, max_value=8),
)
def test_align_pairs_in_order_any_shape(spark, n, parts):
    """align must pair row i of the left stream with row i of the right,
    for ANY length and partition count — the invariant behind the
    reference's multi-input zip (engine_test.go:558-590)."""
    df = spark.range(0, n).repartition(parts)
    a = Stream(df.select(F.col("id"), (F.col("id") * 2).alias("v")))
    b = Stream(df.select(F.col("id"), (F.col("id") * 3).alias("v")))
    rows = a.align(b).df.collect()
    assert len(rows) == n
    # positions came from the same construction on both sides, so each
    # output row must carry a consistent (2k, 3k) pair
    assert all(r.v * 3 == r.r_v * 2 for r in rows)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c")),  # small alphabet -> dup shingles
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_shingles_match_python_reference(spark, texts):
    """The Catalyst shingle expression must agree with the obvious Python
    implementation on arbitrary whitespace-laden input (the jaccard /
    minhash oracles all assume this exact tokenization)."""
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r.i: list(r.sh)
        for r in sdf.select("i", shingles(F.col("t"), 3).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        want = [" ".join(toks[j : j + 3]) for j in range(max(len(toks) - 2, 0))]
        assert got[i] == want, (t, got[i], want)


@settings(max_examples=4, deadline=None)
@given(parts=st.integers(min_value=1, max_value=8))
def test_stratified_sample_partitioning_independent(spark, parts):
    """The hash-threshold sample must select the SAME rows regardless of
    how the input is partitioned — the property df.sample() lacks and
    the reason the engine uses deterministic hashing for splits."""
    from ssp_spark.functions import portable_hash64

    df = spark.range(0, 500).select(F.col("id"))
    keep = (portable_hash64(F.col("id").cast("string")) % 100) < 20
    base = {r.id for r in df.filter(keep).collect()}
    re = {r.id for r in df.repartition(parts).filter(keep).collect()}
    assert re == base
    assert 0 < len(base) < 500


@settings(max_examples=4, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=200
    )
)
def test_cms_never_underestimates(spark, keys):
    """Count-Min guarantee: est(key) >= true count for EVERY key, with
    equality when no cell collides — on arbitrary key multisets."""
    import collections

    from ssp_spark.operators import sketch

    df = spark.createDataFrame([(str(k),) for k in keys], ["k"])
    sk = sketch.cms_sketch(df, "k", depth=4, width=64)
    probe = spark.createDataFrame([(str(k),) for k in set(keys)], ["k"])
    est = {r.k: r.est for r in sketch.cms_estimate(sk, probe, "k", 4, 64).collect()}
    true = collections.Counter(str(k) for k in keys)
    assert all(est[k] >= c for k, c in true.items())


@settings(max_examples=4, deadline=None)
@given(
    present=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=50),
)
def test_bloom_no_false_negatives(spark, present):
    """Bloom guarantee: every inserted key reports member=true — for any
    key set (false positives allowed, false negatives never)."""
    from ssp_spark.operators import sketch

    df = spark.createDataFrame([(k,) for k in present], ["k"])
    bits = sketch.bloom_bits(df, "k", num_hashes=5, num_bits=1024)
    probe = spark.createDataFrame([(k,) for k in set(present)], ["k"])
    got = sketch.bloom_might_contain(bits, probe, "k", 5, 1024).collect()
    assert all(r.member for r in got)


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("xy z")), min_size=0, max_size=120),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
def test_chunking_reconstructs_every_token(spark, texts, chunk, overlap):
    """Chunking invariants for ANY doc lengths and (chunk, overlap):
    chunks are contiguous stride-spaced token windows whose union covers
    the document exactly — dropping each chunk's first `overlap` tokens
    (except chunk 0) reconstructs the original token stream — and only
    the final chunk may be short."""
    from ssp_spark.operators.packing import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = chunk_documents(sdf, chunk, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not toks:
            assert got == []  # zero-token docs are dropped
            continue
        assert [r.chunk_idx for r in got] == list(range(len(got)))
        # each chunk is the exact token window at its stride offset
        for r in got:
            want = toks[r.chunk_idx * stride : r.chunk_idx * stride + chunk]
            assert r.chunk_text.split() == want
            assert r.n_tok_chunk == len(want)
        # non-final chunks are full; the union reconstructs the doc
        assert all(r.n_tok_chunk == chunk for r in got[:-1])
        rebuilt = got[0].chunk_text.split()
        for r in got[1:]:
            rebuilt += r.chunk_text.split()[overlap:]
        assert rebuilt == toks


@settings(max_examples=5, deadline=None)
@given(
    base_keys=st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=20, unique=True),
    chg_keys=st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=20, unique=True),
    del_mask=st.lists(st.booleans(), min_size=20, max_size=20),
)
def test_merge_upsert_key_semantics(spark, base_keys, chg_keys, del_mask):
    """MERGE invariants for ANY key overlap pattern: result keys =
    (base - delta keys) + non-delete delta keys; changed keys carry the
    DELTA's value (last-writer-wins); untouched keys carry the base's."""
    from ssp_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(k, f"b{k}") for k in base_keys], "k int, v string"
    )
    chg = spark.createDataFrame(
        [(k, f"c{k}", del_mask[j]) for j, k in enumerate(chg_keys)],
        "k int, v string, is_del boolean",
    )
    got = {r.k: r.v for r in merge_upsert(base, chg, ["k"], "is_del").collect()}
    deletes = {k for j, k in enumerate(chg_keys) if del_mask[j]}
    upserts = {k for j, k in enumerate(chg_keys) if not del_mask[j]}
    want = {k: f"b{k}" for k in base_keys if k not in set(chg_keys)}
    want.update({k: f"c{k}" for k in upserts})
    assert got == want
    assert deletes.isdisjoint(got.keys() & deletes)


@settings(max_examples=50, deadline=None)
@given(
    bits=st.lists(st.integers(min_value=0, max_value=4095), min_size=0, max_size=200, unique=True),
)
def test_bloom_mask_words_roundtrip(bits):
    """Packing set-bit positions into 64-bit words is lossless: bit b is
    set in word b//64 at offset b%64 iff b was in the input — for ANY
    position set, including the sign-bit positions (word must stay a
    valid signed 64-bit long for the JVM literal)."""
    from ssp_spark.operators.sketch import bloom_mask_words

    words = bloom_mask_words(bits)
    assert len(words) == 64
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    got = {
        i * 64 + j
        for i, w in enumerate(words)
        for j in range(64)
        if ((w + (1 << 64)) if w < 0 else w) >> j & 1
    }
    assert got == set(bits)


@settings(max_examples=30, deadline=None)
@given(n_planes=st.integers(min_value=1, max_value=12), radius=st.integers(min_value=0, max_value=2))
def test_probe_masks_cover_exact_hamming_ball(n_planes, radius):
    """The probe mask sequence is EXACTLY the Hamming ball of the given
    radius over n_planes bits: right count, unique, every mask within
    radius, every weight<=radius mask present."""
    from itertools import combinations

    from ssp_spark.operators.similarity import probe_masks

    masks = probe_masks(n_planes, radius)
    import math

    want_n = sum(math.comb(n_planes, i) for i in range(radius + 1))
    assert len(masks) == want_n and len(set(masks)) == want_n
    assert all(bin(m).count("1") <= radius and m < (1 << n_planes) for m in masks)
    want = {0}
    if radius >= 1:
        want |= {1 << p for p in range(n_planes)}
    if radius >= 2:
        want |= {(1 << i) | (1 << j) for i, j in combinations(range(n_planes), 2)}
    assert set(masks) == want


@settings(max_examples=6, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet=st.sampled_from(list("abcd")), min_size=6, max_size=12),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_fuzzy_pairs_lossless_vs_naive(spark, names):
    """Prefix-filtered q-gram blocking must find EXACTLY the pairs the
    naive all-pairs levenshtein finds, for arbitrary strings meeting the
    length precondition (>= q*(d+1) = 6 for q=2, d=2)."""
    from ssp_spark.operators import fuzzy

    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], ["id", "s"])
    got = {
        (r.id1, r.id2, r.dist)
        for r in fuzzy.fuzzy_pairs(df, "id", "s", max_dist=2).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 2
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=14,
    ),
    width=st.sampled_from([3, 10, 64]),
)
def test_interval_join_matches_naive_any_width(spark, ivs, width):
    """Bucket blocking must emit exactly the naive overlap pairs, once
    each, for ANY bucket width (width only changes cost, never the
    result)."""
    from ssp_spark.operators import relational

    rows = [(1, i, s, s + d) for i, (s, d) in enumerate(ivs)]
    a = spark.createDataFrame(rows, ["k", "aid", "s1", "e1"])
    b = spark.createDataFrame(
        [(1, i + 100, s, e) for (_, i, s, e) in [(r[0], r[1], r[2], r[3]) for r in rows]],
        ["k", "bid", "s2", "e2"],
    )
    out = [
        (r.aid, r.bid)
        for r in relational.interval_overlap_join(
            a, b, ["k"], "s1", "e1", "s2", "e2", bucket_width=width
        ).collect()
    ]
    want = [
        (i, j + 100)
        for i, (s1, d1) in enumerate(ivs)
        for j, (s2, d2) in enumerate(ivs)
        if s1 <= s2 + d2 and s2 <= s1 + d1
    ]
    assert sorted(out) == sorted(want)  # exact set, no duplicates


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=4, max_size=60),
    shards=st.sampled_from([2, 4, 8]),
)
def test_range_boundaries_match_sorted_slicing(spark, vals, shards):
    """Exact rank boundaries must equal the values a full sort would
    place at ranks floor(n*k/S) — the global-sort answer the histogram
    path avoids computing."""
    from ssp_spark.operators import layout

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = layout.exact_range_boundaries(df, "v", shards)
    s = sorted(vals)
    want = [s[max(1, (len(vals) * k) // shards) - 1] for k in range(1, shards)]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=40),
    budget=st.integers(min_value=0, max_value=1200),
)
def test_token_budget_prefilter_equals_naive_window(spark, toks, budget):
    """The histogram prefilter must be invisible: for ANY token-count
    multiset (including zero-token docs) and ANY budget, the prefiltered
    selection equals the naive full per-source window. Quality here is
    derived from the token count alone (the real scorer is a pure
    function of the text), so ties and zero-variance levels all occur."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ssp_spark.queries import _token_budget_frames

    rows = [
        (i, "w " * n, "en", f"s{i % 3}", 2 * n) for i, n in enumerate(toks)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    q, out = _token_budget_frames(docs, budget=budget)
    try:
        got = {(r["source"], r["doc_id"]): r["cum_tokens"] for r in out.collect()}
        naive_w = (
            Window.partitionBy("source")
            .orderBy(F.col("quality").desc(), "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        naive = {
            (r["source"], r["doc_id"]): r["cum"]
            for r in q.withColumn("cum", F.sum("n_tokens").over(naive_w).cast("long"))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert got == naive
    finally:
        q.unpersist()


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet=st.sampled_from(list("ab c")), min_size=1, max_size=40),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_bm25_matches_python_reference(spark, docs, k):
    """text.bm25_topk must agree with the obvious Python BM25 on
    arbitrary tiny corpora — same integer-scaled contributions, same
    (scaled desc, doc_id) tie order, same k truncation."""
    import math

    from ssp_spark.operators import text as text_ops

    sdf = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    terms = ["a", "b", "ab"]
    got = {
        (r.qid, r.doc_id): (r.rank, r.score)
        for r in text_ops.bm25_topk(sdf, [(1, terms)], k=k).collect()
    }
    # python reference
    toks = {i: [w for w in t.split() if w] for i, t in enumerate(docs)}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, tk in toks.items():
        s6 = 0
        for t in set(terms):
            tf = tk.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
            # same HALF_UP integer scaling as the operator
            s6 += int(math.floor(abs(w) * 1e6 + 0.5)) * (1 if w >= 0 else -1)
        if s6:
            scores[i] = s6
    order = sorted(scores, key=lambda i: (-scores[i], i))[:k]
    want = {(1, i): (r + 1, scores[i] / 1e6) for r, i in enumerate(order)}
    assert got == want, (docs, got, want)


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_match_python_union_find(spark, edges):
    """Both CC paths (driver fast path AND distributed label
    propagation) must equal a reference Python union-find on arbitrary
    small graphs, including self-loops and parallel edges."""
    from ssp_spark.operators import dedup

    pairs = spark.createDataFrame(edges, ["id1", "id2"])
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {(v, comp_min[find(v)]) for v in parent}
    fast = {(r.id, r.component_id) for r in dedup.connected_components(pairs).collect()}
    dist = {
        (r.id, r.component_id)
        for r in dedup.connected_components(pairs, driver_edge_threshold=0).collect()
    }
    assert fast == want
    assert dist == want


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=20,
    ),
    seeds=st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=3),
    max_hops=st.integers(min_value=1, max_value=4),
)
def test_bfs_levels_match_python_bfs(spark, edges, seeds, max_hops):
    """bfs_levels must equal a reference Python BFS (min-hop distance,
    hop-bounded) on arbitrary small directed graphs — self-loops,
    parallel edges, unreachable nodes, seeds with no edges."""
    from collections import deque

    from ssp_spark.operators import graph

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {x: 0 for x in set(seeds)}
    q = deque(sorted(set(seeds)))
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in sorted(adj.get(u, ())):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    want = set(dist.items())
    got = {(r.node, r.hops) for r in graph.bfs_levels(e, s, max_hops).collect()}
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    win=st.integers(min_value=2, max_value=6),
    stride=st.integers(min_value=1, max_value=4),
)
def test_span_dup_pairs_match_python_reference(spark, docs, win, stride):
    """span_dup_pairs must equal a brute-force Python computation of
    stride-sampled window sharing for ANY short docs / window / stride —
    including empty docs, docs shorter than the window, and identical
    docs."""
    from ssp_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def spans(t):
        return {t[p : p + win] for p in range(0, len(t) - win + 1, stride)}

    sp = {i: spans(t) for i, t in rows if len(t) >= win}
    # doc-freq cap at the default 100 never triggers at this size
    want = {}
    ids = sorted(sp)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = len(sp[a] & sp[b])
            if shared >= 1:
                want[(a, b)] = shared
    got = {
        (r.doc_a, r.doc_b): r.shared_spans
        for r in dedup.span_dup_pairs(
            df, win=win, stride=stride, min_shared=1
        ).collect()
    }
    assert got == want


def _py_bpe_train(texts, num_merges):
    import re

    freq = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freq[w] = freq.get(w, 0) + 1
    seqs = {}
    for w, c in freq.items():
        seqs[tuple(w)] = seqs.get(tuple(w), 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] = pairs.get((seq[i], seq[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = {}
        for seq, c in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        seqs = nxt
    return merges


def _py_bpe_encode(text, merges):
    import re

    toks = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        seq = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        toks.extend(seq)
    return toks


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab1 .", min_size=0, max_size=24),
        min_size=1,
        max_size=6,
    ),
    num_merges=st.integers(min_value=1, max_value=6),
)
def test_bpe_train_and_encode_match_python_reference(spark, texts, num_merges):
    """Spark bpe_train must learn the same merge table as a pure-Python
    BPE (same tie rule), and bpe_encode's literal-replace chain must
    tokenize exactly like the per-word greedy merge loop — for arbitrary
    tiny corpora (repeats, empty docs, punctuation, digit runs)."""
    from ssp_spark.operators import text as T

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = T.bpe_train(df, num_merges=num_merges)
    assert merges == _py_bpe_train(texts, num_merges)
    got = [r.bpe_tokens for r in T.bpe_encode(df, merges).collect()]
    # row order: collect preserves input order for a narrow local frame,
    # but sort both sides by the token list to stay order-agnostic
    want = [_py_bpe_encode(t, merges) for t in texts]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@given(
    cells=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_isotonic_minimax_identity_equals_sequential_pav(cells):
    """The identity isotonic_calibration_embeddings evaluates in-plan:
    fit[k] = max_{i<=k} min_{j>=k} mean(y[i..j]) must equal sequential
    weighted pool-adjacent-violators on ANY (weight, positives) cells —
    validated as pure math, independent of either engine."""
    # minimax form (what the query computes via its (i,k,j) expansion)
    n = len(cells)
    pref_w = [0]
    pref_y = [0]
    for w, y in cells:
        pref_w.append(pref_w[-1] + w)
        pref_y.append(pref_y[-1] + y)

    def mean(i, j):  # inclusive block
        return (pref_y[j + 1] - pref_y[i]) / (pref_w[j + 1] - pref_w[i])

    minimax = [
        max(min(mean(i, j) for j in range(k, n)) for i in range(k + 1))
        for k in range(n)
    ]
    # sequential weighted PAV (exact integer cross-compare for pooling)
    blocks = []  # [w, y]
    for w, y in cells:
        blocks.append([w, y])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] >= blocks[-1][1] * blocks[-2][0]
        ):
            w2, y2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += y2
    pav = []
    bi, used = 0, 0
    for w, y in cells:
        pav.append(blocks[bi][1] / blocks[bi][0])
        used += w
        if used >= blocks[bi][0]:
            used = 0
            bi += 1
    for a, b in zip(minimax, pav):
        assert abs(a - b) < 1e-9


@given(st.integers(min_value=1, max_value=200))
@settings(max_examples=60, deadline=None)
def test_covariance_triangular_inverse_is_exact(d):
    """The moment kernel's pos -> (i, j) decode (linalg.covariance_moments)
    replayed in pure Python with the SAME float64 op sequence the SQL
    expressions execute: for EVERY cell position of a width-d vector the
    closed form must land exactly on the enumerated (i, j) — including
    the run-start positions where the sqrt discriminant is a perfect
    square and a 1-ulp wobble would flip the floor. d ranges past any
    realistic embedding width's shard of the formula's domain."""
    import math

    # enumeration: first moments then row-major upper triangle
    expect = [(p, -1) for p in range(d)]
    for i in range(d):
        for j in range(i, d):
            expect.append((i, j))
    for pos, (ei, ej) in enumerate(expect):
        if pos < d:
            i, j = pos, -1
        else:
            k = pos - d
            i = int(math.floor((2 * d + 1 - math.sqrt(float((2 * d + 1) * (2 * d + 1) - 8 * k))) / 2))
            off = i * d - (i * (i - 1)) // 2
            j = i + (k - off)
        assert (i, j) == (ei, ej), (d, pos)
