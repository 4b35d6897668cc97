"""Property-based tests (hypothesis) for the engine's core invariants.

Each property runs a handful of generated cases against a live Spark
session (examples capped — JVM round-trips are the cost driver).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.operators.dedup import dedup_by_key
from lakehouse_dba_tools_spark.operators.reconcile import append_with_reconcile
from lakehouse_dba_tools_spark.operators.sessionize import sessionize
from lakehouse_dba_tools_spark.operators.upsert import merge_upsert

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # key
        st.integers(min_value=0, max_value=99),  # ord
        st.text(alphabet="abcxyz", min_size=0, max_size=5),
    ),
    min_size=0,
    max_size=25,
)


@given(target=rows, source=rows)
@SETTINGS
def test_merge_upsert_invariants(spark, target, source):
    t = spark.createDataFrame(target, "k int, ord int, v string") if target else spark.createDataFrame([], "k int, ord int, v string")
    s = spark.createDataFrame(source, "k int, ord int, v string") if source else spark.createDataFrame([], "k int, ord int, v string")
    t = dedup_by_key(t, ["k"], ["ord", "v"], keep="last")
    merged = merge_upsert(t, s, ["k"], source_order=["ord", "v"]).collect()

    merged_keys = {r.k for r in merged}
    t_keys = {r[0] for r in t.collect()}
    s_keys = {r[0] for r in source}
    # key set = union of inputs
    assert merged_keys == t_keys | s_keys
    # one row per key (MERGE postcondition)
    assert len(merged) == len(merged_keys)
    # source wins: every source key carries the max-(ord,v) source row
    best = {}
    for k, o, v in source:
        if k not in best or (o, v) > best[k]:
            best[k] = (o, v)
    for r in merged:
        if r.k in s_keys:
            assert (r.ord, r.v) == best[r.k]


@given(source=rows)
@SETTINGS
def test_merge_upsert_idempotent(spark, source):
    s = spark.createDataFrame(source, "k int, ord int, v string") if source else spark.createDataFrame([], "k int, ord int, v string")
    empty = spark.createDataFrame([], "k int, ord int, v string")
    once = merge_upsert(empty, s, ["k"], source_order=["ord", "v"])
    twice = merge_upsert(once, s, ["k"], source_order=["ord", "v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(
    dest_cols=st.sets(st.sampled_from(["a", "b", "c", "d"]), min_size=1),
    src_cols=st.sets(st.sampled_from(["a", "b", "c", "e"]), min_size=1),
)
@SETTINGS
def test_reconcile_schema_algebra(spark, dest_cols, src_cols):
    dest = spark.createDataFrame(
        [tuple(1 for _ in dest_cols)], ", ".join(f"{c} int" for c in sorted(dest_cols))
    )
    src = spark.createDataFrame(
        [tuple(2 for _ in src_cols)], ", ".join(f"{c} int" for c in sorted(src_cols))
    )
    strict = append_with_reconcile(dest, src)
    assert set(strict.columns) == dest_cols  # extra source cols dropped
    evolved = append_with_reconcile(dest, src, allow_new_columns=True)
    assert set(evolved.columns) == dest_cols | src_cols
    # null padding: src row has NULL for dest-only columns
    src_row = [r for r in evolved.collect() if any(
        getattr(r, c) == 2 for c in src_cols & dest_cols
    ) or (not (src_cols & dest_cols))]
    for r in evolved.collect():
        for c in dest_cols - src_cols:
            assert getattr(r, c) in (1, None)


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=15),
    threshold=st.integers(min_value=5, max_value=60),
)
@SETTINGS
def test_sessionize_session_count(spark, gaps, threshold):
    """Session count == 1 + number of inter-event gaps > threshold."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    times = [t]
    for g in gaps:
        times.append(times[-1] + dt.timedelta(minutes=g))
    df = spark.createDataFrame([(1, ts) for ts in times], "user_id int, ts timestamp")
    out = sessionize(df, gap_minutes=float(threshold))
    n_sessions = out.agg(F.max("session_id")).collect()[0][0]
    expected = 1 + sum(1 for g in gaps if g > threshold)
    assert n_sessions == expected


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    ),
    nparts=st.integers(min_value=1, max_value=8),
)
def test_stable_sum_is_partition_order_invariant(spark, vals, nparts):
    """The exact-decimal sum must give bit-identical results under ANY
    partitioning/ordering — the invariant that makes round(sum(...))
    safe against AQE replans and shuffle nondeterminism."""
    from lakehouse_dba_tools_spark.functions.stable import stable_sum

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    a = df.repartition(1).agg(stable_sum("x", 6).alias("s")).collect()[0].s
    b = df.repartition(nparts).agg(stable_sum("x", 6).alias("s")).collect()[0].s
    c = (
        df.orderBy(F.desc("x"))
        .repartition(max(1, nparts // 2))
        .agg(stable_sum("x", 6).alias("s"))
        .collect()[0]
        .s
    )
    assert a == b == c


@given(
    n_sales=st.integers(min_value=50, max_value=2_000),
    seed=st.integers(min_value=1, max_value=10_000),
    rate=st.integers(min_value=2, max_value=20),
)
@SETTINGS
def test_store_returns_derivation_invariants(spark, n_sales, seed, rate):
    """For ANY (n_sales, seed, return_rate): every return resolves to a
    sales line with quantity within bounds, the money identities hold
    exactly, and the derivation is reproducible (same args → same rows).
    Generalizes the fixed-config unit tests the round-4 advice flagged
    as a gap pattern for dbgen arithmetic."""
    from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales
    from lakehouse_dba_tools_spark.datagen.tpcds import gen_store_returns

    ss = gen_store_sales(spark, n_sales, seed=seed)
    sr = gen_store_returns(spark, n_sales, seed=seed, return_rate=rate)
    joined = sr.join(
        ss,
        (sr.sr_ticket_number == ss.ss_ticket_number)
        & (sr.sr_item_sk == ss.ss_item_sk)
        & (sr.sr_customer_sk == ss.ss_customer_sk),
        "left",
    )
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("ss_quantity").isNull(), 1).otherwise(0)).alias("unresolved"),
        F.sum(
            F.when(F.col("sr_return_quantity") > F.col("ss_quantity"), 1).otherwise(0)
        ).alias("over_qty"),
        F.sum(
            F.when(
                F.col("sr_refunded_cash")
                + F.col("sr_reversed_charge")
                + F.col("sr_store_credit")
                != F.col("sr_return_amt"),
                1,
            ).otherwise(0)
        ).alias("bad_split"),
    ).first()
    assert agg.unresolved == 0
    assert agg.over_qty == 0
    assert (agg.bad_split or 0) == 0
    again = gen_store_returns(spark, n_sales, seed=seed, return_rate=rate)
    assert again.count() == sr.count()


join_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key (few values → hot)
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=0,
    max_size=30,
)


@SETTINGS
@given(
    fact=join_rows,
    dim=join_rows,
    n_salts=st.integers(min_value=1, max_value=6),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, fact, dim, n_salts, how):
    """salted_join must be semantically invisible for any inputs,
    salt count, and supported join type — including duplicate keys on
    both sides (multiset multiplicities must match)."""
    from lakehouse_dba_tools_spark.operators.skew import salted_join

    f = spark.createDataFrame(fact, "k int, v int") if fact else spark.range(0).selectExpr("0 k", "0 v").limit(0)
    d_rows = [(k, v) for k, v in dim]
    d = spark.createDataFrame(d_rows, "k int, w int") if d_rows else spark.range(0).selectExpr("0 k", "0 w").limit(0)
    got = sorted(tuple(r) for r in salted_join(f, d, ["k"], n_salts=n_salts, how=how).collect())
    want = sorted(tuple(r) for r in f.join(d, ["k"], how).collect())
    assert got == want


# --- exact-substring span removal ------------------------------------------
# Small vocab + short shared runs force cross-doc duplication often;
# window=5 keeps docs small enough for a Spark round-trip per example.
_span_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_span_docs)
@settings(
    max_examples=15,
    deadline=None,
    # derandomized: the conservation/keeper invariants below are
    # universal, but the zero-dups-after postcondition is an empirical
    # strength claim (an excision SEAM could in principle mint a new
    # 5-gram that matches another doc); pinning the example set keeps
    # this a regression test, not a lottery. The fixture-corpus twin
    # (test_span_removal_converges_to_zero_cross_doc_dups) covers the
    # realistic-corpus case.
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
def test_span_removal_properties(spark, texts):
    from lakehouse_dba_tools_spark.dedup.exact import (
        duplicate_span_report,
        remove_duplicate_spans,
    )

    W = 5
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = remove_duplicate_spans(docs, window=W, return_text=True)
    rows = {r["doc_id"]: r for r in out.collect()}

    # conservation: removed + surviving == original token count
    for r in rows.values():
        assert 0 <= r["n_removed_tokens"] <= r["n_tokens"]
        assert (r["n_removed_tokens"] > 0) == (r["n_islands"] > 0)

    # the minimum doc id can never lose tokens (it is the keeper of
    # every hash it shares — min over doc ids is global)
    assert rows[min(rows)]["n_removed_tokens"] == 0

    # postcondition: a second detection pass finds no cross-doc dups
    cleaned = out.select("doc_id", F.col("cleaned_text").alias("text"))
    post = (
        duplicate_span_report(cleaned, window=W)
        .agg(F.sum("n_dup_spans"))
        .first()[0]
    )
    assert post in (None, 0)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=12,
        ),
        min_size=3,
        max_size=12,
    ),
    term=st.sampled_from(["alpha", "beta", "gamma", "delta", "omega"]),
    k=st.integers(min_value=1, max_value=3),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_champions_single_term_topk_exact_property(spark, docs, term, k):
    """PROPERTY: for any corpus and any single-term query with
    k ≤ champion_n, champions-mode top-k equals exact-mode top-k —
    idf is constant within a term, so the impact ordering the tier is
    truncated under IS the score ordering (similarity/bm25.py). Also
    holds for terms absent from the corpus (both modes empty)."""
    import shutil
    import tempfile

    from lakehouse_dba_tools_spark.similarity.bm25 import (
        build_postings_index,
        query_postings_index,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    tmp = tempfile.mkdtemp(prefix="bm25_prop_")
    try:
        path = tmp + "/idx"
        build_postings_index(df, path, champion_n=3)
        exact = [
            tuple(r) for r in query_postings_index(spark, path, term, k=k).collect()
        ]
        champ = [
            tuple(r)
            for r in query_postings_index(
                spark, path, term, k=k, mode="champions"
            ).collect()
        ]
        assert champ == exact
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=12,
        ),
        min_size=3,
        max_size=12,
    ),
    query=st.sampled_from(
        ["alpha", "alpha beta", "gamma delta alpha", "beta omega", "omega"]
    ),
    k=st.integers(min_value=1, max_value=4),
    buckets=st.sampled_from([1, 2, 7]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_wand_topk_exact_property(spark, docs, query, k, buckets):
    """PROPERTY: for ANY corpus, ANY query shape (single/multi-term,
    absent terms), ANY k, and ANY bucket count — including the
    degenerate 1-bucket tier — wand-mode top-k equals exact-mode
    top-k (similarity/bm25.py mode='wand'). This is the guarantee the
    champions tier cannot make: block-max pruning only ever skips
    buckets whose score bound cannot reach the k-th seed score, so
    exactness never depends on impact skew."""
    import shutil
    import tempfile

    from lakehouse_dba_tools_spark.similarity.bm25 import (
        build_postings_index,
        query_postings_index,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    tmp = tempfile.mkdtemp(prefix="bm25_wand_prop_")
    try:
        path = tmp + "/idx"
        build_postings_index(df, path, wand_buckets=buckets)
        exact = [
            tuple(r) for r in query_postings_index(spark, path, query, k=k).collect()
        ]
        wand = [
            tuple(r)
            for r in query_postings_index(
                spark, path, query, k=k, mode="wand"
            ).collect()
        ]
        assert wand == exact
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
