"""Invariants for the corpus-curation queries (oracle equality is
covered by tools/diffcheck.py; these pin structural properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.queries_curation import (
    EVAL_MOD,
    doc_decontamination,
    doc_pii_redaction,
    doc_repetition_scores,
    doc_training_order,
)
from lakehouse_dba_tools_spark.sources.tables import load_table


def test_decontamination_excludes_eval_docs(spark, sf_dir):
    out = doc_decontamination(spark, sf_dir)
    assert out.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0
    row = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("contaminated").cast("int")).alias("n_cont"),
        F.min("overlap_frac").alias("lo"),
        F.max("overlap_frac").alias("hi"),
    ).collect()[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert row.n == n_docs - len(
        [i for i in range(n_docs) if i % EVAL_MOD == 0]
    )
    assert 0.0 <= row.lo <= row.hi <= 1.0
    # tiny shared vocabulary -> overlap must exist
    assert row.n_cont > 0


def test_repetition_scores_bounds(spark, sf_dir):
    out = doc_repetition_scores(spark, sf_dir)
    bad = out.filter(
        (F.col("dup_token_frac") < 0)
        | (F.col("dup_token_frac") > 1)
        | (F.col("dup_bigram_frac") < 0)
        | (F.col("dup_bigram_frac") > 1)
    )
    assert bad.count() == 0


def test_pii_redaction_scrubs_all_spans(spark, sf_dir):
    from lakehouse_dba_tools_spark.queries_curation import EMAIL_RE, PHONE_RE

    out = doc_pii_redaction(spark, sf_dir)
    row = out.agg(
        F.min("n_emails").alias("min_e"), F.min("n_phones").alias("min_p")
    ).collect()[0]
    # every doc gets one synthetic email + phone appended
    assert row.min_e >= 1 and row.min_p >= 1


def test_mixture_sample_respects_budget(spark, sf_dir):
    from lakehouse_dba_tools_spark.queries_curation import corpus_mixture_sample

    rows = corpus_mixture_sample(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.sample_rate <= 1.0
        assert r.sampled_docs <= r.n_docs
        assert r.sampled_tokens <= r.n_tokens
    # achieved mixture lands near the target overall (hash sampling is
    # unbiased; 20 sources x 25 docs at sf0.001+ gives loose bounds)
    tgt = sum(r.target_tokens for r in rows)
    got = sum(r.sampled_tokens for r in rows)
    assert 0.4 * tgt <= got <= 1.6 * tgt


def test_training_order_is_partitioned_permutation(spark, sf_dir):
    out = doc_training_order(spark, sf_dir)
    n = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # rank_in_bucket is 1..size within each bucket
    chk = out.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.max("rank_in_bucket").alias("mx"),
        F.min("rank_in_bucket").alias("mn"),
    )
    assert chk.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0


def test_pack_chunks_conservation(spark, sf_dir):
    """Packing invariants: every token lands in exactly one window
    (sum of window fills == corpus token count), every non-tail window
    is filled to exactly PACK_CAP, and windows are contiguous per shard."""
    from pyspark.sql import functions as F

    from lakehouse_dba_tools_spark.queries_curation import (
        PACK_CAP,
        PACK_SHARDS,
        corpus_pack_chunks,
    )
    from lakehouse_dba_tools_spark.functions.text import tokens
    from lakehouse_dba_tools_spark.sources.tables import load_table

    manifest = corpus_pack_chunks(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(F.sum(F.size(tokens("text"))).alias("s")).first().s
    assert sum(r.n_tokens for r in manifest) == total_tokens
    by_shard = {}
    for r in manifest:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(PACK_SHARDS))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.chunk)
        assert [r.chunk for r in rows] == list(range(len(rows))), shard
        for r in rows[:-1]:
            assert r.n_tokens == PACK_CAP, (shard, r.chunk)
        assert 0 < rows[-1].n_tokens <= PACK_CAP


def test_training_corpus_e2e_invariants(spark, sf_dir):
    """The end-to-end pipeline's internal consistency, independent of
    the oracle: the funnel is monotonically non-increasing in docs
    (with the PII stage a pure transform — same doc count, different
    token count), the pack manifest conserves the sampled stage's
    tokens exactly, and every window except each shard's tail is full."""
    from lakehouse_dba_tools_spark.queries_curation import (
        PACK_CAP,
        training_corpus_e2e,
    )

    out = training_corpus_e2e(spark, sf_dir).collect()
    funnel = {r.stage: r for r in out if r.stage != "60_pack"}
    pack = [r for r in out if r.stage == "60_pack"]

    order = ["00_raw", "10_crossbatch_dedup", "20_decontam", "40_quality_en", "50_mixture"]
    counts = [funnel[s].n_docs for s in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > counts[-1] > 0  # every stage drops something real
    # PII is a transform: same docs as decontam, token count shifts
    assert funnel["30_pii_redacted"].n_docs == funnel["20_decontam"].n_docs
    assert funnel["30_pii_redacted"].n_tokens != funnel["20_decontam"].n_tokens

    # packing conserves the sampled tokens exactly
    assert sum(r.n_tokens for r in pack) == funnel["50_mixture"].n_tokens
    # every non-tail window is exactly PACK_CAP tokens
    by_shard: dict = {}
    for r in pack:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.chunk)
        for r in rows[:-1]:
            assert r.n_tokens == PACK_CAP, (shard, r.chunk)
        assert 0 < rows[-1].n_tokens <= PACK_CAP


def test_cluster_safe_split_has_zero_leaks_and_tolerant_fracs(spark, sf_dir):
    """The re-split's contract: no verified near-dup pair may span two
    splits (the property split_leakage_audit shows doc-keyed splitting
    lacks), fractions stay within SPLIT_TOL of (0.8, 0.1, 0.1), and the
    3-row report always carries all three splits."""
    from lakehouse_dba_tools_spark.queries_curation import (
        SPLIT_TOL,
        cluster_safe_split_audit,
    )

    out = cluster_safe_split_audit(spark, sf_dir).collect()
    assert [r.split for r in out] == ["test", "train", "val"]
    for r in out:
        assert r.leak_pairs == 0
        assert r.within_tol
        assert r.n_docs >= r.clustered_docs >= 0
    targets = {"train": 0.8, "val": 0.1, "test": 0.1}
    for r in out:
        assert abs(r.frac - targets[r.split]) <= SPLIT_TOL
    # the audit is a fix for a real problem: the doc-keyed split DOES
    # leak on the same corpus (otherwise this operator proves nothing)
    from lakehouse_dba_tools_spark.queries_curation import split_leakage_audit

    leaky = split_leakage_audit(spark, sf_dir)
    n_cross = leaky.filter(F.col("is_leak")).agg(
        F.coalesce(F.sum("n_pairs"), F.lit(0)).alias("n")
    ).collect()[0].n
    assert n_cross > 0


def test_cluster_safe_split_members_share_split(spark, sf_dir):
    """Direct structural check (not via the report): every near-dup
    pair's two members carry the SAME split label after re-keying."""
    from lakehouse_dba_tools_spark.dedup.components import connected_components
    from lakehouse_dba_tools_spark.dedup.minhash import verified_near_dups
    from lakehouse_dba_tools_spark.operators.sampling import train_val_test_split
    from lakehouse_dba_tools_spark.queries_curation import CLUSTER_SPLIT_SALT

    docs = load_table(spark, sf_dir, "documents")
    pairs = verified_near_dups(docs, threshold=0.5)
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    keyed = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster_key"))
    )
    labeled = train_val_test_split(
        keyed, "cluster_key", (0.8, 0.1, 0.1), salt=CLUSTER_SPLIT_SALT
    )
    joined = (
        pairs.join(
            labeled.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            labeled.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
    )
    assert joined.count() > 0  # fixture has near-dups
    assert joined.filter(F.col("sa") != F.col("sb")).count() == 0


def test_mixture_epoch_materialize_replication_law(spark, sf_dir):
    """The executor's contract: n_instances ∈ [floor, ceil]·n_docs per
    source, realized == n_instances/n_docs, zero-epoch docs only where
    planned < 1, and the materialization is deterministic (re-running
    yields the identical multiset counts)."""
    import math

    from lakehouse_dba_tools_spark.queries_curation import (
        mixture_epoch_materialize,
    )

    out = {r.source: r for r in mixture_epoch_materialize(spark, sf_dir).collect()}
    assert len(out) > 0
    for src, r in out.items():
        lo = math.floor(r.planned_epochs) * r.n_docs
        hi = math.ceil(r.planned_epochs) * r.n_docs
        assert lo <= r.n_instances <= hi, src
        assert r.realized_epochs == round(r.n_instances / r.n_docs, 6)
        assert r.instance_tokens >= r.n_instances  # every doc has ≥1 token
    # the weight convention spans floor 0..3 → both the fractional-only
    # and multi-epoch replication paths actually ran
    floors = {math.floor(r.planned_epochs) for r in out.values()}
    assert 0 in floors and max(floors) >= 2
    again = {r.source: r.n_instances for r in mixture_epoch_materialize(spark, sf_dir).collect()}
    assert again == {s: r.n_instances for s, r in out.items()}
