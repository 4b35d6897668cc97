"""BM25 lexical retrieval: formula fidelity + scale plan shape."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.similarity.bm25 import (
    bm25_corpus_stats,
    bm25_score_scalar,
    bm25_topk,
    bm25_topk_from_index,
    build_inverted_index,
)
from lakehouse_dba_tools_spark.sources.tables import load_table


def _toy_docs(spark):
    rows = [
        (0, "spark shuffle join broadcast join"),
        (1, "window merge upsert table"),
        (2, "join join join spark"),
        (3, "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_single_term_score_matches_scalar_formula(spark):
    docs = _toy_docs(spark)
    out = {r["doc_id"]: r["bm25_score"] for r in bm25_topk(docs, "join", k=10).collect()}
    dls = {r["doc_id"]: r["dl"] for r in docs.select(
        "doc_id", F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("dl")
    ).collect()}
    avgdl = sum(dls.values()) / len(dls)
    tf = {0: 2, 1: 0, 2: 3, 3: 0}
    n, df_t = 4, 2
    for doc, expect_tf in tf.items():
        if expect_tf == 0:
            assert doc not in out  # score>0 filter drops non-matches
        else:
            expected = bm25_score_scalar(n, df_t, expect_tf, dls[doc], avgdl)
            assert math.isclose(out[doc], round(expected, 4), abs_tol=1e-4)


def test_index_path_agrees_with_direct_scoring(spark):
    docs = _toy_docs(spark)
    direct = bm25_topk(docs, "spark join merge", k=10).collect()
    idx = build_inverted_index(docs)
    via_index = bm25_topk_from_index(
        idx, bm25_corpus_stats(docs), "spark join merge", k=10
    ).collect()
    assert [(r["doc_id"], r["bm25_score"]) for r in direct] == [
        (r["doc_id"], r["bm25_score"]) for r in via_index
    ]


def test_topk_plan_never_shuffles_corpus(spark, sf_dir):
    """Scale pin: the only exchanges are the 1-row stats reduction and
    its broadcast; top-k is TakeOrderedAndProject (per-partition heaps),
    not a global Sort."""
    docs = load_table(spark, sf_dir, "documents")
    df = bm25_topk(docs, "spark merge window join", k=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") <= 2  # SinglePartition stats + broadcast
    assert "SortMergeJoin" not in plan


def test_inverted_index_shuffles_postings_not_bodies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = build_inverted_index(docs)._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange [^\n]*\n", plan):
        assert "text" not in m.group(0)


def test_postings_index_lifecycle(spark, tmp_path):
    """Persisted postings index: build + append answers equal the
    direct full-corpus scorer (stats recomputed from doclens, so the
    append shifts N/avgdl/df correctly), and the query-term filter
    pushes into the postings scan."""
    from lakehouse_dba_tools_spark.similarity.bm25 import (
        append_to_postings_index,
        build_postings_index,
        query_postings_index,
    )

    docs = _toy_docs(spark)
    path = str(tmp_path / "bm25")
    build_postings_index(docs.filter("doc_id != 2"), path)
    append_to_postings_index(docs.filter("doc_id = 2"), path)

    got = query_postings_index(spark, path, "spark join", k=4)
    want = bm25_topk(docs, "spark join", k=4)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # the appended doc (tf-heavy for 'join') must rank first — proves
    # the append is visible AND included in the df/N/avgdl stats
    assert got.collect()[0].doc_id == 2

    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert re.search(r"PushedFilters: \[.*In\(term", plan)


def test_postings_index_replay_and_compaction(spark, tmp_path):
    """A replayed append (at-least-once foreachBatch epoch) writes
    duplicate posting and doclens rows; queries must NOT double-count
    tf/df or inflate N/avgdl, and compaction folds the duplicates and
    bin-packs without changing any answer."""
    from lakehouse_dba_tools_spark.similarity.bm25 import (
        append_to_postings_index,
        build_postings_index,
        compact_postings_index,
        query_postings_index,
    )

    docs = _toy_docs(spark)
    path = str(tmp_path / "bm25")
    build_postings_index(docs.filter("doc_id != 2"), path)
    append_to_postings_index(docs.filter("doc_id = 2"), path)
    append_to_postings_index(docs.filter("doc_id = 2"), path)  # replay

    want = [tuple(r) for r in bm25_topk(docs, "spark join", k=4).collect()]
    before = [
        tuple(r) for r in query_postings_index(spark, path, "spark join", k=4).collect()
    ]
    assert before == want  # replayed rows did not skew any score

    stats = compact_postings_index(spark, path)
    after = [
        tuple(r) for r in query_postings_index(spark, path, "spark join", k=4).collect()
    ]
    assert after == want
    # the replayed doclens rows are gone: one row per doc
    assert stats["doclens"]["rows"] == docs.count()
    assert stats["doclens"]["files_after"] == 1
    assert stats["postings"]["files_after"] <= stats["postings"]["files_before"]
    # postings folded to one row per (term, doc_id)
    from lakehouse_dba_tools_spark.similarity.bm25 import build_inverted_index

    assert stats["postings"]["rows"] == build_inverted_index(docs).count()
