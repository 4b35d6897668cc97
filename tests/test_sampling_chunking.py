from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.chunking import chunk_documents
from lakehouse_dba_tools_spark.operators.rangejoin import range_join
from lakehouse_dba_tools_spark.operators.sampling import (
    stratified_sample_topn,
    train_val_test_split,
)
from lakehouse_dba_tools_spark.sources.tables import load_table


def test_split_is_stable_under_growth(spark):
    small = spark.range(0, 100).withColumnRenamed("id", "k")
    big = spark.range(0, 1000).withColumnRenamed("id", "k")
    s1 = {r.k: r.split for r in train_val_test_split(small, "k").collect()}
    s2 = {r.k: r.split for r in train_val_test_split(big, "k").collect()}
    # a row's split never changes when the dataset grows
    assert all(s2[k] == v for k, v in s1.items())


def test_split_proportions(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    counts = {r.split: r["count"] for r in train_val_test_split(df, "k").groupBy("split").count().collect()}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_stratified_sample_exact_n(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample_topn(docs, ["lang"], 5, "doc_id")
    per = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert all(v == 5 for v in per.values())
    # deterministic: same call → same ids
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in stratified_sample_topn(docs, ["lang"], 5, "doc_id").collect())
    assert a == b


def test_chunking_covers_all_tokens(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "short doc only")], "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 150 tokens, stride 48 → ceil((150-16)/48)=3 chunks
    assert len(by_doc[1]) == 3
    # every token appears in ≥1 chunk, consecutive chunks overlap by 16
    c0, c1, _ = [sorted(by_doc[1], key=lambda r: r.chunk_idx)[i] for i in range(3)]
    assert c0.chunk_text.split()[48:] == c1.chunk_text.split()[:16]
    last = max(by_doc[1], key=lambda r: r.chunk_idx)
    assert last.chunk_text.split()[-1] == "w149"
    # short doc → single chunk, full text
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc only"


def test_range_join_matches_nested_loop(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    iv = ev.groupBy("user_id").agg(
        F.min("ts").alias("s"), (F.min("ts") + F.expr("INTERVAL 90 MINUTES")).alias("e")
    )
    fast = range_join(ev, iv, "ts", "s", "e", by=["user_id"], bucket_width_sec=1800)
    iv2 = iv.select(F.col("user_id").alias("u2"), "s", "e")
    slow = ev.join(
        iv2,
        (F.col("user_id") == F.col("u2")) & (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")),
    )
    assert fast.count() == slow.count()
    assert fast.count() > 0
