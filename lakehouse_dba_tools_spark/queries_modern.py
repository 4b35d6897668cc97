"""Spark-4 surface queries: VariantType semi-structured access and
Python UDTFs (the UDF/UDAF/UDTF story beyond pandas UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table


@register(
    "variant_props_rollup",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType path for semi-structured columns: parse once into a
    binary variant, then typed path extraction — the Spark-4 native
    alternative to string-probing with get_json_object (the reference's
    JSON handling predates both)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("pv", F.parse_json("props"))
    return (
        v.select("event_type", F.try_variant_get("pv", "$.k", "long").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "udtf_token_positions",
    """
    WITH t AS (
      SELECT lang, len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents
    )
    SELECT lang,
           sum(n)::BIGINT               AS n_tokens,
           sum(n * (n - 1) // 2)::BIGINT AS idx_sum,
           count(*)                     AS n_docs
    FROM t GROUP BY lang
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: one (token, position) row per
    token per document. The oracle verifies both the fan-out count and
    the emitted positions (Σ idx per doc = n·(n-1)/2)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, idx: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("engine_tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT lang,
               count(*)                    AS n_tokens,
               sum(CAST(t.idx AS BIGINT))  AS idx_sum,
               count(DISTINCT doc_id)      AS n_docs
        FROM _udtf_docs, LATERAL engine_tokenize_udtf(text) t
        GROUP BY lang
        """
    )
