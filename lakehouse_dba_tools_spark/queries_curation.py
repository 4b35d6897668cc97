"""Corpus-curation queries beyond dedup: decontamination, repetition
scoring, PII redaction, deterministic training order.

These are the remaining first-class operations of a pretraining-data
pipeline (alongside dedup/quality/langid in queries_text.py): flag
training docs that leak benchmark n-grams, score intra-document
repetition (Gopher-style rep filters), scrub PII spans, and assign a
seeded deterministic global shuffle order. All single-pass column
algebra or broadcast joins — no UDFs. Each has a DuckDB oracle and is
verified by tools/diffcheck.py every round; which members sit inside
the checked 50 at any given round is registry.py's CHECKED_FIRST
business (several promoted over rounds 11-12: decontamination, the
split audits, the mixture planner, the epoch/pack chain, the e2e
pipeline), and the rest trail with their building blocks — shingling,
regex extraction, window ranking — carried by checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.functions.text import tokens, word_shingles
from lakehouse_dba_tools_spark.operators.partitioning import fan_out
from lakehouse_dba_tools_spark.queries_text import _D_SHINGLES3, _D_TOKS
from lakehouse_dba_tools_spark.registry import register
from lakehouse_dba_tools_spark.sources.tables import load_table

# Deterministic eval-set membership: every 97th doc plays the held-out
# benchmark whose n-grams must not leak into training data.
EVAL_MOD = 97


@register(
    "doc_decontamination",
    f"""
    WITH sh AS (SELECT doc_id, {_D_SHINGLES3} AS s FROM documents),
    ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
    hits AS (SELECT doc_id, count(*) AS n_overlap FROM tr JOIN ev USING (g)
             GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
           round(coalesce(h.n_overlap, 0)::DOUBLE / len(d.s), 6) AS overlap_frac,
           coalesce(h.n_overlap, 0) > 0 AS contaminated
    FROM sh d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {EVAL_MOD} <> 0
    """,
)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    distinct 3-gram shingles appear anywhere in the eval set
    (doc_id % 97 == 0 plays the benchmark). Scale shape: the eval
    shingle vocabulary is small (benchmarks are MBs, not TBs) and is
    BROADCAST — the training side never shuffles its exploded shingles;
    matches (a tiny fraction) are the only rows entering the per-doc
    count shuffle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.array_distinct(word_shingles("text", 3)).alias("s"),
        (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"),
    )
    ev = (
        sh.filter("is_eval")
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    tr = sh.filter(~F.col("is_eval"))
    # One pass over the training side: explode its (distinct) shingles,
    # mark eval hits via the broadcast left join, and recover BOTH the
    # shingle count (count of non-null g) and the overlap count (count
    # of hit markers) in a single per-doc aggregate — no second
    # shingling pass, no doc-level rejoin. explode_outer keeps
    # zero-shingle docs in the result like the oracle's LEFT JOIN.
    ev_marked = ev.withColumn("_hit", F.lit(1))
    return (
        tr.select("doc_id", F.explode_outer("s").alias("g"))
        .join(F.broadcast(ev_marked), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_sh"),
            F.count("_hit").alias("n_overlap"),
        )
        .select(
            "doc_id",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(F.col("n_overlap").cast("double") / F.col("n_sh"), 6).alias(
                "overlap_frac"
            ),
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


@register(
    "doc_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, toks, len(toks) AS n_tok,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END AS bigrams
      FROM t
    )
    SELECT doc_id, n_tok::BIGINT AS n_tok,
           round(CASE WHEN n_tok > 0
                 THEN 1.0 - len(list_distinct(toks))::DOUBLE / n_tok
                 ELSE 0.0 END, 6) AS dup_token_frac,
           round(CASE WHEN len(bigrams) > 0
                 THEN 1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams)
                 ELSE 0.0 END, 6) AS dup_bigram_frac
    FROM g
    """,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style rep filters): fraction
    of duplicate token and bigram occurrences per doc. Pure column
    algebra over one tokenization via the SHARED kernels
    (`functions/text.py token_bigrams`/`dup_fraction`) that
    `doc_text_profile` folds into its single-scan profile (round-12
    VERDICT directive #6) — this standalone query remains for callers
    that want only the repetition signals."""
    from lakehouse_dba_tools_spark.functions.text import dup_fraction, token_bigrams

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    staged = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tok")
    )
    staged = staged.withColumn(
        "bigrams", token_bigrams(F.col("toks"), F.col("n_tok"))
    )
    return staged.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(dup_fraction(F.col("toks"), F.col("n_tok")), 6).alias(
            "dup_token_frac"
        ),
        F.round(
            dup_fraction(F.col("bigrams"), F.size("bigrams")), 6
        ).alias("dup_bigram_frac"),
    )


# Lookaround-free patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB): leftmost match + greedy quantifiers give
# the same spans in both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d ]{5,14}\d"


@register(
    "doc_pii_redaction",
    rf"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 555 '
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
               AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{PHONE_RE}'))::BIGINT AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email/phone spans. The corpus
    fixture contains no PII, so each doc is deterministically augmented
    with a synthetic email + phone before redaction — the md5 of the
    redacted text is the strict full-output check (one span boundary
    off anywhere flips the hash). Single projection, scan-bound; the
    patterns avoid lookarounds so Java regex (Spark) and RE2 (DuckDB)
    produce identical spans."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    staged = docs.select("doc_id", aug.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace("t", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return staged.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# Mixture sampling: budget half the corpus tokens, weight sources
# deterministically from their numeric suffix (srcN -> N % 4 + 1) so
# the target mixture is computable at any scale factor by any engine.
MIX_BUDGET_FRAC = 0.5
MIX_SALT = "mix-v1"


@register(
    "corpus_mixture_sample",
    f"""
    WITH stats AS (
      SELECT source,
             (CAST(substr(source, 4) AS BIGINT) % 4 + 1)::DOUBLE AS w,
             count(*)::BIGINT AS n_docs,
             sum(len({_D_TOKS}))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(w) AS sum_w, sum(n_tokens)::DOUBLE AS total_tokens FROM stats),
    rates AS (
      SELECT s.source, s.n_docs, s.n_tokens,
             {MIX_BUDGET_FRAC} * t.total_tokens * s.w / t.sum_w AS target_tokens,
             least(1.0, {MIX_BUDGET_FRAC} * t.total_tokens * s.w / t.sum_w
                        / s.n_tokens) AS rate
      FROM stats s CROSS JOIN tot t
    ),
    sampled AS (
      SELECT d.source,
             count(*)::BIGINT AS sampled_docs,
             coalesce(sum(len({_D_TOKS})), 0)::BIGINT AS sampled_tokens
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '{MIX_SALT}'), 1, 8))
                 AS BIGINT) / 4294967296.0 < r.rate
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.n_tokens,
           round(r.target_tokens, 4) AS target_tokens,
           round(r.rate, 6) AS sample_rate,
           coalesce(s.sampled_docs, 0)::BIGINT AS sampled_docs,
           coalesce(s.sampled_tokens, 0)::BIGINT AS sampled_tokens
    FROM rates r LEFT JOIN sampled s ON r.source = s.source
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: weight each source, budget a token target
    (MIX_BUDGET_FRAC of the corpus), derive a per-source sampling rate,
    then take a deterministic hash sample and report achieved vs
    target. Inherently two-pass (rates depend on global per-source
    stats), which at 100 TB means: pass 1 is a tiny per-source
    aggregate worth persisting; pass 2 streams the corpus once against
    BROADCAST rates (20 rows) — no doc ever shuffles, the only
    exchanges carry per-source partial aggregates. Sampling is
    md5-uniform on doc_id: reproducible under retries/repartitioning
    and recomputable by the oracle engine."""
    from lakehouse_dba_tools_spark.functions.text import token_count
    from lakehouse_dba_tools_spark.operators.sampling import hash_uniform

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    ).withColumn(
        "w", (F.expr("substring(source, 4)").cast("long") % 4 + 1).cast("double")
    )
    tot = stats.agg(
        F.sum("w").alias("sum_w"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.lit(MIX_BUDGET_FRAC) * F.col("total_tokens") * F.col("w") / F.col("sum_w")
        ).alias("target_tokens"),
        F.least(
            F.lit(1.0),
            F.lit(MIX_BUDGET_FRAC)
            * F.col("total_tokens")
            * F.col("w")
            / F.col("sum_w")
            / F.col("n_tokens"),
        ).alias("rate"),
    )
    sampled = (
        docs.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(hash_uniform(F.col("doc_id"), MIX_SALT) < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("sampled_tokens"),
        )
    )
    return rates.join(sampled, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("target_tokens", 4).alias("target_tokens"),
        F.round("rate", 6).alias("sample_rate"),
        F.coalesce("sampled_docs", F.lit(0)).cast("long").alias("sampled_docs"),
        F.coalesce("sampled_tokens", F.lit(0)).cast("long").alias("sampled_tokens"),
    )


# Temperature-reweighted mixture (the multinomial-sampling recipe
# multilingual/multi-domain training runs use: w_i ∝ p_i^T with T < 1
# upsampling tail sources, T = 1 recovering natural proportions).
MIX_TEMPERATURE = 0.7


@register(
    "temperature_mixture_plan",
    f"""
    WITH stats AS (
      SELECT source, sum(len({_D_TOKS}))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens)::DOUBLE AS total FROM stats),
    shares AS (
      SELECT s.source, s.n_tokens, s.n_tokens / t.total AS p,
             pow(s.n_tokens / t.total, {MIX_TEMPERATURE}) AS pt
      FROM stats s CROSS JOIN tot t
    ),
    norm AS (SELECT sum(pt) AS sum_pt FROM shares)
    SELECT sh.source,
           sh.n_tokens,
           round(sh.p, 6) AS token_share,
           round(sh.pt / n.sum_pt, 6) AS temp_weight,
           round({MIX_BUDGET_FRAC} * t.total * sh.pt / n.sum_pt, 4)
             AS target_tokens,
           round(least(1.0, {MIX_BUDGET_FRAC} * t.total * sh.pt / n.sum_pt
                            / sh.n_tokens), 6) AS sample_rate,
           round({MIX_BUDGET_FRAC} * t.total * sh.pt / n.sum_pt
                 / sh.n_tokens, 6) AS epochs
    FROM shares sh CROSS JOIN norm n CROSS JOIN tot t
    ORDER BY source
    """,
)
def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture planning — the OTHER standard mixing
    recipe next to corpus_mixture_sample's explicit weights: each
    source's natural token share p_i is reweighted to p_i^T / Σ p_j^T
    (T = {MIX_TEMPERATURE}; T < 1 flattens the distribution, pulling
    budget from head sources toward the tail — the multilingual
    sampling law), then the token budget allocates per source. The
    report carries the capped one-pass sample_rate AND the uncapped
    `epochs` (target/available) — epochs > 1 means the recipe repeats
    that source, the signal a corpus builder sizes upsampling by.

    Scale shape: identical to corpus_mixture_sample's planning pass —
    one per-source aggregate (20 rows), two scalar folds broadcast
    back; the corpus is scanned once and no doc row ever shuffles.
    At 100 TB the plan is a 20-row frame a scheduler consumes."""
    from lakehouse_dba_tools_spark.functions.text import token_count

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "source", token_count("text").alias("n_tok")
    )
    stats = docs.groupBy("source").agg(F.sum("n_tok").alias("n_tokens"))
    tot = stats.agg(F.sum("n_tokens").cast("double").alias("total"))
    shares = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens") / F.col("total")).alias("p"),
        F.pow(F.col("n_tokens") / F.col("total"), F.lit(MIX_TEMPERATURE)).alias("pt"),
        "total",
    )
    norm = shares.agg(F.sum("pt").alias("sum_pt"))
    target = F.lit(MIX_BUDGET_FRAC) * F.col("total") * F.col("pt") / F.col("sum_pt")
    return (
        shares.crossJoin(F.broadcast(norm))
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("p", 6).alias("token_share"),
            F.round(F.col("pt") / F.col("sum_pt"), 6).alias("temp_weight"),
            F.round(target, 4).alias("target_tokens"),
            F.round(
                F.least(F.lit(1.0), target / F.col("n_tokens")), 6
            ).alias("sample_rate"),
            F.round(target / F.col("n_tokens"), 6).alias("epochs"),
        )
        .orderBy("source")
    )


# Epoch materialization: EXECUTE the repeat-factor recipe the planners
# report (temperature_mixture_plan's `epochs` column — ">1 means the
# recipe repeats that source"). Per-source planned epochs come from the
# same deterministic weight convention as corpus_mixture_sample
# (srcN → N % 4 + 1, scaled by EPOCH_BUDGET), so floor-epochs 0..3 AND
# the fractional top-up are all exercised on the fixture; production
# callers inject the planner's epochs instead.
EPOCH_BUDGET = 0.8
EPOCH_SALT = "epoch-up-v1"


@register(
    "mixture_epoch_materialize",
    f"""
    WITH per_doc AS (
      SELECT source, doc_id, len({_D_TOKS}) AS n_tok,
             ((CAST(substr(source, 4) AS BIGINT) % 4 + 1)::DOUBLE
              * {EPOCH_BUDGET}) AS pe
      FROM documents
    ),
    inst AS (
      SELECT source, doc_id, n_tok, pe,
             CAST(floor(pe) AS BIGINT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                               || '{EPOCH_SALT}'), 1, 8)) AS BIGINT)
                         / 4294967296.0 < pe - floor(pe)
                    THEN 1 ELSE 0 END AS n_inst
      FROM per_doc
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(any_value(pe), 6) AS planned_epochs,
           sum(n_inst)::BIGINT AS n_instances,
           round(sum(n_inst)::DOUBLE / count(*), 6) AS realized_epochs,
           sum(n_inst * n_tok)::BIGINT AS instance_tokens
    FROM inst
    GROUP BY source
    ORDER BY source
    """,
)
def mixture_epoch_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-replication EXECUTOR for mixture upsampling — the step
    after temperature_mixture_plan/corpus_mixture_sample's planning:
    each doc materializes floor(epochs) training instances plus one
    more when its md5-uniform draw falls under the fractional part
    (deterministic: the same doc always gets the same extra-epoch
    decision, so retries/backfills reproduce the multiset exactly).
    The report pins, per source, planned vs REALIZED epochs from the
    exploded instance frame — realized converges on planned at the
    law-of-large-numbers rate, and instance_tokens is what a trainer
    actually consumes.

    Scale shape: the plan is a broadcast-sized expression (here the
    deterministic weight convention; in production the planner's
    20-row output), the per-doc epoch count is column algebra, and the
    explode materializes (doc_id, epoch) MANIFEST rows — never
    duplicated text; a 100 TB pipeline joins text lazily at pack time
    by doc_id, so the exploded frame is two ints per instance. No
    shuffle until the per-source rollup (20 groups)."""
    from lakehouse_dba_tools_spark.functions.text import token_count
    from lakehouse_dba_tools_spark.operators.sampling import hash_uniform

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )
    planned = (
        (F.expr("substring(source, 4)").cast("long") % 4 + 1).cast("double")
        * EPOCH_BUDGET
    )
    per_doc = docs.select(
        "source",
        "doc_id",
        "n_tok",
        planned.alias("pe"),
        (
            F.floor(planned).cast("long")
            + (
                hash_uniform(F.col("doc_id"), EPOCH_SALT)
                < (planned - F.floor(planned))
            ).cast("long")
        ).alias("n_inst"),
    )
    instances = per_doc.filter(F.col("n_inst") > 0).withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("n_inst")))
    )
    roll = instances.groupBy("source").agg(
        F.count("*").alias("n_instances"),
        F.sum("n_tok").alias("instance_tokens"),
    )
    base = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.first("pe").alias("pe")
    )
    return (
        base.join(roll, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("pe", 6).alias("planned_epochs"),
            F.coalesce("n_instances", F.lit(0)).cast("long").alias("n_instances"),
            F.round(
                F.coalesce("n_instances", F.lit(0)) / F.col("n_docs"), 6
            ).alias("realized_epochs"),
            F.coalesce("instance_tokens", F.lit(0))
            .cast("long")
            .alias("instance_tokens"),
        )
        .orderBy("source")
    )


_SPLIT_CASE = """CASE
        WHEN CAST(('0x' || substr(md5(CAST({id} AS VARCHAR) || 'split-v1'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.8 THEN 'train'
        WHEN CAST(('0x' || substr(md5(CAST({id} AS VARCHAR) || 'split-v1'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.9 THEN 'val'
        ELSE 'test' END"""


@register(
    "split_leakage_audit",
    f"""
    WITH sh AS (SELECT doc_id, {_D_SHINGLES3} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
            / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.5
    ),
    labeled AS (
      SELECT least({_SPLIT_CASE.format(id='id_a')},
                   {_SPLIT_CASE.format(id='id_b')}) AS split_a,
             greatest({_SPLIT_CASE.format(id='id_a')},
                      {_SPLIT_CASE.format(id='id_b')}) AS split_b
      FROM pairs
    )
    SELECT split_a, split_b, count(*) AS n_pairs,
           (split_a <> split_b) AS is_leak
    FROM labeled GROUP BY split_a, split_b
    ORDER BY split_a, split_b
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit — the in-corpus contamination check
    next to doc_decontamination's external-benchmark one: a near-dup
    pair whose members land in different splits leaks training signal
    into evaluation, the failure mode hash-based splitting alone cannot
    prevent (splits are per-doc; near-dups are per-PAIR). Composes the
    two existing kernels: deterministic md5 split assignment
    (operators/sampling.py) × candidates→verify near-dup detection
    (dedup/minhash.py, recall 1.0 at these params — the same
    exact-oracle-equality contract doc_near_dup_components pins), then
    counts pairs per canonical split pair with the cross-split rows
    flagged. The report a corpus builder acts on: is_leak rows demand
    re-splitting by CLUSTER (e.g. doc_near_dup_components' canonical
    keeper as the split key) rather than by doc.

    Scale shape: the pair frame is the banded LSH bucket-join (never
    all-pairs — the oracle's quadratic join is the gate-SF truth
    kernel, not the plan); split labels attach by two broadcast-light
    joins on the tiny verified-pair frame; the rollup is ≤ 6 rows."""
    from lakehouse_dba_tools_spark.dedup.minhash import verified_near_dups
    from lakehouse_dba_tools_spark.operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    caches: list[DataFrame] = []
    pairs = verified_near_dups(docs, threshold=0.5, caches=caches)
    split = train_val_test_split(
        docs.select("doc_id"), "doc_id", (0.8, 0.1, 0.1), salt="split-v1"
    ).select("doc_id", "split")
    labeled = (
        pairs.join(
            split.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            split.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    out = (
        labeled.groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
        .orderBy("split_a", "split_b")
    )
    # materialize the ≤6-row rollup, then RELEASE the shingle cache the
    # near-dup pipeline pinned (verified_near_dups exports it via
    # `caches`) — this query runs every driver round, and a lazy return
    # would leak one corpus-sized cache entry per invocation (the
    # round-11 ADVICE leak class; same eager-report pattern as
    # cluster_safe_split_audit, restricted to O(1)-row reports).
    # try/finally: a failed collect must not strand the cache either.
    try:
        rows = out.collect()
    finally:
        for c in caches:
            c.unpersist()
    return spark.createDataFrame(rows, out.schema)


# Cluster-safe re-split (VERDICT r10 directive #3): act on what
# split_leakage_audit reports. Split key = the near-dup COMPONENT's
# canonical id (min doc_id reachable through the verified-pair graph,
# dedup/components.py), so every member of a near-dup cluster lands in
# the same split BY CONSTRUCTION — the md5 hash can no longer separate
# a pair. Tolerance on the realized fractions vs (0.8, 0.1, 0.1):
# binomial 3σ on the train share is ~0.054 over the gate corpus's 500
# doc draws — and cluster-keying reduces the independent draws further
# (~460 keys at the gate SF → 3σ ≈ 0.056) — so the tolerance sits
# ABOVE the 3σ envelope (≈4σ), never inside it; observed deviations
# are ≤0.011 at every test SF.
SPLIT_TOL = 0.08
CLUSTER_SPLIT_SALT = "cluster-split-v1"

_CLUSTER_SPLIT_CASE = """CASE
        WHEN CAST(('0x' || substr(md5(CAST({id} AS VARCHAR) || '{salt}'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.8 THEN 'train'
        WHEN CAST(('0x' || substr(md5(CAST({id} AS VARCHAR) || '{salt}'), 1, 8)) AS BIGINT)
             / 4294967296.0 < 0.9 THEN 'val'
        ELSE 'test' END"""


@register(
    "cluster_safe_split_audit",
    f"""
    WITH RECURSIVE sh AS (SELECT doc_id, {_D_SHINGLES3} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
            / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.5
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    r(node, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN r ON e.b = r.node
    ),
    reach AS (SELECT node, min(lbl) AS comp FROM r GROUP BY node),
    keyed AS (
      SELECT d.doc_id, coalesce(rc.comp, d.doc_id) AS ck,
             rc.comp IS NOT NULL AS clustered
      FROM documents d LEFT JOIN reach rc ON d.doc_id = rc.node
    ),
    labeled AS (
      SELECT doc_id, clustered,
             {_CLUSTER_SPLIT_CASE.format(id='ck', salt=CLUSTER_SPLIT_SALT)} AS split
      FROM keyed
    ),
    leaks AS (
      SELECT count(*) AS n FROM pairs p
      JOIN labeled la ON p.id_a = la.doc_id
      JOIN labeled lb ON p.id_b = lb.doc_id
      WHERE la.split <> lb.split
    ),
    tot AS (SELECT count(*)::DOUBLE AS n FROM documents),
    per AS (
      SELECT s.split, s.target,
             coalesce(c.n_docs, 0)::BIGINT AS n_docs,
             round(coalesce(c.n_docs, 0) / t.n, 6) AS frac,
             coalesce(c.cd, 0)::BIGINT AS clustered_docs
      FROM (VALUES ('train', 0.8), ('val', 0.1), ('test', 0.1)) s(split, target)
      LEFT JOIN (SELECT split, count(*) AS n_docs,
                        sum(CASE WHEN clustered THEN 1 ELSE 0 END) AS cd
                 FROM labeled GROUP BY split) c USING (split)
      CROSS JOIN tot t
    )
    SELECT p.split, p.n_docs, p.frac, p.clustered_docs,
           abs(p.frac - p.target) <= {SPLIT_TOL} AS within_tol,
           l.n::BIGINT AS leak_pairs
    FROM per p CROSS JOIN leaks l
    ORDER BY p.split
    """,
)
def cluster_safe_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-safe train/val/test re-split + proof audit — the FIX for
    what split_leakage_audit reports (its is_leak rows demand splitting
    by CLUSTER rather than by doc): every doc's split key becomes its
    near-dup component's canonical id (min doc_id reachable through the
    verified-pair graph — `dedup/components.py:29`'s label), singleton
    docs keep their own id, and the deterministic md5 split
    (`operators/sampling.py:16`) runs over that key. Same cluster ⇒
    same key ⇒ same split, so the audit's leak count is ZERO by
    construction — and the oracle re-derives the entire chain
    (quadratic-join exact near-dup pairs → recursive-CTE connected
    components → cluster-keyed md5 split) independently, so equality
    proves the Spark components and hash assignment, not just the
    zero. Per split the report pins: doc count, realized fraction
    (within SPLIT_TOL of the 0.8/0.1/0.1 targets — re-keying by
    cluster leaves the hash uniform over keys, so fractions hold),
    docs that belong to a multi-doc cluster, and the global post-split
    cross-split near-dup pair count.

    Scale shape: pairs come from the banded LSH bucket-join (never
    all-pairs — the oracle's quadratic join is the gate-SF truth
    kernel, not the plan); components run the bounded hybrid CC
    (driver union-find under 2M edges, distributed min-label loop
    above); the split itself is one hash expression — no shuffle; the
    report is 3 rows. At 100 TB the only shuffles are LSH banding and
    the CC label loop, both near-dup-edge-sized, not corpus-sized."""
    from pyspark import StorageLevel

    from lakehouse_dba_tools_spark.dedup.components import connected_components
    from lakehouse_dba_tools_spark.dedup.minhash import verified_near_dups
    from lakehouse_dba_tools_spark.operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    # Two consumers (CC edge build + the post-split leak join) — persist
    # so the LSH candidates→verify pipeline runs once. MEMORY_AND_DISK:
    # pair rows are two ids, evictable either way. The shingle cache
    # verified_near_dups pins internally is exported via `caches` and
    # released below with the pairs cache (round-11 ADVICE leak fix).
    caches: list[DataFrame] = []
    pairs = verified_near_dups(docs, threshold=0.5, caches=caches).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    keyed = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("cluster_key"),
            F.col("comp").isNotNull().alias("clustered"),
        )
    )
    labeled = train_val_test_split(
        keyed, "cluster_key", (0.8, 0.1, 0.1), salt=CLUSTER_SPLIT_SALT
    )
    leaks = (
        pairs.join(
            labeled.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            labeled.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count("*").alias("leak_pairs"))
    )
    tot = labeled.agg(F.count("*").cast("double").alias("n_total"))
    counts = labeled.groupBy("split").agg(
        F.count("*").alias("nd"),
        F.sum(F.col("clustered").cast("long")).alias("cd"),
    )
    targets = spark.createDataFrame(
        [("train", 0.8), ("val", 0.1), ("test", 0.1)], "split string, target double"
    )
    per = (
        targets.join(counts, "split", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            F.coalesce("nd", F.lit(0)).cast("long").alias("n_docs"),
            F.round(F.coalesce("nd", F.lit(0)) / F.col("n_total"), 6).alias("frac"),
            F.coalesce("cd", F.lit(0)).cast("long").alias("clustered_docs"),
            "target",
        )
    )
    out = (
        per.crossJoin(F.broadcast(leaks))
        .select(
            "split",
            "n_docs",
            "frac",
            "clustered_docs",
            (F.abs(F.col("frac") - F.col("target")) <= SPLIT_TOL).alias("within_tol"),
            F.col("leak_pairs").cast("long").alias("leak_pairs"),
        )
        .orderBy("split")
    )
    # materialize the 3-row report, then RELEASE the pairs cache —
    # persist holds a strong CacheManager reference, and this query
    # runs every driver round; a lazy return would leak one cached
    # pair frame per invocation for the session's lifetime.
    # try/finally: a failed collect must not strand the caches either.
    try:
        rows = out.collect()
    finally:
        pairs.unpersist()
        for c in caches:
            c.unpersist()
    return spark.createDataFrame(rows, out.schema)


TRAIN_ORDER_SEED = "epoch0"
SHUFFLE_BUCKETS = 256


@register(
    "doc_training_order",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{TRAIN_ORDER_SEED}:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(substr(k, 1, 2) AS VARCHAR) AS bucket,
           row_number() OVER (PARTITION BY substr(k, 1, 2)
                              ORDER BY k, doc_id) AS rank_in_bucket
    FROM keyed
    """,
)
def doc_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle for training order: key each
    doc by md5(seed:doc_id); global order = (bucket, rank_in_bucket)
    where bucket is the first key byte. Scale shape: ranking is
    PARTITIONED by bucket (256 independent reducers), never a global
    single-reducer window — the same layout a 100 TB shuffled-corpus
    write uses (repartitionByRange on the key, sortWithinPartitions).
    Reshuffling an epoch = changing the seed string."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit(f"{TRAIN_ORDER_SEED}:"), F.col("doc_id").cast("string"))).alias("k"),
    ).withColumn("bucket", F.substring("k", 1, 2))
    w = Window.partitionBy("bucket").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "bucket", F.row_number().over(w).alias("rank_in_bucket")
    )


PACK_CAP = 2048  # tokens per training window
PACK_SHARDS = 8


@register(
    "corpus_pack_chunks",
    rf"""
    WITH d AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len({_D_TOKS}) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM d WHERE n_tok > 0
    ),
    e AS (
      SELECT shard, doc_id, cum - n_tok AS strt, cum,
             unnest(generate_series(CAST((cum - n_tok) // {PACK_CAP} AS BIGINT),
                                    CAST((cum - 1) // {PACK_CAP} AS BIGINT))) AS chunk
      FROM c
    )
    SELECT shard, chunk,
           count(*) AS n_docs,
           CAST(sum(least(cum, (chunk+1)*{PACK_CAP})
                    - greatest(strt, chunk*{PACK_CAP})) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc
    FROM e GROUP BY shard, chunk
    """,
)
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window packing manifest (concat-and-chunk): documents
    are concatenated in deterministic order and cut into fixed
    PACK_CAP-token windows — the packing GPT-style pretraining actually
    uses — and the manifest reports, per window, how many documents it
    spans, its token fill (== PACK_CAP except each shard's tail), and
    the first document.

    Scale shape: packing is SHARDED (doc_id % PACK_SHARDS) so the
    running-offset window is partitioned — 8 independent cumsum
    reducers here, thousands at 100 TB — never a global single-reducer
    window. A doc spanning a window boundary contributes a row per
    touched window via sequence+explode; only (doc_id, offsets) ride
    the explode, never text."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens("text")).alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "strt", F.col("cum") - F.col("n_tok")
    )
    e = c.select(
        "shard",
        "doc_id",
        "strt",
        "cum",
        F.explode(
            F.sequence(
                F.floor(F.col("strt") / PACK_CAP), F.floor((F.col("cum") - 1) / PACK_CAP)
            )
        ).alias("chunk"),
    )
    return (
        e.groupBy("shard", "chunk")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.least(F.col("cum"), (F.col("chunk") + 1) * PACK_CAP)
                - F.greatest(F.col("strt"), F.col("chunk") * PACK_CAP)
            )
            .cast("bigint")
            .alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("shard", "chunk")
    )


@register(
    "epoch_pack_manifest",
    f"""
    WITH per_doc AS (
      SELECT source, doc_id, len({_D_TOKS}) AS n_tok,
             ((CAST(substr(source, 4) AS BIGINT) % 4 + 1)::DOUBLE
              * {EPOCH_BUDGET}) AS pe
      FROM documents
    ),
    inst0 AS (
      SELECT doc_id, n_tok,
             CAST(floor(pe) AS BIGINT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                               || '{EPOCH_SALT}'), 1, 8)) AS BIGINT)
                         / 4294967296.0 < pe - floor(pe)
                    THEN 1 ELSE 0 END AS n_inst
      FROM per_doc
    ),
    inst AS (
      SELECT doc_id, n_tok,
             unnest(generate_series(1, n_inst)) AS epoch
      FROM inst0 WHERE n_inst > 0 AND n_tok > 0
    ),
    c AS (
      SELECT doc_id % {PACK_SHARDS} AS shard, doc_id, epoch, n_tok,
             sum(n_tok) OVER (PARTITION BY doc_id % {PACK_SHARDS}
                              ORDER BY doc_id, epoch
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM inst
    ),
    e AS (
      SELECT shard, doc_id, cum - n_tok AS strt, cum,
             unnest(generate_series(CAST((cum - n_tok) // {PACK_CAP} AS BIGINT),
                                    CAST((cum - 1) // {PACK_CAP} AS BIGINT))) AS chunk
      FROM c
    ),
    m AS (
      SELECT shard::BIGINT AS shard, chunk::BIGINT AS chunk,
             count(*)::BIGINT AS n_instances,
             CAST(sum(least(cum, (chunk+1)*{PACK_CAP})
                      - greatest(strt, chunk*{PACK_CAP})) AS BIGINT) AS n_tokens,
             min(doc_id)::BIGINT AS first_doc
      FROM e GROUP BY shard, chunk
    ),
    tot AS (
      SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), count(*)::BIGINT,
             coalesce(sum(n_tok), 0)::BIGINT, CAST(-1 AS BIGINT) FROM inst
    )
    SELECT * FROM m UNION ALL SELECT * FROM tot
    ORDER BY shard, chunk
    """,
)
def epoch_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan → materialize → PACK as one chain (VERDICT r11 directive
    #3): the epoch-replication executor's (doc_id, epoch) instance
    manifest (`mixture_epoch_materialize` — floor(epochs) plus the
    deterministic md5-fractional top-up) feeds straight into
    `corpus_pack_chunks`' sharded packer, so the training windows a
    trainer actually reads contain each doc exactly its materialized
    epoch count times. Output = the pack manifest per (shard, chunk) —
    instance count, token fill, first doc — plus one (-1, -1) TOTAL row
    carrying the full instance count and token sum; the DuckDB oracle
    re-derives the ENTIRE chain (weights → epochs → md5 top-up →
    explode → sharded cumsum → window overlap split) from the raw
    corpus, so hash equality proves token conservation end-to-end:
    every upsampled instance's tokens land in exactly one window
    accumulation, Σ manifest n_tokens ≡ the TOTAL row's instance
    tokens by construction on both engines.

    Scale shape: the instance frame carries (doc_id, epoch, n_tok) ints
    only — text joins lazily at shard-write time in a real pipeline;
    the cumsum is PARTITIONED by shard ({PACK_SHARDS} reducers here,
    thousands at 100 TB), never a global window; window-boundary docs
    ride sequence+explode as offset rows. One corpus scan, one
    shard-keyed exchange, one manifest-sized rollup."""
    from lakehouse_dba_tools_spark.functions.text import token_count
    from lakehouse_dba_tools_spark.operators.sampling import hash_uniform

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )
    planned = (
        (F.expr("substring(source, 4)").cast("long") % 4 + 1).cast("double")
        * EPOCH_BUDGET
    )
    inst = (
        docs.select(
            "doc_id",
            "n_tok",
            (
                F.floor(planned).cast("long")
                + (
                    hash_uniform(F.col("doc_id"), EPOCH_SALT)
                    < (planned - F.floor(planned))
                ).cast("long")
            ).alias("n_inst"),
        )
        .filter((F.col("n_inst") > 0) & (F.col("n_tok") > 0))
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("n_inst"))))
        .select(
            (F.col("doc_id") % PACK_SHARDS).alias("shard"),
            "doc_id",
            "epoch",
            "n_tok",
        )
    )
    w = Window.partitionBy("shard").orderBy("doc_id", "epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = inst.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "strt", F.col("cum") - F.col("n_tok")
    )
    e = c.select(
        "shard",
        "doc_id",
        "strt",
        "cum",
        F.explode(
            F.sequence(
                F.floor(F.col("strt") / PACK_CAP),
                F.floor((F.col("cum") - 1) / PACK_CAP),
            )
        ).alias("chunk"),
    )
    manifest = e.groupBy("shard", "chunk").agg(
        F.count("*").alias("n_instances"),
        F.sum(
            F.least(F.col("cum"), (F.col("chunk") + 1) * PACK_CAP)
            - F.greatest(F.col("strt"), F.col("chunk") * PACK_CAP)
        )
        .cast("long")
        .alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
    total = inst.agg(
        F.count("*").alias("n_instances"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
    ).select(
        F.lit(-1).cast("long").alias("shard"),
        F.lit(-1).cast("long").alias("chunk"),
        "n_instances",
        "n_tokens",
        F.lit(-1).cast("long").alias("first_doc"),
    )
    return (
        manifest.select("shard", "chunk", "n_instances", "n_tokens", "first_doc")
        .unionByName(total)
        .orderBy("shard", "chunk")
    )


def _e2e_oracle() -> str:
    """End-to-end corpus-build oracle: DuckDB re-derives the surviving
    doc set through every stage — cross-batch streaming dedup (exact
    all-pairs Jaccard restricted to later-vs-earlier replay batches),
    eval holdout + decontamination, PII redaction (the token counts
    downstream are over REDACTED text), langid+quality funnel, weighted
    mixture sampling, and training-window packing — and emits the same
    funnel + pack-manifest rows the Spark pipeline reports. Shares its
    fragments with the proven per-stage oracles (streaming_ingest_dedup,
    doc_decontamination, doc_pii_redaction, training_corpus_funnel,
    corpus_mixture_sample, corpus_pack_chunks)."""
    from lakehouse_dba_tools_spark.functions import text as TX

    toksr = r"string_split_regex(trim(tr), '\s+')"
    hits = {
        lang: (
            f"len(list_filter(tl, t -> t IN ({', '.join(repr(w) for w in words)})))"
        )
        for lang, words in sorted(TX.STOPWORDS.items())
    }
    hit_cols = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    mx = "greatest(" + ", ".join(f"h_{lang}" for lang in hits) + ")"
    case = " ".join(f"WHEN h_{lang} = mx THEN '{lang}'" for lang in hits)
    return rf"""
    WITH bs AS (SELECT (count(*) + 2) // 3 AS b FROM documents),
    sh AS (SELECT doc_id, {_D_SHINGLES3} AS s FROM documents),
    dup AS (
      SELECT DISTINCT a.doc_id FROM sh a, sh b, bs
      WHERE (a.doc_id // bs.b) > (b.doc_id // bs.b)
        AND len(list_intersect(a.s, b.s))::DOUBLE
            / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.5
    ),
    ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    cont AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest(s) AS g FROM sh
            WHERE doc_id % {EVAL_MOD} <> 0) t JOIN ev USING (g)
    ),
    base AS (
      SELECT d.doc_id, d.source, len({_D_TOKS}) AS n_tok0,
             (dup.doc_id IS NULL) AS a1,
             (dup.doc_id IS NULL AND d.doc_id % {EVAL_MOD} <> 0
              AND cont.doc_id IS NULL) AS a2,
             regexp_replace(regexp_replace(
               d.text || ' contact user' || CAST(d.doc_id AS VARCHAR)
                      || '@example.com or +1 555 '
                      || lpad(CAST(d.doc_id % 10000 AS VARCHAR), 4, '0') || '.',
               '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g') AS tr
      FROM documents d
      LEFT JOIN dup ON d.doc_id = dup.doc_id
      LEFT JOIN cont ON d.doc_id = cont.doc_id
    ),
    toked AS (
      SELECT doc_id, source, n_tok0, a1, a2, tr, {toksr} AS toksr,
             list_transform({toksr}, t -> lower(t)) AS tl
      FROM base
    ),
    feats AS (
      SELECT doc_id, source, n_tok0, a1, a2, len(toksr) AS n_tokr,
             length(regexp_replace(tr, '[^A-Za-z]', '', 'g'))::DOUBLE
               / length(tr) AS alpha,
             len(list_filter(tl, t -> t IN ('the','and','of','to','a','in','is','it','that','for')))::DOUBLE
               / len(toksr) AS stop,
             list_sum(list_transform(toksr, t -> length(t)))::DOUBLE
               / len(toksr) AS awl,
             {hit_cols}
      FROM toked
    ),
    m AS (SELECT *, {mx} AS mx FROM feats),
    flags AS (
      SELECT doc_id, source, n_tok0, n_tokr, a1, a2,
             a2 AND (CASE WHEN mx = 0 THEN 'und' {case} END) = 'en'
                AND round(0.3 * (CASE WHEN n_tokr BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                      + 0.3 * least(alpha * 2, 1.0) + 0.2 * least(stop * 5, 1.0)
                      + 0.2 * (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END), 6)
                  >= 0.5 AS a4
      FROM m
    ),
    stats AS (
      SELECT source,
             (CAST(substr(source, 4) AS BIGINT) % 4 + 1)::DOUBLE AS w,
             sum(n_tokr)::BIGINT AS n_tokens
      FROM flags WHERE a4 GROUP BY source
    ),
    tot AS (SELECT sum(w) AS sum_w, sum(n_tokens)::DOUBLE AS total_tokens FROM stats),
    rates AS (
      SELECT s.source,
             least(1.0, {MIX_BUDGET_FRAC} * t.total_tokens * s.w / t.sum_w
                        / s.n_tokens) AS rate
      FROM stats s CROSS JOIN tot t
    ),
    samp AS (
      SELECT f.*,
             f.a4 AND CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)
                           || '{MIX_SALT}'), 1, 8)) AS BIGINT)
                      / 4294967296.0 < r.rate AS a5
      FROM flags f LEFT JOIN rates r USING (source)
    ),
    c AS (
      SELECT doc_id % {PACK_SHARDS} AS shard, doc_id, n_tokr,
             sum(n_tokr) OVER (PARTITION BY doc_id % {PACK_SHARDS}
                               ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM samp WHERE a5 AND n_tokr > 0
    ),
    e AS (
      SELECT shard, doc_id, cum - n_tokr AS strt, cum,
             unnest(generate_series(CAST((cum - n_tokr) // {PACK_CAP} AS BIGINT),
                                    CAST((cum - 1) // {PACK_CAP} AS BIGINT))) AS chunk
      FROM c
    ),
    pack AS (
      SELECT '60_pack' AS stage, shard::BIGINT AS shard, chunk::BIGINT AS chunk,
             count(*)::BIGINT AS n_docs,
             CAST(sum(least(cum, (chunk+1)*{PACK_CAP})
                      - greatest(strt, chunk*{PACK_CAP})) AS BIGINT) AS n_tokens,
             min(doc_id)::BIGINT AS first_doc
      FROM e GROUP BY shard, chunk
    ),
    funnel AS (
      SELECT '00_raw' AS stage, -1::BIGINT AS shard, -1::BIGINT AS chunk,
             count(*)::BIGINT AS n_docs,
             coalesce(sum(n_tok0), 0)::BIGINT AS n_tokens,
             -1::BIGINT AS first_doc FROM samp
      UNION ALL
      SELECT '10_crossbatch_dedup', -1, -1, count(*) FILTER (a1)::BIGINT,
             coalesce(sum(n_tok0) FILTER (a1), 0)::BIGINT, -1 FROM samp
      UNION ALL
      SELECT '20_decontam', -1, -1, count(*) FILTER (a2)::BIGINT,
             coalesce(sum(n_tok0) FILTER (a2), 0)::BIGINT, -1 FROM samp
      UNION ALL
      SELECT '30_pii_redacted', -1, -1, count(*) FILTER (a2)::BIGINT,
             coalesce(sum(n_tokr) FILTER (a2), 0)::BIGINT, -1 FROM samp
      UNION ALL
      SELECT '40_quality_en', -1, -1, count(*) FILTER (a4)::BIGINT,
             coalesce(sum(n_tokr) FILTER (a4), 0)::BIGINT, -1 FROM samp
      UNION ALL
      SELECT '50_mixture', -1, -1, count(*) FILTER (a5)::BIGINT,
             coalesce(sum(n_tokr) FILTER (a5), 0)::BIGINT, -1 FROM samp
    )
    SELECT * FROM funnel UNION ALL SELECT * FROM pack
    """


@register("training_corpus_e2e", _e2e_oracle())
def training_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brief's north star as ONE hard-signal flow: raw feed →
    streaming ingest dedup through the persisted LSH index (real
    foreachBatch replay, 3 micro-batches (r12 bench directive #1: trimmed from 4 — cross-batch dedup needs >=2 and the replay/append contract is batch-count-invariant, pinned at other counts by tests/test_streaming.py)) → eval holdout +
    decontamination → PII redaction (downstream features are computed
    over the REDACTED text — the stages genuinely compose) → langid/
    quality funnel → weighted mixture sample → pack into 2048-token
    training windows. Output = the per-stage survival funnel plus the
    full pack manifest in one frame; the DuckDB oracle re-derives every
    stage from scratch, so one doc surviving (or dying) wrongly
    anywhere flips the hash.

    Scale shape: the streaming leg is the per-batch-bounded index
    lifecycle (measured flat per batch at 10× corpus, SCALE.md); every
    other stage is one scan + broadcast semi-joins; the per-doc feature
    frame (scalars only, text dropped) is pinned once and every
    downstream consumer — funnel aggregate, mixture rates, sampling,
    packing — reads the pin instead of re-running the scan; packing's
    cumsum is sharded (PACK_SHARDS reducers), never a global window.
    The bounded output (6 funnel rows + the manifest) is collected and
    the pin released — same cache hygiene as the index carriers."""
    from lakehouse_dba_tools_spark.functions import text as TX
    from lakehouse_dba_tools_spark.operators.sampling import hash_uniform
    from lakehouse_dba_tools_spark.streaming.ingest_dedup import stream_ingest_dedup
    from lakehouse_dba_tools_spark.session import scoped_confs

    docs = load_table(spark, sf_dir, "documents")
    # fixture-sized shuffle scope (8 partitions, the EXT-window
    # precedent): every stage here materializes inside the scope and
    # the many small exchanges (streaming ingest batches, distincts,
    # per-source rollups) carry KBs at gate SF; at 100 TB the
    # pipeline runs under the session default (round-12 directive #1)
    with scoped_confs(spark, {"spark.sql.shuffle.partitions": "8"}):
        n = docs.count()  # one count job, metadata-cheap

        base0 = fan_out(docs)
        shingled = base0.select(
            "doc_id", F.array_distinct(word_shingles("text", 3)).alias("s")
        )
        ev = (
            shingled.filter(F.col("doc_id") % EVAL_MOD == 0)
            .select(F.explode("s").alias("g"))
            .distinct()
        )
        cont = (
            shingled.filter(F.col("doc_id") % EVAL_MOD != 0)
            .select("doc_id", F.explode("s").alias("g"))
            .join(F.broadcast(ev), "g", "left_semi")
            .select("doc_id")
            .distinct()
        ).persist()
        # The decontamination leg (holdout shingles -> contaminated-doc
        # set) shares nothing with the streaming-dedup leg — overlap
        # them (guide §2.6; indexio.overlap_jobs): cont's shuffle work
        # back-fills the executor slots the fixture-sized micro-batches
        # leave idle. cont is pinned so the overlap's materialization
        # is the one the downstream anti-join consumes; released with
        # the carrier's other caches below.
        from lakehouse_dba_tools_spark.operators.indexio import overlap_jobs

        try:
            pairs, _ = overlap_jobs(
                lambda: stream_ingest_dedup(
                    spark, docs, batch_size=(n + 2) // 3, threshold=0.5
                ),
                lambda: cont.count(),  # materialize the pin
            )
        except BaseException:
            # the only Spark actions between cont's persist and the
            # try/finally below run here — release the pin on failure
            # (everything in between is lazy plan construction)
            cont.unpersist()
            raise
        dup = pairs.select(F.col("id_a").alias("doc_id")).distinct()

        redacted = F.regexp_replace(
            F.regexp_replace(
                F.concat(
                    F.col("text"),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1 555 "),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit("."),
                ),
                EMAIL_RE,
                "<EMAIL>",
            ),
            PHONE_RE,
            "<PHONE>",
        )
        staged = (
            base0.join(dup.withColumn("_dup", F.lit(1)), "doc_id", "left")
            .join(cont.withColumn("_cont", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                "source",
                F.size(tokens("text")).alias("n_tok0"),
                F.col("_dup").isNull().alias("a1"),
                (
                    F.col("_dup").isNull()
                    & (F.col("doc_id") % EVAL_MOD != 0)
                    & F.col("_cont").isNull()
                ).alias("a2"),
                redacted.alias("tr"),
            )
            .select(
                "doc_id", "source", "n_tok0", "a1", "a2", "tr",
                tokens("tr").alias("toksr"),
            )
            .select(
                "doc_id", "source", "n_tok0", "a1", "a2", "tr", "toksr",
                F.transform("toksr", lambda t: F.lower(t)).alias("tl"),
                F.size("toksr").alias("n_tokr"),
            )
        )
        alpha = TX.alpha_ratio("tr")
        stop = TX.stopword_hits_from_tokens(F.col("tl"), "en") / F.col("n_tokr")
        awl = F.aggregate("toksr", F.lit(0.0), lambda a, t: a + F.length(t)) / F.col(
            "n_tokr"
        )
        len_ok = F.when((F.col("n_tokr") >= 10) & (F.col("n_tokr") <= 100000), 1.0).otherwise(0.0)
        awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 1.0).otherwise(0.0)
        quality = F.round(
            0.3 * len_ok
            + 0.3 * F.least(alpha * 2, F.lit(1.0))
            + 0.2 * F.least(stop * 5, F.lit(1.0))
            + 0.2 * awl_ok,
            6,
        )
        # the pinned frame carries SCALARS only — no text, no token arrays
        feat = staged.select(
            "doc_id",
            "source",
            "n_tok0",
            "n_tokr",
            "a1",
            "a2",
            (
                F.col("a2")
                & (TX.detect_language_from_tokens(F.col("tl")) == "en")
                & (quality >= 0.5)
            ).alias("a4"),
        ).persist()
        try:
            stats = (
                feat.filter("a4")
                .groupBy("source")
                .agg(F.sum("n_tokr").alias("n_tokens"))
                .withColumn(
                    "w",
                    (F.expr("substring(source, 4)").cast("long") % 4 + 1).cast("double"),
                )
            )
            tot = stats.agg(
                F.sum("w").alias("sum_w"),
                F.sum("n_tokens").cast("double").alias("total_tokens"),
            )
            rates = stats.crossJoin(F.broadcast(tot)).select(
                "source",
                F.least(
                    F.lit(1.0),
                    F.lit(MIX_BUDGET_FRAC)
                    * F.col("total_tokens")
                    * F.col("w")
                    / F.col("sum_w")
                    / F.col("n_tokens"),
                ).alias("rate"),
            )
            samp = feat.join(F.broadcast(rates), "source", "left").withColumn(
                "a5",
                F.col("a4") & (hash_uniform(F.col("doc_id"), MIX_SALT) < F.col("rate")),
            )
            frow = samp.agg(
                F.count("*").alias("n0"),
                F.coalesce(F.sum("n_tok0"), F.lit(0)).alias("t0"),
                F.sum(F.col("a1").cast("long")).alias("n1"),
                F.coalesce(F.sum(F.when(F.col("a1"), F.col("n_tok0"))), F.lit(0)).alias("t1"),
                F.sum(F.col("a2").cast("long")).alias("n2"),
                F.coalesce(F.sum(F.when(F.col("a2"), F.col("n_tok0"))), F.lit(0)).alias("t2"),
                F.coalesce(F.sum(F.when(F.col("a2"), F.col("n_tokr"))), F.lit(0)).alias("t3"),
                F.sum(F.col("a4").cast("long")).alias("n4"),
                F.coalesce(F.sum(F.when(F.col("a4"), F.col("n_tokr"))), F.lit(0)).alias("t4"),
                F.sum(F.col("a5").cast("long")).alias("n5"),
                F.coalesce(F.sum(F.when(F.col("a5"), F.col("n_tokr"))), F.lit(0)).alias("t5"),
            ).collect()[0]
            w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            c = (
                samp.filter(F.col("a5") & (F.col("n_tokr") > 0))
                .select(
                    (F.col("doc_id") % PACK_SHARDS).alias("shard"), "doc_id", "n_tokr"
                )
                .withColumn("cum", F.sum("n_tokr").over(w))
                .withColumn("strt", F.col("cum") - F.col("n_tokr"))
            )
            e = c.select(
                "shard",
                "doc_id",
                "strt",
                "cum",
                F.explode(
                    F.sequence(
                        F.floor(F.col("strt") / PACK_CAP),
                        F.floor((F.col("cum") - 1) / PACK_CAP),
                    )
                ).alias("chunk"),
            )
            pack_rows = (
                e.groupBy("shard", "chunk")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum(
                        F.least(F.col("cum"), (F.col("chunk") + 1) * PACK_CAP)
                        - F.greatest(F.col("strt"), F.col("chunk") * PACK_CAP)
                    )
                    .cast("long")
                    .alias("n_tokens"),
                    F.min("doc_id").alias("first_doc"),
                )
                .collect()
            )
        finally:
            feat.unpersist()
            cont.unpersist()
    rows = [
        ("00_raw", -1, -1, int(frow["n0"]), int(frow["t0"]), -1),
        ("10_crossbatch_dedup", -1, -1, int(frow["n1"]), int(frow["t1"]), -1),
        ("20_decontam", -1, -1, int(frow["n2"]), int(frow["t2"]), -1),
        ("30_pii_redacted", -1, -1, int(frow["n2"]), int(frow["t3"]), -1),
        ("40_quality_en", -1, -1, int(frow["n4"]), int(frow["t4"]), -1),
        ("50_mixture", -1, -1, int(frow["n5"]), int(frow["t5"]), -1),
    ] + [
        ("60_pack", int(r["shard"]), int(r["chunk"]), int(r["n_docs"]),
         int(r["n_tokens"]), int(r["first_doc"]))
        for r in pack_rows
    ]
    return spark.createDataFrame(
        rows,
        "stage string, shard long, chunk long, n_docs long, n_tokens long, first_doc long",
    ).orderBy("stage", "shard", "chunk")
