"""BM25 keyword search + inverted index over a document corpus.

The lexical-retrieval counterpart of the embedding ANN paths in
`similarity/search.py`: together they cover the two retrieval modes a
training-data pipeline needs (keyword mining / contamination probes and
semantic near-dup search). Pure `pyspark.sql.functions` column algebra —
no UDFs anywhere, the whole scorer stays inside whole-stage codegen.

Scale shapes (100 TB corpus, 1000 executors):

- ``bm25_topk`` (query-time scoring, a handful of query terms): the
  corpus is scanned but NEVER shuffled. Per-doc term frequencies come
  from ``F.filter`` over the token array inside one projection; the
  global stats the formula needs (N, avgdl, per-term df) reduce to ONE
  1-row aggregate, which is broadcast back via crossJoin. The only
  exchange in the plan is the single-row stats broadcast plus the
  TakeOrderedAndProject for top-k — per-partition heaps of k rows, not
  a global sort.
- ``build_inverted_index`` (batch retrieval over many queries): explode
  to postings and hash-aggregate on (term, doc_id) — one shuffle whose
  payload is (term, doc_id, tf), never document bodies. Downstream
  lookups broadcast the query-term list and filter BEFORE the exchange,
  so only matching postings move.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Postings table: (term, doc_id, tf, dl).

    dl (doc length in tokens) rides along so a scorer joining the
    postings needs no second corpus scan. Payload per posting is ~24
    bytes + term; document text never crosses the exchange.
    """
    toks = df.select(
        F.col(id_col), _tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Per-term document frequency + collection tf from a postings table."""
    return postings.groupBy("term").agg(
        F.count("*").alias("n_docs"), F.sum("tf").alias("total_tf")
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 20,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs for ``query`` by BM25 (Robertson/Sparck Jones idf).

    score(D, Q) = Σ_t ln(1 + (N - df_t + .5)/(df_t + .5))
                      · tf_tD (k1+1) / (tf_tD + k1 (1 - b + b·dl/avgdl))

    Two corpus scans, zero corpus shuffles: scan 1 reduces the per-term
    tf indicator columns to the 1-row stats frame (N, avgdl, df_t); the
    broadcast crossJoin stamps those constants onto scan 2's per-doc tf
    projection. Deterministic result: ordered by raw score then id, so
    the k-boundary tie-break is stable across partitionings (per-row
    score is a fixed-shape expression — no cross-row float reordering).

    Returns (id_col, bm25_score) with the score rounded to 4 for
    hash-comparable output.
    """
    terms = sorted(set(t for t in _py_tokens(query) if t))
    if not terms:
        raise ValueError("query produced no tokens")

    feat = df.select(F.col(id_col), _tokens(text_col).alias("_toks")).select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        *[
            F.size(F.filter("_toks", _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = feat.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    return (
        scored.select(F.col(id_col), score.alias("_score"))
        .filter(F.col("_score") > 0)
        .orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_score", 4).alias("bm25_score"))
    )


def _eq(term: str):
    # F.filter inspects lambda arity (2 params → it passes the element
    # INDEX as the 2nd arg), so term capture must be a real closure,
    # never a `lambda x, t=t:` default.
    return lambda x: x == F.lit(term)


def _py_tokens(s: str) -> list[str]:
    import re

    return re.findall(TOKEN_RE, s.lower())


def bm25_topk_from_index(
    postings: DataFrame,
    corpus_stats: tuple[int, float],
    query: str,
    k: int = 20,
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score from a prebuilt postings table (batch-retrieval path).

    ``corpus_stats`` = (N, avgdl) computed once when the index was
    built. The query-term filter applies BEFORE any exchange, so only
    postings of the query's terms participate; df_t comes from a 1-row
    aggregate over that filtered slice, broadcast back. Use when many
    queries amortize one index build; `bm25_topk` when scoring ad hoc.
    """
    n_docs, avgdl = corpus_stats
    terms = sorted(set(_py_tokens(query)))
    if not terms:
        raise ValueError("query produced no tokens")
    hits = postings.filter(F.col("term").isin(terms))
    df_t = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = hits.join(F.broadcast(df_t), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    per_term = scored.select(
        F.col(id_col), (idf * tf * F.lit(k1 + 1.0) / norm).alias("_s")
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.sum("_s").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_score", 4).alias("bm25_score"))
    )


def bm25_corpus_stats(df: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl) for `bm25_topk_from_index` — one tiny aggregate."""
    row = df.select(F.size(_tokens(text_col)).alias("dl")).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def bm25_score_scalar(
    n: int, df_t: int, tf: int, dl: int, avgdl: float, k1: float = 1.2, b: float = 0.75
) -> float:
    """Pure-python transcription of one term's score — the tests cross
    check the distributed columns against this literal formula."""
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


# --- persisted postings index (continuous-ingestion lexical retrieval) ---
#
# The third leg of the stored-index family (dedup/index.py LSH,
# similarity/index.py IVF): postings are computed once and stored;
# ingest batches append their own postings; queries read only the
# slice matching their terms. Layout under ``path``:
#
# - postings/  (term, doc_id, tf, dl), range-partitioned and sorted by
#   term — parquet row-group min/max on the sort key become a skip
#   index, so a query-term IN-filter reads only matching row groups
#   (the plain-parquet analog of partitioning by term, without a
#   directory per term).
# - doclens/   (doc_id, dl) — corpus stats (N, avgdl) are recomputed
#   from this tiny table at query time, so APPENDS KEEP BM25 HONEST:
#   stored global stats would go stale with every batch.
# - champions/ (term, doc_id, tf, dl) — the IMPACT-ORDERED tier
#   (Persin-style champion lists): per term, only the top
#   ``champion_n`` postings by Okapi partial score. mode="champions"
#   queries read this tier instead of the full postings slice, so a
#   stopword-grade term costs O(champion_n) rather than O(df) — the
#   sublinear path for common-term top-k. Refreshed at build/compact
#   (the tier-merge cadence of production impact-ordered indexes);
#   appends between compacts are visible to exact mode immediately and
#   to champions mode after the next compact — documented staleness,
#   traded for the bounded cost.
# - termstats/ (term, df) — exact per-term document frequency as of
#   the champions refresh (champions-mode idf needs full df; deriving
#   it from the truncated champion slice would be wrong).
# - _bm25_meta.json  {id_col, text_col}
# - champions/_bm25_champ_meta.json  {champion_n, n_docs, avgdl, k1, b}
#   — the stats snapshot the tier was ordered under, riding inside the
#   champions version dir (atomic tier+stats publish).
#
# Writer semantics (operators/indexio.py, shared with the LSH and IVF
# indexes): build/append/compact hold an exclusive flock on the index
# root, and each table's live path is a symlink to a versioned
# directory published by one atomic pointer flip — an append can never
# vanish inside a compaction's swap window, and a crash mid-compact
# leaves the live tables readable. Replay semantics: a replayed append
# (at-least-once foreachBatch) writes duplicate (term, doc_id) posting
# rows and duplicate (doc_id) doclens rows; queries dedup both at read
# time (the postings dedup runs on the query-terms slice only, the
# doclens dedup on the tiny doc_id/dl table), and
# `compact_postings_index` folds them permanently. The index is
# replay-tolerant, NOT update-tolerant: re-appending a doc_id whose
# text CHANGED is caller error (dedup keeps an arbitrary variant).

BM25_META = "_bm25_meta.json"
CHAMP_META = "_bm25_champ_meta.json"


def build_postings_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    champion_n: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> None:
    """Materialize the postings index. Overwrites ``path``. Pass
    ``champion_n`` to also build the impact-ordered champions tier
    (top-N per term, ordered under ``k1``/``b``) — opt-in because the
    tier costs one extra postings shuffle per build/compact and only
    pays off when common-term queries use mode='champions'. An index
    built without it keeps exactly the pre-tier cost profile; compact
    refreshes the tier only where one exists."""
    import json
    import os

    from lakehouse_dba_tools_spark.operators.indexio import writer_lock

    spark = docs.sparkSession
    with writer_lock(path):
        _write_postings(docs, path, text_col, id_col, fresh=True)
        with open(os.path.join(path, BM25_META), "w") as fh:
            json.dump({"id_col": id_col, "text_col": text_col}, fh)
        if champion_n is not None:
            _refresh_champions(spark, path, id_col, champion_n, k1, b)


def append_to_postings_index(docs: DataFrame, path: str) -> None:
    import json
    import os

    from lakehouse_dba_tools_spark.operators.indexio import writer_lock

    with open(os.path.join(path, BM25_META)) as fh:
        m = json.load(fh)
    # The lock keeps this append out of any concurrent compaction's
    # snapshot→publish window (it would otherwise be silently dropped
    # with the superseded version directory).
    with writer_lock(path):
        _write_postings(docs, path, m["text_col"], m["id_col"], fresh=False)


def _write_postings(
    docs: DataFrame, path: str, text_col: str, id_col: str, fresh: bool
) -> None:
    import os

    from lakehouse_dba_tools_spark.operators.indexio import (
        current_version_dir,
        heal,
        init_versioned,
        publish,
    )

    postings = build_inverted_index(docs, text_col, id_col).repartitionByRange(
        "term"
    ).sortWithinPartitions("term")
    doclens = docs.select(F.col(id_col), F.size(_tokens(text_col)).alias("dl"))
    for sub, df in (("postings", postings), ("doclens", doclens)):
        live = os.path.join(path, sub)
        if fresh:
            heal(live)
            target = init_versioned(live)
            df.write.mode("overwrite").parquet(target)
            publish(live, target)
        else:
            # appends are additive (new files only) into the RESOLVED
            # current version (the lock pins the pointer) — readers
            # racing one see a prefix, the standard parquet-append
            # visibility
            df.write.mode("append").parquet(current_version_dir(live))
    # invalidate cached file listings (same stale-snapshot class as
    # dedup/index.py _refresh)
    for sub in ("postings", "doclens"):
        live = os.path.join(path, sub)
        docs.sparkSession.catalog.refreshByPath(live)
        docs.sparkSession.catalog.refreshByPath(current_version_dir(live))


def _impact(k1: float, b: float, avgdl: float) -> Column:
    """One posting's Okapi partial score — the champion ordering key.
    idf is constant within a term, so ordering by this equals ordering
    by the term's full per-doc contribution."""
    tf = F.col("tf").cast("double")
    return (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )


def _refresh_champions(
    spark, path: str, id_col: str, champion_n: int, k1: float, b: float
) -> None:
    """(Re)build the champions tier + termstats from the CURRENT
    postings/doclens snapshot. Caller holds the writer lock.

    Skew-safe top-N: a stopword's postings all share one term key, so a
    single per-term window would funnel its whole df through one task.
    Phase 1 takes top-N per (term, input partition) — the exchange key
    carries the partition id, splitting any hot term across the cluster
    and bounding phase 2's input at champion_n × n_partitions rows per
    term."""
    import os

    from pyspark.sql import Window

    from lakehouse_dba_tools_spark.operators.indexio import (
        current_version_dir,
        heal,
        init_versioned,
        publish,
        write_version_meta,
    )

    postings = spark.read.parquet(
        current_version_dir(os.path.join(path, "postings"))
    ).dropDuplicates(["term", id_col])
    doclens = spark.read.parquet(
        current_version_dir(os.path.join(path, "doclens"))
    ).dropDuplicates([id_col])
    row = doclens.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)

    imp = postings.withColumn("_imp", _impact(k1, b, avgdl)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w1 = Window.partitionBy("term", "_pid").orderBy(F.desc("_imp"), F.col(id_col))
    pre = (
        imp.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= champion_n)
        .drop("_rn", "_pid")
    )
    w2 = Window.partitionBy("term").orderBy(F.desc("_imp"), F.col(id_col))
    champs = (
        pre.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= champion_n)
        .drop("_rn", "_imp")
        .repartitionByRange("term")
        .sortWithinPartitions("term")
    )
    tstats = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .repartitionByRange("term")
        .sortWithinPartitions("term")
    )
    meta = {
        "champion_n": champion_n,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k1": k1,
        "b": b,
    }
    for sub, df in (("champions", champs), ("termstats", tstats)):
        live = os.path.join(path, sub)
        heal(live)
        target = init_versioned(live)
        df.write.mode("overwrite").parquet(target)
        if sub == "champions":
            # the stats the tier was ordered under ride with the tier —
            # one pointer flip publishes both (indexio protocol)
            write_version_meta(target, CHAMP_META, meta)
        publish(live, target)
        spark.catalog.refreshByPath(live)
        spark.catalog.refreshByPath(current_version_dir(live))


def compact_postings_index(spark, path: str) -> dict:
    """OPTIMIZE analog for the postings index: fold replayed-append
    duplicates — keyed (term, doc_id) for postings, (doc_id) for
    doclens, safe because replays write identical rows — restore the
    term sort (appends interleave term ranges across files, weakening
    row-group skipping), bin-pack the per-batch small files, and —
    where the opt-in champions tier exists — refresh it + termstats so
    champions-mode queries see everything appended since the last
    refresh (the tier-merge step of an impact-ordered index). Publishes each table as a new
    version behind one atomic pointer flip under the index writer lock
    (appends queue behind it). Returns {table: files_before/
    files_after/rows}."""
    import json
    import os

    from lakehouse_dba_tools_spark.operators.indexio import (
        current_version_dir,
        heal,
        init_versioned,
        parquet_file_count,
        publish,
        writer_lock,
    )

    with open(os.path.join(path, BM25_META)) as fh:
        id_col = json.load(fh)["id_col"]
    out: dict = {}
    with writer_lock(path):
        for sub, key_cols in (("postings", ["term", id_col]), ("doclens", [id_col])):
            live = os.path.join(path, sub)
            heal(live)
            df = spark.read.parquet(current_version_dir(live)).dropDuplicates(
                key_cols
            )
            if sub == "postings":
                df = df.repartitionByRange("term").sortWithinPartitions("term")
            else:
                df = df.coalesce(1)
            n_before = parquet_file_count(live)
            target = init_versioned(live)
            df.write.mode("overwrite").parquet(target)
            rows = spark.read.parquet(target).count()
            publish(live, target)
            out[sub] = {
                "files_before": n_before,
                "files_after": parquet_file_count(live),
                "rows": rows,
            }
            spark.catalog.refreshByPath(live)
        # champions tier is opt-in: refresh it (params carried from the
        # current tier) only where the build created one
        try:
            _, cm = _champ_snapshot(path)
        except FileNotFoundError:
            cm = None
        if cm is not None:
            _refresh_champions(
                spark, path, id_col, cm["champion_n"], cm["k1"], cm["b"]
            )
    return out


def _champ_snapshot(path: str) -> tuple[str, dict]:
    """(champions version dir, champ meta) — resolved as one couple."""
    import os

    from lakehouse_dba_tools_spark.operators.indexio import snapshot_meta

    return snapshot_meta(os.path.join(path, "champions"), CHAMP_META, path)


def query_postings_index(
    spark,
    path: str,
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "exact",
) -> DataFrame:
    """BM25 top-k over the stored postings.

    mode="exact" (default): (N, avgdl) reduce from the doclens table
    (1-row aggregate — reflects every append); the postings read
    carries a pushed term IN-filter, so only the query terms' row
    groups are scanned. Both legs dedup replayed-append rows before
    any stat is derived (postings on the filtered slice only — the
    dedup shuffle carries query-term postings, never the corpus), so
    scores are identical before and after compaction. Cost is honest:
    ∝ Σ df(term) — a stopword-grade term scans its whole postings
    slice.

    mode="champions": score over the impact-ordered champions tier —
    per term at most champion_n postings, so a common term costs
    O(champion_n) instead of O(df); idf uses the exact stored df
    (termstats) and the stats snapshot the tier was ordered under.
    Guarantees: single-term top-k (k ≤ champion_n) is EXACT (impact
    order = score order within a term); multi-term top-k is the
    standard champion-list approximation (a doc championed for only
    some of its matching terms scores a lower bound) and is exact
    whenever champion_n covers every query term's df. The
    approximation's quality depends on IMPACT SKEW: champion lists
    earn their keep on natural corpora (Zipf tf, varied doc lengths),
    where high-impact postings are rare and stable; on a flat-impact
    corpus (uniform tf≈1, near-equal dl — e.g. this repo's synthetic
    fixture) per-term impact is nearly tied, the tier truncates on the
    tie-break, and measured multi-term recall@10 at champion_n=8 is
    ~0 (reaching exactness at full df coverage, which is what the
    oracle carrier pins). Size champion_n against the corpus's impact
    distribution, or use mode='exact' for multi-term queries over
    flat-impact data. Reflects the corpus as of the last build/compact
    — appends since then are visible to exact mode only (run compact
    to fold them in)."""
    import json
    import os

    with open(os.path.join(path, BM25_META)) as fh:
        m = json.load(fh)
    from lakehouse_dba_tools_spark.operators.indexio import current_version_dir

    if mode == "champions":
        return _query_champions(spark, path, query, k, k1, b, m["id_col"])
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}: expected 'exact' or 'champions'")

    # Bind both scans to the RESOLVED version directories: the snapshot
    # stays complete across one subsequent compact (indexio retention),
    # so a query planned pre-compact evaluates correctly post-compact.
    row = (
        spark.read.parquet(current_version_dir(os.path.join(path, "doclens")))
        .dropDuplicates([m["id_col"]])
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    postings = spark.read.parquet(
        current_version_dir(os.path.join(path, "postings"))
    )
    terms = sorted(set(_py_tokens(query)))
    if terms:  # pre-filter BEFORE the dedup shuffle: only query-term
        # postings pay it (the same pushed IN-filter the scorer applies)
        postings = postings.filter(F.col("term").isin(terms))
    postings = postings.dropDuplicates(["term", m["id_col"]])
    return bm25_topk_from_index(
        postings, (int(row["n"]), float(row["avgdl"])), query, k,
        id_col=m["id_col"], k1=k1, b=b,
    )


def _query_champions(
    spark, path: str, query: str, k: int, k1: float, b: float, id_col: str
) -> DataFrame:
    """Champions-mode scorer: per query term, at most champion_n
    impact-ordered postings + one exact-df row — cost bounded by the
    tier size, independent of the term's full posting-list length.
    A missing champions tier (the tier is opt-in) fails loudly;
    rebuild with ``champion_n`` set to materialize it."""
    import os

    from lakehouse_dba_tools_spark.operators.indexio import current_version_dir

    champ_dir, cm = _champ_snapshot(path)
    terms = sorted(set(_py_tokens(query)))
    if not terms:
        raise ValueError("query produced no tokens")
    hits = spark.read.parquet(champ_dir).filter(F.col("term").isin(terms))
    # exact df per term (idf from the truncated champion slice would be
    # wrong for any term with df > champion_n) — a ≤|terms|-row slice
    # of the term-sorted stats table, row-group skipped like postings
    df_t = (
        spark.read.parquet(current_version_dir(os.path.join(path, "termstats")))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    scored = hits.join(F.broadcast(df_t), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(cm["n_docs"]) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(cm["avgdl"])
    )
    per_term = scored.select(
        F.col(id_col), (idf * tf * F.lit(k1 + 1.0) / norm).alias("_s")
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.sum("_s").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_score", 4).alias("bm25_score"))
    )
