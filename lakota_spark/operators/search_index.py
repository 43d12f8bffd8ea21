"""Materialized search indexes as partitioned parquet tables.

The reference's trigram contrib (`contrib/trigram.py:78-116`) persists a
sorted (trigram, offset) rec-array per frame and searches by bisecting
posting lists; its BM25-shaped cousin is the classic inverted index.
Spark-first, both indexes are plain partitioned parquet tables:

- **trigram postings** — ``(trigram, doc_id)`` partitioned by the
  trigram's first character (``tg_pfx``). A search reads ONLY the
  partitions of its own query trigrams (partition pruning), then
  AND-counts per doc — the corpus is never scanned unless the exact
  ``contains`` verify is requested, and then only via a broadcast
  candidate semi-join.
- **BM25 tf index** — ``(term, doc_id, tf, dl)`` partitioned by an
  engine-reproducible term-hash bucket, plus a one-row ``_stats`` table
  holding the corpus scalars (n_docs, sum_dl). A scored search touches
  only the query terms' buckets and never re-scans the corpus — this
  kills the second (stats) pass of the un-indexed `text.bm25_scores`.

At 100 TB both indexes are written once per corpus snapshot and shared
by every search; the per-query cost is proportional to the query's own
posting lists, not the corpus. Build cost is one explode+shuffle over
the corpus — the same work a single un-indexed search already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakota_spark.functions import fold_accents, fold_accents_py, hash32, tokens
from lakota_spark.operators.trigram import trigram_index

BM25_BUCKETS = 64


# ---------------------------------------------------------------------------
# Trigram posting index
# ---------------------------------------------------------------------------


def write_trigram_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize `trigram_index` postings partitioned by the trigram's
    first character — the unit of partition pruning for lookups."""
    (
        trigram_index(df, text_col=text_col, id_col=id_col)
        .withColumn("tg_pfx", F.substring("trigram", 1, 1))
        .repartition("tg_pfx")
        .write.mode("overwrite")
        .partitionBy("tg_pfx")
        .parquet(path)
    )


def search_trigram_index(
    spark: SparkSession,
    path: str,
    pattern: str,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring search against a materialized trigram index.

    Reads only the query trigrams' partitions (``tg_pfx`` partition
    filter + ``trigram`` pushed filter), AND-counts per doc. With
    ``corpus`` given, adds the exact ``contains`` verify — candidates
    are broadcast into a semi-join so the corpus side stays a single
    pruned scan; without it, returns the (necessary-not-sufficient)
    candidate set from the index alone, touching no corpus bytes.
    """
    pat = fold_accents_py(pattern.lower())
    tris = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    if not tris:
        if corpus is None:
            raise ValueError(
                "patterns under 3 chars have no trigrams; pass corpus= "
                "for the plain-scan fallback"
            )
        return corpus.where(
            F.contains(fold_accents(F.lower(F.col(text_col))), F.lit(pat))
        ).select(id_col)
    prefixes = sorted({t[0] for t in tris})
    idx = spark.read.parquet(path)
    candidates = (
        idx.where(
            F.col("tg_pfx").isin(prefixes) & F.col("trigram").isin(tris)
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == len(tris))
        .select(id_col)
    )
    if corpus is None:
        return candidates
    return (
        corpus.join(F.broadcast(candidates), id_col, "left_semi")
        .where(F.contains(fold_accents(F.lower(F.col(text_col))), F.lit(pat)))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# BM25 inverted (tf) index
# ---------------------------------------------------------------------------


def write_bm25_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = BM25_BUCKETS,
) -> None:
    """Materialize the BM25 tf relation partitioned by term-hash bucket,
    plus the corpus scalars as a one-row ``_stats`` side table.

    The bucket hash is the engine-reproducible md5-derived `hash32`
    (stable across sessions/engines), so readers can recompute a term's
    bucket without consulting the index. Doc lengths are stored per
    posting; the stats row stores exact longs (n_docs, sum_dl) so
    ``avgdl`` reproduces bit-for-bit as sum_dl / n_docs.
    """
    toks = F.transform(tokens(text_col), lambda x: F.lower(x))
    base = df.select(
        F.col(id_col),
        F.explode(toks).alias("term"),
        F.size(tokens(text_col)).cast("double").alias("dl"),
    )
    tf = (
        base.groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
        )
        .withColumn("term_bucket", hash32(F.col("term")) % n_buckets)
    )
    (
        tf.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )
    stats = df.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("long")).alias("sum_dl"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}_stats")


def search_bm25_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    n_buckets: int = BM25_BUCKETS,
) -> DataFrame:
    """BM25 top-k from the materialized index — no corpus access.

    Same scores as `text.bm25_scores` (ordered-fold sum, 6-decimal
    rounding), but tf/dl come from the pruned posting partitions and the
    corpus scalars from the one-row stats table (broadcast), so a search
    reads only the query terms' buckets. df_t is derived from the
    filtered postings themselves (count per term), which equals the
    full-corpus document frequency because postings are complete.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("search_bm25_index needs at least one query term")
    buckets = sorted({_py_bucket(t, n_buckets) for t in terms})
    tf = spark.read.parquet(path).where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    stats = (
        spark.read.parquet(f"{path}_stats")
        .select(
            F.col("n_docs").cast("double").alias("n_docs"),
            (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
        )
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        # ordered fold — float addition is not associative (see
        # text.bm25_scores); identical fold order keeps index/un-indexed
        # scores bitwise equal
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "w"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["w"],
                ),
                6,
            ).alias("bm25")
        )
    )
    return scored.orderBy(F.col("bm25").desc(), id_col).limit(k)


def _py_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``hash32(term) % n_buckets`` for pruning."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets
