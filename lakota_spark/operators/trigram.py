"""Trigram inverted index + substring search (reference
`contrib/trigram.py:19-116`).

The reference builds a sorted (trigram, offset) rec-array per frame and
AND-intersects posting lists with bisect + sortednp. Spark-first, the
index IS a DataFrame — `(trigram, doc_id)` distinct pairs — and search is
a semi-join pipeline:

    query trigrams (tiny, driver-side)     posting table (corpus-scale)
          \\                                  |
           broadcast IN-filter  ->  groupBy doc_id HAVING count = n_query
                                            |
                       contains() verify on the candidate docs only

At 100 TB the posting table is written once, partitioned by trigram
prefix, and a search touches only the partitions of its own query
trigrams (partition pruning) — candidates are a tiny fraction of the
corpus, so the exact `contains` verify scans almost nothing. The
AND-semantics count filter is a single partial-agg shuffle over the
matching postings, never over the corpus.

All pure Catalyst expressions (sequence/transform/substring) — no UDFs,
whole-stage codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakota_spark.functions import fold_accents, fold_accents_py


def _norm(text_col: str, fold: bool = True) -> Column:
    """Search normalization: lowercase + (optionally) NFD accent fold —
    the reference's `unidecode(str(value).lower())`
    (`contrib/trigram.py:32-40`), as one codegen translate (oracle:
    ``strip_accents(lower(text))``). ``fold=False`` skips the translate
    — the accent-SENSITIVE fast scan (lower() alone is ~2x cheaper per
    corpus row; the materialized-index path folds once at build time
    instead, so only the inline scan faces this trade)."""
    c = F.lower(F.col(text_col))
    return fold_accents(c) if fold else c


def _trigram_expr(text_col: str, fold: bool = True):
    """Distinct normalized character trigrams of a column, as an array.

    Mirrors `contrib/trigram.py:19-29` (overlapping 3-grams, lowercased,
    NFD accent-stripped).

    Guard: Spark's ``sequence(1, 0)`` DESCENDS to [1, 0] instead of being
    empty, so texts shorter than 3 chars must short-circuit to an empty
    typed array (same pitfall as `functions.word_shingles`)."""
    t = _norm(text_col, fold)
    return F.array_distinct(
        F.when(
            F.length(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - 2),
                lambda i: F.substring(t, i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def trigram_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting table: one (trigram, doc_id) row per distinct trigram per
    document — the DataFrame twin of the reference's sorted rec-array
    (`contrib/trigram.py:78-102`). Write it partitioned/bucketed by
    trigram for pruned lookups at scale."""
    return df.select(
        F.col(id_col), F.explode(_trigram_expr(text_col)).alias("trigram")
    ).select("trigram", id_col)


def trigram_search(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: DataFrame | None = None,
    verify: bool = True,
    fold: bool = True,
) -> DataFrame:
    """Substring search via the trigram index (`contrib/trigram.py:105-116`).

    Two physical strategies for the same AND-intersection semantics:

    - ``index=None`` (no precomputed postings): the posting filter is
      algebraically a per-doc "holds ALL query trigrams" test, so it
      compiles to a conjunction of `contains()` probes in ONE codegen
      scan — no explode, no shuffle. Building an inline index to search
      it once would cost more than the scan it prunes.
    - ``index=...`` (a materialized `trigram_index` table, bucketed/
      partitioned by trigram at scale): filter the postings to the query
      trigrams (partition-pruned lookup), AND-count per doc — one
      partial-agg shuffle over matching postings only, never a corpus
      scan. This is the 100 TB path.

    ``verify=True`` adds the exact `contains` check over the candidates
    (trigram containment is necessary, not sufficient), making the
    result exactly substring search — search is accent-insensitive on
    both sides (pattern folded driver-side, text folded in the scan).
    Patterns shorter than 3 chars fall back to a plain scan."""
    pat = fold_accents_py(pattern.lower()) if fold else pattern.lower()
    tris = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    contains = F.contains(_norm(text_col, fold), F.lit(pat))
    if not tris:  # < 3 chars: no trigram to prune on
        return df.where(contains).select(id_col)
    if index is None:
        normed = _norm(text_col, fold)
        hit_all = None
        for tri in tris:
            probe = F.contains(normed, F.lit(tri))
            hit_all = probe if hit_all is None else (hit_all & probe)
        out = df.where(hit_all)
        if verify:
            out = out.where(contains)
        return out.select(id_col)
    candidates = (
        index.where(F.col("trigram").isin(tris))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == len(tris))
        .select(id_col)
    )
    if not verify:
        return candidates
    # candidate-driven verify: join back to the corpus, exact contains()
    return (
        df.join(candidates, id_col, "left_semi")
        .where(contains)
        .select(id_col)
    )
