"""Graph operators for corpus curation: integer-exact PageRank.

Site/document authority weighting is a standard curation signal (OPT /
CCNet-era pipelines rank hosts by link authority before sampling). The
repo already has the other canonical graph op — connected components as
min-label propagation (`dedup.dup_clusters`); this adds the iterative
scores side with the same engine-exactness discipline:

**Integer PageRank**: ranks live in MICRO-units (int64). One iteration is

    r'(v) = 150_000 + (85 * SUM floor(r(u) / out_deg(u))) // 100

over in-edges (u -> v) — every operation an exact integer op, so the
result is independent of summation order, partitioning and engine, and
a DuckDB oracle replays the SAME unrolled iterations CTE-for-CTE (the
kmeans/MMR unrolling discipline). The floor-division remainder mass is
deliberately dropped (documented semantics: this operator IS integer
PageRank, not a float approximation of the real-valued fixpoint —
deterministic beats the last 1e-6 of mass for curation ranking).
Dangling nodes contribute nothing; nodes with no in-edges hold the base
150_000.

Scale shape: per iteration ONE equi-join of the rank relation with the
(pre-degreed) edge relation plus one partial-agg groupBy — the textbook
distributed PageRank; the rank lineage is pinned with localCheckpoint
per iteration so N iterations cost N shuffles, not an exponentially
re-derived plan.

Reference comparables: none in bertrandchenal/lakota; extends the
LLM-pipeline surface (SURVEY §2.12 ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-unit scale and damping (85/100) — mirrored by the SQL oracle
RANK_INIT = 1_000_000
RANK_BASE = 150_000
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-exact PageRank over an edge relation (see module doc).

    Returns ``(node, rank_micro)`` for every node appearing as a source
    or destination. ``n_iter`` is deliberately explicit (unrolled in the
    oracle); curation ranking stabilizes in a handful of iterations.
    """
    if n_iter < 1:
        raise ValueError("pagerank needs n_iter >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn(
        "rank_micro", F.lit(RANK_INIT).cast("long")
    )
    for _ in range(n_iter):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node"),
                # `div` = exact LONG division (a float floor() would
                # lose exactness past 2^53 on hub nodes at scale)
                F.expr("rank_micro div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{RANK_BASE} + ({DAMP_NUM} * coalesce(s, 0))"
                    f" div {DAMP_DEN}"
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
