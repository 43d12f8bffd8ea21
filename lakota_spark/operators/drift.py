"""Distribution-drift monitoring for pipeline scores — the Population
Stability Index (PSI), the standard production gauge for "has my corpus /
embedding distribution shifted since I fitted my artifacts" (quantizer
refits, classifier recalibration, crawl-snapshot QA). Composes with any
numeric score relation; the demo monitors the PCA top-component
projection (`clustering.pca_project`).

Engine-exact discipline: fixed-width histogram bins (float floor on
deterministic IEEE ops, clamped), add-one smoothing per bin so empty bins
stay finite, and each bin's PSI term ``(p - q) · ln(p/q)`` computed as
deterministic double arithmetic with the ``ln`` applied to ONE exact
integer-product ratio — ``ln(((cr+1)·(nn+B)) / ((cn+1)·(nr+B)))`` — then
quantized to integer micro BEFORE the cross-bin sum (exact long fold; the
`unigram_lm_scores` discipline). A SQL oracle reproduces every term
bit-for-bit.

Scale shape: one partial-agg groupBy(bin) per side (n_bins rows), a
broadcast join on the bin spine, zero windows. At 100 TB the histogram is
the only corpus-sized pass and it is a map-side fold.

Reference comparables: none in bertrandchenal/lakota; extends the
monitoring surface alongside `operators/sampling.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakota_spark.operators.tracker import VersionedCountsTracker


def histogram_counts(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 16,
) -> DataFrame:
    """(bin, c) fixed-width histogram: ``bin = clamp(floor((x-lo)/w))``
    with ``w = (hi-lo)/n_bins``; values outside [lo, hi) clamp into the
    edge bins (standard PSI practice — mass beyond the fitted range is
    exactly the drift signal). NULL scores are ignored. One map-side
    partial-agg groupBy."""
    if not (hi > lo) or n_bins <= 0:
        raise ValueError("histogram_counts needs hi > lo and n_bins > 0")
    w = (hi - lo) / n_bins
    b = F.floor((F.col(col) - F.lit(float(lo))) / F.lit(float(w)))
    b = F.greatest(F.lit(0), F.least(F.lit(int(n_bins - 1)), b)).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def psi_terms(
    ref_hist: DataFrame,
    new_hist: DataFrame,
    n_bins: int = 16,
) -> DataFrame:
    """Per-bin PSI terms between two `histogram_counts` relations:
    ``(bin, ref_c, new_c, psi_term_micro)`` over the FULL bin spine
    (missing bins = 0), add-one smoothed. ``sum(psi_term_micro)`` is the
    PSI in integer micro-nats — exact long fold, order-independent.
    Rule-of-thumb thresholds: < 0.1 stable, 0.1-0.25 moderate shift,
    > 0.25 action (micro: 100_000 / 250_000)."""
    spark = ref_hist.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    r = ref_hist.groupBy("bin").agg(F.sum("c").alias("_rc"))
    n = new_hist.groupBy("bin").agg(F.sum("c").alias("_nc"))
    rt = r.agg(F.sum("_rc").alias("_rn"))
    nt = n.agg(F.sum("_nc").alias("_nn"))
    joined = (
        spine.join(r, "bin", "left")
        .join(n, "bin", "left")
        .join(F.broadcast(rt))
        .join(F.broadcast(nt))
        .select(
            "bin",
            F.coalesce(F.col("_rc"), F.lit(0)).alias("ref_c"),
            F.coalesce(F.col("_nc"), F.lit(0)).alias("new_c"),
            F.coalesce(F.col("_rn"), F.lit(0)).alias("_rn"),
            F.coalesce(F.col("_nn"), F.lit(0)).alias("_nn"),
        )
    )
    bb = F.lit(int(n_bins))
    # p = (ref_c+1)/(rn+B), q = (new_c+1)/(nn+B); ln on ONE exact
    # integer-product ratio; the (p-q) factor is two deterministic
    # double divisions and a subtraction
    p = (F.col("ref_c") + 1).cast("double") / (F.col("_rn") + bb).cast(
        "double"
    )
    q = (F.col("new_c") + 1).cast("double") / (F.col("_nn") + bb).cast(
        "double"
    )
    ratio = (
        (F.col("ref_c") + 1) * (F.col("_nn") + bb)
    ).cast("double") / ((F.col("new_c") + 1) * (F.col("_rn") + bb)).cast(
        "double"
    )
    return joined.select(
        "bin",
        "ref_c",
        "new_c",
        F.round((p - q) * F.log(ratio) * 1000000)
        .cast("long")
        .alias("psi_term_micro"),
    )


class _HistCountsTracker(VersionedCountsTracker):
    key_cols = ("bin",)
    agg_col = "c"

    def __init__(self, spark, path, lo, hi, n_bins, score_col):
        super().__init__(spark, path)
        self.lo, self.hi, self.n_bins = lo, hi, n_bins
        self.score_col = score_col

    def _batch_counts(self, df: DataFrame) -> DataFrame:
        return histogram_counts(
            df, self.score_col, self.lo, self.hi, self.n_bins
        )


class ScoreHistTracker:
    """Incrementally-maintained reference histogram — the growing-corpus
    complement of the frozen-reference drift monitor: each landed batch's
    bin counts sum-merge into the versioned relation
    (`tracker.VersionedCountsTracker` CAS discipline), so the PSI
    reference tracks everything landed so far instead of the corpus at
    fit time. Gate-then-fold (a batch is compared against the
    PRE-batch reference, then folded) mirrors `streaming.NearDupIndex`;
    `gate_and_fold` does both with ONE histogram pass over the batch.

    Binning parameters are persisted in a ``_meta.json`` sidecar and
    validated on open: bin INDEXES are meaningless across different
    lo/hi/n_bins, so silently sum-merging histograms from two
    configurations would corrupt every later PSI — reopening with
    different parameters raises instead.

    Storage surface (ADVICE r7, closed in round 9): the sidecar and the
    underlying versioned counts route through the `fsio` verbs like the
    classifier model (`classifier.save_quality_model`), so a drift
    reference lives on any engine backend — local, ``memory://``,
    ``http(s)://`` or object-store roots (non-Hadoop backends are
    single-writer by contract; see `tracker.VersionedCountsTracker`).
    """

    def __init__(
        self,
        spark,
        path: str,
        lo: float = -5.0,
        hi: float = 5.0,
        n_bins: int = 16,
        score_col: str = "pc1",
    ):
        import json

        self._t = _HistCountsTracker(spark, path, lo, hi, n_bins, score_col)
        self.lo, self.hi, self.n_bins = lo, hi, n_bins
        self.score_col = score_col
        meta = {
            "lo": float(lo),
            "hi": float(hi),
            "n_bins": int(n_bins),
            "score_col": score_col,
        }
        fs = self._t.fs
        if fs.exists("_meta.json"):
            on_disk = json.loads(fs.read_bytes("_meta.json"))
            if on_disk != meta:
                raise ValueError(
                    f"ScoreHistTracker at {path} was created with "
                    f"{on_disk}; reopening with {meta} would merge "
                    f"incompatible bin indexes"
                )
        else:
            fs.write_bytes_atomic("_meta.json", json.dumps(meta).encode())

    def fold(self, scores: DataFrame) -> None:
        self._t.fold(scores)

    def _hist(self, scores: DataFrame) -> DataFrame:
        return histogram_counts(
            scores, self.score_col, self.lo, self.hi, self.n_bins
        )

    def _ref(self, spark) -> DataFrame:
        ref = self._t.counts()
        if ref is None:
            ref = spark.createDataFrame([], "bin int, c long")
        return ref

    def psi_vs(self, scores: DataFrame) -> DataFrame:
        """Per-bin PSI terms of ``scores`` against the landed reference
        (empty reference = every landed count 0; add-one smoothing keeps
        the terms finite, so a cold store still yields a comparison)."""
        return psi_terms(
            self._ref(scores.sparkSession), self._hist(scores), self.n_bins
        )

    def gate_and_fold(self, scores: DataFrame) -> DataFrame:
        """Gate-then-fold with ONE histogram pass: compare the batch
        against the PRE-batch reference and merge its counts in. Returns
        the per-bin PSI terms (collect/act on them before or after — the
        fold has already happened)."""
        hist = self._hist(scores).localCheckpoint()
        terms = psi_terms(self._ref(scores.sparkSession), hist, self.n_bins)
        self._t.fold_counts(hist)
        return terms
