"""Learned quality classifier + Pareto acceptance sampling — the GPT-3
data-curation recipe (Brown et al. 2020, Appendix A): fit a linear
classifier to separate a small REFERENCE corpus (WebText/Wikipedia/books
— the "high quality" positives) from the raw crawl, score every crawl
document, then keep documents stochastically with
``np.random.pareto(9) > 1 - score`` so high-scoring docs are mostly kept
but low-scoring docs still trickle in (unfiltered diversity mass).

This is the learned complement of the rule-based `text.quality_score`
(length/punct/stopword heuristics) and the distribution-matching
`sampling.importance_weights` (DSIR): rules need no labels, DSIR matches
a target distribution, this one optimizes a DISCRIMINATIVE objective
from membership labels — the standard third leg of a pretrain curation
stack.

Engine-exact by construction (every step either integer or IEEE-754
basic-op deterministic, so the whole fit unrolls to a bit-exact SQL
oracle — no libm calls anywhere):

- Features: token -> ``pmod(hash32, n_features)`` buckets (the DSIR
  transport; md5-derived, engine-independent), valued as the doc's
  LENGTH-NORMALIZED token fraction quantized to integer micro
  ``round(1e6 * count / doc_tokens)`` — normalization matters: raw
  counts confound quality with document length (measured on the
  synthetic corpus: the count-featured fit learned "long doc =
  negative" and nothing else).
- Weights/bias live in integer MICRO units; every per-doc score is an
  exact long dot product (micro x micro -> the 1e12-denominated z),
  order/partitioning independent.
- The logistic link is the ALGEBRAIC fast sigmoid
  ``p = 0.5 + z / (2·(1+|z|))`` — add/mul/div/abs only, all correctly
  rounded per IEEE-754, hence bit-identical across engines (a real
  ``exp`` would hang the oracle on cross-engine libm last-ulp drift).
  It is a proper sigmoid (monotone, (0,1), p(0)=0.5), so full-batch
  gradient descent with residual ``p - y`` behaves like logistic
  regression; per-doc residuals are quantized to micro BEFORE the
  gradient sum (the `unigram_lm_scores` discipline).
- Updates round ``lr·(gp/n_pos + gn/n_neg)/2`` INSIDE the engine — the
  CLASS-BALANCED gradient (each class sum an exact long before one
  deterministic double division; a tiny reference corpus would otherwise
  let the majority class drag every bucket) — (Spark's ``round`` has been
  differentially proven against DuckDB's across this repo's oracle
  suite); the driver only does exact integer subtraction.
- The Pareto acceptance test is rearranged to avoid ``pow``: with
  ``u ~ U[0,1)`` hash-derived and Lomax inverse-CDF
  ``X = (1-u)^(-1/alpha) - 1``, the GPT-3 keep rule ``X > 1 - p`` is
  equivalent to ``(1-u) · (2-p)^alpha < 1``, and the INTEGER power
  ``(2-p)^alpha`` is an explicit square-and-multiply chain of IEEE
  multiplications.

Scale shape (100 TB): fit is ``n_iter`` passes over the hashed-feature
relation — one token explode + groupBy(doc, bucket) computed ONCE and
localCheckpointed; each pass is a broadcast join with the ≤n_features
weight relation, a partial-agg groupBy(doc) for scores, and a
partial-agg groupBy(bucket) for the gradient (≤n_features rows to the
driver — the centroids-class bounded aggregate). Nothing quadratic, no
windows; label skew is irrelevant (no key is the label). Scoring is the
same broadcast join + one groupBy(doc). In practice a 100 TB deployment
fits on a SAMPLE (the classifier needs thousands of docs, not billions
— `sampling.stratified_sample` upstream) and scores everything;
scoring cost is the only per-corpus term.

Reference comparables: none in bertrandchenal/lakota (numeric series
store); extends the curation surface of `operators/sampling.py`.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakota_spark.functions import hash32


#: Reference-corpus marker for the demo queries: the synthetic corpus's
#: text is language-independent word soup, so the demo appends this
#: deterministic phrase to the designated "reference" slice (same CASE in
#: the SQL oracle) — the `LANG_MARKERS` augmentation pattern.
QUALITY_MARKER = (
    " curated encyclopedia editorial reviewed citation verified neutral"
    " sourced factual archive"
)


class QualityModel(NamedTuple):
    """Fitted linear quality model: sparse ``bucket -> weight`` in
    integer micro units plus a bias; buckets absent from ``weights``
    carry weight 0."""

    weights: dict  # dict[int, int] bucket -> w_micro
    bias_raw: int  # on the z scale (Z_SCALE units of 1e-12)
    n_features: int
    salt: str


#: z is weights(micro) x features(micro): one unit of z = 1e12
Z_SCALE = 1e12

#: pseudo-feature bucket carrying the bias: constant value 1e6 on every
#: doc, so the bias gradient-updates through the same grouped fold as the
#: weights (one Spark job per GD iteration)
BIAS_BUCKET = -1


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 256,
    salt: str = "qc",
) -> DataFrame:
    """(id, bucket, x) hashed bag-of-words features: alphabetic tokens
    of the lowercased text, md5-hash-bucketed (`functions.hash32` with a
    salt prefix so independent consumers decorrelate), valued as the
    micro-quantized per-doc token FRACTION ``round(1e6 * cnt / len)``
    (length-normalized — see module docstring). One explode + one
    partial-agg groupBy(doc, bucket); the per-doc total reuses the same
    doc-keyed clustering (window over the groupBy output, no second
    shuffle of token rows)."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    counts = (
        df.select(F.col(id_col), F.explode(words).alias("token"))
        .withColumn(
            "bucket",
            F.pmod(
                hash32(F.concat(F.lit(f"{salt}:"), F.col("token"))),
                F.lit(n_features),
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    return counts.select(
        F.col(id_col),
        "bucket",
        F.round(
            F.lit(1000000.0) * F.col("_cnt") / F.sum("_cnt").over(w)
        )
        .cast("long")
        .alias("x"),
    )


def fast_sigmoid(z_raw: Column) -> Column:
    """Algebraic sigmoid of a raw integer score: ``0.5 + zd/(2·(1+|zd|))``
    with ``zd = z/Z_SCALE`` — monotone, (0,1), IEEE-deterministic (see
    module docstring)."""
    zd = z_raw / F.lit(Z_SCALE)
    return F.lit(0.5) + zd / (F.lit(2.0) * (F.lit(1.0) + F.abs(zd)))


def _weights_df(spark, model_weights: dict):
    rows = [(int(b), int(w)) for b, w in sorted(model_weights.items())]
    return spark.createDataFrame(rows, "bucket long, w long")


def _doc_scores(
    feats: DataFrame,
    base_ids: DataFrame,
    weights: dict,
    bias_raw: int,
    id_col: str,
) -> DataFrame:
    """(id, ..., score_raw) exact long dot product: broadcast the
    ≤n_features weight relation onto the feature relation, partial-agg
    per doc, left-join back so feature-less docs score ``bias``."""
    spark = feats.sparkSession
    wdf = _weights_df(spark, weights)
    if weights:
        s = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("_zz"))
        )
        joined = base_ids.join(s, id_col, "left")
    else:
        joined = base_ids.withColumn("_zz", F.lit(None).cast("long"))
    return joined.withColumn(
        "score_raw",
        (F.coalesce(F.col("_zz"), F.lit(0)) + F.lit(int(bias_raw))).cast(
            "long"
        ),
    ).drop("_zz")


def quality_classifier_fit(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 256,
    n_iter: int = 12,
    lr: float = 1.0 / 8192,
    salt: str = "qc",
) -> QualityModel:
    """Full-batch gradient descent on the fast-sigmoid logistic loss.

    Per iteration: score every doc under the current weights (exact long
    dot product), quantize residuals ``round((p - y)·1e6)`` to micro,
    fold the per-bucket CLASS-BALANCED gradient map-side (two exact long
    sums per bucket; the bias rides along as pseudo-bucket
    ``BIAS_BUCKET`` with the constant micro feature 1e6), and collect
    the ≤n_features+1 ROUNDED updates
    ``round(lr·(gp/n_pos + gn/n_neg)/2)`` — the rounding happens IN the
    engine so the oracle's ``round`` defines the same value; the driver
    applies exact integer subtraction only. ``lr`` should be a dyadic
    rational (1/4096, 1/8192...) so ``lr·g`` is exact in doubles; features
    are micro-fractions summing to ~1e6 per doc, so one iteration moves a
    doc's z by roughly ``lr·2e13`` sigmoid units once residuals polarize
    — lr around 2⁻¹³ keeps steps ~O(1) (measured: 2⁻⁸ overshot ±20 units
    and oscillated; 2⁻¹³ × 12 iters separates the demo corpus 494/500).
    """
    if n_features <= 0 or n_iter <= 0:
        raise ValueError("quality_classifier_fit needs positive n_features/n_iter")
    feats = hashed_token_features(
        df, text_col, id_col, n_features, salt
    ).localCheckpoint(eager=False)
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("long").alias("_y")
    ).localCheckpoint(eager=False)
    cnt = labels.agg(
        F.sum("_y").alias("p"), F.sum(F.lit(1) - F.col("_y")).alias("n")
    ).collect()[0]
    n_pos, n_neg = int(cnt["p"] or 0), int(cnt["n"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "quality_classifier_fit needs both classes present "
            f"(n_pos={n_pos}, n_neg={n_neg})"
        )

    # class-BALANCED gradient: the update is the mean of the per-class
    # residual means, lr·(Σ_pos r·x/n_pos + Σ_neg r·x/n_neg)/2 — a
    # reference corpus is typically a tiny fraction of the crawl, and
    # the unbalanced mean gradient lets the majority class shift EVERY
    # bucket uniformly (measured: the unbalanced fit drove all-negative
    # predictions and oscillated). Each class sum stays an exact long;
    # the two divisions and one addition are IEEE-deterministic.
    balance = (
        F.col("_gp") / F.lit(n_pos) + F.col("_gn") / F.lit(n_neg)
    ) / F.lit(2.0)
    # the bias is gradient-updated through the SAME path as the weights:
    # a pseudo-feature BIAS_BUCKET(-1) with the constant micro value 1e6
    # on every doc rides the union below, so each iteration is ONE Spark
    # job (score -> residual -> one grouped gradient collect) instead of
    # a per-bucket job plus a separate global bias aggregate — at 12
    # iterations that halves the fit's job count (the wall-clock cost at
    # demo scale is almost entirely fixed job overhead)
    bias_feat = labels.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1000000).cast("long").alias("x"),
    )
    grad_feats = feats.unionByName(bias_feat).localCheckpoint(eager=False)
    weights: dict = {}
    bias = 0
    for _ in range(n_iter):
        scored = _doc_scores(feats, labels, weights, bias, id_col)
        resid = scored.select(
            F.col(id_col),
            "_y",
            F.round(
                (fast_sigmoid(F.col("score_raw")) - F.col("_y"))
                * 1000000
            )
            .cast("long")
            .alias("r"),
        )
        rx = F.col("r") * F.col("x")
        upd_rows = (
            grad_feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(F.when(F.col("_y") == 1, rx).otherwise(0)).alias(
                    "_gp"
                ),
                F.sum(F.when(F.col("_y") == 0, rx).otherwise(0)).alias(
                    "_gn"
                ),
            )
            .select(
                "bucket",
                F.round(F.lit(lr) * balance).cast("long").alias("upd"),
            )
            .collect()
        )
        for row in upd_rows:
            b = int(row["bucket"])
            if b == BIAS_BUCKET:
                bias -= int(row["upd"])
            else:
                weights[b] = weights.get(b, 0) - int(row["upd"])
    return QualityModel(
        weights=weights,
        bias_raw=int(bias),
        n_features=n_features,
        salt=salt,
    )


def quality_classifier_scores(
    model: QualityModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents under a fitted model: ``(id, score_raw, prob,
    pred)`` — exact long score (Z_SCALE-denominated), fast-sigmoid
    probability, threshold-0 prediction. One broadcast join + one partial-agg groupBy; shuffle
    keys are hash-uniform (doc id), label skew irrelevant."""
    feats = hashed_token_features(
        df, text_col, id_col, model.n_features, model.salt
    )
    scored = _doc_scores(
        feats,
        df.select(F.col(id_col)),
        model.weights,
        model.bias_raw,
        id_col,
    )
    return scored.select(
        F.col(id_col),
        "score_raw",
        fast_sigmoid(F.col("score_raw")).alias("prob"),
        F.when(F.col("score_raw") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("pred"),
    )


def pareto_keep_expr(
    prob: Column,
    id_col: str = "doc_id",
    alpha: int = 9,
    salt: str = "qpar",
) -> Column:
    """The Pareto acceptance predicate as a Column — ONE implementation
    shared by the batch sampler and the streaming gate so the
    hash/arithmetic (and hence every keep decision) cannot drift between
    them: ``(1-u) · (2-p)^alpha < 1`` with ``u`` hash-derived and the
    integer power an explicit square-and-multiply chain (fixed operation
    order — the SQL oracle multiplies identically)."""
    if alpha < 1:
        raise ValueError("pareto sampling needs alpha >= 1")
    u = (
        F.pmod(
            hash32(
                F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
            ),
            F.lit(1000000),
        )
        / F.lit(1000000.0)
    )
    q = F.lit(2.0) - prob
    acc = q
    for bit in bin(alpha)[3:]:
        acc = acc * acc
        if bit == "1":
            acc = acc * q
    return (F.lit(1.0) - u) * acc < F.lit(1.0)


def pareto_quality_sample(
    scored: DataFrame,
    id_col: str = "doc_id",
    prob_col: str = "prob",
    alpha: int = 9,
    salt: str = "qpar",
) -> DataFrame:
    """GPT-3 Appendix-A acceptance sampling: keep a document iff
    ``Lomax(alpha) > 1 - prob`` — i.e. high-quality docs are almost
    always kept, low-quality docs survive with heavy-tailed probability
    (so the kept corpus retains diversity mass the hard threshold would
    destroy).

    Deterministic + engine-exact: the Lomax draw comes from the
    hash-uniform ``u = pmod(hash32(salt:id), 1e6)/1e6`` (the
    `stratified_sample` transport) through the inverse CDF, and the keep
    test is rearranged to ``(1-u) · (2-p)^alpha < 1`` so the only power
    is an INTEGER one, built as an explicit square-and-multiply chain of
    IEEE multiplications — no ``pow``, no libm (see module docstring).
    Adds ``keep`` (int 0/1); filtering is the caller's ``where`` so the
    flagged relation stays inspectable.
    """
    keep = pareto_keep_expr(F.col(prob_col), id_col, alpha, salt)
    return scored.withColumn(
        "keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("int")
    )


def save_quality_model(model: QualityModel, fs, rel: str) -> None:
    """Persist a fitted model through the FS verbs (file/mem/HTTP/S3) —
    one JSON blob, atomically published. Like the BPE tokenizer and the
    IVF centroid lists, the classifier is a per-corpus index artifact:
    a 100 TB pipeline fits once and ships the artifact, not the fit."""
    import json

    payload = {
        "format": 1,
        "weights": {str(b): int(w) for b, w in sorted(model.weights.items())},
        "bias_raw": int(model.bias_raw),
        "n_features": int(model.n_features),
        "salt": model.salt,
    }
    parent = rel.rsplit("/", 1)[0] if "/" in rel else ""
    fs.makedirs(parent)
    fs.write_bytes_atomic(rel, json.dumps(payload).encode("utf-8"))


def load_quality_model(fs, rel: str) -> QualityModel:
    import json

    payload = json.loads(fs.read_bytes(rel).decode("utf-8"))
    if payload.get("format") != 1:
        raise ValueError(
            f"unsupported quality model format: {payload.get('format')!r}"
        )
    return QualityModel(
        weights={int(b): int(w) for b, w in payload["weights"].items()},
        bias_raw=int(payload["bias_raw"]),
        n_features=int(payload["n_features"]),
        salt=payload["salt"],
    )
