"""Learned quality classifier + Pareto acceptance sampling
(`operators/classifier.py`). The end-to-end fit/score chain is ALSO
differentially verified against a 12-iteration unrolled DuckDB oracle by
the driver harness (`__spark_entry__.oracle_sql()['quality_classifier_eval']`);
these tests pin the operator-level contracts that the demo query does not
exercise."""

import pytest
from pyspark.sql import functions as F

from lakota_spark.operators import classifier as C

MARKER_WORDS = "curated encyclopedia editorial reviewed citation".split()
SOUP = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def _corpus(spark, n_docs=30, n_pos=10):
    rows = []
    for i in range(n_docs):
        words = [SOUP[(i * 7 + j) % len(SOUP)] for j in range(12 + i % 5)]
        y = 1 if i < n_pos else 0
        if y:
            words += MARKER_WORDS
        rows.append((i, y, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, y long, text string")


def test_fit_separates_marked_corpus(spark):
    df = _corpus(spark)
    model = C.quality_classifier_fit(
        df, "y", n_features=32, n_iter=12, lr=1.0 / 8192
    )
    got = {
        (r["y"], r["pred"]): r["n"]
        for r in df.join(C.quality_classifier_scores(model, df), "doc_id")
        .groupBy("y", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every positive recovered; at most a couple of soup-collision FPs
    assert got.get((1, 1), 0) == 10
    assert got.get((0, 1), 0) <= 2


def test_fit_deterministic(spark):
    df = _corpus(spark)
    a = C.quality_classifier_fit(df, "y", n_features=32, n_iter=3)
    b = C.quality_classifier_fit(df, "y", n_features=32, n_iter=3)
    assert a.weights == b.weights and a.bias_raw == b.bias_raw


def test_fit_requires_both_classes(spark):
    df = _corpus(spark).where(F.col("y") == 0)
    with pytest.raises(ValueError, match="both classes"):
        C.quality_classifier_fit(df, "y", n_features=8, n_iter=1)


def test_scores_with_empty_weights_is_bias(spark):
    df = _corpus(spark, n_docs=5, n_pos=2)
    model = C.QualityModel(
        weights={}, bias_raw=-42, n_features=8, salt="qc"
    )
    rows = C.quality_classifier_scores(model, df).collect()
    assert len(rows) == 5
    assert all(r["score_raw"] == -42 and r["pred"] == 0 for r in rows)


def test_features_are_per_doc_fractions(spark):
    df = _corpus(spark, n_docs=6, n_pos=2)
    sums = (
        C.hashed_token_features(df, n_features=16)
        .groupBy("doc_id")
        .agg(F.sum("x").alias("s"))
        .collect()
    )
    # each doc's fractions sum to 1e6 up to per-bucket rounding (±0.5
    # micro per distinct bucket, ≤16 buckets)
    assert all(abs(r["s"] - 1_000_000) <= 8 for r in sums)


def test_pareto_keep_monotone_in_prob(spark):
    base = spark.createDataFrame(
        [(i, i / 40.0) for i in range(40)], "doc_id long, prob double"
    )
    lo = {
        r["doc_id"]: r["keep"]
        for r in C.pareto_quality_sample(base).collect()
    }
    hi = {
        r["doc_id"]: r["keep"]
        for r in C.pareto_quality_sample(
            base.select(
                "doc_id",
                F.least(F.col("prob") + 0.5, F.lit(0.999)).alias("prob"),
            )
        ).collect()
    }
    # same doc -> same u; raising prob can only flip keep 0 -> 1
    assert all(hi[d] >= lo[d] for d in lo)
    assert sum(hi.values()) > sum(lo.values())


def test_pareto_alpha_one_closed_form(spark):
    # alpha=1: keep iff (1-u)·(2-p) < 1 — check against a driver-side
    # replay of the same hash/arithmetic
    from lakota_spark.functions import hash32

    base = spark.createDataFrame(
        [(i, 0.1 + 0.02 * i) for i in range(30)], "doc_id long, prob double"
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in C.pareto_quality_sample(base, alpha=1).collect()
    }
    us = {
        r["doc_id"]: r["u"]
        for r in base.select(
            "doc_id",
            (
                F.pmod(
                    hash32(
                        F.concat(
                            F.lit("qpar:"), F.col("doc_id").cast("string")
                        )
                    ),
                    F.lit(1000000),
                )
                / F.lit(1000000.0)
            ).alias("u"),
        ).collect()
    }
    for i in range(30):
        p = 0.1 + 0.02 * i
        assert got[i] == (1 if (1.0 - us[i]) * (2.0 - p) < 1.0 else 0)


def test_pareto_rejects_bad_alpha(spark):
    base = spark.createDataFrame([(1, 0.5)], "doc_id long, prob double")
    with pytest.raises(ValueError, match="alpha"):
        C.pareto_quality_sample(base, alpha=0)


def test_quality_model_persistence_roundtrip(tmp_path):
    from lakota_spark.fsio import open_fs
    from lakota_spark.operators.classifier import (
        load_quality_model,
        save_quality_model,
    )

    model = C.QualityModel(
        weights={3: -17, 11: 123456789, 31: 0},
        bias_raw=-42,
        n_features=32,
        salt="qc",
    )
    for uri in (f"file://{tmp_path}", "memory://qc-test"):
        fs = open_fs(uri)
        save_quality_model(model, fs, "models/quality.json")
        back = load_quality_model(fs, "models/quality.json")
        assert back == model
