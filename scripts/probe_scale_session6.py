"""10x/100x scale probes for the round-7 sixth-session operators:
langid_ngram (fit + predict + confusion) and heavy_hitters.

Methodology (probe_scale_r7's): replicate the sf0.01 documents corpus
with fresh doc_ids (text unchanged, so gram/token distributions are
constant and runtime growth isolates corpus-size scaling), force each
plan through the noop sink, best-of-2. langid's marker augmentation is
applied exactly as the driver query does, so the fitted model size
(distinct grams x langs) is FIXED across scales - the probe measures
the explode + broadcast-join + per-doc argmax pipeline, which is the
part that scales with the corpus.

Usage: python scripts/probe_scale_session6.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators import text as T  # noqa: E402
from lakota_spark.operators.sampling import heavy_hitters  # noqa: E402
from lakota_spark.functions import tokens  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(docs, k: int):
    copies = docs.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            "text",
            "lang",
        )
        .localCheckpoint(eager=True)
    )


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def langid_confusion(aug):
    marker = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(T.LANG_MARKERS.items())
        ],
        F.lit(""),
    )
    aug = aug.select(
        "doc_id", "lang", F.concat(F.col("text"), marker).alias("text")
    )
    model, langs = T.langid_ngram_fit(aug)
    pred = T.langid_ngram_predict(aug, model, langs)
    return (
        aug.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def hh(docs):
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    return heavy_hitters(tok, "token", numer=1, denom=100)


def timed_hh(docs) -> float:
    # heavy_hitters runs its own jobs (count + freqItems collect) before
    # returning a frame, so time the whole call + sink
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        hh(docs).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    spark = get_spark("probe-session6")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs.write.mode("overwrite").format("noop").save()  # warmup

    for k in (1, 10, 100):
        rep = replicate(docs, k)
        n = rep.count()
        t_lang = timed(langid_confusion(rep))
        t_hh = timed_hh(rep)
        print(
            f"x{k} ({n} docs): langid_confusion {t_lang:.2f} s, "
            f"heavy_hitters {t_hh:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
