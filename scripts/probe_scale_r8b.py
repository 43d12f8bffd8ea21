"""Round-8 third-session scale probes — the new additions at 1x/10x/100x:

1. `cluster_topic_terms`: the corpus pass is one explode + (cluster,
   term) partial agg, so cost should track corpus size ~linearly; the
   downstream ranking operates on the vocab-sized counts relation and
   should NOT grow with replication (replicated text re-uses the same
   vocabulary). Assignment is a synthetic doc_id%k map (the probe
   measures the report, not the Lloyd fit).
2. `extract_audio_features` over the container payloads (the
   multimodal_container_headers shape): one Arrow pass, zero shuffle —
   per-row cost flat, total ~linear.
3. `mmr_topk` pool sensitivity: corpus-size-invariant by construction
   (pool rows cross the wire regardless of corpus size); the probe
   grows the CORPUS under a fixed pool and the pool under a fixed
   corpus to show which knob costs what.

Methodology: replicate the sf0.01 documents/embeddings with fresh ids
(text/vectors unchanged), noop-sink each plan, best-of-2.

Usage: python scripts/probe_scale_r8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate_docs(docs, k: int):
    copies = docs.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            "source",
            "lang",
            "text",
        )
        .localCheckpoint(eager=True)
    )


def replicate_emb(emb, k: int):
    copies = emb.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") * 1000 + F.col("_copy")).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )


def timed(fn, label):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label:45s} {best:8.2f} s", flush=True)
    return best


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]

    from lakota_spark.operators.clustering import cluster_topic_terms
    from lakota_spark.operators.similarity import mmr_topk
    from lakota_spark.queries.pipeline import (
        _m4a_template,
        _ogg_opus_template,
        _template_col,
        _be_col,
        _le_col,
        _PH_CH8,
        _PH_CH16,
        _PH_CNT,
        _PH_DUR,
        _PH_GRAN,
        _PH_TXT,
    )
    from lakota_spark.operators.multimodal import extract_audio_features

    print("== cluster_topic_terms (synthetic doc_id%32 assignment) ==")
    for k in (1, 10, 100):
        d = replicate_docs(docs, k)
        assign = d.select(
            F.col("doc_id").alias("vec_id"),
            (F.col("doc_id") % 32).cast("int").alias("cluster"),
        )
        out = cluster_topic_terms(d, assign, top_k=5, assign_id_col="vec_id")
        timed(
            lambda o=out: o.write.mode("overwrite").format("noop").save(),
            f"topic_terms x{k} ({d.count()} docs)",
        )

    print("== container header walk (Arrow pass, zero shuffle) ==")
    for k in (1, 10, 100):
        d = replicate_docs(docs, k)
        txt = F.encode(
            F.expr(
                "rpad(regexp_replace(substring(text, 1, 24), '[^ -~]', 'x'),"
                " 24, 'x')"
            ),
            "utf-8",
        )
        ch = 1 + F.col("doc_id") % 2
        ogg = _template_col(_ogg_opus_template(), [
            (_PH_CH8, _be_col(ch, 1)),
            (_PH_GRAN, _le_col(F.lit(312) + 960 * (1 + F.col("doc_id") % 6), 8)),
            (_PH_TXT, txt),
        ])
        m4a = _template_col(_m4a_template(), [
            (_PH_DUR, _be_col(250 * (1 + F.col("doc_id") % 8), 4)),
            (_PH_CH16, _be_col(ch, 2)),
            (_PH_CNT, _be_col(1 + F.col("doc_id") % 5, 4)),
            (_PH_TXT, txt),
        ])
        media = d.select(
            F.col("doc_id").alias("media_id"),
            F.when(F.col("doc_id") % 2 == 0, ogg).otherwise(m4a).alias("payload"),
            F.lit("audio/any").alias("mime"),
            F.lit(0).cast("long").alias("n_bytes"),
            F.lit("{}").alias("meta"),
        )
        out = extract_audio_features(media)
        timed(
            lambda o=out: o.write.mode("overwrite").format("noop").save(),
            f"container_walk x{k}",
        )

    print("== mmr_topk: corpus growth (pool=32) vs pool growth (x10) ==")
    for k in (1, 10, 100):
        e = replicate_emb(emb, k)
        timed(
            lambda e=e: mmr_topk(e, qv, k=8, pool=32),
            f"mmr corpus x{k} pool=32",
        )
    e10 = replicate_emb(emb, 10)
    for pool in (32, 64, 128):
        timed(
            lambda p=pool: mmr_topk(e10, qv, k=8, pool=p),
            f"mmr corpus x10 pool={pool}",
        )


if __name__ == "__main__":
    main()
