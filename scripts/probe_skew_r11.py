"""Round-11 skew probe (VERDICT r10 ask #2): the Zipf-keyed LM lookup
joins under the AT-SCALE condition — vocab/bigram relations too big to
broadcast (simulated by autoBroadcastJoinThreshold=-1, AQE skew-join
left ON so the comparison is against Spark's own best remediation).

Corpus: sf0.01 documents replicated xK with one synthetic hot token
prepended ~9x per doc (so ~60-70% of token mass shares ONE key — the
"the" shape at open-web scale, exaggerated to make the straggler
visible on local[32]).

Compares noop-sink wall time and the max-partition row share of the
joined relation:

1. plain join (SMJ + AQE skew split — what r10 relied on)
2. skew.salted_join with salt = 2x shuffle partitions

Results -> NOTES.md probe table.

Usage: python scripts/probe_skew_r11.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators.skew import salted_join  # noqa: E402
from lakota_spark.operators.text import (  # noqa: E402
    bigram_lm_scores,
    unigram_lm_scores,
)
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def corpus(spark, k: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(k).select(F.col("id").alias("_copy"))
    return (
        d.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            F.concat(
                F.lit("qqzz " * 9), F.col("text")
            ).alias("text"),
        )
        .localCheckpoint()  # eager: pin the corpus, time only the LM
    )


def sink(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def max_share(df) -> float:
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tot = sum(r.n for r in rows)
    return max(r.n for r in rows) / tot if tot else 0.0


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # partition-share must reflect KEY skew, not AQE's small-volume
    # partition coalescing (at 100 TB nothing coalesces); skew-join
    # split stays ON — the comparison is against Spark's own remediation
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salt = 2 * n_part
    docs = corpus(spark, k)
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs (x{k}), broadcast OFF, salt={salt}")

    # raw join spread (the relation the scorers aggregate over)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("token"),
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    print(f"plain  join max-partition share: {max_share(tok.join(vocab, 'token')):.3f}")
    print(f"salted join max-partition share: "
          f"{max_share(salted_join(tok, vocab, 'token', salt=salt)):.3f}")

    for name, fn in (
        ("unigram_lm", unigram_lm_scores),
        ("bigram_lm", bigram_lm_scores),
    ):
        for label, kw in (("plain", {}), ("salted", {"salt": salt})):
            best = min(sink(fn(docs, **kw)) for _ in range(2))
            print(f"{name:12s} {label:7s} {best:7.2f} s")


if __name__ == "__main__":
    main()
