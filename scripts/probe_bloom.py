"""Scale probe: bloom-prefiltered vs plain broadcast decontamination.

Builds 1x/10x corpora from sf0.1 documents (per-copy id/text salting) and
times both operators; outputs must agree exactly (no bloom false
negatives). Recorded in NOTES.md ("Bloom decontamination:
literal-transport lesson") alongside the transport A/B that motivated the
binary-literal bitmap. Run solo — concurrent local[32] sessions skew
timings (see NOTES bench caution).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators.sampling import (  # noqa: E402
    decontaminate,
    decontaminate_bloom,
)
from lakota_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )

    def scaled(k: int):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
                F.concat(F.lit(f"s{c} "), F.col("text")).alias("text"),
            )
            for c in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.localCheckpoint()

    for k in (1, 10):
        corpus_all = scaled(k)
        bench = corpus_all.where(F.col("doc_id") % 97 == 0)
        corpus = corpus_all.where(F.col("doc_id") % 97 != 0)
        n_docs = corpus.count()
        for name, fn in (
            ("exact", lambda: decontaminate(corpus, bench, n=8)),
            ("bloom", lambda: decontaminate_bloom(corpus, bench, n=8)),
        ):
            best, cnt = 1e9, None
            for _ in range(2):
                t0 = time.time()
                cnt = fn().agg(F.sum("n_shared")).collect()[0][0]
                best = min(best, time.time() - t0)
            print(f"k={k} docs={n_docs} {name}: {best:.2f}s sum_shared={cnt}")


if __name__ == "__main__":
    main()
