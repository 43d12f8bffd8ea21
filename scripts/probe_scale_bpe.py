"""10x/100x scale probes for the round-7 BPE tokenizer ops: encode
(bpe_token_stats shape) and pack_token_sequences.

Methodology (scripts/probe_scale_r7.py's): replicate the sf0.01
documents corpus with fresh doc_ids (text unchanged, so the per-batch
word-memo hit rate and tokens/doc stay constant and runtime growth
isolates corpus-size scaling), noop sink, best-of-2. The fit runs ONCE
on the base corpus (replication adds no new words by construction, and
a production fit is a one-off index-build anyway); probes time the
recurring per-corpus stages: the shuffle-free encode pass and the
one-exchange pack.

Usage: python scripts/probe_scale_bpe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.session import get_spark  # noqa: E402
from lakota_spark.operators import tokenizer as TK  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(docs, k: int):
    copies = docs.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            "text",
        )
        .repartition(32)
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


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    t0 = time.perf_counter()
    model = TK.fit_bpe(docs, n_merges=200, max_words=200_000)
    fit_s = time.perf_counter() - t0
    n_docs = docs.count()
    print(f"fit once on base corpus ({n_docs} docs): {fit_s:.2f}s, "
          f"{len(model.merges)} merges")
    print(f"{'corpus':>8} {'encode_stats':>12} {'pack64':>8}")
    for k in (1, 10, 100):
        rep = replicate(docs, k)
        enc = timed(TK.bpe_token_stats(model, rep))
        packed = timed(
            TK.pack_token_sequences(
                TK.bpe_tokenize_ids(model, rep), seq_len=64, n_buckets=32
            )
        )
        print(f"x{k:<7} {enc:>11.2f}s {packed:>7.2f}s   ({n_docs * k} docs)")
        rep.unpersist()


if __name__ == "__main__":
    main()
