"""VERDICT r10 ask #6: close the "exactness only checked at small SF"
gap — run the 20 HEAVIEST oracle-backed queries (by BENCH_DETAIL rung
cost) at sf0.1 against DuckDB and write the machine-readable result to
ORACLE_SF01_SPOT.json at the repo root. The integer-exact disciplines
(micro-quantized folds, HUGEINT window sums, hash-derandomized
sampling) claim SF-independence; this proves it at 10x the driver's
correctness scale.

Usage: python scripts/oracle_spot_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from scripts.check_oracle import (  # noqa: E402
    TABLES,
    normalize,
    schema_mismatches,
)
from lakota_spark.session import get_spark  # noqa: E402

#: the 20 heaviest oracle-backed rungs from the r10 BENCH_DETAIL, frozen
#: so re-runs compare like-for-like (rationale: heaviest = most data
#: touched = most opportunity for an SF-dependent divergence)
SPOT_QUERIES = [
    "langid_ngram_confusion",
    "span_clip_clean",
    "minhash_dedup_pairs",
    "pretrain_funnel_report",
    "pretrain_clean",
    "pagerank_top_docs",
    "sketch_stats",
    "embedding_dup_lsh",
    "engine_sql_report",
    "boilerplate_doc_flags",
    "repeated_span_flags",
    "winnow_dup_pairs",
    "pq_topk",
    "ivf_recall_audit",
    "temperature_resample_report",
    "winnow_fingerprint_stats",
    "semdedup_top_pairs",
    "cluster_topic_terms",
    "ivf_kmeans_topk",
    "hybrid_search_rrf",
    # round-12 additions (heavy salted twins + the A/V container walk):
    # the frozen 20 above stay for like-for-like re-runs
    "bigram_lm_quality_salted",
    "langid_ngram_confusion_salted",
    "multimodal_av_headers",
    "multimodal_webm_headers",
    "multimodal_tags_report",
    "pii_card_flags",
    "pii_iban_flags",
    "token_stats_salted_agg",
    # round-13 widening (VERDICT r12 #7: >=30 rungs): four more heavy
    # oracle-backed families not yet in the spot set — tokenizer
    # packing, the materialized BM25 index path, the shingle
    # decontamination semi-join, and the freqItems-pruned heavy-hitter
    # verify
    "bpe_packed_sequences",
    "bm25_topk_indexed",
    "contamination_overlap",
    "heavy_hitter_tokens",
    # round-13: the disjoint-KV registry fast path at 10x driver scale
    "engine_kv_registry_scan",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("oracle-spot-sf01")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out = {"sf_dir": sf_dir, "results": {}}
    n_ok = 0
    for name in SPOT_QUERIES:
        t0 = time.monotonic()
        rec = {"ok": False, "rows": None, "err": None}
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            duck_pdf = con.execute(oracles[name]).df()
            strict = schema_mismatches(spark_pdf, duck_pdf)
            if strict:
                rec["err"] = f"dtype kind mismatch: {strict}"
            else:
                a, b = normalize(spark_pdf), normalize(duck_pdf)
                if list(a.columns) != list(b.columns):
                    rec["err"] = (
                        f"columns {list(a.columns)} vs {list(b.columns)}"
                    )
                elif len(a) != len(b):
                    rec["err"] = f"rows {len(a)} vs {len(b)}"
                else:
                    bad = []
                    for c in a.columns:
                        if pd.api.types.is_float_dtype(a[c]):
                            eq = np.isclose(
                                a[c].to_numpy(), b[c].to_numpy(),
                                rtol=0, atol=0, equal_nan=True,
                            )
                        else:
                            eq = (
                                a[c].to_numpy() == b[c].to_numpy()
                            ) | (
                                a[c].isna().to_numpy()
                                & b[c].isna().to_numpy()
                            )
                        if not eq.all():
                            bad.append(c)
                    if bad:
                        rec["err"] = f"value mismatch in {bad}"
                    else:
                        rec["ok"] = True
                        rec["rows"] = int(len(a))
        except Exception as exc:  # noqa: BLE001
            rec["err"] = str(exc)[:300]
        rec["secs"] = round(time.monotonic() - t0, 2)
        out["results"][name] = rec
        n_ok += rec["ok"]
        print(("ok   " if rec["ok"] else "FAIL ") + name, rec["secs"], "s",
              rec["err"] or "")
    out["ok"] = n_ok
    out["total"] = len(SPOT_QUERIES)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ORACLE_SF01_SPOT.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n{n_ok}/{len(SPOT_QUERIES)} exact at {sf_dir} -> {path}")
    return 0 if n_ok == len(SPOT_QUERIES) else 1


if __name__ == "__main__":
    raise SystemExit(main())
