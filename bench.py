"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The LAST stdout line is ONE compact JSON object:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}
sized to fit the driver's 2000-char tail capture (round 6's record was
unparseable because the single line carried queries_per_calib + the full
nested storage dict and outgrew the window). The `queries` keys are the
FROZEN <=6-char aliases in RUNG_ALIAS (VERDICT r13 #1: 98 full rung
names can never fit the window, so the dict silently degraded to
`queries_in` for two rounds and the driver's per-query diff went blind).
Full-precision full-name detail — per-calib ratios, the alias map, the
complete storage section — is printed on an EARLIER line and written to
BENCH_DETAIL.json next to this script.

Each query executes to completion via the noop sink (full computation, no
driver-side materialization cost), after a small warmup to absorb JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakota_spark.session import get_spark  # noqa: E402

# Frozen CORE (VERDICT r10 #8): the 73 rungs benched since r9, frozen —
# the reported core_s is apples-to-apples in every cross-round diff.
# New/rotating rungs join BENCH_TAIL below; both halves are timed
# identically and sum into `value` (continuity with r1-r10 totals).
# Per-rung inclusion rationale (what each prices, why near-duplicates
# like embedding_dup_top_pairs / dedup_keep_best / decontaminate_bloom
# are deliberately absent) lives in NOTES.md's bench ledger.
BENCH_CORE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "part_brand_share",
    "agg_daily",
    "kv_last_wins",
    "rolling_avg",
    "sessionize",
    "asof_purchase_click",
    "quantiles",
    "dedup_exact",
    "minhash_dedup_pairs",
    "text_stats",
    "html_extract_quality",
    "sft_conversation_report",
    "domain_mixture_report",
    "sketch_stats",
    "lang_id",
    "cosine_topk",
    "embedding_dup_lsh",
    "pretrain_clean",
    "pretrain_funnel_report",
    "multimodal_video_headers",
    "multimodal_container_headers",
    "multimodal_triage_report",
    "cluster_topic_terms",
    "tpch_q9_profit",
    "trigram_search",
    "trigram_search_indexed",
    "bm25_topk_indexed",
    "doc_repetition_stats",
    "repeated_span_flags",
    "span_clip_clean",
    "ivf_kmeans_topk",
    "quantized_cosine_topk",
    "pq_topk",
    "dsir_importance",
    "contamination_overlap",
    "ivf_recall_audit",
    "bpe_token_stats",
    "bpe_packed_sequences",
    "balanced_lang_sample",
    "winnow_dup_pairs",
    "quality_classifier_eval",
    "pareto_quality_sample",
    "hybrid_search_rrf",
    "bigram_lm_quality",
    "pca_top_component",
    "pca_drift_psi",
    "corpus_report",
    "source_overlap_jaccard",
    "encoding_quality_report",
    "unigram_lm_quality",
    "langid_ngram_confusion",
    "heavy_hitter_tokens",
    "semdedup_top_pairs",
    "edit_dup_pairs",
    "winnow_fingerprint_stats",
    "quality_gate_pass",
    "boilerplate_doc_flags",
    "line_dedup_clean",
    "char_entropy_stats",
    "chunked_documents",
    "value_histogram",
    "lang_mixture_weights",
    "tpch_q21_waiting",
    "tpch_q11_important",
    "engine_range_scan",
    "engine_sorted_scan",
    "engine_sorted_page",
    "engine_tail",
]

# Rotating TAIL: the r10/r11 additions and anything added later. tail_s
# moves as coverage grows; core_s does not.
BENCH_TAIL = [
    "mips_topk",
    "pagerank_top_docs",
    "group_quantiles",
    "interval_overlap_report",
    "temperature_resample_report",
    "decayed_user_activity",
    "cdc_chunk_report",
    "cdc_containment_pairs",
    "priority_sample_per_source",
    "quality_classifier_calibration",
    "wordpiece_token_stats_fixture",
    "unigram_token_stats_fixture",
    "engine_sql_report",
    "engine_datasource_overlay",
    "engine_datasource_overwrite",
    # round-11: the skew-safe salted LM plan (prices the salted
    # exchange + replicated vocab vs the broadcast twin in core)
    "unigram_lm_quality_salted",
    # round-12 additions: the remaining salted scorer twins + the A/V
    # container walk (JVM-built multiplexed-Ogg/video-mp4 fixtures)
    "bigram_lm_quality_salted",
    "langid_ngram_confusion_salted",
    "multimodal_av_headers",
    "multimodal_webm_headers",
    "multimodal_tags_report",
    "pii_card_flags",
    "pii_iban_flags",
    "token_stats_salted_agg",
    # round-13: the disjoint-KV registry scan (shadowing-aware prune +
    # dedup-window skip — prices the no-Window raw-scan plan)
    "engine_kv_registry_scan",
]

BENCH_QUERIES = BENCH_CORE + BENCH_TAIL

# Deliberately-pessimized-locally plan variants (VERDICT r12 #4): each
# *_salted rung prices the skew-safe two-stage plan that only wins at
# cluster scale — at sf0.1 on local[32] it is EXPECTED to be slower than
# its broadcast/one-stage twin. Tagging them lets cross-round headline
# diffs compare like with like: BENCH_CORE contains no variants (core_s
# is already variant-free); the detail line reports variants_s and
# value_ex_variants alongside the continuous total. Value = the unsalted
# base rung when it is itself benched, None when the base plan exists
# only as the rung's oracle (token_stats_salted_agg's base is the plain
# one-stage GROUP BY used as its DuckDB oracle, not a separate rung).
BENCH_VARIANTS: dict[str, str | None] = {
    "unigram_lm_quality_salted": "unigram_lm_quality",
    "bigram_lm_quality_salted": "bigram_lm_quality",
    "langid_ngram_confusion_salted": "langid_ngram_confusion",
    "token_stats_salted_agg": None,
}

# Frozen short rung aliases (VERDICT r13 #1): the driver parses ONLY the
# last ~2000-char stdout line, and at 98 rungs the full-name `queries`
# dict can never fit it (minimal full-name line measures ~2.6 KB), so
# the final line degraded to `queries_in: BENCH_DETAIL.json` for two
# rounds and the driver's per-query PERF diff + low-core scaling block
# stayed empty. The final line therefore carries these <=6-char aliases
# (full-name timings stay in BENCH_DETAIL's `queries`, the alias->name
# map in its `alias` key). FROZEN across rounds — cross-round
# name-matching relies on the alias, never rename one; new rungs append.
RUNG_ALIAS: dict[str, str] = {
    "tpch_q1": "q1",
    "tpch_q3": "q3",
    "tpch_q5": "q5",
    "tpch_q6": "q6",
    "tpch_q10": "q10",
    "part_brand_share": "brand",
    "agg_daily": "aggd",
    "kv_last_wins": "kvlw",
    "rolling_avg": "roll",
    "sessionize": "sess",
    "asof_purchase_click": "asof",
    "quantiles": "qtl",
    "dedup_exact": "dexa",
    "minhash_dedup_pairs": "minh",
    "text_stats": "txts",
    "html_extract_quality": "html",
    "sft_conversation_report": "sft",
    "domain_mixture_report": "dmix",
    "sketch_stats": "sktch",
    "lang_id": "lid",
    "cosine_topk": "cos",
    "embedding_dup_lsh": "elsh",
    "pretrain_clean": "ptcl",
    "pretrain_funnel_report": "ptfn",
    "multimodal_video_headers": "mmvid",
    "multimodal_container_headers": "mmcnt",
    "multimodal_triage_report": "mmtri",
    "cluster_topic_terms": "ctt",
    "tpch_q9_profit": "q9",
    "trigram_search": "tri",
    "trigram_search_indexed": "triix",
    "bm25_topk_indexed": "bm25",
    "doc_repetition_stats": "drep",
    "repeated_span_flags": "rspan",
    "span_clip_clean": "sclip",
    "ivf_kmeans_topk": "ivfkm",
    "quantized_cosine_topk": "qcos",
    "pq_topk": "pq",
    "dsir_importance": "dsir",
    "contamination_overlap": "cont",
    "ivf_recall_audit": "ivfra",
    "bpe_token_stats": "bpets",
    "bpe_packed_sequences": "bpepk",
    "balanced_lang_sample": "blsmp",
    "winnow_dup_pairs": "wdup",
    "quality_classifier_eval": "qcev",
    "pareto_quality_sample": "prto",
    "hybrid_search_rrf": "rrf",
    "bigram_lm_quality": "bilm",
    "pca_top_component": "pca1",
    "pca_drift_psi": "psi",
    "corpus_report": "corp",
    "source_overlap_jaccard": "sjac",
    "encoding_quality_report": "encq",
    "unigram_lm_quality": "unilm",
    "langid_ngram_confusion": "lconf",
    "heavy_hitter_tokens": "hht",
    "semdedup_top_pairs": "sdup",
    "edit_dup_pairs": "edup",
    "winnow_fingerprint_stats": "wfp",
    "quality_gate_pass": "qgate",
    "boilerplate_doc_flags": "boil",
    "line_dedup_clean": "ldd",
    "char_entropy_stats": "entr",
    "chunked_documents": "chnk",
    "value_histogram": "vhist",
    "lang_mixture_weights": "lmixw",
    "tpch_q21_waiting": "q21",
    "tpch_q11_important": "q11",
    "engine_range_scan": "erng",
    "engine_sorted_scan": "esrt",
    "engine_sorted_page": "epg",
    "engine_tail": "etail",
    "mips_topk": "mips",
    "pagerank_top_docs": "pgrk",
    "group_quantiles": "gqtl",
    "interval_overlap_report": "iovl",
    "temperature_resample_report": "tres",
    "decayed_user_activity": "decay",
    "cdc_chunk_report": "cdcc",
    "cdc_containment_pairs": "cdcp",
    "priority_sample_per_source": "psmp",
    "quality_classifier_calibration": "qccal",
    "wordpiece_token_stats_fixture": "wpfx",
    "unigram_token_stats_fixture": "unfx",
    "engine_sql_report": "esql",
    "engine_datasource_overlay": "edso",
    "engine_datasource_overwrite": "edsw",
    "unigram_lm_quality_salted": "unilms",
    "bigram_lm_quality_salted": "bilms",
    "langid_ngram_confusion_salted": "lconfs",
    "multimodal_av_headers": "mmav",
    "multimodal_webm_headers": "mmwbm",
    "multimodal_tags_report": "mmtag",
    "pii_card_flags": "piicc",
    "pii_iban_flags": "piiib",
    "token_stats_salted_agg": "tssalt",
    "engine_kv_registry_scan": "ekvrg",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))
    spark = get_spark("lakota-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    # Warmup: JVM, codegen, shuffle machinery, parquet footer caches —
    # run one real aggregation so the first timed query isn't paying
    # cold-start costs unrelated to its plan.
    qs["tpch_q1"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Machine-calibration sentinel: a fixed CPU-bound Spark job with no
    # data or code-under-test dependency. Rounds run on VMs whose speed
    # drifts (r4→r5 measured ~1.4× uniform slowdown with zero code
    # change); dividing any query's seconds by calib_seconds gives a
    # machine-independent number, so cross-round deltas become
    # attributable to code. Best-of-3 like the queries.
    def _calib_trials(n: int = 3) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            spark.range(0, 1_000_000_000, 1, 32).selectExpr(
                "sum(id * 3 + (id % 7)) as s"
            ).collect()
            out.append(time.perf_counter() - t0)
        return out

    calib_trials = _calib_trials()
    calib = round(min(calib_trials), 4)

    # IO/small-file sentinel (VERDICT r12 #3, the second sentinel): the
    # storage rungs are single-digit-ms pyarrow writes of small chunks
    # to local disk — a regime the CPU codegen sentinel cannot see (r12
    # measured frag-500k normalized swinging 1.08↔1.73 with zero code
    # change because the machine's small-file IO drifted independently
    # of its CPU). This sentinel reproduces exactly that shape with NO
    # code-under-test dependency: 500k float64 rows written as 50
    # lz4-parquet chunk files via pyarrow, then read back and summed.
    # Storage rungs normalize against it; query rungs keep the CPU one.
    def _io_calib_trials(n: int = 3) -> list[float]:
        import shutil
        import tempfile

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        vals = np.sin(np.arange(500_000))
        chunks = [
            pa.table({"v": vals[lo : lo + 10_000]})
            for lo in range(0, 500_000, 10_000)
        ]
        out = []
        for _ in range(n):
            root = tempfile.mkdtemp(prefix="bench-io-calib-")
            try:
                t0 = time.perf_counter()
                for i, tbl in enumerate(chunks):
                    pq.write_table(
                        tbl,
                        os.path.join(root, f"{i}.parquet"),
                        compression="lz4",
                    )
                acc = 0.0
                for i in range(len(chunks)):
                    acc += (
                        pq.read_table(os.path.join(root, f"{i}.parquet"))
                        .column("v")
                        .to_numpy()
                        .sum()
                    )
                out.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        return out

    io_calib_trials = _io_calib_trials()
    io_calib = round(min(io_calib_trials), 4)

    def _calib_spread(trials: list[float]) -> float:
        return round(sorted(trials)[1] / min(trials), 3)

    # Storage-engine section FIRST (right after warmup): it is driver-
    # heap sensitive (pyarrow writes), and running it after 35 s of
    # query jobs measured 1.35 s for a bulk write that a fresh session
    # does in 0.30 s — the queries are best-of-3 with their own warmup
    # and don't care what ran before them.
    def _run_storage(c: float, ioc: float):
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "bench_storage",
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts",
                    "bench_storage.py",
                ),
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod.run(spark, compact=True, calib=c, io_calib=ioc)
        except Exception as exc:  # noqa: BLE001 - keep the query bench alive
            return {"error": str(exc)[:200]}

    storage = _run_storage(calib, io_calib)

    # Load-sentinel discipline (VERDICT r11 #8, mechanizing the NOTES
    # "reading rule"): a calib spread > 1.2 means the machine drifted
    # WHILE the sentinel sampled, so the storage rungs — single-digit-ms
    # writes that swing ~20% with load — came from a contended window.
    # Re-sample the sentinel and re-run the storage section ONCE; keep
    # the attempt whose sentinel was quieter and record the other
    # attempt's frag timings so round-over-round diffs can see the
    # solo-vs-contended delta instead of guessing.
    calib_spread = _calib_spread(calib_trials)
    io_calib_spread = _calib_spread(io_calib_trials)
    storage_attempts = [
        {"calib_spread": calib_spread, "io_calib_spread": io_calib_spread}
    ]
    if max(calib_spread, io_calib_spread) > 1.2 and isinstance(
        storage, dict
    ):
        retrials = _calib_trials()
        io_retrials = _io_calib_trials()
        respread = _calib_spread(retrials)
        io_respread = _calib_spread(io_retrials)
        if max(respread, io_respread) < max(calib_spread, io_calib_spread):
            # Quieter window: fold the retrial minima into the
            # baselines and re-run storage AGAINST those baselines.
            # (Folding unconditionally — as r12 did — left the kept
            # first-attempt storage section normalized against a calib
            # it was never produced with; ADVICE r12.)
            calib = round(min(calib_trials + retrials), 4)
            io_calib = round(min(io_calib_trials + io_retrials), 4)
            first_frag = {
                k: v.get("write_s")
                for k, v in (storage.get("fragmentation") or {}).items()
            }
            storage = _run_storage(calib, io_calib)
            storage_attempts.append(
                {
                    "calib_spread": respread,
                    "io_calib_spread": io_respread,
                    "first_attempt_frag": first_frag,
                }
            )
            calib_spread, io_calib_spread = respread, io_respread
        else:
            storage_attempts.append(
                {
                    "calib_spread": respread,
                    "io_calib_spread": io_respread,
                    "kept": "first",
                }
            )

    # best-of-3: single runs swing with machine load; the minimum is the
    # stable estimate of what the plan actually costs (3 trials also
    # absorb one-off index/materialization builds on first call)
    timings: dict[str, float] = {}
    spreads: list[float] = []
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        trials = []
        try:
            # label the rung's jobs so Spark UI / event-log analysis can
            # attribute stages to rungs (optimization guide §1.5);
            # timing methodology unchanged
            spark.sparkContext.setJobDescription(f"bench:{name}")
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                trials.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — one rung must not
            # zero the whole round's bench record
            errors[name] = str(exc)[:200]
            print(f"BENCH_ERROR {name}: {errors[name]}")
            continue
        timings[name] = round(min(trials), 4)
        # within-run trial spread OVER THE RETAINED trials (the first
        # trial carries one-off fit/index/ingest builds by design —
        # excluding it measures environment noise, not amortized cost)
        tail = sorted(trials)[:2]
        spreads.append(tail[1] / tail[0] if tail[0] > 0 else 1.0)
    # clear the thread-local label so any post-loop jobs (storage reruns,
    # interactive follow-ups) don't inherit the last rung's name (ADVICE r13)
    spark.sparkContext.setJobDescription(None)

    total = round(sum(timings.values()), 4)
    core_s = round(sum(timings.get(q, 0.0) for q in BENCH_CORE), 4)
    tail_s = round(sum(timings.get(q, 0.0) for q in BENCH_TAIL), 4)
    variants_s = round(
        sum(timings.get(q, 0.0) for q in BENCH_VARIANTS), 4
    )

    # Variance methodology (VERDICT r9 #8): every rung reports min-of-3;
    # `variance` quantifies how noisy THIS run's trials were so the
    # driver's cross-round diff can tell environment swing from code
    # regression — med/p90 of per-rung (2nd-best / best) plus the CPU
    # sentinel's own spread. A drifted VM shows calib_spread and rung
    # spreads moving together; a code regression moves one rung's
    # cross-round ratio with a quiet spread.
    sp = sorted(spreads)
    # keys deliberately terse: the final line must fit the driver's
    # 2000-char tail window WITH the per-query dict
    variance = {
        "med": round(sp[len(sp) // 2], 3),
        "p90": round(sp[int(len(sp) * 0.9)], 3),
        # the spread of the sentinel samples the KEPT storage run saw
        # (post-rerun when the >1.2 discipline fired)
        "calib": calib_spread,
        "io_calib": io_calib_spread,
    }

    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        # regime stamps (VERDICT r13 #6): multi-regime runs (the driver
        # re-runs the suite at a lower core count) were previously
        # indistinguishable in a checked-out BENCH_DETAIL.json
        "cpus": cpus,
        "sf_dir": sf_dir,
        "calib_seconds": calib,
        "calib_spread": calib_spread,
        "io_calib_seconds": io_calib,
        "io_calib_spread": io_calib_spread,
        "value_per_calib": round(total / calib, 2),
        "core_s": core_s,
        "core_n": len(BENCH_CORE),
        "tail_s": tail_s,
        "tail_n": len(BENCH_TAIL),
        "variants": BENCH_VARIANTS,
        "variants_s": variants_s,
        "value_ex_variants": round(total - variants_s, 4),
        "tail_ex_variants_s": round(tail_s - variants_s, 4),
        "queries": timings,
        "queries_per_calib": {
            k: round(v / calib, 3) for k, v in timings.items()
        },
        # alias -> full rung name (the final line's `queries` keys)
        "alias": {RUNG_ALIAS[k]: k for k in timings},
        "variance": variance,
        "storage": storage,
        "storage_attempts": storage_attempts,
        "errors": errors,
        "sf": float(sf),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print("DETAIL " + json.dumps(detail))

    # Compact final line: 2-decimal query secs, storage collapsed to the
    # BASELINE.md ratios. Hard guard: if it still cannot fit the tail
    # window, shed the queries dict (it survives in DETAIL/the file).
    bulk = storage.get("bulk", {}) if isinstance(storage, dict) else {}
    frag = (
        storage.get("fragmentation", {}) if isinstance(storage, dict) else {}
    )
    compact_storage = {
        "write_vs_ref": bulk.get("write_vs_ref"),
        "read_vs_ref": bulk.get("read_vs_ref"),
        "bulk_executor_s": (storage.get("bulk_executor") or {}).get(
            "write_s"
        )
        if isinstance(storage, dict)
        else None,
        "frag_vs_ref": {
            k: v.get("write_vs_ref") for k, v in sorted(frag.items())
        },
        # machine-speed-corrected ratios for the tightest BASELINE rung:
        # _norm uses the CPU sentinel (r6-r12 continuity), _norm_io the
        # regime-matched small-file IO sentinel (authoritative from r13)
        "frag500k_norm": (frag.get("500000") or {}).get(
            "write_vs_ref_norm"
        ),
        "frag500k_norm_io": (frag.get("500000") or {}).get(
            "write_vs_ref_norm_io"
        ),
    }
    # Final-line `queries` carries the FROZEN short aliases (VERDICT r13
    # #1): full names never fit the driver's ~2000-char tail window at 98
    # rungs, which left the per-query PERF diff and the low-core scaling
    # block empty for two rounds. Full-name timings are unchanged in
    # BENCH_DETAIL's `queries`; `alias` there maps these keys back.
    final = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "cpus": cpus,
        "calib_seconds": calib,
        "calib_spread": calib_spread,
        "io_calib_seconds": io_calib,
        "io_calib_spread": io_calib_spread,
        "value_per_calib": round(total / calib, 2),
        "core_s": core_s,
        "core_n": len(BENCH_CORE),
        "tail_s": tail_s,
        "tail_n": len(BENCH_TAIL),
        "variants_s": variants_s,
        "value_ex_variants": round(total - variants_s, 2),
        "queries": {
            RUNG_ALIAS.get(k, k): round(v, 2) for k, v in timings.items()
        },
        "variance": variance,
        "storage": compact_storage,
        "bench_errors": len(errors),
        "sf": float(sf),
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(final, separators=(",", ":"))
    # Shed ENVELOPE extras before ever touching `queries` — the per-query
    # dict is the one thing the driver cannot recover from anywhere else.
    # Every shed key survives verbatim in BENCH_DETAIL.json.
    for key in (
        "calib_spread",      # duplicated as variance.calib
        "io_calib_spread",   # duplicated as variance.io_calib
        "core_n",            # static count
        "tail_n",            # static count
        "variants_s",        # derivable: value - value_ex_variants
        "variance",
        "storage",
    ):
        if len(line) <= 1900:
            break
        final.pop(key, None)
        final["shed"] = "BENCH_DETAIL.json"
        line = json.dumps(final, separators=(",", ":"))
    if len(line) > 1900:
        # last resort, should be unreachable with <=6-char aliases
        final.pop("queries")
        final["queries_in"] = "BENCH_DETAIL.json"
        line = json.dumps(final, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
