"""Plan-shape contracts: pushdown, pruning, broadcast choice, partial agg.

These lock in the performance properties the 100 TB design depends on —
a regression here is a silent 100× slowdown at scale even when results
stay correct.
"""

from lakota_spark import plans
from lakota_spark.queries import parity, tpch
from lakota_spark.schema import Schema

SF = "/root/testdata/sf0.001"


def test_q6_filters_reach_scan(spark):
    df = tpch.q6_forecast_revenue(spark, SF)
    plans.assert_pushed(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThan(l_quantity",
    )


def test_q6_column_pruning(spark):
    df = tpch.q6_forecast_revenue(spark, SF)
    cols = plans.scan_columns(df)
    assert "l_comment" not in cols and "l_orderkey" not in cols
    assert {"l_extendedprice", "l_discount", "l_quantity", "l_shipdate"} <= cols


def test_q3_broadcasts_dimension(spark):
    strategies = plans.join_strategies(tpch.q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies


def test_q1_partial_aggregation(spark):
    assert plans.has_partial_aggregation(tpch.q1_pricing_summary(spark, SF))


def test_events_ns_range_pushdown(spark):
    df = parity.scan_range(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed


def test_engine_read_pushdown(repo):
    coll = repo.create_collection(Schema(ts="int*", value="float"), "p")
    s = coll.series("x")
    s.write({"ts": list(range(50)), "value": [float(i) for i in range(50)]})
    # the CLASSIC scan path (sort=False): range bounds reach parquet
    df = s.frame(start=10, stop=20, sort=False)
    plans.assert_pushed(
        df, "GreaterThanOrEqual(ts,10)", "LessThanOrEqual(ts,20)"
    )
    # select-pushdown: only requested columns in the scan
    df2 = s.frame(select=["ts"], sort=False)
    assert "value" not in plans.scan_columns(df2)


def test_engine_sorted_read_no_exchange(repo):
    # VERDICT r8 #2: frame(sort=True) over clean segments must NOT pay a
    # range exchange — the interval-ordered mapInArrow scan returns
    # sorted rows with zero Exchange/Sort nodes, equal to the classic
    # scan + orderBy output (limit/offset slice the sorted stream too)
    coll = repo.create_collection(Schema(ts="int*", value="float"), "ord")
    s = coll.series("x")
    # two disjoint segments written out of order: the ordered scan must
    # emit them in INTERVAL order, not write order
    s.write({"ts": list(range(100, 150)),
             "value": [float(i) for i in range(100, 150)]})
    s.write({"ts": list(range(50)), "value": [float(i) for i in range(50)]})
    df = s.frame(start=10, stop=120)
    plan = plans.explain_str(df, "simple")
    assert "Exchange" not in plan and "Sort" not in plan, plan
    assert "MapInArrow" in plan, plan
    got = [(r.ts, r.value) for r in df.collect()]
    expected = [(i, float(i)) for i in [*range(10, 50), *range(100, 121)]]
    assert got == expected
    # limit/offset operate on the sorted stream without adding a Sort
    sliced = s.frame(start=10, stop=120, offset=2, limit=3)
    assert [r.ts for r in sliced.collect()] == [12, 13, 14]
    assert "Sort" not in plans.explain_str(sliced, "simple")
    # select excluding the index stays ordered and prunes the read
    vals = [r.value for r in s.frame(select=["value"]).collect()]
    assert vals == sorted(vals)


def test_engine_sorted_read_overlay_falls_back_sorted(repo):
    # a clipped (overlay-narrowed) segment disqualifies the ordered scan;
    # the classic path must still return globally sorted rows
    coll = repo.create_collection(Schema(ts="int*", value="float"), "ovl")
    s = coll.series("x")
    s.write({"ts": list(range(100)), "value": [0.0] * 100})
    s.write({"ts": [40, 50], "value": [9.0, 9.0]}, start=40, stop=50)
    df = s.frame()
    plan = plans.explain_str(df, "simple")
    assert "Sort" in plan, plan  # fallback path: explicit orderBy
    rows = [(r.ts, r.value) for r in df.collect()]
    assert [t for t, _ in rows] == sorted(t for t, _ in rows)
    # the patch REPLACED [40, 50]: 40/50 carry the new value, 41–49 gone
    d = dict(rows)
    assert d[40] == 9.0 and d[39] == 0.0 and 41 not in d
    assert len(rows) == 100 - 9


def test_q19_prefilters_reach_scans(spark):
    # the OR-of-ANDs evaluates post-join, but the size/quantity envelopes
    # must reach both parquet scans — that's the whole point of Q19's shape
    df = tpch.q19_disjunctive_revenue(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    assert "GreaterThanOrEqual(l_quantity" in pushed
    assert "GreaterThanOrEqual(p_size" in pushed
    strategies = plans.join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies


def test_q13_partial_aggregation_both_levels(spark):
    df = tpch.q13_order_distribution(spark, SF)
    assert plans.has_partial_aggregation(df)
    assert "CartesianProduct" not in plans.join_strategies(df)


def test_q22_no_global_window_no_cartesian_blowup(spark):
    # global avg must be a broadcast scalar; the only cross join is the
    # 1-row scalar attach
    df = tpch.q22_balance_no_orders(spark, SF)
    s = plans.explain_str(df)
    assert "Window" not in s
    strategies = plans.join_strategies(df)
    assert any("Broadcast" in j for j in strategies)


def test_embedding_dup_lsh_is_bucket_equijoin(spark):
    # the pair join must be an equi-join on the bucket key, never a
    # cartesian/broadcast NLJ over all pairs
    from lakota_spark.queries import pipeline

    df = pipeline.embedding_dup_lsh(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert not any("BroadcastNestedLoop" in j for j in strategies)


def test_minhash_band_join_no_cartesian(spark):
    from lakota_spark.queries import pipeline

    df = pipeline.minhash_dedup_pairs(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies


def test_pretrain_clean_single_corpus_scan(spark):
    # the fused profile (quality + language + digest) must come from ONE
    # documents scan; the only other corpus read is the checkpointed
    # shingle branch, which does not appear in this plan
    from lakota_spark.queries import pipeline

    df = pipeline.pretrain_clean(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plan.count("documents.parquet") == 1, plan
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies


def test_pretrain_funnel_single_scan_partial_agg(spark):
    # the funnel terminates pretrain_clean's flag relation in ONE
    # conditional aggregate: one documents scan in this plan (the
    # near-dup branch is checkpointed out), partial aggregation below
    # the exchange, no cartesian anywhere, and the unpivot explode is
    # over a ONE-ROW aggregate, not the corpus
    from lakota_spark.queries import pipeline

    df = pipeline.pretrain_funnel_report(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plan.count("documents.parquet") == 1, plan
    assert plans.has_partial_aggregation(df)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies


def test_q9_broadcasts_and_pushes_part_filter(spark):
    from lakota_spark.queries import tpch

    df = tpch.q9_product_profit(spark, SF)
    strategies = plans.join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies
    pushed = " ".join(plans.pushed_filters(df))
    assert "p_name" in pushed  # bolt predicate reaches the part scan
    assert plans.has_partial_aggregation(df)


def test_trigram_inline_search_is_single_scan(spark):
    # the inline strategy must be ONE codegen corpus scan: no explode,
    # no exchange, no join — just conjunction contains() probes
    from lakota_spark.queries import pipeline

    df = pipeline.trigram_search(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plan.count("documents.parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode


def test_streaming_near_dup_vs_corpus_equi_joins(spark):
    # every per-band anti-join must be an equi hash join (an ANY-band OR
    # would degenerate to BroadcastNestedLoopJoin over the corpus)
    from lakota_spark.streaming import streaming_near_dup_vs_corpus

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(2, "totally different reference corpus text here")],
        "doc_id long, text string",
    )
    out = streaming_near_dup_vs_corpus(docs, corpus)
    plan = plans.explain_str(out, "simple")
    assert "NestedLoop" not in plan, plan


def test_bm25_plan_shape(spark):
    # postings filtered pre-shuffle (partial agg), scalar stats ride a
    # broadcast join — no plain cartesian product anywhere
    from lakota_spark.queries import pipeline

    df = pipeline.bm25_topk(spark, SF)
    assert plans.has_partial_aggregation(df)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastHashJoin" in strategies


def test_trigram_indexed_search_plan(spark, tmp_path):
    # materialized-index search: candidates-only lookup must touch ZERO
    # corpus bytes and must partition-prune the posting table to the
    # query trigrams' prefixes; the verified form scans the corpus
    # exactly once with candidates broadcast
    from lakota_spark.operators.search_index import (
        search_trigram_index,
        write_trigram_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "tgidx")
    write_trigram_index(docs, path)

    cand = search_trigram_index(spark, path, "fast table")
    plan = plans.explain_str(cand)
    assert "documents.parquet" not in plan, plan
    assert "PartitionFilters" in plan and "tg_pfx" in plan, plan

    full = search_trigram_index(spark, path, "fast table", corpus=docs)
    splan = plans.explain_str(full, "simple")
    assert splan.count("documents.parquet") == 1, splan
    assert "BroadcastHashJoin" in plans.join_strategies(full)
    # and the two strategies agree with the inline conjunction scan
    from lakota_spark.operators.trigram import trigram_search

    inline = {r.doc_id for r in trigram_search(docs, "fast table").collect()}
    assert {r.doc_id for r in full.collect()} == inline


def test_bm25_indexed_plan_and_equality(spark, tmp_path):
    # indexed BM25: no corpus scan at search time (stats come from the
    # index's one-row table), posting scan partition-pruned to the query
    # terms' buckets, scores bitwise-equal to the un-indexed form
    from lakota_spark.operators import text as T
    from lakota_spark.operators.search_index import (
        search_bm25_index,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bmidx")
    write_bm25_index(docs, path)

    terms = ["spark", "window", "merge"]
    out = search_bm25_index(spark, path, terms)
    plan = plans.explain_str(out)
    assert "documents.parquet" not in plan, plan
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan

    base = T.bm25_scores(docs, terms).collect()
    got = out.collect()
    assert [(r.doc_id, r.bm25) for r in got] == [
        (r.doc_id, r.bm25) for r in base
    ]


def test_repetition_stats_zero_shuffle(spark):
    # every Gopher repetition signal is per-row array math: the plan must
    # be ONE corpus scan with no Exchange and no Generate (no explode)
    from lakota_spark.operators.text import repetition_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plans.explain_str(repetition_stats(docs), "simple")
    assert plan.count("documents.parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_ivf_kmeans_probe_plan(spark):
    # learned-IVF query path: the probed-list scan is ONE corpus pass
    # with the cluster filter applied in the scan stage (broadcast-
    # literal argmin — no join, no cartesian, no extra shuffle beyond
    # the top-k)
    from lakota_spark.operators.clustering import kmeans_fit
    from lakota_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cents, _ = kmeans_fit(emb, k=4, iters=1)
    df = ivf_kmeans_topk(emb, qv, k=10, centroids=cents)
    plan = plans.explain_str(df, "simple")
    assert plan.count("embeddings.parquet") == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "TakeOrderedAndProject" in plan, plan


def test_quantized_cosine_single_scan(spark):
    # quantize-dequantize-rank is one projection: single scan,
    # TakeOrderedAndProject, no join/exchange beyond the top-k
    from lakota_spark.operators.similarity import quantized_cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    df = quantized_cosine_topk(emb, qv, k=10)
    plan = plans.explain_str(df, "simple")
    assert plan.count("embeddings.parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_gap_fill_no_global_window(spark):
    # forward-fill windows partition by group: no single-partition
    # exchange may appear anywhere in the plan
    from lakota_spark.queries import pipeline

    df = pipeline.gap_fill_daily(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan


def test_q21_self_joins_are_equi(spark):
    # Q21's EXISTS/NOT-EXISTS self-joins must compile to equi-joins on
    # l_orderkey (the <> supplier test is a residual condition), never a
    # cartesian/nested-loop — that's the difference between a shuffle and
    # an n^2 explosion on a 100 TB lineitem.
    df = tpch.q21_suppliers_waiting(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "SortMergeJoin" in strategies or "ShuffledHashJoin" in strategies


def test_q21_status_filter_reaches_orders_scan(spark):
    df = tpch.q21_suppliers_waiting(spark, SF)
    assert any(
        "EqualTo(o_orderstatus,F)" in f for f in plans.pushed_filters(df)
    )


def test_q11_single_scalar_broadcast(spark):
    # The total is a one-row broadcast: exactly one join in the whole
    # plan (the scalar cross-join), and the fact scan reads only the
    # three columns the aggregate needs.
    df = tpch.q11_important_parts(spark, SF)
    strategies = plans.join_strategies(df)
    assert strategies == ["BroadcastNestedLoopJoin"]
    cols = plans.scan_columns(df)
    assert {"l_partkey", "l_extendedprice", "l_discount"} <= cols
    assert "l_orderkey" not in cols and "l_shipdate" not in cols
    assert plans.has_partial_aggregation(df)


def test_q16_exclusion_is_broadcast_anti(spark):
    df = tpch.q16_supplier_counts(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "BroadcastHashJoin" in strategies


def test_q20_year_filter_reaches_scan(spark):
    df = tpch.q20_promotion_share(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    assert "GreaterThanOrEqual(l_shipdate,1997" in pushed
    assert "LessThan(l_shipdate,1998" in pushed
    assert "CartesianProduct" not in plans.join_strategies(df)


def test_unigram_lm_joins_are_hash_or_merge(spark):
    # token->vocab is an equi-join (broadcast here; SMJ+AQE-skew at
    # scale); the only nested-loop allowed is the one-row stats
    # broadcast. Both aggregates must partial-combine map-side.
    from lakota_spark.queries import pipeline

    df = pipeline.unigram_lm_quality(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert strategies.count("BroadcastNestedLoopJoin") <= 1
    assert plans.has_partial_aggregation(df)


def test_semdedup_pair_join_is_equi(spark):
    # the intra-cluster pair join must be an equi-join on the cluster
    # key (id_a < id_b as residual), never a nested loop over n^2 pairs
    from lakota_spark.queries import pipeline

    strategies = plans.join_strategies(pipeline.semdedup_top_pairs(spark, SF))
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_mixture_weights_single_scalar_broadcast(spark):
    from lakota_spark.queries import pipeline

    df = pipeline.lang_mixture_weights(spark, SF)
    assert plans.join_strategies(df) == ["BroadcastNestedLoopJoin"]
    assert plans.has_partial_aggregation(df)


def test_boilerplate_and_line_dedup_plan_shape(spark):
    # both C4 stages: equi-joins only, no global window, no
    # single-partition exchange anywhere
    from lakota_spark.queries import pipeline

    for fn in (pipeline.boilerplate_doc_flags, pipeline.line_dedup_clean):
        df = fn(spark, SF)
        strategies = plans.join_strategies(df)
        assert "CartesianProduct" not in strategies
        assert "BroadcastNestedLoopJoin" not in strategies
        plan = plans.explain_str(df, "simple")
        assert "SinglePartition" not in plan, plan
        assert "Window" not in plan, plan


def test_multimodal_video_headers_plan_shape(spark):
    # one Arrow-batched python stage (the header walk), zero shuffles:
    # payload construction is pure codegen over the scan, the walk is
    # per-row, and the driver compare needs no global sort
    from lakota_spark.queries import pipeline

    df = pipeline.multimodal_video_headers(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plans.node_count(df, "MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan
    assert plans.join_strategies(df) == [], plan


def test_contrastive_pairs_plan_shape(spark):
    # negatives come from a SHARDED window (hashpartitioning on
    # (lang, bucket) — never a single-partition global sort) and the
    # positive anti-join stays an equi-join
    from lakota_spark.queries import pipeline

    df = pipeline.contrastive_pairs(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_winnow_zero_shuffle_operator(spark):
    # the selection itself is per-row array math: no joins, and the only
    # exchange allowed is the wrapper's input repartition
    from lakota_spark.operators.text import winnow_fingerprints

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = winnow_fingerprints(docs)
    assert plans.join_strategies(df) == []
    plan = plans.explain_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_clean_segment_read_is_join_free(spark, tmp_path):
    # Never-clipped segments scan as a bare FileScan (no bounds join);
    # an overlay update clips -> the join returns for the dirty pieces;
    # defrag rewrites them -> the fast plan comes back.
    from lakota_spark.repo import Repo
    from lakota_spark.schema import Schema

    repo = Repo(str(tmp_path / "r"), spark)
    coll = repo.create_collection(Schema(ts="int*", v="float"), "c")
    s = coll.series("s")
    # fragmented appends (small enough for defrag's threshold policy)
    for lo in range(0, 200, 8):
        s.write({
            "ts": list(range(lo, lo + 8)),
            "v": [float(i) for i in range(lo, lo + 8)],
        })
    plan = plans.explain_str(s.frame(sort=False), "simple")
    assert "Join" not in plan, plan
    # overlay update: the clipped pieces of the old segment need the
    # per-segment bounds filter again
    s.write({"ts": [50], "v": [999.0]})
    plan = plans.explain_str(s.frame(sort=False), "simple")
    assert "Join" in plan, plan
    assert s.frame(sort=False).count() == 200
    # defrag rewrites the fragmented run into clean segments: join-free
    coll.defrag()
    plan = plans.explain_str(s.frame(sort=False), "simple")
    assert "Join" not in plan, plan
    got = {r.ts: r.v for r in s.frame().collect()}
    assert got[50] == 999.0 and len(got) == 200


def test_dsir_importance_plan_shape(spark):
    # both bucket relations broadcast to the scoring join; the per-doc
    # fold is a partial-aggregated HashAggregate; no cartesian anywhere
    from lakota_spark.queries import pipeline

    df = pipeline.dsir_importance(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan
    # the only nested-loop allowed is the 1-row totals scalar broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_dedup_keep_best_single_groupby_no_window(spark):
    # the per-cluster argmax folds map-side: no Window operator, one
    # final HashAggregate on cluster_id
    from lakota_spark.queries import pipeline

    df = pipeline.dedup_keep_best(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Window" not in plan, plan
    assert "Cartesian" not in plan


def test_ccnet_buckets_one_window_partial_rollup(spark):
    from lakota_spark.queries import pipeline

    df = pipeline.ccnet_buckets(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plan.count("Window") == 1, plan
    assert "Cartesian" not in plan


def test_decontaminate_bloom_plan_shape(spark):
    # the ONLY keyless join allowed is the single-row bitmap broadcast
    # (BroadcastNestedLoopJoin over 1 row); the exact-verify join must be
    # an equi-join on the shingle, and the bloom bit test (getbit) must
    # run as a Filter on the corpus side — survivors are decided
    # map-side, before any shuffle
    from lakota_spark.queries import pipeline

    df = pipeline.decontaminate_bloom_flag(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert strategies.count("BroadcastNestedLoopJoin") <= 1
    assert (
        "SortMergeJoin" in strategies
        or "ShuffledHashJoin" in strategies
        or "BroadcastHashJoin" in strategies
    )
    plan = plans.explain_str(df, "simple")
    assert "getbit" in plan, plan
    # per-doc hit count partially aggregates map-side
    assert plans.has_partial_aggregation(df)


def test_contamination_overlap_plan_shape(spark):
    # bench shingles broadcast; the gaps-and-islands window partitions
    # by doc id — no single-partition exchange anywhere
    from lakota_spark.queries import pipeline

    df = pipeline.contamination_overlap(spark, SF)
    strategies = plans.join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies
    plan = plans.explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan


def test_containment_pairs_candidate_driven_plan(spark):
    # candidate-driven verify: id/shingle equi-joins only — the pair
    # list bounds the work, never an all-pairs product
    from lakota_spark.queries import pipeline

    df = pipeline.containment_dup_pairs(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_winnow_dup_pairs_band_join_plan(spark):
    # MOSS fingerprint pairs: fp equi-join only (the band discipline) —
    # no cartesian/nested-loop product; pair counting is a partial agg
    from lakota_spark.queries import pipeline

    df = pipeline.winnow_dup_pairs(spark, SF)
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    plan = plans.explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan
    assert "partial_count" in plan, plan


def test_winnow_dup_pairs_no_lineage_recompute(spark):
    # RECOMPUTE guard (plans.node_count): the exploded fingerprint
    # relation feeds three consumers (hot-bucket cap + both self-join
    # sides); un-checkpointed, the w-1-zip_with winnow chain repeats
    # per consumer — 3 Generate subtrees in the physical plan and a
    # measured 19.7 s vs 1.7 s at sf0.1. Post-fix the chain lives
    # behind localCheckpoints: zero live Generates, >=1 ExistingRDD
    # scan. Join-strategy contracts cannot see this class of bug.
    from lakota_spark.queries import pipeline

    df = pipeline.winnow_dup_pairs(spark, SF)
    assert plans.node_count(df, "Generate") == 0, plans.explain_str(
        df, "simple"
    )
    assert plans.checkpoint_sources(df) >= 1


def test_pair_join_operators_bounded_generate(spark):
    # every pair-join operator must consume its expensive exploded
    # relation a BOUNDED number of times: one Generate per live explode
    # at most — a self-join that re-derives its child doubles the count
    # (containment regressed to 4 before its shingle checkpoint)
    from lakota_spark.queries import pipeline

    for q, max_gen in [
        ("minhash_dedup_pairs", 2),
        ("containment_dup_pairs", 2),
        ("edit_dup_pairs", 1),
        ("semdedup_top_pairs", 1),
        ("embedding_dup_lsh", 0),
    ]:
        df = getattr(pipeline, q)(spark, SF)
        n = plans.node_count(df, "Generate")
        assert n <= max_gen, f"{q}: {n} Generate nodes (max {max_gen})"


def test_langid_ngram_plan_shape(spark):
    # model + defaults broadcast to the scoring joins; the gram explode
    # collapses map-side (partial agg) before the per-doc shuffle; the
    # only keyless join allowed is the docs x n_langs defaults expansion
    # (plus the one-row vocab stats join inside the fit)
    from lakota_spark.queries import pipeline

    df = pipeline.langid_ngram_confusion(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan
    assert "partial" in plan.lower(), plan


def test_heavy_hitters_broadcast_verify_plan(spark):
    # only candidate rows reach the verify groupBy: broadcast hash join
    # against the bounded candidate relation, partial agg, no shuffle of
    # the full distinct-value set, no cartesian
    from lakota_spark.queries import pipeline

    df = pipeline.heavy_hitter_tokens(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_quality_classifier_scores_plan_shape(spark):
    # scoring = ONE broadcast hash join with the ≤n_features weight
    # relation + partial-agg groupBys; the per-doc fraction window and
    # the doc-keyed folds are all hash-uniform keys — no cartesian, no
    # nested loop (the fit's bounded driver collects don't appear here)
    from lakota_spark.queries import pipeline

    df = pipeline.quality_classifier_eval(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bigram_lm_plan_shape(spark):
    # one position explode feeding partial-agg count relations; the
    # scoring joins are all equi-joins (token keys) — the only keyless
    # join allowed is the one-row total broadcast
    from lakota_spark.queries import pipeline

    df = pipeline.bigram_lm_quality(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Cartesian" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "partial" in plan.lower(), plan


def test_hybrid_rrf_plan_shape(spark):
    # fusion is a union of two TakeOrdered top-k runs + one groupBy on
    # the id — no cartesian, no window over the corpus
    from lakota_spark.queries import pipeline

    df = pipeline.hybrid_search_rrf(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Cartesian" not in plan
    assert "TakeOrderedAndProject" in plan, plan


def test_psi_drift_plan_shape(spark):
    # two map-side histogram groupBys + the bin-spine join; the only
    # keyless joins are the two one-row total broadcasts
    from lakota_spark.queries import pipeline

    df = pipeline.pca_drift_psi(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Cartesian" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "partial" in plan.lower(), plan


def test_corpus_report_single_scan(spark):
    # one fused aggregate over one parquet scan — no joins at all
    from lakota_spark.queries import pipeline

    df = pipeline.corpus_report(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_multimodal_container_headers_plan_shape(spark):
    # same contract as the video twin: the Ogg/BMFF payload build is
    # pure codegen (template unhex literals + fixed-width field concat),
    # the page/box walk is the only python stage, and nothing shuffles
    from lakota_spark.queries import pipeline

    df = pipeline.multimodal_container_headers(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plans.node_count(df, "MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan
    assert plans.join_strategies(df) == [], plan


def test_cluster_topic_terms_plan_shape(spark):
    # ONE corpus pass: the (cluster, term) counts relation is
    # checkpointed before its three consumers (per-term totals, the
    # stats row, the scored join), so the lazy localCheckpoint hides the
    # term explode and ZERO Generates survive in the live plan; no
    # cartesian beyond the broadcast one-row stats join
    from lakota_spark.queries import pipeline

    df = pipeline.cluster_topic_terms(spark, SF)
    assert plans.node_count(df, "Generate") == 0, plans.explain_str(
        df, "simple"
    )
    assert plans.checkpoint_sources(df) >= 1
    strategies = plans.join_strategies(df)
    assert "CartesianProduct" not in strategies


def test_dup_rate_by_source_plan_shape(spark):
    # the doc->cluster relation feeds two consumers (cluster source-
    # diversity + the final rollup) behind a checkpoint, and the pairs/
    # components chain must not leak live Generates into the report
    from lakota_spark.queries import pipeline

    df = pipeline.dup_rate_by_source(spark, SF)
    assert plans.checkpoint_sources(df) >= 1
    assert plans.node_count(df, "Generate") == 0, plans.explain_str(
        df, "simple"
    )
    assert "CartesianProduct" not in plans.join_strategies(df)


def test_multimodal_triage_report_plan_shape(spark):
    # payload build is codegen, the triage is the single Arrow stage,
    # and the kind rollup is the only exchange (partial agg map-side)
    from lakota_spark.queries import pipeline

    df = pipeline.multimodal_triage_report(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert plans.node_count(df, "MapInPandas") == 1, plan
    assert plans.node_count(df, "Exchange") <= 1, plan
    assert plans.join_strategies(df) == [], plan


def test_sketch_stats_skew_safe_windows(spark):
    # VERDICT r9 #1: no single-task sort over the full distinct-user (or
    # sample) relation of a hot event type. The only windows allowed:
    #   (1) KMV stage-1 ranked within (event_type, pmod(h,64)) sub-shards
    #   (2) KMV stage-2 re-rank over the <= k*64 filtered survivors
    #   (3) the offsets window over the bounded (partition x group) totals
    #   (4) the median running count over ONE range-partition's survivors
    import re

    from lakota_spark.queries import pipeline

    df = pipeline.sketch_stats(spark, SF)
    plan = plans.explain_str(df, "formatted")
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    # 3 VISIBLE windows — the bounded offsets window now lives inside
    # the pinned cover relation's checkpointed lineage (r10: the median
    # generalized to exact_group_quantiles, cover consumed twice)
    assert len(specs) == 3, plan
    # the ONLY row_number over the raw hash column is sub-sharded (two
    # partition exprs); the re-rank feeds from a bottom_rank-bounded
    # filter, never the raw relation
    rn = [s for s in specs if "row_number()" in s]
    assert len(rn) == 2, specs
    assert any(
        re.search(r"windowspecdefinition\(event_type#\d+, _w\d+#", s)
        for s in rn
    ), rn
    assert "pmod" in plan
    # the OLD shapes are gone: no row_number ordered by the sample value
    # (full-relation median sort), and exact_users is windowless
    assert not any(
        re.search(r"row_number\(\) windowspecdefinition\(event_type#\d+, value#", s)
        for s in specs
    ), specs
    # the median's range-partitioned tie-count relation is PINNED (one
    # materialization feeding both the totals and the candidate branch)
    assert plans.checkpoint_sources(df) >= 1, plan
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan, plan
    # ...and the selection really is the range-partitioned prefix-scan:
    # the unpinned form exposes the range exchange the checkpoint hides
    from pyspark.sql import functions as F

    from lakota_spark.operators.sampling import exact_group_median
    from lakota_spark.sources import read_parquet

    e = read_parquet(spark, f"{SF}/events.parquet").select(
        "event_type", "value"
    )
    open_plan = plans.explain_str(
        exact_group_median(e, "event_type", "value", _pin=False), "simple"
    )
    assert "rangepartitioning(event_type" in open_plan, open_plan


def test_interval_overlap_report_plan_is_equi(spark):
    # the naive formulation of the incident x session overlap is a
    # BroadcastNestedLoopJoin; the grid join must keep every join in
    # the plan equi-shaped (VERDICT scale bar: no O(L*R) node survives)
    from lakota_spark.queries import pipeline

    df = pipeline.interval_overlap_report(spark, SF)
    strats = plans.join_strategies(df)
    assert strats, "expected equi-join operators in the plan"
    assert not any(
        s in ("BroadcastNestedLoopJoin", "CartesianProduct")
        for s in strats
    ), strats


def test_lm_salted_join_spreads_hot_key(spark):
    """VERDICT r10 #2: the Zipf-keyed LM lookup joins must have an
    explicit skew discipline that does not depend on the vocab fitting
    the broadcast threshold. On a crafted corpus where ONE token carries
    ~90% of the mass, with broadcast disabled (the at-scale condition —
    an open-web vocab/bigram relation cannot broadcast):

    1. the salted plan carries the co-partitioned (key, _salt)
       exchanges, and no partition of the joined relation holds more
       than a bounded share of the rows;
    2. the unsalted SMJ concentrates the hot key in one partition
       (demonstrating the hazard is real);
    3. all three scorers return IDENTICAL results salted vs plain.
    """
    from pyspark.sql import functions as F

    from lakota_spark.operators.skew import salted_join
    from lakota_spark.operators.text import (
        bigram_lm_scores,
        langid_ngram_fit,
        langid_ngram_predict,
        unigram_lm_scores,
    )

    # crafted Zipf corpus: 300 docs, ~90% of tokens are "zz"
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("zz zz zz zz zz zz zz zz zz "),
            F.lit("w"), (F.col("id") % 40).cast("string"),
        ).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # (1) spread: the raw salted join relation, before any agg
        tok = docs.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("token"),
        )
        vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
        # spread check uses salt >= 2x shuffle partitions: a hot key
        # with S salts lands on at most S distinct hash buckets, so S
        # must dominate the partition count for balls-in-bins balance
        S = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
        salted = salted_join(tok, vocab, "token", salt=S)
        plan = plans.explain_str(salted, "simple")
        assert "hashpartitioning(token" in plan and "_salt" in plan, plan
        dist = (
            salted.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        total = sum(r.n for r in dist)
        assert max(r.n for r in dist) / total < 0.35, dist
        # (2) the hazard: plain SMJ funnels ~90% through one partition
        plain = tok.join(vocab, "token")
        pdist = (
            plain.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert max(r.n for r in pdist) / total > 0.5, pdist
        # (3) salted == plain for all three scorers (small salt: the
        # equality contract is salt-independent)
        S = 8
        uni_a = {r.doc_id: r for r in unigram_lm_scores(docs).collect()}
        uni_b = {
            r.doc_id: r for r in unigram_lm_scores(docs, salt=S).collect()
        }
        assert uni_a == uni_b
        bi_a = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
        bi_b = {
            r.doc_id: r for r in bigram_lm_scores(docs, salt=S).collect()
        }
        assert bi_a == bi_b
        model, langs = langid_ngram_fit(docs)
        li_a = {
            r.doc_id: r
            for r in langid_ngram_predict(docs, model, langs).collect()
        }
        li_b = {
            r.doc_id: r
            for r in langid_ngram_predict(
                docs, model, langs, salt=S
            ).collect()
        }
        assert li_a == li_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_kv_registry_scan_plan(spark):
    # round 13: the disjoint-KV registry read must carry NO dedup
    # window and NO exchange — last-writer-wins is a per-row no-op on
    # range-disjoint buckets, so the masked read is a raw pushed-down
    # parquet scan; and the value zone maps must have pruned the
    # refuted buckets before planning
    from lakota_spark import zonemap
    from lakota_spark.queries import engine_demo
    from lakota_spark.sexpr import to_filter_plan

    df = engine_demo.engine_kv_registry_scan(spark, SF)
    plan = plans.explain_str(df, "simple")
    assert "Window" not in plan and "Exchange" not in plan, plan
    # the mask reaches the parquet scan
    plans.assert_pushed(df, "LessThan(value")
    # every bucket carries a value zone map and the pruner ran over a
    # fully-disjoint set (nothing blocked). The bench value column is
    # near-uniform per bucket so this mask rarely refutes a whole
    # bucket — refutation effectiveness is pinned by the prune_kv unit
    # suite and scripts/probe_kv_zonemap.py (123 -> 5 segments); what
    # this contract pins is the PLAN: no window, no exchange, pushed
    # mask, zone maps present to prune when the data allows
    series = engine_demo._event_repo(spark, SF).collection(
        "kvreg"
    ).series("all")
    segs = series.segments()
    assert len(segs) >= 16
    assert all((s.meta or {}).get("zmap") for s in segs)
    plan_ir = to_filter_plan("(< self.value 2.0)")[0]
    pruned = zonemap.prune_kv(segs, plan_ir)
    refutable = [
        s for s in segs
        if not zonemap.may_match(plan_ir, s.meta["zmap"])
    ]
    # disjoint => every refutable bucket is actually dropped
    assert len(pruned) == len(segs) - len(refutable)


def test_cluster_topic_terms_window_group_limit(spark):
    # VERDICT r13 #3: the final per-cluster top-k must prune map-side
    # BEFORE the exchange. Spark 4's InferWindowGroupLimit already
    # yields exactly that shape for the rank<=k filter — pin it (a
    # partial WindowGroupLimit upstream of the cluster exchange) so a
    # refactor can't silently regress to a full-relation window sort.
    # The explicit two_stage=True sub-shard variant was measured SLOWER
    # at sf0.1 (1.12x @32 cores, 1.03x @8 — OPTIMIZATION_r14.md) and
    # stays off by default; its value-equality is pinned below.
    import re

    from lakota_spark.queries import pipeline

    df = pipeline.cluster_topic_terms(spark, SF)
    plan = plans.explain_str(df, "formatted")
    wgl = [l for l in plan.splitlines() if "WindowGroupLimit" in l]
    assert len(wgl) >= 2, plan  # partial (map-side) + final
    # the partial WindowGroupLimit sits BELOW the exchange feeding the
    # final window: in the numbered tree the deepest WGL node id is
    # smaller than the exchange right above the final window
    m = re.findall(
        r"WindowGroupLimit \((\d+)\)|Exchange \((\d+)\)", plan
    )
    wgl_ids = sorted(int(a) for a, b in m if a)
    exch_ids = sorted(int(b) for a, b in m if b)
    assert wgl_ids and exch_ids
    assert min(wgl_ids) < max(exch_ids), plan


def test_cluster_topic_terms_two_stage_value_identical(spark):
    # exactness of the sub-shard composition (global top-k per cluster
    # is a subset of per-shard top-ks), including score ties broken on
    # the term string across shard boundaries
    from lakota_spark.operators.clustering import cluster_topic_terms

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{(i * 7 + j) % 23}" for j in range(30)))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        [(i, i % 5) for i in range(60)], "doc_id long, cluster int"
    )
    one = sorted(
        tuple(r) for r in cluster_topic_terms(docs, assign).collect()
    )
    two = sorted(
        tuple(r)
        for r in cluster_topic_terms(
            docs, assign, two_stage=True, n_sub=7
        ).collect()
    )
    assert one == two and one
