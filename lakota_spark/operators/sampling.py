"""Corpus-curation operators: decontamination, stratified sampling,
sequence packing — the training-data pipeline stages downstream of dedup.

All pure Catalyst expressions (hash / window / join) — engine-reproducible
(md5-derived hashing, deterministic orderings) so every operator has an
exact DuckDB oracle, and every shuffle is keyed for scale:

- decontaminate: benchmark shingles are a broadcast-sized relation; the
  corpus-side join is an equi-join on the shingle, aggregated per doc.
- stratified_sample: zero shuffles — the keep/drop decision is a pure
  per-row hash test, exactly reproducible on any engine, any partitioning.
- pack_sequences: cumulative token sums inside hash-bucketed partitions
  (one window shuffle, all buckets in parallel) — never a global
  single-partition window.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakota_spark.functions import hash32, tokens, word_shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: find (or drop) corpus documents sharing
    >= ``min_hits`` distinct word ``n``-gram shingles with any benchmark
    document — the standard eval-leakage guard for pretraining corpora.

    ``mode='flag'`` returns (doc_id, n_shared) for contaminated docs;
    ``mode='drop'`` returns the clean corpus (left_anti).

    Scale shape: benchmark sets are eval suites — thousands of docs, not
    billions — so their distinct shingle set broadcasts; the corpus side
    is one explode + broadcast semi-join + per-doc count. No corpus
    self-join anywhere.
    """
    bench_sh = (
        benchmark.select(
            F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias(
            "shingle"
        ),
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_hits)
    )
    if mode == "flag":
        return hits
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    mode: str = "flag",
) -> DataFrame:
    """`decontaminate` with a Bloom-filter prefilter — the 100 TB shape
    when the benchmark shingle set itself is too big to broadcast.

    `decontaminate` broadcasts the DISTINCT benchmark shingles; at a few
    thousand eval docs that is KBs, but a full eval-suite union (every
    benchmark ever published, ~10⁷–10⁸ distinct n-grams × ~60 B) is a
    multi-GB broadcast that evicts executor cache everywhere. Here the
    broadcast is a fixed ``n_bits/8``-byte bitmap (128 KiB at the 2²⁰
    default) regardless of benchmark size:

    1. Build the bitmap's set bits IN SPARK (the benchmark shingle pass
       is distributed): explode benchmark shingles → k=``n_hashes``
       xxhash64 positions each → ``bit_or`` per 64-bit word; only the
       finished ``n_bits/8``-byte bitmap is collected and embedded as
       ONE binary literal (a single Literal node riding the task
       closure — NOT a join: a one-row map-column join materializes
       the map into every probe row, measured 45× slower than the plain
       path at sf0.1; an array<long> literal pays ~7 s of element-wise
       py4j conversion at 2²⁰ bits; binary is one transfer, O(1) probes).
    2. Corpus side: test all k bits per shingle map-side (positional
       ``substring``+``getbit`` on the literal, pure codegen). Shingles
       failing ANY bit are provably not in the benchmark — dropped
       before any shuffle.
    3. Exact verify: the tiny surviving fraction equi-joins the real
       benchmark shingle relation (a SHUFFLE join — nothing here
       requires the benchmark side to broadcast), then per-doc count.

    Bloom filters have no false negatives, so the output is IDENTICAL
    to `decontaminate` (differential-tested); false positives only cost
    verify-join traffic, ~``(1-e^(-k·m/n_bits))^k`` of corpus shingles
    at m benchmark shingles. The k hashes derive from one xxhash64 with
    distinct seed prefixes — engine-local is fine because the bloom is
    a prefilter, not part of the answer.
    """
    bitmap, bench_sh = fit_decontaminate_bloom(
        benchmark, text_col=text_col, n=n, n_bits=n_bits, n_hashes=n_hashes
    )
    return decontaminate_with_bloom(
        corpus,
        bitmap,
        bench_sh,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_hits=min_hits,
        n_hashes=n_hashes,
        mode=mode,
    )


def _bloom_pos(seed, shingle, n_bits: int):
    """Bit position of hash ``seed`` for a shingle: one xxhash64 with a
    distinct seed prefix per hash (the composed-hash bloom family)."""
    h = F.xxhash64(F.concat_ws(":", seed.cast("string"), shingle))
    return F.pmod(h, F.lit(n_bits))


def fit_decontaminate_bloom(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> tuple[bytes, DataFrame]:
    """Fit half of `decontaminate_bloom`: returns ``(bitmap, bench_sh)``
    — the dense ``n_bits/8``-byte bitmap (bit ``p`` lives at byte
    ``p//8``, bit ``p%8``; embedded as ONE binary literal by the apply
    half — a binary literal is a single py4j transfer and an O(1)
    positional ``substring`` per probe, where an array<long> literal
    paid ~7 s of element-wise py4j conversion at 2²⁰ bits and a
    map-column join copied the map into every probe row) and the
    distinct benchmark shingle relation it summarizes. The shingle
    relation is localCheckpointed so a caller applying it repeatedly
    (the streaming gate, incremental re-runs) pays the benchmark shingle
    pass once; only the fixed-size finished bitmap reaches the driver."""
    if n_bits % 64 or n_bits <= 0 or n_hashes <= 0:
        raise ValueError("n_bits must be a positive multiple of 64")
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    bench_sh = (
        benchmark.select(
            F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
        )
        .distinct()
        # consumed twice (bitmap build + exact verify): one shingle pass
        .localCheckpoint(eager=False)
    )
    sparse = (
        bench_sh.select(
            F.explode(
                F.transform(
                    seeds, lambda i: _bloom_pos(i, F.col("shingle"), n_bits)
                )
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in sparse:
        words[r["w"]] = r["bits"]
    # little-endian word packing puts bit p at byte p//8, bit p%8
    bitmap = struct.pack(f"<{len(words)}q", *words)
    return bitmap, bench_sh


def decontaminate_with_bloom(
    corpus: DataFrame,
    bitmap: bytes,
    bench_sh: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    n_hashes: int = 5,
    mode: str = "flag",
) -> DataFrame:
    """Apply half of `decontaminate_bloom` against a pre-fitted
    ``(bitmap, bench_sh)`` pair — bloom prefilter map-side against the
    binary bitmap literal, exact verify join on the survivors.
    ``n_hashes`` must match the fit (``n_bits`` is ``len(bitmap)*8``).
    The k probes unroll to k AND-ed predicates (n_hashes is single
    digits) — plain codegen conjunction, no array lambdas."""
    n_bits = len(bitmap) * 8
    bloom_lit = F.lit(bitmap)

    def _bit_set(seed: int):
        p = _bloom_pos(F.lit(seed), F.col("shingle"), n_bits)
        byte = F.conv(
            F.hex(F.substring(bloom_lit, (p / 8).cast("int") + 1, 1)),
            16,
            10,
        ).cast("int")
        return F.getbit(byte, F.pmod(p, F.lit(8)).cast("int")) == 1

    cond = _bit_set(0)
    for k in range(1, n_hashes):
        cond = cond & _bit_set(k)
    corpus_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias(
            "shingle"
        ),
    )
    survivors = corpus_sh.where(cond).select(id_col, "shingle")
    hits = (
        survivors.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_hits)
    )
    if mode == "flag":
        return hits
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Contamination SEVERITY: for each contaminated corpus document,
    the longest contiguous run of benchmark-shared word ``n``-gram
    positions (GPT-3-appendix-style overlap measurement — a doc sharing
    one stray n-gram and a doc embedding a whole benchmark item both
    "hit", but their longest runs differ by orders of magnitude, and
    clip-vs-drop policies key off exactly that).

    Returns ``(doc_id, n_matched_pos, max_run)``: matched shingle
    positions total and the longest gaps-and-islands run (a run of r
    shingles = r+n-1 contiguous shared tokens).

    Scale shape: posexplode (positions matter, so no distinct) →
    broadcast semi-join on the shingle → doc-keyed row_number window →
    per-(doc, island) count → per-doc max. Every shuffle after the join
    is keyed by doc id; only matched positions (a tiny fraction of the
    corpus) ever reach the window.
    """
    bench_sh = benchmark.select(
        F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
    ).distinct()
    pos_sh = corpus.select(
        F.col(id_col),
        F.posexplode(word_shingles(tokens(text_col), n)).alias(
            "pos", "shingle"
        ),
    )
    matched = pos_sh.join(F.broadcast(bench_sh), "shingle").select(
        id_col, "pos"
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        matched.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return runs.groupBy(id_col).agg(
        F.sum("run").alias("n_matched_pos"),
        F.max("run").alias("max_run"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic per-stratum sampling for training-mix control:
    keep a row iff ``hash(salt:id) % 10000 < rate * 10000`` for its
    stratum's rate. Unlike `df.sampleBy` the decision is a pure function
    of the row — reproducible across engines, runs, partitionings, and
    incremental re-runs (a doc's fate never changes when the corpus
    grows). Zero shuffles: the filter is map-side only.
    """
    probe = hash32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    bucket = probe % 10000
    rate_expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        thr = F.lit(int(round(rate * 10000)))
        rate_expr = (
            F.when(cond, thr)
            if rate_expr is None
            else rate_expr.when(cond, thr)
        )
    rate_expr = (
        rate_expr.otherwise(F.lit(int(round(default_rate * 10000))))
        if rate_expr is not None
        else F.lit(int(round(default_rate * 10000)))
    )
    return df.where(bucket < rate_expr)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Greedy sequence packing: assign documents to training shards of at
    most ~``budget`` tokens (docs above the budget get their own shard).

    Docs are hash-partitioned into ``n_buckets`` independent packing
    streams (deterministic: bucket = hash(id) % n_buckets), each packed
    by running token count in ``id_col`` order — shard boundaries fall
    where the cumulative sum crosses a budget multiple. One window
    shuffle keyed by bucket; every bucket packs in parallel, so the
    operator scales with the corpus while a single global cumulative sum
    would funnel through one task. Returns the input plus
    (pack_bucket, pack_id).
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("pack_sequences needs positive budget/n_buckets")
    bucket = (
        hash32(F.concat_ws(":", F.lit("pack"), F.col(id_col).cast("string")))
        % n_buckets
    )
    out = df.withColumn("pack_bucket", bucket)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    # shard index = budget multiples crossed before this doc started. A
    # doc never splits; a shard can overshoot the budget by less than its
    # last doc's length (the window-expressible packing — exact
    # close-when-full first-fit is inherently sequential/stateful)
    return out.withColumn(
        "pack_id",
        ((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def importance_weights(
    df: DataFrame,
    target_filter,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    hashed-feature variant): score every raw document by how much its
    token-bucket distribution looks like a TARGET domain (the rows
    passing ``target_filter``) versus the raw corpus — the standard
    recipe for reweighting a crawl toward a high-quality reference
    (Wikipedia, books, a curated lang slice).

    Feature = token → md5 bucket (`hash32 % n_buckets` — engine-
    independent, so the DuckDB oracle reproduces it bit-exactly). Each
    bucket's add-one-smoothed log probability ratio is computed as ONE
    ``ln`` of an exact integer-product ratio —
    ``ln(((c_tgt+1)·(raw_total+B)) / ((c_raw+1)·(tgt_total+B)))`` —
    then quantized to integer micro-nats BEFORE the per-document sum,
    so the fold is exact long addition (order/partitioning-independent;
    same discipline as `text.unigram_lm_scores`). Returns
    ``(doc_id, n_tokens, avg_log_ratio)``; documents with no alphabetic
    tokens carry no evidence and are omitted (join semantics).

    Scale shape: one token explode feeding two bucket aggregates (both
    partial-combine map-side; the bucket relation is ≤ n_buckets rows →
    broadcast to the scoring join), then one per-doc groupBy. The
    explode is localCheckpointed so raw and target counts share the
    single tokenization pass.
    """
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    tok = (
        df.select(
            F.col(id_col),
            target_filter.alias("_is_target"),
            F.explode(words).alias("token"),
        )
        .withColumn("bucket", F.pmod(hash32(F.col("token")), F.lit(n_buckets)))
        .localCheckpoint(eager=False)
    )
    lr = _lr_from_bucketed(tok, n_buckets)
    return (
        tok.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum("lr_micro") * 1.0 / (F.count(F.lit(1)) * 1000000)
            ).alias("avg_log_ratio"),
        )
    )


def _lr_from_bucketed(tok: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, lr_micro) from a bucketed token relation carrying an
    ``_is_target`` flag — the fit half of DSIR."""
    counts = (
        tok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias(
                "c_tgt"
            ),
        )
        # ≤ n_buckets rows, consumed twice (totals + the ratio select):
        # materialize once instead of re-aggregating the token relation
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("c_raw").alias("raw_total"), F.sum("c_tgt").alias("tgt_total")
    )
    b = F.lit(n_buckets)
    return counts.join(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("c_tgt") + 1) * (F.col("raw_total") + b)).cast(
                    "double"
                )
                / ((F.col("c_raw") + 1) * (F.col("tgt_total") + b)).cast(
                    "double"
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("lr_micro"),
    )


def fit_importance_lr(
    df: DataFrame,
    target_filter,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit ONLY the per-bucket log-ratio relation of `importance_weights`
    — the corpus artifact a stream materializes once and scores against
    (`score_against_lr`); ≤ n_buckets rows, broadcastable anywhere."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    tok = df.select(
        F.col(id_col),
        target_filter.alias("_is_target"),
        F.explode(words).alias("token"),
    ).withColumn("bucket", F.pmod(hash32(F.col("token")), F.lit(n_buckets)))
    return _lr_from_bucketed(tok, n_buckets)


def score_against_lr(
    df: DataFrame,
    lr: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a PRECOMPUTED per-bucket log-ratio
    relation (``(bucket, lr_micro)`` from `importance_weights`'s fit) —
    the serving half of DSIR, split out so a STREAM can score incoming
    docs against the materialized corpus artifact without re-fitting:
    tokenize → bucket → broadcast-join lr → per-doc integer fold. No
    state, no corpus scan per batch."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    tok = df.select(F.col(id_col), F.explode(words).alias("token")).withColumn(
        "bucket", F.pmod(hash32(F.col("token")), F.lit(n_buckets))
    )
    return (
        tok.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum("lr_micro") * 1.0 / (F.count(F.lit(1)) * 1000000)
            ).alias("avg_log_ratio"),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    alphas: tuple[float, float] = (0.3, 0.7),
) -> DataFrame:
    """Temperature-based sampling weights for a multi-domain/multilingual
    training mixture (the multilingual-LM recipe from mBERT/XLM-R:
    ``p_i ∝ c_i^alpha`` flattens the natural distribution so low-resource
    groups are upsampled; alpha=1 keeps natural frequencies, alpha→0
    approaches uniform). Returns per-group natural share, the exponented
    weight at each alpha, and the resulting up/down-sampling boost.

    Engine-reproducible: each group's ``c^alpha`` quantizes to integer
    micro-units BEFORE the normalizing sum (exact long addition, any
    order/partitioning); every emitted ratio is a single deterministic
    double division of exact integers, rounded once at 6 decimals.

    Scale shape: one partial-aggregating count per group (the only
    shuffle), a one-row broadcast of the normalizers, map-side ratios —
    group cardinality (languages/domains) is tiny by construction.
    """
    a_lo, a_hi = alphas
    g = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    g = g.select(
        group_col,
        "n_docs",
        F.round(F.pow(F.col("n_docs"), F.lit(a_lo)) * 1000000)
        .cast("long")
        .alias("p_lo"),
        F.round(F.pow(F.col("n_docs"), F.lit(a_hi)) * 1000000)
        .cast("long")
        .alias("p_hi"),
    )
    tot = g.agg(
        F.sum("n_docs").alias("total"),
        F.sum("p_lo").alias("p_lo_tot"),
        F.sum("p_hi").alias("p_hi_tot"),
    )
    share = F.col("n_docs") / F.col("total")
    w_lo = F.col("p_lo") / F.col("p_lo_tot")
    w_hi = F.col("p_hi") / F.col("p_hi_tot")
    return g.join(F.broadcast(tot)).select(
        F.col(group_col),
        F.col("n_docs"),
        share.alias("nat_share"),
        F.round(w_lo, 6).alias("w_alpha_lo"),
        F.round(w_hi, 6).alias("w_alpha_hi"),
        F.round(w_lo / share, 6).alias("boost_alpha_lo"),
    )


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    on: str = "source",
) -> DataFrame:
    """Domain/source blocklist filter (the C4 badlist stage): drop every
    row whose ``on`` value appears in the blocklist relation — a
    broadcast LEFT ANTI equi-join, so a multi-million-entry blocklist
    still costs one map-side hash probe per row and the corpus is
    scanned once. For a handful of literal values prefer a pushable
    ``isin`` filter instead; the relation form is for blocklists that
    are themselves data."""
    key = blocked.columns[0]
    return df.join(
        F.broadcast(blocked.select(F.col(key).alias(on)).distinct()),
        on,
        "left_anti",
    )


def sample_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "bal",
    n_sub: int = 64,
) -> DataFrame:
    """Deterministic exact-k-per-group sampling (balanced subsets: k docs
    per language, k examples per source...): rank rows inside each group
    by a pure row hash and keep the k smallest — like `stratified_sample`
    the decision is a function of the row alone, so it reproduces across
    engines and runs, and unlike a rate it yields EXACTLY min(k, n) rows
    per group.

    Skew-safe two-stage top-k: a single `row_number` window per group
    would funnel a billion-row group through one task, so stage 1 ranks
    within (group, hash % n_sub) sub-streams — uniformly split regardless
    of group skew — and keeps k per sub-stream; stage 2 re-ranks the
    ≤ k·n_sub survivors per group (tiny) and keeps k. Global top-k is a
    subset of per-bucket top-ks, so the composition is exact; both
    shuffles are on hash-uniform keys. Returns the input columns plus
    ``sample_rank`` (1-based hash order within the group — the SQL
    ``row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k``).
    """
    if k <= 0 or n_sub <= 0:
        raise ValueError("sample_k_per_group needs positive k/n_sub")
    probe = hash32(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_probe")
    base = df.withColumn("_probe", probe)
    w1 = Window.partitionBy(
        F.col(group_col), F.col("_probe") % F.lit(n_sub)
    ).orderBy(F.col("_probe").asc(), F.col(id_col).asc())
    stage1 = base.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.col("_probe").asc(), F.col(id_col).asc()
    )
    return (
        stage1.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= k)
        .drop("_probe", "_r1")
    )


def bottom_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    order_col: str,
    n_sub: int = 64,
) -> DataFrame:
    """Skew-safe exact bottom-k per group: the ``k`` smallest
    ``order_col`` rows per ``group_col`` WITHOUT sorting a whole group in
    one task. A single ``row_number() OVER (PARTITION BY g ORDER BY v)``
    funnels every row of a hot group through one executor's sort — the
    shape that dies on a skewed 100 TB relation. Instead, the same
    two-stage discipline as `sample_k_per_group`: stage 1 ranks within
    ``(group, order_col % n_sub)`` sub-streams (hash-uniform splits of
    the hot group) and keeps k per sub-stream; stage 2 re-ranks the
    ``<= k*n_sub`` survivors per group (tiny). The global bottom-k is a
    subset of the per-shard bottom-ks, so the composition is exact.

    ``order_col`` must be a non-negative integral column (the sub-shard
    key is ``pmod``) with distinct values within a group — the KMV /
    minhash discipline — so ranks are deterministic. Returns the input
    columns plus ``bottom_rank`` (1-based order within the group).
    """
    if k <= 0 or n_sub <= 0:
        raise ValueError("bottom_k_per_group needs positive k/n_sub")
    w1 = Window.partitionBy(
        F.col(group_col), F.pmod(F.col(order_col), F.lit(n_sub))
    ).orderBy(F.col(order_col).asc())
    stage1 = df.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        stage1.withColumn("bottom_rank", F.row_number().over(w2))
        .where(F.col("bottom_rank") <= k)
        .drop("_r1")
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple = ((1, 2),),
    n_parts: int | None = None,
    _pin: bool = True,
) -> DataFrame:
    """EXACT per-group order statistics at arbitrary RATIONAL quantiles
    — for each ``(num, den)`` the element at rank
    ``m = (num * (n-1)) div den + 1`` (the LOWER quantile: an actual
    data value, no interpolation; ``(1,2)`` reproduces the classic
    lower median) — via a distributed selection that never sorts a
    whole group in one task.

    Why not the window: ``row_number() OVER (PARTITION BY g ORDER BY
    v)`` funnels every row of a hot group through one task's sort — the
    shape that dies on a skewed 100 TB corpus. Why not bottom-k: a
    median-class rank is ~n/2, so per-shard pruning keeps half the
    data. The scalable exact shape is the two-level prefix-scan
    (classic distributed selection):

    1. ties collapse map-side: ``V = (g, v) -> c`` — hash shuffle with
       partial agg, so a billion repeats of one value cost one row;
    2. ``V`` is RANGE-repartitioned on ``(g, v)``: the range
       partitioner SAMPLES boundaries, so a hot group is split across
       many partitions by value sub-range (the skew control). The
       relation is pinned (``localCheckpoint``) so every consumer
       observes the same physical partition ids;
    3. per-(partition, group) subtotals via ``spark_partition_id`` give
       a BOUNDED relation (``<= n_parts x n_groups`` rows); a window
       over THAT (tiny) yields each partition's global cumulative
       offset and each group's total ``n``;
    4. for every requested quantile exactly ONE partition per group
       covers its target rank (``off < m <= off + t``); a broadcast
       join keeps only covering partitions' rows, and a running-count
       window over those survivors (partitioned by (g, partition) with
       the global offset added) picks each rank's value.

    Every shuffle is hash-uniform or range-balanced; the only windows
    run over the bounded offsets relation and the covering partitions'
    survivors. Returns ``(group_col, q, value)`` with ``q`` the
    "num/den" label — deterministic and engine-exact (byte-identical
    to the row_number form, ties included, because ties collapse into
    one weighted row before selection).

    ``_pin=False`` skips the localCheckpoint so plan contracts can see
    the range exchange through the lineage; partition-id consistency
    then relies on Spark's deterministic range-boundary sampling.
    """
    for num, den in quantiles:
        if not (0 <= num <= den and den > 0):
            raise ValueError(f"bad quantile {num}/{den}")
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    g, v = group_col, value_col
    V = (
        df.groupBy(g, v)
        .agg(F.count(F.lit(1)).alias("_c"))
        .repartitionByRange(n_parts, g, v)
    )
    if _pin:
        V = V.localCheckpoint(eager=False)
    vp = V.withColumn("_pid", F.spark_partition_id())
    totals = vp.groupBy("_pid", g).agg(F.sum("_c").alias("_t"))
    wo = Window.partitionBy(g).orderBy("_pid")
    offs = totals.withColumn("_hi", F.sum("_t").over(wo)).withColumn(
        "_off", F.col("_hi") - F.col("_t")
    )
    grp = totals.groupBy(g).agg(F.sum("_t").alias("_n"))
    targets = grp.select(
        g,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{num}/{den}").alias("_q"),
                        (
                            F.expr(f"({num} * (_n - 1)) div {den}") + 1
                        ).alias("_m"),
                    )
                    for num, den in quantiles
                ]
            )
        ).alias("_t_"),
    ).select(g, F.col("_t_._q").alias("_q"), F.col("_t_._m").alias("_m"))
    cover = (
        offs.join(targets, g)
        .where((F.col("_off") < F.col("_m")) & (F.col("_m") <= F.col("_hi")))
        .select("_pid", g, "_off", "_q", "_m")
        # tiny (<= groups x quantiles rows) but consumed twice — pin it
        # so the offsets window is not re-derived per consumer
        .localCheckpoint(eager=False)
    )
    cover_p = cover.select("_pid", g, "_off").distinct()
    wq = (
        Window.partitionBy(g, "_pid")
        .orderBy(F.col(v).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        vp.join(F.broadcast(cover_p), ["_pid", g])
        .withColumn("_cum", F.sum("_c").over(wq) + F.col("_off"))
    )
    return (
        cand.join(
            F.broadcast(cover.select("_pid", g, "_q", "_m")),
            ["_pid", g],
        )
        .where(
            (F.col("_cum") >= F.col("_m"))
            & (F.col("_cum") - F.col("_c") < F.col("_m"))
        )
        .select(g, F.col("_q").alias("q"), F.col(v).alias("value"))
    )


def exact_group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_parts: int | None = None,
    _pin: bool = True,
) -> DataFrame:
    """Lower median via :func:`exact_group_quantiles` ((1,2): rank
    ``(n-1) div 2 + 1 == floor((n+1)/2)``) — kept as the named entry
    point `sketch_stats` and the r10 plan contracts pin. Returns
    ``(group_col, median)``."""
    out = exact_group_quantiles(
        df, group_col, value_col, ((1, 2),), n_parts=n_parts, _pin=_pin
    )
    return out.select(group_col, F.col("value").alias("median"))


def heavy_hitters(
    df: DataFrame,
    col: str = "token",
    numer: int = 1,
    denom: int = 100,
) -> DataFrame:
    """EXACT frequent items above ``numer/denom`` of the relation's rows,
    found without shuffling the full distinct-value set: a single-pass
    merged Karp/Misra-Gries candidate sketch (Spark's JVM-side
    ``stat.freqItems`` — per-partition bounded counter maps, mergeable,
    NO false negatives above the support) prunes to a bounded candidate
    list, and a broadcast semi-join + groupBy verifies candidates
    exactly. Same two-phase discipline as the bloom decontaminator:
    approximate structure prunes, exact join decides, so the output is
    EXACT (plain ``HAVING count(*) >= t`` oracle).

    The threshold is the RATIONAL ``numer/denom`` and the final filter is
    the integer cross-multiplication ``count * denom >= numer * total`` —
    no float boundary, engine-exact. The sketch support is half the
    threshold, so items sitting exactly ON the threshold are still
    guaranteed candidates (freqItems' no-false-negative bound is strict
    ``> support*n``).

    Scale shape: at 100 TB a plain ``groupBy(col).count`` shuffles every
    distinct value per partition (the Zipf tail — possibly billions of
    hapaxes); this shuffles NOTHING for the sketch (driver collects a
    bounded ``<= 2*denom/numer + 1`` candidate list, the centroids-class
    driver aggregate) and only candidate rows reach the verify groupBy
    (broadcast hash semi-join, map-side partial agg).
    """
    import math

    spark = df.sparkSession
    total = df.count()
    if total == 0:
        return df.select(F.col(col)).limit(0).withColumn(
            "n", F.lit(0).cast("long")
        )
    # strict-inequality guard: support strictly below the threshold
    # fraction. freqItems floors support at 1e-4, so thresholds under
    # 2e-4 would silently lose the no-false-negative guarantee - refuse
    # them (at that selectivity the full groupBy is the right tool).
    if numer / denom < 2e-4:
        raise ValueError(
            "heavy_hitters threshold below 2e-4: the candidate sketch "
            "cannot guarantee completeness (freqItems support floor); "
            "use a plain groupBy/HAVING at this selectivity"
        )
    support = min(numer / denom / 2.0, 0.49)
    cands = (
        df.stat.freqItems([col], support).collect()[0][f"{col}_freqItems"]
    )
    if not cands:
        return df.select(F.col(col)).limit(0).withColumn(
            "n", F.lit(0).cast("long")
        )
    cand_df = spark.createDataFrame(
        [(c,) for c in cands], df.select(col).schema
    )
    return (
        df.join(F.broadcast(cand_df), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") * F.lit(denom) >= F.lit(numer) * F.lit(total))
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    val_pct: int = 10,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/validation split: the split UNIT is the
    near-dup cluster, not the document, so two near-duplicates can never
    straddle the boundary — the leakage mode a naive per-doc hash split
    has (train/val "generalization" measured on val docs whose near-copy
    sits in train). The held-out fraction is honest by construction.

    ``clusters`` is `dedup_clusters` output (doc_id, cluster_id) and
    typically covers only docs that appeared in a verified pair; docs
    with no near-dup are their own singleton cluster
    (``coalesce(cluster_id, doc_id)``). Assignment is a deterministic,
    salt-keyed hash of the CLUSTER id — reproducible across runs and
    engines (`functions.hash32` md5 parity), no RNG state, and adding
    new docs later never flips an existing cluster's side (the stable
    re-shardable property reservoir/random splits lack).

    Scale shape: one left equi-join (cluster map onto docs — broadcast
    when the pair graph is sparse, shuffle otherwise) + a per-row hash
    projection; no window, no global sort. Returns ``docs`` +
    (cluster_id, split) with split in {'train', 'val'}.

    Reference parity: beyond-reference (training-pipeline extension
    surface, SURVEY.md §2.12 ladder).
    """
    if not 0 < val_pct < 100:
        raise ValueError(f"val_pct must be in (0, 100), got {val_pct}")
    cmap = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("_leak_cid")
    )
    full = docs.join(cmap, on=id_col, how="left").withColumn(
        "cluster_id", F.coalesce(F.col("_leak_cid"), F.col(id_col))
    ).drop("_leak_cid")
    bucket = F.pmod(
        hash32(
            F.concat(
                F.lit(f"{salt}:"), F.col("cluster_id").cast("string")
            )
        ),
        F.lit(100),
    )
    return full.withColumn(
        "split",
        F.when(bucket < F.lit(val_pct), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def contrastive_buckets(
    n: int, target_shard: int = 100_000, n_min: int = 64
) -> int:
    """Bucket-count rule for `contrastive_pairs` (the `corpus_k`
    discipline, VERDICT r8 #6): with n_buckets FIXED, a 90%-one-language
    corpus funnels 0.9·n rows through n_buckets window shards — at
    1e9 docs and 64 buckets that is a 14M-row single-task sort. Scaling
    n_buckets ∝ n/target_shard caps the expected shard (and therefore
    the largest skewed-language shard) at ~target_shard rows, keeping
    per-task sort memory flat while the shard count grows with the
    corpus. The probe table in NOTES.md ("round 9 skew probes") pins
    the measured flatness at ×1/×10/×100 under the 90%-en re-tag."""
    if n <= 0:
        return n_min
    return max(n_min, -(-n // target_shard))


def contrastive_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int | None = None,
    salt: str = "neg",
) -> DataFrame:
    """Contrastive training-pair mining for embedding models: POSITIVES
    are the verified near-dup pairs (label 1 — semantically-same text,
    the classic weak-supervision positive), NEGATIVES (label 0) pair
    each doc with its hash-order neighbor inside a (lang, hash-bucket)
    shard — same-language hard-ish negatives, deterministic (salt-keyed
    md5 order, doc-id tie-break, no RNG), then anti-joined against the
    positive set so an accidental near-dup can never be labeled 0.

    Scale shape: negatives come from ONE window over (lang, bucket)
    shards — ``n_buckets`` bounds shard size; left at None it derives
    from the corpus via `contrastive_buckets` (one count job, shards
    ≈ 100k rows even when 90% of the corpus is one language — the
    round-9 skew probe's regime); the anti-join normalizes to
    (least, greatest) so it stays an equi-join (broadcastable — the
    verified-pair relation is tiny next to the corpus). Returns
    (doc_a, doc_b, label).

    Reference parity: beyond-reference (training-pipeline extension
    surface); pairs input is `minhash_dedup` / `embedding_dup_pairs`
    output.
    """
    if n_buckets is None:
        n_buckets = contrastive_buckets(docs.count())
    # normalize orientation (identity for minhash/embedding pair output,
    # which already emits doc_a < doc_b) so the negative anti-join can
    # never miss a reversed positive
    # `pairs` is typically the full near-dup verify chain (banded LSH
    # self-join + Jaccard verification) and `pos` feeds TWO consumers —
    # the union output and the negative anti-join build side. Without
    # lineage truncation each consumer replays that whole chain
    # (measured at sf0.1: Exchange 9 -> 3 with the checkpoint; at scale
    # the duplicate is a second full candidate-verify pass). The pair
    # relation is bounded, so materializing it is cheap.
    pos = pairs.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
        F.lit(1).alias("label"),
    ).localCheckpoint(eager=False)
    h = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    sharded = docs.select(
        F.col(id_col), F.col(lang_col).alias("_lang")
    ).withColumn("_h", h).withColumn(
        "_bucket", F.pmod(F.col("_h"), F.lit(n_buckets))
    )
    w = Window.partitionBy("_lang", "_bucket").orderBy("_h", id_col)
    neg = (
        sharded.withColumn("_nxt", F.lead(id_col).over(w))
        .where(F.col("_nxt").isNotNull())
        .select(
            F.least(F.col(id_col), F.col("_nxt")).alias("doc_a"),
            F.greatest(F.col(id_col), F.col("_nxt")).alias("doc_b"),
            F.lit(0).alias("label"),
        )
        .join(
            pos.select("doc_a", "doc_b"),
            on=["doc_a", "doc_b"],
            how="left_anti",
        )
    )
    return pos.unionByName(neg)


def temperature_resample(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
    id_col: str = "doc_id",
    salt: str = "temp",
    max_repeat: int = 16,
) -> DataFrame:
    """END-TO-END temperature resampling: where `mixture_weights` only
    REPORTS the ``q_g ∝ c_g^alpha`` mixture, this emits the resampled
    corpus itself — each group's expected output count is
    ``budget * q_g``, realized per row as a deterministic repeat count
    (upsampling low-resource groups by repetition, downsampling
    high-resource ones by hash thinning).  The multilingual-LM recipe
    (mBERT/XLM-R/PaLM data mixing) as a corpus transform.

    Exactness discipline: group weights quantize to integer micros
    AFTER the single ``pow`` (alpha=0.5 is sqrt — correctly rounded in
    IEEE, so bit-identical across engines); everything after is
    integer/decimal(38) arithmetic — ``rate_g = budget*p_g/(ptot*n_g)``
    is carried as the exact pair (num, den), the whole part is a
    comparison ladder (num >= j*den, j=1..max_repeat — NO decimal
    division, whose scale-6 rounding could misfloor), and the
    fractional Bernoulli is the exact integer test
    ``probe * den < rem * 1e6`` with ``probe = hash32(salt:id) % 1e6``.
    A row's fate is a pure function of (id, group stats) — stable
    across runs, partitionings, and engines.

    Scale shape: one partial-agg group count (the only shuffle), a
    one-row normalizer broadcast, a broadcast join of the tiny group
    table, then map-side explode bounded by ``max_repeat`` — the
    output carries ``rep_idx`` so downstream shuffles see distinct
    rows.  ``budget`` defaults to the input size (reshape, same mass).
    """
    import functools
    import operator as _op

    g = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # alpha=0.5 uses sqrt, not pow: IEEE-754 requires sqrt to be
    # correctly rounded, while JVM Math.pow is only 1-ulp-accurate —
    # a last-ulp difference vs the oracle's sqrt() could flip
    # round(sqrt*1e6) on a half boundary. Other alphas are pow-based
    # and engine-approximate at the last ulp (documented trade).
    _w = (
        F.sqrt(F.col("_n").cast("double"))
        if float(alpha) == 0.5
        else F.pow(F.col("_n"), F.lit(float(alpha)))
    )
    g = g.withColumn("_p", F.round(_w * 1000000).cast("long"))
    tot = g.agg(
        F.sum("_n").alias("_total"), F.sum("_p").alias("_ptot")
    )
    g = g.join(F.broadcast(tot))
    dec = "decimal(38,0)"
    budget_col = (
        F.lit(int(budget)).cast(dec)
        if budget is not None
        else F.col("_total").cast(dec)
    )
    num = budget_col * F.col("_p").cast(dec)
    den = F.col("_ptot").cast(dec) * F.col("_n").cast(dec)
    whole = functools.reduce(
        _op.add,
        [
            F.when(num >= den * F.lit(j).cast(dec), 1).otherwise(0)
            for j in range(1, max_repeat + 1)
        ],
    )
    # a group at the repeat cap gets EXACTLY max_repeat copies — zero
    # the fractional remainder so the Bernoulli can't push past the cap
    capped = num >= den * F.lit(max_repeat).cast(dec)
    stats = F.broadcast(
        g.select(
            group_col,
            whole.cast("int").alias("_whole"),
            F.when(capped, F.lit(0).cast(dec))
            .otherwise(num - whole.cast(dec) * den)
            .alias("_rem"),
            den.alias("_den"),
        )
    )
    probe = (
        hash32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        % 1000000
    )
    out = df.join(stats, group_col).withColumn(
        "_reps",
        F.col("_whole")
        + F.when(
            probe.cast(dec) * F.col("_den")
            < F.col("_rem") * F.lit(1000000).cast(dec),
            1,
        ).otherwise(0),
    )
    return (
        out.where(F.col("_reps") >= 1)
        .withColumn(
            "rep_idx", F.explode(F.sequence(F.lit(1), F.col("_reps")))
        )
        .drop("_whole", "_rem", "_den", "_reps")
    )


def priority_sample_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    weight,
    id_col: str = "doc_id",
    salt: str = "prio",
    n_sub: int = 64,
) -> DataFrame:
    """Weighted k-sample per group by PRIORITY SAMPLING (Duffield, Lund
    & Thorup: priority = u/w with u uniform; keep the k smallest) — the
    scheme whose selected set supports unbiased subset-sum estimation,
    here as the quality-weighted subsample step of a curation pipeline.

    Deterministic and engine-exact: u = (hash32(salt:id)+1) / 2^32 and
    priority = u / w are two IEEE divisions both engines round
    identically, and ranks break ties on (priority, id).  Rows with
    w <= 0 (or null) are excluded — zero weight means never sampled.

    Skew-safe like `bottom_k_per_group`: stage 1 ranks inside
    (group, hash % n_sub) sub-streams and keeps k per sub-stream, stage
    2 re-ranks the <= k*n_sub survivors — no whole-group single-task
    sort.  Returns the input columns + ``priority`` + ``prio_rank``.
    """
    if k <= 0 or n_sub <= 0:
        raise ValueError("priority_sample_per_group needs positive k/n_sub")
    w_col = weight if isinstance(weight, Column) else F.col(weight)
    h = hash32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    pri = ((h + F.lit(1)) / F.lit(4294967296.0)) / w_col
    base = (
        df.where(w_col > 0)
        .withColumn("priority", pri)
        .withColumn("_ps_shard", F.pmod(h, F.lit(n_sub)))
    )
    w1 = Window.partitionBy(F.col(group_col), F.col("_ps_shard")).orderBy(
        F.col("priority").asc(), F.col(id_col).asc()
    )
    stage1 = base.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.col("priority").asc(), F.col(id_col).asc()
    )
    return (
        stage1.withColumn("prio_rank", F.row_number().over(w2))
        .where(F.col("prio_rank") <= k)
        .drop("_r1", "_ps_shard")
    )
