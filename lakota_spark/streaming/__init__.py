"""Structured Streaming extension (SURVEY.md §2.11).

The reference has no streaming runtime — its closest shapes are the
pull-based `paginate` reader and "later write overlays earlier data".
Here the same commit-log storage becomes a streaming SINK: every
micro-batch lands as one atomic revision (`foreachBatch` → `Series.write`),
so late data follows the reference's overlay semantics automatically and
readers time-travel over micro-batch history.

Also provided: watermarked tumbling-window rollups (the streaming twin of
the reference's `(floor ts unit)` + reduce) and gap-based session windows
(`F.session_window`), both stock Structured Streaming operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakota_spark.functions import FLOOR_UNITS

_WINDOW_OF_UNIT = {
    "Y": "365 days",
    "M": "30 days",
    "W": "1 week",
    "D": "1 day",
    "h": "1 hour",
    "m": "1 minute",
    "s": "1 second",
}


def stream_into_series(
    stream_df: DataFrame,
    collection,
    series_label: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    maintain_every: int | None = None,
    **maintain_kwargs,
):
    """Pipe a streaming DataFrame into a series: one revision per
    micro-batch (atomic, replayable, overlay semantics for late data).

    Returns the StreamingQuery. Exactly-once: foreachBatch may retry a
    batch on failure — the engine's content-addressed segments + the
    double-write no-op make replays idempotent, the same trick as the
    reference's SKIP-WRITE (`lakota/pod.py:201-204`).

    ``maintain_every=N`` runs `Collection.maintain(**maintain_kwargs)`
    after every Nth non-empty batch — a long-running ingest otherwise
    accretes one revision file + one small segment per trigger forever,
    and the per-commit listing cost grows with it. A threshold-crossing
    squash collapses pre-squash time travel (documented trade; pass
    ``max_revisions=None`` to keep history and only defrag).
    """
    series = collection.series(series_label)
    n_written = 0

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_written
        if batch_df.isEmpty():
            return
        series.write(batch_df)
        n_written += 1
        if maintain_every and n_written % maintain_every == 0:
            collection.maintain(**maintain_kwargs)

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_rollup(
    stream_df: DataFrame,
    ts_col: str,
    unit: str = "h",
    watermark: str = "10 minutes",
    value_col: str = "value",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Streaming tumbling-window aggregate — `(floor self.ts unit)` +
    reduce, with late-data handling the reference lacks: rows later than
    ``watermark`` are dropped, everything else re-aggregates its window."""
    if unit not in FLOOR_UNITS and unit not in _WINDOW_OF_UNIT:
        raise ValueError(f"unknown unit {unit!r}")
    keys = [
        F.window(F.col(ts_col), _WINDOW_OF_UNIT[unit]).alias("bucket"),
        *[F.col(k) for k in (extra_keys or [])],
    ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def session_rollup(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows (`F.session_window`) — the streaming twin
    of queries/parity.sessionize."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup in-stream: the streaming twin of
    `operators.dedup.exact_dedup` for ingest pipelines.

    Rows are keyed by the normalized-text fingerprint;
    ``dropDuplicatesWithinWatermark`` keeps state only for the watermark
    horizon, so the state store stays bounded no matter how long the
    stream runs — the right shape for a 100 TB/day ingest where a global
    dedup state would grow forever. (Cross-horizon dedup belongs to the
    batch operator over the landed table.)
    """
    from lakota_spark.functions import fingerprint

    return (
        stream_df.withColumn("digest", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def streaming_near_dup_filter(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH near-dup gate in-stream — the streaming twin of
    `operators.dedup.minhash_dedup`'s candidate stage.

    MinHash band keys are computed PER ROW with array expressions
    (`array_min(transform(shingles, hash))` — no shuffle, no groupBy, so
    it streams in append mode). LSH candidacy is ANY-band collision, so
    the gate chains one ``dropDuplicatesWithinWatermark`` per band: a doc
    whose band-b key matches an earlier doc's is dropped at stage b; a
    doc passes only if every band is first-seen. State per stage is one
    key per band value, bounded by the watermark horizon; cross-horizon
    near-dup belongs to the batch operator over the landed table.

    Unlike the batch pipeline there is no exact-Jaccard verify tier (that
    needs a corpus self-join): this is the high-recall ingest gate —
    band collisions of genuinely-dissimilar docs (P ≈ j^r per band) are
    the documented false-drop trade.
    """
    from lakota_spark.functions import hash32, tokens, word_shingles

    rows_per_band = num_hashes // bands
    shingles = word_shingles(tokens(text_col), n)
    mh = [
        F.array_min(F.transform(shingles, _seeded_hash(hash32, k)))
        for k in range(num_hashes)
    ]
    band_cols = {
        f"_band_{b}": F.concat_ws(
            "-",
            *[
                c.cast("string")
                for c in mh[b * rows_per_band : (b + 1) * rows_per_band]
            ],
        )
        for b in range(bands)
    }
    out = stream_df.withColumns(band_cols).withWatermark(ts_col, watermark)
    for name in band_cols:
        out = out.dropDuplicatesWithinWatermark([name])
    return out.drop(*band_cols)


def streaming_near_dup_vs_corpus(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """VERIFIED near-dup gate against the landed corpus — the streaming
    twin of `operators.dedup.minhash_dedup`'s full pipeline, including
    the exact-Jaccard tier the in-stream gate can't afford.

    Shape: per-row band keys (array exprs, no shuffle) → one
    stream-static LEFT ANTI join per band, equi on the band key with the
    exact set-Jaccard >= threshold as an extra join condition. A stream
    row is dropped iff some landed doc collides on a band AND genuinely
    clears the similarity bar — band collisions of dissimilar docs
    survive, so unlike `streaming_near_dup_filter` this gate has NO
    false drops (up to MinHash recall).

    Stream-static joins are STATELESS: nothing accumulates across
    triggers, the static side is re-resolved per micro-batch (a growing
    landed table is picked up on file-source refresh). At 100 TB land
    the corpus band table as parquet bucketed by band key so each
    micro-batch join is a pruned lookup, not a corpus scan; the per-band
    anti-join chain keeps every join an equi-join (an ANY-band OR
    condition would degenerate to a nested loop).
    """
    out = stream_df.withColumns(
        _near_dup_cols(text_col, n, num_hashes, bands)
    )
    corpus = corpus_df.withColumns(
        _near_dup_cols(text_col, n, num_hashes, bands)
    ).select("_shset", *[f"_band_{b}" for b in range(bands)])
    out = _anti_join_bands(out, corpus, bands, threshold)
    return out.drop("_shset", *[f"_band_{b}" for b in range(bands)])


def _near_dup_cols(text_col: str, n: int, num_hashes: int, bands: int):
    """Per-row MinHash band-key columns + distinct shingle set (pure
    array exprs, no shuffle) — the probe/index schema shared by the
    static-corpus gate and `NearDupIndex`."""
    from lakota_spark.functions import hash32, tokens, word_shingles

    rows_per_band = num_hashes // bands
    sh = word_shingles(tokens(text_col), n)
    mh = [
        F.array_min(F.transform(sh, _seeded_hash(hash32, k)))
        for k in range(num_hashes)
    ]
    cols = {
        f"_band_{b}": F.concat_ws(
            "-",
            *[
                c.cast("string")
                for c in mh[b * rows_per_band : (b + 1) * rows_per_band]
            ],
        )
        for b in range(bands)
    }
    cols["_shset"] = F.array_distinct(sh)
    return cols


def _anti_join_bands(out, corpus, bands: int, threshold: float):
    """One stream-static LEFT ANTI equi-join per band with the exact
    set-Jaccard bar as an extra join condition (see
    `streaming_near_dup_vs_corpus` for why per-band chains beat an
    ANY-band OR: the OR degenerates to a nested loop)."""
    for b in range(bands):
        # rebuild the condition against the CURRENT plans: column refs
        # resolved on a pre-join frame don't survive into the next join
        inter = F.size(F.array_intersect(out["_shset"], corpus["_shset"]))
        union = (
            F.size(out["_shset"]) + F.size(corpus["_shset"]) - inter
        ).cast("double")
        sim_bar = inter >= F.lit(threshold) * union
        out = out.join(
            corpus,
            (out[f"_band_{b}"] == corpus[f"_band_{b}"]) & sim_bar,
            "left_anti",
        )
    return out


def _seeded_hash(hash32, k):
    # affine minhash family over ONE md5-derived base hash per shingle
    # (operators/dedup.minhash_hash_k) — kept in lockstep with the batch
    # pipeline so the near_dup_gate batch oracle reproduces band keys.
    # Closure, not a default arg: a second lambda param would switch
    # F.transform to its (element, index) form
    from lakota_spark.operators.dedup import minhash_hash_k

    return lambda s: minhash_hash_k(hash32(s), k)


def stateful_running_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
):
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum) maintained across micro-batches — the escape
    hatch for stateful logic that windowed aggregation can't express
    (the reference has no streaming state at all; SURVEY §2.11).

    Emits one row per key per batch with the cumulative totals. State is
    two floats per key — bounded, partitioned by key, scales with
    distinct keys not with throughput.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("key", LongType()),
            StructField("total_count", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_type = StructType(
        [
            StructField("cnt", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"key": [key[0]], "total_count": [cnt], "total_value": [total]}
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_type,
            stateStructType=state_type,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_quality_gate(
    stream_df: DataFrame,
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Stateless Gopher/C4 quality gate on a document stream: per-row
    token-count / word-length / punctuation rules
    (`operators.text.quality_gate_col`), no watermark, no state, no
    shuffle — the filter runs inside the micro-batch scan. Identical
    expression graph batch-side, so the batch twin IS the oracle."""
    from lakota_spark.operators.text import quality_gate_col

    return stream_df.where(quality_gate_col(text_col, **thresholds))


def streaming_span_clip(
    flags: DataFrame,
    widths: tuple = (4, 6),
    drop_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Span-level cleaning of a document stream against the landed
    corpus's MATERIALIZED flagged-shingle table
    (`operators.dedup.flagged_shingle_table`): incoming docs are
    clipped/dropped where they repeat what the corpus already
    established as boilerplate/duplicated — the streaming twin of
    `clip_repeated_spans`, factored through `clip_spans_vs_flags`.

    The island merge needs a per-doc window, which streaming plans
    disallow, so this returns a ``foreachBatch``-shaped callable:
    ``writeStream.foreachBatch(streaming_span_clip(...))`` and the
    caller's ``sink(cleaned_df, batch_id)`` receives the decided batch.
    Per micro-batch the static flags are a pruned equi-join (at 100 TB,
    materialize the flags bucketed by shingle); no state accumulates
    across triggers.
    """
    from lakota_spark.operators.dedup import clip_spans_vs_flags

    def transform(batch_df: DataFrame, sink):
        return sink(
            clip_spans_vs_flags(
                batch_df,
                flags,
                widths=widths,
                drop_frac=drop_frac,
                text_col=text_col,
                id_col=id_col,
            )
        )

    def for_each_batch(sink):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            transform(batch_df, sink)

        return fn

    return for_each_batch


def streaming_decontaminate_gate(
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Benchmark-decontamination gate on a document stream: drop
    incoming docs sharing >= ``min_hits`` word ``n``-grams with the eval
    suite BEFORE they land — the streaming twin of
    `operators.sampling.decontaminate(mode='drop')`, factored through
    the same bloom fit/apply halves.

    foreachBatch-shaped like `streaming_span_clip` (the per-doc hit
    count needs a groupBy, which append-mode streaming plans disallow):
    ``writeStream.foreachBatch(streaming_decontaminate_gate(bench)(sink))``.
    The bloom bitmap + benchmark shingle relation are fitted ONCE at
    gate construction and reused across micro-batches (localCheckpoint)
    — per batch the work is a map-side bloom test plus an equi-join over
    the few surviving shingles; no state, no benchmark re-scan. Refit
    (re-call) when the eval suite grows, like the span gate's flags
    table."""
    from lakota_spark.operators.sampling import (
        decontaminate_with_bloom,
        fit_decontaminate_bloom,
    )

    bitmap, bench_sh = fit_decontaminate_bloom(
        benchmark, text_col=text_col, n=n, n_bits=n_bits, n_hashes=n_hashes
    )

    def for_each_batch(sink):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            sink(
                decontaminate_with_bloom(
                    batch_df,
                    bitmap,
                    bench_sh,
                    text_col=text_col,
                    id_col=id_col,
                    n=n,
                    min_hits=min_hits,
                    n_hashes=n_hashes,
                    mode="drop",
                )
            )

        return fn

    return for_each_batch


def streaming_importance_gate(
    stream_df: DataFrame,
    lr: DataFrame,
    threshold: float = 0.0,
    n_buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance gate on a document stream: score incoming docs
    against the log-ratio relation fitted on the landed corpus
    (`operators.sampling.fit_importance_lr`) and keep docs whose avg
    log ratio clears ``threshold`` — on-ingest data selection toward
    the target domain.

    The lr relation is ≤ n_buckets rows, so it collapses into a MAP
    LITERAL folded per row with array lambdas (tokenize → bucket →
    map lookup → integer micro-nat sum): a pure stateless projection —
    zero shuffle, zero state, valid in any streaming output mode, and
    exactly the inner-join semantics of the batch twin
    `score_against_lr` (map misses are dropped from both the sum and
    the count; docs with no scored tokens are dropped like the twin's
    join omits them). Re-call after refitting lr to pick up corpus
    drift — the artifact is versioned by the caller like the span
    gate's flags table.

    The relation ships as TWO binary literals probed positionally —
    a presence bitmap (bit ``bucket``) and a dense value blob (8
    big-endian offset-encoded bytes at ``bucket*8``) — not as
    element-wise ``F.lit`` arrays: at the 2¹⁶ buckets a real DSIR
    deployment uses, 2×65536 literal nodes cost ~7 s of plan build and
    fall out of codegen (the same pathology the bloom bitmap fixed;
    binary literals are one py4j transfer and O(1) ``substring`` +
    ``getbit`` probes in codegen — measured flat plan-build cost in
    ``n_buckets``)."""
    import struct

    from lakota_spark.functions import hash32

    rows = lr.collect()
    if not rows:
        # empty relation: the batch twin's inner join omits every doc —
        # match that instead of building a map<null,null> that fails at
        # analysis time
        return (
            stream_df.withColumn("n_tokens", F.lit(None).cast("long"))
            .withColumn("avg_log_ratio", F.lit(None).cast("double"))
            .where(F.lit(False))
        )
    # offset encoding keeps the conv()-decoded unsigned value inside
    # long range without two's-complement gymnastics; |lr_micro| is
    # ln-of-count-ratio micro-nats (< ~1e8), far inside the headroom
    offset = 1 << 62
    values = [0] * n_buckets
    present = [0] * ((n_buckets + 7) // 8)
    for r in rows:
        b = int(r["bucket"])
        if not 0 <= b < n_buckets:
            raise ValueError(f"lr bucket {b} outside [0, {n_buckets})")
        v = int(r["lr_micro"])
        if abs(v) >= (1 << 61):
            raise ValueError(f"lr_micro {v} exceeds offset headroom")
        values[b] = v + offset
        present[b // 8] |= 1 << (b % 8)
    blob = F.lit(struct.pack(f">{n_buckets}Q", *values))
    pres = F.lit(bytes(present))

    def lookup(t):
        b = F.pmod(hash32(t), F.lit(n_buckets)).cast("int")
        pbyte = F.conv(
            F.hex(F.substring(pres, (b / 8).cast("int") + 1, 1)), 16, 10
        ).cast("int")
        is_set = F.getbit(pbyte, F.pmod(b, F.lit(8)).cast("int")) == 1
        raw = F.conv(F.hex(F.substring(blob, b * 8 + 1, 8)), 16, 10)
        val = (raw.cast("decimal(20,0)") - F.lit(offset)).cast("long")
        return F.when(is_set, val)

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    hits = F.filter(
        F.transform(toks, lookup),
        lambda x: x.isNotNull(),
    )
    n = F.size(hits)
    # n == 0 → NULL score (doc carries no evidence) → gated out below,
    # matching the batch twin's inner-join omission; plain division
    # would raise under ANSI mode
    score = F.try_divide(
        F.aggregate(hits, F.lit(0).cast("long"), lambda acc, x: acc + x)
        * 1.0,
        n * 1000000,
    )
    return (
        stream_df.withColumn("n_tokens", n.cast("long"))
        .withColumn("avg_log_ratio", score)
        .where(F.col("avg_log_ratio") > F.lit(threshold))
    )


def streaming_span_clip_tracked(
    tracker,
    drop_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Span gate with an INCREMENTALLY REFRESHED flags table: each
    micro-batch first folds its shingle counts into the
    `operators.dedup.SpanFlagTracker` store, then clips against the
    updated flags — so a shingle whose document frequency crosses
    ``min_df`` mid-stream starts being clipped from that batch on
    (fold-before-clip also matches the batch oracle, which counts a
    document's own shingles toward its flags). The static
    `streaming_span_clip` variant serves a frozen corpus; this one
    serves a landed corpus that keeps growing.
    """
    from lakota_spark.operators.dedup import clip_spans_vs_flags

    widths = tuple(n for n, _ in tracker.tiers)

    def for_each_batch(sink):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            tracker.fold(batch_df, text_col=text_col, id_col=id_col)
            sink(
                clip_spans_vs_flags(
                    batch_df,
                    tracker.flags(),
                    widths=widths,
                    drop_frac=drop_frac,
                    text_col=text_col,
                    id_col=id_col,
                )
            )

        return fn

    return for_each_batch


def streaming_tokenize(
    model,
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    to_ids: bool = False,
) -> DataFrame:
    """Tokenize a document stream with a fitted BPE model
    (`operators.tokenizer`): fit once batch-side (the model is an index
    artifact, like the span-flag relation and the decontamination
    bloom), then the stateless Arrow-batched encode applies per
    micro-batch — no watermark, no state, no shuffle; the merge-rank
    dict is a few KB of closure, reused across batches. Identical
    expression graph to the batch twin, so the batch result IS the
    oracle. ``to_ids=True`` emits vocab-position ids instead of token
    strings."""
    from lakota_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_ids,
    )

    fn = bpe_tokenize_ids if to_ids else bpe_tokenize
    return fn(model, stream_df, text_col=text_col, id_col=id_col)


class NearDupIndex:
    """Append-only MinHash-LSH band index over every document KEPT so
    far — the growing-corpus complement of `streaming_near_dup_vs_corpus`
    (whose static side is frozen at plan time). Each `fold` APPENDS the
    batch's (band_id, band_key, shingle set) rows as new parquet part
    files — no merge, no rewrite, O(batch) per fold — and each `filter`
    reads the directory as of its own call, so a foreachBatch loop that
    gates then folds sees exactly the pre-batch corpus.

    Scale layout: rows are stored LONG (one per document per band) and
    PARTITIONED BY a band-key hash bucket (``bucket`` dirs, the
    `search_index.write_bm25_index` discipline), so a micro-batch gate
    join reads ONLY the buckets its own band keys hash into
    (PartitionFilters on the index scan — pinned by a plan contract) —
    per-batch gate cost is bounded by the probed buckets' postings, not
    the full landed corpus. The shingle set is stored per band row
    (bands× storage) — the classic space-for-pruning trade: the
    Jaccard verify then needs no second join back to a doc table, which
    would re-shuffle unpruned corpus rows. ``compact()`` (owner-called
    at `maintain` cadence) merges each partition's accumulated per-fold
    part files down to one, bounding file count between compactions at
    O(folds x touched partitions) and after at O(bands x n_buckets) —
    and GROWS the bucket count with the corpus (next power of two
    keeping mean rows/bucket ≤ ``rows_per_bucket_target``, re-bucketing
    during the rewrite it was doing anyway, new count persisted in a
    meta sidecar that restarts read back), so per-probe postings stay
    bounded on a forever-growing index.

    Single-writer contract (the `SpanFlagTracker` discipline): one
    streaming query owns the directory; `filter`'s file listing
    snapshots at call time, so the subsequent fold's append never leaks
    into the same batch's gate; `compact` runs between triggers.
    """

    def __init__(
        self,
        spark,
        path: str,
        text_col: str = "text",
        threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
        n_buckets: int = 16,
        rows_per_bucket_target: int = 100_000,
    ):
        import os

        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.threshold = threshold
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.n_buckets = n_buckets
        self.rows_per_bucket_target = rows_per_bucket_target
        os.makedirs(path, exist_ok=True)
        # bucket count is a property of the DATA layout, not the session:
        # a restart must probe with the same pmod modulus the landed rows
        # were partitioned under, or the gate silently misses dups — so
        # the persisted meta wins over the constructor arg. (Sidecar is
        # driver-local file IO like ScoreHistTracker — local-FS paths
        # only; starts with "_" so Spark's parquet reader ignores it.)
        meta = self._load_meta()
        if meta is not None:
            self.n_buckets = int(meta["n_buckets"])
        else:
            self._save_meta()

    def _meta_path(self) -> str:
        import os

        return os.path.join(self.path, "_neardup_meta.json")

    def _load_meta(self):
        import json
        import os

        if not os.path.exists(self._meta_path()):
            return None
        with open(self._meta_path()) as f:
            return json.load(f)

    def _save_meta(self) -> None:
        import json
        import os

        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_buckets": self.n_buckets}, f)
        os.replace(tmp, self._meta_path())

    def _bucket_of(self, key_col):
        from lakota_spark.functions import hash32

        return F.pmod(hash32(key_col), F.lit(self.n_buckets)).cast("int")

    def _band_rows(self, df: DataFrame) -> DataFrame:
        """Long-format (band_id, band_key, bucket, _shset) rows."""
        import functools

        wide = df.withColumns(
            _near_dup_cols(self.text_col, self.n, self.num_hashes, self.bands)
        )
        parts = [
            wide.select(
                F.lit(b).alias("band_id"),
                F.col(f"_band_{b}").alias("band_key"),
                F.col("_shset"),
            )
            for b in range(self.bands)
        ]
        long = functools.reduce(DataFrame.unionByName, parts)
        return long.withColumn("bucket", self._bucket_of(F.col("band_key")))

    def _corpus(self) -> DataFrame | None:
        import os

        if not any(
            name.startswith("bucket=") for name in os.listdir(self.path)
        ):
            return None
        return self.spark.read.parquet(self.path)

    def filter(self, df: DataFrame) -> DataFrame:
        """Rows of ``df`` that are NOT verified near-dups of any indexed
        document (per-band equi-join + exact Jaccard bar — no false
        drops up to MinHash recall, same contract as the static gate).

        The batch's (band, bucket) probe set is one bounded collect
        (≤ bands × n_buckets pairs) off a checkpointed probe relation;
        each band's anti-join then scans only its own probed partitions
        (PartitionFilters), so gate latency tracks the probed buckets,
        not the total landed index."""
        corpus = self._corpus()
        if corpus is None:
            return df
        out = df.withColumns(
            _near_dup_cols(self.text_col, self.n, self.num_hashes, self.bands)
        ).localCheckpoint(eager=False)
        probe = (
            out.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band_id"),
                                self._bucket_of(
                                    F.col(f"_band_{b}")
                                ).alias("bucket"),
                            )
                            for b in range(self.bands)
                        ]
                    )
                ).alias("p")
            )
            .select("p.band_id", "p.bucket")
            .distinct()
            .collect()
        )
        buckets_by_band: dict[int, list[int]] = {}
        for r in probe:
            buckets_by_band.setdefault(r["band_id"], []).append(r["bucket"])
        for b in range(self.bands):
            bks = buckets_by_band.get(b)
            if not bks:
                continue
            side = corpus.where(
                (F.col("band_id") == b) & F.col("bucket").isin(bks)
            ).select("band_key", "_shset")
            inter = F.size(F.array_intersect(out["_shset"], side["_shset"]))
            union = (
                F.size(out["_shset"]) + F.size(side["_shset"]) - inter
            ).cast("double")
            sim_bar = inter >= F.lit(self.threshold) * union
            out = out.join(
                side,
                (out[f"_band_{b}"] == side["band_key"]) & sim_bar,
                "left_anti",
            )
        return out.drop("_shset", *[f"_band_{b}" for b in range(self.bands)])

    def fold(self, df: DataFrame) -> None:
        """Append ``df``'s band rows to the index (O(batch) — new part
        files only in the touched bucket partitions, the landed corpus
        is never rewritten). Repartitioned by the partition columns so
        each touched partition gains ONE file per fold."""
        (
            self._band_rows(df)
            .repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(self.path)
        )

    def compact(self) -> None:
        """Merge each bucket partition's accumulated part files to one —
        `maintain`-cadence housekeeping for forever-running ingest
        (owner-called between triggers; the directory swap is atomic
        per-partition only, so readers must not race it — the
        single-writer contract already guarantees that).

        Compaction is also where the bucket count SCALES WITH THE
        CORPUS: when mean rows/bucket exceeds ``rows_per_bucket_target``
        the count doubles to the next power of two that restores the
        target, the rewrite re-buckets every row under the new modulus
        (free — compaction rewrites everything anyway), and the new
        count is persisted so restarts probe the right partitions. This
        keeps per-probe postings bounded as the index grows instead of
        letting each (band, bucket) partition swell linearly — the
        "n_buckets scaled up with the corpus" half of the pruning
        story, previously a docstring promise."""
        import os
        import shutil
        import uuid

        corpus = self._corpus()
        if corpus is None:
            return
        n_rows = corpus.count()
        needed = 1
        while needed * max(1, self.rows_per_bucket_target) < n_rows:
            needed *= 2
        if needed > self.n_buckets:
            self.n_buckets = needed
            corpus = corpus.withColumn(
                "bucket", self._bucket_of(F.col("band_key"))
            )
            self._save_meta()
        tmp = f"{self.path}-compact-{uuid.uuid4().hex[:8]}"
        (
            corpus.repartition("bucket")
            .write.partitionBy("bucket")
            .parquet(tmp)
        )
        for name in os.listdir(self.path):
            if name.startswith("bucket="):
                shutil.rmtree(f"{self.path}/{name}")
        for name in os.listdir(tmp):
            if name.startswith("bucket="):
                os.rename(f"{tmp}/{name}", f"{self.path}/{name}")
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_near_dup_tracked(
    index: NearDupIndex, id_col: str = "doc_id"
):
    """foreachBatch gate that dedups a stream against EVERYTHING kept so
    far: each micro-batch is (1) verified-gated against the landed index
    (band equi-joins + exact Jaccard), (2) delivered to the sink, and
    (3) its SURVIVORS appended to the index — so a document near-dup of
    any earlier-batch survivor is dropped, however far apart the batches
    are. Survivors-only indexing matches batch canonicalization (a
    dropped dup's shingles are represented by the survivor it matched).
    Within one micro-batch, co-arriving dups both pass (the batch is the
    dedup granularity; run `streaming_near_dup_filter` upstream for
    in-batch signature dedup). The batch is gated and folded through ONE
    localCheckpoint, so the anti-join runs once, not once per consumer.
    """

    def for_each_batch(sink):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            kept = index.filter(batch_df).localCheckpoint()
            try:
                sink(kept)
                index.fold(kept)
            finally:
                kept.unpersist()

        return fn

    return for_each_batch


def streaming_quality_classifier_gate(
    model,
    stream_df: DataFrame,
    alpha: int = 9,
    sharpness: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    pareto_salt: str = "qpar",
) -> DataFrame:
    """GPT-3 quality gate on a document stream: score incoming docs with
    a fitted `operators.classifier.QualityModel` and keep them by the
    Pareto acceptance rule — on-ingest learned quality selection, the
    streaming twin of `pipeline.pareto_quality_sample`'s keep=1 slice.

    Stateless per-row projection (valid in any streaming output mode,
    zero shuffle, zero state): tokenize -> bucket -> per-distinct-bucket
    micro-fraction counts -> exact long dot product against the weight
    blob -> fast sigmoid (sharpness-scaled logit) -> hash-derandomized
    Lomax(alpha) keep test. The weights ship as ONE binary literal
    probed positionally (8 big-endian offset-encoded bytes per bucket —
    the `streaming_importance_gate` transport; absent buckets encode
    weight 0, so no presence bitmap is needed). Per-row cost is
    O(distinct_buckets x tokens) from the count filter — bounded by
    n_features x doc length, the same order as the per-position shingle
    work the other gates do.

    Scoring is expression-for-expression the batch
    `quality_classifier_scores` chain (same hash, same round(1e6·cnt/len)
    fractions, same long fold), so batch output IS the oracle — pinned by
    the batch≡stream test."""
    import struct

    from lakota_spark.functions import hash32
    from lakota_spark.operators.classifier import (
        fast_sigmoid,
        pareto_keep_expr,
    )

    n_features = int(model.n_features)
    offset = 1 << 62
    values = [offset] * n_features
    for b, w in model.weights.items():
        if not 0 <= int(b) < n_features:
            raise ValueError(f"weight bucket {b} outside [0, {n_features})")
        if abs(int(w)) >= (1 << 61):
            raise ValueError(f"weight {w} exceeds offset headroom")
        values[int(b)] = int(w) + offset
    blob = F.lit(struct.pack(f">{n_features}Q", *values))

    # NULL text must behave like the batch twin (zero feature rows ->
    # score = bias), not propagate NULL through the fold and get
    # silently dropped by the final where
    toks = F.coalesce(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0),
        F.array().cast("array<string>"),
    )
    buckets = F.transform(
        toks,
        lambda t: F.pmod(
            hash32(F.concat(F.lit(f"{model.salt}:"), t)),
            F.lit(n_features),
        ).cast("int"),
    )

    def w_of(b):
        raw = F.conv(F.hex(F.substring(blob, b * 8 + 1, 8)), 16, 10)
        return (raw.cast("decimal(20,0)") - F.lit(offset)).cast("long")

    def contrib(bs, b):
        cnt = F.size(F.filter(bs, lambda x: x == b))
        x = F.round(F.lit(1000000.0) * cnt / F.size(bs)).cast("long")
        return w_of(b) * x

    z = (
        F.aggregate(
            F.array_distinct(buckets),
            F.lit(0).cast("long"),
            lambda acc, b: acc + contrib(buckets, b),
        )
        + F.lit(int(model.bias_raw))
    ).cast("long")
    prob = fast_sigmoid(z * F.lit(int(sharpness)))
    return stream_df.where(
        pareto_keep_expr(prob, id_col, int(alpha), pareto_salt)
    )


def streaming_pca_drift_monitor(
    mean: list,
    v: list,
    ref_hist: DataFrame,
    lo: float = -5.0,
    hi: float = 5.0,
    n_bins: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """foreachBatch drift monitor: project each micro-batch onto a fitted
    PCA component (`clustering.pca_project` — zero-shuffle literal pass),
    histogram the projections, and emit one PSI row per batch against the
    FROZEN reference histogram (the landed corpus at fit time) —
    on-ingest detection of embedding-distribution shift, the trigger for
    quantizer/classifier refits. The reference collapses to ≤n_bins
    driver rows once (the centroids-class bounded artifact) and is
    rebuilt as a literal relation per batch, so the monitor holds no
    stream state.

    Returns a factory: ``streaming_pca_drift_monitor(...)(sink)`` gives
    the foreachBatch fn; ``sink`` receives a ONE-ROW DataFrame
    ``(batch_id, n_vecs, psi_micro)`` per trigger (append it to a stats
    table; psi_micro > 250_000 is the conventional act threshold). The
    per-batch PSI equals the batch `drift.psi_terms` sum on the same rows
    (pinned by test)."""
    from lakota_spark.operators.clustering import pca_project
    from lakota_spark.operators.drift import histogram_counts, psi_terms

    ref_rows = [(int(r["bin"]), int(r["c"])) for r in ref_hist.collect()]

    def factory(sink):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            ref = spark.createDataFrame(ref_rows, "bin int, c long")
            pc = pca_project(batch_df, mean, v, vec_col, id_col)
            nh = histogram_counts(pc, "pc1", lo, hi, n_bins)
            stats = psi_terms(ref, nh, n_bins).agg(
                F.sum(
                    F.when(F.col("new_c") > 0, F.col("new_c")).otherwise(0)
                ).alias("n_vecs"),
                F.sum("psi_term_micro").alias("psi_micro"),
            )
            sink(
                stats.select(
                    F.lit(int(batch_id)).alias("batch_id"),
                    F.col("n_vecs").cast("long"),
                    F.col("psi_micro").cast("long"),
                )
            )

        return fn

    return factory


def streaming_media_gate(
    stream_media: DataFrame,
    keep: tuple | None = None,
) -> DataFrame:
    """Stateless multimodal ingest triage (round 8, third session): drop
    stream payloads no structural parser claims — corrupted blobs,
    mislabeled binaries, truncated uploads — before they reach the
    expensive decode/feature stages. ``keep`` optionally narrows the
    gate to an explicit kind allowlist (e.g. images only).

    One Arrow-batched MapInPandas + a codegen filter: no watermark, no
    state, no shuffle — legal in any streaming plan, and the batch twin
    (`multimodal.classify_media(...).where(...)`) is the oracle because
    the expression graph is identical. At 100 TB-ingest scale the triage
    cost is one cheap header walk per payload, far below the decode it
    shields."""
    from lakota_spark.operators.multimodal import classify_media

    k = classify_media(stream_media, with_payload=True)
    cond = (
        F.col("kind") != "unknown"
        if keep is None
        else F.col("kind").isin(list(keep))
    )
    return k.where(cond)


def streaming_decayed_activity(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "v",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    horizon: int = 30,
    shift: int = 30,
):
    """Streaming twin of ``timeseries.decayed_sum``: per-key recency-
    decayed activity maintained across micro-batches via
    ``applyInPandasWithState``.  State is the last ``horizon`` integer
    values in (ts, tiebreak) order — bounded per key — and the score is
    the SAME integer ladder as the batch operator (value at distance j
    weighs ``2**(shift - j)``), so batch == stream exactly for streams
    whose batches arrive in event order (the changelog-tail source's
    append contract; cross-batch stragglers would need full history and
    are out of scope, as with the other gates).

    Emits one row per key per batch: (key, n_events, decayed) — the
    continuously-maintained ranking/eviction feature.  State scales
    with distinct keys x horizon longs, not with throughput.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    # the key column keeps ITS OWN type (string session ids are as
    # valid as numeric user ids)
    out_type = StructType(
        [
            StructField("key", stream_df.schema[key_col].dataType),
            StructField("n_events", LongType()),
            StructField("decayed", LongType()),
        ]
    )
    # state: total count + the last `horizon` values, newest last,
    # packed as a fixed-width list column (None-padded)
    state_type = StructType(
        [StructField("cnt", LongType())]
        + [StructField(f"v{i}", LongType()) for i in range(horizon)]
    )
    ts_col, tie_col = order_cols

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            st = state.get
            cnt, tail = st[0], [v for v in st[1:] if v is not None]
        else:
            cnt, tail = 0, []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, tie_col], kind="mergesort")
        # null values occupy their slot with 0 weight — the
        # decayed_sum batch contract (int(NaN) would kill the task)
        vals = [
            0 if pd.isna(v) else int(v) for v in batch[value_col]
        ]
        cnt += len(vals)
        tail = (tail + vals)[-horizon:]
        pad = [None] * (horizon - len(tail))
        state.update(tuple([cnt] + tail + pad))
        decayed = sum(
            v << (shift - j) for j, v in enumerate(reversed(tail))
        )
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [cnt], "decayed": [decayed]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
