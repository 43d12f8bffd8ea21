"""Streaming extension: micro-batch ingest into the commit log, windowed
and session rollups with watermarks."""

import os

from lakota_spark.schema import Schema
from lakota_spark.streaming import (
    session_rollup,
    stateful_running_totals,
    stream_into_series,
    windowed_rollup,
)


def test_stream_ingest_into_series(repo, spark, tmp_path):
    # file-source stream, availableNow trigger: deterministic micro-batches
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "ts long, value double"
    ).write.parquet(f"file://{src}/b0.parquet")
    spark.createDataFrame(
        [(3, 30.0)], "ts long, value double"
    ).write.parquet(f"file://{src}/b1.parquet")

    coll = repo.create_collection(Schema(ts="int*", value="float"), "stream")
    stream = spark.readStream.schema("ts long, value double").parquet(
        f"file://{src}/*"
    )
    q = stream_into_series(
        stream,
        coll,
        "events",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    out = coll.series("events").frame().collect()
    assert [(r.ts, r.value) for r in out] == [(1, 10.0), (2, 20.0), (3, 30.0)]
    # micro-batches are revisions: history is time-travelable
    assert len(coll.changelog.revisions()) >= 1


def test_stream_ingest_maintain_every(repo, spark, tmp_path):
    # maintain_every triggers the threshold policy inside foreachBatch:
    # with max_revisions=2 the 4-batch ingest must squash at least once,
    # keeping the log bounded with all data intact
    src = str(tmp_path / "msrc")
    os.makedirs(src)
    for b in range(4):
        spark.createDataFrame(
            [(b, float(b) * 10)], "ts long, value double"
        ).write.parquet(f"file://{src}/b{b}.parquet")
    coll = repo.create_collection(Schema(ts="int*", value="float"), "mstream")
    stream = spark.readStream.schema("ts long, value double").parquet(
        f"file://{src}/*"
    )
    q = stream_into_series(
        stream,
        coll,
        "events",
        checkpoint_dir=str(tmp_path / "mckpt"),
        trigger={"availableNow": True},
        maintain_every=1,
        max_revisions=2,
        max_segments=None,
    )
    q.awaitTermination(120)
    out = coll.series("events").frame().collect()
    assert sorted((r.ts, r.value) for r in out) == [
        (0, 0.0), (1, 10.0), (2, 20.0), (3, 30.0)
    ]
    # squash ran: the log never grew past threshold+1 and ends compact
    assert len(coll.changelog.revisions()) <= 3


def test_windowed_rollup_batch_parity(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 5), 1.0),
            (dt.datetime(2024, 1, 1, 10, 55), 2.0),
            (dt.datetime(2024, 1, 1, 11, 5), 4.0),
        ],
        "ts timestamp, value double",
    )
    # the same plan compiles for batch DataFrames — verify semantics there
    out = windowed_rollup(df, "ts", unit="h").collect()
    got = {r.bucket.start.hour: (r.n, r.sum_value) for r in out}
    assert got == {10: (2, 3.0), 11: (1, 4.0)}


def test_session_rollup_batch_parity(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 0), "u1", 1.0),
            (dt.datetime(2024, 1, 1, 10, 10), "u1", 2.0),
            (dt.datetime(2024, 1, 1, 12, 0), "u1", 5.0),
        ],
        "ts timestamp, user string, value double",
    )
    out = session_rollup(df, "ts", "user").collect()
    assert sorted((r.n_events, r.session_value) for r in out) == [
        (1, 5.0), (2, 3.0)
    ]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State must carry across micro-batches: two files, one per trigger."""
    import pandas as pd

    src = str(tmp_path / "ssrc")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    ).write.parquet(f"file://{src}/b0.parquet")
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "user_id long, value double"
    ).write.parquet(f"file://{src}/b1.parquet")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"file://{src}/*")
    )
    out_dir = str(tmp_path / "out")
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from totals").collect()
    # final cumulative state per key must reflect BOTH batches
    final = {}
    for r in rows:
        final[r.key] = (r.total_count, r.total_value)
    assert final[1] == (3, 17.0)
    assert final[2] == (2, 4.0)


def test_streaming_dedup(spark, tmp_path):
    # exact dedup in-stream: duplicate text within the watermark horizon
    # is dropped; state stays bounded by the watermark.
    import datetime as dt
    import os as _os

    from lakota_spark.streaming import streaming_dedup

    src = str(tmp_path / "dsrc")
    _os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [
            (t0, 1, "Hello, World"),
            (t0, 2, "hello world!"),   # dup by normalized fingerprint
            (t0, 3, "something else"),
        ],
        "ts timestamp, doc_id long, text string",
    ).write.parquet(f"file://{src}/b0.parquet")
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string"
    ).parquet(f"file://{src}/*")
    out_path = str(tmp_path / "dout")
    q = (
        streaming_dedup(stream, watermark="5 minutes")
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(f"file://{out_path}").collect()
    texts = sorted(r.doc_id for r in rows)
    assert len(texts) == 2          # one of the two dups survived
    assert 3 in texts               # the distinct doc always lands


def test_streaming_near_dup_filter(spark, tmp_path):
    # LSH gate in-stream: a near-copy sharing every band with an earlier
    # doc is dropped; novel docs pass; state bounded by watermark
    import datetime as dt
    import os as _os

    from lakota_spark.streaming import streaming_near_dup_filter

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    near = base + "tail"  # shares nearly all shingles -> all bands collide
    src = str(tmp_path / "ndsrc")
    _os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [(t0, 1, base), (t0, 2, "completely different words entirely " * 6)],
        "ts timestamp, doc_id long, text string",
    ).write.parquet(f"file://{src}/b0.parquet")
    spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=1), 3, near),
         (t0 + dt.timedelta(minutes=1), 4, "novel content nothing alike " * 6)],
        "ts timestamp, doc_id long, text string",
    ).write.parquet(f"file://{src}/b1.parquet")
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string"
    ).parquet(f"file://{src}/*")
    out_path = str(tmp_path / "ndout")
    q = (
        streaming_near_dup_filter(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "ndckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    kept = sorted(
        r.doc_id for r in spark.read.parquet(f"file://{out_path}").collect()
    )
    assert 2 in kept and 4 in kept      # distinct docs always pass
    assert len([d for d in kept if d in (1, 3)]) == 1  # near-pair collapsed


def test_streaming_near_dup_vs_corpus(spark, tmp_path):
    # verified gate: band collision alone is NOT enough — only stream rows
    # exactly-Jaccard-similar to a landed doc are dropped (no false drops)
    import datetime as dt
    import os as _os

    from lakota_spark.streaming import streaming_near_dup_vs_corpus

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    near = base + "tail"          # true near-dup of the landed doc
    novel = "completely different words entirely nothing alike here " * 6
    corpus = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    src = str(tmp_path / "vsrc")
    _os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [(t0, 1, near), (t0, 2, novel)],
        "ts timestamp, doc_id long, text string",
    ).write.parquet(f"file://{src}/b0.parquet")
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string"
    ).parquet(f"file://{src}/*")
    out_path = str(tmp_path / "vout")
    q = (
        streaming_near_dup_vs_corpus(stream, corpus, threshold=0.5)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    kept = sorted(
        r.doc_id for r in spark.read.parquet(f"file://{out_path}").collect()
    )
    assert kept == [2]  # near-dup of landed doc dropped, novel doc passes

    # batch parity of the same expression graph: a band-colliding but
    # DISSIMILAR doc must survive (the in-stream gate would drop it)
    from lakota_spark.operators.dedup import jaccard_pairs  # noqa: F401

    batch = spark.createDataFrame(
        [(1, near), (2, novel)], "doc_id long, text string"
    )
    out = streaming_near_dup_vs_corpus(batch, corpus, threshold=0.99)
    # at threshold .99 even the near-dup isn't similar enough -> both pass
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_streaming_quality_gate(spark, tmp_path):
    # stateless Gopher gate on a real micro-batch stream: batch twin on
    # the same data is the oracle (identical expression graph)
    import os as _os

    from lakota_spark.operators.text import quality_gate_col
    from lakota_spark.streaming import streaming_quality_gate

    good = " ".join(f"token{i}" for i in range(30))          # passes
    short = "too short"                                       # n_tok < 25
    shouty = " ".join("!!!" for _ in range(30))               # punct + mwl
    rows = [(1, good), (2, short), (3, shouty), (4, good + " extra words here")]
    src = str(tmp_path / "qsrc")
    _os.makedirs(src)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"file://{src}/b0.parquet"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = str(tmp_path / "qout")
    q = (
        streaming_quality_gate(stream)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    survived = {
        r.doc_id for r in spark.read.parquet(f"file://{out_path}").collect()
    }
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    expected = {
        r.doc_id for r in batch.where(quality_gate_col()).collect()
    }
    assert survived == expected == {1, 4}


def test_streaming_chunking_stateless(spark, tmp_path):
    # chunk_documents is pure map-side (sequence+explode+slice): the
    # identical operator applies to a stream with no watermark/state
    import os as _os

    from lakota_spark.operators.text import chunk_documents

    text = " ".join(f"tok{i}" for i in range(40))
    src = str(tmp_path / "csrc")
    _os.makedirs(src)
    spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).write.parquet(f"file://{src}/b0.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = str(tmp_path / "cout")
    q = (
        chunk_documents(stream)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(f"file://{out_path}")
            .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
            .collect())
    )
    batch = sorted(
        map(tuple, chunk_documents(
            spark.createDataFrame([(1, text)], "doc_id long, text string"))
            .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
            .collect())
    )
    assert got == batch and len(got) == 2


def test_jsonl_stream_ingest_with_quality_gate(spark, tmp_path):
    # the canonical corpus ingest chain: JSONL file stream -> stateless
    # Gopher gate -> landed parquet table; two micro-batch drops
    import json as _json
    import os as _os

    from lakota_spark.streaming import streaming_quality_gate

    src = str(tmp_path / "jsrc")
    _os.makedirs(src)
    good = " ".join(f"tok{i}" for i in range(30))
    with open(f"{src}/b0.jsonl", "w") as fh:
        fh.write(_json.dumps({"doc_id": 1, "text": good}) + "\n")
        fh.write(_json.dumps({"doc_id": 2, "text": "too short"}) + "\n")
    with open(f"{src}/b1.jsonl", "w") as fh:
        fh.write(_json.dumps({"doc_id": 3, "text": good + " more"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(
        f"file://{src}/*"
    )
    out_path = str(tmp_path / "jout")
    q = (
        streaming_quality_gate(stream)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = {r.doc_id for r in spark.read.parquet(f"file://{out_path}").collect()}
    assert landed == {1, 3}


def test_streaming_span_clip_vs_batch(spark, tmp_path):
    # span gate on a real micro-batch stream: flags learned from the
    # LANDED corpus; the batch twin (clip_spans_vs_flags on the same
    # rows) is the oracle
    import os as _os

    from lakota_spark.operators.dedup import (
        clip_spans_vs_flags,
        flagged_shingle_table,
    )
    from lakota_spark.streaming import streaming_span_clip

    boiler = "all rights reserved subscribe to our newsletter today"
    corpus_rows = [
        (100 + i, f"landed doc {i} " + boiler) for i in range(8)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    flags = flagged_shingle_table(corpus, tiers=((4, 4), (6, 4)))

    stream_rows = [
        (1, "fresh unique words nothing shared " + boiler),  # clipped
        (2, "completely novel text with no overlap at all"),  # kept
        (3, boiler),                                          # dropped
    ]
    src = str(tmp_path / "ssrc")
    _os.makedirs(src)
    spark.createDataFrame(
        stream_rows, "doc_id long, text string"
    ).write.parquet(f"file://{src}/b0.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = f"file://{tmp_path}/sout"

    def sink(cleaned):
        cleaned.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(
            streaming_span_clip(flags)(sink)
        )
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out_path).collect()))
    batch = sorted(
        map(
            tuple,
            clip_spans_vs_flags(
                spark.createDataFrame(
                    stream_rows, "doc_id long, text string"
                ),
                flags,
            ).collect(),
        )
    )
    assert got == batch
    actions = {r[0]: r[3] for r in got}
    assert actions[2] == "keep" and actions[3] == "drop"
    assert actions[1] in ("clip", "drop")


def test_streaming_decontaminate_gate_vs_batch(spark, tmp_path):
    # decontamination gate on a real micro-batch stream across TWO
    # triggers; the batch twin (decontaminate mode='drop' on the same
    # rows) is the oracle — and a tiny bitmap forces bloom collisions,
    # which the exact verify must absorb
    import os as _os

    from lakota_spark.operators.sampling import decontaminate
    from lakota_spark.streaming import streaming_decontaminate_gate

    bench_rows = [
        (900, "question what is the capital of france answer paris"),
        (901, "translate the following sentence into german please"),
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    stream_rows = [
        (1, "prefix text question what is the capital of france answer paris"),
        (2, "novel document with entirely original content here"),
        (3, "translate the following sentence into german please suffix"),
        (4, "another clean document nothing shared with any benchmark"),
    ]
    src = str(tmp_path / "dsrc")
    _os.makedirs(src)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    mk(stream_rows[:2]).write.parquet(f"file://{src}/b0.parquet")
    mk(stream_rows[2:]).write.parquet(f"file://{src}/b1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = f"file://{tmp_path}/dout"

    def sink(clean):
        clean.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(
            streaming_decontaminate_gate(bench, n=4, n_bits=256)(sink)
        )
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out_path).collect())
    batch = sorted(
        r.doc_id
        for r in decontaminate(
            mk(stream_rows), bench, n=4, mode="drop"
        ).collect()
    )
    assert got == batch == [2, 4]


def test_streaming_span_clip_tracked_flag_appears_midstream(spark, tmp_path):
    # incremental flags refresh: a shingle that crosses min_df only
    # after several batches must start being clipped from that batch on
    # (VERDICT r5 ask #6); the final materialized flags must equal the
    # one-shot batch artifact on the full landed corpus
    import os as _os
    import time as _time

    from lakota_spark.operators.dedup import (
        SpanFlagTracker,
        clip_spans_vs_flags,
        flagged_shingle_table,
    )
    from lakota_spark.streaming import streaming_span_clip_tracked

    boiler = "subscribe to our newsletter today please"
    # every non-boiler 4-gram must contain an i-specific token, else the
    # shared template itself crosses min_df and the docs drop entirely
    mk = lambda i: (
        i,
        f"doc {i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i} "
        f"zeta{i} eta{i} theta{i} iota{i} kappa{i} " + boiler,
    )
    b0_rows = [mk(1), mk(2)]           # df(boiler 4-grams) = 2 < 4
    b1_rows = [mk(3), mk(4)]           # df crosses 4 -> flags appear
    src = str(tmp_path / "tsrc")
    _os.makedirs(src)
    spark.createDataFrame(b0_rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"file://{src}/b0.parquet")
    _time.sleep(1.1)  # distinct mtimes: file source processes oldest first
    spark.createDataFrame(b1_rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"file://{src}/b1.parquet")

    tracker = SpanFlagTracker(
        spark, str(tmp_path / "flags"), tiers=((4, 4),)
    )
    out_path = f"file://{tmp_path}/tout"

    def sink(cleaned):
        cleaned.write.mode("append").parquet(out_path)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"file://{src}/*")
        .writeStream.foreachBatch(streaming_span_clip_tracked(tracker)(sink))
        .option("checkpointLocation", str(tmp_path / "tckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r for r in spark.read.parquet(out_path).collect()}
    assert set(got) == {1, 2, 3, 4}
    # batch 0: boiler seen only twice -> under min_df, nothing clipped
    assert got[1]["action"] == "keep" and got[2]["action"] == "keep"
    # batch 1: the fold pushed the boiler shingles to df=4 -> clipped,
    # and the rebuilt text no longer contains the boilerplate
    for i in (3, 4):
        assert got[i]["action"] == "clip"
        assert "newsletter" not in got[i]["text_clean"]
        assert f"kappa{i}" in got[i]["text_clean"]

    # the incrementally-merged artifact == the one-shot batch artifact
    full = spark.createDataFrame(
        b0_rows + b1_rows, "doc_id long, text string"
    )
    want = sorted(
        map(tuple, flagged_shingle_table(full, tiers=((4, 4),)).collect())
    )
    have = sorted(map(tuple, tracker.flags().collect()))
    assert have == want
    # and the stream's batch-1 output == the batch twin on those flags
    batch_twin = {
        r["doc_id"]: r
        for r in clip_spans_vs_flags(
            spark.createDataFrame(b1_rows, "doc_id long, text string"),
            tracker.flags(),
            widths=(4,),
        ).collect()
    }
    for i in (3, 4):
        assert got[i]["text_clean"] == batch_twin[i]["text_clean"]
        assert got[i]["action"] == batch_twin[i]["action"]


def test_streaming_importance_gate_vs_batch(spark, tmp_path):
    # DSIR gate in-stream: scores from the map-literal fold must equal
    # the batch twin's join-based scores; only above-threshold docs pass
    import os as _os

    from lakota_spark.operators.sampling import (
        fit_importance_lr,
        score_against_lr,
    )
    from lakota_spark.streaming import streaming_importance_gate
    from pyspark.sql import functions as F

    corpus_rows = [(i, "quantum physics entropy theorem proof", "tgt") for i in range(10)]
    corpus_rows += [(100 + i, "celebrity gossip scandal rumor tabloid", "raw") for i in range(10)]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string, domain string"
    )
    lr = fit_importance_lr(corpus, target_filter=(F.col("domain") == "tgt"))

    stream_rows = [
        (1, "quantum entropy proof theorem physics theorem"),  # target-like
        (2, "gossip tabloid scandal rumor celebrity gossip"),  # off-target
        (3, "zzzqx"),                                          # no scored tokens
    ]
    src = str(tmp_path / "isrc")
    _os.makedirs(src)
    spark.createDataFrame(
        stream_rows, "doc_id long, text string"
    ).write.parquet(f"file://{src}/b0.parquet")
    out_path = f"file://{tmp_path}/iout"
    q = (
        streaming_importance_gate(
            spark.readStream.schema("doc_id long, text string").parquet(
                f"file://{src}/*"
            ),
            lr,
        )
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ickpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.read.parquet(out_path).collect()}
    assert set(got) == {1}  # target-like passes, off-target + empty drop

    batch = {
        r["doc_id"]: r
        for r in score_against_lr(
            spark.createDataFrame(stream_rows, "doc_id long, text string"),
            lr,
        ).collect()
    }
    assert got[1]["avg_log_ratio"] == batch[1]["avg_log_ratio"]
    assert got[1]["n_tokens"] == batch[1]["n_tokens"]
    assert batch[2]["avg_log_ratio"] <= 0  # twin agrees doc 2 is off-target
    assert 3 not in batch  # no scored tokens -> omitted by the twin too


def test_streaming_importance_gate_negative_scores_bit_exact(spark):
    # The binary-literal decode must round-trip NEGATIVE lr_micro values
    # bit-exactly (offset encoding): lower the threshold so off-target
    # docs FLOW THROUGH the gate and their scores compare against the
    # join-based batch twin. Batch DataFrame input keeps this a plan
    # test — the gate is a stateless projection either way.
    from lakota_spark.operators.sampling import (
        fit_importance_lr,
        score_against_lr,
    )
    from lakota_spark.streaming import streaming_importance_gate
    from pyspark.sql import functions as F

    corpus_rows = [
        (i, "quantum physics entropy theorem proof", "tgt")
        for i in range(10)
    ]
    corpus_rows += [
        (100 + i, "celebrity gossip scandal rumor tabloid", "raw")
        for i in range(10)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string, domain string"
    )
    lr = fit_importance_lr(corpus, target_filter=(F.col("domain") == "tgt"))
    probe = spark.createDataFrame(
        [
            (1, "quantum entropy proof theorem physics theorem"),
            (2, "gossip tabloid scandal rumor celebrity gossip"),
            (3, "zzzqx"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in streaming_importance_gate(
            probe, lr, threshold=-1e9
        ).collect()
    }
    twin = {
        r["doc_id"]: r for r in score_against_lr(probe, lr).collect()
    }
    assert set(got) == {1, 2}  # doc 3: no scored tokens, omitted
    for d in (1, 2):
        assert got[d]["avg_log_ratio"] == twin[d]["avg_log_ratio"]
        assert got[d]["n_tokens"] == twin[d]["n_tokens"]
    assert twin[2]["avg_log_ratio"] < 0  # the negative-decode case


def test_streaming_importance_gate_empty_lr(spark):
    # Empty lr relation: the batch twin's inner join omits every doc —
    # the gate must do the same instead of failing analysis on a
    # map<null,null> literal (ADVICE r6).
    from lakota_spark.streaming import streaming_importance_gate

    empty_lr = spark.createDataFrame([], "bucket int, lr_micro long")
    probe = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    out = streaming_importance_gate(probe, empty_lr)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "text",
        "n_tokens",
        "avg_log_ratio",
    ]


def test_stream_ingest_maintain_keep_window(repo, spark, tmp_path):
    # maintain(keep=...) inside foreachBatch: the triggered squash must
    # retain a time-travel window, so `before=` inside it still resolves
    # after the mid-stream maintenance (r6 verdict ask #7)
    import datetime as dt

    src = str(tmp_path / "ksrc")
    os.makedirs(src)
    for b in range(6):
        spark.createDataFrame(
            [(b, float(b) * 10)], "ts long, value double"
        ).write.parquet(f"file://{src}/b{b}.parquet")
    coll = repo.create_collection(Schema(ts="int*", value="float"), "kstream")
    stream = (
        spark.readStream.schema("ts long, value double")
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(f"file://{src}/*")
    )
    q = stream_into_series(
        stream,
        coll,
        "events",
        checkpoint_dir=str(tmp_path / "kckpt"),
        trigger={"availableNow": True},
        maintain_every=3,
        max_revisions=2,
        max_segments=None,
        keep=dt.timedelta(hours=1),  # everything is inside the window
    )
    q.awaitTermination(120)
    out = coll.series("events").frame().collect()
    assert sorted((r.ts, r.value) for r in out) == [
        (i, float(i) * 10) for i in range(6)
    ]
    # the squash ran (log re-rooted) but the window survived: time
    # travel to each retained revision's epoch still resolves
    log = coll.changelog.log()
    assert len(log) >= 2
    mid = log[len(log) // 2]
    snap = coll.snapshot(before=mid.epoch + 0.0005)
    assert sum(s.length for s in snap.for_label("events")) > 0


def test_streaming_tokenize_matches_batch(spark, tmp_path):
    # fitted-BPE encode is stateless: the identical UDF graph applies to
    # a micro-batch stream; the batch twin on the same rows is the oracle
    import os as _os

    from lakota_spark.operators.tokenizer import bpe_tokenize_ids, fit_bpe
    from lakota_spark.streaming import streaming_tokenize

    rows = [
        (1, "the cat sat on the mat"),
        (2, "lower newest widest"),
        (3, "the the the unseen ZZZ"),
        (4, ""),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    model = fit_bpe(batch, n_merges=25, max_words=500)
    src = str(tmp_path / "tsrc")
    _os.makedirs(src)
    # two files -> two micro-batches under availableNow
    batch.where("doc_id <= 2").write.parquet(f"file://{src}/b0.parquet")
    batch.where("doc_id > 2").write.parquet(f"file://{src}/b1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = str(tmp_path / "tout")
    q = (
        streaming_tokenize(model, stream, to_ids=True)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "tckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: list(r.input_ids)
        for r in spark.read.parquet(f"file://{out_path}").collect()
    }
    exp = {
        r.doc_id: list(r.input_ids)
        for r in bpe_tokenize_ids(model, batch).collect()
    }
    assert got == exp
    assert got[4] == []


def test_near_dup_index_filter_and_fold(spark, tmp_path):
    # direct contract: empty index passes everything; after folding, an
    # exact copy is dropped, disjoint text passes, and a band-colliding-
    # but-dissimilar doc would survive the Jaccard bar (verified gate)
    from lakota_spark.streaming import NearDupIndex

    idx = NearDupIndex(spark, str(tmp_path / "ndidx"))
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    assert idx.filter(b0).count() == 1  # empty index: all pass
    idx.fold(b0)
    b1 = spark.createDataFrame(
        [
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # copy
            (3, "one two three four five six seven eight nine"),  # disjoint
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in idx.filter(b1).collect()}
    assert kept == {3}


def test_near_dup_index_gate_prunes_partitions(spark, tmp_path):
    # the gate join must read ONLY the probed (band, bucket) partitions:
    # PartitionFilters with a bucket IN-list on every index scan — the
    # 100 TB contract that per-batch gate cost tracks the batch's own
    # band keys, not the whole landed corpus
    from lakota_spark import plans
    from lakota_spark.streaming import NearDupIndex

    idx = NearDupIndex(spark, str(tmp_path / "ndidx-p"))
    idx.fold(
        spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(8)],
            "doc_id long, text string",
        )
    )
    probe = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta 3")],
        "doc_id long, text string",
    )
    gated = idx.filter(probe)
    plan = plans.explain_str(gated)
    assert "PartitionFilters: [" in plan, plan
    import re

    pf = [
        m.group(0)
        for m in re.finditer(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    ]
    assert pf and all("bucket" in p for p in pf), plan
    # and the gate itself still verifies: the near-copy is dropped
    assert gated.count() == 0


def test_near_dup_index_compact_bounds_files(spark, tmp_path):
    # many folds accumulate one part file per touched partition per
    # fold; compact() merges each partition to one file and the gate
    # answers identically afterwards
    import glob

    from lakota_spark.streaming import NearDupIndex

    idx = NearDupIndex(spark, str(tmp_path / "ndidx-c"), n_buckets=4)
    for i in range(5):
        idx.fold(
            spark.createDataFrame(
                [(i, f"words unique to batch {i} repeated here {i} again")],
                "doc_id long, text string",
            )
        )
    probe = spark.createDataFrame(
        [
            (50, "words unique to batch 2 repeated here 2 again"),
            (51, "totally disjoint fresh content nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    before = {r.doc_id for r in idx.filter(probe).collect()}
    n_before = len(glob.glob(f"{idx.path}/bucket=*/*.parquet"))
    idx.compact()
    n_after = len(glob.glob(f"{idx.path}/bucket=*/*.parquet"))
    assert n_after <= 4  # one file per bucket partition
    assert n_after < n_before
    after = {r.doc_id for r in idx.filter(probe).collect()}
    assert after == before == {51}


def test_near_dup_index_compact_grows_buckets(spark, tmp_path):
    # corpus-scaled bucket count: with a tiny rows/bucket target the
    # compact rewrite must double n_buckets past the initial 2, re-bucket
    # every landed row under the new modulus, persist the new count, and
    # still answer the gate identically (dup dropped, fresh doc kept)
    import glob
    import json

    from lakota_spark.streaming import NearDupIndex

    path = str(tmp_path / "ndidx-g")
    idx = NearDupIndex(spark, path, n_buckets=2, rows_per_bucket_target=8)
    for i in range(3):
        idx.fold(
            spark.createDataFrame(
                [
                    (10 * i + j, f"batch {i} doc {j} text alpha beta {i}{j}")
                    for j in range(4)
                ],
                "doc_id long, text string",
            )
        )
    idx.compact()
    # 3 folds x 4 docs x 4 bands = 48 rows; target 8 -> needs 8 buckets
    assert idx.n_buckets == 8
    with open(f"{path}/_neardup_meta.json") as f:
        assert json.load(f)["n_buckets"] == 8
    assert len(glob.glob(f"{path}/bucket=*/*.parquet")) <= 8
    probe = spark.createDataFrame(
        [
            (99, "batch 1 doc 2 text alpha beta 12"),  # exact copy
            (98, "totally fresh disjoint content nine ten eleven"),
        ],
        "doc_id long, text string",
    )
    assert {r.doc_id for r in idx.filter(probe).collect()} == {98}
    # a RESTART with the default constructor bucket count must probe
    # under the persisted modulus, not its own argument
    idx2 = NearDupIndex(spark, path)  # default n_buckets=16 != 8
    assert idx2.n_buckets == 8
    assert {r.doc_id for r in idx2.filter(probe).collect()} == {98}


def test_streaming_near_dup_tracked_drops_cross_batch_dups(spark, tmp_path):
    # a doc near-dup of a FIRST-batch survivor must be dropped when it
    # arrives two batches later; survivors-only indexing: a doc matching
    # only a DROPPED dup's text is still caught (the survivor represents
    # it); disjoint docs always pass
    import os as _os
    import time as _time

    from lakota_spark.streaming import (
        NearDupIndex,
        streaming_near_dup_tracked,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    batches = [
        [(1, base)],
        [(2, other)],
        [(3, base), (4, "red orange yellow green blue indigo violet ultra")],
    ]
    src = str(tmp_path / "ndsrc")
    _os.makedirs(src)
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(f"file://{src}/b{i}.parquet")
        _time.sleep(1.1)  # distinct mtimes: oldest-first processing

    idx = NearDupIndex(spark, str(tmp_path / "ndidx2"))
    out_path = f"file://{tmp_path}/ndout"

    def sink(kept):
        kept.write.mode("append").parquet(out_path)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"file://{src}/*")
        .writeStream.foreachBatch(streaming_near_dup_tracked(idx)(sink))
        .option("checkpointLocation", str(tmp_path / "ndckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    kept = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    assert kept == {1, 2, 4}  # 3 dropped: dup of batch-0 survivor


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    # the learned quality gate is a stateless projection: the binary
    # weight-blob scoring + Pareto keep on a two-trigger micro-batch
    # stream must keep EXACTLY the rows the batch twin
    # (quality_classifier_scores -> pareto_quality_sample) keeps
    import os as _os

    from pyspark.sql import functions as F

    from lakota_spark.operators import classifier as C
    from lakota_spark.streaming import streaming_quality_classifier_gate

    rows = [
        (i, y, " ".join(["alpha beta gamma delta"] * 3)
         + (" curated encyclopedia editorial reviewed citation" if y else ""))
        for i, y in [(i, 1 if i % 3 == 0 else 0) for i in range(24)]
    ]
    # NULL-text doc: the batch twin scores it at the bias (zero feature
    # rows); the gate must make the same keep decision, not drop it
    rows.append((24, 0, None))
    df = spark.createDataFrame(rows, "doc_id long, y long, text string")
    model = C.quality_classifier_fit(
        df, "y", n_features=32, n_iter=8, lr=1.0 / 8192
    )

    batch_scored = C.quality_classifier_scores(model, df).select(
        "doc_id", C.fast_sigmoid(F.col("score_raw") * F.lit(8)).alias("prob")
    )
    batch_kept = sorted(
        r["doc_id"]
        for r in C.pareto_quality_sample(batch_scored)
        .where(F.col("keep") == 1)
        .collect()
    )

    src = str(tmp_path / "qsrc")
    _os.makedirs(src)
    plain = df.select("doc_id", "text")
    plain.where(F.col("doc_id") < 12).write.parquet(f"file://{src}/b0.parquet")
    plain.where(F.col("doc_id") >= 12).write.parquet(f"file://{src}/b1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"file://{src}/*"
    )
    out_path = f"file://{tmp_path}/qout"
    q = (
        streaming_quality_classifier_gate(model, stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out_path).collect())
    assert got == batch_kept
    assert 0 < len(got) < 25  # the gate actually discriminates


def test_streaming_pca_drift_monitor_matches_batch(spark, tmp_path):
    # per-trigger PSI must equal the batch psi_terms sum on the same
    # rows against the same frozen reference histogram
    import os as _os

    from pyspark.sql import functions as F

    from lakota_spark.operators.clustering import pca_power_fit
    from lakota_spark.operators.drift import histogram_counts, psi_terms
    from lakota_spark.streaming import streaming_pca_drift_monitor

    rows = [
        (i, [((i * 13 + j * 7) % 21 - 10) / 4.0 for j in range(8)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, v = pca_power_fit(df, iters=2)
    from lakota_spark.operators.clustering import pca_project

    ref = histogram_counts(
        pca_project(df, mean, v), "pc1", -5.0, 5.0, 16
    ).localCheckpoint()

    src = str(tmp_path / "vsrc")
    _os.makedirs(src)
    df.where(F.col("vec_id") < 60).write.parquet(f"file://{src}/b0.parquet")
    df.where(F.col("vec_id") >= 60).write.parquet(f"file://{src}/b1.parquet")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(f"file://{src}/*")
    out_path = f"file://{tmp_path}/vout"

    def sink(stats):
        stats.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(
            streaming_pca_drift_monitor(mean, v, ref)(sink)
        )
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["batch_id"]: (r["n_vecs"], r["psi_micro"])
        for r in spark.read.parquet(out_path).collect()
    }
    assert len(got) >= 1 and sum(n for n, _ in got.values()) == 120
    # recompute each batch's PSI the batch way; single-batch replay over
    # ALL rows must equal the batch psi on all rows
    nh = histogram_counts(pca_project(df, mean, v), "pc1", -5.0, 5.0, 16)
    full_psi = sum(
        r["psi_term_micro"] for r in psi_terms(ref, nh, 16).collect()
    )
    if len(got) == 1:
        assert list(got.values())[0] == (120, full_psi)
    else:
        # two triggers: verify each batch independently
        for bid in got:
            lo, hi = (0, 60) if bid == 0 else (60, 120)
            part = df.where(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            )
            nh_b = histogram_counts(
                pca_project(part, mean, v), "pc1", -5.0, 5.0, 16
            )
            psi_b = sum(
                r["psi_term_micro"]
                for r in psi_terms(ref, nh_b, 16).collect()
            )
            assert got[bid] == (60, psi_b)


def test_streaming_media_gate_matches_batch(spark, tmp_path):
    # stateless triage gate on a real micro-batch stream: payloads no
    # structural parser claims are dropped; the batch twin on the same
    # rows is the oracle (identical expression graph), and an explicit
    # allowlist narrows the gate the same way in both modes
    import os as _os

    from lakota_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        classify_media,
    )
    from lakota_spark.streaming import streaming_media_gate

    rows = [
        (1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8), "image/png", 16, "{}"),
        (2, bytearray(b"\x00\x01\x02" * 20), "image/png", 60, "{}"),  # junk
        (3, bytearray(b"fLaC" + b"\x00" * 12), "audio/flac", 16, "{}"),
        (4, bytearray(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 4), "audio/wav", 16, "{}"),
    ]
    src = str(tmp_path / "msrc")
    _os.makedirs(src)
    spark.createDataFrame(rows, MEDIA_SCHEMA).write.parquet(
        f"file://{src}/b0.parquet"
    )
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(f"file://{src}/*")
    out_path = str(tmp_path / "mout")
    q = (
        streaming_media_gate(stream)
        .writeStream.format("parquet")
        .option("path", f"file://{out_path}")
        .option("checkpointLocation", str(tmp_path / "mckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.media_id, r.kind)
        for r in spark.read.parquet(f"file://{out_path}").collect()
    }
    batch = spark.createDataFrame(rows, MEDIA_SCHEMA)
    want = {
        (r.media_id, r.kind)
        for r in classify_media(batch, with_payload=True)
        .where("kind != 'unknown'")
        .collect()
    }
    assert got == want == {(1, "png"), (3, "flac"), (4, "wav")}
    # allowlist narrows identically in stream mode
    out2 = str(tmp_path / "mout2")
    q2 = (
        streaming_media_gate(stream, keep=("wav", "flac"))
        .writeStream.format("parquet")
        .option("path", f"file://{out2}")
        .option("checkpointLocation", str(tmp_path / "mckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {
        r.media_id for r in spark.read.parquet(f"file://{out2}").collect()
    }
    assert got2 == {3, 4}


def test_streaming_html_sft_url_stateless(spark, tmp_path):
    # round-9 curation stages (html_extract, conversation_stats,
    # url_stats) are pure map-side codegen: the IDENTICAL operators
    # apply to a stream with no watermark/state, and the streamed
    # output equals the batch run row-for-row
    import os as _os

    from lakota_spark.operators.sft import conversation_stats
    from lakota_spark.operators.text import html_extract, url_stats

    rows = [
        (1, "<p>Hello &amp; world</p><a href='/'>Home</a>",
         "user: hi\nassistant: yo",
         "https://www.example.co.uk/a/b?x=1"),
        (2, "<script>nope()</script><div>kept</div>",
         "assistant: starts wrong",
         "http://plain.org"),
    ]
    schema = "doc_id long, html string, text string, url string"
    src = str(tmp_path / "src")
    _os.makedirs(src)
    spark.createDataFrame(rows, schema).write.parquet(
        f"file://{src}/b0.parquet"
    )
    stream = spark.readStream.schema(schema).parquet(f"file://{src}/*")
    batch = spark.createDataFrame(rows, schema)
    for op, cols in (
        (html_extract, ["doc_id", "text", "n_links"]),
        (conversation_stats, ["doc_id", "n_turns", "prompt_digest"]),
        (url_stats, ["doc_id", "domain", "n_params"]),
    ):
        out_path = str(tmp_path / f"out-{op.__name__}")
        q = (
            op(stream)
            .writeStream.format("parquet")
            .option("path", f"file://{out_path}")
            .option(
                "checkpointLocation", str(tmp_path / f"ck-{op.__name__}")
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in spark.read.parquet(f"file://{out_path}")
            .select(*cols)
            .collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in op(batch).select(*cols).collect()
        )
        assert got == want and len(got) == 2, op.__name__


def test_streaming_decayed_activity_matches_batch(spark, tmp_path):
    """batch == stream for the decayed-activity feature: three ts-ordered
    micro-batches must land on exactly the batch ladder's final scores."""
    from lakota_spark.operators.timeseries import decayed_sum
    from lakota_spark.streaming import streaming_decayed_activity
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    rows = [
        (u, e, e * 10, (e * 7) % 50 + 1)
        for u in (1, 2, 3)
        for e in range(1, 13)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, v long"
    )
    batch = decayed_sum(
        df, "ts", "user_id", F.col("v"), horizon=5, shift=10,
        tiebreak="event_id",
    )
    expected = {
        r.user_id: r.decayed
        for r in batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .where("rn = 1")
        .collect()
    }

    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    # 3 event-ordered chunks, one file per trigger
    for i, lo in enumerate((1, 5, 9)):
        chunk = [r for r in rows if lo <= r[1] < lo + 4]
        spark.createDataFrame(
            chunk, "user_id long, event_id long, ts long, v long"
        ).coalesce(1).write.parquet(f"file://{src}/b{i}.parquet")
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts long, v long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"file://{src}/*")
    )
    q = (
        streaming_decayed_activity(
            stream, "user_id", "v", ("ts", "event_id"), horizon=5,
            shift=10,
        )
        .writeStream.format("memory")
        .queryName("decayed_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows_out = spark.sql(
        "select * from decayed_stream"
    ).collect()
    final = {}
    seen_updates = set()
    for r in rows_out:
        final[r.key] = max(final.get(r.key, (0, 0)), (r.n_events, r.decayed))
        seen_updates.add((r.key, r.n_events))
    got = {k: v[1] for k, v in final.items()}
    assert got == expected
    # state genuinely carried across batches: intermediate emissions exist
    assert any(n < 12 for _, n in seen_updates)
