"""Learned-BPE tokenizer (operators/tokenizer.py).

The driver gate records bpe_token_stats rows-only (subword inference is
not SQL-expressible), so correctness is pinned here three ways:

1. incremental fit ≡ naive recount-everything fit (randomized corpora),
2. Spark Arrow-batched encode ≡ driver-side per-row encode,
3. decode round-trip identity + deterministic tie-breaks.
"""

from collections import Counter
import random

import pytest
from pyspark.sql import functions as F

from lakota_spark.operators.tokenizer import (
    EOW,
    pack_token_sequences,
    BpeModel,
    bpe_token_stats,
    bpe_tokenize,
    corpus_word_counts,
    encode_text,
    encode_word,
    fit_bpe,
    fit_bpe_from_counts,
)


def naive_fit(word_counts, n_merges, min_pair_count=2):
    """Textbook Sennrich loop: recount EVERY pair each iteration.
    O(n_merges × corpus) — the oracle, not the implementation."""
    words = [([*w, EOW], c) for w, c in word_counts if w]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        nxt = []
        for syms, c in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt.append((out, c))
        words = nxt
        merges.append((a, b))
    return merges


def test_fit_matches_naive_reference_randomized():
    rng = random.Random(41)
    for trial in range(40):
        wc = {}
        for _ in range(rng.randint(1, 60)):
            w = "".join(
                rng.choice("abcxé✓") for _ in range(rng.randint(1, 9))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 9)
        wc = sorted(wc.items())
        n = rng.randint(1, 30)
        got = fit_bpe_from_counts(wc, n).merges
        assert got == naive_fit(wc, n), (trial, wc)


def test_fit_classic_example_and_roundtrip():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = fit_bpe_from_counts(wc, n_merges=10)
    # highest-frequency pair first: ('e','s') at 9 beats ('l','o') at 7
    assert m.merges[0] == ("e", "s")
    assert m.merges[1] == ("es", "t")
    ranks = m.ranks()
    assert encode_word("newest", ranks) == ["newest</w>"]
    assert encode_word("lowest", ranks) == ["low", "est</w>"]  # unseen word
    for w, _ in wc + [("lowestest", 0), ("", 0), ("zq", 0)]:
        assert "".join(encode_word(w, ranks)).replace(EOW, "") == w


def test_fit_deterministic_tie_breaks():
    # ab and cd both occur 3 times; lexicographically smaller pair wins
    m = fit_bpe_from_counts([("ab", 3), ("cd", 3)], n_merges=1,
                            min_pair_count=2)
    assert m.merges == [("a", "b")]
    # all pairs unique -> below min_pair_count -> zero merges
    assert fit_bpe_from_counts([("xy", 1), ("qr", 1)], n_merges=5).merges == []


def test_encode_equals_fit_segmentation():
    # the inference loop must reproduce the exact segmentation the fit
    # left each training word with: re-derive it by replaying merges
    rng = random.Random(99)
    wc = {}
    for _ in range(80):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 10)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 5)
    wc = sorted(wc.items())
    m = fit_bpe_from_counts(wc, n_merges=40)
    ranks = m.ranks()
    for w, _ in wc:
        syms = [*w, EOW]
        for a, b in m.merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        assert encode_word(w, ranks) == syms, w


def test_spark_encode_matches_driver(spark):
    texts = [
        "the cat sat on the mat, the cat sat!",
        "lower newest widest lowest",
        "numbers 12345 and 99 mix, naïve café ✓",
        "",
        None,
        "repeated repeated repeated words words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = fit_bpe(df, n_merges=30, max_words=1000)
    # fit's distributed word count == driver count
    got = dict(corpus_word_counts(df, "text", 1000))
    import re
    from lakota_spark.operators.text import BPE_RE

    exp = Counter(
        w for t in texts if t for w in re.findall(BPE_RE, t)
    )
    assert got == dict(exp)
    ranks = model.ranks()
    rows = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(model, df).collect()
    }
    for i, t in enumerate(texts):
        exp_toks = [] if t is None else encode_text(t, ranks, {})
        assert rows[i] == exp_toks, (i, t)
    stats = {r["doc_id"]: r for r in bpe_token_stats(model, df).collect()}
    for i, t in enumerate(texts):
        exp_toks = [] if t is None else encode_text(t, ranks, {})
        assert stats[i]["n_bpe"] == len(exp_toks)
        if t is None:
            assert stats[i]["n_chars"] is None
        else:
            assert stats[i]["n_chars"] == len(t)
            assert stats[i]["chars_per_token"] == pytest.approx(
                len(t) / max(len(exp_toks), 1)
            )


def test_word_cap_is_deterministic_and_by_mass(spark):
    df = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc")], "doc_id long, text string"
    )
    assert corpus_word_counts(df, "text", 2) == [("aa", 3), ("bb", 2)]
    # count tie at 1 -> word asc
    df2 = spark.createDataFrame(
        [(0, "zz yy xx")], "doc_id long, text string"
    )
    assert corpus_word_counts(df2, "text", 2) == [("xx", 1), ("yy", 1)]


def test_encode_plan_is_single_pass_no_shuffle(spark):
    df = spark.createDataFrame(
        [(0, "hello world")], "doc_id long, text string"
    )
    model = BpeModel(merges=[("l", "o")], vocab=[])
    for q in (bpe_tokenize(model, df), bpe_token_stats(model, df)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("ArrowEvalPython") == 1, plan


def test_tokenize_ids_and_unk(spark):
    df = spark.createDataFrame(
        [(0, "the cat"), (1, "the ZZZ")], "doc_id long, text string"
    )
    model = fit_bpe(
        spark.createDataFrame([(0, "the cat the")], "doc_id long, text string"),
        n_merges=10,
        max_words=100,
    )
    from lakota_spark.operators.tokenizer import bpe_tokenize_ids

    rows = {
        r["doc_id"]: r["input_ids"]
        for r in bpe_tokenize_ids(model, df, unk_id=0).collect()
    }
    vocab_ids = {s: i + 1 for i, s in enumerate(model.vocab)}
    ranks = model.ranks()
    assert rows[0] == [vocab_ids[s] for s in encode_text("the cat", ranks, {})]
    # Z never seen in the fit corpus -> its symbols map to unk; the bare
    # trailing EOW symbol IS in-vocab (every fitted word contributes it)
    zzz = encode_text("ZZZ", ranks, {})
    assert rows[1][-len(zzz):] == [vocab_ids.get(s, 0) for s in zzz]
    assert rows[1].count(0) == 3  # the three Z chars
    assert 0 not in rows[0]


def test_pack_token_sequences_matches_driver_reference(spark):
    from lakota_spark.functions import hash32
    from lakota_spark.operators.tokenizer import pack_token_sequences

    rng = random.Random(5)
    docs = [
        (i, [rng.randint(1, 50) for _ in range(rng.randint(0, 23))])
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, input_ids array<int>")
    n_buckets, seq_len = 4, 8
    packed = pack_token_sequences(
        df, seq_len=seq_len, n_buckets=n_buckets, eos_id=-1
    )
    bk = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            (
                hash32(
                    F.concat_ws(
                        ":", F.lit("tpack"), F.col("doc_id").cast("string")
                    )
                )
                % n_buckets
            ).alias("b"),
        ).collect()
    }
    exp = {}
    exp_docs = {}
    for b in set(bk.values()):
        stream = []
        for d, ids in sorted(p for p in docs if bk[p[0]] == b):
            stream += [(x, d) for x in ids + [-1]]
        for s in range(0, len(stream), seq_len):
            win = stream[s : s + seq_len]
            exp[(b, s // seq_len)] = [x for x, _ in win]
            exp_docs[(b, s // seq_len)] = len({d for _, d in win})
    rows = packed.collect()
    got = {(r["pack_bucket"], r["seq_idx"]): r["input_ids"] for r in rows}
    assert got == exp
    for r in rows:
        key = (r["pack_bucket"], r["seq_idx"])
        assert r["n_ids"] == len(exp[key])
        assert r["n_docs"] == exp_docs[key]


def test_pack_plan_two_bucket_keyed_exchanges(spark):
    from lakota_spark.operators.tokenizer import pack_token_sequences

    df = spark.createDataFrame(
        [(0, [1, 2, 3])], "doc_id long, input_ids array<int>"
    )
    plan = (
        pack_token_sequences(df, seq_len=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE bucket-keyed hash exchange total: the groupBy on
    # (pack_bucket, seq_idx) reuses the window's hashpartitioning on
    # pack_bucket (a subset of the grouping keys satisfies the
    # clustered distribution), so the token-granular stage never
    # re-shuffles; and never a single-partition funnel
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(pack_bucket" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_save_load_roundtrip_all_backends(spark, tmp_path):
    from lakota_spark.fsio import open_fs
    from lakota_spark.operators.tokenizer import load_bpe, save_bpe

    model = fit_bpe_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6)], n_merges=8
    )
    for uri in (f"file://{tmp_path}", "memory://bpe-test"):
        fs = open_fs(uri)
        save_bpe(model, fs, "models/tokenizer.json")
        back = load_bpe(fs, "models/tokenizer.json")
        assert back.merges == model.merges
        assert back.vocab == model.vocab
        assert back.ranks() == model.ranks()


def test_word_tracker_incremental_fit_equals_batch_fit(spark, tmp_path):
    # fold per-batch word counts -> model() must equal a one-shot fit on
    # the whole landed corpus (counts are additive; cap rule identical)
    from lakota_spark.operators.tokenizer import BpeWordTracker

    b1 = [(1, "the cat sat on the mat"), (2, "lower newest widest")]
    b2 = [(3, "the newest cat is the lowest"), (4, "newest newest mat")]
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    df2 = spark.createDataFrame(b2, "doc_id long, text string")
    t = BpeWordTracker(
        spark, str(tmp_path / "wc"), n_merges=30, max_words=1000
    )
    assert t.model().merges == []  # empty store -> empty model
    t.seed(df1)
    m1 = t.model()
    assert m1.merges == fit_bpe(df1, n_merges=30, max_words=1000).merges
    t.fold(df2)
    full = fit_bpe(df1.unionByName(df2), n_merges=30, max_words=1000)
    m2 = t.model()
    assert m2.merges == full.merges
    assert m2.vocab == full.vocab
    # memoized per version: same object until the next fold
    assert t.model() is m2
    t.fold(spark.createDataFrame([(5, "zzz zzz zzz")], "doc_id long, text string"))
    assert t.model() is not m2


def test_pack_null_ids_doc_is_absent(spark):
    # a null ids row contributes NOTHING (not even EOS) and must not
    # shift later docs' offsets. This leans on ANSI size(null)=NULL —
    # the window sum skips it; with ANSI off, size(null)=-1 would
    # silently corrupt every later offset, so pin the behavior loudly.
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, None), (3, [4, 5, 6, 7])],
        "doc_id long, input_ids array<int>",
    )
    rows = {
        r["seq_idx"]: (r["input_ids"], r["n_docs"])
        for r in pack_token_sequences(df, seq_len=4, n_buckets=1).collect()
    }
    assert rows[0] == ([1, 2, 3, -1], 1)
    assert rows[1] == ([4, 5, 6, 7], 1)
    assert rows[2] == ([-1], 1)


def test_fertility_by_lang_matches_driver_recount(spark):
    # per-language fertility: Spark's fused encode+count pass must equal
    # a driver-side recount with the same model (exact longs, exact
    # long/long ratio doubles); null text counts 0 tokens
    from lakota_spark.operators.tokenizer import (
        bpe_fertility_by_lang,
        encode_text,
        fit_bpe,
    )

    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the newest widest cat"),
        (2, "fr", "le chat est sur le tapis"),
        (3, "fr", None),
        (4, "de", "die katze sitzt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = fit_bpe(df, n_merges=25, max_words=1000)
    got = {
        r.lang: r for r in bpe_fertility_by_lang(model, df).collect()
    }
    ranks = model.ranks()
    import re

    exp: dict = {}
    for _i, lang, t in rows:
        e = exp.setdefault(lang, [0, 0, 0, 0])
        e[0] += 1
        if t is not None:
            e[1] += len(re.split(r"\s+", t.strip()))
            e[2] += len(encode_text(t, ranks, {}))
            e[3] += len(t)
    assert set(got) == set(exp)
    for lang, (n_docs, n_words, n_tokens, n_chars) in exp.items():
        r = got[lang]
        assert (r.n_docs, r.n_words, r.n_tokens) == (
            n_docs, n_words, n_tokens
        ), lang
        assert r.tokens_per_word == n_tokens / max(n_words, 1)
        assert r.chars_per_token == n_chars / max(n_tokens, 1)


def test_fertility_plan_one_arrow_pass_one_exchange(spark):
    # the fused encode+count projection is ONE ArrowEvalPython and the
    # only exchange is the lang groupBy's partial-agg shuffle
    from lakota_spark.operators.tokenizer import bpe_fertility_by_lang

    df = spark.createDataFrame(
        [(0, "en", "hello world")], "doc_id long, lang string, text string"
    )
    model = BpeModel(merges=[("l", "o")], vocab=[])
    plan = (
        bpe_fertility_by_lang(model, df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("Exchange") <= 2, plan  # agg shuffle (+AQE read)
    assert "partial" in plan.lower() or "HashAggregate" in plan, plan


def test_wordpiece_criterion_differs_from_bpe():
    # the differentiator: at equal-ish pair counts BPE picks the raw
    # count winner, WordPiece the likelihood-ratio winner (a pair of
    # otherwise-rare symbols beats a pair of ubiquitous ones)
    from lakota_spark.operators.tokenizer import (
        fit_bpe_from_counts,
        fit_wordpiece_from_counts,
    )

    counts = [("xy", 9), ("x", 91), ("y", 91), ("qz", 8)]
    bpe = fit_bpe_from_counts(counts, n_merges=1)
    wp = fit_wordpiece_from_counts(counts, n_merges=1)
    # BPE: raw pair counts — (y,</w>) at 100 dominates everything
    assert bpe.merges[0] == ("y", "</w>")
    # WordPiece: score(x,##y) = 9/(100*9); score(q,##z) = 8/(8*8) wins
    assert wp.merges[0] == ("q", "##z")
    assert "qz" in wp.vocab


def test_wordpiece_greedy_longest_match_and_unk():
    from lakota_spark.operators.tokenizer import (
        UNK,
        WordPieceModel,
        wordpiece_encode_word,
    )

    vocab = WordPieceModel(
        merges=[],
        vocab=["un", "u", "##n", "##able", "##ab", "##le", "##a", "##b",
               "##l", "##e", "a"],
    ).vocab_set()
    assert wordpiece_encode_word("unable", vocab) == ["un", "##able"]
    # longest FIRST match wins even when a shorter split would also work
    assert wordpiece_encode_word("unab", vocab) == ["un", "##ab"]
    assert wordpiece_encode_word("a", vocab) == ["a"]
    # unmatchable remainder -> whole word is [UNK] (BERT semantics)
    assert wordpiece_encode_word("axq", vocab) == [UNK]


def test_wordpiece_exhausting_fit_folds_frequent_words():
    # the fixture-corpus argument in piece space: every pair on a
    # frequent word's path holds count >= 2, so an exhausting fit folds
    # the full word whatever the merge order; a count-1 word stays split
    from lakota_spark.operators.tokenizer import (
        fit_wordpiece_from_counts,
        wordpiece_encode_word,
    )

    counts = [("aa", 5), ("ab", 4), ("ba", 4), ("xy", 3), ("xyz", 2),
              ("b", 3), ("zz", 1)]
    m = fit_wordpiece_from_counts(counts, n_merges=64)
    v = m.vocab_set()
    for w in ("aa", "ab", "ba", "xy", "xyz"):
        assert wordpiece_encode_word(w, v) == [w], w
    assert wordpiece_encode_word("b", v) == ["b"]
    assert wordpiece_encode_word("zz", v) == ["z", "##z"]


def test_wordpiece_spark_stats_match_driver(spark):
    from lakota_spark.operators.tokenizer import (
        fit_wordpiece,
        wordpiece_encode_text,
        wordpiece_token_stats,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the catalog of cats"),
        (3, "zz zq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = fit_wordpiece(df, n_merges=32)
    got = {
        r.doc_id: (r.n_wp, r.n_chars)
        for r in wordpiece_token_stats(m, df).collect()
    }
    v = m.vocab_set()
    for i, t in rows:
        want = len(wordpiece_encode_text(t, v, {}))
        assert got[i] == (want, len(t)), (i, t)
    # determinism across input partitionings
    m2 = fit_wordpiece(df.repartition(7), n_merges=32)
    assert m2.merges == m.merges and m2.vocab == m.vocab


def test_unigram_viterbi_bruteforce_optimal():
    # Viterbi vs exhaustive segmentation enumeration over random vocabs
    import itertools
    import random

    from lakota_spark.operators.tokenizer import unigram_viterbi

    rng = random.Random(23)
    alphabet = "abc"
    for trial in range(60):
        pieces = {"a", "b", "c"}
        for _ in range(rng.randint(1, 8)):
            ln = rng.randint(2, 4)
            pieces.add(
                "".join(rng.choice(alphabet) for _ in range(ln))
            )
        scores = {p: -rng.randint(1, 50) * 1000 for p in sorted(pieces)}
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))

        def all_segs(w):
            if not w:
                yield []
                return
            for i in range(1, len(w) + 1):
                if w[:i] in scores:
                    for rest in all_segs(w[i:]):
                        yield [w[:i]] + rest

        got = unigram_viterbi(word, scores)
        best = max(sum(scores[p] for p in s) for s in all_segs(word))
        assert sum(scores[p] for p in got) == best, (trial, word, got)


def test_unigram_viterbi_unk_and_ties():
    from lakota_spark.operators.tokenizer import UNK, unigram_viterbi

    scores = {"a": -1000, "b": -1000, "ab": -1500}
    # 'ab' piece (-1500) beats ['a','b'] (-2000)
    assert unigram_viterbi("ab", scores) == ["ab"]
    # missing char -> per-char fallback with [UNK] holes
    assert unigram_viterbi("aqb", scores) == ["a", UNK, "b"]
    # exact tie prefers FEWER pieces: 'aa' (-2000) vs ['a','a'] (-2000)
    assert unigram_viterbi("aa", {"a": -1000, "aa": -2000}) == ["aa"]


def test_unigram_em_improves_likelihood_and_is_deterministic(spark):
    import math

    from lakota_spark.operators.tokenizer import (
        corpus_word_counts,
        fit_unigram,
        fit_unigram_from_counts,
        unigram_token_stats,
        unigram_viterbi,
    )

    rows = [
        (1, "banana bandana banana"),
        (2, "ana ban nab banana"),
        (3, "band and bandana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = corpus_word_counts(df)

    def seg_loglik(model, wc):
        # marginal likelihood of the corpus under the model's best
        # segmentations (Viterbi proxy; scores are micro-nat ints)
        tot = 0
        for w, c in wc:
            toks = unigram_viterbi(w, model.scores)
            s = sum(model.scores.get(t, -40_000_000) for t in toks)
            tot += c * s
        return tot

    m1 = fit_unigram_from_counts(wc, vocab_size=24, n_iter=1)
    m4 = fit_unigram_from_counts(wc, vocab_size=24, n_iter=4)
    assert seg_loglik(m4, wc) >= seg_loglik(m1, wc)
    # frequent whole words become single pieces
    assert unigram_viterbi("banana", m4.scores) == ["banana"]
    # Spark stats match the driver encode; repartition-deterministic
    got = {
        r.doc_id: r.n_ug
        for r in unigram_token_stats(m4, df).collect()
    }
    for i, t in rows:
        import re as _re

        from lakota_spark.operators.tokenizer import unigram_encode_text

        assert got[i] == len(unigram_encode_text(t, m4.scores, {}))
    m4b = fit_unigram(df.repartition(5), vocab_size=24, n_iter=4)
    assert m4b.scores == m4.scores


def test_tokenizer_save_load_all_families(spark, repo):
    from lakota_spark.operators.tokenizer import (
        fit_bpe_from_counts,
        fit_unigram_from_counts,
        fit_wordpiece_from_counts,
        load_tokenizer,
        save_tokenizer,
    )

    counts = [("hello", 5), ("help", 4), ("held", 2), ("x", 1)]
    fs = repo.fs
    models = [
        fit_bpe_from_counts(counts, n_merges=8),
        fit_wordpiece_from_counts(counts, n_merges=8),
        fit_unigram_from_counts(counts, vocab_size=16, n_iter=2),
    ]
    for i, m in enumerate(models):
        rel = f"models/tok{i}.json"
        save_tokenizer(m, fs, rel)
        back = load_tokenizer(fs, rel)
        assert type(back) is type(m) and back == m, type(m).__name__
    import pytest

    with pytest.raises(TypeError):
        save_tokenizer(object(), fs, "models/bad.json")
