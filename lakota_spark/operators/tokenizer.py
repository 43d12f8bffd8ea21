"""Learned byte-pair-encoding tokenizer: distributed fit + encode.

The one canonical LLM-pipeline operator the regex token counter
(`text.token_count_bpe`) approximates but does not implement: an actual
BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units") fitted ON the corpus, then applied to it.

Scale design (the HuggingFace-tokenizers / SentencePiece trainer shape):

- **Fit** needs only the distinct-word frequency table, not the corpus:
  pre-tokenization splits text into words, and BPE merges never cross a
  word boundary, so pair statistics are fully determined by
  ``word -> count``. One distributed ``groupBy(word).count()`` (map-side
  partial agg) + a ``TakeOrderedAndProject`` cap to the top ``max_words``
  by mass produces a BOUNDED driver relation (Zipf: the top 200k words
  carry almost all pair mass of a 100 TB corpus); the merge loop then
  runs driver-side over that table with incremental pair counts and a
  lazy max-heap — O(occurrences touched) per merge, not O(table). Corpus
  bytes never reach the driver.
- **Encode** is embarrassingly parallel and shuffle-free: an
  Arrow-batched pandas UDF applies the learned merges per word with a
  per-batch word->tokens memo (Zipf again: hit rate ~ 1 - distinct/total,
  so per-doc cost is ~O(new distinct words)). The merge-rank dict is
  ``n_merges`` entries (a few KB) — closure-shipped once per task, far
  below any broadcast threshold. The alternative distributed form
  (distinct-word relation -> encode -> posexplode + join + re-agg) costs
  two shuffles to save Python work that the memo already amortizes; not
  taken.

Word pre-tokenization reuses ``text.BPE_RE`` so the learned tokenizer and
the regex token counter segment words identically. Words are encoded as
their character sequence plus a trailing end-of-word sentinel symbol
(the paper's ``</w>``), so decode round-trips and "er" vs "er</w>" stay
distinct merge targets.

Determinism (required for the differential tests and any reproducible
data pipeline): pair selection breaks count ties by lexicographically
smallest pair; the word cap breaks count ties by word asc.

Reference comparables: none in bertrandchenal/lakota (numeric series
store); this extends the repo's training-data surface alongside
`operators/text.py` / `operators/sampling.py`.
"""

from __future__ import annotations

import heapq
import re
from collections import Counter, defaultdict
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakota_spark.operators.text import BPE_RE
from lakota_spark.operators.tracker import VersionedCountsTracker

EOW = "</w>"  # end-of-word sentinel symbol (Sennrich sec. 3.2)


class BpeModel(NamedTuple):
    """Fitted BPE model: ``merges`` in learned order (rank = position),
    ``vocab`` = initial alphabet (sorted) + one merged symbol per merge."""

    merges: list  # list[tuple[str, str]]
    vocab: list  # list[str]

    def ranks(self) -> dict:
        return {tuple(m): i for i, m in enumerate(self.merges)}


def _word_pairs(syms):
    return zip(syms, syms[1:])


def fit_bpe_from_counts(
    word_counts, n_merges: int = 256, min_pair_count: int = 2
) -> BpeModel:
    """Driver-side BPE merge loop over a ``[(word, count), ...]`` table.

    Incremental algorithm: a pair->word-set index plus a lazy max-heap of
    (-count, pair). On each merge only the words actually containing the
    winning pair are re-counted (subtract the word's old pair multiset,
    merge greedily left-to-right, add the new multiset); stale heap
    entries are skipped on pop by comparing against the live count.
    Complexity per merge is O(sum len(word) over words touched), not
    O(vocabulary) — the recount-everything textbook loop is the test
    oracle, not the implementation.
    """
    words = []  # [(symbols list, count)]
    alphabet = set()
    for w, c in word_counts:
        if not w:
            continue
        syms = list(w) + [EOW]
        alphabet.update(syms)
        words.append((syms, int(c)))

    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for i, (syms, c) in enumerate(words):
        for p in _word_pairs(syms):
            pair_counts[p] += c
            pair_words[p].add(i)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        live = pair_counts.get(best, 0)
        if live != -negc:  # stale entry — re-queue at the live count
            if live >= min_pair_count:
                heapq.heappush(heap, (-live, best))
            continue
        if live < min_pair_count:
            break
        a, b = best
        new_sym = a + b
        dirty = set()
        for i in sorted(pair_words.pop(best, ())):
            syms, c = words[i]
            if best not in _word_pairs(syms):
                continue  # stale index entry (word mutated by prior merges)
            for p in _word_pairs(syms):
                pair_counts[p] -= c
                dirty.add(p)
            merged = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            words[i] = (merged, c)
            for p in _word_pairs(merged):
                pair_counts[p] += c
                pair_words[p].add(i)
                dirty.add(p)
        pair_counts[best] = 0
        dirty.discard(best)
        for p in dirty:
            c = pair_counts.get(p, 0)
            if c >= min_pair_count:
                heapq.heappush(heap, (-c, p))
        merges.append((a, b))
    return BpeModel(
        merges=merges, vocab=sorted(alphabet) + [a + b for a, b in merges]
    )


def corpus_word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 200_000
) -> list:
    """The ONE distributed job of the fit: word frequencies, capped.

    regexp_extract_all + explode + groupBy — partial aggregation
    map-side, then a global sort-limit (TakeOrderedAndProject: per
    partition top-N, merged on the driver — never a full sort at scale).
    Tie-break word asc keeps the cap deterministic across partitionings.
    """
    rows = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["word"], r["cnt"]) for r in rows]


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    max_words: int = 200_000,
    min_pair_count: int = 2,
) -> BpeModel:
    """Fit BPE on a corpus: one Spark agg + driver-side merge loop."""
    return fit_bpe_from_counts(
        corpus_word_counts(df, text_col, max_words),
        n_merges=n_merges,
        min_pair_count=min_pair_count,
    )


def encode_word(word: str, ranks: dict) -> list:
    """Segment one word with fitted merges: repeatedly apply the
    LOWEST-RANK pair present (all its occurrences, left-to-right) until
    no learned pair remains — the standard BPE inference loop, which
    reproduces exactly the segmentation the fit left that word with."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best = None
        for p in _word_pairs(syms):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        a, b = best
        merged = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                merged.append(a + b)
                j += 2
            else:
                merged.append(syms[j])
                j += 1
        syms = merged
    return syms


def encode_text(text: str, ranks: dict, cache: dict) -> list:
    out = []
    for w in re.findall(BPE_RE, text):
        toks = cache.get(w)
        if toks is None:
            toks = encode_word(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


def bpe_tokenize(
    model: BpeModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Distributed encode: (id, array<string> tokens). Shuffle-free —
    one Arrow-batched pandas UDF pass with a per-batch word memo."""
    ranks = model.ranks()

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [] if t is None else encode_text(t, ranks, cache)
        )

    return df.select(F.col(id_col), enc(F.col(text_col)).alias(out_col))


def bpe_token_stats(
    model: BpeModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenization stats: learned-BPE token count and the
    compression ratio chars-per-token (the fertility gauge a tokenizer
    fit is judged by). Single pass, no shuffle — tokens and char length
    come out of the same projection, no self-join."""
    ranks = model.ranks()

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [] if t is None else encode_text(t, ranks, cache)
        )

    # two-step projection so the UDF column is computed once, then reused
    base = df.select(
        F.col(id_col),
        F.size(enc(F.col(text_col))).cast("long").alias("n_bpe"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    return base.select(
        id_col,
        "n_bpe",
        "n_chars",
        (F.col("n_chars") / F.greatest(F.col("n_bpe"), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


def bpe_fertility_by_lang(
    model: BpeModel,
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer FERTILITY report — the metric a vocab fit
    is judged by across languages (tokens per whitespace word; a
    language whose fertility sits far above the corpus mean is
    under-served by the learned merges and will cost proportionally
    more sequence length at training time). Also reports chars/token
    (compression) and the doc/word/token mass per language so the
    ratios can be re-weighted downstream.

    Scale shape: ONE Arrow-batched encode pass (the token COUNT comes
    out of the pandas UDF directly — the token array is never
    materialized into a column) fused with the word/char projections,
    then one partial-agg groupBy on the low-cardinality lang key. No
    window, no join, no shuffle beyond the k-group agg."""
    ranks = model.ranks()

    @F.pandas_udf("long")
    def n_tok(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: 0 if t is None else len(encode_text(t, ranks, cache))
        )

    base = df.select(
        F.col(lang_col).alias("lang"),
        n_tok(F.col(text_col)).alias("n_bpe"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long")
        .alias("n_words"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    agg = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        (F.col("n_tokens") / F.greatest(F.col("n_words"), F.lit(1))).alias(
            "tokens_per_word"
        ),
        (F.col("n_chars") / F.greatest(F.col("n_tokens"), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


def bpe_tokenize_ids(
    model: BpeModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "input_ids",
    unk_id: int = 0,
) -> DataFrame:
    """Distributed encode to integer token ids: (id, array<int>).

    Ids are vocab positions shifted by +1 so id 0 stays free as
    ``unk_id`` (symbols outside the fitted vocab — impossible on the
    training corpus itself, possible on unseen text). Same shuffle-free
    single-UDF-pass shape as `bpe_tokenize`.
    """
    ranks = model.ranks()
    vocab_ids = {s: i + 1 for i, s in enumerate(model.vocab)}

    @F.pandas_udf("array<int>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: []
            if t is None
            else [
                vocab_ids.get(s, unk_id)
                for s in encode_text(t, ranks, cache)
            ]
        )

    return df.select(F.col(id_col), enc(F.col(text_col)).alias(out_col))


def pack_token_sequences(
    df: DataFrame,
    seq_len: int,
    ids_col: str = "input_ids",
    id_col: str = "doc_id",
    eos_id: int = -1,
    n_buckets: int = 32,
) -> DataFrame:
    """Pack per-doc token ids into fixed-length training sequences — the
    GPT-style pretraining prep step AFTER tokenization: append ``eos_id``
    to each doc, concatenate docs, slice the stream into ``seq_len``
    windows. Docs are hash-split into ``n_buckets`` independent streams
    so packing parallelizes (the complement of
    `sampling.pack_sequences`, which assigns whole docs to budgeted
    shards without materializing the token stream).

    Plan shape, scale notes: (1) one doc-level window per bucket
    computes each doc's starting offset from the cumulative id count —
    the window moves doc-sized rows, not tokens; (2) posexplode +
    offset yields (bucket, seq_idx, pos, id) for every token — the
    one unavoidable token-granular stage, since the output IS the
    token stream — feeding (3) a groupBy (bucket, seq_idx) that
    reassembles fixed windows via array_sort(collect_list(struct)).
    ONE exchange total: the groupBy's clustering requirement on
    (bucket, seq_idx) is satisfied by the window's hashpartitioning on
    bucket — a subset of the grouping keys — so the token-granular
    stage never re-shuffles (plan contract pins it). The bucket key is
    hash-uniform, skew-free regardless of doc-length skew, and each
    group is at most ``seq_len`` structs. The final partial sequence of
    each bucket is emitted unpadded (``n_ids < seq_len``); padding
    policy belongs to the training loader. A null ``ids_col`` row is
    treated as an absent doc (contributes no tokens, not even EOS).

    Returns (pack_bucket, seq_idx, input_ids, n_ids, n_docs) where
    n_docs counts docs contributing ≥1 token to the window.
    """
    if seq_len <= 0 or n_buckets <= 0:
        raise ValueError("pack_token_sequences needs positive seq_len/n_buckets")
    from pyspark.sql import Window

    from lakota_spark.functions import hash32

    bucket = (
        hash32(F.concat_ws(":", F.lit("tpack"), F.col(id_col).cast("string")))
        % n_buckets
    ).alias("pack_bucket")
    with_eos = F.concat(
        F.col(ids_col), F.array(F.lit(eos_id).cast("int"))
    )
    base = df.select(
        F.col(id_col), bucket, with_eos.alias("_ids")
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn(
        "_start", (F.sum(F.size("_ids")).over(w) - F.size("_ids"))
    )
    toks = base.select(
        "pack_bucket",
        id_col,
        "_start",
        F.posexplode("_ids").alias("_pos", "_id"),
    ).select(
        "pack_bucket",
        id_col,
        (F.col("_start") + F.col("_pos")).alias("_gpos"),
        "_id",
    )
    return (
        toks.groupBy(
            "pack_bucket",
            (F.col("_gpos") / F.lit(seq_len)).cast("long").alias("seq_idx"),
        )
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (F.col("_gpos") % F.lit(seq_len)).alias("off"),
                            F.col("_id").alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            ).alias("input_ids"),
            F.count(F.lit(1)).cast("long").alias("n_ids"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
        )
    )


def save_bpe(model: BpeModel, fs, rel: str) -> None:
    """Persist a fitted model through the FS verbs (works on every
    backend — file/mem/HTTP/S3): one JSON blob, atomically published.
    The tokenizer is an index artifact like the IVF centroid lists; a
    100 TB pipeline fits once and ships the artifact, not the fit."""
    import json

    payload = {
        "format": 1,
        "merges": [list(m) for m in model.merges],
        "vocab": list(model.vocab),
    }
    parent = rel.rsplit("/", 1)[0] if "/" in rel else ""
    fs.makedirs(parent)  # no-op for root-level rel (repo root pre-exists)
    fs.write_bytes_atomic(rel, json.dumps(payload).encode("utf-8"))


def load_bpe(fs, rel: str) -> BpeModel:
    import json

    payload = json.loads(fs.read_bytes(rel).decode("utf-8"))
    if payload.get("format") != 1:
        raise ValueError(
            f"unsupported bpe model format: {payload.get('format')!r}"
        )
    return BpeModel(
        merges=[tuple(m) for m in payload["merges"]],
        vocab=list(payload["vocab"]),
    )


class BpeWordTracker(VersionedCountsTracker):
    """Incrementally-refreshed BPE fit over a growing corpus: each
    landed batch's word counts sum-merge into a versioned relation
    (the `tracker.VersionedCountsTracker` CAS discipline shared with
    the span-flag store), and `model()` refits from the current head —
    so a long-running ingest keeps its tokenizer current without ever
    re-scanning landed text. Exact: word counts are additive over
    batches (each doc arrives in exactly one batch — the same
    at-least-once caveat as the other foreachBatch stores).

    The refit is cheap by the same argument as `fit_bpe`: the merge
    loop consumes only the capped word->count head, never the corpus.
    `model()` memoizes per version, so reading between folds is free.
    """

    key_cols = ("word",)
    agg_col = "cnt"

    def __init__(
        self,
        spark,
        path: str,
        n_merges: int = 256,
        max_words: int = 200_000,
        min_pair_count: int = 2,
    ):
        super().__init__(spark, path)
        self.n_merges = n_merges
        self.max_words = max_words
        self.min_pair_count = min_pair_count
        self._model_cache: tuple | None = None  # (version, BpeModel)

    def _batch_counts(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
                ).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def model(self) -> BpeModel:
        vs = self._versions()
        if not vs:
            return BpeModel(merges=[], vocab=[])
        head = vs[-1]
        if self._model_cache and self._model_cache[0] == head:
            return self._model_cache[1]
        rows = (
            self.counts()
            .orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(self.max_words)
            .collect()
        )
        m = fit_bpe_from_counts(
            [(r["word"], r["cnt"]) for r in rows],
            n_merges=self.n_merges,
            min_pair_count=self.min_pair_count,
        )
        self._model_cache = (head, m)
        return m


# ---------------------------------------------------------------------------
# WordPiece (round 10): the BERT-family tokenizer — likelihood-ratio fit,
# greedy longest-match inference
# ---------------------------------------------------------------------------

UNK = "[UNK]"


class WordPieceModel(NamedTuple):
    """Fitted WordPiece model: ``vocab`` = initial symbols (word-start
    chars + ``##``-continuation chars) plus one merged piece per merge,
    in learned order."""

    merges: list  # list[tuple[str, str]] in learned order
    vocab: list

    def vocab_set(self) -> set:
        return set(self.vocab)


def _wp_join(a: str, b: str) -> str:
    """Concatenate two pieces respecting the ``##`` convention: the
    continuation marker of the RIGHT piece disappears inside the merge
    (``("a","##b") -> "ab"``, ``("##a","##b") -> "##ab"``)."""
    return a + (b[2:] if b.startswith("##") else b)


def fit_wordpiece_from_counts(
    word_counts, n_merges: int = 256, min_pair_count: int = 2
) -> WordPieceModel:
    """Driver-side WordPiece trainer over a ``[(word, count), ...]``
    table (Schuster & Nakajima 2012 / the BERT trainer): each step
    merges the adjacent pair maximizing the LIKELIHOOD RATIO
    ``count(ab) / (count(a) * count(b))`` — not the raw pair count BPE
    uses — so a pair of otherwise-rare symbols beats a pair of
    ubiquitous ones at equal joint count.

    Determinism without floats: scores compare as EXACT rationals
    (`fractions.Fraction`), ties break by higher pair count then
    lexicographically smallest pair. The heap is lazy like the BPE
    loop, but a WordPiece score goes stale whenever EITHER symbol's
    corpus occurrence count changes (not just the pair count), so every
    entry carries the (pair_count, count(a), count(b)) snapshot it was
    scored with and re-scores on pop when any of the three moved.
    Merges stop when no pair reaches ``min_pair_count`` (same floor as
    the BPE fit, so the exhausting-fit fixture argument carries over:
    the fit folds EVERY pair at/above the floor regardless of order).
    """
    from fractions import Fraction

    words = []
    sym_counts: Counter = Counter()
    for w, c in word_counts:
        if not w:
            continue
        syms = [w[0]] + [f"##{ch}" for ch in w[1:]]
        c = int(c)
        words.append((syms, c))
        for s in syms:
            sym_counts[s] += c

    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for i, (syms, c) in enumerate(words):
        for p in _word_pairs(syms):
            pair_counts[p] += c
            pair_words[p].add(i)

    def entry(p):
        pc = pair_counts.get(p, 0)
        sa, sb = sym_counts.get(p[0], 0), sym_counts.get(p[1], 0)
        score = Fraction(pc, sa * sb) if pc and sa and sb else Fraction(0)
        return (-score, -pc, p, pc, sa, sb)

    heap = [entry(p) for p in pair_counts]
    heapq.heapify(heap)
    init_vocab = sorted(sym_counts)
    merges = []
    while len(merges) < n_merges and heap:
        negs, negpc, best, pc0, sa0, sb0 = heapq.heappop(heap)
        pc = pair_counts.get(best, 0)
        sa = sym_counts.get(best[0], 0)
        sb = sym_counts.get(best[1], 0)
        if (pc, sa, sb) != (pc0, sa0, sb0):  # stale snapshot — re-score
            if pc >= min_pair_count:
                heapq.heappush(heap, entry(best))
            continue
        if pc < min_pair_count:
            continue  # below floor; a later (stale) entry may still win
        a, b = best
        new_sym = _wp_join(a, b)
        dirty = set()
        for i in sorted(pair_words.pop(best, ())):
            syms, c = words[i]
            if best not in _word_pairs(syms):
                continue
            for p in _word_pairs(syms):
                pair_counts[p] -= c
                dirty.add(p)
            merged = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    merged.append(new_sym)
                    sym_counts[a] -= c
                    sym_counts[b] -= c
                    sym_counts[new_sym] += c
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            words[i] = (merged, c)
            for p in _word_pairs(merged):
                pair_counts[p] += c
                pair_words[p].add(i)
                dirty.add(p)
        pair_counts[best] = 0
        dirty.discard(best)
        for p in dirty:
            if pair_counts.get(p, 0) >= min_pair_count:
                heapq.heappush(heap, entry(p))
        merges.append((a, b))
    return WordPieceModel(
        merges=merges,
        vocab=init_vocab + [_wp_join(a, b) for a, b in merges],
    )


def fit_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    max_words: int = 200_000,
    min_pair_count: int = 2,
) -> WordPieceModel:
    """Fit WordPiece on a corpus: the same ONE distributed word-count
    agg as the BPE fit (`corpus_word_counts`) + the driver trainer."""
    return fit_wordpiece_from_counts(
        corpus_word_counts(df, text_col, max_words),
        n_merges=n_merges,
        min_pair_count=min_pair_count,
    )


def wordpiece_encode_word(word: str, vocab: set) -> list:
    """BERT inference: GREEDY LONGEST-MATCH-FIRST — unlike BPE, the
    encoder never replays merges; it just takes the longest vocab piece
    at each position (continuations carry ``##``). A word with an
    unmatchable remainder encodes to ``[UNK]`` (whole word, per BERT)."""
    out = []
    pos = 0
    n = len(word)
    while pos < n:
        end = n
        piece = None
        while end > pos:
            sub = word[pos:end]
            if pos > 0:
                sub = "##" + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def wordpiece_encode_text(text: str, vocab: set, cache: dict) -> list:
    out = []
    for w in re.findall(BPE_RE, text):
        toks = cache.get(w)
        if toks is None:
            toks = wordpiece_encode_word(w, vocab)
            cache[w] = toks
        out.extend(toks)
    return out


def wordpiece_token_stats(
    model: WordPieceModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document WordPiece stats — the `bpe_token_stats` twin on the
    greedy-inference tokenizer: token count + chars-per-token. Single
    Arrow-batched pass, no shuffle."""
    vocab = model.vocab_set()

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: []
            if t is None
            else wordpiece_encode_text(t, vocab, cache)
        )

    base = df.select(
        F.col(id_col),
        F.size(enc(F.col(text_col))).cast("long").alias("n_wp"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    return base.select(
        id_col,
        "n_wp",
        "n_chars",
        (F.col("n_chars") / F.greatest(F.col("n_wp"), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# Unigram LM (round 10): the SentencePiece-family tokenizer — EM-fitted
# piece probabilities, Viterbi inference
# ---------------------------------------------------------------------------


class UnigramModel(NamedTuple):
    """Fitted unigram-LM model: ``scores`` maps piece -> INTEGER
    micro-nat log-probability (quantized once at the end of the fit, so
    Viterbi is pure integer arithmetic — deterministic on any host)."""

    scores: dict  # piece -> int (micro-nats, negative)

    def vocab(self) -> list:
        return sorted(self.scores)


def unigram_model_from_counts(piece_counts) -> UnigramModel:
    """Closed-form model constructor: probabilities proportional to the
    given piece counts, log-quantized to micro-nats. This is both the
    fit's final step AND the fixture-oracle entry point — a vocab whose
    counts are doc_id arithmetic yields a provable Viterbi segmentation
    without running EM inside the oracle."""
    import math

    total = sum(c for _, c in piece_counts)
    return UnigramModel(scores={
        p: int(round(math.log(c / total) * 1_000_000))
        for p, c in piece_counts
        if c > 0
    })


def unigram_viterbi(word: str, scores: dict, max_len: int = 16) -> list:
    """Max-likelihood segmentation: DP over end positions, integer
    micro-nat scores. Deterministic tie-break: at equal score prefer
    FEWER pieces, then the lexicographically smaller piece list (via
    choosing the LONGEST last piece). Unsegmentable words (a char
    outside the vocab) fall back to per-char pieces with [UNK] for the
    missing chars — nothing is dropped."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    pieces_used = [0] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            if best[start] == NEG:
                continue
            s = scores.get(word[start:end])
            if s is None:
                continue
            cand = best[start] + s
            better = cand > best[end] or (
                cand == best[end]
                and (
                    pieces_used[start] + 1 < pieces_used[end]
                    or (
                        pieces_used[start] + 1 == pieces_used[end]
                        and start < back[end]
                    )
                )
            )
            if better:
                best[end] = cand
                pieces_used[end] = pieces_used[start] + 1
                back[end] = start
    if best[n] == NEG:
        return [w if w in scores else UNK for w in word]
    out = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


def fit_unigram_from_counts(
    word_counts,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_size: int = 20_000,
    n_iter: int = 4,
    shrink_num: int = 3,
    shrink_den: int = 4,
) -> UnigramModel:
    """Driver-side unigram-LM trainer (Kudo 2018 / the SentencePiece
    shape) over the bounded ``[(word, count), ...]`` table:

    1. SEED: every substring up to ``max_piece_len`` of every table
       word, counts aggregated by containing-word mass, capped to
       ``seed_size`` by (count desc, piece asc); single characters are
       always kept (coverage guarantee).
    2. EM: E-step runs the forward-backward lattice per word (positions
       x pieces) accumulating EXPECTED piece counts weighted by word
       count; M-step renormalizes. After each round the vocab PRUNES to
       ``shrink_num/shrink_den`` of its size by expected count (chars
       exempt) until ``vocab_size`` is reached.
    3. The final expected counts quantize through
       `unigram_model_from_counts` (integer micro-nats), so INFERENCE
       is exactly reproducible even though EM ran in floats.

    Scale: like the BPE/WordPiece fits, the only distributed work is
    the word-count agg — EM touches the bounded table only.
    """
    import math

    words = [(w, int(c)) for w, c in word_counts if w]
    seed: Counter = Counter()
    chars = set()
    for w, c in words:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                seed[w[i:j]] += c
    pieces = sorted(seed, key=lambda p: (-seed[p], p))[:seed_size]
    vocab = set(pieces) | chars
    probs = {p: float(seed[p]) for p in vocab}
    total = sum(probs.values())
    probs = {p: v / total for p, v in probs.items()}

    def e_step():
        expected: Counter = Counter()
        loglik = 0.0
        for w, c in words:
            n = len(w)
            # forward
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for end in range(1, n + 1):
                s = 0.0
                for start in range(max(0, end - max_piece_len), end):
                    p = probs.get(w[start:end])
                    if p:
                        s += alpha[start] * p
                alpha[end] = s
            if alpha[n] <= 0:
                continue  # uncoverable word (pruned char) — skip
            # backward
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for start in range(n - 1, -1, -1):
                s = 0.0
                for end in range(start + 1, min(n, start + max_piece_len) + 1):
                    p = probs.get(w[start:end])
                    if p:
                        s += p * beta[end]
                beta[start] = s
            z = alpha[n]
            loglik += c * math.log(z)
            for start in range(n):
                if alpha[start] == 0:
                    continue
                for end in range(
                    start + 1, min(n, start + max_piece_len) + 1
                ):
                    p = probs.get(w[start:end])
                    if p:
                        expected[w[start:end]] += (
                            c * alpha[start] * p * beta[end] / z
                        )
        return expected, loglik

    for _ in range(n_iter):
        expected, _ = e_step()
        if len(probs) > vocab_size:
            multi = [p for p in probs if len(p) > 1]
            keep_n = max(
                vocab_size - len(chars),
                len(multi) * shrink_num // shrink_den,
            )
            kept = sorted(
                multi, key=lambda p: (-expected.get(p, 0.0), p)
            )[:keep_n]
            vocab = set(kept) | chars
        else:
            vocab = set(probs)
        tot = sum(expected.get(p, 0.0) for p in vocab) or 1.0
        floor = 1e-12  # chars with zero expectation keep coverage
        probs = {
            p: max(expected.get(p, 0.0) / tot, floor) for p in vocab
        }
    # final integer quantization: micro-nat scores from scaled counts
    scale = 1e9
    return unigram_model_from_counts(
        [(p, max(1, int(round(v * scale)))) for p, v in probs.items()]
    )


def fit_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 200_000,
    **kw,
) -> UnigramModel:
    """Fit the unigram LM on a corpus: the same ONE distributed
    word-count agg + the driver EM trainer."""
    return fit_unigram_from_counts(
        corpus_word_counts(df, text_col, max_words),
        vocab_size=vocab_size,
        **kw,
    )


def unigram_encode_text(text: str, scores: dict, cache: dict) -> list:
    out = []
    for w in re.findall(BPE_RE, text):
        toks = cache.get(w)
        if toks is None:
            toks = unigram_viterbi(w, scores)
            cache[w] = toks
        out.extend(toks)
    return out


def unigram_token_stats(
    model: UnigramModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM stats — the `bpe_token_stats` twin on
    Viterbi inference. Single Arrow-batched pass, no shuffle."""
    scores = dict(model.scores)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: []
            if t is None
            else unigram_encode_text(t, scores, cache)
        )

    base = df.select(
        F.col(id_col),
        F.size(enc(F.col(text_col))).cast("long").alias("n_ug"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    return base.select(
        id_col,
        "n_ug",
        "n_chars",
        (F.col("n_chars") / F.greatest(F.col("n_ug"), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


def save_tokenizer(model, fs, rel: str) -> None:
    """Persist any of the three tokenizer families through the FS verbs
    (file/mem/HTTP/S3) as one atomically-published JSON blob — the
    same index-artifact discipline as `save_bpe` (fit once, ship the
    artifact). The family is encoded in the payload, so `load_tokenizer`
    round-trips without the caller tracking which trainer produced it."""
    import json

    if isinstance(model, BpeModel):
        payload = {"format": 1, "family": "bpe",
                   "merges": [list(m) for m in model.merges],
                   "vocab": list(model.vocab)}
    elif isinstance(model, WordPieceModel):
        payload = {"format": 1, "family": "wordpiece",
                   "merges": [list(m) for m in model.merges],
                   "vocab": list(model.vocab)}
    elif isinstance(model, UnigramModel):
        payload = {"format": 1, "family": "unigram",
                   "scores": dict(model.scores)}
    else:
        raise TypeError(f"not a tokenizer model: {type(model).__name__}")
    parent = rel.rsplit("/", 1)[0] if "/" in rel else ""
    fs.makedirs(parent)
    fs.write_bytes_atomic(rel, json.dumps(payload).encode("utf-8"))


def load_tokenizer(fs, rel: str):
    """Inverse of :func:`save_tokenizer` — returns the right model class
    for the stored family."""
    import json

    payload = json.loads(fs.read_bytes(rel).decode("utf-8"))
    if payload.get("format") != 1:
        raise ValueError(
            f"unsupported tokenizer format: {payload.get('format')!r}"
        )
    fam = payload.get("family")
    if fam == "bpe":
        return BpeModel(
            merges=[tuple(m) for m in payload["merges"]],
            vocab=list(payload["vocab"]),
        )
    if fam == "wordpiece":
        return WordPieceModel(
            merges=[tuple(m) for m in payload["merges"]],
            vocab=list(payload["vocab"]),
        )
    if fam == "unigram":
        return UnigramModel(
            scores={p: int(v) for p, v in payload["scores"].items()}
        )
    raise ValueError(f"unknown tokenizer family: {fam!r}")
