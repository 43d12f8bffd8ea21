"""Deduplication operators for large-scale training-data pipelines.

Five families (BASELINE.json north-star): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine. All are compositions of built-in
DataFrame ops — explode/groupBy/join — so they distribute and stay
JVM-side. Hashes are md5-prefix based (`functions.hash32`) so a DuckDB
oracle can reproduce values bit-for-bit.

Scale design:
- Shingling/exploding is linear and map-side only.
- MinHash signatures: ONE shuffle (groupBy doc) computing K mins at once.
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  band keys — the canonical 100 TB-safe shape. All-pairs verification runs
  only on LSH candidates.
- A hot band bucket (many near-identical docs) is a skew risk: AQE skew
  handling plus an optional bucket-size cap (`max_bucket`) bound the blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakota_spark.functions import fingerprint, hash32, tokens, word_shingles
from lakota_spark.operators.tracker import VersionedCountsTracker


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text.

    Returns (digest, canonical_id, n_docs). Map-side partial agg makes the
    shuffle carry one row per (partition, digest) — scales to any corpus.
    """
    return (
        df.select(fingerprint(text_col).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Shingles + n-gram Jaccard
# ---------------------------------------------------------------------------

def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs — the base relation for Jaccard/MinHash."""
    from lakota_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(tokens(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    Without ``candidates`` this is the all-pairs join on shingle (correct,
    quadratic in bucket size — fine for verification or small corpora).
    With ``candidates`` (a (doc_a, doc_b) frame from LSH) only those pairs
    are scored — the scale path.
    Returns (doc_a, doc_b, inter, size_a, size_b, jaccard) with doc_a < doc_b.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # Candidate-driven: join the (small) candidate pair list against the
        # shingle table twice — work is O(|candidates| × shingles-per-doc),
        # never the all-pairs product. This is the 100 TB shape.
        sa = shingles.select(
            F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a")
        )
        sb = shingles.select(
            F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b")
        )
        inter = (
            candidates.select("doc_a", "doc_b")
            .distinct()
            .join(sa, on="doc_a")
            .join(sb, on="doc_b")
            .where(F.col("sh_a") == F.col("sh_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # All-pairs on shared shingles (verification tier / small corpora).
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = (
            a.join(b, on="shingle")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), on="doc_a")
        .withColumnRenamed("sz", "size_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "size_b"
            ),
            on="doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
    )
    # raw long/long division — bitwise-deterministic, no tie-prone rounding
    return out.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard"
    )


def containment_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT (Broder '97's second resemblance
    measure): ``cont_a = |S(A)∩S(B)| / |S(A)|`` — the fraction of doc A
    already present in doc B, and symmetrically ``cont_b``.

    This is the partial-duplication / quote-embedding detector: a
    50-shingle doc fully quoted inside a 5,000-shingle doc has
    containment 1.0 where symmetric Jaccard dilutes to ~0.01 and never
    clears a dedup bar. Dedup policies drop the contained (smaller) side.

    Reuses `jaccard_pairs`' intersection/size relation (same
    candidate-driven 100 TB shape: with an LSH ``candidates`` frame the
    work is O(|candidates| × shingles-per-doc), never all-pairs) and
    adds the two directed ratios plus ``containment = max(cont_a,
    cont_b)``; ``threshold`` filters on that max. All ratios are raw
    long/long divisions — bitwise-deterministic for the oracle.
    """
    base = jaccard_pairs(shingles, threshold=0.0, candidates=candidates)
    cont_a = F.col("inter") / F.col("size_a").cast("double")
    cont_b = F.col("inter") / F.col("size_b").cast("double")
    return (
        base.select(
            "doc_a",
            "doc_b",
            "inter",
            "size_a",
            "size_b",
            cont_a.alias("cont_a"),
            cont_b.alias("cont_b"),
            F.greatest(cont_a, cont_b).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: modulus of the affine minhash family (Mersenne prime 2^31 - 1).
#: CRITICAL: p must be SMALLER than the 32-bit base-hash range so that
#: a_k·h actually wraps — with a too-large modulus (e.g. 2^61-1) the
#: affine map is monotonic in h, every hash_k shares one argmin shingle,
#: and the 16-hash signature degenerates into 1 hash (caught by the
#: streaming near-dup recall test when first implemented that way).
MINHASH_P = (1 << 31) - 1


def _affine_consts(k: int) -> tuple[int, int]:
    # Knuth multiplicative constant spreads a_k across [1, p); both
    # constants are plain integers so SQL oracles embed them as literals
    a = (2654435761 * (k + 1)) % MINHASH_P or 1
    b = (40503 * (k + 7) + 11) % MINHASH_P
    return a, b


def minhash_hash_k(h, k: int):
    """hash_k = (a_k·(h mod p) + b_k) mod p over one md5-derived base
    hash — the classic universal-hash family. ONE md5 per shingle
    instead of K (A/B at sf0.1, K=16: 3.30 s → 0.92 s for the signature
    groupBy); a_k·h wraps ~2^31 times, so each k is an independent
    pseudo-permutation, and the formula is pure integer arithmetic both
    engines reproduce exactly (products stay under 2^62 < BIGINT max)."""
    a, b = _affine_consts(k)
    return (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """K minhash values per doc in ONE groupBy (columns mh_0..mh_{K-1}).

    hash_k(s) = affine_k(hash32(s)) — see `minhash_hash_k`; odd
    multipliers are units mod 2^61-1, so each k is a distinct permutation
    of the base-hash order.
    """
    h = hash32(F.col("shingle"))
    aggs = [
        F.min(minhash_hash_k(h, k)).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidates(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Band the signature, equi-join on (band_idx, band_key) → candidate pairs.

    Pairs sharing ≥1 band are emitted (doc_a < doc_b, distinct). ``max_bucket``
    drops pathological buckets (boilerplate documents) to bound the quadratic
    in-bucket pair generation — logged-by-contract for pipeline audits.
    """
    rows = num_hashes // bands
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"mh_{b * rows + r}").cast("string")
                                for r in range(rows)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")
    # the banded relation feeds up to THREE consumers (the hot-bucket cap
    # counts + both sides of the pair self-join); per-consumer pushdown
    # defeats exchange reuse, so without a checkpoint each consumer
    # re-runs the K-min signature aggregation + band explode (round-13
    # plan audit: minhash_dedup_pairs scanned the shingle checkpoint 6×,
    # 0 ReusedExchange). Same discipline as winnow_dup_pairs.
    banded = banded.localCheckpoint(eager=False)
    if max_bucket:
        counts = banded.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("_n")
        )
        # NOT pinned (ADVICE r13 double-pin): the semi-join re-runs per
        # self-join side over the PINNED banded relation — one cheap
        # map-side-agg'd counts pass each — instead of holding a second
        # full-size executor-storage copy for the query lifetime.
        # Round-14 A/B at sf0.1 (cap=1000): 0.999x, outputs identical.
        banded = banded.join(
            counts.where(F.col("_n") <= max_bucket).drop("_n"),
            on=["band_idx", "band_key"],
            how="left_semi",
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band_idx", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    materialize: str = "checkpoint",
    n_buckets: int = 64,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidate join → exact-Jaccard verify. Returns verified pairs.
    ``max_bucket`` passes through to `lsh_candidates`; set None to keep
    pathological buckets (required when comparing against an uncapped
    oracle).

    ``materialize`` picks how the shingle relation — used by three
    subplans (signatures + both sides of the verify join) — is shared.
    Measured A/B at sf0.1 (3 trials, median):

    - ``"checkpoint"`` (default): compute once, truncate lineage
      executor-local (`localCheckpoint`, lazy). 4.7 s — wins locally.
      Blocks live on executors; on executor loss the stage recomputes
      from the checkpoint's parent, so it trades a little resilience
      for never deriving the relation twice.
    - ``"bucketed"``: write ONCE as a parquet table bucketed (and
      sorted) by ``doc_id`` into ``n_buckets`` buckets. 6.2 s locally
      (pays the table write), but durable and exchange-free downstream:
      the signature groupBy and both verify-join shuffles hash on
      doc_id. The right choice when the pipeline is re-run or audited —
      at a 100 TB corpus the shingle relation is far too expensive to
      derive three times and must also survive executor churn.
    - ``"recompute"``: re-derive inside each subplan's whole-stage
      codegen (6.4 s; `.persist()` measured 14-20 s — caching breaks
      pipelining and per-consumer column pruning, so checkpoint/bucketed
      are the only materializations worth having).

    At pathological duplicate density the job is OUTPUT-bound, not
    input-bound: a 500k-doc probe with ~100 near-identical variants per
    document holds ~25M genuine pairs — verified end-to-end in ~9 min
    with a 32 g heap, but an under-provisioned block manager loses
    result blocks (TaskResultLost). The two controls are executor
    memory and ``lsh_candidates(max_bucket=...)``: a tight cap drops
    the pathological buckets and bounds the verify to the candidate
    budget (measured: cap=50 → 1.0M candidates in 30 s on the same
    corpus). Boilerplate-grade duplicate masses are better handled by
    `boilerplate_flags`/`line_dedup` upstream anyway.
    """
    sh = shingle_table(df, text_col, id_col, n)
    if materialize == "bucketed":
        import uuid as _uuid

        spark = df.sparkSession
        name = f"lakota_shingles_{_uuid.uuid4().hex[:8]}"
        (
            sh.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(name)
        )
        sh = spark.table(name)
    elif materialize == "checkpoint":
        sh = sh.localCheckpoint(eager=False)
    sigs = minhash_signatures(sh, num_hashes)
    cands = lsh_candidates(sigs, num_hashes, bands, max_bucket=max_bucket)
    return jaccard_pairs(sh, threshold, candidates=cands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Per-doc 64-bit SimHash over whitespace tokens (one groupBy).

    The signature is ``bits//16`` 16-bit words (columns sh_0..sh_{W-1}),
    each word derived from its own 4-hex-char slice of the token's md5 —
    engine-independent, so the DuckDB oracle reproduces words exactly,
    and the word layout sidesteps 64-bit sign overflow entirely. Word w,
    bit b of the fingerprint = sign of the sum over tokens of ±1 by bit b
    of the token's word-w hash. Duplicate tokens weight naturally.

    16-bit signatures (round 1) qualified 33% of all pairs as "near" —
    decorative; 64 bits puts the random-pair hamming mean at 32, so
    hamming ≤ 3 is a real near-dup test (VERDICT r1 #3).
    """
    from lakota_spark.operators.util import ensure_parallelism

    words = bits // 16
    tok = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("t"),
    ).select(
        "doc_id",
        *[
            F.conv(F.substring(F.md5("t"), 1 + 4 * w, 4), 16, 10)
            .cast("long")
            .alias(f"h_{w}")
            for w in range(words)
        ],
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"h_{w}"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"s_{w}_{b}")
        for w in range(words)
        for b in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    out = ["doc_id"]
    for w in range(words):
        sig = None
        for b in range(16):
            term = F.when(
                F.col(f"s_{w}_{b}") >= 0, F.lit(1 << b)
            ).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        out.append(sig.cast("long").alias(f"sh_{w}"))
    return agg.select(*out)


def simhash_pairs(sims: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance on the banded SimHash.

    Scale path: the signature's 16-bit words ARE the bands — by
    pigeonhole, any pair within distance < W words shares an identical
    word → equi-join on (word_idx, word_value), then exact Hamming via
    bit_count(xor) summed across words. Candidate buckets are keyed on
    65k distinct values per band (round 1's 4-bit chunks had 16 —
    quadratic n/16 buckets), so bucket sizes track true near-dup density.
    """
    words = sorted(
        int(c[3:]) for c in sims.columns if c.startswith("sh_")
    )
    assert max_hamming < len(words), "pigeonhole needs hamming < #bands"
    banded = sims.select(
        "doc_id",
        *[F.col(f"sh_{w}") for w in words],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("word_idx"),
                        F.col(f"sh_{w}").alias("word_val"),
                    )
                    for w in words
                ]
            )
        ).alias("c"),
    ).select(
        "doc_id", *[f"sh_{w}" for w in words], "c.word_idx", "c.word_val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = None
    for w in words:
        term = F.bit_count(
            F.col(f"a.sh_{w}").bitwiseXOR(F.col(f"b.sh_{w}"))
        ).cast("long")
        hamming = term if hamming is None else hamming + term
    return (
        a.join(b, on=["word_idx", "word_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.95,
    max_block: int | None = None,
    keep_block: bool = False,
    materialize: bool = True,
    pair_salt: int = 1,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    With ``block_col`` (e.g. a cluster/LSH bucket id) the self-join is an
    equi-join within blocks — the scalable shape; without it, all-pairs
    (only for small/verification runs). ``max_block`` drops pathological
    blocks (left-semi against the per-block counts) so a hot bucket can't
    re-create the quadratic blowup the blocking exists to avoid. Cosine is
    computed JVM-side (zip_with/aggregate), no UDF; each vector's L2 norm
    is computed ONCE in the projection (one array pass per pair instead of
    three — the norm recomputation dominated at |pairs| ≫ |vectors|), and
    the score keeps the exact ``dot/(na*nb)`` form of the DuckDB oracle.
    """
    from lakota_spark.functions import dot, l2_norm

    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    if block_col and materialize:
        # The blocked projection appears in 3 subplans (both join sides +
        # the cap counts); when the block key is computed (LSH buckets:
        # planes × dim interpreted-lambda ops per row) recomputing it 3×
        # dominates. Truncate lineage once, executor-local, no driver
        # traffic — the single-node analog of writing the bucketed
        # projection to an intermediate table on a cluster. Measured at
        # sf0.1: 4.4 s recomputed → ~1.8 s checkpointed.
        base = base.localCheckpoint(eager=False)
    if block_col and max_block:
        counts = base.groupBy("blk").agg(F.count(F.lit(1)).alias("_n"))
        base = base.join(
            counts.where(F.col("_n") <= max_block).drop("_n"),
            on="blk",
            how="left_semi",
        )
    if block_col and pair_salt > 1:
        # Expansion-join parallelism: with few distinct blocks the join
        # has ≤ k keys, AND AQE coalesces its shuffle by INPUT bytes —
        # blind to the (n/k)² output expansion — so the whole pairwise
        # cosine can land on a handful of tasks. Salt deterministically:
        # the a-side keyed by hash(id) % S, the b-side replicated S ways;
        # every unordered pair still appears exactly once (at the a-row's
        # salt), and the explicit co-partitioned repartition on
        # (blk, salt) spreads a hot block over S tasks while denying AQE
        # the chance to re-coalesce. Replication cost: S copies of the
        # BLOCKED projection only.
        n_part = int(base.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        a = base.withColumn(
            # pmod alone: abs(hash) overflows on Int32.MinValue under
            # ANSI mode; pmod already yields the non-negative residue
            "_ps", F.pmod(F.hash(F.col("id")), F.lit(pair_salt))
        ).repartition(n_part, "blk", "_ps")
        b = base.withColumn(
            "_ps", F.explode(F.array(*[F.lit(i) for i in range(pair_salt)]))
        ).repartition(n_part, "blk", "_ps")
        a, b = a.alias("a"), b.alias("b")
        cond = (
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a._ps") == F.col("b._ps"))
        )
    else:
        a, b = base.alias("a"), base.alias("b")
        cond = F.col("a.id") < F.col("b.id")
        if block_col:
            cond = cond & (F.col("a.blk") == F.col("b.blk"))
    out_cols = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nrm") * F.col("b.nrm")),
            6,
        ).alias("cos_sim"),
    ]
    if block_col and keep_block:
        out_cols.insert(2, F.col("a.blk").alias("block"))
    return (
        a.join(b, on=cond)
        .select(*out_cols)
        .where(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Inter-document repeated spans (substring-level dedup)
# ---------------------------------------------------------------------------

def repeated_spans(
    df: DataFrame,
    n: int = 6,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token spans whose word ``n``-grams appear in ``min_df``+ documents —
    the distributed shape of exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": a
    suffix-array pass marks 50-token spans duplicated across the corpus;
    here the unit is hashed word n-grams, the join-friendly equivalent).

    Three stages, all shuffle-lean:
      1. positioned shingles — posexplode (map-side, keeps token offset);
      2. document frequency per shingle — ONE groupBy with map-side
         partial agg; flagged shingles (df >= min_df) semi-join back
         onto the positioned relation (equi-join on the shingle);
      3. per-doc span assembly — gaps-and-islands over (doc, pos):
         lag + running break-count window, both partitioned by doc.

    Returns (doc_id, span_start, span_end, n_grams, n_docs_max): token
    interval [span_start, span_end) covered by flagged n-grams, how many
    flagged grams it merged, and the widest cross-doc spread among them.
    A cleaning pass clips these spans out (or drops docs whose spans
    cover too much of the text) instead of deleting whole documents —
    the operator exact-dedup/MinHash cannot express.

    Everything is integer arithmetic on (doc_id, pos) — exact under any
    partitioning, so a SQL oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    from lakota_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    pos_sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_shingles(tokens(text_col), n)).alias(
            "pos", "shingle"
        ),
    )
    flagged = (
        pos_sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_df)
    )
    hits = pos_sh.join(flagged, "shingle").select(
        "doc_id", "pos", "n_docs"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn(
            # a new island starts when this gram's window [pos, pos+n)
            # no longer overlaps the previous gram's
            "brk",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > F.lit(n)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
            F.max("n_docs").alias("n_docs_max"),
        )
        .drop("island")
    )
    return spans


def clip_repeated_spans(
    df: DataFrame,
    tiers: tuple = ((4, 8), (6, 2)),
    drop_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CONSUMING side of `repeated_spans` — Lee et al. 2021 clean
    semantics: merge flagged islands ACROSS n-gram tiers into disjoint
    token spans, then emit the drop-or-clip decision a cleaning pass
    applies — ``action`` ∈ {keep, clip, drop} plus the rebuilt text.

    - each tier is an ``(n, min_df)`` pair and the thresholds MUST
      differ per width to be non-redundant: with one shared min_df the
      smallest n's flags provably cover every larger n's (substrings
      of a cross-doc-shared string are themselves shared, so a flagged
      6-gram window lies inside flagged 4-gram windows). The practical
      tiering is strict-on-short / lenient-on-long — default: 4-grams
      only when very common (df ≥ 8, boilerplate), 6-grams at df ≥ 2
      (genuine long repeats);
    - flagged windows from every tier union into one positioned
      relation;
    - islands merge with a running-max-end window (variable widths, so
      the fixed-gap trick of `repeated_spans` does not apply): a new
      island starts when this gram's start passes every previous gram's
      end → islands are DISJOINT by construction, making ``n_clipped``
      a plain sum;
    - docs whose spans cover more than ``drop_frac`` of their tokens
      are dropped (text_clean = ''); others are clipped — the text is
      rebuilt from the surviving token positions (whitespace-normalized:
      single spaces, like every tokens()-derived operator here).

    Scale shape: one corpus scan feeds both the shingle union and the
    rebuild (localCheckpoint); one partial-agg groupBy for document
    frequencies; doc-keyed windows only. All integer/token arithmetic —
    exact under any partitioning, bit-for-bit SQL oracle.
    """
    import functools

    from pyspark.sql import Window

    from lakota_spark.operators.util import ensure_parallelism

    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
        .localCheckpoint(eager=False)
    )
    hit_parts = []
    for n, min_df in tiers:
        ps = base.select(
            "doc_id",
            F.posexplode(word_shingles(F.col("tk"), n)).alias(
                "pos", "shingle"
            ),
        )
        flagged = (
            ps.groupBy("shingle")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") >= min_df)
        )
        hit_parts.append(
            ps.join(flagged, "shingle").select(
                "doc_id", "pos", (F.col("pos") + F.lit(n)).alias("end")
            )
        )
    hits = functools.reduce(DataFrame.unionByName, hit_parts)
    return _clip_from_hits(base, hits, drop_frac)


def _clip_from_hits(base: DataFrame, hits: DataFrame, drop_frac: float) -> DataFrame:
    """Shared island-merge + decision + rebuild core: ``base`` is
    (doc_id, tk), ``hits`` is (doc_id, pos, end) flagged windows."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos", "end")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        hits.withColumn(
            "brk",
            F.when(
                prev_max.isNull() | (F.col("pos") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("s"),
            F.max("end").alias("e"),
        )
    )
    doc_spans = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("s"), F.col("e")))
        ).alias("spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("clipped"),
    )
    out = base.join(doc_spans, "doc_id", "left")
    n_tokens = F.size("tk").cast("long")
    n_clipped = F.coalesce(F.col("clipped"), F.lit(0).cast("long"))
    action = (
        F.when(F.col("spans").isNull(), F.lit("keep"))
        .when(n_clipped > F.lit(drop_frac) * n_tokens, F.lit("drop"))
        .otherwise(F.lit("clip"))
    )
    kept = F.filter(
        F.col("tk"),
        lambda x, i: ~F.exists(
            F.col("spans"),
            lambda sp: (i >= sp["s"]) & (i < sp["e"]),
        ),
    )
    text_clean = (
        F.when(action == "drop", F.lit(""))
        .when(action == "keep", F.array_join(F.col("tk"), " "))
        .otherwise(F.array_join(kept, " "))
    )
    return out.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_clipped.alias("n_clipped"),
        action.alias("action"),
        text_clean.alias("text_clean"),
    )


def flagged_shingle_table(
    df: DataFrame,
    tiers: tuple = ((4, 8), (6, 2)),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The (shingle, width) relation of corpus-flagged windows — the
    learned-boilerplate artifact of `clip_repeated_spans`, split out so
    it can be MATERIALIZED once per landed corpus (like the LSH
    candidate index) and served as the STATIC side of the streaming
    span gate: incoming documents are clipped against what the corpus
    already established as repeated, with no corpus re-scan per batch."""
    import functools

    parts = []
    for n, min_df in tiers:
        sh = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(tokens(text_col), n)).alias("shingle"),
        )
        parts.append(
            sh.groupBy("shingle")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") >= min_df)
            .select("shingle", F.lit(n).alias("width"))
        )
    return functools.reduce(DataFrame.unionByName, parts)


class SpanFlagTracker(VersionedCountsTracker):
    """Incrementally-refreshed flagged-shingle store for the streaming
    span gate.

    ``flagged_shingle_table`` is a one-shot snapshot: as the landed
    corpus grows batch by batch, document frequencies drift and a
    shingle that crosses ``min_df`` mid-stream would never start being
    clipped. This tracker materializes the underlying COUNTS relation
    ``(shingle, width, n_docs)`` as versioned parquet and folds every
    micro-batch's per-shingle distinct-doc counts into it with a
    sum-merge — exact because each document arrives in exactly ONE
    batch (the stream-of-new-documents contract; re-delivered doc_ids
    would double-count, which is the same at-least-once caveat the
    other foreachBatch gates document). Flags are derived on read:
    ``n_docs >= min_df`` per tier width.

    Versioning / atomic publish / CAS race discipline live in the
    shared `tracker.VersionedCountsTracker` base (also behind the BPE
    word-count store) — see its module docstring for the 100 TB
    bucketed-manifest upgrade path.
    """

    key_cols = ("shingle", "width")
    agg_col = "n_docs"

    def __init__(self, spark, path: str, tiers: tuple = ((4, 8), (6, 2))):
        super().__init__(spark, path)
        self.tiers = tuple(tiers)

    def _batch_counts(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        import functools

        parts = []
        for n, _min_df in self.tiers:
            sh = df.select(
                F.col(id_col).alias("doc_id"),
                F.explode(word_shingles(tokens(text_col), n)).alias(
                    "shingle"
                ),
            )
            parts.append(
                sh.groupBy("shingle")
                .agg(F.count_distinct("doc_id").alias("n_docs"))
                .select("shingle", F.lit(n).alias("width"), "n_docs")
            )
        return functools.reduce(DataFrame.unionByName, parts)

    def flags(self) -> DataFrame:
        """Current ``(shingle, width)`` flag relation — the static side
        of `clip_spans_vs_flags`. Empty-typed when nothing is folded."""
        import functools
        import operator

        c = self.counts()
        if c is None:
            return self.spark.createDataFrame(
                [], "shingle string, width int"
            )
        cond = functools.reduce(
            operator.or_,
            [
                (F.col("width") == n) & (F.col("n_docs") >= min_df)
                for n, min_df in self.tiers
            ],
        )
        return c.where(cond).select("shingle", "width")


def clip_spans_vs_flags(
    df: DataFrame,
    flags: DataFrame,
    widths: tuple = (4, 6),
    drop_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-clip a document batch against a PRECOMPUTED flagged-shingle
    relation (`flagged_shingle_table`) — the foreachBatch body of the
    streaming span gate, and the incremental form of
    `clip_repeated_spans` (same island/decision/rebuild core; the only
    difference is where the flags come from)."""
    import functools

    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).localCheckpoint(eager=False)
    hit_parts = []
    for n in widths:
        ps = base.select(
            "doc_id",
            F.posexplode(word_shingles(F.col("tk"), n)).alias(
                "pos", "shingle"
            ),
        )
        hit_parts.append(
            ps.join(
                flags.where(F.col("width") == n).select("shingle"),
                "shingle",
            ).select(
                "doc_id", "pos", (F.col("pos") + F.lit(n)).alias("end")
            )
        )
    hits = functools.reduce(DataFrame.unionByName, hit_parts)
    return _clip_from_hits(base, hits, drop_frac)


# ---------------------------------------------------------------------------
# Cluster canonicalization (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def dedup_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    method: str = "min_label",
) -> DataFrame:
    """Collapse verified near-dup PAIRS into clusters: connected
    components; returns (doc_id, cluster_id) with cluster_id = the
    smallest doc id in the component (the canonical survivor).

    A real dedup pipeline needs this step — pair lists alone over-delete
    (dropping both sides) or under-delete (keeping transitive dups);
    canonical-per-component keeps exactly one doc per cluster.

    Two methods, same result (property-tested equal on random graphs):

    - ``method="min_label"`` (default): iterative min-label propagation.
      Each round is one shuffle: labels join onto the symmetrized edge
      list, then min-aggregate per node; ``localCheckpoint`` truncates
      the growing lineage. Rounds needed = graph diameter; near-dup
      components are cliquish (tiny diameter), so 2-3 rounds in
      practice. Raises if ``max_iter`` rounds pass without reaching the
      fixpoint (an unconverged label set would silently disagree with
      the connected-components oracle).
    - ``method="star"``: alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and Beyond") —
      O(log n) rounds regardless of diameter. The upgrade path for
      adversarial long-chain graphs where min-propagation needs
      diameter rounds; slightly more work per round (two groupBy+join
      passes), so the cliquish default stays min_label.
    """
    if method == "star":
        return _dedup_clusters_star(pairs, src, dst, max_iter)
    if method != "min_label":
        raise ValueError(f"unknown method: {method!r}")
    # `pairs` is typically the full near-dup verify chain; the
    # symmetrizing union consumes it TWICE, and both branches replay the
    # chain inside the single edges materialization. Truncate lineage on
    # the bounded pair projection first so the chain runs once.
    p = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=False)
    edges = (
        p.union(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    changed = None
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' labels and its own
        via_edges = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("lbl"))
        )
        new_labels = (
            labels.union(via_edges)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dedup_clusters(min_label) did not converge in {max_iter} "
            f"rounds — the graph's diameter exceeds max_iter; raise "
            f"max_iter or use method='star' (O(log n) rounds)"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware dedup retention: per near-dup cluster, keep the
    member with the highest score (ties: smallest id — deterministic,
    so the result is oracle-comparable).

    Canonical-by-min-id (`dedup_clusters`) keeps an ARBITRARY member;
    real curation pipelines keep the best one (highest quality score,
    longest doc, freshest crawl). Returns one row per cluster:
    ``(cluster_id, n_members, n_dropped, kept_doc, kept_score)``.

    Scale shape: one broadcast-or-shuffle equi-join (clusters ⨝ scores
    on id) plus ONE partial-aggregated groupBy on cluster_id — the
    argmax folds map-side as ``min(struct(score IS NULL, -score, id))``
    (negating the SCORE, which is always numeric, keeps the smallest-id
    tie-break working for ANY orderable id type — string doc ids
    included; the earlier ``max(struct(score, -id))`` form failed on
    unary minus over strings, ADVICE r6). The leading null flag makes
    NULL-score members LOSE to any scored member (struct comparison
    sorts a null field first, so without the flag ``min`` would *keep*
    the one document with no quality signal); a cluster whose members
    are all unscored reports ``kept_score`` NULL with the min-id member.
    A single row per cluster crosses the wire regardless of cluster
    size (no window, no second pass).
    """
    joined = clusters.join(scores, id_col)
    best = F.min(
        F.struct(
            F.col(score_col).isNull().cast("int").alias("s_null"),
            (-F.col(score_col)).alias("neg_s"),
            F.col(id_col).alias("id"),
        )
    )
    return (
        joined.groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best.alias("_best"),
        )
        .select(
            cluster_col,
            "n_members",
            (F.col("n_members") - 1).alias("n_dropped"),
            F.col("_best.id").alias("kept_doc"),
            (-F.col("_best.neg_s")).alias("kept_score"),
        )
    )


def _sym_edges(e: DataFrame) -> DataFrame:
    """Symmetrize an (a, b) edge list, dropping self-loops."""
    return (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _dedup_clusters_star(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Per round (all equi-joins / partial-agg groupBys, no cartesian):

    - large-star: for each node u with m = min(N(u) ∪ {u}), rewire every
      strictly-larger neighbor v > u to m.
    - small-star: orient edges large→small; for each u with smaller
      neighborhood N⁻(u) and m = min(N⁻(u)), rewire N⁻(u) ∪ {u} to m.

    The edge set contracts toward stars (v, component_min) in O(log n)
    alternations; convergence = canonical edge set unchanged. Node count
    never grows, so every intermediate fits wherever the input fit.
    """
    # same discipline as min_label: the pair chain feeds three subtrees
    # (both _sym_edges branches + und); materialize the projection once
    p = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=False)
    nodes = (
        _sym_edges(p)
        .select(F.col("a").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    und = (
        p.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        sym = _sym_edges(und)
        # large-star
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least(F.col("a"), F.col("mb")).alias("m"))
        )
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        lsym = _sym_edges(large)
        # small-star on edges oriented large -> small
        oriented = lsym.where(F.col("a") > F.col("b"))
        mins2 = oriented.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            oriented.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("a"), F.col("m").alias("b")))
        )
        new_und = (
            small.where(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("a"),
                F.least("a", "b").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        changed = (
            new_und.exceptAll(und).limit(1).count()
            + und.exceptAll(new_und).limit(1).count()
        )
        und = new_und
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters(star) did not converge in {max_iter} rounds"
        )
    # at the fixpoint every edge is (member, component_min); isolated
    # components of size>1 all have their min as direct neighbor
    lbl = (
        _sym_edges(und)
        .groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(F.col("a").alias("node"), F.col("mb"))
    )
    return (
        nodes.join(lbl, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.least(F.col("node"), F.coalesce("mb", "node")).alias(
                "cluster_id"
            ),
        )
    )


def semdedup_pairs(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    top: int = 25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication that blocks
    the pairwise cosine search by K-MEANS CLUSTER instead of by an LSH
    signature — near-duplicates land in the same semantic cluster, so
    only intra-cluster pairs are scored. Returns the top near-duplicate
    candidate pairs (id_a < id_b, their shared cluster, cosine).

    Composition: `clustering.kmeans_assign` (deterministic seeds,
    6-decimal rounded state — the iterative loop with an exact unrolled
    SQL oracle) supplies the blocking key; the pair join is an equi-join
    on that key.

    Scale shape: the cluster assignment is a zero-shuffle broadcast
    argmin; the candidate join is an equi-join on cluster whose
    per-block cost is (n/k)² — k grows with the corpus in a real
    SemDeDup deployment (×100k clusters for web-scale), keeping blocks
    bounded exactly like `embedding_dup_pairs`' LSH buckets. Ranking is
    TakeOrderedAndProject: only `top` rows cross the wire.
    """
    from lakota_spark.operators.clustering import kmeans_fit, kmeans_predict

    if assigned is not None:
        # materialized (id, vec, cluster) relation — e.g. the shared
        # per-corpus IVF lists: zero assignment cost per run
        with_cluster = assigned.select(
            F.col(id_col), F.col(vec_col), F.col("cluster")
        )
    elif centroids is not None:
        # pre-trained quantizer (memoized per corpus, like IVF's): the
        # assignment is a zero-shuffle map-side argmin, no iterative jobs
        with_cluster = kmeans_predict(
            df.select(F.col(id_col), F.col(vec_col)), centroids, vec_col
        )
    else:
        # kmeans_fit's assignment frame already carries the original
        # columns + cluster — no join back (a full extra shuffle) needed
        _, assigned = kmeans_fit(
            df, k=k, iters=iters, vec_col=vec_col, id_col=id_col
        )
        with_cluster = assigned.select(
            F.col(id_col), F.col(vec_col), F.col("cluster")
        )
    # Delegate the pair stage to the shared blocked-pair kernel: per-vector
    # norms computed ONCE (one array pass per pair, not three — the 3-pass
    # form measured 2.5× slower here), clustered projection
    # localCheckpointed so the argmin subtree isn't recomputed on both
    # join sides. threshold=-1 keeps every intra-cluster pair; ranking
    # prunes to `top`.
    pairs = embedding_dup_pairs(
        with_cluster,
        vec_col=vec_col,
        id_col=id_col,
        block_col="cluster",
        threshold=-1.0,
        keep_block=True,
        pair_salt=16,
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.col("block").alias("cluster"),
            "cos_sim",
        )
        .orderBy(F.col("cos_sim").desc(), "id_a", "id_b")
        .limit(top)
    )


def edit_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    top: int = 25,
    max_bucket: int | None = 1000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Edit-distance near-duplicate verification: MinHash-LSH proposes
    candidate pairs, Levenshtein on the raw text confirms them —
    the character-level verify tier next to the token-level Jaccard one
    (`jaccard_pairs`). Catches the near-dups shingle sets blur together
    (small in-word edits, reorderings of rare tokens) and is the
    standard second stage of RETSim/edit-similarity dedup pipelines.

    Emits (doc_a < doc_b, edit_dist, edit_sim) for the top pairs by
    normalized similarity ``1 - lev/max(len)`` — an exact int/int
    division, so the oracle compare has zero float-tie risk.

    Scale shape: candidates come from the banded equi-join (bounded by
    ``max_bucket``); texts attach via two id-keyed equi-joins (shuffle
    co-partitioned on doc id — never a corpus self-join); Levenshtein
    runs JVM-side per candidate pair only. Ranking is
    TakeOrderedAndProject.

    Pass ``candidates`` (a (doc_a, doc_b) frame, e.g. a materialized
    per-corpus candidate table) to skip generation — the multi-tier
    architecture: sign+band ONCE per corpus, then every verify tier
    (Jaccard, edit, embedding) reads the same candidate relation.
    """
    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b")
    else:
        sh = shingle_table(df, text_col=text_col, id_col=id_col, n=shingle_n)
        sigs = minhash_signatures(sh, num_hashes=num_hashes)
        cand = lsh_candidates(sigs, num_hashes=num_hashes, bands=bands,
                              max_bucket=max_bucket)
    ta = df.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("_ta")
    )
    tb = df.select(
        F.col(id_col).alias("doc_b"), F.col(text_col).alias("_tb")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # one O(len^2) levenshtein per pair; the similarity derives
            # from the materialized column in a second projection
            F.levenshtein(F.col("_ta"), F.col("_tb"))
            .cast("long")
            .alias("edit_dist"),
            F.greatest(F.length("_ta"), F.length("_tb"), F.lit(1)).alias(
                "_maxlen"
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            (1 - F.col("edit_dist") / F.col("_maxlen")).alias("edit_sim"),
        )
        .orderBy(F.col("edit_sim").desc(), "doc_a", "doc_b")
        .limit(top)
    )


def boilerplate_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    flag_frac: float = 0.5,
) -> DataFrame:
    """Frequent-n-gram boilerplate detection (the C4/RefinedWeb "most
    common spans" stage): a word n-gram appearing in >= ``min_docs``
    DISTINCT documents is boilerplate; each doc reports what fraction of
    its grams are boilerplate and is flagged above ``flag_frac``
    (navigation chrome, license headers, templated spam).

    Scale shape: the distinct (doc, gram) relation feeds BOTH the
    document-frequency aggregate and the per-doc totals (one derivation,
    two partial-agg consumers); the boilerplate membership check is an
    equi-join on the gram (the frequent-gram table is the small side at
    real thresholds — AQE broadcasts it). Fractions are exact int/int
    divisions.
    """
    grams = shingle_table(df, text_col=text_col, id_col=id_col, n=n)
    grams = grams.localCheckpoint(eager=False)
    boiler = (
        grams.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("shingle")
    )
    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        grams.join(boiler, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    frac = F.coalesce(F.col("n_boiler"), F.lit(0)) / F.col("n_grams")
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            frac.alias("boiler_frac"),
            (frac > F.lit(flag_frac)).alias("flagged"),
        )
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Line-level corpus deduplication (C4's famous "discard any line
    occurring in more than one document" stage): a line appearing in
    >= ``min_docs`` DISTINCT documents is dropped from every document;
    the text is reconstructed from the surviving lines in order.

    Scale shape: one posexplode produces the (doc, pos, line) relation;
    the duplicate-line set comes from a distinct + partial-agg count;
    membership is an equi-join on the line (AQE broadcasts the dup set
    when small — at web scale it stays a shuffle equi-join); the rebuild
    is one doc-keyed aggregate with an in-group sort (array_sort over
    (pos, line) structs — no window, no single-partition stage).
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    # the explode feeds THREE subplans (dup counts, the anti-join probe,
    # per-doc totals) — truncate lineage once, same as boilerplate_flags'
    # grams relation, so the corpus scan + split runs once per action
    lines = lines.localCheckpoint(eager=False)
    dup = (
        lines.select("doc_id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("line")
    )
    kept = lines.join(dup, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s.line,
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def group_shingle_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """DATASET-level overlap: pairwise Jaccard similarity between the
    distinct word-shingle sets of document GROUPS (sources, crawl
    snapshots, dumps) — the corpus-granularity complement of the per-doc
    dedup ladder, answering "how much of dump B is already in dump A"
    before any per-doc work is scheduled (the cross-snapshot dedup
    planning signal).

    Scale shape: one explode + DISTINCT to the (group, shingle)
    relation, then a shingle equi-join with ``src_a < src_b`` +
    partial-agg pair counts. Per-shingle fan-out is bounded by
    n_groups² (groups are FEW by definition — sources/dumps, not docs),
    so no hot-bucket cap is needed; sizes join back broadcast. Returns
    ``(src_a, src_b, n_inter, jaccard)`` with the exact-int division
    left unrounded (engine-deterministic)."""
    from lakota_spark.functions import tokens, word_shingles

    # The distinct (g, shingle) relation feeds FOUR consumers (sizes,
    # both join sides — and sizes joins back twice): per-consumer filter
    # pushdown (isnotnull(shingle) on the join sides only) differentiates
    # the subtrees, so exchange reuse cannot fire and each consumer
    # re-runs the full corpus explode+distinct (r13 plan audit: 4 parquet
    # scans). One lazy executor-local materialization serves all four —
    # the winnow/langid recompute-guard discipline (interleaved A/B at
    # sf0.1: 3.8 -> 3.0 s best-of-3, plan collapses 4 scans -> 1).
    sh = df.select(
        F.col(group_col).alias("g"),
        F.explode(word_shingles(tokens(text_col), n)).alias("shingle"),
    ).distinct().localCheckpoint(eager=False)
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    a = sh.select(F.col("g").alias("src_a"), "shingle")
    b = sh.select(F.col("g").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("g").alias("src_a"), F.col("sz").alias("_sa"))
    sb = sizes.select(F.col("g").alias("src_b"), F.col("sz").alias("_sb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    base: int = 31,
    modulus: int = 1 << 25,
    divisor: int = 256,
    keep_text: bool = False,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS family): a chunk
    boundary falls AFTER position ``i`` wherever the polynomial hash of
    the k chars ending at i — ``H_i = (sum_j code(ch[i-j]) * base^j)
    % modulus`` — satisfies ``H_i % divisor == 0``.  Because boundaries
    depend only on local content, inserting or deleting a span only
    re-chunks its neighborhood: every chunk hash downstream of the edit
    survives, which is what makes chunk-level dedup robust to edits
    where fixed-width chunking is not (tested).  Average chunk length
    ~= ``divisor`` chars.

    Exactness: code points (not bytes), and the k-term dot product
    stays below 2**59 for base=31, k=8 (max code 0x10FFFF), so the
    hash needs NO intermediate reduction — the same closed form is
    computable in plain SQL (DuckDB oracle: per-char unnest + bounded
    self-join), and the Spark side is ONE vectorized Arrow pass
    (sliding-window matmul in int64 numpy) — no per-char JVM explode,
    no shuffle.  Docs shorter than ``k`` (or boundary-free) emit one
    whole-doc chunk; empty docs emit nothing.

    Output: (id, chunk_idx 0-based, start 1-based, chunk_len,
    chunk_hash [, chunk_text]) — ``chunk_hash`` is md5 of the chunk
    text (JVM-side, engine-identical to SQL ``md5``).

    Scale shape: mapInPandas over whatever partitioning the input has;
    per-row state is one codes array; output mass ~= input text mass.
    At 100 TB this is a pure map stage — chunk-level dedup afterwards
    is the usual hash groupBy.
    """
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if k < 1 or base < 2 or divisor < 2 or modulus % divisor != 0:
        # modulus must be a multiple of divisor or the boundary rate
        # is not 1/divisor
        raise ValueError("need k>=1, base>=2, divisor>=2, divisor|modulus")
    # powers are reduced mod `modulus`, so every dot-product term is
    # < 0x110000 * modulus; the k-term sum must stay inside int64 or
    # numpy wraps SILENTLY and the boundaries diverge from the SQL
    # oracle's closed form
    if k * 0x110000 * modulus >= 1 << 63:
        raise ValueError(
            f"k={k} * 0x110000 * modulus={modulus} overflows int64 — "
            "use a smaller modulus or window"
        )

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("chunk_idx", LongType()),
            StructField("start", LongType()),
            StructField("chunk_len", LongType()),
            StructField("chunk_text", StringType()),
        ]
    )
    powers_list = [base**j % modulus for j in range(k)]

    def chunk_batch(batches):
        import numpy as np

        powers = np.array(powers_list, dtype=np.int64)
        for pdf in batches:
            ids, idxs, starts, lens, texts = [], [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                n = len(text)
                bounds = []
                if n >= k:
                    codes = np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    # windows[i] = codes[i : i+k]; H for the window
                    # ENDING at 1-based pos i+k -> reversed powers
                    win = np.lib.stride_tricks.sliding_window_view(
                        codes, k
                    )
                    h = (win @ powers[::-1]) % modulus
                    bounds = (np.nonzero(h % divisor == 0)[0] + k).tolist()
                if not bounds or bounds[-1] != n:
                    bounds.append(n)
                prev = 0
                for ci, b in enumerate(bounds):
                    ids.append(rid)
                    idxs.append(ci)
                    starts.append(prev + 1)
                    lens.append(b - prev)
                    texts.append(text[prev:b])
                    prev = b
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "chunk_idx": idxs,
                    "start": starts,
                    "chunk_len": lens,
                    "chunk_text": texts,
                }
            )

    out = df.select(id_col, text_col).mapInPandas(chunk_batch, out_schema)
    out = out.withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    return out if keep_text else out.drop("chunk_text")
