"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE.json north-star):
- ``cosine_topk``: exact brute-force top-k — the correctness baseline. One
  map-side pass + TakeOrderedAndProject; no shuffle of the corpus.
- ``lsh_ann`` / ``ivf_topk``: sublinear scale paths. Random-hyperplane LSH
  derives deterministic hyperplanes from md5 bits (reproducible without a
  stored model); IVF uses per-block centroids (any clustering/block column)
  and probes only the closest blocks.

All vector math is JVM-side (`zip_with`/`aggregate`); no Python in the
row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakota_spark.functions import cosine, dot, hash32, l2_norm


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    The query is a literal array folded into the plan (broadcast-free);
    Catalyst turns orderBy+limit into TakeOrderedAndProject, so the full
    corpus is scanned once, map-side, and only k rows cross the wire —
    the right brute-force shape at any scale.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """k nearest right-rows for every left-row.

    With ``block_col`` the cross product is confined to blocks (IVF-style);
    without, it is a broadcast nested-loop — only for small right sides.
    """
    l = left.select(
        F.col(left_id).alias("qid"),
        F.col(left_vec).alias("qv"),
        l2_norm(F.col(left_vec)).alias("qn"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    r = right.select(
        F.col(right_id).alias("nid"),
        F.col(right_vec).alias("nv"),
        l2_norm(F.col(right_vec)).alias("nn"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    joined = l.join(F.broadcast(r) if not block_col else r,
                    on=(["blk"] if block_col else None),
                    how="inner" if block_col else "cross")
    # norms precomputed per vector: one array pass per pair, not three
    scored = joined.where(F.col("qid") != F.col("nid")).select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("nid")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic, model-free)
# ---------------------------------------------------------------------------

def _plane_coeffs(plane: int, dim: int) -> list[float]:
    """±1 coefficients of hyperplane ``plane``: +1 iff the 32-bit md5
    prefix of f"{plane},{i}" is even — EXACTLY `functions.hash32` parity,
    so the SQL oracle reproduces the same planes from md5 alone."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{plane},{i}".encode()).hexdigest()[:8], 16)  # noqa: S324
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def _hyperplane_sign(vec: F.Column, plane: int, dim: int) -> F.Column:
    """sign(h_p · v) with h_p[d] = ±1 derived from md5(p,d) parity.

    Deterministic and engine-reproducible: no stored random matrix, any
    executor (or SQL oracle) rebuilds the same hyperplane. The
    coefficients depend only on (plane, index), so they are folded into
    the plan as a LITERAL array at build time — zero md5 calls at
    runtime (the per-row md5 form was the dominant cost of bucketing:
    planes × dim digests per vector). The element-order sum is identical,
    so bucket values are bitwise unchanged.
    """
    coeffs = F.array(*[F.lit(c) for c in _plane_coeffs(plane, dim)])
    signed = F.aggregate(
        F.zip_with(vec, coeffs, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(signed >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Append a ``bucket`` column: the ``num_planes``-bit hyperplane signature.

    Cosine-similar vectors land in the same bucket with high probability;
    downstream joins become equi-joins on ``bucket``. ``dim`` (probed with
    a one-row job when omitted — a single int on the driver) sizes the
    literal coefficient arrays folded into the plan.
    """
    from lakota_spark.operators.util import ensure_parallelism

    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        dim = row[0]["d"] if row else 0
    df = ensure_parallelism(df)
    sig = None
    for p in range(num_planes):
        term = _hyperplane_sign(F.col(vec_col), p, dim) * F.lit(1 << p)
        sig = term if sig is None else sig + term
    return df.withColumn("bucket", sig.cast("long"))


def lsh_ann(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe LSH).

    At 100 TB with the table bucketed/partitioned by ``bucket``, this scans
    ~(probed buckets / 2^planes) of the corpus instead of all of it.
    """
    bucketed = lsh_bucket(df, num_planes, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsig = None
    for p in range(num_planes):
        term = _hyperplane_sign(q, p, len(query_vec)) * F.lit(1 << p)
        qsig = term if qsig is None else qsig + term
    probed = bucketed.where(
        F.bit_count(F.col("bucket").bitwiseXOR(qsig.cast("long")))
        <= probe_hamming
    )
    return (
        probed.select(
            F.col(id_col),
            F.col("bucket"),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: rank blocks by centroid similarity to the query, scan
    only the ``n_probe`` closest blocks, exact top-k within them.

    The centroid table is tiny (one row per block) → computed with one
    groupBy and collected into the plan as a filter list.
    """
    # Centroids via posexplode: one narrow explode + one partial-agg
    # shuffle keyed on (block, position), then re-assemble each centroid
    # with a sorted collect. Scales in BOTH corpus size and dimension —
    # the per-element `F.avg(vec[i])` form built dim separate aggregate
    # expressions (clumsy past dim~100 and quadratic in codegen size).
    centroids = (
        df.select(F.col(block_col), F.posexplode(F.col(vec_col)))
        .groupBy(block_col, "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy(block_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pairs")
        )
        .select(
            block_col,
            F.transform(F.col("pairs"), lambda p: p["m"]).alias("centroid"),
        )
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # round-then-rank with a key tiebreak: block selection becomes
    # engine-reproducible (raw double ranking is summation-order
    # sensitive in the last ulp — enough to flip a near-tie)
    top_blocks = [
        r[block_col]
        for r in centroids.select(
            block_col, F.round(cosine(F.col("centroid"), q), 6).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col(block_col))
        .limit(n_probe)
        .collect()
    ]
    return (
        df.where(F.col(block_col).isin(top_blocks))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max|x|/127,
    code_i = floor(x_i/scale + 0.5). The 4× memory cut that keeps a
    100 TB embedding corpus in cluster RAM for ANN serving; codes stay
    an int array column (Spark has no int8 array, but parquet dictionary
    + zstd captures most of the win on disk).

    ``floor(x + 0.5)`` instead of round(): half-up floor is unambiguous
    and bit-identical across engines, so the quantized representation —
    and everything computed from it — carries exact oracles. Zero
    vectors take scale 1.0 (codes all 0).
    """
    vec = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    ) / F.lit(127.0)
    codes = F.transform(
        vec,
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
    )
    return df.select(
        F.col(id_col), codes.alias("codes"), scale.alias("scale")
    )


def quantized_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine over int8-dequantized vectors, with the exact
    cosine alongside — the measurable recall/precision trade of serving
    ANN from quantized storage. Dequantized value = code·scale, so the
    whole pipeline (quantize → dequantize → rank) is deterministic and
    oracle-exact; ranking uses the quantized score (ties by id), the
    exact score rides along for error measurement."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    ) / F.lit(127.0)
    # quantize-dequantize inline (one projection, no self-join): the
    # plan stays a single scan + TakeOrderedAndProject
    deq = F.transform(
        vec,
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)) * scale,
    )
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(deq, q), 6).alias("q_sim"),
            F.round(cosine(vec, q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("q_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 2,
    n_codes: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN: split vectors into ``m`` subspaces,
    learn a k-means codebook per subspace (`clustering.kmeans_fit` on
    the sliced sub-vectors — deterministic rounded state), encode every
    vector as m small codes, and rank by the asymmetric distance (ADC):
    the sum over subspaces of ‖q_sub − centroid[code]‖², looked up from
    an m×n_codes table folded into the plan as literals. The compression
    workhorse of billion-vector ANN (Jégou et al. 2011): at 100 TB each
    vector stores m bytes instead of dim floats, and query cost is a
    table lookup per subspace.

    Exact-oracle construction: codebooks come from the deterministic
    Lloyd loop (so they unroll into SQL), the ADC table entries are
    rounded by the ENGINE (`F.round` of literal sums — python half-even
    rounding never touches values), and ranking ties break on id. The
    exact cosine rides along to measure recall, like
    `quantized_cosine_topk`. Pass ``codebooks`` (list of per-subspace
    centroid lists from a prior fit) to reuse a trained quantizer.
    """
    from lakota_spark.operators.clustering import kmeans_fit, kmeans_predict

    d = len(query_vec)
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    out = df
    adc_total = None
    for mi in range(m):
        lo = mi * sub + 1
        sub_col = F.slice(F.col(vec_col), lo, sub)
        scol = f"_pq_sub_{mi}"
        out = out.withColumn(scol, sub_col)
        if codebooks is not None:
            cents = codebooks[mi]
        else:
            cents, _ = kmeans_fit(
                df.select(F.col(id_col), sub_col.alias(scol)),
                k=n_codes,
                iters=iters,
                vec_col=scol,
                id_col=id_col,
            )
        out = kmeans_predict(out, cents, vec_col=scol).withColumnRenamed(
            "cluster", f"_pq_code_{mi}"
        )
        q_sub = [float(x) for x in query_vec[mi * sub : (mi + 1) * sub]]
        # ADC table entry per centroid: raw python double sum (sequential,
        # same fp order as the SQL oracle's lockstep-unnest sum), rounded
        # by the ENGINE via F.round on the literal
        table = F.array(
            *[
                F.round(
                    F.lit(
                        sum(
                            (qx - cx) * (qx - cx)
                            for qx, cx in zip(q_sub, coords)
                        )
                    ),
                    6,
                )
                for _, coords in cents
            ]
        )
        # codes are positions into the surviving-centroid list, which may
        # be shorter than n_codes — map cluster id -> list position
        pos_of = {c: i for i, (c, _) in enumerate(cents)}
        code_pos = F.col(f"_pq_code_{mi}")
        if any(c != i for i, (c, _) in enumerate(cents)):
            mapping = F.map_from_arrays(
                F.array(*[F.lit(c) for c, _ in cents]),
                F.array(*[F.lit(i) for i in pos_of.values()]),
            )
            code_pos = mapping[code_pos]
        adc_mi = F.element_at(table, code_pos + 1)
        adc_total = adc_mi if adc_total is None else adc_total + adc_mi
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        out.select(
            F.col(id_col),
            adc_total.alias("adc"),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("adc").asc(), F.col(id_col))
        .limit(k)
    )


def ivf_kmeans_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-ANN with a LEARNED coarse quantizer: Lloyd k-means centroids
    (`clustering.kmeans_fit`, deterministic rounded state) replace
    `ivf_topk`'s pre-existing block column — the shape of a real IVF
    index, where the inverted lists come from clustering the corpus
    itself. Rank the k centroids by rounded cosine to the query (tiny —
    k rows), scan only the ``n_probe`` closest lists, exact top-k within
    them. Because every piece of k-means state is rounded/tie-broken
    deterministically, even this learned-index ANN carries an exact SQL
    oracle (the Lloyd loop unrolls into the same WITH-chain as
    `kmeans_assign`).

    Scale shape: training is `kmeans_fit` (broadcast-argmin assignment,
    (cluster, dim)-keyed partial-agg updates; k×dim scalars to the
    driver per iteration); probing filters on the already-computed
    assignment column, so the query-time scan touches only the probed
    lists' rows. Pass ``centroids`` (from a previous `kmeans_fit`) to
    reuse a trained quantizer, and ``assigned`` (the corpus with its
    ``cluster`` column — ideally a MATERIALIZED parquet relation
    partitioned by cluster) to skip the per-query assignment entirely:
    then a probe touches only its lists' partitions (PartitionFilters)
    — the full IVF index, build amortized across queries like the
    trigram/BM25 posting tables.
    """
    from lakota_spark.operators.clustering import kmeans_fit, kmeans_predict

    if assigned is not None:
        if centroids is None:
            raise ValueError("assigned requires the matching centroids")
        cents = centroids
    elif centroids is None:
        cents, assigned = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col
        )
    else:
        cents = centroids
        assigned = kmeans_predict(df, cents, vec_col=vec_col)
    cent_df = df.sparkSession.createDataFrame(
        [(c, coords) for c, coords in cents],
        "cluster int, centroid array<double>",
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = [
        r["cluster"]
        for r in cent_df.select(
            "cluster", F.round(cosine(F.col("centroid"), q), 6).alias("s")
        )
        .orderBy(F.col("s").desc(), "cluster")
        .limit(n_probe)
        .collect()
    ]
    return (
        assigned.where(F.col("cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    runs: list,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval runs —
    the standard hybrid-search combiner for lexical (BM25) + dense
    (embedding cosine) top-k lists, rank-based so the incomparable score
    scales never need calibrating.

    Each input carries (id, 1-based ``rank_col``). Per-run contribution
    is ``round(1e9 / (k0 + rank))`` quantized to integer NANO units
    before the fold (the unigram-lm discipline — the cross-run sum is
    exact long addition, order/partitioning independent, and a SQL
    oracle reproduces it bit-for-bit). Returns
    ``(id, rrf_nano, n_runs)`` for every id present in any run.

    Scale shape: union of the (tiny) top-k relations + ONE partial-agg
    groupBy on the id — no window, no join; at web scale the runs are
    each a TakeOrderedAndProject output, so fusion cost is O(N·k).
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    u = runs[0].select(id_col, rank_col)
    for r in runs[1:]:
        u = u.unionByName(r.select(id_col, rank_col))
    contrib = F.round(
        F.lit(1000000000.0) / (F.lit(int(k0)) + F.col(rank_col))
    ).cast("long")
    return u.groupBy(id_col).agg(
        F.sum(contrib).alias("rrf_nano"),
        F.count(F.lit(1)).cast("int").alias("n_runs"),
    )


def mmr_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 8,
    pool: int = 32,
    lam_micro: int = 700000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998, round 8): greedily select ``k`` results maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` over a relevance-ranked
    candidate pool — the rerank a RAG/retrieval pipeline runs so the
    returned set isn't k near-copies of the best hit.

    Engine-reproducible iterative op, same discipline as the Lloyd /
    power-iteration chains: λ is an integer in micro-units, every
    cosine quantizes to integer micro-units (round half away from
    zero, the Spark/DuckDB round), so each greedy step is an integer
    argmax with ties to the smaller id and the whole loop unrolls into
    an exact SQL oracle.

    Scale shape: pool selection is the distributed brute-force scan
    (TakeOrderedAndProject — only ``pool`` rows cross the wire, same
    as `cosine_topk`; swap in `ivf_topk` for the pool at corpus
    scale); the greedy runs driver-side over the BOUNDED pool
    (O(pool²·dim) ≪ one task's work — MMR is definitionally a rerank
    of a candidate list, never a corpus pass).
    """
    if not 0 < k <= pool:
        raise ValueError("mmr_topk needs 0 < k <= pool")
    if not 0 <= lam_micro <= 1000000:
        raise ValueError("lam_micro is in [0, 1000000] micro-units")
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    pooled = (
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.round(cosine(F.col(vec_col), q) * 1000000)
            .cast("long")
            .alias("rel_micro"),
        )
        .orderBy(F.col("rel_micro").desc(), F.col(id_col))
        .limit(pool)
        .collect()
    )

    def _half_away(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    vecs = {r[id_col]: list(r["_v"]) for r in pooled}
    rel = {r[id_col]: r["rel_micro"] for r in pooled}
    ids = sorted(vecs)
    sim_cache: dict = {}

    def _cos_micro(i, j):
        key = (i, j) if i <= j else (j, i)
        got = sim_cache.get(key)
        if got is None:
            a, b = vecs[key[0]], vecs[key[1]]
            # sequential left-to-right folds mirror the SQL sum order
            dp = na = nb = 0.0
            for x, y in zip(a, b):
                dp += x * y
            for x in a:
                na += x * x
            for y in b:
                nb += y * y
            got = _half_away(
                dp / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0
            )
            sim_cache[key] = got
        return got

    mu = 1000000 - lam_micro
    first = max(ids, key=lambda i: (rel[i], -i))
    out_rows = [(1, first, rel[first], lam_micro * rel[first])]
    chosen = [first]
    while len(out_rows) < k and len(chosen) < len(ids):
        best = None
        for i in ids:
            if i in vecs and i not in chosen:
                ms = max(_cos_micro(i, j) for j in chosen)
                cand = (lam_micro * rel[i] - mu * ms, -i)
                if best is None or cand > best:
                    best = cand
        score, neg_i = best
        pick = -neg_i
        chosen.append(pick)
        out_rows.append((len(chosen), pick, rel[pick], score))

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("rank", T.LongType()),
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("rel_micro", T.LongType()),
        T.StructField("mmr_micro", T.LongType()),
    ])
    return df.sparkSession.createDataFrame(out_rows, schema)


def mips_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
) -> DataFrame:
    """EXACT maximum-inner-product top-k with Cauchy–Schwarz block
    pruning (round 10) — the scoring most embedding models train for
    (raw dot product, not cosine), served exactly at sub-corpus scan
    cost:

    1. per-block max L2 norm (one tiny groupBy, collected): every v in
       block b satisfies ``q·v <= ||q|| * max_norm(b)`` — the bound;
    2. phase 1 scans the ``probe`` highest-bound blocks exactly and
       collects the running k-th best score (a bounded k-row pull);
    3. phase 2 scans ONLY blocks whose bound can still beat it
       (``bound >= kth - 1e-6``, the epsilon covering the 6-decimal
       output rounding); skipped blocks PROVABLY cannot contribute, so
       the re-ranked union is the exact global top-k — never
       approximate. The adversarial worst case (all bounds above the
       kth score) degrades to the brute-force scan: unpruned, not
       wrong.

    100 TB shape: with materialized IVF lists partitioned by block, the
    phase-2 scan prunes at the PARTITION level; the bound table is one
    row per block. Oracle: plain dot-product ORDER BY ... LIMIT k.
    """
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    bounds = {
        r["b"]: r["mn"]
        for r in df.groupBy(F.col(block_col).alias("b"))
        .agg(F.max(l2_norm(F.col(vec_col))).alias("mn"))
        .collect()
    }
    ordered = sorted(bounds, key=lambda b: (-bounds[b] * qn, str(b)))
    head = ordered[:probe]

    def scan(blocks):
        return df.where(F.col(block_col).isin(list(blocks))).select(
            F.col(id_col),
            F.round(dot(F.col(vec_col), q), 6).alias("ip"),
        )

    first = (
        scan(head).orderBy(F.col("ip").desc(), F.col(id_col)).limit(k)
    )
    rows = first.collect()  # bounded: k rows
    rest = ordered[probe:]
    if len(rows) == k:
        kth = rows[-1]["ip"]
        rest = [b for b in rest if bounds[b] * qn >= kth - 1e-6]
    if not rest:
        return first
    return (
        scan(head + rest)
        .orderBy(F.col("ip").desc(), F.col(id_col))
        .limit(k)
    )
