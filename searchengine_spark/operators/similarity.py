"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k: broadcast the (small)
  query set against the full vector table; O(|Q| * N) dot products,
  all JVM-side (`zip_with`/`aggregate`), one top-k per query.
* ``lsh_bucket_top1``  — sign-LSH bucketed ANN: 8 axis-aligned
  hyperplane sign bits -> 256 buckets; neighbors searched only inside
  the bucket (equi-join on the bucket id — the N×N -> N×bucket_size
  scale path). Random-hyperplane projections are the general form;
  axis-aligned planes keep the DuckDB oracle exact.
* ``cosine_neardup_pairs`` — all vector pairs above a cosine
  threshold; exact (pair join), the embedding-space near-dup check.

Scale notes (10^9+ vectors): brute-force handles the query-serving
case (|Q| small, broadcast); for all-pairs work use the LSH bucket
join (or IVF: k-means-assign to coarse centroids + in-cell search —
same join shape with learned buckets). Cosines are rounded to 6
decimals on both engines so cross-engine float summation order can't
flip a comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .entry_ops import register

ROUND = 6
NEARDUP_COSINE = 0.35  # chosen from the synthetic corpus cosine tail
LSH_DIMS = (1, 9, 17, 25, 33, 41, 49, 57)  # 1-based dims for 8 sign bits

# frames cached ahead of self-joins (HOF cosines evaluate interpreted,
# so re-evaluating an assignment scan per join side is the dominant
# cost); call release_caches() after materializing results in
# long-lived sessions, same registry helper as operators.dedup
from .cacheutil import make_cache_registry

_cached, release_caches = make_cache_registry()


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has no direction — its cosine is NULL
    # (ANSI mode would otherwise abort the job on the division), and
    # NULL drops out of every downstream comparison, rank, and max
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    The query side is broadcast — the scan over N vectors is embarrass-
    ingly parallel with no shuffle until the per-query top-k."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    q = v.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qemb"), F.col("emb")), ROUND).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket(vec: Column) -> Column:
    """8-bit sign bucket from axis-aligned hyperplanes (dims LSH_DIMS)."""
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, d in enumerate(LSH_DIMS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_bucket_top1(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest neighbor (top-1 cosine) within each vector's LSH bucket.
    The bucket equi-join replaces the N x N cross join; vectors alone
    in their bucket yield no row (standard ANN recall trade)."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    a = v.select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"), "bucket"
    )
    b = v.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb"), "bucket"
    )
    scored = a.join(b, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "bucket",
        "neighbor_id",
        F.round(cosine(F.col("qemb"), F.col("nemb")), ROUND).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "bucket", "neighbor_id", "cosine")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = NEARDUP_COSINE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine >= threshold (exact pair
    join; at scale restrict to LSH/IVF candidates first)."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), ROUND).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def learned_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse centroids learned with seeded pyspark.ml KMeans over
    UNIT-NORMALIZED vectors (euclidean argmin on the unit sphere ==
    cosine argmax, so the learned cells match the engine's cosine
    assignment). Returns the tiny broadcastable (cent_id, cemb) table —
    the production replacement for the deterministic lowest-id seeding
    that the SQL oracle uses; the search join shape is IDENTICAL."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(as_double(F.col(vec_col)).alias("emb"))
    unit = v.select(
        F.transform(
            F.col("emb"), lambda x: x / norm(F.col("emb"))
        ).alias("uemb")
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="fv")
    model = km.fit(unit.select(array_to_vector("uemb").alias("fv")))
    spark = vectors.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cent_id long, cemb array<double>")


def _centroid_table(
    vectors: DataFrame,
    n_centroids: int,
    centroids,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Resolve the centroid spec: "ids" (deterministic lowest-id
    vectors — the oracle configuration), "kmeans" (learned), or a
    user-supplied (cent_id, cemb) DataFrame."""
    if isinstance(centroids, DataFrame):
        return centroids
    if centroids == "kmeans":
        return learned_centroids(vectors, n_centroids, id_col=id_col, vec_col=vec_col)
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    return v.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )


def ivf_cells(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids="ids",
    n_probe: int = 1,
    with_ccos: bool = False,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``n_probe``
    nearest of ``n_centroids`` centroids (cosine, ties to the lower
    centroid id); ``cell_rank`` 1..n_probe marks the home cell vs the
    extra probe cells.

    ``centroids="ids"`` (default) keeps the deterministic seeding — the
    centroids are the vectors with the smallest ids — so the assignment
    is reproducible and exactly SQL-oracle-checkable; ``"kmeans"``
    learns them (seeded pyspark.ml KMeans over a normalized sample) and
    reuses THE SAME join shape: the centroid table stays tiny and
    broadcast, the N-row assignment scan is embarrassingly parallel
    (no shuffle), and only the per-cell search shuffles, keyed by cell
    id. Cosines round to {ROUND} decimals before the argmax so the
    assignment can't flip on cross-engine float summation order.
    """
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    c = _centroid_table(vectors, n_centroids, centroids, id_col, vec_col)
    scored = v.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "emb",
        "cent_id",
        F.round(cosine(F.col("emb"), F.col("cemb")), ROUND).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id").asc()
    )
    cols = [
        F.col("vec_id"),
        F.col("emb"),
        F.col("cent_id").alias("cell"),
        F.col("rn").alias("cell_rank"),
    ]
    if with_ccos:
        cols.append(F.col("ccos"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select(*cols)
    )


def ann_ivf_top1(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest neighbor (top-1 cosine) within each vector's IVF cell —
    the inverted-file ANN search shape (Jégou et al., "Product
    quantization for nearest neighbor search", TPAMI 2011, coarse
    level): candidate set = own cell only (n_probe=1); probing more
    cells raises recall at proportional cost, same plan."""
    cells = ivf_cells(vectors, n_centroids, id_col, vec_col)
    a = cells.select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"), "cell"
    )
    b = cells.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb"), "cell"
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            F.round(cosine(F.col("qemb"), F.col("nemb")), ROUND).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "cell", "neighbor_id", "cosine")
    )


def ann_ivf_topk(
    vectors: DataFrame,
    k: int = 1,
    n_centroids: int = 16,
    n_probe: int = 1,
    centroids="ids",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with multi-cell probing: each query searches its
    ``n_probe`` nearest cells; candidates are indexed by their HOME
    cell only, so a (query, neighbor) pair appears at most once and
    recall rises monotonically with n_probe at proportional join cost
    (Jégou et al., TPAMI 2011 — the coarse-quantizer probe trade).
    Returns (query_id, neighbor_id, cosine, rank<=k)."""
    cells = ivf_cells(
        vectors, n_centroids, id_col, vec_col,
        centroids=centroids, n_probe=n_probe,
    )
    home = cells.filter(F.col("cell_rank") == 1)
    a = cells.select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"), "cell"
    )
    b = home.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb"), "cell"
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qemb"), F.col("nemb")), ROUND).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _sub_slices(emb: Column, m: int) -> Column:
    """Array of the ``m`` contiguous subvectors of ``emb`` (PQ subspace
    decomposition). The dimension MUST divide evenly by ``m`` — the
    standard PQ layout; an indivisible dim would otherwise SILENTLY
    drop the trailing ``dim % m`` dimensions from both the codebooks
    and the ADC scores (lossy codes with no error), so it fails loudly
    per row instead (one codegen'd modulo — free next to the slices).
    NULL embeddings pass through as NULL — dirty-corpus rows keep the
    same null propagation as every other ANN path (size(NULL) is NULL,
    and a NULL condition must not fall into the error branch)."""
    checked = F.when(
        emb.isNotNull() & (F.size(emb) % F.lit(m) != F.lit(0)),
        F.raise_error(
            F.concat(
                F.lit("PQ subspace split: embedding dim "),
                F.size(emb).cast("string"),
                F.lit(f" is not divisible by m={m}"),
            )
        ),
    ).otherwise(emb)
    sd = (F.size(emb) / F.lit(m)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(checked, j * sd + 1, sd),
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    quantization for nearest neighbor search", TPAMI 2011): the D-dim
    space splits into ``m`` subspaces; each carries ``ks`` codes.
    Deterministic seeding — subspace j's code c is the j-th subvector
    of the vector with id c (the PQ analog of the IVF "ids" centroid
    seeding, so the whole pipeline is SQL-oracle-exact; per-subspace
    seeded k-means is the production swap, same join shape). Returns
    the tiny broadcastable (sub_id, code, cvec) table: m*ks rows."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("code"),
        as_double(F.col(vec_col)).alias("emb"),
    ).filter(F.col("code") < ks)
    return v.select(
        "code", F.posexplode(_sub_slices(F.col("emb"), m))
    ).select(
        F.col("pos").cast("int").alias("sub_id"),
        "code",
        F.col("col").alias("cvec"),
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: per (vector, subspace), the L2-nearest code (ties
    to the lower code id) — D doubles become m small ints. Returns
    (vec_id, sub_id, code) ONLY: the codes table is the persisted PQ
    artifact and must carry ints, not reconstructed subvectors — rows
    that dragged the D/m-double ``cvec`` along would put the full raw
    corpus volume back through every downstream candidate join,
    defeating the ~32x size reduction that is PQ's whole point at
    10^11 vectors (the scan reconstructs via the tiny broadcast
    codebook instead). The N*m-row scan broadcasts the codebook table;
    squared distance uses the inner-product identity
    |x|^2 - 2<x,c> + |c|^2 (one expression shape on both engines),
    rounded to {ROUND} decimals so the argmin cannot flip on float
    summation order."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    subs = v.select(
        "vec_id", F.posexplode(_sub_slices(F.col("emb"), m))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("sub_id"),
        F.col("col").alias("svec"),
    )
    joined = subs.join(F.broadcast(codebooks), "sub_id").withColumn(
        "d2",
        F.round(
            dot(F.col("svec"), F.col("svec"))
            - F.lit(2.0) * dot(F.col("svec"), F.col("cvec"))
            + dot(F.col("cvec"), F.col("cvec")),
            ROUND,
        ),
    )
    # argmin via a struct-min HASH AGGREGATE, not a row_number window:
    # the window shuffles and sorts all N*m*ks candidate rows, while
    # the agg partial-combines map-side to one row per (vec_id, sub_id)
    # before the shuffle — ks-fold less shuffle volume, the difference
    # at 10^11 vectors. Struct ordering is field-lexicographic, so the
    # pick is (d2 asc, code asc) — identical to the window's; code is
    # unique within a subspace, so the tie never goes deeper.
    best = joined.groupBy("vec_id", "sub_id").agg(
        F.min(F.struct("d2", "code")).alias("b")
    )
    return best.select(
        "vec_id",
        "sub_id",
        F.col("b.code").alias("code"),
    )


def ann_ivf_pq_topk(
    vectors: DataFrame,
    k: int = 1,
    n_centroids: int = 16,
    n_probe: int = 1,
    m: int = 8,
    ks: int = 16,
    rerank: int = 4,
    centroids="ids",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN with exact re-ranking — the 100 TB embedding-search
    shape (Jégou et al., TPAMI 2011): the within-cell scan reads PQ
    CODES (m ints + the codebook, ~32x smaller than raw doubles — at
    10^11 vectors the probe reads dominate and raw-double cells are
    I/O-bound), scores candidates by asymmetric distance through the
    standard per-query lookup table (query subvectors dotted against
    the broadcast codebook once; the candidate join itself moves only
    ints and scalars, folded in subspace order), keeps the top
    ``rerank`` per query, and re-scores
    ONLY those with exact cosine on the raw vectors. recall@1 vs the
    exact within-cell search is monotone non-decreasing in ``rerank``
    and reaches 1.0 once rerank covers the cell (pinned in
    tests/test_round5.py).

    Returns (query_id, neighbor_id, approx_cosine, cosine, rank<=k) —
    ranked by the EXACT re-scored cosine."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    cells = ivf_cells(
        vectors, n_centroids, id_col, vec_col,
        centroids=centroids, n_probe=n_probe,
    )
    home = cells.filter(F.col("cell_rank") == 1).select("vec_id", "cell")
    probe = cells.select(
        F.col("vec_id").alias("query_id"),
        dot(F.col("emb"), F.col("emb")).alias("qdot"),
        "cell",
    )
    cb = pq_codebooks(vectors, m, ks, id_col, vec_col)
    codes = pq_encode(vectors, cb, m, id_col, vec_col)
    # Per-query ADC lookup table (Jégou et al. §IV-A): each query dots
    # its m subvectors against the m*ks codebook entries ONCE — the
    # candidate scan then never touches an array, it joins int codes
    # to precomputed scalars. This is what keeps the big join narrow:
    # cand rows are (query_id, neighbor_id, qdot) and codes rows are
    # (vec_id, sub_id, code) — pure ints/scalars; the only frame that
    # carries subvectors is the broadcast m*ks codebook.
    qsubs = v.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(_sub_slices(F.col("emb"), m)),
    ).select(
        "query_id",
        F.col("pos").cast("int").alias("sub_id"),
        F.col("col").alias("qsvec"),
    )
    qlut = qsubs.join(F.broadcast(cb), "sub_id").select(
        "query_id",
        "sub_id",
        "code",
        dot(F.col("qsvec"), F.col("cvec")).alias("qc"),
        dot(F.col("cvec"), F.col("cvec")).alias("cc"),
    )
    cand = probe.join(
        home.select(F.col("vec_id").alias("neighbor_id"), "cell"), "cell"
    ).filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", "qdot"
    )
    per_sub = cand.join(
        codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    ).join(qlut, ["query_id", "sub_id", "code"]).select(
        "query_id",
        "neighbor_id",
        "sub_id",
        "qdot",
        "qc",
        "cc",
    )
    adc = per_sub.groupBy("query_id", "neighbor_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("sub_id", F.col("qc")))),
            F.lit(0.0),
            lambda acc, x: acc + x["qc"],
        ).alias("adp"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("sub_id", F.col("cc")))),
            F.lit(0.0),
            lambda acc, x: acc + x["cc"],
        ).alias("rdot"),
        F.min("qdot").alias("qdot"),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.try_divide(
                F.col("adp"), F.sqrt(F.col("qdot")) * F.sqrt(F.col("rdot"))
            ),
            ROUND,
        ).alias("approx_cosine"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        adc.withColumn("rr", F.row_number().over(wr))
        .filter(F.col("rr") <= rerank)
        .select("query_id", "neighbor_id", "approx_cosine")
    )
    exact = (
        shortlist.join(
            v.select(F.col("vec_id").alias("query_id"),
                     F.col("emb").alias("qemb")),
            "query_id",
        )
        .join(
            v.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("emb").alias("nemb")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "approx_cosine",
            F.round(cosine(F.col("qemb"), F.col("nemb")), ROUND).alias(
                "cosine"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_cosine", "cosine", "rank")
    )


def cosine_neardup_lsh(
    vectors: DataFrame,
    threshold: float = NEARDUP_COSINE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate-restricted embedding near-dup: pairs searched ONLY
    inside the sign-LSH bucket (equi-join on the bucket id), then the
    exact cosine + threshold — the 10^9-vector shape of
    ``cosine_neardup_pairs``. Bucket-join cost is Σ_bucket |bucket|²
    instead of N²; more hyperplanes (or an IVF assignment in place of
    ``lsh_bucket``) shrink the buckets further, the standard
    recall-for-cost trade (near-dup vectors have highly correlated
    signs, so recall at high thresholds stays near 1)."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"), "bucket")
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            "bucket",
            F.round(cosine(F.col("ea"), F.col("eb")), ROUND).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(
    vectors: DataFrame,
    n_centroids: int = 16,
    threshold: float = NEARDUP_COSINE,
    centroids="ids",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int = 4096,
    debug_buckets: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540):
    semantic deduplication over an embedding column. Every vector is
    assigned to its IVF cell (seeded k-means cells via
    ``centroids="kmeans"`` in production; the deterministic lowest-id
    cells are the oracle configuration — same join shape), items are
    ranked within the cell by cosine-to-centroid (DESC, vec_id ASC —
    dedup proceeds from the densest part of the cluster outward, the
    paper's ordering), and an item is DROPPED when its max cosine to
    any EARLIER-ranked cellmate is >= ``threshold`` (the upper-
    triangular rule of the paper's pseudo-code). Consequence pinned in
    tests: the kept set is pairwise < threshold inside every cell.

    Scale shape: the centroid table is tiny and broadcast, the N-row
    assignment scan is shuffle-free, and the pair join is per-cell
    (cost Σ|cell|², not N²) keyed by cell id — more centroids shrink
    the cells, the standard IVF trade. Cosines round to {ROUND}
    decimals before compare/argmax so cross-engine float summation
    order can't flip a keep decision.

    Giant-cell cap: one hot cell (a near-duplicate boilerplate
    cluster) would otherwise cost |cell|² with no bound, so cells
    above ``max_cell_size`` are sub-bucketed by sign-LSH of the
    embedding (near-identical vectors share sign bits, so true dup
    groups stay together), and any still-oversized sub-bucket (an
    identical-signature cluster) is finally split into rank blocks of
    ``max_cell_size`` — every compare group is HARD-bounded at
    max_cell_size², at the cost of not comparing across blocks of an
    identical-signature mega-cluster (bounded under-dedup: at most
    one extra keep per block). Cells at or under the cap — every cell
    in the oracle gate configuration — are byte-identical to the
    uncapped semantics.

    Returns (vec_id, cell, cell_rank, max_prior_cosine, keep) — the
    STABLE public schema; ``max_prior_cosine`` is NULL for each
    group's rank-1 item (always kept). Filter ``keep`` and join back
    on vec_id to realize the deduplicated corpus. ``cell_rank`` is the
    rank within the compare group — the whole cell normally, a
    (cell, sub-bucket, block) group when the giant-cell cap triggered.
    ``debug_buckets=True`` additionally exposes the internal ``lsub``/
    ``blk`` bookkeeping so tests can assert the compare-group bound.
    """
    cells = ivf_cells(
        vectors, n_centroids, id_col, vec_col,
        centroids=centroids, with_ccos=True,
    ).select("vec_id", "emb", "cell", "ccos")
    # giant-cell cap: nsub > 1 only for cells above max_cell_size; the
    # per-cell size table is n_centroids rows, broadcast
    sizes = cells.groupBy("cell").agg(
        F.ceil(F.count("*") / F.lit(int(max_cell_size)))
        .cast("long")
        .alias("nsub")
    )
    cells = cells.join(F.broadcast(sizes), "cell").withColumn(
        "lsub",
        F.when(
            F.col("nsub") > 1, F.pmod(lsh_bucket(F.col("emb")), F.col("nsub"))
        ).otherwise(F.lit(0)).cast("long"),
    )
    w = Window.partitionBy("cell", "lsub").orderBy(
        F.col("ccos").desc(), F.col("vec_id").asc()
    )
    # The prior-rank self-join would re-run the N x n_centroids
    # assignment scan once per side (HOF cosines evaluate interpreted),
    # so the assignment is cached — but WITHOUT the embedding column:
    # columnar-caching array<float> costs more than it saves, while the
    # (vec_id, cell, cell_rank) triple is tiny. Each join side re-reads
    # its embeddings from the source scan by vec_id instead.
    # block = rank-range residual split: an identical-sign-signature
    # sub-bucket can defeat the LSH split, so compare groups are
    # hard-capped at max_cell_size rows regardless.
    ranked = _cached(
        cells.withColumn("cell_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "blk", ((F.col("cell_rank") - 1) / F.lit(int(max_cell_size)))
            .cast("long"),
        )
        .select("vec_id", "cell", "lsub", "blk", "cell_rank")
    )
    embs = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        as_double(F.col(vec_col)).alias("emb"),
    )
    group = ["cell", "lsub", "blk"]
    cur = ranked.join(embs, "vec_id")
    prior = ranked.join(embs, "vec_id").select(
        F.col("emb").alias("pemb"), *group, F.col("cell_rank").alias("prn")
    )
    max_prior = (
        cur.join(prior, group)
        .filter(F.col("prn") < F.col("cell_rank"))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.round(cosine(F.col("emb"), F.col("pemb")), ROUND)
            ).alias("max_prior_cosine")
        )
    )
    debug_cols = ["lsub", "blk"] if debug_buckets else []
    return (
        ranked.join(max_prior, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            *debug_cols,
            "cell_rank",
            "max_prior_cosine",
            (
                F.col("max_prior_cosine").isNull()
                | (F.col("max_prior_cosine") < F.lit(threshold))
            ).alias("keep"),
        )
    )


def semdedup_keep(*args, **kwargs) -> DataFrame:
    """Gate/back-compat alias for :func:`semdedup`'s public projection
    (semdedup itself now returns the stable schema by default)."""
    kwargs.pop("debug_buckets", None)
    return semdedup(*args, **kwargs)


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracles
# ---------------------------------------------------------------------------

_QUERY_IDS = [0, 1, 2, 3, 4]


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


register(
    "ann_cosine_topk",
    lambda spark, sf_dir: cosine_topk(_emb(spark, sf_dir), _QUERY_IDS, k=5),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.emb, v.emb), {ROUND}) AS cosine
  FROM v q JOIN v ON v.vec_id != q.vec_id
  WHERE q.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT)
    AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
""",
)

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN emb[{d}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i, d in enumerate(LSH_DIMS)
)

register(
    "ann_lsh_bucket_top1",
    lambda spark, sf_dir: lsh_bucket_top1(_emb(spark, sf_dir)),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS query_id, a.bucket, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, bucket, neighbor_id, cosine FROM ranked WHERE rn = 1
""",
)

register(
    "ann_ivf_top1",
    lambda spark, sf_dir: ann_ivf_top1(_emb(spark, sf_dir)),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
c AS (SELECT vec_id AS cent_id, emb AS cemb FROM v WHERE vec_id < 16),
ass AS (
  SELECT v.vec_id, v.emb, c.cent_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), {ROUND})
             DESC, c.cent_id ASC) AS rn
  FROM v CROSS JOIN c
),
cells AS (SELECT vec_id, emb, cent_id AS cell FROM ass WHERE rn = 1),
scored AS (
  SELECT a.vec_id AS query_id, a.cell, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cosine
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, cell, neighbor_id, cosine FROM ranked WHERE rn = 1
""",
)

register(
    "ann_ivf_probe2",
    lambda spark, sf_dir: ann_ivf_topk(_emb(spark, sf_dir), k=1, n_probe=2),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
c AS (SELECT vec_id AS cent_id, emb AS cemb FROM v WHERE vec_id < 16),
ass AS (
  SELECT v.vec_id, v.emb, c.cent_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), {ROUND})
             DESC, c.cent_id ASC) AS rn
  FROM v CROSS JOIN c
),
home AS (SELECT vec_id, emb, cent_id AS cell FROM ass WHERE rn = 1),
probe AS (SELECT vec_id, emb, cent_id AS cell FROM ass WHERE rn <= 2),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cosine
  FROM probe a JOIN home b ON a.cell = b.cell AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT)
    AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 1
""",
)

register(
    "ann_ivf_pq",
    lambda spark, sf_dir: ann_ivf_pq_topk(
        _emb(spark, sf_dir), k=1, n_probe=1, m=8, ks=16, rerank=4
    ),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
c AS (SELECT vec_id AS cent_id, emb AS cemb FROM v WHERE vec_id < 16),
ass AS (
  SELECT v.vec_id, v.emb, c.cent_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), {ROUND})
             DESC, c.cent_id ASC) AS rn
  FROM v CROSS JOIN c
),
home AS (SELECT vec_id, emb, cent_id AS cell FROM ass WHERE rn = 1),
js AS (SELECT unnest(range(0, 8)) AS sub_id),
cb AS (
  SELECT js.sub_id, v.vec_id AS code,
         v.emb[(js.sub_id * (len(v.emb) // 8) + 1)
               :((js.sub_id + 1) * (len(v.emb) // 8))] AS cvec
  FROM v CROSS JOIN js WHERE v.vec_id < 16
),
subs AS (
  SELECT v.vec_id, js.sub_id,
         v.emb[(js.sub_id * (len(v.emb) // 8) + 1)
               :((js.sub_id + 1) * (len(v.emb) // 8))] AS svec
  FROM v CROSS JOIN js
),
encd AS (
  SELECT s.vec_id, s.sub_id, cb.code, cb.cvec,
         round(list_inner_product(s.svec, s.svec)
               - 2.0 * list_inner_product(s.svec, cb.cvec)
               + list_inner_product(cb.cvec, cb.cvec), {ROUND}) AS d2
  FROM subs s JOIN cb USING (sub_id)
),
encr AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, sub_id ORDER BY d2 ASC, code ASC) AS rn
  FROM encd
),
codes AS (SELECT vec_id, sub_id, code, cvec FROM encr WHERE rn = 1),
cand AS (
  SELECT a.vec_id AS query_id, a.emb AS qemb,
         list_inner_product(a.emb, a.emb) AS qdot,
         b.vec_id AS neighbor_id
  FROM home a JOIN home b ON a.cell = b.cell AND a.vec_id != b.vec_id
),
per_sub AS (
  SELECT cand.query_id, cand.neighbor_id, cd.sub_id, cand.qdot,
         list_inner_product(
           cand.qemb[(cd.sub_id * (len(cand.qemb) // 8) + 1)
                     :((cd.sub_id + 1) * (len(cand.qemb) // 8))],
           cd.cvec) AS qc,
         list_inner_product(cd.cvec, cd.cvec) AS cc
  FROM cand JOIN codes cd ON cd.vec_id = cand.neighbor_id
),
adc AS (
  SELECT query_id, neighbor_id,
         round(CAST(list_sum(list(qc ORDER BY sub_id)) AS DOUBLE)
               / (sqrt(min(qdot))
                  * sqrt(CAST(list_sum(list(cc ORDER BY sub_id)) AS DOUBLE))),
               {ROUND}) AS approx_cosine
  FROM per_sub GROUP BY query_id, neighbor_id
),
shortlist AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id ASC) AS rr
  FROM adc
),
exact AS (
  SELECT s.query_id, s.neighbor_id, s.approx_cosine,
         round(list_cosine_similarity(q.emb, n.emb), {ROUND}) AS cosine
  FROM shortlist s JOIN v q ON q.vec_id = s.query_id
                   JOIN v n ON n.vec_id = s.neighbor_id
  WHERE s.rr <= 4
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT)
    AS rank
  FROM exact
)
SELECT query_id, neighbor_id, approx_cosine, cosine, rank
FROM ranked WHERE rank <= 1
""",
)

register(
    "embedding_neardup_lsh",
    lambda spark, sf_dir: cosine_neardup_lsh(_emb(spark, sf_dir)),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
       round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cosine
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.emb, b.emb), {ROUND}) >= {NEARDUP_COSINE}
""",
)

register(
    "semdedup_keep",
    lambda spark, sf_dir: semdedup_keep(_emb(spark, sf_dir)),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
c AS (SELECT vec_id AS cent_id, emb AS cemb FROM v WHERE vec_id < 16),
ass AS (
  SELECT v.vec_id, v.emb, c.cent_id,
         round(list_cosine_similarity(v.emb, c.cemb), {ROUND}) AS ccos,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), {ROUND})
             DESC, c.cent_id ASC) AS arn
  FROM v CROSS JOIN c
),
cells AS (SELECT vec_id, emb, cent_id AS cell, ccos FROM ass WHERE arn = 1),
ranked AS (
  SELECT vec_id, emb, cell, ccos,
         CAST(row_number() OVER (
           PARTITION BY cell ORDER BY ccos DESC, vec_id ASC) AS BIGINT)
           AS cell_rank
  FROM cells
),
mp AS (
  SELECT a.vec_id,
         max(round(list_cosine_similarity(a.emb, b.emb), {ROUND}))
           AS max_prior_cosine
  FROM ranked a JOIN ranked b
    ON a.cell = b.cell AND b.cell_rank < a.cell_rank
  GROUP BY a.vec_id
)
SELECT r.vec_id, r.cell, r.cell_rank, mp.max_prior_cosine,
       (mp.max_prior_cosine IS NULL
        OR mp.max_prior_cosine < {NEARDUP_COSINE}) AS keep
FROM ranked r LEFT JOIN mp ON r.vec_id = mp.vec_id
""",
)

register(
    "embedding_neardup",
    lambda spark, sf_dir: cosine_neardup_pairs(_emb(spark, sf_dir)),
    f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), {ROUND}) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.emb, b.emb), {ROUND}) >= {NEARDUP_COSINE}
""",
)
