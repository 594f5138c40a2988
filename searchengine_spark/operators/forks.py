"""Repo-level near-duplicate detection (fork collapse) over the
north-star code table.

Source-code corpora are dominated by forks: The Stack (Kocetkov et
al. 2022, §3) and StarCoder both collapse near-duplicate REPOSITORIES
before file-level dedup, because a popular repo's forks multiply every
one of its files. The repo-similarity measure is set Jaccard over each
repo's set of file content hashes — two repos sharing most blobs are
fork twins regardless of paths or commit labels.

Scale shape (the 10^12-file posture):

* Signatures are k MinHash folds computed as ``groupBy(repo).agg(min
  ...)`` over (repo, sha) rows — min is associative, so partial (map
  side) aggregation bounds every task's state at k longs per repo seen
  locally; a monorepo with 10^7 files never materializes a 10^7-element
  array anywhere (contrast the per-doc array fold in dedup.py, where a
  document's shingle set fits a row).
* Candidate generation is the standard LSH band equi-join on
  (band, band_key) — only ``bands`` rows per repo leave the map side,
  and only same-bucket repos are ever paired.
* Verification is exact set Jaccard restricted to candidate pairs:
  two equi-joins (pair -> repo_a's shas -> matching repo_b shas), never
  an all-pairs comparison. A blob vendored into millions of repos
  (the same LICENSE file) does NOT explode this join — it is keyed by
  (pair, sha), not by sha alone.

MinHash family, 60-bit base hash, and band-key construction reuse
dedup.py's portable definitions, so the DuckDB oracle replicates the
banding bit-for-bit (a band miss — possible at any k — is identical on
both engines).

Reference scope note: the reference engine (PieTempesti98/searchEngine)
has no repo-level operators; this is part of the beyond-reference
training-data pipeline surface, specialized to the code payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cacheutil import make_cache_registry
from .dedup import MINHASH_PRIME, _affine_params, connected_components
from .entry_ops import register
from .textstats import portable_hash, portable_hash_sql

_cached, release_caches = make_cache_registry()

REPO_JACCARD_THRESHOLD = 0.7
# r = k/bands = 2 rows per band: catch probability 1-(1-J^2)^8 is
# ~0.996 at J = 0.7 (vs ~0.56 for the doc-level k=16/bands=4 scheme,
# which targets J >= 0.8) — fork detection wants recall at a lower
# similarity bar
FORK_MINHASH_K = 16
FORK_MINHASH_BANDS = 8
_ROUND = 9


def repo_file_shas(code_table: DataFrame) -> DataFrame:
    """Distinct (repo, sha) blob set per repo. sha256 of the content
    string — the same per-row lineage hash the rest of the pipeline
    carries (input_hint invariant), so a pre-hashed corpus can skip
    straight to the set representation. NULL-repo rows belong to no
    repository and are excluded (they must not pool into one
    pseudo-repo); NULL-content rows carry no blob."""
    return (
        code_table.select(
            "repo", F.sha2(F.col("content").cast("string"), 256).alias("sha")
        )
        .filter(F.col("sha").isNotNull() & F.col("repo").isNotNull())
        .distinct()
    )


def _repo_signatures(shas: DataFrame, k: int) -> DataFrame:
    """(repo, mh0..mh{k-1}) via k associative min-aggregates — one
    map-side-combinable shuffle keyed by repo; no per-repo arrays."""
    bh = (portable_hash(F.col("sha")) % F.lit(MINHASH_PRIME)).alias("_bh")
    d = shas.select("repo", bh)
    aggs = [
        F.min(
            (F.col("_bh") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(_affine_params(k))
    ]
    return d.groupBy("repo").agg(*aggs)


def _band_rows(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(repo, band, band_key): md5 over the band's comma-joined
    minhashes — same key string as the oracle's ``string_agg(CAST(
    minhash AS VARCHAR), ',' ORDER BY hash_idx)``."""
    r = k // bands
    arr = F.array(*[F.col(f"mh{i}") for i in range(k)])
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(arr, j * r + 1, r),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_key"),
            )
            for j in range(bands)
        ]
    )
    return sig.select(
        "repo", F.explode(pairs).alias("bk")
    ).select("repo", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def exact_repo_groups(shas: DataFrame) -> DataFrame:
    """(repo, rep_repo): hash-exact identical-blob-set groups, rep =
    min repo name. Four order-independent commutative sums over
    INDEPENDENTLY salted blob hashes plus the set size key the group —
    associative, so one map-side-combinable aggregate per repo, no
    sorted-set materialization. Each sum hashes ``salt_i || sha``
    through its own md5, NOT an affine transform of one shared hash:
    affine images of a single 31-bit hash collide TOGETHER whenever
    two blobs' base hashes collide (guaranteed by pigeonhole at 10^12
    blobs), so independence must come from the hash input. Hash-exact
    in the same sense as the sha256 exact-dedup operators: a false
    merge needs two EQUAL-SIZE repos whose four independent
    ~2^31-range sums all collide (>=120 bits of key), negligible even
    against the ~2^60 equal-size repo pairs of a 10^9-repo corpus."""
    sig = shas.groupBy("repo").agg(
        F.count("*").alias("_n"),
        *[
            F.sum(
                portable_hash(F.concat(F.lit(f"setkey{i}|"), F.col("sha")))
                % F.lit(MINHASH_PRIME)
            ).alias(f"_s{i}")
            for i in range(4)
        ],
    )
    key = ["_n", "_s0", "_s1", "_s2", "_s3"]
    reps = sig.groupBy(*key).agg(F.min("repo").alias("rep_repo"))
    # agg-min + equi-join back, NOT collect_list: a family of 10^6
    # identical forks must never become one array row
    return sig.join(reps, key).select("repo", "rep_repo")


def fork_pairs(
    code_table: DataFrame,
    threshold: float = REPO_JACCARD_THRESHOLD,
    k: int = FORK_MINHASH_K,
    bands: int = FORK_MINHASH_BANDS,
) -> DataFrame:
    """(repo_a, repo_b, jaccard) for LSH-caught repo pairs whose EXACT
    blob-set Jaccard >= threshold, repo_a < repo_b.

    NB: within a family of IDENTICAL forks the pair list is inherently
    quadratic (every pair really is a fork pair at J=1); consumers that
    only need the grouping should use ``fork_clusters``, which
    collapses identical repos BEFORE the band join and unites them with
    linear star edges instead."""
    if k % bands:
        raise ValueError(f"bands must divide k (got k={k}, bands={bands})")
    shas = _cached(repo_file_shas(code_table))
    return _pairs_from_shas(shas, threshold, k, bands)


def _pairs_from_shas(
    shas: DataFrame, threshold: float, k: int, bands: int
) -> DataFrame:
    band = _band_rows(_repo_signatures(shas, k), k, bands)
    a, b = band.alias("a"), band.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.repo") < F.col("b.repo")),
        )
        .select(
            F.col("a.repo").alias("repo_a"), F.col("b.repo").alias("repo_b")
        )
        .distinct()
    )
    sizes = shas.groupBy("repo").agg(F.count("*").alias("n"))
    fa, fb = shas.alias("fa"), shas.alias("fb")
    inter = (
        cands.join(fa, F.col("fa.repo") == F.col("repo_a"))
        .join(
            fb,
            (F.col("fb.repo") == F.col("repo_b"))
            & (F.col("fb.sha") == F.col("fa.sha")),
        )
        .groupBy("repo_a", "repo_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("repo").alias("repo_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("repo").alias("repo_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "repo_a")
        .join(sb, "repo_b")
        .select(
            "repo_a",
            "repo_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                _ROUND,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def fork_clusters(
    code_table: DataFrame,
    threshold: float = REPO_JACCARD_THRESHOLD,
    k: int = FORK_MINHASH_K,
    bands: int = FORK_MINHASH_BANDS,
) -> DataFrame:
    """(repo, canonical_repo): every non-NULL repo labeled with the
    lexicographically smallest repo of its fork cluster (singletons
    map to themselves; NULL repos belong to no repository and get no
    label — ``collapse_forks`` passes their rows through). Transitivity via the gate-verified
    ``connected_components`` loop over dense repo ids — dense ids are
    assigned in repo order, so the min-label cluster representative IS
    the min repo name. (assign_dense_ids' internal persist lives in
    the indexer's _PERSIST_HANDLES registry; this module's
    ``release_caches`` frees only the frames cached here.)"""
    from .indexer import assign_dense_ids

    if k % bands:
        raise ValueError(f"bands must divide k (got k={k}, bands={bands})")
    shas = _cached(repo_file_shas(code_table))
    groups = _cached(exact_repo_groups(shas))
    # identical-fork families are collapsed BEFORE the band join: a
    # popular repo's 10^6 unmodified forks would otherwise share one
    # band bucket and the candidate self-join would go quadratic in
    # the family size. The family is united by m-1 star edges instead,
    # and only its representative enters LSH — label-identical to the
    # all-pairs graph, because an identical twin shares every
    # above-threshold neighbor of its representative.
    star = groups.filter(F.col("repo") != F.col("rep_repo")).select(
        F.col("rep_repo").alias("repo_a"), F.col("repo").alias("repo_b")
    )
    rep_shas = _cached(
        shas.join(
            groups.filter(F.col("repo") == F.col("rep_repo")).select("repo"),
            "repo",
            "left_semi",
        )
    )
    pairs = _pairs_from_shas(rep_shas, threshold, k, bands).select(
        "repo_a", "repo_b"
    ).unionByName(star)
    repos = code_table.select("repo").filter(
        F.col("repo").isNotNull()
    ).distinct()
    rids = _cached(assign_dense_ids(repos, ["repo"], id_col="doc_id"))
    e = (
        pairs.join(
            rids.select(
                F.col("repo").alias("repo_a"), F.col("doc_id").alias("doc_a")
            ),
            "repo_a",
        )
        .join(
            rids.select(
                F.col("repo").alias("repo_b"), F.col("doc_id").alias("doc_b")
            ),
            "repo_b",
        )
        .select("doc_a", "doc_b")
    )
    cc = connected_components(rids.select("doc_id"), e)
    canon = rids.select(
        F.col("doc_id").alias("cluster_id"),
        F.col("repo").alias("canonical_repo"),
    )
    return (
        cc.join(rids, "doc_id")
        .join(canon, "cluster_id")
        .select("repo", "canonical_repo")
    )


def collapse_forks(
    code_table: DataFrame,
    threshold: float = REPO_JACCARD_THRESHOLD,
    k: int = FORK_MINHASH_K,
    bands: int = FORK_MINHASH_BANDS,
) -> DataFrame:
    """The code table with non-canonical fork repos dropped — the
    repo-level dedup pass The Stack runs before file-level dedup. A
    broadcast-sized label frame is NOT assumed: the filter is an
    equi-join on repo. Rows with a NULL repo belong to no repository
    and pass through untouched (an equi-semi-join would silently drop
    them)."""
    labels = fork_clusters(code_table, threshold, k, bands)
    keep = labels.filter(F.col("repo") == F.col("canonical_repo")).select(
        "repo"
    )
    return code_table.filter(F.col("repo").isNull()).unionByName(
        code_table.filter(F.col("repo").isNotNull()).join(
            keep, "repo", "left_semi"
        )
    )


# ---------------------------------------------------------------------------
# Driver gate: synthesized code table + planted fork, oracle replicates
# the banding bit-for-bit (same affine family / base hash / band keys)
# ---------------------------------------------------------------------------


def _forked_code_table(spark, sf_dir: str) -> DataFrame:
    """Synth code table (engine_extra._synth_code_table shape) plus a
    planted fork of repo0 keeping ~9/10 of its files (Jaccard ~0.9,
    above threshold) and a half-copy of repo1 (Jaccard ~1/2, below)."""
    from .engine_extra import _synth_code_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = _synth_code_table(docs)
    fork0 = _synth_code_table(
        docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 10 != 3))
    ).withColumn("repo", F.lit("repo0fork"))
    half1 = _synth_code_table(
        docs.filter((F.col("doc_id") % 7 == 1) & (F.col("doc_id") % 2 == 0))
    ).withColumn("repo", F.lit("repo1half"))
    return base.unionByName(fork0).unionByName(half1)


def _fork_ctes_sql() -> str:
    """DuckDB twin of ``fork_pairs`` on the forked synth table; mirrors
    dedup.minhash_ctes_sql with (repo, sha) as the item rows."""
    r = FORK_MINHASH_K // FORK_MINHASH_BANDS
    values = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(_affine_params(FORK_MINHASH_K))
    )
    return f"""
code0 AS (
  SELECT 'repo' || CAST(doc_id % 7 AS VARCHAR) AS repo, text
  FROM documents
),
forked AS (
  SELECT repo, text FROM code0
  UNION ALL
  SELECT 'repo0fork', text FROM documents
  WHERE doc_id % 7 = 0 AND doc_id % 10 != 3
  UNION ALL
  SELECT 'repo1half', text FROM documents
  WHERE doc_id % 7 = 1 AND doc_id % 2 = 0
),
rsha AS (SELECT DISTINCT repo, sha256(text) AS sha FROM forked
         WHERE text IS NOT NULL),
hp(hash_idx, a, b) AS (VALUES {values}),
hs AS (
  SELECT rsha.repo, hp.hash_idx,
         min((hp.a * ({portable_hash_sql("rsha.sha")} % {MINHASH_PRIME})
              + hp.b) % {MINHASH_PRIME}) AS minhash
  FROM rsha CROSS JOIN hp
  GROUP BY rsha.repo, hp.hash_idx
),
bandsig AS (
  SELECT repo, hash_idx // {r} AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_key
  FROM hs GROUP BY repo, hash_idx // {r}
),
cands AS (
  SELECT DISTINCT a.repo AS repo_a, b.repo AS repo_b
  FROM bandsig a
  JOIN bandsig b ON a.band = b.band AND a.band_key = b.band_key
                AND a.repo < b.repo
),
sz AS (SELECT repo, count(*) AS n FROM rsha GROUP BY repo),
inter AS (
  SELECT c.repo_a, c.repo_b, count(*) AS i
  FROM cands c
  JOIN rsha fa ON fa.repo = c.repo_a
  JOIN rsha fb ON fb.repo = c.repo_b AND fb.sha = fa.sha
  GROUP BY 1, 2
)
"""


def _q_repo_fork_pairs(spark, sf_dir: str) -> DataFrame:
    """Fork detection end-to-end on the planted-fork synth table.

    The synth commit/path/lang columns differ per (repo, doc) but the
    blob sha is over CONTENT only, so the planted fork is caught
    despite its distinct paths — exactly the fork-twin semantics."""
    return fork_pairs(_forked_code_table(spark, sf_dir))


register(
    "repo_fork_pairs",
    _q_repo_fork_pairs,
    f"""
WITH {_fork_ctes_sql()}
SELECT repo_a, repo_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), {_ROUND}) AS jaccard
FROM inter
JOIN sz sa ON sa.repo = repo_a
JOIN sz sb ON sb.repo = repo_b
WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), {_ROUND})
      >= {REPO_JACCARD_THRESHOLD}
""",
)
