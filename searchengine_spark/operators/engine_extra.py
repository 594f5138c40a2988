"""Additional oracle-gated engine queries: compressed-block framing,
block-skip (nextGEQ) pruning stats, and streaming compaction.

These extend the driver gate beyond the core build/query surface:

* ``packed_block_sizes`` — proves the gap-VB / unary codec FRAMING at
  the SQL level: the byte length of each packed block is re-derived in
  DuckDB from first principles (gap width classes for VB, tf bit-sum
  for unary) and compared against the real packed binary columns.
* ``block_skip_stats`` — the skip-pointer effectiveness measure behind
  nextGEQ (PostingList.java:185-215): for a docid lower bound, how
  many blocks per term survive the ``max_docid >= bound`` filter.
* ``streaming_doc_stats`` — runs the REAL Structured Streaming ingest
  (availableNow trigger) + compaction inside the gate and checks the
  compacted doc stats against the same SQL oracle as the batch build —
  streaming and batch must agree exactly.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_ops import register

SKIP_BOUND = 300  # docid lower bound for the block-skip stats


def _frames(spark, sf_dir, with_blocks=False):
    import __spark_entry__ as entry

    return entry._frames(spark, sf_dir, with_blocks=with_blocks)


def _q_packed_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .indexer import _PACK_SCHEMA, _pack_group

    idx = _frames(spark, sf_dir)
    packed = (
        idx.postings.withColumn("block_id", F.lit(0).cast("long"))
        .groupBy("term", "block_id")
        .applyInPandas(_pack_group, schema=_PACK_SCHEMA)
    )
    return packed.select(
        "term",
        F.col("num_postings").cast("long").alias("num_postings"),
        F.octet_length("docids_vb").cast("long").alias("n_vb_bytes"),
        F.octet_length("tfs_unary").cast("long").alias("n_unary_bytes"),
    )


_PACKED_SIZES_SQL_TEMPLATE = """
WITH {base},
g AS (
  SELECT term, docid, tf,
         docid - coalesce(lag(docid) OVER (PARTITION BY term ORDER BY docid), 0)
           AS gap
  FROM p
)
SELECT term,
       CAST(count(*) AS BIGINT) AS num_postings,
       CAST(sum(CASE WHEN gap < 128 THEN 1
                     WHEN gap < 16384 THEN 2
                     WHEN gap < 2097152 THEN 3
                     ELSE 4 END) AS BIGINT) AS n_vb_bytes,
       CAST((sum(tf) + 7) // 8 AS BIGINT) AS n_unary_bytes
FROM g GROUP BY term
"""


def _q_block_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _frames(spark, sf_dir, with_blocks=True)
    blocks = idx.blocks
    return blocks.groupBy("term").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("max_docid") >= SKIP_BOUND, 1).otherwise(0))
        .cast("long")
        .alias("n_blocks_geq"),
    )


def _q_streaming_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest + compaction must reproduce the batch doc
    stats exactly (same dense docids, lengths, lineage hashes)."""
    import __spark_entry__ as entry

    from ..streaming.incremental import compact, start_ingest

    with tempfile.TemporaryDirectory(prefix="se_stream_") as tmp:
        docs = entry._docs(spark, sf_dir)
        docs.write.mode("overwrite").parquet(f"{tmp}/src")
        q = start_ingest(spark, f"{tmp}/src", f"{tmp}/idx", stem_stop=False)
        q.awaitTermination(300)
        idx = compact(spark, f"{tmp}/idx")
        # materialize before the tempdir vanishes
        rows = idx.doc_stats.select(
            "docid", "pid", "doc_len", "content_sha256"
        ).collect()
    return spark.createDataFrame(
        rows, "docid long, pid string, doc_len long, content_sha256 string"
    )


def _q_streaming_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming watermarked window aggregation over
    the events table (availableNow backlog); must equal the batch/SQL
    aggregation exactly."""
    import shutil

    from ..streaming.incremental import windowed_event_stats

    # the file stream source needs a directory; stage the table into one
    with tempfile.TemporaryDirectory(prefix="se_events_") as tmp:
        shutil.copy(f"{sf_dir}/events.parquet", f"{tmp}/events.parquet")
        df = windowed_event_stats(spark, tmp)
        rows = df.collect()  # materialize from the memory sink
    return spark.createDataFrame(
        rows,
        "window_start timestamp, event_type string, "
        "n_events long, sum_value double",
    )


def _q_streaming_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked dedup over a twice-delivered backlog must
    equal the distinct event table exactly."""
    import shutil

    from ..streaming.incremental import dedup_event_stream

    with tempfile.TemporaryDirectory(prefix="se_evdup_") as tmp:
        shutil.copy(f"{sf_dir}/events.parquet", f"{tmp}/events.parquet")
        rows = dedup_event_stream(spark, tmp).collect()
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _q_lexicon_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase lexicon aggregation (skew path) — must equal
    the plain aggregation exactly, so it shares lexicon_stats' oracle."""
    from .indexer import compute_lexicon_salted

    idx = _frames(spark, sf_dir)
    s = idx.stats
    lex = compute_lexicon_salted(
        idx.postings, s["n_docs"], s["avg_doc_len"], salt_buckets=16
    )
    return lex.select(
        "term",
        "df",
        "max_tf",
        F.col("bm25_tf").cast("int").alias("bm25_tf"),
        F.col("bm25_dl").cast("long").alias("bm25_dl"),
        F.round("idf", 9).alias("idf"),
        F.round("tub_tfidf", 9).alias("tub_tfidf"),
        F.round("tub_bm25", 9).alias("tub_bm25"),
    )


def _q_trec_run_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All TREC queries evaluated in ONE job (query.batch_top_k) —
    hash-equal to the per-query ``trec_run`` gate/oracle. This is the
    shape that makes QueryPerformancesMain.java:100-126 (6,980 queries,
    k=100) tractable: one postings join, not one Spark job per query."""
    import __spark_entry__ as entry

    from .query import batch_top_k

    idx = _frames(spark, sf_dir)
    r = batch_top_k(
        idx, entry.TREC_QUERIES, k=10, scoring="bm25",
        round_decimals=entry.ROUND,
    )
    return r.select(
        "qid",
        F.lit("Q0").alias("q0"),
        "pid",
        "rank",
        "score",
        F.lit(entry.RUN_ID).alias("runid"),
    )


def _q_topk_blockmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max MaxScore (Ding & Suel BMM): non-essential probe
    bailout uses the candidate's CURRENT √df-block max score instead
    of the global term bound — strictly tighter pruning, identical
    ranks. Oracle = the exact disjunctive SQL, same as every pruning
    gate (pruning is a performance device, not a semantics change)."""
    import __spark_entry__ as entry

    from .maxscore import maxscore_topk

    idx = _frames(spark, sf_dir)
    return maxscore_topk(
        idx, "hash merge spark", k=10, conjunctive=False, scoring="bm25",
        round_decimals=entry.ROUND, block_max=True,
    )


def _q_topk_bmw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-Max WAND (Broder et al. CIKM 2003 + Ding & Suel SIGIR
    2011): pivot-driven skipping re-checked against per-block maxima —
    the second dynamic-pruning strategy beside MaxScore, same stored
    bounds, rank-identical results. Oracle = the exact disjunctive
    SQL, same as every pruning gate (pruning is a performance device,
    not a semantics change)."""
    import __spark_entry__ as entry

    from .maxscore import bmw_topk

    idx = _frames(spark, sf_dir)
    return bmw_topk(
        idx, "merge sort spark", k=10, scoring="bm25",
        round_decimals=entry.ROUND,
    )


# pipeline LSH banding: k=16, 8 bands x 2 rows -> P(candidate at
# J=0.8) = 1-(1-0.8^2)^8 ~ 0.9997 per pair; the oracle restricts to
# the SAME candidates (bit-identical banding in SQL), so the gate is
# deterministic regardless of recall
PIPELINE_MINHASH_K = 16
PIPELINE_MINHASH_BANDS = 8


def _q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation composition: quality-filter then drop
    near-duplicates (3-gram Jaccard >= 0.8, keep the lower doc_id) —
    the canonical pretraining-pipeline pruning pass.

    Near-dup detection runs through MinHash-LSH banding (the 100 TB
    shape: band-bucket equi-join + candidate-restricted verification),
    NOT the quadratic shingle self-join — the oracle reproduces the
    same banding in SQL, so both sides see identical candidates.
    (Long-lived sessions call ``dedup.release_caches()`` after
    materializing the result; the shingle cache registers there.)"""
    from .dedup import minhash_lsh_pairs
    from .textstats import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = quality_features(docs).filter(F.col("quality_score") >= 0.75)
    dup_losers = (
        minhash_lsh_pairs(
            docs, k=PIPELINE_MINHASH_K, bands=PIPELINE_MINHASH_BANDS
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.select("doc_id", "quality_score")
        .join(dup_losers, "doc_id", "left_anti")
    )


def curated_ctes_sql() -> str:
    """DuckDB CTE prefix reproducing the curated-corpus composition
    (shingles, MinHash banding, near-dup losers, quality scores) —
    shared by the curated-corpus gate and the curated-index capstone
    so the curation rules — including the final keep predicate —
    cannot drift between them. Ends with CTE ``keep``."""
    from .dedup import _SHINGLES_CTE, JACCARD_THRESHOLD, minhash_ctes_sql
    from .textstats import QUALITY_MARKERS, _markers_sql

    return f"""{_SHINGLES_CTE},
{minhash_ctes_sql(PIPELINE_MINHASH_K, PIPELINE_MINHASH_BANDS)},
losers AS (
  SELECT DISTINCT c.doc_b AS doc_id
  FROM cands c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
  WHERE j.jaccard >= {JACCARD_THRESHOLD}
),
f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> list_contains({_markers_sql(QUALITY_MARKERS)}, t)))
              AS DOUBLE) AS sw,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd
  FROM documents
),
q AS (
  SELECT doc_id,
         round(CAST(
           (CASE WHEN n >= 10 AND n <= 100000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_chars / n >= 3.0 AND n_chars / n <= 10.0 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN sw / n >= 0.01 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN nd / n >= 0.1 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2)
           AS quality_score
  FROM f
),
keep AS (
  SELECT doc_id FROM q
  WHERE quality_score >= 0.75
    AND doc_id NOT IN (SELECT doc_id FROM losers)
)"""


def _register() -> None:
    import __spark_entry__ as entry

    base = entry._BASE_CTES
    register(
        "packed_block_sizes",
        _q_packed_sizes,
        _PACKED_SIZES_SQL_TEMPLATE.format(base=base),
    )
    register(
        "block_skip_stats",
        _q_block_skip,
        f"""
WITH {base},
tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
law AS (
  SELECT term, df,
         CASE WHEN df >= 1024 THEN CAST(ceil(sqrt(CAST(df AS DOUBLE))) AS BIGINT)
              ELSE 1 END AS num_blocks
  FROM tdf
),
law2 AS (
  SELECT term, num_blocks,
         CAST(ceil(CAST(df AS DOUBLE) / num_blocks) AS BIGINT) AS max_per_block
  FROM law
),
ranked AS (
  SELECT p.term,
         CAST(row_number() OVER (PARTITION BY p.term ORDER BY p.docid) - 1
              AS BIGINT) AS rnk,
         p.docid, l.max_per_block
  FROM p JOIN law2 l USING (term)
),
blk AS (
  SELECT term, CAST(rnk // max_per_block AS BIGINT) AS block_id,
         max(docid) AS max_docid
  FROM ranked GROUP BY 1, 2
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN max_docid >= {SKIP_BOUND} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocks_geq
FROM blk GROUP BY term
""",
    )
    register(
        "streaming_doc_stats",
        _q_streaming_doc_stats,
        f"WITH {base} SELECT docid, pid, doc_len, content_sha256 FROM ds",
    )
    register(
        "streaming_windowed_events",
        _q_streaming_windowed_events,
        """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
    )
    register(
        "streaming_event_dedup",
        _q_streaming_event_dedup,
        "SELECT CAST(event_id AS BIGINT) AS event_id, ts,"
        " CAST(user_id AS BIGINT) AS user_id, event_type, value, props"
        " FROM events",
    )
    register(
        "lexicon_salted",
        _q_lexicon_salted,
        entry.core_oracle_sql()["lexicon_stats"],
    )
    register("trec_run_batched", _q_trec_run_batched, entry._trec_sql())
    register(
        "topk_bm25_blockmax",
        _q_topk_blockmax,
        entry._topk_sql(["hash", "merge", "spark"], "bm25", False, 10),
    )
    register(
        "topk_bm25_bmw",
        _q_topk_bmw,
        entry._topk_sql(["merge", "sort", "spark"], "bm25", False, 10),
    )
    register(
        "pipeline_curated_corpus",
        _q_curated_corpus,
        f"""
WITH {curated_ctes_sql()}
SELECT q.doc_id, q.quality_score
FROM q JOIN keep ON keep.doc_id = q.doc_id
""",
    )


_CODE_LANGS = ("py", "java", "go", "rust", "md")


def _synth_code_table(docs: DataFrame) -> DataFrame:
    """Deterministic Iceberg-shaped code table (repo, path, commit,
    lang, content) derived from the gate corpus — the north-rule
    input_hint's exact column set, synthesized at small scale so the
    adapter + engine path is oracle-checkable without external data."""
    return docs.select(
        F.concat(F.lit("repo"), (F.col("doc_id") % 7).cast("string")).alias(
            "repo"
        ),
        F.concat(
            F.lit("src/f"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias(
            "commit"
        ),
        F.element_at(
            F.array(*[F.lit(x) for x in _CODE_LANGS]),
            ((F.col("doc_id") % len(_CODE_LANGS)) + 1).cast("int"),
        ).alias("lang"),
        F.col("text").alias("content"),
    )


def _q_code_table_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule input shape end-to-end: synthesize the Iceberg
    code table (repo, path, commit, lang, content) deterministically
    from the gate corpus, adapt it with ``docs_from_code_table``
    (pid = repo/path@commit truncated to 64), and run the doc-stats
    pipeline — docids dense in pid order, per-row content sha256
    lineage intact (the input_hint's per-row invariant)."""
    from .frames import tokenized_docs
    from .indexer import docs_from_code_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    code = _synth_code_table(docs)
    dt = tokenized_docs(docs_from_code_table(code), stem_stop=False)
    return dt.select("docid", "pid", "doc_len", "content_sha256")


register(
    "code_table_doc_stats",
    _q_code_table_doc_stats,
    """
WITH d0c AS (
  SELECT substr('repo' || CAST(doc_id % 7 AS VARCHAR)
                || '/' || 'src/f' || CAST(doc_id AS VARCHAR) || '.txt'
                || '@' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                1, 64) AS pid,
         text AS content
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY pid) AS BIGINT) AS docid,
       pid,
       CAST(len(string_split(content, ' ')) AS BIGINT) AS doc_len,
       sha256(content) AS content_sha256
FROM d0c
WHERE len(string_split(content, ' ')) > 0
""",
)


# full BM25 query pipeline over the code-table shape: the same topk SQL
# as the core gates, with the corpus-adapter CTE swapped for the
# repo/path@commit pid derivation (base_ctes/_topk_sql are
# parameterized for exactly this reuse)
_CODE_D0 = """
d0 AS (
  SELECT substr('repo' || CAST(doc_id % 7 AS VARCHAR)
                || '/' || 'src/f' || CAST(doc_id AS VARCHAR) || '.txt'
                || '@' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                1, 64) AS pid,
         text AS content
  FROM documents
)"""

_CODE_D0_PY = """
d0 AS (
  SELECT substr('repo' || CAST(doc_id % 7 AS VARCHAR)
                || '/' || 'src/f' || CAST(doc_id AS VARCHAR) || '.txt'
                || '@' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                1, 64) AS pid,
         text AS content
  FROM documents
  WHERE doc_id % 5 = 0
)"""


def _code_idx(spark: SparkSession, sf_dir: str, lang: str | None = None):
    from .frames import build_index_frames
    from .indexer import docs_from_code_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    code = _synth_code_table(docs)
    if lang is not None:
        code = code.filter(F.col("lang") == lang)
    return build_index_frames(docs_from_code_table(code), stem_stop=False)


def _q_code_table_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k THROUGH the code-table adapter: proves the whole
    engine (analysis, dense ids, postings, lexicon, scorer, pid
    lookup) over the north-rule input shape, not just doc stats."""
    from .query import top_k

    return top_k(
        _code_idx(spark, sf_dir), "spark join fast", k=10,
        conjunctive=False, scoring="bm25", round_decimals=9,
    )


def _q_code_table_lang_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sub-corpus query: lang pruning BEFORE the build
    (the Iceberg-partition-column filter a per-language index build
    pushes to the scan); docids re-densify within the pruned corpus
    and idf/avgdl shift accordingly — checked exactly by the oracle."""
    from .query import top_k

    return top_k(
        _code_idx(spark, sf_dir, lang="py"), "spark join fast", k=10,
        conjunctive=False, scoring="bm25", round_decimals=9,
    )


def _register_code_topk() -> None:
    # __spark_entry__ is importable wherever gates run (driver, tools,
    # tests); imported at call time to keep module import light
    import __spark_entry__ as entry

    register(
        "code_table_topk",
        _q_code_table_topk,
        entry._topk_sql(
            ["spark", "join", "fast"], "bm25", False, 10,
            ctes=entry.base_ctes(_CODE_D0),
        ),
    )
    register(
        "code_table_lang_topk",
        _q_code_table_lang_topk,
        entry._topk_sql(
            ["spark", "join", "fast"], "bm25", False, 10,
            ctes=entry.base_ctes(_CODE_D0_PY),
        ),
    )


_register()
_register_code_topk()


# ---------------------------------------------------------------------------
# Capstone composition: curate -> index -> query in one lineage
# ---------------------------------------------------------------------------


def _q_curated_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining-pipeline shape: curate the corpus
    (quality filter + MinHash-LSH near-dup dedup — `_q_curated_corpus`
    verbatim), build the full index over ONLY the surviving documents
    (docids re-densify, idf/avgdl shift with the pruned corpus), and
    serve BM25 top-k. One lineage from raw table to ranked result —
    proves the curation and engine halves compose, not merely coexist.
    """
    from .frames import build_index_frames
    from .query import top_k

    kept = _q_curated_corpus(spark, sf_dir).select("doc_id")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .join(kept, "doc_id")
        .select(
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
            F.col("text").alias("content"),
        )
    )
    try:
        idx = build_index_frames(docs, stem_stop=False)
    except ValueError:
        # curation rejected every document: no corpus, no hits (the
        # oracle's empty d0 likewise aggregates to zero rows)
        return spark.createDataFrame(
            [], "docid long, pid string, score double"
        )
    return top_k(
        idx, "spark join fast", k=10, conjunctive=False, scoring="bm25",
        round_decimals=9,
    )


def _register_curated_topk() -> None:
    import __spark_entry__ as entry

    curated_d0 = (
        curated_ctes_sql()
        + """,
d0 AS (
  SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS pid, text AS content
  FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)
)"""
    )
    register(
        "curated_index_topk",
        _q_curated_index_topk,
        entry._topk_sql(
            ["spark", "join", "fast"], "bm25", False, 10,
            ctes=entry.base_ctes(curated_d0),
        ),
    )


_register_curated_topk()


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback expansion gate
# ---------------------------------------------------------------------------

_PRF_QUERY = ["spark", "join"]
_PRF_FB_DOCS = 5
_PRF_FB_TERMS = 2
_PRF_K = 10


def _q_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM-family query expansion end-to-end: first-pass BM25, ordered
    TF-IDF-mass expansion-term selection from the feedback docs,
    second-pass BM25 over (original + expansion) terms — every float
    fold ordered, so term selection AND final ranks are oracle-exact."""
    import __spark_entry__ as entry

    from .query import prf_top_k

    idx = _frames(spark, sf_dir)
    return prf_top_k(
        idx, " ".join(_PRF_QUERY), k=_PRF_K, fb_docs=_PRF_FB_DOCS,
        fb_terms=_PRF_FB_TERMS, scoring="bm25",
        round_decimals=entry.ROUND,
    )


def _register_prf() -> None:
    import __spark_entry__ as entry

    score = entry._score_sql("bm25")
    r = entry.ROUND
    orig_vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(_PRF_QUERY))
    not_in = ", ".join(f"'{t}'" for t in _PRF_QUERY)
    register(
        "prf_expanded_topk",
        _q_prf_topk,
        f"""
WITH {entry._BASE_CTES},
q1(term, tidx) AS (VALUES {orig_vals}),
s1 AS (
  SELECT p.docid, q1.tidx, {score} AS partial
  FROM p JOIN q1 ON p.term = q1.term JOIN lex l ON l.term = q1.term
),
a1 AS (
  SELECT docid,
         round(CAST(list_sum(list(partial ORDER BY tidx)) AS DOUBLE), {r})
           AS score
  FROM s1 GROUP BY docid
),
fb AS (SELECT docid FROM a1 ORDER BY score DESC, docid ASC
       LIMIT {_PRF_FB_DOCS}),
cand AS (
  SELECT p.term, p.docid,
         log10((SELECT nd FROM n) / CAST(l.df AS DOUBLE))
           * (1.0 + log10(CAST(p.tf AS DOUBLE))) AS w
  FROM p JOIN lex l ON l.term = p.term
  WHERE p.docid IN (SELECT docid FROM fb)
    AND p.term NOT IN ({not_in})
),
ws AS (
  SELECT term, round(CAST(list_sum(list(w ORDER BY docid)) AS DOUBLE), 9)
           AS fb_score
  FROM cand GROUP BY term
),
exp AS (
  SELECT term,
         CAST({len(_PRF_QUERY) - 1}
              + row_number() OVER (ORDER BY fb_score DESC, term ASC) AS INT)
           AS tidx
  FROM ws ORDER BY fb_score DESC, term ASC LIMIT {_PRF_FB_TERMS}
),
qx AS (SELECT term, tidx FROM q1 UNION ALL SELECT term, tidx FROM exp),
scored AS (
  SELECT p.docid, qx.tidx, {score} AS partial
  FROM p JOIN qx ON p.term = qx.term JOIN lex l ON l.term = qx.term
),
agg AS (
  SELECT docid,
         round(CAST(list_sum(list(partial ORDER BY tidx)) AS DOUBLE), {r})
           AS score
  FROM scored GROUP BY docid
)
SELECT a.docid, ds.pid, a.score
FROM agg a JOIN ds USING (docid)
ORDER BY a.score DESC, a.docid ASC
LIMIT {_PRF_K}
""",
    )


_register_prf()


# ---------------------------------------------------------------------------
# Fielded code search: content BM25 + filename-field boost
# ---------------------------------------------------------------------------

_FIELDED_TERMS = ["spark", "join", "fast"]


def _fielded_index_frames(spark: SparkSession, sf_dir: str):
    """Shared fielded-gate corpus: the synthetic code table with only
    the path overridden to embed each doc's first token (so filename
    boosts actually fire), indexed once per call — the ONE definition
    both fielded gates (and their oracle CTEs) pin against, so the
    path formula cannot drift between them."""
    from .frames import build_index_frames
    from .indexer import docs_from_code_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    code = _synth_code_table(docs).withColumn(
        "path",
        F.concat(
            F.lit("src/"),
            F.element_at(F.split(F.col("content"), " "), 1),
            F.lit(".py"),
        ),
    )
    return build_index_frames(docs_from_code_table(code), stem_stop=False)


_BM25F_WC = 1.0   # content field weight
_BM25F_WP = 2.0   # filename-path field weight
_BM25F_BC = 0.75  # per-field length-normalization b
_BM25F_BP = 0.75
_BM25F_K1 = 1.5


def _q_code_search_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code search over the north-rule table through the FULL Robertson
    BM25F model (query.bm25f_top_k) on two fields — content tokens and
    filename-path tokens (paths embed each doc's first token, so the
    path field carries real signal): per-field tf normalized by
    per-field length against per-field avg length, field weights, one
    shared saturation. Oracle-exact through the re-derived pid."""
    from .query import bm25f_top_k

    idx = _fielded_index_frames(spark, sf_dir)
    return bm25f_top_k(
        idx, " ".join(_FIELDED_TERMS), k=10,
        w_content=_BM25F_WC, w_path=_BM25F_WP,
        b_content=_BM25F_BC, b_path=_BM25F_BP, k1=_BM25F_K1,
        round_decimals=9,
    )


def _register_fielded() -> None:
    import __spark_entry__ as entry

    fielded_d0 = """
d0 AS (
  SELECT substr('repo' || CAST(doc_id % 7 AS VARCHAR) || '/' ||
                'src/' || string_split(text, ' ')[1] || '.py' ||
                '@' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                1, 64) AS pid,
         text AS content
  FROM documents
)"""
    vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(_FIELDED_TERMS))
    # the FULL Robertson BM25F twin — expression shapes and operation
    # order mirror query.bm25f_top_k exactly (per-field CASE-guarded
    # normalized tf, weighted field sum, shared saturation, ordered
    # per-term fold); literals are Python-formatted from the SAME
    # constants the engine injects, so both sides round-trip the
    # identical IEEE-754 doubles
    tfn_c = (
        f"(CASE WHEN ctf IS NULL THEN 0.0 ELSE CAST(ctf AS DOUBLE) / "
        f"({1.0 - _BM25F_BC!r} + {_BM25F_BC!r} * CAST(doc_len AS DOUBLE) / "
        f"(SELECT avgdl FROM n)) END)"
    )
    tfn_p = (
        f"(CASE WHEN ptf IS NULL THEN 0.0 ELSE CAST(ptf AS DOUBLE) / "
        f"({1.0 - _BM25F_BP!r} + {_BM25F_BP!r} * CAST(flen AS DOUBLE) / "
        f"(SELECT avgfl FROM navg)) END)"
    )
    register(
        "code_search_fielded",
        _q_code_search_fielded,
        f"""
WITH {entry.base_ctes(fielded_d0)},
qx(term, tidx) AS (VALUES {vals}),
fpl AS (
  SELECT docid,
         list_filter(string_split_regex(pid, '[/@.]'), x -> x <> '') AS ptoks
  FROM ds
),
fpe AS (
  SELECT docid, unnest(ptoks) AS term, len(ptoks) AS flen FROM fpl
),
fp AS (
  SELECT term, docid, CAST(count(*) AS INT) AS ptf,
         CAST(any_value(flen) AS BIGINT) AS flen
  FROM fpe GROUP BY term, docid
),
navg AS (
  SELECT CAST(sum(len(ptoks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgfl
  FROM fpl
),
cq AS (
  SELECT p.term, p.docid, p.tf AS ctf, p.doc_len
  FROM p JOIN qx USING (term) JOIN lex l ON l.term = p.term
),
pq AS (
  SELECT fp.term, fp.docid, fp.ptf, fp.flen
  FROM fp JOIN qx USING (term) JOIN lex l ON l.term = fp.term
),
uj AS (
  SELECT term, docid, ctf, doc_len, ptf, flen
  FROM cq FULL JOIN pq USING (term, docid)
),
tj AS (
  SELECT term, docid,
         ({_BM25F_WC!r} * {tfn_c} + {_BM25F_WP!r} * {tfn_p}) AS tft
  FROM uj
),
scored AS (
  SELECT tj.docid, qx.tidx,
         log10((SELECT nd FROM n) / CAST(l.df AS DOUBLE)) * tft
           / ({_BM25F_K1!r} + tft) AS partial
  FROM tj JOIN qx USING (term) JOIN lex l ON l.term = tj.term
),
agg AS (
  SELECT docid,
         round(CAST(list_sum(list(partial ORDER BY tidx)) AS DOUBLE), 9)
           AS score
  FROM scored GROUP BY docid
)
SELECT a.docid, ds.pid, a.score AS score
FROM agg a JOIN ds USING (docid)
ORDER BY score DESC, docid ASC
LIMIT 10
""",
    )

    register(
        "field_postings",
        _q_field_postings,
        f"""
WITH {entry.base_ctes(fielded_d0)},
fpl AS (
  SELECT docid,
         list_filter(string_split_regex(pid, '[/@.]'), x -> x <> '') AS ptoks
  FROM ds
),
fpe AS (
  SELECT docid, unnest(ptoks) AS term, len(ptoks) AS flen FROM fpl
)
SELECT term, docid, CAST(count(*) AS INT) AS tf,
       CAST(any_value(flen) AS BIGINT) AS field_len
FROM fpe GROUP BY term, docid
""",
    )


def _q_field_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F filename-field postings over the north-rule code table:
    the (term, docid) table build stage 7 persists (fielded_top_k's
    boost source — indexer.field_postings_frame), derived here from
    the same fielded corpus code_search_fielded queries, so the gate
    pins the field layout row-for-row against first principles."""
    from .indexer import field_postings_frame

    return field_postings_frame(_fielded_index_frames(spark, sf_dir).doc_stats)


_register_fielded()
