"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry runs the REAL engine (full analysis chain,
dense-docid assignment, explode+hash-agg postings, lexicon aggregation,
DAAT-equivalent scoring) over the ``documents`` parquet table; the
matching ``oracle_sql()`` entry re-derives the same result in pure
DuckDB SQL.

Oracle parity notes
-------------------
* Engine queries here run with ``stem_stop=False`` (the reference's
  default, flag ``-s`` off — Main.java:43-71): DuckDB has no Porter
  stemmer offline, so stemming/stopword correctness is pinned by the
  pytest golden vectors (tests/test_analysis.py) instead.
* The synthetic corpus is lowercase letters + single spaces only
  (verified in tests/test_entry_oracle.py), so the reference clean
  chain (URL/HTML/non-letter/repeat3 collapse — Preprocesser.java:
  125-147) is identity on it and the SQL side can tokenize with a
  plain split; the Spark side still executes the full chain.
* Scores are ``round(x, 9)`` BEFORE the order-by/limit on both sides so
  tie-breaks (score DESC, docid ASC) are decided on identical values;
  IEEE-754 doubles agree to far more than 9 digits across engines.
* Every computed column is aliased identically on both sides; integer
  widths are pinned (docid/doc_len/df BIGINT, tf/max_tf INT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.5
B = 0.75
ROUND = 9
RUN_ID = "searchengine_spark"

# TREC-style evaluation queries (QueryPerformancesMain.java:64-99 reads
# qid\ttext pairs); terms drawn from the corpus vocabulary, plus one
# out-of-vocabulary term to exercise the missing-term paths.
TREC_QUERIES: dict[str, str] = {
    "q1": "spark join fast",
    "q2": "hash table scan",
    "q3": "window agg stream",
    "q4": "slow query plan",  # 'plan' is out-of-vocabulary
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the documents table to the engine's (pid, content)
    contract. pid is zero-padded so ORDER BY pid == ORDER BY doc_id and
    the dense docid assignment is oracle-reproducible as
    row_number() OVER (ORDER BY pid)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )


def _frames(spark: SparkSession, sf_dir: str, with_blocks: bool = False):
    from searchengine_spark.operators.frames import build_index_frames

    return build_index_frames(
        _docs(spark, sf_dir), stem_stop=False, with_blocks=with_blocks
    )


# ---------------------------------------------------------------------------
# Shared oracle CTE prefix (DuckDB SQL twin of frames.build_index_frames)
# ---------------------------------------------------------------------------

# default corpus adapter CTE: pid = zero-padded doc_id (see _docs);
# base_ctes() lets other registrations (e.g. the code-table gates in
# engine_extra) swap in a different pid derivation while reusing the
# whole doc-stats/postings/lexicon pipeline SQL verbatim
D0_CTE = """
d0 AS (
  SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS pid, text AS content
  FROM documents
)"""

_REST_CTES = """,
ds AS (
  SELECT CAST(row_number() OVER (ORDER BY pid) AS BIGINT) AS docid,
         pid,
         CAST(len(string_split(content, ' ')) AS BIGINT) AS doc_len,
         sha256(content) AS content_sha256
  FROM d0
  WHERE len(string_split(content, ' ')) > 0
),
ex AS (
  SELECT ds.docid, ds.doc_len, unnest(string_split(d0.content, ' ')) AS term
  FROM d0 JOIN ds USING (pid)
),
p AS (
  SELECT term, docid, doc_len, CAST(count(*) AS INT) AS tf
  FROM ex WHERE term <> '' GROUP BY 1, 2, 3
),
n AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd,
         CAST(sum(doc_len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM ds
),
lex AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df,
         max(tf) AS max_tf,
         max({'r': CAST(tf AS DOUBLE) / CAST(doc_len + tf AS DOUBLE),
              'nd': -docid, 'tf': tf, 'dl': doc_len}) AS best
  FROM p GROUP BY term
)
"""


def base_ctes(d0_sql: str = D0_CTE) -> str:
    return d0_sql + _REST_CTES


_BASE_CTES = base_ctes()


def _score_sql(scoring: str) -> str:
    """Per-posting partial score (Scorer.java:40-64): ltf = 1+log10(tf)."""
    ltf = "(1.0 + log10(CAST(p.tf AS DOUBLE)))"
    idf = "log10((SELECT nd FROM n) / CAST(l.df AS DOUBLE))"
    if scoring == "bm25":
        denom = (
            f"({ltf} + {K1} * ((1.0 - {B}) + {B} * "
            f"CAST(p.doc_len AS DOUBLE) / (SELECT avgdl FROM n)))"
        )
        return f"{idf} * {ltf} / {denom}"
    return f"{idf} * {ltf}"


def _values_terms(terms: list[str]) -> str:
    rows = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    return f"(VALUES {rows}) AS q(term, tidx)"


def _topk_sql(
    terms: list[str],
    scoring: str,
    conjunctive: bool,
    k: int,
    ctes: str | None = None,
) -> str:
    """Disjunctive = sum of per-term partials (DAAT.java:95-162);
    conjunctive adds HAVING count == |q| (DAAT.java:43-127). Partials
    are summed in query-term order (list_sum over an ordered list) to
    mirror the engine's ordered fold — float addition isn't
    associative. ``ctes`` swaps the corpus-adapter CTE prefix (see
    base_ctes) so other input shapes reuse the same query SQL."""
    conj = f"HAVING count(*) = {len(terms)}" if conjunctive else ""
    return f"""
WITH {ctes or _BASE_CTES},
scored AS (
  SELECT p.docid, q.tidx, {_score_sql(scoring)} AS partial
  FROM p
  JOIN {_values_terms(terms)} ON p.term = q.term
  JOIN lex l ON l.term = q.term
),
agg AS (
  SELECT docid,
         round(CAST(list_sum(list(partial ORDER BY tidx)) AS DOUBLE), {ROUND})
           AS score
  FROM scored GROUP BY docid {conj}
)
SELECT a.docid, ds.pid, a.score
FROM agg a JOIN ds USING (docid)
ORDER BY a.score DESC, a.docid ASC
LIMIT {k}
"""


def _q_topk(terms_text: str, scoring: str, conjunctive: bool, k: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from searchengine_spark.operators.query import top_k

        idx = _frames(spark, sf_dir)
        return top_k(
            idx, terms_text, k=k, conjunctive=conjunctive, scoring=scoring,
            round_decimals=ROUND,
        )

    return run


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _frames(spark, sf_dir).doc_stats


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _frames(spark, sf_dir).postings.select(
        "term", "docid", "doc_len", "tf"
    )


def _q_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _frames(spark, sf_dir).lexicon
    return lex.select(
        "term",
        "df",
        "max_tf",
        F.col("bm25_tf").cast("int").alias("bm25_tf"),
        F.col("bm25_dl").cast("long").alias("bm25_dl"),
        F.round("idf", ROUND).alias("idf"),
        F.round("tub_tfidf", ROUND).alias("tub_tfidf"),
        F.round("tub_bm25", ROUND).alias("tub_bm25"),
    )


def _q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _frames(spark, sf_dir)
    n_terms = idx.lexicon.count()
    s = idx.stats
    return spark.createDataFrame(
        [
            (
                s["n_docs"],
                s["total_doc_len"],
                n_terms,
                round(s["avg_doc_len"], ROUND),
            )
        ],
        "n_docs long, total_doc_len long, n_terms long, avg_doc_len double",
    )


def _q_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _frames(spark, sf_dir, with_blocks=True).blocks.select(
        "term", "block_id", "max_docid", F.col("num_postings").cast("long").alias("num_postings")
    )


def _q_block_bmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-block max scores (Ding & Suel block-max layout,
    build stage 4): the PERSISTED blocks table, bmax columns rounded to
    {ROUND} decimals for the cross-engine compare (round commutes with
    max — both are monotone)."""
    from searchengine_spark.operators.entry_ops import gate_disk_index

    idx = gate_disk_index(spark, sf_dir)
    return idx.blocks.select(
        "term",
        "block_id",
        "max_docid",
        F.col("num_postings").cast("long").alias("num_postings"),
        F.round("bmax_bm25", ROUND).alias("bmax_bm25"),
        F.round("bmax_tfidf", ROUND).alias("bmax_tfidf"),
    )


def _q_trec_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TREC results sink (S14 — QueryPerformancesMain.java:37-58):
    one `qid Q0 pid rank score runid` row per hit, all queries."""
    from pyspark.sql import Window

    from searchengine_spark.operators.query import top_k

    idx = _frames(spark, sf_dir)
    parts = []
    for qid, text in TREC_QUERIES.items():
        r = top_k(idx, text, k=10, conjunctive=False, scoring="bm25",
                  round_decimals=ROUND)
        parts.append(r.select(F.lit(qid).alias("qid"), "docid", "pid", "score"))
    allq = parts[0]
    for p in parts[1:]:
        allq = allq.unionByName(p)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("docid").asc())
    return allq.select(
        "qid",
        F.lit("Q0").alias("q0"),
        "pid",
        F.row_number().over(w).cast("long").alias("rank"),
        "score",
        F.lit(RUN_ID).alias("runid"),
    )


def _trec_sql() -> str:
    qrows = ", ".join(
        f"('{qid}', '{t}', {i})"
        for qid, text in TREC_QUERIES.items()
        for i, t in enumerate(text.split())
    )
    return f"""
WITH {_BASE_CTES},
scored AS (
  SELECT q.qid, p.docid, q.tidx, {_score_sql("bm25")} AS partial
  FROM p
  JOIN (VALUES {qrows}) AS q(qid, term, tidx) ON p.term = q.term
  JOIN lex l ON l.term = q.term
),
agg AS (
  SELECT qid, docid,
         round(CAST(list_sum(list(partial ORDER BY tidx)) AS DOUBLE), {ROUND})
           AS score
  FROM scored GROUP BY qid, docid
),
ranked AS (
  SELECT qid, docid, score,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, docid ASC) AS BIGINT) AS rank
  FROM agg
)
SELECT r.qid, 'Q0' AS q0, ds.pid, r.rank, r.score, '{RUN_ID}' AS runid
FROM ranked r JOIN ds USING (docid)
WHERE r.rank <= 10
"""


def _q_topk_maxscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel block-max MaxScore scorer (J6): broadcast
    query-term posting lists, per-slice cursor pruning, provable TUBs.
    Oracle = the exact disjunctive SQL — pruning is a performance
    device, not a semantics change."""
    from searchengine_spark.operators.maxscore import maxscore_topk

    idx = _frames(spark, sf_dir)
    return maxscore_topk(
        idx, "merge sort batch", k=10, conjunctive=False, scoring="bm25",
        round_decimals=ROUND,
    )


def _q_topk_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k served THROUGH the compressed posting path: postings
    -> gap-VB/unary pack -> decode -> score. Proves the C1-C4 codecs
    inside the query pipeline; oracle = the exact disjunctive SQL."""
    from searchengine_spark.operators.frames import IndexFrames
    from searchengine_spark.operators.indexer import (
        _PACK_SCHEMA,
        _pack_group,
        unpack_postings,
    )
    from searchengine_spark.operators.query import top_k

    idx = _frames(spark, sf_dir)
    packed = (
        idx.postings.withColumn("block_id", F.lit(0).cast("long"))
        .groupBy("term", "block_id")
        .applyInPandas(_pack_group, schema=_PACK_SCHEMA)
    )
    unpacked = unpack_postings(packed).drop("block_id")
    doc_len = idx.doc_stats.select("docid", "doc_len")
    postings = unpacked.join(doc_len, "docid").select(
        "term", "docid", "tf", "doc_len"
    )
    idx2 = IndexFrames(
        idx.spark, idx.doc_stats, postings, idx.lexicon, idx.blocks,
        idx.stats, idx.manifest,
    )
    return top_k(idx2, "window agg batch", k=10, scoring="bm25",
                 round_decimals=ROUND)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-chain (stop+stem) BM25 top-10 on sf0.001."""
    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.query import top_k

    docs = _docs(spark, "/root/testdata/sf0.001")
    idx = build_index_frames(docs, stem_stop=True)
    return top_k(idx, "spark shuffle join performance", k=10, scoring="bm25")


def _core_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # index build surface (SURVEY §2.1/2.3)
        "doc_stats": _q_doc_stats,            # S5/S10, A2, lineage sha256
        "postings_tf": _q_postings,           # A1 explode+hash agg
        "lexicon_stats": _q_lexicon,          # A4-A7 df/idf/maxTf/TUBs
        "collection_stats": _q_collection_stats,  # A3/A8/S11
        "block_metadata": _q_blocks,          # M5/S7 sqrt-block law
        "block_bmax": _q_block_bmax,          # J3 stored block-max scores
        # query evaluation surface (SURVEY §2.5/2.6, M6/M7)
        "topk_bm25_disj": _q_topk("spark join fast", "bm25", False),
        "topk_bm25_conj": _q_topk("hash table scan", "bm25", True),
        "topk_tfidf_disj": _q_topk("window agg stream", "tfidf", False),
        "topk_tfidf_conj": _q_topk("slow query merge", "tfidf", True),
        "topk_conj_missing_term": _q_topk("spark plan", "bm25", True),  # P10
        "trec_run": _q_trec_run,              # S14
        # pruning scorer (J6) + compressed query path (C1-C4 round-trip)
        "topk_bm25_maxscore": _q_topk_maxscore,
        "topk_bm25_packed": _q_topk_packed,
    }


def queries_unmerged() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Pre-consolidation registry: one entry per single operator."""
    from searchengine_spark.operators.entry_ops import extra_queries

    q = _core_queries()
    q.update(extra_queries())
    return q


def oracle_sql_unmerged() -> dict[str, str]:
    """Pre-consolidation oracle registry (every single-operator twin)."""
    from searchengine_spark.operators.entry_ops import extra_oracle_sql

    sql = core_oracle_sql()
    sql.update(extra_oracle_sql())
    return sql


def _registry():
    """(queries, oracles) with near-duplicate twins merged so the
    driver's 50-entry window covers every operator family (see
    searchengine_spark/operators/gatemerge.py)."""
    from searchengine_spark.operators.gatemerge import consolidate

    q = queries_unmerged()
    sql = oracle_sql_unmerged()
    consolidate(q, sql)
    return q, sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]


def core_oracle_sql() -> dict[str, str]:
    """Oracles for the core engine queries only (no pipeline extras) —
    importable without triggering the operator-registry load."""
    return {
        "doc_stats": f"WITH {_BASE_CTES} SELECT docid, pid, doc_len, content_sha256 FROM ds",
        "postings_tf": f"WITH {_BASE_CTES} SELECT term, docid, doc_len, tf FROM p",
        "lexicon_stats": f"""
WITH {_BASE_CTES}
SELECT term, df, max_tf,
       best.tf AS bm25_tf,
       CAST(best.dl AS BIGINT) AS bm25_dl,
       round(log10((SELECT nd FROM n) / CAST(df AS DOUBLE)), {ROUND}) AS idf,
       round((1.0 + log10(CAST(max_tf AS DOUBLE)))
             * log10((SELECT nd FROM n) / CAST(df AS DOUBLE)), {ROUND}) AS tub_tfidf,
       round((log10((SELECT nd FROM n) / CAST(df AS DOUBLE)) * best.tf)
             / (best.tf + {K1} * ((1.0 - {B}) + {B} * CAST(best.dl AS DOUBLE)
                                  / (SELECT avgdl FROM n))), {ROUND}) AS tub_bm25
FROM lex
""",
        "collection_stats": f"""
WITH {_BASE_CTES}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ds) AS n_docs,
       (SELECT CAST(sum(doc_len) AS BIGINT) FROM ds) AS total_doc_len,
       (SELECT CAST(count(*) AS BIGINT) FROM lex) AS n_terms,
       round((SELECT avgdl FROM n), {ROUND}) AS avg_doc_len
""",
        "block_metadata": f"""
WITH {_BASE_CTES},
tdf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term
),
law AS (
  SELECT term, df,
         CASE WHEN df >= 1024 THEN CAST(ceil(sqrt(CAST(df AS DOUBLE))) AS BIGINT)
              ELSE 1 END AS num_blocks
  FROM tdf
),
law2 AS (
  SELECT term, df, num_blocks,
         CAST(ceil(CAST(df AS DOUBLE) / num_blocks) AS BIGINT) AS max_per_block
  FROM law
),
ranked AS (
  SELECT p.term,
         CAST(row_number() OVER (PARTITION BY p.term ORDER BY p.docid) - 1
              AS BIGINT) AS rnk,
         p.docid, l.max_per_block
  FROM p JOIN law2 l USING (term)
)
SELECT term,
       CAST(rnk // max_per_block AS BIGINT) AS block_id,
       max(docid) AS max_docid,
       CAST(count(*) AS BIGINT) AS num_postings
FROM ranked GROUP BY term, CAST(rnk // max_per_block AS BIGINT)
""",
        "block_bmax": f"""
WITH {_BASE_CTES},
tdf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term
),
law AS (
  SELECT term, df,
         CASE WHEN df >= 1024 THEN CAST(ceil(sqrt(CAST(df AS DOUBLE))) AS BIGINT)
              ELSE 1 END AS num_blocks
  FROM tdf
),
law2 AS (
  SELECT term, df, num_blocks,
         CAST(ceil(CAST(df AS DOUBLE) / num_blocks) AS BIGINT) AS max_per_block
  FROM law
),
ranked AS (
  SELECT p.term,
         CAST(row_number() OVER (PARTITION BY p.term ORDER BY p.docid) - 1
              AS BIGINT) AS rnk,
         p.docid, p.tf, p.doc_len, l.max_per_block
  FROM p JOIN law2 l USING (term)
),
sc AS (
  SELECT r.term,
         CAST(rnk // max_per_block AS BIGINT) AS block_id,
         r.docid,
         log10((SELECT nd FROM n) / CAST(t.df AS DOUBLE))
           * (1.0 + log10(CAST(r.tf AS DOUBLE)))
           / ((1.0 + log10(CAST(r.tf AS DOUBLE)))
              + {K1} * ((1.0 - {B}) + {B} * CAST(r.doc_len AS DOUBLE)
                        / (SELECT avgdl FROM n))) AS s_bm25,
         log10((SELECT nd FROM n) / CAST(t.df AS DOUBLE))
           * (1.0 + log10(CAST(r.tf AS DOUBLE))) AS s_tfidf
  FROM ranked r JOIN tdf t USING (term)
)
SELECT term, block_id, max(docid) AS max_docid,
       CAST(count(*) AS BIGINT) AS num_postings,
       round(max(s_bm25), {ROUND}) AS bmax_bm25,
       round(max(s_tfidf), {ROUND}) AS bmax_tfidf
FROM sc GROUP BY term, block_id
""",
        "topk_bm25_disj": _topk_sql(["spark", "join", "fast"], "bm25", False, 10),
        "topk_bm25_conj": _topk_sql(["hash", "table", "scan"], "bm25", True, 10),
        "topk_tfidf_disj": _topk_sql(["window", "agg", "stream"], "tfidf", False, 10),
        "topk_tfidf_conj": _topk_sql(["slow", "query", "merge"], "tfidf", True, 10),
        "topk_conj_missing_term": _topk_sql(["spark", "plan"], "bm25", True, 10),
        "trec_run": _trec_sql(),
        "topk_bm25_maxscore": _topk_sql(["merge", "sort", "batch"], "bm25", False, 10),
        "topk_bm25_packed": _topk_sql(["window", "agg", "batch"], "bm25", False, 10),
    }
