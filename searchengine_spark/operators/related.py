"""Related-document retrieval: TF-IDF-weighted cosine over the
inverted index.

The lexical-similarity counterpart to the embedding ANN operators:
for every document, the k most similar documents by cosine of their
TF-IDF vectors — computed THROUGH the inverted index (postings
self-join on shared terms), the classic sparse all-pairs plan
(Bayardo et al., "Scaling up all pairs similarity search", WWW 2007).

Scale shape: cost is Σ over terms of df² — identical skew profile to
the shingle join, so the same guard applies: ``max_term_df`` drops
ultra-common terms before the self-join (they contribute near-zero
TF-IDF weight anyway — a term in every doc has idf ~0 — so dropping
them barely moves the cosine while removing the quadratic heads).
The gate runs unguarded on the small corpus for an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .entry_ops import register

ROUND = 6
RELATED_K = 3


def doc_weights(postings: DataFrame, lexicon: DataFrame) -> DataFrame:
    """(term, docid, wt): TF-IDF weight idf * (1 + log10 tf) — the
    engine's own scoring weight (Scorer.java:61-64) as a document
    vector component."""
    return (
        postings.join(lexicon.select("term", "idf"), "term")
        .select(
            "term",
            "docid",
            (
                F.col("idf")
                * (F.lit(1.0) + F.log10(F.col("tf").cast("double")))
            ).alias("wt"),
        )
    )


def related_docs_topk(
    postings: DataFrame,
    lexicon: DataFrame,
    k: int = RELATED_K,
    max_term_df: int | None = None,
) -> DataFrame:
    """Top-k most similar documents per document by TF-IDF cosine:
    (docid, related_docid, cosine, rank). Ties: cosine DESC,
    related_docid ASC, on values rounded to {ROUND} decimals so
    cross-engine float summation order cannot flip a rank."""
    w = doc_weights(postings, lexicon)
    if max_term_df is not None:
        heavy = (
            lexicon.filter(F.col("df") > max_term_df).select("term")
        )
        w = w.join(F.broadcast(heavy), "term", "left_anti")
    norms = w.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nn")
    )
    a = w.select("term", F.col("docid").alias("da"), F.col("wt").alias("wa"))
    b = w.select("term", F.col("docid").alias("db"), F.col("wt").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("docid").alias("da"), F.col("nn").alias("na"))
    nb = norms.select(F.col("docid").alias("db"), F.col("nn").alias("nb"))
    scored = (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("docid"),
            F.col("db").alias("related_docid"),
            F.round(
                F.col("dot") / (F.col("na") * F.col("nb")), ROUND
            ).alias("cosine"),
        )
    )
    win = Window.partitionBy("docid").orderBy(
        F.col("cosine").desc(), F.col("related_docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _q_related(spark, sf_dir: str) -> DataFrame:
    import __spark_entry__ as entry

    idx = entry._frames(spark, sf_dir)
    return related_docs_topk(idx.postings, idx.lexicon, k=RELATED_K)


def _related_sql() -> str:
    import __spark_entry__ as entry

    return f"""
WITH {entry._BASE_CTES},
w AS (
  SELECT p.term, p.docid,
         log10((SELECT nd FROM n) / CAST(l.df AS DOUBLE))
           * (1.0 + log10(CAST(p.tf AS DOUBLE))) AS wt
  FROM p JOIN lex l USING (term)
),
nrm AS (SELECT docid, sqrt(sum(wt * wt)) AS nn FROM w GROUP BY docid),
dots AS (
  SELECT a.docid AS da, b.docid AS db, sum(a.wt * b.wt) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.docid <> b.docid
  GROUP BY 1, 2
),
scored AS (
  SELECT da AS docid, db AS related_docid,
         round(dot / (x.nn * y.nn), {ROUND}) AS cosine
  FROM dots JOIN nrm x ON x.docid = da JOIN nrm y ON y.docid = db
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY docid ORDER BY cosine DESC, related_docid ASC) AS BIGINT)
    AS rank
  FROM scored
)
SELECT docid, related_docid, cosine, rank FROM ranked
WHERE rank <= {RELATED_K}
"""


def _register() -> None:
    register("related_docs_tfidf", _q_related, _related_sql())


_register()
