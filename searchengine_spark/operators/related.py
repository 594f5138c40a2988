"""Related-document retrieval: TF-IDF-weighted cosine over the
inverted index.

The lexical-similarity counterpart to the embedding ANN operators:
for every document, the k most similar documents by cosine of their
TF-IDF vectors — computed THROUGH the inverted index (postings
self-join on shared terms), the classic sparse all-pairs plan
(Bayardo et al., "Scaling up all pairs similarity search", WWW 2007).

Scale shape: a naive postings self-join costs Σ over terms of df² —
identical skew profile to the shingle join. Two defenses, both on by
default:

* ``max_term_df="auto"`` (``related_docs_topk``) drops terms with
  df > n_docs/2 before the self-join — they contribute near-zero
  TF-IDF weight (a term in half the corpus has idf <= log10 2) while
  owning the quadratic heads.
* ``similar_pairs_prefix`` is the output-sensitive path for threshold
  queries: Bayardo-style PREFIX FILTERING over weight-sorted
  normalized vectors. A doc's candidate join uses only the prefix of
  its terms whose remaining suffix norm can still reach the cosine
  threshold; every dropped pair is provably below the threshold, and
  survivors get an exact candidate-restricted cosine verification —
  the MinHash-LSH verification shape, but deterministic and exact.
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


def _resolve_max_term_df(
    max_term_df: int | str | None, lexicon: DataFrame
) -> int | None:
    """``"auto"`` -> n_docs // 2, with n_docs recovered from any lexicon
    row (idf = log10(N/df) => N = df * 10^idf; one 1-row collect, no
    corpus scan)."""
    if max_term_df != "auto":
        return max_term_df
    row = lexicon.select("df", "idf").limit(1).collect()
    if not row:
        return None
    n_docs = int(round(int(row[0]["df"]) * 10.0 ** float(row[0]["idf"])))
    return n_docs // 2


def related_docs_topk(
    postings: DataFrame,
    lexicon: DataFrame,
    k: int = RELATED_K,
    max_term_df: int | str | None = "auto",
) -> DataFrame:
    """Top-k most similar documents per document by TF-IDF cosine:
    (docid, related_docid, cosine, rank). Ties: cosine DESC,
    related_docid ASC, on values rounded to {ROUND} decimals so
    cross-engine float summation order cannot flip a rank.

    ``max_term_df`` guards the self-join's quadratic heads; the
    default ``"auto"`` drops terms present in over half the corpus
    (idf <= log10 2 — near-zero cosine contribution). Pass ``None``
    only for corpora where the guard's premise fails (e.g. a tiny
    synthetic vocabulary where EVERY term is in most docs)."""
    w = doc_weights(postings, lexicon)
    mdf = _resolve_max_term_df(max_term_df, lexicon)
    if mdf is not None:
        heavy = (
            lexicon.filter(F.col("df") > mdf).select("term")
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


def _normalized_weights(
    postings: DataFrame,
    lexicon: DataFrame,
    max_term_df: int | str | None,
) -> DataFrame:
    """(term, docid, what): unit-normalized TF-IDF components.
    Zero-norm documents (every term guarded away or idf exactly 0)
    are excluded — they have no well-defined direction."""
    w = doc_weights(postings, lexicon)
    mdf = _resolve_max_term_df(max_term_df, lexicon)
    if mdf is not None:
        heavy = lexicon.filter(F.col("df") > mdf).select("term")
        w = w.join(F.broadcast(heavy), "term", "left_anti")
    norms = w.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nn")
    ).filter(F.col("nn") > 0)
    return w.join(norms, "docid").select(
        "term", "docid", (F.col("wt") / F.col("nn")).alias("what")
    )


def _prefix_candidates(what: DataFrame, threshold: float) -> DataFrame:
    """Bayardo prefix-filtered candidate pairs (da < db), guaranteed to
    contain every pair with cosine >= threshold.

    Per doc, terms sort by normalized weight DESC (term ASC tie-break);
    a term stays in the doc's PREFIX while the suffix norm from that
    term onward can still reach the threshold (if a pair's earliest
    shared term t has suffix_norm(t) < threshold on either side, then
    cos <= suffix_norm(t) < threshold by Cauchy-Schwarz — so joining
    prefix(a) x all(b) provably misses nothing). The prune threshold is
    relaxed by one rounding ulp so a pair whose ROUNDED cosine reaches
    the threshold can never be pre-filtered (round-before-cut, same
    argument as the MaxScore rounded-threshold proof)."""
    t_prune = max(threshold - 10.0 ** (-ROUND), 0.0)
    win = Window.partitionBy("docid").orderBy(
        F.col("what").desc(), F.col("term").asc()
    )
    suffix_sq = F.sum(F.col("what") * F.col("what")).over(
        win.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = (
        what.withColumn("suffix_sq", suffix_sq)
        .filter(F.col("suffix_sq") >= F.lit(t_prune * t_prune))
        .select("term", F.col("docid").alias("da"))
    )
    allw = what.select("term", F.col("docid").alias("db"))
    return (
        prefix.join(allw, "term")
        .filter(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("da"),
            F.greatest("da", "db").alias("db"),
        )
        .distinct()
    )


def similar_pairs_prefix(
    postings: DataFrame,
    lexicon: DataFrame,
    threshold: float,
    max_term_df: int | str | None = None,
) -> DataFrame:
    """All document pairs (da < db) with TF-IDF cosine >= threshold —
    EXACT result via prefix-filtered candidates + candidate-restricted
    verification (output-sensitive cost instead of Σ df²). Columns:
    (da, db, cosine), cosine rounded to {ROUND} decimals before the
    threshold cut on both engines."""
    what = _normalized_weights(postings, lexicon, max_term_df)
    cand = _prefix_candidates(what, threshold)
    a = what.select("term", F.col("docid").alias("da"), F.col("what").alias("wa"))
    b = what.select("term", F.col("docid").alias("db"), F.col("what").alias("wb"))
    return (
        cand.join(a, "da")
        .join(b, ["term", "db"])
        .groupBy("da", "db")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), ROUND).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


_PAIR_THRESHOLD = 0.9


def _q_related(spark, sf_dir: str) -> DataFrame:
    import __spark_entry__ as entry

    idx = entry._frames(spark, sf_dir)
    # the synthetic gate corpus draws every doc from a 31-word
    # vocabulary, so EVERY term is in over half the docs and the
    # auto-guard's premise (df > N/2 => negligible weight) fails —
    # run unguarded here; production corpora keep the default
    return related_docs_topk(
        idx.postings, idx.lexicon, k=RELATED_K, max_term_df=None
    )


def _q_related_pairs(spark, sf_dir: str) -> DataFrame:
    import __spark_entry__ as entry

    idx = entry._frames(spark, sf_dir)
    return similar_pairs_prefix(
        idx.postings, idx.lexicon, _PAIR_THRESHOLD, max_term_df=None
    )


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


def _related_pairs_sql() -> str:
    """Oracle for the prefix-filtered pairs: the PLAIN quadratic
    threshold join — prefix filtering is a performance device, the
    result set is identical by the suffix-norm bound."""
    import __spark_entry__ as entry

    return f"""
WITH {entry._BASE_CTES},
w AS (
  SELECT p.term, p.docid,
         log10((SELECT nd FROM n) / CAST(l.df AS DOUBLE))
           * (1.0 + log10(CAST(p.tf AS DOUBLE))) AS wt
  FROM p JOIN lex l USING (term)
),
nrm AS (
  SELECT docid, sqrt(sum(wt * wt)) AS nn FROM w GROUP BY docid
  HAVING sqrt(sum(wt * wt)) > 0
),
wh AS (
  SELECT w.term, w.docid, w.wt / nrm.nn AS what
  FROM w JOIN nrm USING (docid)
)
SELECT a.docid AS da, b.docid AS db,
       round(sum(a.what * b.what), {ROUND}) AS cosine
FROM wh a JOIN wh b ON a.term = b.term AND a.docid < b.docid
GROUP BY 1, 2
HAVING round(sum(a.what * b.what), {ROUND}) >= {_PAIR_THRESHOLD}
"""


def _register() -> None:
    register("related_docs_tfidf", _q_related, _related_sql())
    register("related_prefix_pairs", _q_related_pairs, _related_pairs_sql())


_register()
