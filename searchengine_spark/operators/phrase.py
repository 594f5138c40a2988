"""Positional index + exact phrase search.

Beyond-reference extension (the reference's postings carry no
positions): a positional posting table and an exact-phrase matcher,
the operator a training-data pipeline uses for exact n-gram
containment checks ("does this boilerplate sentence appear verbatim?")
and classic phrase retrieval.

* ``positions_frame``  — (term, docid, doc_len, tf, positions) where
  ``positions`` is the sorted 0-based token offsets of the term in the
  ANALYZED token sequence (Lucene-style: positions index the
  post-analysis stream). Built by ``posexplode`` + one (term, docid)
  aggregation — same shuffle shape as the tf postings.
* ``phrase_search``    — docs containing the query terms as a
  CONSECUTIVE phrase, ranked by phrase frequency. Matching is pure
  JVM array math: join each query term's position array onto the
  first term's rows by docid, then one ``filter(pos0, x ->
  array_contains(pos_i, x + i) ...)`` — the classic positional
  intersection, no Python, no explode of positions.

Scale notes: the docid equi-joins let Catalyst/AQE pick broadcast vs
shuffle per term (the rarest term's side is small — AQE's join
reordering and size estimates favor it); a phrase containing only
boilerplate terms degrades to a large equi-join, never a cross join.
Position arrays add ~1 int per token to the index — the standard
positional-index cost (Manning/Raghavan/Schütze, IIR ch. 2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .entry_ops import register

ROUND = 9


def positions_frame(doc_tokens: DataFrame) -> DataFrame:
    """(docid, tokens, doc_len) -> (term, docid, doc_len, tf, positions).

    Blank tokens occupy a position (they count toward doc_len,
    Spimi.java:264) but emit no posting row — consistent with the tf
    postings (P8)."""
    pos = doc_tokens.select(
        "docid",
        "doc_len",
        F.posexplode("tokens").alias("pos", "term"),
    ).filter(F.col("term") != "")
    return pos.groupBy("term", "docid", "doc_len").agg(
        F.count("*").cast("int").alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )


def phrase_search(
    positions: DataFrame,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k (docid, phrase_tf) for an exact consecutive phrase.

    ``terms`` is the analyzed query token sequence IN ORDER (duplicates
    meaningful — "buffalo buffalo" is a real phrase query). A doc
    matches where positions(t0) contains x and positions(t_i) contains
    x+i for every i; phrase_tf = number of such x. Rank: phrase_tf
    DESC, docid ASC."""
    if not terms:
        raise ValueError("empty phrase")
    spark = positions.sparkSession
    empty = spark.createDataFrame([], "docid long, phrase_tf long")
    base = (
        positions.filter(F.col("term") == terms[0])
        .select("docid", F.col("positions").alias("p0"))
    )
    arrays = ["p0"]
    cur = base
    for i, t in enumerate(terms[1:], start=1):
        side = (
            positions.filter(F.col("term") == t)
            .select("docid", F.col("positions").alias(f"p{i}"))
        )
        cur = cur.join(side, "docid")
        arrays.append(f"p{i}")

    def contains_shifted(pi, i):
        def pred(x):
            return F.array_contains(pi, x + i)

        return pred

    match = F.col("p0")
    for i in range(1, len(terms)):
        match = F.filter(match, contains_shifted(F.col(f"p{i}"), i))
    out = (
        cur.select("docid", F.size(match).cast("long").alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
        .orderBy(F.col("phrase_tf").desc(), F.col("docid").asc())
        .limit(k)
    )
    return out if terms else empty


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracle
# ---------------------------------------------------------------------------

_PHRASE = ["spark", "join"]  # in-vocabulary bigram
_PHRASE_K = 10


def _q_phrase(spark, sf_dir: str) -> DataFrame:
    import __spark_entry__ as entry

    from .frames import tokenized_docs

    dt = tokenized_docs(entry._docs(spark, sf_dir), stem_stop=False)
    pos = positions_frame(dt.select("docid", "doc_len", "tokens"))
    return phrase_search(pos, _PHRASE, k=_PHRASE_K)


def _phrase_sql() -> str:
    # positions are 0-based offsets into the space-split token stream
    conds = " AND ".join(
        f"list_contains(p{i}.plist, x + {i})" for i in range(1, len(_PHRASE))
    )
    joins = "".join(
        f" JOIN plists p{i} ON p{i}.term = '{t}' AND p{i}.docid = p0.docid"
        for i, t in enumerate(_PHRASE[1:], start=1)
    )
    return f"""
WITH d0 AS (
  SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS pid, text AS content
  FROM documents
),
ds AS (
  SELECT CAST(row_number() OVER (ORDER BY pid) AS BIGINT) AS docid, pid,
         string_split(content, ' ') AS toks
  FROM d0 WHERE len(string_split(content, ' ')) > 0
),
tok AS (
  SELECT docid, toks[i.i] AS term, CAST(i.i - 1 AS BIGINT) AS pos
  FROM ds, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) i
  WHERE toks[i.i] <> ''
),
plists AS (
  SELECT term, docid, list(pos ORDER BY pos) AS plist
  FROM tok GROUP BY term, docid
),
matched AS (
  SELECT p0.docid,
         CAST(len(list_filter(p0.plist, x -> {conds})) AS BIGINT)
           AS phrase_tf
  FROM plists p0{joins}
  WHERE p0.term = '{_PHRASE[0]}'
)
SELECT docid, phrase_tf FROM matched WHERE phrase_tf > 0
ORDER BY phrase_tf DESC, docid ASC
LIMIT {_PHRASE_K}
"""


register("phrase_search_topk", _q_phrase, _phrase_sql())
