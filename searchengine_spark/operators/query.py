"""Top-k query evaluation: DAAT-equivalent exact scoring.

Re-expresses the reference's document-at-a-time traversal
(/root/reference/queryHandler/.../DAAT.java, MaxScore.java) relationally:

* disjunctive (DAAT.java:95-162) = filter postings to query terms,
  sum per-doc partial scores;
* conjunctive (DAAT.java:43-127) = same plus HAVING count(term)==|q|
  (a multi-way semi-join on docid), with the missing-term short-circuit
  (QueryProcesser.java:61-67);
* top-k min-heap (DAAT.java:176-206) = ORDER BY score DESC, docid ASC
  LIMIT k — the strict-`>` heap retains the earlier (lower-docid) doc
  on score ties, which this ordering reproduces deterministically.

MaxScore/block-max pruning is a performance device, not a semantics
change (the reference's own tests assert DAAT == MaxScore); exact
scoring + true top-k yields rank-identical results. A partition-
parallel pruning scorer lives in maxscore.py for the latency path.

Scoring formulas replicate Scorer.java:40-64 with the same IEEE-754
operation order (Java and Spark both use binary64):

  ltf     = 1 + log10(tf)
  tfidf   = idf * ltf
  bm25    = idf * ltf / (ltf + k1*(1 - b + b*doc_len/avg_doc_len))
  k1=1.5, b=0.75, avg_doc_len = total_doc_len / N
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import process_text
from .indexer import B, K1, InvertedIndex

# batch_top_k pushes an In(term) filter to the postings scan up to this
# many distinct terms; beyond it the broadcast join alone filters (an
# In with 100k literals costs more in planning than it saves at scan)
BATCH_PUSHDOWN_TERM_LIMIT = 10_000


def query_terms(text: str, stem_stop: bool) -> list[str]:
    """Analysis chain + order-preserving dedup (QueryProcesser.java:53-56)."""
    seen: dict[str, None] = {}
    for t in process_text(text, stem_stop):
        seen.setdefault(t, None)
    return list(seen)


def score_col(scoring: str, idf: Column, avg_doc_len: float) -> Column:
    """Per-posting partial score as a JVM column expression over
    (tf, doc_len) with the term's idf injected."""
    ltf = F.lit(1.0) + F.log10(F.col("tf").cast("double"))
    if scoring == "bm25":
        denom = ltf + F.lit(K1) * (
            F.lit(1.0 - B)
            + F.lit(B) * F.col("doc_len").cast("double") / F.lit(avg_doc_len)
        )
        return idf * ltf / denom
    return idf * ltf  # tfidf (Scorer.java:61-64); dispatch per Scorer.java:29-31


def batch_top_k(
    index: InvertedIndex,
    queries: dict[str, str],
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    round_decimals: int | None = None,
) -> DataFrame:
    """Evaluate MANY queries in ONE Spark job: the batch-evaluation
    shape QueryPerformancesMain.java:100-126 needs (6,980 MS MARCO dev
    queries, k=100). A per-query loop costs one job-scheduling floor
    (~0.5 s) per query — an hour of pure overhead for the dev set; this
    joins the postings against a (qid, term, tidx) frame ONCE, scores
    every (query, doc) partial in the same shuffle, and ranks per qid
    with a window.

    Returns (qid, docid, pid, score, rank), rank 1..k per qid, ordered
    within each query by score DESC, docid ASC — per-query results are
    rank-identical to ``top_k`` on the same index (asserted in
    tests/test_engine_e2e.py).

    Scale shape: the query frame is |Q| x |q| rows — broadcast against
    the postings scan, so the only shuffle keys are (qid, docid) for
    the aggregation and qid for the ranking window. Per-query partials
    fold in query-term order (tidx) for bit-exact DAAT parity.
    """
    spark = index.spark
    stats = index.stats
    stem_stop = index.manifest["flags"]["stem_stop"]
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    empty = spark.createDataFrame(
        [], "qid string, docid long, pid string, score double, rank long"
    )

    qrows = []
    n_terms_total: dict[str, int] = {}
    for qid, text in queries.items():
        terms = query_terms(text, stem_stop)
        n_terms_total[qid] = len(terms)
        qrows.extend((qid, t, i) for i, t in enumerate(terms))
    if not qrows:
        return empty
    qframe = spark.createDataFrame(qrows, "qid string, term string, tidx int")

    # one broadcast lexicon lookup for ALL queries' distinct terms
    qlex = (
        F.broadcast(qframe)
        .join(index.lexicon.select("term", "idf"), "term")
        .select("qid", "term", "tidx", "idf")
    )
    # parquet predicate pushdown for the postings scan: an In() filter
    # on the distinct query terms reaches the row-group/dictionary
    # level when the term set is modest; past the literal budget the
    # broadcast join alone does the filtering (the scan is then a full
    # pass — correct, just not skippable)
    distinct_terms = sorted({t for _, t, _ in qrows})
    postings = index.postings
    if len(distinct_terms) <= BATCH_PUSHDOWN_TERM_LIMIT:
        postings = postings.filter(F.col("term").isin(distinct_terms))
    scored = (
        F.broadcast(qlex)
        .join(postings, "term")
        .select(
            "qid",
            "docid",
            "tidx",
            score_col(scoring, F.col("idf"), avgdl).alias("partial"),
        )
    )
    agg = scored.groupBy("qid", "docid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tidx", "partial"))),
            F.lit(0.0),
            lambda acc, x: acc + x["partial"],
        ).alias("score"),
        F.count("*").alias("n_matched"),
    )
    if conjunctive:
        # a query with an out-of-vocabulary term can never reach its
        # full term count -> empty, the missing-term short-circuit
        # (QueryProcesser.java:61-67) falls out of the predicate
        n_map = F.create_map(
            *[F.lit(x) for qid, n in n_terms_total.items() for x in (qid, n)]
        )
        agg = agg.filter(F.col("n_matched") == n_map[F.col("qid")])
    if round_decimals is not None:
        agg = agg.withColumn("score", F.round(F.col("score"), round_decimals))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    ranked = (
        agg.select("qid", "docid", "score")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    return (
        F.broadcast(ranked)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .select("qid", "docid", "pid", "score", "rank")
    )


def top_k(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    round_decimals: int | None = None,
) -> DataFrame:
    """Top-k (docid, pid, score) for a query string, rank-identical to
    the reference's DAAT semantics. Returns an empty DataFrame when no
    term matches (reference returns null, cli prints nothing).

    ``round_decimals`` rounds the score BEFORE the order-by/limit — used
    by cross-engine oracles so that tie-breaking (score DESC, docid ASC)
    is decided on the same rounded values both sides."""
    stem_stop = index.manifest["flags"]["stem_stop"]
    terms = query_terms(text, stem_stop)
    return top_k_terms(index, terms, k, conjunctive, scoring, round_decimals)


def _resolve_idf(index: InvertedIndex, terms: list[str]) -> dict[str, float]:
    """Lexicon point lookup: <= |q| rows (Vocabulary.getEntry; parquet
    min/max pruning plays the binary-search role). A warmed index
    answers from the driver-side lexicon memo with zero Spark jobs."""
    lmap = getattr(index, "lexicon_map", None)
    if lmap is not None:
        return {t: lmap[t]["idf"] for t in terms if t in lmap}
    lex_rows = (
        index.lexicon.filter(F.col("term").isin(terms))
        .select("term", "idf")
        .collect()
    )
    return {r["term"]: r["idf"] for r in lex_rows}


def _content_agg(
    index: InvertedIndex,
    present: list[str],
    idf_by_term: dict[str, float],
    scoring: str,
) -> DataFrame:
    """(docid, score UNROUNDED, n_terms): per-doc partial-score fold in
    query-term order. DAAT sums a doc's partials in query-term order
    (DAAT.java:139-162); float addition is not associative, so fold an
    ordered array rather than F.sum (whose order is shuffle-dependent)
    for bit-exact parity. idf and term position are injected as
    literal maps — no lexicon join in the hot path."""
    stats = index.stats
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    idf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, float(idf_by_term[t]))]
    )
    pos_map = F.create_map(
        *[F.lit(x) for i, t in enumerate(present) for x in (t, i)]
    )
    postings = index.postings.filter(F.col("term").isin(present))
    scored = postings.select(
        "docid",
        pos_map[F.col("term")].alias("term_idx"),
        score_col(scoring, idf_map[F.col("term")], avgdl).alias("partial"),
    )
    return scored.groupBy("docid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term_idx", "partial"))),
            F.lit(0.0),
            lambda acc, x: acc + x["partial"],
        ).alias("score"),
        F.count("*").alias("n_terms"),
    )


def top_k_terms(
    index: InvertedIndex,
    terms: list[str],
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    round_decimals: int | None = None,
) -> DataFrame:
    """``top_k`` over an ALREADY-ANALYZED, order-preserving-deduped term
    list (the partial-score fold order IS this list's order). Used by
    ``top_k`` after the analysis chain and by pseudo-relevance-feedback
    expansion, whose expansion terms are index terms — re-running the
    analysis chain on them could re-stem or re-clean them."""
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, pid string, score double")
    if not terms:
        return empty
    idf_by_term = _resolve_idf(index, terms)
    missing = [t for t in terms if t not in idf_by_term]
    if conjunctive and missing:
        return empty  # conjunctive short-circuit (QueryProcesser.java:61-67)
    present = [t for t in terms if t in idf_by_term]
    if not present:
        return empty
    agg = _content_agg(index, present, idf_by_term, scoring)
    if conjunctive:
        agg = agg.filter(F.col("n_terms") == len(present))
    if round_decimals is not None:
        agg = agg.withColumn("score", F.round(F.col("score"), round_decimals))
    topk = (
        agg.select("docid", "score")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )
    # pid lookup (J7): broadcast the k rows against doc_stats. The
    # final order is restored with coalesce(1)+local sort — k rows; a
    # global orderBy here would cost a RangePartitioner sampling job +
    # shuffle per query (~200ms measured) for nothing.
    return (
        F.broadcast(topk)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .select("docid", "pid", "score")
        .coalesce(1)
        .sortWithinPartitions(F.col("score").desc(), F.col("docid").asc())
    )


def prf_top_k(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    scoring: str = "bm25",
    round_decimals: int | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971 /
    RM-family, see IIR ch. 9): run the query, treat the top ``fb_docs``
    results as relevant, add the ``fb_terms`` strongest terms from
    those documents to the query, and re-run.

    Expansion-term weight = the TF-IDF mass of the term inside the
    feedback set: fold of idf * (1 + log10 tf) over the feedback docs
    in DOCID ORDER (float addition is not associative — the ordered
    fold keeps the weight, and therefore the selected terms and their
    order, bit-reproducible across engines). Original query terms are
    excluded; ties break term-ascending; expansion terms append AFTER
    the original terms, so the final score fold order is (original
    query order, then expansion-weight order) — deterministic.

    Driver traffic: fb_docs + fb_terms rows (same class as the k-row
    result collects); both passes are the ordinary top-k plan."""
    stem_stop = index.manifest["flags"]["stem_stop"]
    orig = query_terms(text, stem_stop)
    first = top_k(
        index, text, k=fb_docs, scoring=scoring, round_decimals=round_decimals
    )
    fb_ids = [r["docid"] for r in first.collect()]
    if not fb_ids:
        return first
    cand = index.postings.filter(
        F.col("docid").isin(fb_ids) & ~F.col("term").isin(orig)
    ).join(index.lexicon.select("term", "idf"), "term")
    w = (F.col("idf") * (F.lit(1.0) + F.log10(F.col("tf").cast("double")))).alias(
        "w"
    )
    weights = (
        cand.select("term", "docid", w)
        .groupBy("term")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("docid", "w"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["w"],
                ),
                9,
            ).alias("fb_score")
        )
    )
    expansion = [
        r["term"]
        for r in weights.orderBy(
            F.col("fb_score").desc(), F.col("term").asc()
        )
        .limit(fb_terms)
        .collect()
    ]
    return top_k_terms(
        index, orig + expansion, k=k, conjunctive=False, scoring=scoring,
        round_decimals=round_decimals,
    )


def prf_topk_rows(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    scoring: str = "bm25",
    round_decimals: int | None = None,
    fetch_budget: int | None = None,
) -> list[tuple[int, str, float]]:
    """Warm PRF: ``prf_top_k`` as plain (docid, pid, score) rows —
    both retrieval passes run through the warm MaxScore kernel (zero
    Spark jobs on a warmed index; the expanded re-run enters via the
    pre-analyzed ``terms`` bypass, the warm twin of ``top_k_terms``),
    and the only other work is the feedback scan, served from a
    docid-keyed FORWARD-VECTOR LRU (the doc-major twin of the term-
    keyed posting LRUs — PRF asks "which terms are in this doc", which
    a term-major cache cannot answer without scanning the vocabulary):
    missing feedback docs' (term, tf, idf) vectors are fetched with
    ONE In(docid) scan, so a repeat or overlapping PRF query costs
    zero Spark jobs. The expansion weights are folded DRIVER-SIDE with
    the exact relational semantics — per-term docid-ordered float
    accumulation of ``idf * (1 + log10 tf)``, HALF_UP-rounded at 9
    decimals the way Spark's ``F.round`` rounds doubles (shortest-repr
    decimal, ROUND_HALF_UP), ties term-ascending, expansion appended
    after the original terms — so the selected expansion set and the
    final ranking are identical to the relational plan (pytest-pinned).

    Scale posture: the cold fetch volume (Σ postings rows over the
    missing feedback documents) is COUNTED before it moves (one scalar
    job, the field-LRU pattern); past the budget the whole composition
    delegates to the fully-distributed ``prf_top_k``.

    Parity caveat (shared with the whole warm surface): identical
    expansion selection relies on numpy's libm ``log10`` and float
    summation agreeing bit-for-bit with the JVM's, and on ``repr``
    matching Java 17's ``Double.toString`` at the exact 1e-9 HALF_UP
    boundary — a 1-ulp divergence on a near-tied candidate term could
    flip the pick. No such divergence is observed on this platform
    (the equality tests pin both paths end-to-end); a deployment that
    cannot tolerate even the theoretical edge should serve PRF through
    the relational ``prf_top_k``."""
    import numpy as np

    from .maxscore import (
        FetchOverBudget,
        _default_fetch_budget,
        _ensure_lru,
        maxscore_topk_rows,
    )

    stem_stop = index.manifest["flags"]["stem_stop"]
    orig = query_terms(text, stem_stop)
    first = maxscore_topk_rows(
        index, text, k=fb_docs, scoring=scoring,
        round_decimals=round_decimals, fetch_budget=fetch_budget,
    )
    if not first:
        return first
    fb_ids = [int(d) for d, _, _ in first]
    if fetch_budget is None:
        fetch_budget = _default_fetch_budget(index.spark)

    def fetch(missing):
        frame = index.postings.filter(F.col("docid").isin(missing))
        if frame.count() > fetch_budget:
            raise FetchOverBudget
        return (
            frame.join(index.lexicon.select("term", "idf"), "term")
            .select("docid", "term", "tf", "idf")
            .toPandas()
        )

    def build(sub):
        return (
            sub["term"].to_numpy(),
            sub["tf"].to_numpy(np.float64),
            sub["idf"].to_numpy(np.float64),
        )

    try:
        lru = _ensure_lru(index, "_fwd_lru", fb_ids, fetch, build,
                          key="docid", sort="term")
    except FetchOverBudget:
        df = prf_top_k(
            index, text, k=k, fb_docs=fb_docs, fb_terms=fb_terms,
            scoring=scoring, round_decimals=round_decimals,
        )
        return [(r["docid"], r["pid"], r["score"]) for r in df.collect()]
    # assemble (term, docid, w) triples from the cached doc vectors and
    # fold per term in docid-ASC order — the relational plan's exact
    # accumulation order (terms are distinct within a doc vector)
    terms_all = np.concatenate([lru[d][0] for d in fb_ids])
    tfs_all = np.concatenate([lru[d][1] for d in fb_ids])
    idfs_all = np.concatenate([lru[d][2] for d in fb_ids])
    docs_all = np.concatenate(
        [np.full(len(lru[d][0]), d, np.int64) for d in fb_ids]
    )
    keep = ~np.isin(terms_all, orig)
    order = np.lexsort((docs_all[keep], terms_all[keep]))
    terms_arr = terms_all[keep][order]
    from decimal import ROUND_HALF_UP, Decimal

    w = idfs_all[keep][order] * (
        1.0 + np.log10(tfs_all[keep][order])
    )
    fb_scores: dict[str, float] = {}
    start = 0
    for t, grp_end in _group_ends(terms_arr):
        acc = 0.0
        for x in w[start:grp_end]:
            acc += float(x)  # docid-ordered fold, like the array fold
        # Spark's F.round on a double: BigDecimal.valueOf (shortest
        # decimal repr) then HALF_UP — repr() is the same shortest repr
        fb_scores[t] = float(
            Decimal(repr(acc)).quantize(
                Decimal("1e-9"), rounding=ROUND_HALF_UP
            )
        )
        start = grp_end
    expansion = [
        t
        for t, _ in sorted(
            fb_scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[:fb_terms]
    ]
    return maxscore_topk_rows(
        index, text, k=k, scoring=scoring, round_decimals=round_decimals,
        fetch_budget=fetch_budget, terms=orig + expansion,
    )


def _group_ends(sorted_arr):
    """(value, end_index) pairs of each run in a sorted array."""
    import numpy as np

    if len(sorted_arr) == 0:
        return
    bounds = np.nonzero(sorted_arr[1:] != sorted_arr[:-1])[0] + 1
    start = 0
    for b in list(bounds) + [len(sorted_arr)]:
        yield sorted_arr[start], int(b)
        start = int(b)


def fielded_top_k(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    boost_weight: float = 1.0,
    scoring: str = "bm25",
    round_decimals: int | None = None,
) -> DataFrame:
    """Fielded code search: content BM25 plus a FILENAME-FIELD boost —
    a query term appearing in the document's path contributes
    ``boost_weight * idf(term)`` on top of the content score (the
    classic fielded/BM25F intuition specialized to the code table,
    where pid = repo/path@commit and filename hits are strong
    relevance signals; Robertson, Zaragoza & Taylor CIKM 2004).

    final = round(content_score + boost_weight * boost, round_decimals)
    with boost = sum over query terms (in query order) of idf(t) when
    t appears among the pid's path tokens (pid split on [/@.]).
    Disjunctive only (a path hit must not resurrect a conjunctive
    miss). The per-term zero contributions of a literal chain drop out
    exactly (x + 0.0 == x in IEEE-754 for the non-negative idf
    partials), so the ordered fold over present-in-path terms is
    bit-identical to the chain the oracle computes.

    Served from FIELD POSTINGS (the BM25F materialized layout): boost
    rows come from ``index.field_postings`` (persisted build stage 7,
    term-pushdown scan) when the index was built with fields=True,
    else from the same narrow doc_stats projection computed on the
    fly. Either way the boost join is sized by the per-term field
    posting lists (|q| short lists), and the pid lookup happens AFTER
    the limit on k rows like top_k — never a match-set-sized
    doc_stats join before ranking."""
    terms = query_terms(text, index.manifest["flags"]["stem_stop"])
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, pid string, score double")
    if not terms:
        return empty
    idf_by_term = _resolve_idf(index, terms)
    present = [t for t in terms if t in idf_by_term]
    if not present:
        return empty
    agg = _content_agg(index, present, idf_by_term, scoring)
    if index.manifest.get("flags", {}).get("fields", False):
        fp = index.field_postings
    else:
        from .indexer import field_postings_frame

        fp = field_postings_frame(index.doc_stats)
    idf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, float(idf_by_term[t]))]
    )
    pos_map = F.create_map(
        *[F.lit(x) for i, t in enumerate(present) for x in (t, i)]
    )
    fb = fp.filter(F.col("term").isin(present)).select(
        "docid",
        pos_map[F.col("term")].alias("term_idx"),
        idf_map[F.col("term")].alias("b"),
    )
    boost = fb.groupBy("docid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term_idx", "b"))),
            F.lit(0.0),
            lambda acc, x: acc + x["b"],
        ).alias("boost")
    )
    scored = (
        agg.select("docid", "score")
        .join(boost, "docid", "left")
        .withColumn(
            "score",
            F.col("score")
            + F.lit(float(boost_weight))
            * F.coalesce(F.col("boost"), F.lit(0.0)),
        )
    )
    if round_decimals is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score"), round_decimals)
        )
    topk = (
        scored.select("docid", "score")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )
    # INNER broadcast join, relying on the build invariant that every
    # docid in postings/field_postings exists in doc_stats (all three
    # are projections of the same stage-1 output, batch and streamed
    # alike), so the join can never shrink the page below k. A LEFT
    # join would preserve slots on a corrupted index, but Spark cannot
    # broadcast the preserved side of a left outer join — the hint
    # drops and the k-row lookup degrades to a full doc_stats shuffle,
    # the wrong trade at 100 TB. (search_with_snippets' LEFT join is
    # different: it runs on the already-collected O(k) rows, where
    # retention is free.)
    return (
        F.broadcast(topk)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .select("docid", "pid", "score")
        .coalesce(1)
        .sortWithinPartitions(F.col("score").desc(), F.col("docid").asc())
    )


def _avg_field_len(index: InvertedIndex) -> float:
    """Average filename-field length (non-empty pid path tokens per
    doc) — the per-field avg-length input of the Robertson BM25F
    normalizer. Prefers the stat the build recorded in the manifest
    (stage 7); else computes it once from doc_stats and memoizes on
    the index object (serving warms it exactly once)."""
    stats = index.stats if isinstance(index.stats, dict) else {}
    # presence check, not truthiness: a recorded avg_field_len of 0.0
    # (every pid tokenizes to empty) is a valid stat, not a missing one
    if stats.get("avg_field_len") is not None:
        return float(stats["avg_field_len"])
    cached = getattr(index, "_avg_field_len_memo", None)
    if cached is not None:
        return cached
    from .indexer import avg_field_len_of

    out = avg_field_len_of(index.doc_stats)
    try:
        index._avg_field_len_memo = out
    except AttributeError:
        pass
    return out


def bm25f_top_k(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    w_content: float = 1.0,
    w_path: float = 2.0,
    b_content: float = B,
    b_path: float = B,
    k1: float = K1,
    round_decimals: int | None = None,
) -> DataFrame:
    """TRUE multi-field BM25F (Robertson, Zaragoza & Taylor, CIKM 2004;
    the "simple BM25F" with per-field length normalization and a single
    shared saturation) over two fields of the code table — content
    tokens and filename-path tokens:

        tfn_f  = tf_f / ((1 - b_f) + b_f * len_f / avglen_f)
        tft    = w_content * tfn_content + w_path * tfn_path
        score  = sum over query terms (query order) of
                 idf(t) * tft / (k1 + tft)

    This is the full model ``fielded_top_k``'s presence boost
    approximates: that operator stays as the cheap degenerate form (a
    path HIT contributes a constant idf), while this one normalizes
    per-field tf against per-field length with field weights — a term
    that IS the filename outweighs one buried in a long path, and a
    path-only match enters the candidate set (the boost form cannot
    admit it).

    Plan shape: two per-term In-pushdown scans (postings/ and
    field_postings/ — both (term, docid) range-sorted), a full outer
    merge on (term, docid) sized by the query terms' lists, ordered
    fold per doc, top-k, then the k-row broadcast pid join. idf and
    term order are literal maps; avgdl/avg_field_len are scalars (the
    field one memoized/manifest-sourced) — no lexicon or doc_stats
    join before the limit. Disjunctive only, like ``fielded_top_k``.
    Oracle-exact vs DuckDB through the extended ``code_search_fielded``
    gate."""
    terms = query_terms(text, index.manifest["flags"]["stem_stop"])
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, pid string, score double")
    if not terms:
        return empty
    idf_by_term = _resolve_idf(index, terms)
    present = [t for t in terms if t in idf_by_term]
    if not present:
        return empty
    stats = index.stats
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    avgfl = _avg_field_len(index)
    idf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, float(idf_by_term[t]))]
    )
    pos_map = F.create_map(
        *[F.lit(x) for i, t in enumerate(present) for x in (t, i)]
    )
    content = index.postings.filter(F.col("term").isin(present)).select(
        "term", "docid", F.col("tf").alias("ctf"), "doc_len"
    )
    fp = (
        index.field_postings
        if index.manifest.get("flags", {}).get("fields", False)
        else None
    )
    if fp is None or "tf" not in fp.columns:
        # no persisted field layout, or a pre-round-5 presence-only one:
        # derive the (term, docid, tf, field_len) frame from doc_stats
        from .indexer import field_postings_frame

        fp = field_postings_frame(index.doc_stats)
    path = fp.filter(F.col("term").isin(present)).select(
        "term", "docid", F.col("tf").alias("ptf"), "field_len"
    )
    both = content.join(path, ["term", "docid"], "full")
    tfn_c = F.when(F.col("ctf").isNull(), F.lit(0.0)).otherwise(
        F.col("ctf").cast("double")
        / (
            F.lit(1.0 - b_content)
            + F.lit(b_content)
            * F.col("doc_len").cast("double")
            / F.lit(avgdl)
        )
    )
    tfn_p = F.when(F.col("ptf").isNull(), F.lit(0.0)).otherwise(
        F.col("ptf").cast("double")
        / (
            F.lit(1.0 - b_path)
            + F.lit(b_path)
            * F.col("field_len").cast("double")
            / F.lit(avgfl)
        )
    )
    tft = F.lit(w_content) * tfn_c + F.lit(w_path) * tfn_p
    scored = both.select(
        "docid",
        pos_map[F.col("term")].alias("term_idx"),
        (idf_map[F.col("term")] * tft / (F.lit(k1) + tft)).alias("partial"),
    )
    agg = scored.groupBy("docid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term_idx", "partial"))),
            F.lit(0.0),
            lambda acc, x: acc + x["partial"],
        ).alias("score")
    )
    if round_decimals is not None:
        agg = agg.withColumn("score", F.round(F.col("score"), round_decimals))
    topk = (
        agg.select("docid", "score")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )
    return (
        F.broadcast(topk)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .select("docid", "pid", "score")
        .coalesce(1)
        .sortWithinPartitions(F.col("score").desc(), F.col("docid").asc())
    )


def bm25f_topk_rows(
    index: InvertedIndex,
    text: str,
    k: int = 10,
    w_content: float = 1.0,
    w_path: float = 2.0,
    b_content: float = B,
    b_path: float = B,
    k1: float = K1,
    round_decimals: int | None = None,
    fetch_budget: int | None = None,
) -> list[tuple[int, str, float]]:
    """Warm fielded serving: ``bm25f_top_k`` as plain (docid, pid,
    score) rows with ZERO Spark jobs on a warmed index — the same
    interactive posture as ``maxscore_topk_rows``, extended to the
    full Robertson model. Per-term content arrays come from the shared
    postings LRU; per-term filename-field arrays from a second LRU
    with the identical 1000-entry eviction; the per-term BM25F score
    array is the union-docid merge of the two fields (numpy
    searchsorted scatter — same per-row arithmetic and operand order
    as the relational plan), and per-doc accumulation in query-term
    order plus score DESC / docid ASC top-k reuse the vectorized DAAT
    kernel, so the result is rank-identical to ``bm25f_top_k``
    (pytest-pinned).

    Scale posture: the lexicon df-guard rejects a fetch whose content
    side alone exceeds the driver budget, and the field side — whose
    df the lexicon does not know — is COUNTED first (one scalar job)
    whenever any term is field-LRU-cold; either overrun delegates to
    the fully-distributed ``bm25f_top_k``. Nothing larger than the
    budget is ever moved to the driver."""
    from .maxscore import (
        FetchOverBudget,
        _daat_vec_slice,
        _default_fetch_budget,
        _ensure_lru,
        _ensure_postings_arrays,
    )

    spark = index.spark
    terms = query_terms(text, index.manifest["flags"]["stem_stop"])
    if not terms:
        return []

    def _fallback() -> list[tuple[int, str, float]]:
        df = bm25f_top_k(
            index, text, k=k, w_content=w_content, w_path=w_path,
            b_content=b_content, b_path=b_path, k1=k1,
            round_decimals=round_decimals,
        )
        return [(r["docid"], r["pid"], r["score"]) for r in df.collect()]

    lmap = getattr(index, "lexicon_map", None)
    if lmap is not None:
        by_term = {t: lmap[t] for t in terms if t in lmap}
    else:
        by_term = {
            r["term"]: r
            for r in index.lexicon.filter(F.col("term").isin(terms))
            .select("term", "df", "idf")
            .collect()
        }
    present = [t for t in terms if t in by_term]
    if not present:
        return []
    if fetch_budget is None:
        fetch_budget = _default_fetch_budget(spark)
    content_df = sum(int(by_term[t]["df"]) for t in present)
    if content_df > fetch_budget:
        return _fallback()

    # filename-field arrays (docids, tfs, field_lens) — second LRU
    def fetch_fields(to_fetch):
        fp = (
            index.field_postings
            if index.manifest.get("flags", {}).get("fields", False)
            else None
        )
        if fp is None or "tf" not in fp.columns:
            from .indexer import field_postings_frame

            fp = field_postings_frame(index.doc_stats)
        fp = fp.filter(F.col("term").isin(to_fetch)).select(
            "term", "docid", "tf", "field_len"
        )
        # the lexicon knows nothing about field dfs: count before
        # moving anything (a scalar job), honoring the fetch budget
        if content_df + fp.count() > fetch_budget:
            raise FetchOverBudget
        return fp.toPandas()

    def build_fields(sub):
        return (
            sub["docid"].to_numpy(np.int64),
            sub["tf"].to_numpy(),
            sub["field_len"].to_numpy(),
        )

    try:
        flru = _ensure_lru(
            index, "_field_postings_lru", present, fetch_fields, build_fields
        )
    except FetchOverBudget:
        return _fallback()

    lru = _ensure_postings_arrays(index, present)
    stats = index.stats
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    avgfl = _avg_field_len(index)

    lists = []
    for i, t in enumerate(present):
        cd, ctf, cdl = lru[t]  # recency already refreshed by _ensure_lru
        fd, ftf, ffl = flru[t]
        u = np.union1d(cd, fd)
        if len(u) == 0:
            continue
        # tft = w_content * tfn_content + w_path * tfn_path, built in
        # the relational plan's operand order (content part first)
        tft = np.zeros(len(u), dtype=np.float64)
        if len(cd):
            tft[np.searchsorted(u, cd)] = w_content * (
                ctf.astype(np.float64)
                / ((1.0 - b_content)
                   + b_content * cdl.astype(np.float64) / avgdl)
            )
        if len(fd):
            pos = np.searchsorted(u, fd)
            tft[pos] = tft[pos] + w_path * (
                ftf.astype(np.float64)
                / ((1.0 - b_path)
                   + b_path * ffl.astype(np.float64) / avgfl)
            )
        idf = float(by_term[t]["idf"])
        lists.append(
            {"docids": u, "scores": idf * tft / (k1 + tft), "qpos": i}
        )
    if not lists:
        return []
    top = _daat_vec_slice(
        lists, 0, 1 << 62, k, False, round_decimals
    )
    pid_map = getattr(index, "pid_map", None)
    if pid_map is not None:
        return [(int(d), pid_map[int(d)], float(s)) for s, d in top]
    if not top:
        return []
    hits = spark.createDataFrame(
        [(int(d),) for _, d in top], "docid long"
    )
    resolved = {
        r["docid"]: r["pid"]
        for r in F.broadcast(hits)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .collect()
    }
    return [(int(d), resolved[int(d)], float(s)) for s, d in top]
