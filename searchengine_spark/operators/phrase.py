"""Positional index + exact phrase search.

Beyond-reference extension (the reference's postings carry no
positions): a positional posting table and an exact-phrase matcher,
the operator a training-data pipeline uses for exact n-gram
containment checks ("does this boilerplate sentence appear verbatim?")
and classic phrase retrieval.

* ``positions_frame``  — (term, docid, doc_len, tf, positions) where
  ``positions`` is the sorted 0-based token offsets of the term in the
  ANALYZED token sequence (Lucene-style: positions index the
  post-analysis stream). Built by the narrow per-row run-length plan
  (frames.exploded_term_positions — no shuffle). The PERSISTED
  twin is the build's stage 6 (indexer.build_index positions=True):
  identical rows, written (term, docid)-range-partitioned so a phrase
  query's per-term reads are term-pushdown contiguous scans, and
  ``InvertedIndex.positions`` serves them with NO corpus re-analysis.
* ``phrase_search``    — docs containing the query terms as a
  CONSECUTIVE phrase, ranked by phrase frequency. Matching is pure
  JVM array math: join every term's position array onto the RAREST
  term's rows by docid (df ascending when a lexicon is supplied —
  intermediates are bounded by the rarest list, so a phrase starting
  with a boilerplate term no longer drags the largest list through
  every join), then one ``filter(p_anchor, y ->
  array_contains(p_i, y - anchor + i) ...)`` — the classic positional
  intersection, no Python, no explode of positions.

Scale notes: the docid equi-joins let Catalyst/AQE pick broadcast vs
shuffle per term; with rarest-first ordering the anchor side is the
smallest list by construction rather than by AQE's runtime estimate.
A phrase containing only boilerplate terms degrades to a large
equi-join, never a cross join. Position arrays add ~1 int per token
to the index — the standard positional-index cost
(Manning/Raghavan/Schütze, IIR ch. 2.4).
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
    from .frames import exploded_term_positions

    # narrow run-length plan — no shuffle (a (term, docid) group never
    # spans rows); see frames.exploded_term_positions
    return exploded_term_positions(doc_tokens, ["docid", "doc_len"]).select(
        "term", "docid", "doc_len", "tf", "positions"
    )


def _phrase_join_order(terms: list[str], dfs: dict[str, int]) -> list[int]:
    """Join order over term indices: document frequency ascending, the
    original index as the deterministic tie-break. The first element is
    the ANCHOR — the rarest term's posting list bounds every
    intermediate join result."""
    return sorted(range(len(terms)), key=lambda i: (dfs[terms[i]], i))


# Minimum total query-term posting volume (sum of dfs) before the
# conjunctive docid prefilter pays for its extra narrow shuffle: below
# it, decoding the per-term lists outright is cheaper than the
# groupBy-count round trip (measured at sf0.1: prefilter ~1.4 s vs
# direct ~1.0 s on 6k postings; at web scale a stopword-ish term's
# millions of position arrays dominate and the prefilter wins).
PREFILTER_MIN_POSTINGS = 262_144


def phrase_search(
    positions: DataFrame,
    terms: list[str],
    k: int = 10,
    lexicon: DataFrame | None = None,
    dfs: dict[str, int] | None = None,
) -> DataFrame:
    """Top-k (docid, phrase_tf) for an exact consecutive phrase.

    ``terms`` is the analyzed query token sequence IN ORDER (duplicates
    meaningful — "buffalo buffalo" is a real phrase query). A doc
    matches where positions(t_i) contains x+i for every i at some
    start x; phrase_tf = number of such x. Rank: phrase_tf DESC,
    docid ASC.

    When ``lexicon`` is given, joins run RAREST-FIRST (per-term df
    ascending): the anchor list is the rarest term's, every subsequent
    equi-join is bounded by it, and the containment predicate shifts
    offsets relative to the anchor's phrase position — semantics are
    identical to query order (occurrence starts are in bijection with
    anchor positions). A query term absent from the lexicon
    short-circuits to the empty result without any join (P10's
    missing-term rule, applied to phrases)."""
    if not terms:
        raise ValueError("empty phrase")
    spark = positions.sparkSession
    order = list(range(len(terms)))
    if lexicon is not None or dfs is not None:
        uniq = list(dict.fromkeys(terms))
        if dfs is None:
            dfs = {
                r["term"]: int(r["df"])
                for r in lexicon.filter(F.col("term").isin(uniq))
                .select("term", "df")
                .collect()
            }
        if any(t not in dfs for t in uniq):  # missing term -> no match
            return spark.createDataFrame([], "docid long, phrase_tf long")
        order = _phrase_join_order(terms, dfs)
    anchor = order[0]
    cur = (
        positions.filter(F.col("term") == terms[anchor])
        .select("docid", F.col("positions").alias(f"p{anchor}"))
    )
    for i in order[1:]:
        side = (
            positions.filter(F.col("term") == terms[i])
            .select("docid", F.col("positions").alias(f"p{i}"))
        )
        cur = cur.join(side, "docid")

    def contains_shifted(pi, delta):
        def pred(y):
            return F.array_contains(pi, y + delta)

        return pred

    # anchor positions y correspond to phrase starts x = y - anchor;
    # term i must appear at x + i = y + (i - anchor)
    match = F.col(f"p{anchor}")
    for i in order[1:]:
        match = F.filter(match, contains_shifted(F.col(f"p{i}"), i - anchor))
    return (
        cur.select("docid", F.size(match).cast("long").alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
        .orderBy(F.col("phrase_tf").desc(), F.col("docid").asc())
        .limit(k)
    )


def _served_positions(
    index, terms: list[str], conjunctive: bool = False
) -> DataFrame:
    """Positional postings restricted to ``terms`` for serving. On a
    compressed index the In(term) filter lands on the PACKED parquet
    scan BEFORE the Arrow decode — filtering ``index.positions`` would
    sit above the mapInPandas barrier and decode the whole corpus.

    ``conjunctive=True`` (phrase/proximity: a match needs EVERY query
    term in the doc) additionally intersects the per-term docid sets
    on the PACKED table before decoding: ``docid`` is a plain parquet
    column, so the |terms|-way membership test is a narrow
    groupBy-count over (term, docid) rows that never touches the
    position bytes, and only docs that can possibly match pay the
    gap-VB decode. For a phrase mixing one rare and one stopword-ish
    term this cuts the decode from the stopword's full posting list to
    the intersection — the dominant cost at corpus scale, where
    position arrays are ~doc-length integers per posting. Disjunctive
    consumers (snippets: ANY term matches) must keep the default."""
    flags = index.manifest.get("flags", {}) if hasattr(index, "manifest") else {}
    uniq = list(dict.fromkeys(terms))
    if flags.get("positions_packed", False):
        from .indexer import unpack_positions

        packed = index.positions_packed.filter(F.col("term").isin(uniq))
        if conjunctive and len(uniq) > 1:
            cand = (
                packed.select("term", "docid")
                .groupBy("docid")
                .agg(F.count_distinct("term").alias("_nt"))
                .filter(F.col("_nt") == len(uniq))
                .select("docid")
            )
            packed = packed.join(cand, "docid")
        return unpack_positions(packed)
    return index.positions.filter(F.col("term").isin(uniq))


def _query_dfs(index, uniq: list[str]) -> dict[str, int]:
    """Per-term document frequencies for a query — ONE ≤|q|-row
    lexicon collect shared by join ordering, the missing-term
    short-circuit, and the prefilter cost decision."""
    return {
        r["term"]: int(r["df"])
        for r in index.lexicon.filter(F.col("term").isin(uniq))
        .select("term", "df")
        .collect()
    }


def _decide_prefilter(
    dfs: dict[str, int], uniq: list[str], prefilter: bool | None
) -> bool:
    """Cost-based switch for the conjunctive decode prefilter: pay its
    extra narrow shuffle only when the total posting volume to decode
    is large (``PREFILTER_MIN_POSTINGS``); ``prefilter`` forces either
    path."""
    if prefilter is not None:
        return prefilter
    return (
        len(uniq) > 1
        and sum(dfs[t] for t in uniq) >= PREFILTER_MIN_POSTINGS
    )


def phrase_search_indexed(
    index, terms: list[str], k: int = 10, prefilter: bool | None = None
) -> DataFrame:
    """Phrase search served from a PERSISTED positional index
    (indexer stage 6): reads ``index.positions`` — no re-tokenization,
    term-pushdown scans (pushed below the gap-VB decode on compressed
    indexes) — and orders the joins rarest-first from the index's
    lexicon. On a packed index with a large query posting volume the
    per-term docid sets intersect BEFORE the decode (see
    ``_served_positions``); the threshold keeps short queries on the
    direct path where the prefilter's shuffle costs more than it
    saves."""
    if not terms:
        raise ValueError("empty phrase")
    uniq = list(dict.fromkeys(terms))
    dfs = _query_dfs(index, uniq)
    if any(t not in dfs for t in uniq):
        return index.lexicon.sparkSession.createDataFrame(
            [], "docid long, phrase_tf long"
        )
    return phrase_search(
        _served_positions(
            index, terms, conjunctive=_decide_prefilter(dfs, uniq, prefilter)
        ),
        terms,
        k=k,
        dfs=dfs,
    )


def proximity_search(
    positions: DataFrame,
    terms: list[str],
    window: int = 8,
    k: int = 10,
    lexicon: DataFrame | None = None,
    dfs: dict[str, int] | None = None,
) -> DataFrame:
    """Top-k (docid, prox_tf) unordered proximity match (Lucene sloppy
    / INQUERY #uw-style): ``prox_tf`` counts the occurrences y of the
    FIRST query term such that every other term occurs within
    ``window`` tokens of y (|p - y| <= window, either side). Anchoring
    on the first term (not the rarest) keeps the semantics a pure
    function of (terms, window), independent of corpus statistics;
    rank prox_tf DESC, docid ASC.

    Duplicate query terms collapse — proximity is co-occurrence, not
    sequence. Join ORDER is still rarest-first when a lexicon is given
    (docid equi-joins commute; intermediates stay bounded by the
    rarest list while the predicate anchors on terms[0]); a term
    missing from the lexicon short-circuits to empty (P10 applied to
    proximity). Same narrow positional plan as phrase_search: per-term
    pushdown scans, JVM array predicates, no explode of positions."""
    if not terms:
        raise ValueError("empty proximity query")
    if window < 0:
        raise ValueError("window must be >= 0")
    uniq = list(dict.fromkeys(terms))
    spark = positions.sparkSession
    order = list(range(len(uniq)))
    if lexicon is not None or dfs is not None:
        if dfs is None:
            dfs = {
                r["term"]: int(r["df"])
                for r in lexicon.filter(F.col("term").isin(uniq))
                .select("term", "df")
                .collect()
            }
        if any(t not in dfs for t in uniq):
            return spark.createDataFrame([], "docid long, prox_tf long")
        order = _phrase_join_order(uniq, dfs)
    cur = None
    for i in order:
        side = positions.filter(F.col("term") == uniq[i]).select(
            "docid", F.col("positions").alias(f"p{i}")
        )
        cur = side if cur is None else cur.join(side, "docid")

    def within(pi):
        def pred(y):
            return F.exists(pi, lambda p: F.abs(p - y) <= F.lit(window))

        return pred

    match = F.col("p0")
    for i in range(1, len(uniq)):
        match = F.filter(match, within(F.col(f"p{i}")))
    return (
        cur.select("docid", F.size(match).cast("long").alias("prox_tf"))
        .filter(F.col("prox_tf") > 0)
        .orderBy(F.col("prox_tf").desc(), F.col("docid").asc())
        .limit(k)
    )


def proximity_search_indexed(
    index,
    terms: list[str],
    window: int = 8,
    k: int = 10,
    prefilter: bool | None = None,
) -> DataFrame:
    """Proximity search served from the persisted positional index;
    same cost-based conjunctive decode prefilter as
    :func:`phrase_search_indexed`."""
    if not terms:
        raise ValueError("empty proximity query")
    uniq = list(dict.fromkeys(terms))
    dfs = _query_dfs(index, uniq)
    if any(t not in dfs for t in uniq):
        return index.lexicon.sparkSession.createDataFrame(
            [], "docid long, prox_tf long"
        )
    return proximity_search(
        _served_positions(
            index, terms, conjunctive=_decide_prefilter(dfs, uniq, prefilter)
        ),
        terms,
        window=window,
        k=k,
        dfs=dfs,
    )


# warm positional kernels address occurrences by the composite key
# (docid << 32) | position, so a docid or position at or above 2^31
# cannot be encoded (the key would overflow int64) — such terms get a
# None LRU entry and the kernels delegate to the distributed plan
_KEY_SHIFT = 32

# sentinel: pid absent from the docstore (distinct from a present row
# whose NULL content renders a NULL snippet)
_MISSING_DOC = object()
_KEY_SAFE = 1 << 31


def _ensure_positions_arrays(index, uniq: list[str]):
    """Ensure every term's positional postings sit in the index's
    per-term positions LRU in flat composite-key form
    ``(docids sorted int64, per-doc counts, per-doc offsets, keys)``
    where ``keys[offs[i]:offs[i]+counts[i]]`` are docid ``docids[i]``'s
    occurrences encoded as ``(docid << 32) | position`` — globally
    sorted, so occurrence membership and interval tests over the WHOLE
    term are single ``searchsorted`` calls (no per-document Python
    iteration). Missing terms are fetched with ONE term-pushdown scan
    (pushed below the gap-VB decode on packed indexes via
    ``_served_positions``); the LRU is the positional twin of the
    content-postings LRU (1000-entry eviction, Vocabulary.java:17's
    cache posture). Entries hold FULL per-term lists (never a
    query-dependent intersection) so any later query can reuse them;
    a term whose docids or positions exceed the encodable 2^31 bound
    is stored as ``None`` and served relationally."""
    import numpy as np

    from .maxscore import _ensure_lru

    def fetch(to_fetch):
        return (
            _served_positions(index, to_fetch)
            .select("term", "docid", "positions")
            .toPandas()
        )

    def build(sub):
        return _flat_entry(
            sub["docid"].to_numpy(np.int64),
            [np.asarray(p, dtype=np.int64) for p in sub["positions"]],
        )

    return _ensure_lru(index, "_positions_lru", uniq, fetch, build)


def _flat_entry(docids, plists):
    """Build one positions-LRU entry ``(docids, counts, offs, keys)``
    from docid-sorted per-doc position arrays, or ``None`` when a
    docid or position is at or above 2^31 (unencodable in the
    composite key — the kernels then delegate to the distributed
    plan)."""
    import numpy as np

    counts = np.fromiter((len(p) for p in plists), np.int64, len(plists))
    flat = np.concatenate(plists) if plists else np.empty(0, np.int64)
    if (len(docids) and int(docids[-1]) >= _KEY_SAFE) or (
        len(flat) and int(flat.max()) >= _KEY_SAFE
    ):
        return None
    ends = np.cumsum(counts)
    return (
        docids,
        counts,
        ends - counts,
        (np.repeat(docids, counts) << _KEY_SHIFT) | flat,
    )


def _positions_volume_bound(rows: dict, uniq: list[str]) -> int:
    """Upper bound on the positional postings a fetch of ``uniq``
    would move to the driver, from lexicon stats only: Σ df·max_tf
    (each of a term's df docs holds at most max_tf positions). The
    positional analog of the content path's Σdf guard — the true
    volume (collection term frequency) is not stored, so the guard
    uses the provable bound and never fetches past the budget."""
    return sum(int(rows[t]["df"]) * int(rows[t]["max_tf"]) for t in uniq)


def _warm_positional_stats(index, terms: list[str], fetch_budget,
                           allow_missing: bool = False):
    """Stats stage of the warm positional head: analyze nothing
    (terms arrive analyzed, as in the relational surface), resolve
    df/max_tf from the lexicon memo or a ≤|q|-row point lookup, and
    apply the volume-bound fetch guard. Returns ``(uniq, dfs)`` or
    the string ``"missing"`` / ``"fallback"``. With ``allow_missing``
    the out-of-vocabulary terms are dropped instead (the snippets
    composition ranks disjunctively, so a missing term costs coverage,
    not the whole query) — ``"missing"`` then means NO term resolved."""
    from .maxscore import _default_fetch_budget

    uniq = list(dict.fromkeys(terms))
    lmap = getattr(index, "lexicon_map", None)
    if lmap is not None:
        rows = {t: lmap[t] for t in uniq if t in lmap}
    else:
        rows = {
            r["term"]: r
            for r in index.lexicon.filter(F.col("term").isin(uniq))
            .select("term", "df", "max_tf")
            .collect()
        }
    if allow_missing:
        uniq = [t for t in uniq if t in rows]
        if not uniq:
            return "missing"
    elif any(t not in rows for t in uniq):
        return "missing"
    if fetch_budget is None:
        fetch_budget = _default_fetch_budget(index.spark)
    if _positions_volume_bound(rows, uniq) > fetch_budget:
        return "fallback"
    return uniq, {t: int(rows[t]["df"]) for t in uniq}


def _warm_positional_fetch(index, uniq: list[str]):
    """Fetch stage of the warm positional head: ensure the terms'
    position arrays sit in the LRU (ONE In-pushdown scan for the
    missing ones). Returns the LRU or ``"fallback"`` when any entry
    is unencodable (docid/position past the composite-key bound)."""
    lru = _ensure_positions_arrays(index, uniq)
    if any(lru[t] is None for t in uniq):
        return "fallback"  # composite key unencodable at this scale
    return lru


def _warm_positional_setup(index, terms: list[str], fetch_budget):
    """Shared head of the warm phrase/proximity kernels: the stats
    stage then the fetch stage. Returns ``(uniq, dfs, lru)`` or the
    string ``"missing"`` / ``"fallback"``."""
    setup = _warm_positional_stats(index, terms, fetch_budget)
    if isinstance(setup, str):
        return setup
    uniq, dfs = setup
    lru = _warm_positional_fetch(index, uniq)
    if isinstance(lru, str):
        return lru
    return uniq, dfs, lru


def _anchor_occurrences(entry, cand):
    """Flat occurrence keys of the anchor term restricted to the
    candidate docids, plus each occurrence's index into ``cand`` —
    a vectorized ragged gather (no per-document loop): candidate rows
    are located with one ``searchsorted`` (``cand`` is a subset of the
    term's docids by construction), and their key slices are pulled
    with the standard repeat/arange ragged-range trick."""
    import numpy as np

    docids, counts, offs, keys = entry
    ia = np.searchsorted(docids, cand)
    c = counts[ia]
    total = int(c.sum())
    ends = np.cumsum(c)
    sel = np.repeat(offs[ia] - (ends - c), c) + np.arange(total)
    return keys[sel], np.repeat(np.arange(len(cand)), c)


def _intersect_candidates(lru, uniq: list[str], dfs: dict[str, int]):
    """Docids containing EVERY uniq term — rarest-first pairwise
    ``np.intersect1d`` so intermediates stay bounded by the smallest
    list (the same bound the relational rarest-first joins enforce)."""
    import numpy as np

    cand = None
    for t in sorted(uniq, key=lambda t: dfs[t]):
        d = lru[t][0]
        # both operands are docid-sorted and duplicate-free by
        # construction — skip intersect1d's internal re-sort
        cand = d if cand is None else np.intersect1d(
            cand, d, assume_unique=True
        )
        if len(cand) == 0:
            break
    return cand


def phrase_topk_rows(
    index,
    terms: list[str],
    k: int = 10,
    fetch_budget: int | None = None,
) -> list[tuple[int, int]]:
    """Warm phrase serving: ``phrase_search_indexed`` as plain
    (docid, phrase_tf) rows with ZERO Spark jobs on a warmed index —
    candidate docids by rarest-first intersection, then ONE vectorized
    pass over ALL candidate anchor occurrences at once: the anchor's
    occurrences (composite ``(docid << 32) | position`` keys) are
    gathered with a ragged-range trick, each other term's shifted
    membership is one ``searchsorted`` over its whole flat key array,
    and per-doc phrase counts fall out of one ``bincount``. This is
    the positional analog of the dense-query DAAT escape hatch: cost
    is a handful of array ops over the candidate volume, never a
    Python iteration per candidate document (the same shifted-
    containment predicate as the relational plan, anchored on the
    rarest term). Rank phrase_tf DESC, docid ASC — rank-identical to
    the DataFrame surface (pytest-pinned).

    The fetch guard bounds the positional volume by Σ df·max_tf from
    the lexicon (the true per-term position count is not stored);
    past the budget — or when docids/positions exceed the composite
    key's 2^31 bound — the kernel never fetches and delegates to the
    fully-distributed ``phrase_search_indexed``."""
    import numpy as np

    if not terms:
        raise ValueError("empty phrase")
    setup = _warm_positional_setup(index, terms, fetch_budget)
    if setup == "missing":
        return []
    if setup == "fallback":
        return [
            (r["docid"], r["phrase_tf"])
            for r in phrase_search_indexed(index, terms, k=k).collect()
        ]
    uniq, dfs, lru = setup
    order = _phrase_join_order(terms, dfs)
    anchor = order[0]
    cand = _intersect_candidates(lru, uniq, dfs)
    if len(cand) == 0:
        return []
    akeys, adoc = _anchor_occurrences(lru[terms[anchor]], cand)
    apos = akeys & ((1 << _KEY_SHIFT) - 1)
    mask = np.ones(len(akeys), dtype=bool)
    for i in order[1:]:
        tkeys = lru[terms[i]][3]
        delta = i - anchor
        targets = akeys + delta
        j = np.searchsorted(tkeys, targets)
        ok = (j < len(tkeys)) & (
            tkeys[np.minimum(j, len(tkeys) - 1)] == targets
        )
        if delta < 0:
            # a shift below the doc's position 0 must not be allowed
            # to alias into the previous docid's key range
            ok &= apos >= -delta
        mask &= ok
        if not mask.any():
            return []
    tf = np.bincount(adoc[mask], minlength=len(cand))
    nz = np.nonzero(tf)[0]
    sel = np.lexsort((cand[nz], -tf[nz]))[:k]
    return [(int(cand[nz][i]), int(tf[nz][i])) for i in sel]


def proximity_topk_rows(
    index,
    terms: list[str],
    window: int = 8,
    k: int = 10,
    fetch_budget: int | None = None,
) -> list[tuple[int, int]]:
    """Warm proximity serving: ``proximity_search_indexed`` as plain
    (docid, prox_tf) rows — first-term anchor occurrences with every
    other uniq term within ±window, vectorized like
    :func:`phrase_topk_rows`: the interval test is one
    ``searchsorted`` per term over its whole flat composite-key array
    (the lower interval end floored at the doc's position 0 so the
    probe can't alias into the previous docid's key range; the upper
    end stays in-doc because positions and the clamped window are both
    below 2^31). Same LRU, fetch guard, and fallback posture as
    :func:`phrase_topk_rows`; rank prox_tf DESC, docid ASC,
    rank-identical to the DataFrame surface (pytest-pinned)."""
    import numpy as np

    if not terms:
        raise ValueError("empty proximity query")
    if window < 0:
        raise ValueError("window must be >= 0")
    setup = _warm_positional_setup(index, terms, fetch_budget)
    if setup == "missing":
        return []
    if setup == "fallback":
        # the relational plan gets the CALLER'S window — on this path
        # positions may exceed 2^31 (unencodable entries), where the
        # warm kernel's clamp below would not be semantics-preserving
        return [
            (r["docid"], r["prox_tf"])
            for r in proximity_search_indexed(
                index, terms, window=window, k=k
            ).collect()
        ]
    uniq, dfs, lru = setup
    # positions are < 2^31 in every encodable entry, so any window past
    # that already matches the whole document — clamping preserves
    # semantics and keeps interval keys inside the doc's key range
    window = min(window, _KEY_SAFE - 1)
    cand = _intersect_candidates(lru, uniq, dfs)
    if len(cand) == 0:
        return []
    akeys, adoc = _anchor_occurrences(lru[uniq[0]], cand)
    apos = akeys & ((1 << _KEY_SHIFT) - 1)
    lo = akeys - np.minimum(apos, window)
    hi = akeys + window
    mask = np.ones(len(akeys), dtype=bool)
    for t in uniq[1:]:
        tkeys = lru[t][3]
        j = np.searchsorted(tkeys, lo)
        mask &= (j < len(tkeys)) & (
            tkeys[np.minimum(j, len(tkeys) - 1)] <= hi
        )
        if not mask.any():
            return []
    tf = np.bincount(adoc[mask], minlength=len(cand))
    nz = np.nonzero(tf)[0]
    sel = np.lexsort((cand[nz], -tf[nz]))[:k]
    return [(int(cand[nz][i]), int(tf[nz][i])) for i in sel]


def snippet_windows(
    positions: DataFrame,
    doc_tokens: DataFrame,
    terms: list[str],
    width: int = 10,
) -> DataFrame:
    """Best snippet window per matching doc — the serving-layer result
    renderer (and the context-window extractor of a training-data
    pipeline: the ``width`` tokens around a match).

    For every doc containing AT LEAST ONE query term, consider the
    windows of ``width`` tokens starting at each query-term occurrence
    and pick the one covering the most DISTINCT query terms; ties go
    to the earliest start (deterministic). Output: (docid,
    snippet_start, n_matched_terms, snippet) with ``snippet`` the
    space-joined token span.

    Plan: the ≤|q| per-term position rows per doc fold into one map
    column (a |q|-bounded groupBy), candidates and scores are JVM
    array math over that map — no explode of positions, no window
    function — and ONE join brings in the token arrays to render the
    chosen span. ``doc_tokens`` is (docid, tokens): the analyzed
    stream positions index (Lucene-style highlighting rebuilds the
    same analysis offsets, IIR ch. 8)."""
    if not terms:
        raise ValueError("empty snippet query")
    if width <= 0:
        raise ValueError("width must be positive")
    uniq = list(dict.fromkeys(terms))
    pmap = (
        positions.filter(F.col("term").isin(uniq))
        .groupBy("docid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pmap")
        )
    )
    cand = F.array_sort(
        F.array_distinct(F.flatten(F.map_values(F.col("pmap"))))
    )
    d = pmap.withColumn("_cand", cand)

    def score(x):
        s = None
        for t in uniq:
            hit = F.when(
                F.exists(
                    F.coalesce(
                        F.element_at(F.col("pmap"), t),
                        F.array().cast("array<int>"),
                    ),
                    lambda p: (p >= x) & (p < x + F.lit(width)),
                ),
                1,
            ).otherwise(0)
            s = hit if s is None else s + hit
        return s

    best = F.array_max(
        F.transform(
            F.col("_cand"),
            lambda x: F.struct(
                score(x).alias("s"), (-x).alias("nx"), x.alias("x")
            ),
        )
    )
    d = d.withColumn("_best", best)
    out = d.join(doc_tokens.select("docid", "tokens"), "docid")
    return out.select(
        "docid",
        F.col("_best.x").cast("long").alias("snippet_start"),
        F.col("_best.s").cast("long").alias("n_matched_terms"),
        F.array_join(
            F.slice(F.col("tokens"), F.col("_best.x") + 1, width), " "
        ).alias("snippet"),
    )


def search_with_snippets(
    index,
    docs: DataFrame,
    text: str,
    k: int = 10,
    width: int = 10,
    scoring: str = "bm25",
) -> DataFrame:
    """Results-page composition: top-k (MaxScore pruning) + the best
    snippet per hit, ordered score DESC, docid ASC.

    Scale shape — everything after the top-k is proportional to k,
    never to the match set or the corpus:
      * the hit list is k rows on the driver (the one collect);
      * the positional read is restricted to (k docids x |q| terms) as
        In() filters on the PACKED table's plain columns, so on a
        compressed index at most k*|q| position arrays are ever
        gap-VB-decoded;
      * only the k hit documents are re-tokenized for rendering
        (matching via index + rendering via docstore, the same split
        as the snippet gate), with docids mapped FROM the hit list —
        never reassigned over a filtered corpus.
    """
    from ..functions.analysis import tokens_col
    from .maxscore import maxscore_topk_rows
    from .query import query_terms

    spark = docs.sparkSession
    flags = index.manifest.get("flags", {}) if hasattr(index, "manifest") else {}
    stem_stop = flags.get("stem_stop", True)
    terms = query_terms(text, stem_stop)
    out_schema = (
        "docid long, pid string, score double, snippet_start long, "
        "n_matched_terms long, snippet string"
    )
    if not terms:
        return spark.createDataFrame([], out_schema)
    # rows API: ZERO Spark jobs on a warmed index — the hit list is
    # the one driver round trip this composition needs
    hit_rows = [
        (int(d), p, float(s))
        for d, p, s in maxscore_topk_rows(index, text, k=k, scoring=scoring)
    ]
    if not hit_rows:
        return spark.createDataFrame([], out_schema)
    docids = [d for d, _, _ in hit_rows]
    pids = [p for _, p, _ in hit_rows]
    uniq = list(dict.fromkeys(terms))
    if flags.get("positions_packed", False):
        from .indexer import unpack_positions

        pos = unpack_positions(
            index.positions_packed.filter(
                F.col("term").isin(uniq) & F.col("docid").isin(docids)
            )
        )
    else:
        pos = index.positions.filter(
            F.col("term").isin(uniq) & F.col("docid").isin(docids)
        )
    hits = spark.createDataFrame(
        hit_rows, "docid long, pid string, score double"
    )
    # Docstore layout contract: the In(pid) filter pushes down to the
    # parquet scan, but min/max pruning only bites when the docstore is
    # pid-sorted — write it with sinks.write_docstore (pid-range files,
    # sorted within; Iceberg: WRITE ORDERED BY pid) so this k-row read
    # prunes to O(k) files/row groups instead of a corpus-wide scan.
    doc_tokens = (
        docs.filter(F.col("pid").isin(pids))
        .select("pid", tokens_col(F.col("content"), stem_stop).alias("tokens"))
        .join(F.broadcast(hits.select("docid", "pid")), "pid")
        .select("docid", "tokens")
    )
    # LEFT join from the hit list: a hit whose docstore row is missing
    # or drifted (index/docstore version skew) stays on the results
    # page with NULL snippet columns instead of silently vanishing
    return (
        hits.join(snippet_windows(pos, doc_tokens, terms, width=width),
                  "docid", "left")
        .select(
            "docid", "pid", "score",
            "snippet_start", "n_matched_terms", "snippet",
        )
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )


def search_with_snippets_rows(
    index,
    docs: DataFrame,
    text: str,
    k: int = 10,
    width: int = 10,
    scoring: str = "bm25",
    fetch_budget: int | None = None,
) -> list[tuple]:
    """Warm results page: ``search_with_snippets`` as plain (docid,
    pid, score, snippet_start, n_matched_terms, snippet) rows — the
    full interactive composition at AT MOST one Spark job on a warmed
    index: ranking runs through the warm MaxScore kernel (zero jobs),
    window selection reads the query terms' positions from the
    positions LRU and picks each hit's best ``width``-token window
    driver-side with the same maximize-(distinct terms), tie-earliest-
    start rule as ``snippet_windows`` (vectorized over the occurrence
    candidates), and the only job is the k-row docstore read that
    renders the spans (the pid-sorted docstore contract keeps it O(k)
    row groups) — itself served from a pid-keyed token LRU on the
    docs frame, so a repeat page over the same frame is zero-job.

    Fallback posture mirrors the other warm kernels: the Σ df·max_tf
    volume bound (or an unencodable positions entry) delegates the
    whole composition to the distributed ``search_with_snippets``;
    hits whose docstore row is missing keep their rank with NULL
    snippet columns (the relational LEFT-join semantics)."""
    import numpy as np

    from ..functions.analysis import tokens_col
    from .maxscore import maxscore_topk_rows
    from .query import query_terms

    if width <= 0:
        raise ValueError("width must be positive")
    flags = index.manifest.get("flags", {}) if hasattr(index, "manifest") else {}
    stem_stop = flags.get("stem_stop", True)
    terms = query_terms(text, stem_stop)
    if not terms:
        return []

    def _fallback():
        return [
            (
                r["docid"], r["pid"], r["score"], r["snippet_start"],
                r["n_matched_terms"], r["snippet"],
            )
            for r in search_with_snippets(
                index, docs, text, k=k, width=width, scoring=scoring
            ).collect()
        ]

    setup = _warm_positional_stats(index, terms, fetch_budget,
                                   allow_missing=True)
    if setup == "missing":
        return []  # nothing in vocabulary -> no hits either
    if setup == "fallback":
        return _fallback()
    present, _dfs = setup

    # rank BEFORE fetching positions: ranking is zero-job on a warm
    # index, so a no-hit query never pays the cold positions fetch;
    # the terms= bypass skips re-analyzing the text a second time
    hits = maxscore_topk_rows(
        index, text, k=k, scoring=scoring, fetch_budget=fetch_budget,
        terms=terms,
    )
    if not hits:
        return []
    lru = _warm_positional_fetch(index, present)
    if isinstance(lru, str):
        return _fallback()

    # best window per hit: candidates are the doc's query-term
    # occurrences; n(x) = distinct query terms with a position in
    # [x, x+width); pick max n, tie earliest x — exactly
    # snippet_windows' array_max(struct(s, -x, x)) rule
    pos_mask = (1 << _KEY_SHIFT) - 1
    best: dict[int, tuple[int, int] | None] = {}
    for d, _p, _s in hits:
        plists = {}
        for t in present:
            docids, counts, offs, keys = lru[t]
            i = int(np.searchsorted(docids, d))
            if i < len(docids) and docids[i] == d:
                o = int(offs[i])
                plists[t] = keys[o : o + int(counts[i])] & pos_mask
        if not plists:
            best[d] = None
            continue
        cand = np.unique(np.concatenate(list(plists.values())))
        n = np.zeros(len(cand), dtype=np.int64)
        for p in plists.values():
            j = np.searchsorted(p, cand)
            n += (
                (j < len(p))
                & (p[np.minimum(j, len(p) - 1)] < cand + width)
            ).astype(np.int64)
        b = int(np.lexsort((cand, -n))[0])
        best[d] = (int(cand[b]), int(n[b]))

    # the (at most one) render job: the k hit documents' token spans,
    # served from a pid-keyed token LRU attached to the DOCS frame —
    # not the index — so a different docstore object can never serve
    # stale tokens; a repeat page over the same frame is zero-job.
    # A pid absent from the docstore caches as None (the relational
    # LEFT-join semantics), so it is not re-fetched every call.
    from .maxscore import _ensure_lru

    hit_pids = [p for _, p, _ in hits]

    def tok_fetch(missing):
        return (
            docs.filter(F.col("pid").isin(missing))
            .select(
                "pid",
                tokens_col(F.col("content"), stem_stop).alias("tokens"),
            )
            .toPandas()
        )

    def tok_build(sub):
        if not len(sub):
            return _MISSING_DOC  # pid absent -> all-NULL snippet cols
        toks = sub["tokens"].iloc[0]
        # NULL content tokenizes to a NULL array: the relational twin
        # keeps the positions-derived window columns and NULLs only
        # the rendered snippet (snippet_windows joins the row, the
        # token slice is NULL) — None here means exactly that
        return None if toks is None else list(toks)

    tok_by_pid = _ensure_lru(docs, "_render_tokens_lru", hit_pids,
                             tok_fetch, tok_build, key="pid", sort="pid")
    out = []
    for d, p, s in hits:
        b = best.get(d)
        toks = tok_by_pid.get(p, _MISSING_DOC)
        if b is None or toks is _MISSING_DOC:
            out.append((int(d), p, float(s), None, None, None))
        elif toks is None:
            x, n_m = b
            out.append((int(d), p, float(s), x, n_m, None))
        else:
            x, n_m = b
            out.append(
                (int(d), p, float(s), x, n_m, " ".join(toks[x : x + width]))
            )
    return out


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracle
# ---------------------------------------------------------------------------

_PHRASE = ["spark", "join"]  # in-vocabulary bigram
_PHRASE_K = 10


def _q_phrase(spark, sf_dir: str) -> DataFrame:
    """Gate runs the FULL disk path: build an index with the positions
    stage, load it back, serve the phrase from ``InvertedIndex.
    positions`` with rarest-first joins — zero re-analysis at query
    time (the corpus is tokenized once, in the build)."""
    from .entry_ops import gate_disk_index

    idx = gate_disk_index(spark, sf_dir)
    return phrase_search_indexed(idx, _PHRASE, k=_PHRASE_K)


def _positional_ctes_sql() -> str:
    """Shared DuckDB scaffold: corpus -> dense docids -> 0-based
    positional posting lists (the oracle twin of the positions stage).
    Both the phrase and the proximity gates build on these CTEs — one
    definition so the tokenization/docid rules cannot drift apart."""
    return """
d0 AS (
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
)"""


def _positional_join_sql(terms: list[str]) -> str:
    return "".join(
        f" JOIN plists p{i} ON p{i}.term = '{t}' AND p{i}.docid = p0.docid"
        for i, t in enumerate(terms[1:], start=1)
    )


def _phrase_sql() -> str:
    # positions are 0-based offsets into the space-split token stream
    conds = " AND ".join(
        f"list_contains(p{i}.plist, x + {i})" for i in range(1, len(_PHRASE))
    )
    return f"""
WITH {_positional_ctes_sql()},
matched AS (
  SELECT p0.docid,
         CAST(len(list_filter(p0.plist, x -> {conds})) AS BIGINT)
           AS phrase_tf
  FROM plists p0{_positional_join_sql(_PHRASE)}
  WHERE p0.term = '{_PHRASE[0]}'
)
SELECT docid, phrase_tf FROM matched WHERE phrase_tf > 0
ORDER BY phrase_tf DESC, docid ASC
LIMIT {_PHRASE_K}
"""


register("phrase_search_topk", _q_phrase, _phrase_sql())

_PROX = ["spark", "scan"]  # unordered co-occurrence pair
_PROX_WINDOW = 3
_PROX_K = 10


def _q_proximity(spark, sf_dir: str) -> DataFrame:
    from .entry_ops import gate_disk_index

    idx = gate_disk_index(spark, sf_dir)
    return proximity_search_indexed(
        idx, _PROX, window=_PROX_WINDOW, k=_PROX_K
    )


def _proximity_sql() -> str:
    conds = " AND ".join(
        f"len(list_filter(p{i}.plist, p -> abs(p - y) <= {_PROX_WINDOW})) > 0"
        for i in range(1, len(_PROX))
    )
    return f"""
WITH {_positional_ctes_sql()},
matched AS (
  SELECT p0.docid,
         CAST(len(list_filter(p0.plist, y -> {conds})) AS BIGINT)
           AS prox_tf
  FROM plists p0{_positional_join_sql(_PROX)}
  WHERE p0.term = '{_PROX[0]}'
)
SELECT docid, prox_tf FROM matched WHERE prox_tf > 0
ORDER BY prox_tf DESC, docid ASC
LIMIT {_PROX_K}
"""


register("proximity_search_topk", _q_proximity, _proximity_sql())

_SNIP = ["spark", "join"]
_SNIP_WIDTH = 6


def _q_snippets(spark, sf_dir: str) -> DataFrame:
    """Matching from the PERSISTED positional index; rendering joins
    the token streams back from the corpus (the index stores no raw
    text — matching via index + rendering via docstore is the real
    serving split)."""
    import __spark_entry__ as entry

    from .entry_ops import gate_disk_index
    from .frames import tokenized_docs

    idx = gate_disk_index(spark, sf_dir)
    dt = tokenized_docs(entry._docs(spark, sf_dir), stem_stop=False)
    return snippet_windows(
        _served_positions(idx, _SNIP),
        dt.select("docid", "tokens"),
        _SNIP,
        width=_SNIP_WIDTH,
    )


def _snippets_sql() -> str:
    w = _SNIP_WIDTH
    score = " + ".join(
        f"(CASE WHEN len(list_filter(q{i}, p -> p >= x AND p < x + {w})) > 0"
        " THEN 1 ELSE 0 END)"
        for i in range(len(_SNIP))
    )
    qcols = ", ".join(
        f"coalesce(t{i}.plist, CAST([] AS BIGINT[])) AS q{i}"
        for i in range(len(_SNIP))
    )
    qjoins = "".join(
        f" LEFT JOIN plists t{i} ON t{i}.docid = cd.docid"
        f" AND t{i}.term = '{t}'"
        for i, t in enumerate(_SNIP)
    )
    in_list = ", ".join(f"'{t}'" for t in _SNIP)
    return f"""
WITH {_positional_ctes_sql()},
cd AS (
  SELECT docid, list_sort(list_distinct(flatten(list(plist)))) AS cand
  FROM plists WHERE term IN ({in_list}) GROUP BY docid
),
sc AS (
  SELECT cd.docid, cd.cand, {qcols}
  FROM cd{qjoins}
),
best AS (
  SELECT docid,
         list_max(list_transform(cand,
           x -> {{'s': {score}, 'nx': -x, 'x': x}})) AS b
  FROM sc
)
SELECT best.docid,
       CAST(b.x AS BIGINT) AS snippet_start,
       CAST(b.s AS BIGINT) AS n_matched_terms,
       array_to_string(
         ds.toks[CAST(b.x + 1 AS INT) : CAST(b.x + {w} AS INT)], ' ')
         AS snippet
FROM best JOIN ds ON ds.docid = best.docid
"""


register("snippet_windows", _q_snippets, _snippets_sql())


def _q_packed_positions(spark, sf_dir: str) -> DataFrame:
    """Byte-framing oracle for the compressed positions stage (the
    positions twin of packed_block_sizes): per (term, docid), the
    stored VB blob length must equal the sum of per-gap VB byte
    widths derived from first principles — gaps over (position + 1),
    base-128 big-endian, one byte per 7-bit digit."""
    from .entry_ops import gate_disk_index

    idx = gate_disk_index(spark, sf_dir)
    return idx.positions_packed.select(
        "term",
        "docid",
        F.col("n_positions").cast("long").alias("n_positions"),
        F.length("positions_vb").cast("long").alias("n_vb_bytes"),
    )


def _packed_positions_sql() -> str:
    return f"""
WITH {_positional_ctes_sql()},
gaps AS (
  SELECT term, docid,
         CAST(len(plist) AS BIGINT) AS n_positions,
         list_transform(range(1, len(plist) + 1),
           i -> CASE WHEN i = 1 THEN plist[1] + 1
                     ELSE plist[i] - plist[i - 1] END) AS gs
  FROM plists
)
SELECT term, docid, n_positions,
       CAST(list_sum(list_transform(gs, v ->
         CASE WHEN v < 128 THEN 1 WHEN v < 16384 THEN 2
              WHEN v < 2097152 THEN 3 WHEN v < 268435456 THEN 4
              WHEN v < 34359738368 THEN 5 WHEN v < 4398046511104 THEN 6
              WHEN v < 562949953421312 THEN 7
              WHEN v < 72057594037927936 THEN 8
              ELSE 9 END)) AS BIGINT) AS n_vb_bytes
FROM gaps
"""


register(
    "packed_position_sizes", _q_packed_positions, _packed_positions_sql()
)
