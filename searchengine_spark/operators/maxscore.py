"""Partition-parallel block-max MaxScore top-k scorer.

Re-expresses the reference's MaxScore dynamic pruning
(/root/reference/queryHandler/.../MaxScore.java:42-132) for Spark's
execution model, per the serving design in SURVEY.md §3.2:

1. the query's lexicon rows (<= |q|) are collected;
2. the query terms' posting lists are gathered to the driver and
   BROADCAST (they are the same data the reference streams from local
   disk — small relative to the cluster: |q| terms, not the corpus);
3. the docid space is split into P ranges; each task runs the
   MaxScore/DAAT cursor algorithm over its slice of every posting list
   (numpy ``searchsorted`` = the skip-pointer ``nextGEQ`` jump,
   PostingList.java:185-215) and emits its local top-k;
4. the P local top-k sets reduce to the global top-k (same heap
   semantics: strict ``>``, earlier docid retained on ties — here
   ``score DESC, docid ASC``).

Pruning uses the PROVABLE per-term upper bound (``tub_bm25_exact`` /
``tub_tfidf`` from the lexicon) — the reference's raw-tf ``tub_bm25``
is an admitted heuristic that is not a true bound
(VocabularyEntry.java:340 vs Scorer.java:43, documentation.pdf §3.2.1)
and could make pruned results diverge from DAAT. With exact bounds,
MaxScore is rank-identical to exact DAAT scoring by construction; the
reference's own tests assert DAAT == MaxScore (QueryProcesserTest).

The per-slice algorithm mirrors MaxScore.java:
* lists sorted ascending by term upper bound            (:309-322)
* essential/non-essential split where the cumulative TUB
  first exceeds the current threshold                   (:204-222)
* essential lists drive candidate docids (DAAT union)   (:172-194)
* non-essential lists probed via nextGEQ only while
  partial + remaining-TUB can still beat the threshold  (:142-161)
* threshold <- k-th best score once the heap is full    (:108-122)

Literature: Turtle & Flood, "Query evaluation: strategies and
optimizations" (IP&M 1995) — the original MaxScore; Broder et al.,
"Efficient query evaluation using a two-level retrieval process"
(CIKM 2003) — WAND; Ding & Suel, "Faster top-k document retrieval
using block-max indexes" (SIGIR 2011) — block-max skipping.
"""

from __future__ import annotations

import heapq
from bisect import bisect_left
from operator import itemgetter

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import B, K1
from .query import query_terms

K1_F = float(K1)
B_F = float(B)


def _score_arrays(
    scoring: str, idf: float, tfs: np.ndarray, dls: np.ndarray, avgdl: float
) -> np.ndarray:
    """Vectorized Scorer.java:40-64 over a posting slice."""
    ltf = 1.0 + np.log10(tfs.astype(np.float64))
    if scoring == "bm25":
        denom = ltf + K1_F * ((1.0 - B_F) + B_F * dls.astype(np.float64) / avgdl)
        return idf * ltf / denom
    return idf * ltf


def _block_bounds(
    docids: np.ndarray, scores: np.ndarray
) -> tuple[np.ndarray, np.ndarray] | None:
    """Per-block (max_docid, max_score) under the reference's √df block
    law (VocabularyEntry.java:348-361) — the block-max structure of
    Ding & Suel (SIGIR 2011). ``searchsorted(max_docids, d)`` yields
    the block that would hold docid d, so ``max_score[that block]`` is
    a true upper bound on the term's contribution at d."""
    from .indexer import BLOCK_DF_THRESHOLD

    df = len(docids)
    if df == 0:
        return None
    nb = int(np.ceil(np.sqrt(df))) if df >= BLOCK_DF_THRESHOLD else 1
    per = -(-df // nb)
    offsets = np.arange(0, df, per)
    bmax_docid = docids[np.minimum(offsets + per - 1, df - 1)]
    bmax_score = np.maximum.reduceat(scores, offsets)
    return bmax_docid, bmax_score


_BYTES_PER_POSTING = 32  # 4 numpy columns x 8 B on the driver
_FETCH_MEM_FRACTION = 8  # budget = driver memory / 8 / bytes-per-posting

# memoized per session: sparkContext.getConf() is a py4j round trip
# that COPIES the whole SparkConf (~14 ms measured) — paying it per
# query doubled the warm-serving p50; driver memory cannot change
# within a session, so one resolution per session is exact. The memo
# lives as an attribute ON the session object (not an id()-keyed dict:
# a stopped session's id can be reused by a new one with a different
# driver memory, silently inheriting the stale budget).
_FETCH_BUDGET_ATTR = "_se_fetch_budget"


_DRIVER_MEM_ATTR = "_se_driver_memory_bytes"


def driver_memory_bytes(spark) -> int:
    """``spark.driver.memory`` in bytes — the sizing input every
    driver-side budget (maxscore's fetch budget, dedup's CC edge
    limit) derives from. The value lives in the SparkConf, not the
    runtime SQL conf — read it there first so large-driver deployments
    actually get larger budgets instead of silently landing on the 1g
    default. Memoized as an attribute ON the session object:
    ``sparkContext.getConf()`` copies the whole conf through py4j
    (~14 ms) and must never run per query."""
    cached = getattr(spark, _DRIVER_MEM_ATTR, None)
    if cached is not None:
        return cached
    mem = None
    try:
        mem = spark.sparkContext.getConf().get("spark.driver.memory", None)
    except Exception:
        mem = None
    if not mem:
        try:
            mem = spark.conf.get("spark.driver.memory", "1g") or "1g"
        except Exception:
            mem = "1g"
    m = str(mem).strip().lower()
    # JVM-style size suffixes (Spark's byteStringAsBytes); a UNITLESS
    # spark.driver.memory is interpreted by Spark as MiB, not bytes —
    # parsing "4096" as 4096 bytes would collapse every derived budget
    # to its floor on a 4 GiB driver.
    mult = 1 << 20
    for suf, mul in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
        ("tb", 1 << 40), ("pb", 1 << 50), ("b", 1),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
        ("t", 1 << 40), ("p", 1 << 50),
    ):
        if m.endswith(suf):
            m, mult = m[: -len(suf)], mul
            break
    try:
        nbytes = int(float(m)) * mult
    except ValueError:
        nbytes = 1 << 30
    try:
        setattr(spark, _DRIVER_MEM_ATTR, nbytes)
    except Exception:
        pass
    return nbytes


def _default_fetch_budget(spark) -> int:
    """Fetch budget (in postings) derived from the driver's memory
    instead of a constant: the gathered query-term lists cost about
    ``_BYTES_PER_POSTING`` bytes each on the driver, and the budget
    caps them at 1/``_FETCH_MEM_FRACTION`` of ``spark.driver.memory``
    (the LRU holds up to 1000 terms, so headroom matters). Deploys pin
    it with SE_MAXSCORE_FETCH_POSTINGS, like the warm thresholds."""
    import os

    env = os.environ.get("SE_MAXSCORE_FETCH_POSTINGS")
    if env:
        return int(env)
    cached = getattr(spark, _FETCH_BUDGET_ATTR, None)
    if cached is not None:
        return cached
    nbytes = driver_memory_bytes(spark)
    budget = max(
        1_000_000, int(nbytes // _FETCH_MEM_FRACTION // _BYTES_PER_POSTING)
    )
    import logging

    logging.getLogger(__name__).debug(
        "maxscore fetch budget: driver.memory=%d bytes -> %d postings",
        nbytes, budget,
    )
    try:
        setattr(spark, _FETCH_BUDGET_ATTR, budget)
    except Exception:
        pass  # exotic session proxies: fall back to re-resolving
    return budget


def _fetch_block_bounds(index, terms: list[str], scoring: str) -> dict:
    """Materialized block-max bounds from the index's ``blocks`` table
    (bmax_bm25/bmax_tfidf columns written by the build's stage 4 —
    Ding & Suel's stored block-max structure). Returns {} when the
    index has no materialized bounds (in-memory IndexFrames, or a
    pre-bmax disk index) so the caller falls back to recomputing
    bounds from the fetched posting arrays (_block_bounds).

    Per-term bound arrays are LRU-cached on the index next to the
    posting-list LRU, so a warm term's bounds cost zero Spark jobs."""
    has = getattr(index, "_blocks_has_bmax", None)
    if has is None:
        try:
            has = "bmax_bm25" in index.blocks.columns
        except Exception:
            has = False
        try:
            index._blocks_has_bmax = has
        except AttributeError:
            pass
    if not has:
        return {}
    lru = getattr(index, "_blocks_lru", None)
    if lru is None:
        from collections import OrderedDict

        lru = OrderedDict()
        try:
            index._blocks_lru = lru
        except AttributeError:
            pass
    to_fetch = [t for t in terms if t not in lru]
    if to_fetch:
        pdf = (
            index.blocks.filter(F.col("term").isin(to_fetch))
            .select("term", "block_id", "max_docid", "bmax_bm25", "bmax_tfidf")
            .toPandas()
        )
        for t in to_fetch:
            sub = pdf[pdf["term"] == t].sort_values("block_id")
            if len(sub) == 0:
                continue
            lru[t] = (
                sub["max_docid"].to_numpy(np.int64),
                sub["bmax_bm25"].to_numpy(np.float64),
                sub["bmax_tfidf"].to_numpy(np.float64),
            )
            while len(lru) > 1000:
                lru.popitem(last=False)
    out = {}
    for t in terms:
        got = lru.get(t)
        if got is not None:
            lru.move_to_end(t)
            md, b25, btf = got
            out[t] = (md, b25 if scoring == "bm25" else btf)
    return out


def _maxscore_slice(
    lists: list[dict],
    lo: int,
    hi: int,
    k: int,
    conjunctive: bool,
    round_decimals: int | None = None,
) -> list[tuple[float, int]]:
    """MaxScore over docid range [lo, hi). ``lists`` ascending by tub.

    Returns up to k (score, docid) pairs. Cursor state is a per-list
    index; nextGEQ is a searchsorted jump on the (sorted) docid array.

    ``round_decimals`` rounds each candidate's EXACT score before heap
    insertion, so selection matches the round-before-limit semantics of
    ``query.top_k`` and the SQL oracles (two docs whose unrounded
    scores straddle the k boundary but round equal must tie-break on
    docid). Pruning with unrounded bounds against the rounded threshold
    stays safe: round() is monotone and the threshold is a fixed point
    of round(), so exact <= threshold implies round(exact) <= threshold
    — a pruned candidate can never strictly beat the rounded threshold.
    """
    # Hot-loop layout mirrors _bmw_slice: one Python iteration per
    # candidate, so numpy SCALAR reads are the cost driver. Current
    # docids are cached as plain ints (INF = exhausted), block bounds
    # as small Python lists for bisect, suffix sums as a list; numpy
    # is kept only for the O(log n) nextGEQ jumps into the big arrays.
    INF = 1 << 62
    n = len(lists)
    views = []
    lens = []
    cur = []
    for pl in lists:
        d = pl["docids"]
        s, e = np.searchsorted(d, lo), np.searchsorted(d, hi)
        dv, sv = d[s:e], pl["scores"][s:e]
        views.append((dv, sv))
        lens.append(len(dv))
        cur.append(int(dv[0]) if len(dv) else INF)
    qpos = [pl["qpos"] for pl in lists]
    tubs = [float(pl["tub"]) for pl in lists]
    suffix_tub = []  # suffix_tub[i] = sum of tubs[0..i]
    _acc = 0.0
    for t in tubs:
        _acc += t
        suffix_tub.append(_acc)
    # per-list block bounds as Python lists + a prefix-any table so the
    # per-candidate use_bm decision is one indexed read
    bml = []
    bm_any = [False]
    for pl in lists:
        bm = pl.get("bm")
        bml.append(
            None
            if bm is None
            else (np.asarray(bm[0]).tolist(), np.asarray(bm[1]).tolist())
        )
        bm_any.append(bm_any[-1] or bml[-1] is not None)

    heap: list[tuple[float, int]] = []  # min-heap of (score, -docid)
    threshold = -np.inf
    pos = [0] * n
    first_essential = 0

    def push(score: float, docid: int) -> None:
        nonlocal threshold, first_essential
        item = (score, -docid)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                threshold = heap[0][0]
        elif score > heap[0][0]:  # strict > (DAAT.java:191)
            heapq.heapreplace(heap, item)
            threshold = heap[0][0]
        else:
            return
        # re-split essential/non-essential (MaxScore.java:204-222)
        while (
            first_essential < n and suffix_tub[first_essential] <= threshold
        ):
            first_essential += 1

    while True:
        # next candidate = min current docid across essential lists
        cand = INF
        for i in range(first_essential, n):
            v = cur[i]
            if v < cand:
                cand = v
        if cand == INF:
            break

        # contributions collected per-list, summed at push time in
        # QUERY-TERM order — DAAT folds partials in term_idx order
        # (DAAT.java:139-162) and float addition is not associative,
        # so summing in TUB order could flip ties at the k boundary
        contribs: list[tuple[int, float]] = []
        score = 0.0  # running bound-side accumulator (pruning only)
        matched = 0
        # essential lists at the candidate
        for i in range(first_essential, n):
            if cur[i] == cand:
                d, s = views[i]
                p = pos[i]
                c = float(s[p])
                score += c
                contribs.append((qpos[i], c))
                matched += 1
                p += 1
                pos[i] = p
                cur[i] = int(d[p]) if p < lens[i] else INF

        # non-essential probes, highest tub first, with early bailout
        # (MaxScore.java:142-161). With block-max structures (Ding &
        # Suel BMM), the bailout uses the CURRENT BLOCK's max score per
        # shallow list — a bound <= the global TUB, so strictly more
        # pruning with identical results.
        viable = True
        use_bm = (
            not conjunctive and first_essential > 0
            and bm_any[first_essential]
        )
        if use_bm:
            bm_vals = []
            rem = 0.0
            for i in range(first_essential):
                b = bml[i]
                if b is None:
                    x = tubs[i]
                else:
                    bdl, bsl = b
                    j = bisect_left(bdl, cand)
                    x = bsl[j] if j < len(bdl) else 0.0
                bm_vals.append(x)
                rem += x
        for i in range(first_essential - 1, -1, -1):
            if not conjunctive:
                bound = score + (rem if use_bm else suffix_tub[i])
                if bound <= threshold:
                    viable = False
                    break
            if cur[i] < cand:  # nextGEQ only when actually behind
                # full-array method call, not np.searchsorted on a
                # d[p:] slice: d[p] < cand means the absolute result
                # is already > p, and the method skips both the view
                # allocation and the module-dispatch overhead (~3.5k
                # probes per warm query at the bench scale)
                d, s = views[i]
                p = int(d.searchsorted(cand))
                pos[i] = p
                cur[i] = int(d[p]) if p < lens[i] else INF
            if cur[i] == cand:
                c = float(views[i][1][pos[i]])
                score += c
                contribs.append((qpos[i], c))
                matched += 1
            elif conjunctive:
                viable = False
                break
            if use_bm:
                rem -= bm_vals[i]  # list i's potential is now realized

        if (conjunctive and viable and matched == len(lists)) or (
            not conjunctive and viable
        ):
            contribs.sort()
            exact = 0.0
            for _, v in contribs:
                exact += v
            if round_decimals is not None:
                exact = round(exact, round_decimals)
            push(exact, cand)

    return [(sc, -nd) for sc, nd in heap]


def _daat_vec_slice(
    lists: list[dict],
    lo: int,
    hi: int,
    k: int,
    conjunctive: bool = False,
    round_decimals: int | None = None,
) -> list[tuple[float, int]]:
    """Exact DAAT over docid range [lo, hi) — numpy-vectorized, no
    pruning. The dense-query escape hatch next to the MaxScore/BMW
    cursor kernels: when the query's lists overlap heavily (all
    high-df terms), dynamic pruning skips almost nothing and the
    cursor kernels pay one Python iteration per candidate, while this
    kernel's cost is a handful of array ops over the already-fetched
    postings (~100x less per posting). Profiled at bench scale on
    3-term top-300-df queries: MaxScore-BMM p50 164 ms, BMW 469 ms,
    this kernel ~2 ms.

    Identical semantics to the cursor kernels, bit for bit:

    * contributions accumulate in QUERY-TERM order — the lists are
      concatenated sorted by ``qpos`` and ``np.add.at`` is the
      documented unbuffered sequential accumulate, so each docid's
      partials sum in the same order as DAAT's ordered fold;
    * ``round_decimals`` rounds before selection (round-before-cut)
      using PYTHON ``round`` per candidate — ``np.round`` scales
      through ``x*10^d`` in binary and can disagree with Python's
      correctly-rounded decimal rounding exactly on the manufactured
      .5 ties the oracles test — accepting a Python loop over the
      candidate array on this (gate-only) path;
    * selection is top-k by score DESC, docid ASC (``np.lexsort`` on
      (docid, -score)), the heap's strict-> tie rule.
    """
    n = len(lists)
    ds, ss = [], []
    for pl in sorted(lists, key=lambda pl: pl["qpos"]):
        d = pl["docids"]
        s, e = np.searchsorted(d, lo), np.searchsorted(d, hi)
        ds.append(d[s:e])
        ss.append(pl["scores"][s:e])
    all_d = np.concatenate(ds) if ds else np.empty(0, np.int64)
    if len(all_d) == 0:
        return []
    all_s = np.concatenate(ss)
    uniq, inv = np.unique(all_d, return_inverse=True)
    tot = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(tot, inv, all_s)
    if conjunctive:
        keep = np.bincount(inv, minlength=len(uniq)) == n
        uniq, tot = uniq[keep], tot[keep]
        if len(uniq) == 0:
            return []
    if round_decimals is not None:
        tot = np.array(
            [round(float(x), round_decimals) for x in tot], dtype=np.float64
        )
    order = np.lexsort((uniq, -tot))[:k]
    return [(float(tot[i]), int(uniq[i])) for i in order]


def _bmw_slice(
    lists: list[dict],
    lo: int,
    hi: int,
    k: int,
    conjunctive: bool = False,
    round_decimals: int | None = None,
) -> list[tuple[float, int]]:
    """Block-Max WAND over docid range [lo, hi) — disjunctive only.

    WAND pivot selection (Broder et al., "Efficient query evaluation
    using a two-level retrieval process", CIKM 2003) with the block-max
    refinements of Ding & Suel (SIGIR 2011, Algorithm 3): lists stay
    sorted by CURRENT docid; the pivot is the first prefix whose summed
    global term bounds beat the threshold; the pivot docid is then
    re-checked against the sum of its CURRENT-BLOCK maxima, and a
    failed check skips straight past the nearest block boundary
    (capped at the next list's cursor, which the pivot prefix did not
    account for) without touching a posting. The block bounds are the
    same exact per-block maxima MaxScore's BMM probe uses (stored
    blocks/ table or ``_block_bounds``), so the result is
    rank-identical to exact DAAT — not an approximation. Heap/tie
    semantics identical to ``_maxscore_slice``: strict ``>``, rounded
    scores decide selection, final order score DESC / docid ASC.

    Safety of the two prunes under rounding mirrors _maxscore_slice:
    bounds are unrounded, the threshold is a fixed point of round(),
    and round() is monotone — exact <= threshold implies
    round(exact) <= threshold, so a skipped doc can never strictly
    beat the rounded threshold.
    """
    if conjunctive:
        raise ValueError("BMW is a disjunctive evaluator; "
                         "use MaxScore for conjunctive queries")
    views = []
    for pl in lists:
        d = pl["docids"]
        s, e = np.searchsorted(d, lo), np.searchsorted(d, hi)
        if e - s == 0:
            continue
        bd, bs = pl["bm"]  # GLOBAL per-block (max_docid, max_score):
        # looked up by docid, so full-list block boundaries stay valid
        # on any docid slice of the list
        views.append({
            "d": d[s:e], "s": pl["scores"][s:e], "bd": bd, "bs": bs,
            "tub": float(pl["tub"]), "qpos": pl["qpos"], "p": 0,
        })
    heap: list[tuple[float, int]] = []  # min-heap of (score, -docid)
    threshold = -np.inf

    def push(score: float, docid: int) -> None:
        nonlocal threshold
        item = (score, -docid)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                threshold = heap[0][0]
        elif score > heap[0][0]:  # strict > (DAAT.java:191)
            heapq.heapreplace(heap, item)
            threshold = heap[0][0]

    # Hot-loop layout: the kernel runs one Python iteration per pivot,
    # so per-iteration numpy SCALAR access is the cost driver (profiled:
    # the sort key's d[p] reads + 2-3 scalar searchsorted block lookups
    # per pivot were ~70% of warm BMW latency). Each view caches its
    # current docid as a plain int (`cur`, maintained on every cursor
    # move) and its block arrays as Python lists (√df entries — tiny),
    # so the loop is pure-Python bisect/itemgetter; numpy is kept ONLY
    # for the O(log n) nextGEQ jumps into the big docid arrays.
    for v in views:
        v["n"] = len(v["d"])
        v["cur"] = int(v["d"][0])
        v["bdl"] = np.asarray(v["bd"]).tolist()
        v["bsl"] = np.asarray(v["bs"]).tolist()

    active = list(views)
    by_cur = itemgetter("cur")
    by_tub = itemgetter("tub")
    while active:
        active.sort(key=by_cur)
        # pivot: first prefix whose Σ global bound beats the threshold
        acc, pivot = 0.0, -1
        for j, v in enumerate(active):
            acc += v["tub"]
            if acc > threshold:
                pivot = j
                break
        if pivot < 0:
            break  # all remaining lists together cannot beat the k-th
        pd = active[pivot]["cur"]
        # extend the pivot over every later list already AT pd: those
        # lists contribute to pd's score too, so the block-max check
        # below must include them — summing only the θ-crossing prefix
        # would under-bound pd and skip a true top-k doc (the prefix
        # bound covers docs STRICTLY BELOW pd, not pd itself)
        while pivot + 1 < len(active) and active[pivot + 1]["cur"] == pd:
            pivot += 1
        # block-max re-check at pd over the pivot prefix; collect each
        # contributing block's end docid for the failed-check skip
        bsum, bends = 0.0, []
        for v in active[: pivot + 1]:
            bdl = v["bdl"]
            bi = bisect_left(bdl, pd)
            if bi < len(bdl):  # else: no posting >= pd, bound 0
                bsum += v["bsl"][bi]
                bends.append(bdl[bi])
        exhausted = False
        if bsum > threshold:
            if active[0]["cur"] == pd:
                # aligned: every list at docid pd contributes (the
                # sorted run may extend past the pivot) — exact score,
                # folded in QUERY-TERM order like DAAT
                contribs = []
                for v in active:
                    if v["cur"] != pd:  # sorted: the rest are > pd
                        break
                    p = v["p"]
                    contribs.append((v["qpos"], float(v["s"][p])))
                    p += 1
                    v["p"] = p
                    if p < v["n"]:
                        v["cur"] = int(v["d"][p])
                    else:
                        exhausted = True
                contribs.sort()
                exact = 0.0
                for _, c in contribs:
                    exact += c
                if round_decimals is not None:
                    exact = round(exact, round_decimals)
                push(exact, pd)
            else:
                # not aligned: nextGEQ the largest-bound list still
                # BEHIND pd up to pd (never one already at pd — that
                # would jump past its contribution)
                behind = [v for v in active[:pivot] if v["cur"] < pd]
                adv = max(behind, key=by_tub)
                # full-array nextGEQ: adv is strictly behind pd, so the
                # absolute searchsorted result is already past its cursor
                p = int(adv["d"].searchsorted(pd))
                adv["p"] = p
                if p < adv["n"]:
                    adv["cur"] = int(adv["d"][p])
                else:
                    exhausted = True
        else:
            # nothing in [pd, min block end] can beat the threshold:
            # skip past the nearest block boundary, capped at the next
            # unaccounted list's cursor (its bound was not in bsum, so
            # docs at or past it must be re-pivoted, not skipped)
            nxt = (min(bends) if bends else pd) + 1
            if pivot + 1 < len(active):
                nxt = min(nxt, active[pivot + 1]["cur"])
            nxt = max(nxt, pd + 1)  # progress even on degenerate bounds
            adv = max(active[: pivot + 1], key=by_tub)
            # full-array nextGEQ: every prefix cursor is <= pd < nxt,
            # so the absolute searchsorted result is past adv's cursor
            p = int(adv["d"].searchsorted(nxt))
            adv["p"] = p
            if p < adv["n"]:
                adv["cur"] = int(adv["d"][p])
            else:
                exhausted = True
        if exhausted:
            active = [v for v in active if v["p"] < v["n"]]
    return [(sc, -nd) for sc, nd in heap]


class FetchOverBudget(Exception):
    """Raised by an ``_ensure_lru`` fetch closure whose measured volume
    exceeds the driver fetch budget — the caller delegates to its
    fully-distributed relational twin instead."""


def _ensure_lru(index, attr: str, terms: list[str], fetch, build,
                key: str = "term", sort: str = "docid"):
    """Shared per-key LRU ensure used by every warm serving cache
    (content postings, field postings, positions — keyed by term; PRF
    forward vectors — keyed by docid): an ``OrderedDict`` at
    ``index.<attr>``, capped at the reference's 1000-entry Vocabulary
    cache size (Vocabulary.java:17, CacheTests).

    The query's already-cached keys are touched (``move_to_end``)
    BEFORE anything is fetched — that keeps the cache truly
    least-recently-used rather than insertion-ordered, and it
    guarantees the eviction below can never drop a key of the
    in-flight query (a cold fetch at the cap used to be able to evict
    a warm term of the SAME query between its membership check and
    its read). Missing keys are fetched in ONE call —
    ``fetch(to_fetch)`` returns a pandas frame carrying the ``key``
    and ``sort`` columns — and built into entries per key via
    ``build(sub)``; eviction then drops the oldest entries NOT in the
    current query down to the cap."""
    from collections import OrderedDict

    lru = getattr(index, attr, None)
    if lru is None:
        lru = OrderedDict()
        try:
            setattr(index, attr, lru)
        except AttributeError:
            pass
    for t in terms:
        if t in lru:
            lru.move_to_end(t)
    to_fetch = [t for t in terms if t not in lru]
    if to_fetch:
        pdf = fetch(to_fetch)
        for t in to_fetch:
            lru[t] = build(pdf[pdf[key] == t].sort_values(sort))
        cur = set(terms)
        while len(lru) > 1000:
            old = next((x for x in lru if x not in cur), None)
            if old is None:
                break  # every cached entry belongs to this query
            del lru[old]
    return lru


def _ensure_postings_arrays(index, terms: list[str]):
    """Ensure every term's raw posting arrays ``(docids, tfs, doc_lens)``
    — docid-sorted — sit in the index's shared per-term LRU, fetching
    the missing ones with ONE In-pushdown scan, and return the LRU.
    Shared by the warm single-query kernels (``_serve``) and the warm
    fielded kernel (``query.bm25f_topk_rows``); the batch path keeps
    its own non-inserting read so a 7,000-query union can't churn warm
    single-query terms out."""

    def fetch(to_fetch):
        return (
            index.postings.filter(F.col("term").isin(to_fetch))
            .select("term", "docid", "tf", "doc_len")
            .toPandas()
        )

    def build(sub):
        return (
            sub["docid"].to_numpy(np.int64),
            sub["tf"].to_numpy(),
            sub["doc_len"].to_numpy(),
        )

    return _ensure_lru(index, "_postings_lru", terms, fetch, build)


def _serve(
    index,
    text: str,
    k: int,
    conjunctive: bool,
    scoring: str,
    num_slices: int | None,
    round_decimals: int | None,
    local_threshold: int,
    fetch_budget: int | None,
    block_max: bool = False,
    algo: str = "maxscore",
    terms: list[str] | None = None,
):
    """Shared serving core. Returns ``("fallback", None)`` when the
    relational path must run (flag off, or Σdf over the fetch budget),
    else ``("rows", [(score, docid), ...])`` — the global top-k, sorted
    score DESC / docid ASC (possibly empty). ``terms`` bypasses query
    analysis with pre-analyzed terms (the warm twin of
    ``query.top_k_terms`` — PRF re-runs expanded term lists through
    it)."""
    spark = index.spark
    stats = index.stats
    stem_stop = index.manifest["flags"]["stem_stop"]
    if algo not in ("maxscore", "bmw", "daat"):
        raise ValueError(f"unknown serving algo: {algo!r} "
                         "(want maxscore|bmw|daat)")
    if algo == "bmw" and conjunctive:
        raise ValueError("BMW is a disjunctive evaluator; "
                         "use MaxScore for conjunctive queries")
    if not index.manifest["flags"].get("max_score", True):
        return "fallback", None
    avgdl = stats["total_doc_len"] / stats["n_docs"]

    if fetch_budget is None:
        fetch_budget = _default_fetch_budget(spark)

    if terms is None:
        terms = query_terms(text, stem_stop)
    if not terms:
        return "rows", []

    lex_cols = ["term", "df", "idf", "tub_tfidf", "tub_bm25_exact"]
    lmap = getattr(index, "lexicon_map", None)
    if lmap is not None:
        by_term = {t: lmap[t] for t in terms if t in lmap}
    else:
        lex_rows = (
            index.lexicon.filter(F.col("term").isin(terms))
            .select(*lex_cols).collect()
        )
        by_term = {r["term"]: r for r in lex_rows}
    missing = [t for t in terms if t not in by_term]
    if conjunctive and missing:
        return "rows", []
    present = [t for t in terms if t in by_term]
    if not present:
        return "rows", []

    # df-guard BEFORE fetching: the lexicon already knows how many
    # postings the fetch would move; consult it first (VocabularyEntry
    # df — the reference's query node reads the same field before
    # opening lists, Vocabulary.getEntry).
    total_df = sum(int(by_term[t]["df"]) for t in present)
    if total_df > fetch_budget:
        return "fallback", None

    # gather + broadcast the query-term posting lists (SURVEY §3.2:
    # driver holds <= |q| lists, same as the reference's query node).
    # A per-term LRU of raw posting arrays mirrors the reference's
    # 1000-entry Vocabulary cache (Vocabulary.java:17, CacheTests):
    # repeat terms skip the fetch job entirely.
    lru = _ensure_postings_arrays(index, present)
    # block-max bounds: prefer the MATERIALIZED per-block max scores from
    # the index's blocks table (stored at build, Ding & Suel's BMM
    # layout); recompute from the fetched arrays only when the index has
    # none (in-memory frames / legacy index).
    need_bm = block_max or algo == "bmw"  # BMW cannot run without bounds
    bm_stored = _fetch_block_bounds(index, present, scoring) if need_bm else {}
    lists = []
    for t in present:
        docids, tfs, dls = lru[t]  # recency already refreshed by _ensure_lru
        r = by_term[t]
        idf = float(r["idf"])
        scores = _score_arrays(scoring, idf, tfs, dls, avgdl)
        tub = float(r["tub_bm25_exact"] if scoring == "bm25" else r["tub_tfidf"])
        bm = None
        if need_bm:
            bm = bm_stored.get(t) or _block_bounds(docids, scores)
        lists.append(
            {
                "docids": docids,
                "scores": scores,
                "tub": tub,
                "bm": bm,
                "qpos": len(lists),  # original query-term order
            }
        )
    lists.sort(key=lambda pl: pl["tub"])  # ascending (MaxScore.java:309-322)

    # candidate-docid upper bound from the FETCHED lists, not n_docs:
    # the incremental segment store's stable docids keep growing while
    # its live n_docs shrinks on supersede, so a doc with docid > n_docs
    # exists and must be scored (a batch build's dense 1..N ids make the
    # two coincide). The lists are docid-sorted, so this is O(|q|).
    max_docid = max(
        (int(pl["docids"][-1]) for pl in lists if len(pl["docids"])),
        default=0,
    )
    slice_fn = {
        "bmw": _bmw_slice, "daat": _daat_vec_slice
    }.get(algo, _maxscore_slice)
    total_postings = sum(len(pl["docids"]) for pl in lists)
    if total_postings <= local_threshold and num_slices is None:
        # serving fast path: the lists are already on the driver (the
        # reference's single-node posture) — score here, no Spark jobs
        local = slice_fn(
            lists, 1, max_docid + 1, k, conjunctive, round_decimals
        )
    else:
        sc = spark.sparkContext
        bc = sc.broadcast(lists)
        p = num_slices or max(2, min(sc.defaultParallelism, 64))
        step = max(1, (max_docid + p) // p)
        ranges = [
            (lo, min(lo + step, max_docid + 1))
            for lo in range(1, max_docid + 1, step)
        ]

        def run_slice(rng):
            lo, hi = rng
            return slice_fn(
                bc.value, lo, hi, k, conjunctive, round_decimals
            )

        local = sc.parallelize(ranges, len(ranges)).flatMap(run_slice).collect()
        bc.unpersist()
    # global top-k with the heap's tie rule: score DESC, docid ASC
    # (scores are already rounded pre-selection when round_decimals set)
    local.sort(key=lambda t: (-t[0], t[1]))
    return "rows", local[:k]


def maxscore_topk_rows(
    index,
    text: str,
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    num_slices: int | None = None,
    round_decimals: int | None = None,
    local_threshold: int = 2_000_000,
    fetch_budget: int | None = None,
    block_max: bool = False,
    algo: str = "maxscore",
    terms: list[str] | None = None,
) -> list[tuple[int, str, float]]:
    """Warm serving surface: top-k as plain (docid, pid, score) rows,
    ZERO Spark jobs on a warmed index with cached posting lists — the
    reference's interactive posture (cli Main.java answers from local
    structures; no cluster round-trip belongs on a 10-row result).
    Falls back to the distributed plan (and one collect) only when the
    df-guard or the max_score flag demands it. ``terms`` bypasses
    query analysis with pre-analyzed terms (warm twin of
    ``query.top_k_terms``; ``text`` is ignored then)."""
    kind, top = _serve(
        index, text, k, conjunctive, scoring, num_slices, round_decimals,
        local_threshold, fetch_budget, block_max, algo, terms,
    )
    if kind == "fallback":
        from .query import top_k, top_k_terms

        if terms is None:
            df = top_k(index, text, k=k, conjunctive=conjunctive,
                       scoring=scoring, round_decimals=round_decimals)
        else:
            df = top_k_terms(index, terms, k=k, conjunctive=conjunctive,
                             scoring=scoring, round_decimals=round_decimals)
        return [(r["docid"], r["pid"], r["score"]) for r in df.collect()]
    pid_map = getattr(index, "pid_map", None)
    if pid_map is not None:
        return [(int(d), pid_map[int(d)], float(s)) for s, d in top]
    if not top:
        return []
    out = index.spark.createDataFrame(
        [(int(d), float(s)) for s, d in top], "docid long, score double"
    )
    resolved = {
        r["docid"]: r["pid"]
        for r in F.broadcast(out)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .collect()
    }
    return [(int(d), resolved[int(d)], float(s)) for s, d in top]


def maxscore_topk(
    index,
    text: str,
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    num_slices: int | None = None,
    round_decimals: int | None = None,
    local_threshold: int = 2_000_000,
    fetch_budget: int | None = None,
    block_max: bool = False,
    algo: str = "maxscore",
) -> DataFrame:
    """Top-k via broadcast posting lists + partition-parallel MaxScore.

    Rank-identical to ``query.top_k`` (exact DAAT); asserted in
    tests/test_maxscore.py on randomized corpora, mirroring the
    reference's own DAAT==MaxScore golden tests.

    Scale guard: the query terms' total posting count (Σ lexicon df) is
    checked BEFORE any posting list leaves the executors. Above
    ``fetch_budget`` postings — a query containing a boilerplate term
    ("license", "import") at 10^12-doc scale — the driver never fetches
    the lists and the query falls back to the fully-distributed
    relational ``query.top_k``, which is rank-identical by construction.

    If the index manifest persists ``max_score: false`` (the reference's
    Flags.java:11-55 third flag), pruning is disabled the same way the
    reference's query node honors the flag: delegate to exact DAAT.

    ``algo`` selects the in-memory kernel: ``"maxscore"`` (default,
    the reference's pruning strategy; ``block_max=True`` adds BMM
    per-block bailouts), ``"bmw"`` (Block-Max WAND, disjunctive only),
    or ``"daat"`` (numpy-vectorized exact scoring — the dense-query
    escape hatch, fastest when the lists overlap heavily and pruning
    cannot skip). All three are rank-identical by construction.

    ``maxscore_topk_rows`` is the same computation without the
    DataFrame wrapper — the warm serving path.
    """
    spark = index.spark
    kind, top = _serve(
        index, text, k, conjunctive, scoring, num_slices, round_decimals,
        local_threshold, fetch_budget, block_max, algo,
    )
    if kind == "fallback":
        from .query import top_k

        return top_k(index, text, k=k, conjunctive=conjunctive,
                     scoring=scoring, round_decimals=round_decimals)
    empty = spark.createDataFrame([], "docid long, pid string, score double")
    if not top:
        return empty
    pid_map = getattr(index, "pid_map", None)
    if pid_map is not None:
        # zero-job pid resolution from the warmed doc map
        rows = [(int(d), pid_map[int(d)], float(s)) for s, d in top]
        return spark.createDataFrame(rows, "docid long, pid string, score double")
    out = spark.createDataFrame(
        [(int(d), float(s)) for s, d in top], "docid long, score double"
    )
    return (
        F.broadcast(out)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .select("docid", "pid", "score")
        .coalesce(1)
        .sortWithinPartitions(F.col("score").desc(), F.col("docid").asc())
    )


def batch_top_k_rows(
    index,
    queries: dict[str, str],
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    round_decimals: int | None = None,
    fetch_budget: int | None = None,
    _delegate: str = "collect",
) -> list[tuple[str, int, str, float, int]]:
    """Warm batch evaluation: every query's result from driver-side
    vectorized scoring, with ONE Spark job for the union of all
    queries' posting lists (and one k·|Q|-row pid join when the doc
    map is not warmed) instead of the relational batch's
    scan-join-aggregate-window pipeline. Returns (qid, docid, pid,
    score, rank) rows, rank 1..k per qid — per-query rank-identical to
    ``query.batch_top_k`` (pytest-pinned).

    The scale posture mirrors ``maxscore_topk_rows``: the lexicon
    already knows Σdf over the union of distinct terms, and when that
    exceeds the driver's fetch budget (a 7,000-query batch over a
    10^12-doc corpus) the function never fetches anything and
    delegates to the fully-distributed ``batch_top_k`` — so this is
    the small-batch/warm-index fast path, not a replacement. Per-term
    score arrays are computed once and SHARED across the queries that
    contain the term (the batch analog of the postings LRU; the
    per-query LRU itself is left untouched to avoid churning warm
    single-query terms out).

    ``_delegate`` is internal plumbing for :func:`batch_top_k_frame`:
    with ``"frame"``, the over-budget branch returns the relational
    batch's DataFrame UNCOLLECTED so sinks never pay a k·|Q|-row
    driver round-trip on exactly the too-big-for-driver path.
    """
    from .query import BATCH_PUSHDOWN_TERM_LIMIT, batch_top_k

    spark = index.spark
    stats = index.stats
    stem_stop = index.manifest["flags"]["stem_stop"]
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    if fetch_budget is None:
        fetch_budget = _default_fetch_budget(spark)

    q_terms = {qid: query_terms(text, stem_stop) for qid, text in queries.items()}
    distinct = sorted({t for ts in q_terms.values() for t in ts})
    if not distinct:
        return []

    lex_cols = ["term", "df", "idf", "tub_tfidf", "tub_bm25_exact"]
    lmap = getattr(index, "lexicon_map", None)
    if lmap is not None:
        by_term = {t: lmap[t] for t in distinct if t in lmap}
    else:
        lex = index.lexicon
        if len(distinct) <= BATCH_PUSHDOWN_TERM_LIMIT:
            lex = lex.filter(F.col("term").isin(distinct))
        else:
            tframe = spark.createDataFrame(
                [(t,) for t in distinct], "term string"
            )
            lex = lex.join(F.broadcast(tframe), "term")
        by_term = {r["term"]: r for r in lex.select(*lex_cols).collect()}

    present = [t for t in distinct if t in by_term]
    total_df = sum(int(by_term[t]["df"]) for t in present)
    if total_df > fetch_budget:
        df = batch_top_k(
            index, queries, k=k, conjunctive=conjunctive,
            scoring=scoring, round_decimals=round_decimals,
        )
        if _delegate == "frame":
            return df
        return [
            (r["qid"], r["docid"], r["pid"], r["score"], r["rank"])
            for r in df.collect()
        ]

    # one fetch for every term not already warm in the single-query LRU
    lru = getattr(index, "_postings_lru", None) or {}
    arrays: dict[str, tuple] = {t: lru[t] for t in present if t in lru}
    to_fetch = [t for t in present if t not in arrays]
    if to_fetch:
        postings = index.postings
        if len(to_fetch) <= BATCH_PUSHDOWN_TERM_LIMIT:
            postings = postings.filter(F.col("term").isin(to_fetch))
        else:
            tframe = spark.createDataFrame(
                [(t,) for t in to_fetch], "term string"
            )
            postings = postings.join(F.broadcast(tframe), "term")
        pdf = postings.select("term", "docid", "tf", "doc_len").toPandas()
        for t, sub in pdf.groupby("term"):
            sub = sub.sort_values("docid")
            arrays[t] = (
                sub["docid"].to_numpy(np.int64),
                sub["tf"].to_numpy(),
                sub["doc_len"].to_numpy(),
            )

    # per-term score arrays shared across queries
    scores: dict[str, np.ndarray] = {}
    for t in present:
        if t not in arrays:
            continue  # df>0 in lexicon implies postings, but stay safe
        docids, tfs, dls = arrays[t]
        scores[t] = _score_arrays(
            scoring, float(by_term[t]["idf"]), tfs, dls, avgdl
        )

    out: list[tuple[str, int, str, float, int]] = []
    HI = 1 << 62
    for qid in queries:
        terms = q_terms[qid]
        if not terms:
            continue
        if conjunctive and any(t not in scores for t in terms):
            continue  # missing-term short-circuit
        lists = [
            {"docids": arrays[t][0], "scores": scores[t], "qpos": i}
            for i, t in enumerate(terms)
            if t in scores
        ]
        if not lists:
            continue
        for rank, (sc, d) in enumerate(
            _daat_vec_slice(lists, 0, HI, k, conjunctive, round_decimals), 1
        ):
            out.append((qid, int(d), None, float(sc), rank))

    pid_map = getattr(index, "pid_map", None)
    if pid_map is not None:
        return [(q, d, pid_map[d], s, r) for q, d, _, s, r in out]
    if not out:
        return []
    hits = spark.createDataFrame(
        [(d,) for d in sorted({d for _, d, _, _, _ in out})], "docid long"
    )
    resolved = {
        r["docid"]: r["pid"]
        for r in F.broadcast(hits)
        .join(index.doc_stats.select("docid", "pid"), "docid")
        .collect()
    }
    return [(q, d, resolved[d], s, r) for q, d, _, s, r in out]


_BATCH_ROWS_SCHEMA = (
    "qid string, docid long, pid string, score double, rank long"
)


def batch_top_k_frame(
    index,
    queries: dict[str, str],
    k: int = 10,
    conjunctive: bool = False,
    scoring: str = "bm25",
    round_decimals: int | None = None,
    fetch_budget: int | None = None,
):
    """DataFrame twin of :func:`batch_top_k_rows` for sinks
    (``cli eval`` → ``write_trec``): under the fetch budget it uploads
    the warm rows once; over the budget it hands the fully-distributed
    relational ``batch_top_k`` DataFrame straight through — the
    too-big-for-driver path never materializes k·|Q| rows on the
    driver just to re-upload them."""
    res = batch_top_k_rows(
        index, queries, k=k, conjunctive=conjunctive, scoring=scoring,
        round_decimals=round_decimals, fetch_budget=fetch_budget,
        _delegate="frame",
    )
    if isinstance(res, list):
        return index.spark.createDataFrame(res, _BATCH_ROWS_SCHEMA)
    return res


def bmw_topk(
    index,
    text: str,
    k: int = 10,
    scoring: str = "bm25",
    num_slices: int | None = None,
    round_decimals: int | None = None,
    local_threshold: int = 2_000_000,
    fetch_budget: int | None = None,
) -> DataFrame:
    """Block-Max WAND top-k (Broder et al. CIKM 2003 + Ding & Suel
    SIGIR 2011, Algorithm 3) — the second dynamic-pruning strategy
    next to MaxScore, sharing the whole serving stack (lexicon memo,
    posting/bounds LRUs, df fetch guard, partition slicing, relational
    fallback). Where MaxScore splits lists into essential and
    non-essential once per threshold change, WAND re-derives a pivot
    from the lists' CURRENT docids every step, so it skips deeper into
    long lists when the threshold is high; the block-max re-check then
    skips whole √df blocks without touching a posting. Both consume
    the same stored blocks/ bounds, and both are rank-identical to
    exact DAAT (strict-> heap, score DESC / docid ASC ties) because
    the bounds are provable (tub_bm25_exact, per-block maxima from the
    serving scorer's own kernel). Disjunctive only, by construction —
    conjunctive queries raise (MaxScore covers them)."""
    return maxscore_topk(
        index, text, k=k, conjunctive=False, scoring=scoring,
        num_slices=num_slices, round_decimals=round_decimals,
        local_threshold=local_threshold, fetch_budget=fetch_budget,
        block_max=True, algo="bmw",
    )


def bmw_topk_rows(
    index,
    text: str,
    k: int = 10,
    scoring: str = "bm25",
    num_slices: int | None = None,
    round_decimals: int | None = None,
    local_threshold: int = 2_000_000,
    fetch_budget: int | None = None,
) -> list[tuple[int, str, float]]:
    """``bmw_topk`` without the DataFrame wrapper — the warm serving
    path (zero Spark jobs on a warmed index), mirroring
    ``maxscore_topk_rows``."""
    return maxscore_topk_rows(
        index, text, k=k, conjunctive=False, scoring=scoring,
        num_slices=num_slices, round_decimals=round_decimals,
        local_threshold=local_threshold, fetch_budget=fetch_budget,
        block_max=True, algo="bmw",
    )
