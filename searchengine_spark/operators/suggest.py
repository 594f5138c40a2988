"""Query-assist serving: prefix suggestions and spelling correction
over the index vocabulary.

The reference engine is an interactive search CLI (SURVEY §3 cli
Main); typos and partial terms are its daily reality, and both
assists are pure functions of the lexicon the build already persists.

Spelling correction is the SymSpell delete-neighborhood scheme (Garbe,
public domain reference implementation; the standard industrial
approach): for edit distance 1, ``lev(q, t) <= 1`` holds iff q == t,
or q is in del1(t) (a deletion in q), or t is in del1(q) (an insertion
in q), or del1(q) and del1(t) intersect (a substitution). So an index
of every vocabulary term keyed by {t} ∪ del1(t) answers a query with
a POINT LOOKUP on the {q} ∪ del1(q) keys — never a vocabulary scan
and never a fuzzy join. ``F.levenshtein`` then verifies the true
distance (the delete-neighborhood is a superset at distance 1 only
for same-length-±1 pairs; verification keeps the semantics exact).

Scale shape: ``spellings/`` is a map-only explode of the lexicon
(|term|+1 rows per term), range-partitioned and sorted by ``del_key``
so the serving ``In(del_key)`` filter prunes row groups by min/max —
the same point-lookup contract as the pid-sorted docstore. Correction
of a whole query is ONE scan with the union of all terms' keys, then
a driver-side verify over the (small) candidate set.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import InvertedIndex, _n_eff

_SPELL_DIR = "spellings"

# one row per {term} ∪ del1(term); del-key generation is a JVM
# higher-order function — no Python boundary in the build
_DELETIONS_EXPR = (
    "array_distinct(concat(array(term), transform(sequence(1, length(term)),"
    " i -> concat(substring(term, 1, i - 1),"
    " substring(term, i + 1, length(term))))))"
)


def build_spellings(index: InvertedIndex) -> None:
    """Derive the optional ``spellings/`` artifact: (del_key, term,
    df), sorted+range-partitioned by del_key for min/max row-group
    pruning under the serving In-filter. Idempotent (overwrite)."""
    lex = index.lexicon.select("term", "df")
    rows = lex.select(
        F.explode(F.expr(_DELETIONS_EXPR)).alias("del_key"), "term", "df"
    )
    (
        rows.repartitionByRange(_n_eff(index.spark), "del_key")
        .sortWithinPartitions("del_key")
        .write.mode("overwrite")
        .parquet(str(Path(index.index_dir) / _SPELL_DIR))
    )


def _spellings(index: InvertedIndex) -> DataFrame:
    df = getattr(index, "_spellings_df", None)
    if df is not None:
        return df
    path = Path(index.index_dir) / _SPELL_DIR
    if not path.exists():
        raise ValueError(
            "index has no spellings/ artifact; run build_spellings(index) "
            "once to enable spelling correction"
        )
    df = index.spark.read.parquet(str(path))
    index._spellings_df = df  # memoized handle (warm-session posture)
    return df


def _del_keys(term: str) -> list[str]:
    return list({term} | {term[:i] + term[i + 1:] for i in range(len(term))})


def _lev1(a: str, b: str) -> bool:
    """Exact ``levenshtein(a, b) <= 1`` in one pass: skip the shared
    prefix, then the tails must match after consuming the single
    allowed edit (substitution for equal lengths, the long side's
    extra char otherwise). Property-pinned against DP Levenshtein."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    i = 0
    while i < min(la, lb) and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1:] == b[i + 1:]
    long, short = (a, b) if la > lb else (b, a)
    return long[i + 1:] == short[i:]


def spell_candidates(
    index: InvertedIndex, term: str, k: int = 5
) -> DataFrame:
    """Top-k (term, df) vocabulary terms within edit distance 1 of
    ``term`` (the term itself included when in-vocabulary), ranked
    df DESC then term ASC. One In(del_key) point lookup + exact
    levenshtein verify."""
    cand = (
        _spellings(index)
        .filter(F.col("del_key").isin(_del_keys(term)))
        .select("term", "df")
        .distinct()
        .filter(F.levenshtein(F.lit(term), F.col("term")) <= 1)
    )
    return cand.orderBy(F.col("df").desc(), "term").limit(k)


def correct_query(
    index: InvertedIndex, text: str, stem_stop: bool | None = None
) -> dict[str, str | None]:
    """{analyzed query term -> best correction}: in-vocabulary terms
    map to themselves; OOV terms map to the df-max (term ASC tiebreak)
    vocabulary term within edit distance 1, or None when nothing is
    within reach. ONE Spark job for the whole query: the union of all
    terms' del-keys drives a single pruned scan, the per-term verify
    runs on the driver over the small candidate set."""
    from .query import query_terms

    if stem_stop is None:
        stem_stop = bool(index.manifest.get("flags", {}).get("stem_stop", True))
    # blank tokens carry no postings (the engine's P8 rule) and have
    # nothing to correct
    terms = [t for t in query_terms(text, stem_stop) if t != ""]
    if not terms:
        return {}
    # warm fast path: a memoized lexicon (index.warm()) answers the
    # common all-in-vocabulary case with ZERO Spark jobs; only the OOV
    # subset pays the spellings point lookup
    known = index.lexicon_map
    if known is not None:
        oov = [t for t in terms if t not in known]
        if not oov:
            return {t: t for t in terms}
        fixes = _correct_oov(index, oov)
        return {t: t if t in known else fixes[t] for t in terms}
    return _correct_oov(index, terms)


def _correct_oov(
    index: InvertedIndex, terms: list[str]
) -> dict[str, str | None]:
    keys = sorted({k for t in terms for k in _del_keys(t)})
    rows = (
        _spellings(index)
        .filter(F.col("del_key").isin(keys))
        .select("term", "df")
        .distinct()
        .collect()
    )
    vocab = {r["term"]: r["df"] for r in rows}
    out: dict[str, str | None] = {}
    for t in terms:
        if t in vocab:
            out[t] = t
            continue
        best = None
        for cand, df in vocab.items():
            if not _lev1(t, cand):
                continue
            if (
                best is None
                or df > best[1]
                or (df == best[1] and cand < best[0])
            ):
                best = (cand, df)
        out[t] = best[0] if best else None
    return out


def suggest_prefix(index: InvertedIndex, prefix: str, k: int = 10) -> DataFrame:
    """Top-k (term, df) vocabulary completions of ``prefix``, df DESC
    then term ASC. The lexicon is written term-sorted, so the
    StartsWith filter prunes row groups by term min/max at any
    vocabulary size."""
    return (
        index.lexicon.filter(F.col("term").startswith(prefix))
        .select("term", "df")
        .orderBy(F.col("df").desc(), "term")
        .limit(k)
    )
