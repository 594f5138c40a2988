"""Prefix suggestions + SymSpell spelling correction (operators/
suggest.py) against brute-force Levenshtein over the real vocabulary."""

import pytest

from searchengine_spark.operators.indexer import IndexConfig, build_index
from searchengine_spark.operators.suggest import (
    build_spellings,
    correct_query,
    spell_candidates,
    suggest_prefix,
)

_DOCS = [
    ("1", "spark merge shuffle partition"),
    ("2", "spark spark join broadcast"),
    ("3", "sparks fly merge sort"),
    ("4", "shuffle spill partition pruning"),
    ("5", "shark tank"),
]


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("suggest") / "idx"
    docs = spark.createDataFrame(_DOCS, "pid string, content string")
    idx = build_index(docs, str(d), IndexConfig(stem_stop=False,
                                                compression=False))
    build_spellings(idx)
    return idx


def _vocab(sidx):
    return {r["term"]: r["df"] for r in sidx.lexicon.collect()}


@pytest.mark.parametrize("q", ["spark", "spork", "sparkk", "park", "merg",
                               "xyzzy", "shuffle", "shufle"])
def test_spell_candidates_match_brute_force(sidx, q):
    vocab = _vocab(sidx)
    want = sorted(
        ((t, df) for t, df in vocab.items() if _lev(q, t) <= 1),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = [(r["term"], r["df"]) for r in spell_candidates(sidx, q).collect()]
    assert got == want, q


def test_correct_query(sidx):
    got = correct_query(sidx, "spork merg shuffle xyzzy")
    vocab = _vocab(sidx)
    # spork -> spark (df 2) beats sparks/shark (df 1); merg -> merge;
    # in-vocab identity; far-OOV -> None
    assert got["spork"] == "spark" and vocab["spark"] == 2
    assert got["merg"] == "merge"
    assert got["shuffle"] == "shuffle"
    assert got["xyzzy"] is None


def test_correct_query_tiebreak_and_empty(sidx):
    # 'hark' is distance 1 from 'sharks'? no — from 'sharl'? build the
    # tie explicitly: 'sparky' ~1~ {'spark' df2, 'sparks' df1} -> spark
    assert correct_query(sidx, "sparky")["sparky"] == "spark"
    assert correct_query(sidx, "") == {}


def test_suggest_prefix(sidx):
    vocab = _vocab(sidx)
    want = sorted(
        ((t, df) for t, df in vocab.items() if t.startswith("sp")),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [(r["term"], r["df"]) for r in suggest_prefix(sidx, "sp").collect()]
    assert got == want
    assert suggest_prefix(sidx, "zz").count() == 0


def test_correct_query_warm_in_vocab_runs_zero_jobs(sidx):
    """On a warmed index an all-in-vocabulary query corrects (to
    itself) without any Spark job — the lexicon map short-circuits the
    spellings scan, preserving the repl's warm zero-job posture."""
    sidx.warm()
    spark = sidx.spark
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    got = correct_query(sidx, "spark merge")
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    assert got == {"spark": "spark", "merge": "merge"}
    # OOV terms still correct through the scan on the same warmed index
    assert correct_query(sidx, "spark spork")["spork"] == "spark"


def test_lev1_property_vs_dp():
    """The serving-side one-pass edit-distance-<=1 check must agree
    with full DP Levenshtein on adversarial short strings (repeats,
    shared prefixes/suffixes, transpositions — distance 2 in plain
    Levenshtein — and length gaps)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchengine_spark.operators.suggest import _lev1

    word = st.text(alphabet="abc", min_size=0, max_size=6)

    @settings(max_examples=500, deadline=None)
    @given(word, word)
    def check(a, b):
        assert _lev1(a, b) == (_lev(a, b) <= 1), (a, b)

    check()


def test_spellings_missing_artifact_raises(spark, tmp_path):
    docs = spark.createDataFrame(_DOCS[:2], "pid string, content string")
    idx = build_index(docs, str(tmp_path / "bare"),
                      IndexConfig(stem_stop=False, compression=False))
    with pytest.raises(ValueError, match="spellings"):
        spell_candidates(idx, "spark").collect()


def test_spell_lookup_is_point_pruned(sidx):
    """The serving filter must reach the parquet scan as an In filter
    on del_key — the artifact is sorted by del_key precisely so this
    prunes row groups at vocabulary scale."""
    df = spell_candidates(sidx, "spork")
    plan = df._jdf.queryExecution().explainString(
        sidx.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("del_key" in ln and "In(" in ln for ln in pushed), pushed
