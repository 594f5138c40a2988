"""MaxScore == DAAT rank-identity, mirroring the reference's own
QueryProcesserTest which asserts DAAT and MaxScore agree on every
fixture (queryProcessing/QueryProcesserTest.java:29-201)."""

from __future__ import annotations

import random

import pytest

from searchengine_spark.operators.frames import build_index_frames
from searchengine_spark.operators.maxscore import maxscore_topk
from searchengine_spark.operators.query import top_k

VOCAB = ["spark", "join", "fast", "slow", "table", "scan", "agg", "row",
         "hash", "merge", "sort", "query", "data", "key", "value"]


@pytest.fixture(scope="module")
def rand_index(spark):
    rng = random.Random(1234)
    rows = [
        (f"d{idx:04d}", " ".join(rng.choices(VOCAB, k=rng.randint(3, 40))))
        for idx in range(300)
    ]
    docs = spark.createDataFrame(rows, "pid string, content string")
    return build_index_frames(docs, stem_stop=False)


QUERIES = [
    ("spark join fast", False, "bm25"),
    ("spark join fast", True, "bm25"),
    ("hash merge", False, "tfidf"),
    ("hash merge sort query", True, "tfidf"),
    ("table scan agg row key", False, "bm25"),
    ("nonexistent spark", True, "bm25"),   # missing-term short-circuit
    ("nonexistent spark", False, "bm25"),  # disjunctive ignores missing
]


@pytest.mark.parametrize("text,conj,scoring", QUERIES)
def test_maxscore_equals_daat(rand_index, text, conj, scoring):
    daat = [
        (r["docid"], r["pid"], r["score"])
        for r in top_k(rand_index, text, k=10, conjunctive=conj, scoring=scoring).collect()
    ]
    ms = [
        (r["docid"], r["pid"], r["score"])
        for r in maxscore_topk(rand_index, text, k=10, conjunctive=conj, scoring=scoring).collect()
    ]
    assert len(daat) == len(ms)
    for (d1, p1, s1), (d2, p2, s2) in zip(daat, ms):
        assert d1 == d2 and p1 == p2
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_maxscore_k_larger_than_matches(rand_index):
    daat = top_k(rand_index, "spark", k=1000).collect()
    ms = maxscore_topk(rand_index, "spark", k=1000).collect()
    assert [r["docid"] for r in daat] == [r["docid"] for r in ms]
