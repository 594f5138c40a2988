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


def test_fixture_goldens_through_maxscore(spark):
    """QueryProcesserTest's exact golden doubles must survive the
    pruning scorer too (the reference asserts DAAT == MaxScore on the
    same fixtures, QueryProcesserTest.java:29-201)."""
    import math

    from searchengine_spark.operators.frames import IndexFrames
    from searchengine_spark.operators.maxscore import maxscore_topk
    from tests.fixture_loader import load_fixture_index

    s = load_fixture_index()
    n_docs, total_dl = 8, 61
    avgdl = total_dl / n_docs
    postings_rows = [
        (t, d, tf, s["doc_len"][d])
        for t, pl in s["postings"].items()
        for d, tf in pl
    ]
    postings = spark.createDataFrame(
        postings_rows, "term string, docid long, tf int, doc_len int"
    )
    doc_stats = spark.createDataFrame(
        [(d, s["pid_of"][d], dl) for d, dl in s["doc_len"].items()],
        "docid long, pid string, doc_len int",
    )
    lmap = {}
    for t, e in s["lexicon"].items():
        pl = s["postings"][t]
        idf = e["idf"]
        max_tf = max(tf for _, tf in pl)
        max_g = max(
            (1 + math.log10(tf))
            / ((1 + math.log10(tf)) + 1.5 * (0.25 + 0.75 * s["doc_len"][d] / avgdl))
            for d, tf in pl
        )
        lmap[t] = {
            "df": len(pl),
            "idf": idf,
            "tub_tfidf": (1 + math.log10(max_tf)) * idf,
            "tub_bm25_exact": idf * max_g,
        }
    idx = IndexFrames(
        spark, doc_stats, postings, None, None,
        {"n_docs": n_docs, "total_doc_len": total_dl, "avg_doc_len": avgdl,
         "n_terms": len(lmap)},
        {"flags": {"stem_stop": False, "compression": False}},
        lexicon_map=lmap,
    )
    idx.pid_map = {d: p for d, p in s["pid_of"].items()}

    def run(text, conj, scoring, k=3):
        return {
            (r["score"], r["docid"])
            for r in maxscore_topk(idx, text, k=k, conjunctive=conj,
                                   scoring=scoring).collect()
        }

    assert run("another example", True, "bm25") == {
        (0.38158664142011345, 2), (0.2582940702253402, 8),
    }
    assert run("another example", False, "bm25") == {
        (0.38158664142011345, 2), (0.2582940702253402, 8),
        (0.1123005090598549, 3),
    }
    assert run("example", False, "bm25") == {
        (0.1123005090598549, 3), (0.09661547190697509, 2),
        (0.09030875025937561, 5),
    }
    assert run("simple example", True, "bm25") == set()
    assert run("another example", False, "tfidf") == {
        (0.9874180905628003, 8), (0.8061799739838872, 2),
        (0.30150996489407533, 6),
    }
