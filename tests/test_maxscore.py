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


@pytest.mark.parametrize("text,conj,scoring", QUERIES)
def test_vectorized_daat_equals_relational_daat(rand_index, text, conj, scoring):
    """algo='daat' (the numpy-vectorized in-memory kernel, the
    dense-query escape hatch) is rank-identical to the relational
    exact DAAT on every fixture, conjunctive included."""
    daat = [
        (r["docid"], r["pid"], r["score"])
        for r in top_k(
            rand_index, text, k=10, conjunctive=conj, scoring=scoring
        ).collect()
    ]
    vec = [
        (r["docid"], r["pid"], r["score"])
        for r in maxscore_topk(
            rand_index, text, k=10, conjunctive=conj, scoring=scoring,
            algo="daat",
        ).collect()
    ]
    assert len(daat) == len(vec)
    for (d1, p1, s1), (d2, p2, s2) in zip(daat, vec):
        assert d1 == d2 and p1 == p2
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_unknown_algo_rejected(rand_index):
    with pytest.raises(ValueError, match="unknown serving algo"):
        maxscore_topk(rand_index, "spark", k=5, algo="wand2")


@pytest.mark.parametrize("conj", [False, True])
def test_batch_top_k_rows_equals_relational_batch(rand_index, conj):
    """Warm batch evaluation (one union-fetch + vectorized per-query
    scoring) is per-query rank-identical to the relational
    batch_top_k, including conjunctive short-circuits, out-of-vocab
    terms, and empty queries; forcing the fetch budget to 1 posting
    exercises the fallback delegation and must change nothing."""
    from searchengine_spark.operators.maxscore import batch_top_k_rows
    from searchengine_spark.operators.query import batch_top_k

    queries = {
        "q1": "spark join fast",
        "q2": "hash merge sort query",
        "q3": "nonexistent spark",   # missing term
        "q4": "zzz_all_missing",     # fully out-of-vocab
        "q5": "",                    # empty after analysis
        "q6": "table scan agg row key value data",
    }
    want = sorted(
        (r["qid"], r["docid"], r["pid"], r["rank"])
        for r in batch_top_k(rand_index, queries, k=7, conjunctive=conj).collect()
    )
    want_scores = {
        (r["qid"], r["docid"]): r["score"]
        for r in batch_top_k(rand_index, queries, k=7, conjunctive=conj).collect()
    }
    got_rows = batch_top_k_rows(rand_index, queries, k=7, conjunctive=conj)
    got = sorted((q, d, p, r) for q, d, p, _, r in got_rows)
    assert got == want
    for q, d, _, s, _ in got_rows:
        assert s == pytest.approx(want_scores[(q, d)], rel=1e-12)
    # fallback: a 1-posting budget can never fetch — delegates to the
    # relational batch and returns the same rows
    fb = sorted(
        (q, d, p, r)
        for q, d, p, _, r in batch_top_k_rows(
            rand_index, queries, k=7, conjunctive=conj, fetch_budget=1
        )
    )
    assert fb == want


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


# ---- Block-Max WAND (Broder CIKM 2003 + Ding & Suel SIGIR 2011) --------
#
# Same contract as MaxScore: a dynamic-pruning device with PROVABLE
# bounds must be rank-identical to exact DAAT — any divergence is a
# bug, not a trade (mirrors the reference's DAAT == MaxScore goldens).

BMW_QUERIES = [
    ("spark join fast", "bm25"),
    ("hash merge", "tfidf"),
    ("table scan agg row key", "bm25"),
    ("nonexistent spark", "bm25"),   # disjunctive ignores missing terms
    ("slow query merge sort data value", "tfidf"),
]


def _bmw_rows(df):
    return [
        (r["docid"], r["pid"], round(r["score"], 9)) for r in df.collect()
    ]


@pytest.mark.parametrize("text,scoring", BMW_QUERIES)
def test_bmw_equals_daat(rand_index, text, scoring):
    from searchengine_spark.operators.maxscore import bmw_topk

    for k in (3, 10, 1000):
        daat = _bmw_rows(
            top_k(rand_index, text, k=k, scoring=scoring, round_decimals=9)
        )
        bmw = _bmw_rows(
            bmw_topk(rand_index, text, k=k, scoring=scoring, round_decimals=9)
        )
        assert daat == bmw, (text, scoring, k)


def test_bmw_round_before_cut(rand_index):
    """Coarse rounding manufactures k-boundary ties; BMW must decide
    selection on ROUNDED scores like top_k and the SQL oracles, and
    pruning with unrounded bounds against the rounded threshold must
    stay safe (round() is monotone, threshold is a fixed point)."""
    from searchengine_spark.operators.maxscore import bmw_topk

    for q in ("spark join", "hash table scan", "merge sort batch spark"):
        for decimals in (2, 3):
            daat = _bmw_rows(top_k(rand_index, q, k=10, round_decimals=decimals))
            bmw = _bmw_rows(bmw_topk(rand_index, q, k=10, round_decimals=decimals))
            assert daat == bmw, (q, decimals)


def test_bmw_sliced_path(rand_index):
    """The partition-parallel slice path (each slice runs BMW over a
    docid range, global merge keeps score DESC / docid ASC) must match
    the single-slice driver path and exact DAAT."""
    from searchengine_spark.operators.maxscore import bmw_topk

    daat = _bmw_rows(top_k(rand_index, "spark join fast", k=10, round_decimals=9))
    bmw = _bmw_rows(
        bmw_topk(rand_index, "spark join fast", k=10, round_decimals=9,
                 num_slices=7)
    )
    assert daat == bmw


def test_bmw_conjunctive_raises(rand_index):
    from searchengine_spark.operators.maxscore import maxscore_topk

    with pytest.raises(ValueError, match="disjunctive"):
        maxscore_topk(rand_index, "spark join", conjunctive=True, algo="bmw")


def test_bmw_real_blocks_big_df(spark):
    """df >= 1024 (BLOCK_DF_THRESHOLD) so lists split into real √df
    blocks and the block-max skip actually jumps block boundaries."""
    from searchengine_spark.operators.maxscore import bmw_topk

    rng = random.Random(31)
    rows = [
        (f"b{idx:04d}", " ".join(rng.choices(VOCAB, k=rng.randint(3, 40))))
        for idx in range(1500)
    ]
    docs = spark.createDataFrame(rows, "pid string, content string")
    big = build_index_frames(docs, stem_stop=False)
    assert big.lexicon.filter("df >= 1024").count() > 0
    for q in ("spark join", "merge sort batch spark",
              "slow query window agg stream"):
        for scoring in ("bm25", "tfidf"):
            daat = _bmw_rows(top_k(big, q, k=10, scoring=scoring,
                                   round_decimals=9))
            bmw = _bmw_rows(bmw_topk(big, q, k=10, scoring=scoring,
                                     round_decimals=9))
            assert daat == bmw, (q, scoring)


def test_bmw_stored_bounds_disk_index(spark, tmp_path):
    """On a disk index the bounds come from the MATERIALIZED blocks/
    table (stage 4 bmax columns), not a recompute — BMW through the
    stored-bounds path must still equal exact DAAT, and the fetch must
    actually hit the stored table."""
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.operators.maxscore import (
        _fetch_block_bounds,
        bmw_topk,
    )

    rng = random.Random(77)
    rows = [
        (f"s{idx:04d}", " ".join(rng.choices(VOCAB, k=rng.randint(3, 30))))
        for idx in range(200)
    ]
    docs = spark.createDataFrame(rows, "pid string, content string")
    idx = build_index(
        docs, str(tmp_path / "bmwidx"),
        IndexConfig(stem_stop=False, compression=False),
    )
    stored = _fetch_block_bounds(idx, ["spark", "join"], "bm25")
    assert set(stored) == {"spark", "join"}  # materialized bmax consumed
    for q in ("spark join fast", "hash merge sort"):
        daat = _bmw_rows(top_k(idx, q, k=10, round_decimals=9))
        bmw = _bmw_rows(bmw_topk(idx, q, k=10, round_decimals=9))
        assert daat == bmw, q


# ---------------------------------------------------------------------------
# Kernel property test: the pruning evaluators vs a brute-force scorer
# ---------------------------------------------------------------------------
# Spark-free hammer over adversarial synthetic posting lists (random
# alignment patterns, 1-4-doc blocks so skips land ON boundaries, ties
# manufactured by rounding, docid-range slices): _bmw_slice and
# _maxscore_slice (with and without block bounds) must equal exact
# brute-force top-k under the engine's order (score DESC, docid ASC,
# strict-> heap == first-maximizer ties, contributions folded in
# query-term order).

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _kernel_lists(draw):
    n_lists = draw(st.integers(1, 5))
    lists = []
    for q in range(n_lists):
        docids = sorted(
            draw(st.sets(st.integers(1, 60), min_size=1, max_size=40))
        )
        scores = [
            draw(
                st.floats(
                    0.01, 10, allow_nan=False, allow_infinity=False
                )
            )
            for _ in docids
        ]
        bd, bs = [], []
        i = 0
        while i < len(docids):  # blocks of width 1-4: boundary-heavy
            j = min(i + draw(st.integers(1, 4)), len(docids))
            bd.append(docids[j - 1])
            bs.append(max(scores[i:j]))
            i = j
        lists.append(
            {
                "docids": np.asarray(docids, dtype=np.int64),
                "scores": np.asarray(scores, dtype=np.float64),
                "bm": (
                    np.asarray(bd, dtype=np.int64),
                    np.asarray(bs, dtype=np.float64),
                ),
                "tub": float(max(scores)),  # tightest bound = most pruning
                "qpos": q,
            }
        )
    return lists


def _brute_topk(lists, lo, hi, k, round_decimals):
    per_doc: dict[int, list[tuple[int, float]]] = {}
    for pl in lists:
        for d, s in zip(pl["docids"], pl["scores"]):
            if lo <= int(d) < hi:
                per_doc.setdefault(int(d), []).append(
                    (pl["qpos"], float(s))
                )
    scored = []
    for d, contribs in per_doc.items():
        contribs.sort()
        x = 0.0
        for _, v in contribs:
            x += v
        if round_decimals is not None:
            x = round(x, round_decimals)
        scored.append((x, d))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


@settings(max_examples=150, deadline=None)
@given(
    lists=_kernel_lists(),
    k=st.integers(1, 12),
    bounds=st.tuples(st.integers(1, 61), st.integers(0, 61)),
    round_decimals=st.sampled_from([None, 1, 2, 9]),
)
def test_kernel_pruning_equals_bruteforce(lists, k, bounds, round_decimals):
    from searchengine_spark.operators.maxscore import (
        _bmw_slice,
        _daat_vec_slice,
        _maxscore_slice,
    )

    lo = bounds[0]
    hi = lo + bounds[1]
    want = _brute_topk(lists, lo, hi, k, round_decimals)

    def got(res):
        return sorted(res, key=lambda t: (-t[0], t[1]))

    assert got(_bmw_slice(lists, lo, hi, k,
                          round_decimals=round_decimals)) == want
    assert got(_daat_vec_slice(lists, lo, hi, k, False,
                               round_decimals=round_decimals)) == want
    assert got(_maxscore_slice(lists, lo, hi, k, False,
                               round_decimals=round_decimals)) == want
    bare = [dict(pl, bm=None) for pl in lists]  # pure-TUB MaxScore path
    assert got(_maxscore_slice(bare, lo, hi, k, False,
                               round_decimals=round_decimals)) == want
    # mixed presence: alternate lists lose their bounds, exercising the
    # per-list tub fallback inside the block-max probe (bml[i] is None)
    mixed = [
        dict(pl, bm=None) if i % 2 else pl for i, pl in enumerate(lists)
    ]
    assert got(_maxscore_slice(mixed, lo, hi, k, False,
                               round_decimals=round_decimals)) == want


@settings(max_examples=60, deadline=None)
@given(lists=_kernel_lists(), k=st.integers(1, 10))
def test_kernel_conjunctive_maxscore_equals_bruteforce(lists, k):
    from searchengine_spark.operators.maxscore import _maxscore_slice

    n_lists = len(lists)
    per_doc: dict[int, list[tuple[int, float]]] = {}
    for pl in lists:
        for d, s in zip(pl["docids"], pl["scores"]):
            per_doc.setdefault(int(d), []).append((pl["qpos"], float(s)))
    scored = []
    for d, contribs in per_doc.items():
        if len(contribs) == n_lists:  # every query term present
            contribs.sort()
            x = 0.0
            for _, v in contribs:
                x += v
            scored.append((x, d))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = scored[:k]
    got = sorted(
        _maxscore_slice(lists, 1, 61, k, conjunctive=True),
        key=lambda t: (-t[0], t[1]),
    )
    assert got == want
    from searchengine_spark.operators.maxscore import _daat_vec_slice

    got_vec = sorted(
        _daat_vec_slice(lists, 1, 61, k, conjunctive=True),
        key=lambda t: (-t[0], t[1]),
    )
    assert got_vec == want
