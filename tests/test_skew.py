"""Skew handling: the salted two-phase lexicon aggregation must equal
the unsalted one exactly, on a deliberately skewed corpus (one
boilerplate term in every doc — the stopword-heavy code-term shape the
north rule calls out)."""

from __future__ import annotations

import random

import pytest

from searchengine_spark.operators.frames import build_index_frames
from searchengine_spark.operators.indexer import (
    compute_lexicon,
    compute_lexicon_salted,
)


@pytest.fixture(scope="module")
def skewed_index(spark):
    rng = random.Random(77)
    rare = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(400):
        # 'license' appears in EVERY doc, multiple times (boilerplate)
        toks = ["license"] * rng.randint(1, 8) + rng.choices(rare, k=rng.randint(0, 5))
        rng.shuffle(toks)
        rows.append((f"f{i:04d}", " ".join(toks)))
    docs = spark.createDataFrame(rows, "pid string, content string")
    return build_index_frames(docs, stem_stop=False)


def test_salted_lexicon_equals_unsalted(skewed_index):
    stats = skewed_index.stats
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    plain = {
        r["term"]: r.asDict()
        for r in compute_lexicon(
            skewed_index.postings, stats["n_docs"], avgdl
        ).collect()
    }
    salted = {
        r["term"]: r.asDict()
        for r in compute_lexicon_salted(
            skewed_index.postings, stats["n_docs"], avgdl, salt_buckets=16
        ).collect()
    }
    assert set(plain) == set(salted)
    for term, row in plain.items():
        srow = salted[term]
        for col in ("df", "max_tf", "bm25_tf", "bm25_dl"):
            assert srow[col] == row[col], (term, col)
        for col in ("idf", "tub_tfidf", "tub_bm25", "tub_bm25_exact"):
            assert srow[col] == pytest.approx(row[col], rel=0, abs=0), (term, col)


def test_skewed_term_df_is_total(skewed_index):
    lex = {r["term"]: r["df"] for r in skewed_index.lexicon.collect()}
    assert lex["license"] == 400  # present in every doc exactly once per doc-term
