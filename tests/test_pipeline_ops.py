"""Unit tests for the training-data pipeline operators (dedup,
similarity, textstats, multimodal) against hand-computed expectations
on tiny crafted inputs."""

from __future__ import annotations

import hashlib
import math

import pytest

from searchengine_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different text about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "dog lazy the over jumps fox brown quick the"),  # permutation of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    got = {
        r["content_sha256"]: (r["keep_doc_id"], r["n_copies"])
        for r in dedup.exact_dup_groups(docs).collect()
    }
    h0 = hashlib.sha256(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert got[h0] == (0, 2)  # docs 0 and 3
    assert len(got) == 4


def test_token_fingerprint_groups(docs):
    got = {r["keep_doc_id"]: r["n_copies"]
           for r in dedup.token_fingerprint_groups(docs).collect()}
    # 0, 3 (exact) and 4 (permutation) share the sorted-token multiset
    assert got[0] == 3
    assert len(got) == 3


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert pairs[(0, 3)] == 1.0
    # doc 0 vs 1: 7 shingles each, 6 shared -> 6/8
    assert pairs[(0, 1)] == pytest.approx(6 / 8, abs=1e-9)
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_exact_and_near(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs  # identical -> identical signature -> candidate
    # near-dup 0-1 has jaccard 0.75; recall not guaranteed but with 6/8
    # overlap and 4 bands it overwhelmingly bands together; don't assert.


def test_simhash_identical_docs_distance_zero(docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[3]
    assert 0 <= sig[0] < (1 << 60)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0
    # permutation 4 has identical tf multiset -> identical simhash
    assert pairs[(0, 4)] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(vectors):
    rows = similarity.cosine_topk(vectors, [0], k=2).collect()
    got = [(r["neighbor_id"], r["cosine"], r["rank"]) for r in rows]
    c01 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert got[0][0] == 1 and got[0][1] == pytest.approx(c01, abs=1e-6)
    assert got[1] == (2, 0.0, 2)  # orthogonal beats the antipode (-1)


def test_lsh_bucket_groups_by_sign(spark):
    # 8+ dims so every LSH_DIM exists; sign of dim 1 splits the buckets
    pos = [1.0] + [0.0] * 63
    neg = [-1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(0, pos), (1, pos), (2, neg)], "vec_id long, embedding array<float>"
    )
    rows = similarity.lsh_bucket_top1(df).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in rows}
    assert got == {0: 1, 1: 0}  # vec 2 is alone in its bucket -> no row


def test_textstats_quality_and_counts(spark):
    df = spark.createDataFrame(
        [(7, "the cat sat on the mat with the cat")], "doc_id long, text string"
    )
    tc = textstats.token_counts(df).collect()[0]
    assert tc["n_ws_tokens"] == 9 and tc["n_bpe_tokens"] == 9
    q = textstats.quality_features(df).collect()[0]
    assert q["n_tokens"] == 9
    assert q["stopword_ratio"] == pytest.approx(3 / 9, abs=1e-6)
    assert q["distinct_ratio"] == pytest.approx(6 / 9, abs=1e-6)


def test_langid_markers_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog"),        # en
            (1, "el gato y la casa"),           # es
            (2, "xyz qrs tuv"),                 # no markers -> und
            (3, "the el"),                      # 1-1 tie -> en < es... both 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(df).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "und"
    assert got[3] == "en"  # tie broken lang-ascending among hit langs: en < es


def test_fingerprints_shingle_window(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in textstats.fingerprints(df).collect()}
    assert rows[0]["n_distinct_shingles"] == 2  # windows "a b c d e","b c d e f"
    assert rows[1]["n_distinct_shingles"] == 1  # short doc -> whole text
    assert rows[0]["min_fingerprint"] > 0


def test_multimodal_features_and_frames(spark):
    text = "x" * 100
    df = spark.createDataFrame([(5, text)], "doc_id long, text string")
    pay = multimodal.with_binary_payload(df)
    feat = multimodal.decode_image_features(pay).collect()[0]
    assert feat["n_bytes"] == 100
    assert feat["byte_sum"] == 100 * ord("x")
    assert feat["payload_sha256"] == hashlib.sha256(text.encode()).hexdigest()
    assert feat["decoder"] == "stub-bytes"
    frames = multimodal.sample_frames(pay).collect()
    # 100 bytes -> 2 frames of 64/36; stride 4 keeps only frame 0
    assert len(frames) == 1
    assert frames[0]["frame_idx"] == 0 and frames[0]["frame_bytes"] == 64
