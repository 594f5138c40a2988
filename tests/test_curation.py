"""Curation operators: connected-component dedup clusters, hash
splits/sampling, sequence packing (distributed prefix sum), PII
redaction, mixture weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.curation import (
    hash_sample,
    hash_split,
    mixture_weights,
    pack_sequences,
    pii_redact,
)
from searchengine_spark.operators.dedup import (
    cluster_dedup_corpus,
    connected_components,
    duplicate_clusters,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(int(n),) for n in node_ids], "doc_id long")
    if edge_pairs:
        edges = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edge_pairs], "doc_a long, doc_b long"
        )
    else:
        edges = spark.createDataFrame([], "doc_a long, doc_b long")
    out = connected_components(nodes, edges, **kw)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_cc_chain_collapses_to_min(spark):
    # a 12-node chain: diameter 11 >> the O(log d) round budget
    labels = _cc(spark, range(100, 112), [(i, i + 1) for i in range(100, 111)])
    assert labels == {i: 100 for i in range(100, 112)}


def test_cc_components_and_singletons(spark):
    labels = _cc(
        spark,
        [1, 2, 3, 7, 8, 9, 42],
        [(2, 3), (1, 3), (8, 9), (7, 9)],
    )
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7, 42: 42}


def test_cc_local_min_trap(spark):
    # node 5 is a local min among its neighbors {6} but NOT the
    # component min (0 connects via 6): pure pointer jumping without
    # re-propagation would leave 5 mislabeled
    labels = _cc(spark, [0, 5, 6], [(5, 6), (0, 6)])
    assert labels == {0: 0, 5: 0, 6: 0}


def test_cc_non_convergence_raises(spark):
    # local_threshold=0 pins the DISTRIBUTED loop (the driver union-find
    # fast path would solve this 40-node chain without iterating)
    with pytest.raises(RuntimeError):
        _cc(
            spark,
            range(0, 40),
            [(i, i + 1) for i in range(0, 39)],
            max_iter=1,
            local_threshold=0,
        )


def _python_components(node_ids, pairs):
    parent = {int(n): int(n) for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component min (roots are minimal by the min-union rule)
    return {n: find(n) for n in parent}


def test_duplicate_clusters_match_union_find(spark):
    """The real operator vs a driver-side union-find on the same
    LSH-verified pair set."""
    from searchengine_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs).collect()
    }
    pair_rows = [
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    ]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = _python_components(ids, pair_rows)
    assert got == want
    assert any(v != k for k, v in got.items())  # non-trivial clusters exist


def test_cluster_dedup_corpus_keeps_one_per_cluster(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clusters = duplicate_clusters(docs)
    kept = cluster_dedup_corpus(docs, clusters)
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert kept.count() == n_clusters
    # representatives are exactly the cluster ids
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want_ids = {r["cluster_id"] for r in clusters.select("cluster_id").distinct().collect()}
    assert kept_ids == want_ids


# ---------------------------------------------------------------------------
# hash split / sample
# ---------------------------------------------------------------------------


def test_hash_split_deterministic_disjoint_complete(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, fr, seed="s").select("doc_id", "split").collect()
    b = hash_split(docs, fr, seed="s").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {}
    for r in a:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    n = sum(counts.values())
    assert n == docs.count()
    assert 0.7 < counts["train"] / n < 0.9
    assert counts["val"] + counts["test"] > 0


def test_hash_split_seed_changes_assignment(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fr = {"a": 0.5, "b": 0.5}
    s1 = dict(hash_split(docs, fr, seed="x").select("doc_id", "split").collect())
    s2 = dict(hash_split(docs, fr, seed="y").select("doc_id", "split").collect())
    assert s1 != s2


def test_hash_split_fractions_must_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.2})


def test_hash_sample_is_subset_stable_and_nested(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1, seed="z").select("doc_id").collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3, seed="z").select("doc_id").collect()}
    n = docs.count()
    assert s10 <= s30  # thresholds nest: a 10% sample is inside the 30%
    assert 0.02 < len(s10) / n < 0.25
    assert 0.15 < len(s30) / n < 0.45


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_equals_global_window(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = docs.select(
        F.col("doc_id").alias("docid"),
        F.size(F.split(F.col("text"), " ", 0)).alias("n_tokens"),
    )
    got = pack_sequences(counts, seq_len=128)
    from pyspark.sql import Window

    w = Window.orderBy("docid").rowsBetween(Window.unboundedPreceding, -1)
    want = (
        counts.select(
            F.col("docid").cast("long").alias("docid"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
        )
        .withColumn("seq_first", F.expr("start_offset DIV 128"))
        .withColumn(
            "seq_last", F.expr("(start_offset + greatest(n_tokens, 1L) - 1L) DIV 128")
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pack_sequences_spans_are_contiguous_and_start_at_zero(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = docs.select(
        F.col("doc_id").alias("docid"),
        F.size(F.split(F.col("text"), " ", 0)).alias("n_tokens"),
    )
    rows = sorted(map(tuple, pack_sequences(counts, seq_len=64).collect()))
    off = 0
    for _docid, n, start, first, last in rows:
        assert start == off
        assert first == start // 64
        assert last == (start + max(n, 1) - 1) // 64
        off += n


def test_pack_sequences_plan_has_no_single_partition_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = docs.select(
        F.col("doc_id").alias("docid"),
        F.size(F.split(F.col("text"), " ", 0)).alias("n_tokens"),
    )
    plan = pack_sequences(counts, seq_len=128)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # never a global-window collapse
    assert "rangepartitioning" in plan.lower()


def test_pack_sequences_rejects_bad_seq_len(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(1)
    counts = docs.select(F.col("doc_id").alias("docid"), F.lit(3).alias("n_tokens"))
    with pytest.raises(ValueError):
        pack_sequences(counts, seq_len=0)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_pii_redact_planted_patterns(spark):
    rows = [
        (1, "reach me at jane.doe+x@corp.example.com or 555-867-5309 from 192.168.1.77 ok"),
        (2, "no pii here just words"),
        (3, "two mails a@b.io c.d@e.org one ip 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (1, 1, 1)
    assert got[1]["redacted"] == "reach me at <email> or <phone> from <ip> ok"
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 0)
    assert got[2]["redacted"] == "no pii here just words"
    assert (got[3]["n_emails"], got[3]["n_ips"]) == (2, 1)
    assert got[3]["redacted"] == "two mails <email> <email> one ip <ip>"


def test_pii_redact_idempotent(spark):
    rows = [(1, "mail x@y.io ip 1.2.3.4 tel 555-123-4567 end")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = pii_redact(df).collect()[0]["redacted"]
    again = pii_redact(
        spark.createDataFrame([(1, once)], "doc_id long, text string")
    ).collect()[0]
    assert again["redacted"] == once
    assert (again["n_emails"], again["n_phones"], again["n_ips"]) == (0, 0, 0)


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------


def _lang_frame(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        F.element_at(
            F.array(F.lit("py"), F.lit("go"), F.lit("md")),
            ((F.col("doc_id") % 3) + 1).cast("int"),
        ).alias("lang"),
        F.col("text").alias("content"),
    )


def test_mixture_weights_sum_to_one_and_cover_groups(spark):
    out = mixture_weights(_lang_frame(spark), alpha=0.7).collect()
    assert {r["lang"] for r in out} == {"py", "go", "md"}
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-6
    assert all(r["n_docs"] > 0 and r["n_tokens"] > 0 for r in out)


def test_mixture_weights_alpha_limits(spark):
    df = _lang_frame(spark)
    prop = {r["lang"]: r for r in mixture_weights(df, alpha=1.0).collect()}
    tot = sum(r["n_tokens"] for r in prop.values())
    for lang, r in prop.items():
        assert abs(r["weight"] - r["n_tokens"] / tot) < 1e-8  # alpha=1 proportional
    unif = mixture_weights(df, alpha=0.0).collect()
    for r in unif:
        assert abs(r["weight"] - 1.0 / 3.0) < 1e-9  # alpha=0 uniform
