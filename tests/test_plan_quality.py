"""Physical-plan quality gates: the serving path must push filters and
prune columns down to the parquet scans, and hot-path expressions must
stay inside whole-stage codegen. These are the `.explain("formatted")`
audits from the build plan, frozen as regression tests."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.indexer import IndexConfig, build_index


@pytest.fixture(scope="module")
def disk_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )
    d = tmp_path_factory.mktemp("planidx")
    return build_index(docs, str(d / "idx"), IndexConfig(True, True, overwrite=True))


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_postings_term_filter_pushed_down(disk_index):
    """The query path reads postings WHERE term IN (...); the In filter
    must reach the parquet scan (row-group min/max pruning is the
    binary-search analog, SURVEY §4)."""
    from pyspark.sql import functions as F

    df = disk_index.postings.filter(F.col("term").isin(["spark", "join"]))
    plan = _formatted_plan(df)
    assert "PushedFilters" in plan
    assert "In(term" in plan, plan[:2000]


def test_doc_stats_column_pruning(disk_index):
    """Reading 2 of 4 doc_stats columns must prune the schema at scan."""
    df = disk_index.doc_stats.select("docid", "pid")
    plan = _formatted_plan(df)
    read_schema = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    )
    assert "docid" in read_schema and "pid" in read_schema
    assert "content_sha256" not in read_schema
    assert "doc_len" not in read_schema


def test_scoring_is_jvm_side(disk_index):
    """The per-posting score is a JVM column expression evaluated inside
    the scan-side Project — no Python/UDF anywhere in the scoring hot
    path. (The ordered score fold uses ObjectHashAggregate by design —
    the price of bit-exact summation order; the per-posting math stays
    codegen-compiled in the Project above it.)"""
    from searchengine_spark.operators.query import top_k

    df = top_k(disk_index, "spark join fast", k=10)
    plan = _formatted_plan(df)
    assert "LOG10" in plan  # scoring expression inlined in the scan project
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan


def test_topk_uses_limit_not_global_sort(disk_index):
    """ORDER BY ... LIMIT k must plan as TakeOrderedAndProject — a
    per-partition top-k + driver merge, not a full global sort."""
    from searchengine_spark.operators.query import top_k

    df = top_k(disk_index, "spark join fast", k=10)
    plan = _formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_pid_lookup_is_broadcast_join(disk_index):
    """The k-row result joins doc_stats via broadcast, never a shuffle
    of the (billion-row at scale) doc_stats table."""
    from searchengine_spark.operators.query import top_k

    df = top_k(disk_index, "spark join fast", k=10)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_batch_top_k_plan(disk_index):
    """Batched evaluation: the query frame must reach the postings via
    BROADCAST joins (never a shuffle of the big side keyed on term
    alone), the distinct-term In() filter must push to the postings
    scan, and no cartesian product may appear."""
    from searchengine_spark.operators.query import batch_top_k

    df = batch_top_k(
        disk_index,
        {"q1": "spark join fast", "q2": "hash table scan"},
        k=5,
    )
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "In(term" in plan, plan[:3000]


def test_dedup_plans_have_no_cross_joins(spark):
    """Every dedup pair operator must reach candidates through
    equi-joins (bucket/band/shingle keys) — a CartesianProduct or
    unkeyed BroadcastNestedLoopJoin in these plans is the O(N²)
    scale-killer the LSH designs exist to avoid."""
    from searchengine_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        release_caches,
        simhash_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for name, df in (
        ("minhash", minhash_lsh_pairs(docs)),
        ("simhash", simhash_pairs(docs)),
        ("jaccard", ngram_jaccard_pairs(docs)),
    ):
        plan = _formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    release_caches()


def test_fork_pairs_plan_shape(spark):
    """Repo fork detection must stay in the LSH shape: band equi-joins
    only (no cross join), and the k min-hash signature folds as ONE
    partial-aggregatable hash aggregate over (repo, sha) rows — never
    a per-repo array materialization."""
    from searchengine_spark.operators.forks import fork_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = docs.selectExpr(
        "concat('r', doc_id % 5) AS repo",
        "concat('f', doc_id) AS path",
        "'c' AS commit", "'py' AS lang", "text AS content",
    )
    plan = _formatted_plan(fork_pairs(table))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # signature stage: partial agg before the exchange (map-side mins)
    assert "partial_min" in plan
    assert "collect_list" not in plan and "collect_set" not in plan


def test_ann_plans_have_no_cartesian_product(spark):
    """ANN operators: the bucketed/IVF paths join on equi-keys; the
    brute-force paths broadcast the tiny side (a BroadcastNestedLoop
    over a broadcast of |Q| or n_centroids rows is the intended plan)
    — but a CartesianProduct (both sides big) must never appear."""
    from searchengine_spark.operators.similarity import (
        ann_ivf_top1,
        cosine_neardup_lsh,
        cosine_topk,
        lsh_bucket_top1,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for name, df in (
        ("cosine_topk", cosine_topk(emb, [0, 1, 2], k=3)),
        ("lsh_top1", lsh_bucket_top1(emb)),
        ("ivf_top1", ann_ivf_top1(emb)),
        ("neardup_lsh", cosine_neardup_lsh(emb)),
    ):
        plan = _formatted_plan(df)
        assert "CartesianProduct" not in plan, name
    # the bucketed pair ops specifically must be pure equi-joins
    for name, df in (
        ("lsh_top1", lsh_bucket_top1(emb)),
        ("neardup_lsh", cosine_neardup_lsh(emb)),
    ):
        plan = _formatted_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan, name
