"""Round-4 regression tests.

Pins the default-path AQE fix: every build-critical range shuffle
passes an explicit partition count so AQE's advisory-size coalescing
can never collapse a small-to-mid corpus to ONE partition (the
documented 18.6 s vs 1.6 s trap on 32 cores at 100k docs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import (
    _n_eff,
    _rank_within_groups,
    assign_dense_ids,
)


def test_n_eff_default_covers_all_cores(spark):
    n = _n_eff(spark)
    assert n >= 2 * spark.sparkContext.defaultParallelism
    assert _n_eff(spark, 7) == 7


def test_assign_dense_ids_default_not_single_partition(spark):
    # tiny input (well under AQE's 64MB advisory target) + default
    # num_partitions must still spread across the explicit count
    df = spark.range(1000).select(F.col("id").alias("pid"))
    out = assign_dense_ids(df, ["pid"])
    assert out.rdd.getNumPartitions() == _n_eff(spark)
    assert out.count() == 1000


def test_bpe_segment_arrow_matches_expression_chain(spark):
    """The Arrow-batched segmenter (rank-dict pairwise merge loop) must
    equal the column-expression chain (one JVM fold per merge, learning
    order) word-for-word on a corpus with chaining/overlap cases."""
    from searchengine_spark.operators.bpe import (
        bpe_learn,
        bpe_segment,
        bpe_segment_expr,
    )

    docs = spark.createDataFrame(
        [
            ("aaaa abab banana low lower lowest",),
            ("newer wider low low banana aab",),
            ("mississippi abracadabra aaa ab",),
        ],
        "text string",
    )
    merges = bpe_learn(docs, 12, checkpoint_every=4)
    assert len(merges) >= 6
    got = {
        r["w"]: tuple(r["pieces"])
        for r in bpe_segment(docs, merges).collect()
    }
    want = {
        r["w"]: tuple(r["pieces"])
        for r in bpe_segment_expr(docs, merges).collect()
    }
    assert got == want


def test_bpe_segment_scales_to_large_merge_table(spark):
    """A 1k-merge table must plan and run — the old chained-HOF
    expression could not (Catalyst expression blowup + interpreted
    folds). Merges unseen in the corpus must be no-ops."""
    from searchengine_spark.operators.bpe import bpe_segment

    docs = spark.createDataFrame([("hello world held help",)], "text string")
    # realistic-shape merge table: a few real merges + ~1k junk merges
    merges = [("h", "e"), ("l", "l"), ("he", "ll")]
    merges += [(f"x{i}", f"y{i}") for i in range(1000)]
    out = {
        r["w"]: tuple(r["pieces"])
        for r in bpe_segment(docs, merges).collect()
    }
    assert out["hello"] == ("hell", "o")
    assert out["world"] == ("w", "o", "r", "l", "d")
    assert out["help"] == ("he", "l", "p")


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_fielded_search_serves_from_field_postings(spark, tmp_path):
    """BM25F layout proper: an index built with fields=True persists
    field_postings/ and fielded_top_k folds the filename boost in via
    a term-pushdown scan of that table — the plan must contain the
    field_postings scan and exactly ONE doc_stats scan (the post-limit
    k-row pid lookup), never a match-set-sized doc_stats join. Results
    must equal the in-memory frames path bit-for-bit."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
        docs_from_code_table,
    )
    from searchengine_spark.operators.query import fielded_top_k

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    code = docs.select(
        F.concat(F.lit("repo"), (F.col("doc_id") % 3).cast("string")).alias("repo"),
        F.concat(
            F.lit("src/"),
            F.element_at(F.split(F.col("text"), " "), 1),
            F.lit(".py"),
        ).alias("path"),
        F.md5(F.col("doc_id").cast("string")).substr(1, 8).alias("commit"),
        F.lit("py").alias("lang"),
        F.col("text").alias("content"),
    )
    adapted = docs_from_code_table(code)
    idx = build_index(
        adapted,
        str(tmp_path / "fidx"),
        IndexConfig(stem_stop=False, compression=False, fields=True),
    )
    assert idx.manifest["flags"]["fields"] is True
    q = "spark join fast"
    served = fielded_top_k(idx, q, k=10, round_decimals=9)
    plan = _formatted_plan(served)
    assert "field_postings" in plan
    assert plan.count("doc_stats") <= plan.count("field_postings")
    # exactly one doc_stats scan: the broadcast pid join after limit
    # (formatted mode puts scan locations on their own Location: lines)
    ds_scans = [
        ln for ln in plan.splitlines()
        if "Location" in ln and "doc_stats" in ln
    ]
    assert len(ds_scans) == 1, plan[:4000]
    got = [(r["docid"], r["pid"], r["score"]) for r in served.collect()]
    frames = build_index_frames(adapted, stem_stop=False)
    want = [
        (r["docid"], r["pid"], r["score"])
        for r in fielded_top_k(frames, q, k=10, round_decimals=9).collect()
    ]
    assert got == want
    assert len(got) == 10


def test_positions_pack_round_trip_and_phrase_parity(spark, tmp_path):
    """Compressed positions: pack -> unpack restores the plain stage
    bit-for-bit, phrase results are identical through either layout,
    and the packed serving plan pushes the In(term) filter onto the
    PACKED parquet scan (below the Arrow decode)."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
    )
    from searchengine_spark.operators.phrase import phrase_search_indexed

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )
    plain = build_index(
        docs,
        str(tmp_path / "plain"),
        IndexConfig(stem_stop=False, compression=False, positions=True),
    )
    packed = build_index(
        docs,
        str(tmp_path / "packed"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    assert packed.manifest["flags"]["positions_packed"] is True

    def rows(df):
        return sorted(
            (r["term"], r["docid"], r["doc_len"], r["tf"], tuple(r["positions"]))
            for r in df.collect()
        )

    assert rows(packed.positions) == rows(plain.positions)

    terms = ["spark", "join"]
    got = [tuple(r) for r in phrase_search_indexed(packed, terms).collect()]
    want = [tuple(r) for r in phrase_search_indexed(plain, terms).collect()]
    assert got == want and len(got) > 0
    plan = _formatted_plan(phrase_search_indexed(packed, terms))
    assert "positions_packed" in plan
    assert "In(term" in plan or "in(term" in plan.lower()


def test_rank_within_groups_default_not_single_partition(spark):
    df = spark.range(2000).select(
        (F.col("id") % 13).alias("g"), F.col("id").alias("o")
    )
    out = _rank_within_groups(df, "g", "o", "rnk")
    assert out.rdd.getNumPartitions() == _n_eff(spark)
    # rank semantics unchanged: 0-based dense rank inside each group
    row = out.filter((F.col("g") == 3) & (F.col("o") == 3)).collect()[0]
    assert row["rnk"] == 0
