"""Round-4 regression tests.

Pins the default-path AQE fix: every build-critical range shuffle
passes an explicit partition count so AQE's advisory-size coalescing
can never collapse a small-to-mid corpus to ONE partition (the
documented 18.6 s vs 1.6 s trap on 32 cores at 100k docs).
"""

from __future__ import annotations

import pytest
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


def test_batch_topk_over_budget_skips_in_pushdown(spark):
    """Past BATCH_PUSHDOWN_TERM_LIMIT distinct terms the In() filter
    must NOT be planted on the postings scan (planning an In with 100k
    literals costs more than it saves) — the broadcast join filters
    alone, and results stay identical to the per-query path."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.query import (
        BATCH_PUSHDOWN_TERM_LIMIT,
        batch_top_k,
        top_k,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )
    idx = build_index_frames(docs, stem_stop=False)
    # >10k distinct terms: two real queries + OOV-term padding queries
    queries = {"q1": "spark join fast", "q2": "hash table scan"}
    n_junk = BATCH_PUSHDOWN_TERM_LIMIT // 5 + 10
    for i in range(n_junk):
        queries[f"j{i}"] = " ".join(f"zz{i}x{j}" for j in range(5))
    df = batch_top_k(idx, queries, k=5, round_decimals=9)
    plan = _formatted_plan(df)
    assert "In(term" not in plan
    got = {
        (r["qid"], r["docid"]): r["score"]
        for r in df.filter(F.col("qid").isin(["q1", "q2"])).collect()
    }
    for qid, text in [("q1", "spark join fast"), ("q2", "hash table scan")]:
        want = top_k(idx, text, k=5, round_decimals=9).collect()
        for r in want:
            assert got[(qid, r["docid"])] == r["score"]
    assert len(got) == 10


def _bpe_reference_merges(word_occurrences, n_merges):
    """Pure-Python twin of the trainer loop (the same reference
    test_round3 pins bpe_learn against): corpus-wide adjacent-pair
    counts over word OCCURRENCES, argmax with (cnt DESC, left, right)
    tie-break, greedy leftmost non-overlapping apply."""
    words = [list(w) for w in word_occurrences]
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((left, right))
        merged = left + right
        for syms in words:
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            syms[:] = out
    return merges


def test_bpe_incremental_trainer_matches_full_at_64_merges(spark):
    """The keyed-state trainer must be merge-for-merge identical to
    the trainer semantics over >= 64 merges (vs the pure-Python
    reference the full trainer is itself pinned against, plus a direct
    Spark-to-Spark check at 10 merges), and its per-round stats must
    show late rounds touching only the affected slice."""
    import random

    from searchengine_spark.operators.bpe import (
        bpe_learn,
        bpe_learn_incremental,
    )

    rng = random.Random(7)
    alphabet = "abcdefgh"
    vocab = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 9)))
        for _ in range(160)
    ]
    lines = [
        " ".join(rng.choice(vocab) for _ in range(30)) for _ in range(12)
    ]
    docs = spark.createDataFrame([(t,) for t in lines], "text string")
    occurrences = [w for t in lines for w in t.split(" ") if w]
    want64 = _bpe_reference_merges(occurrences, 64)
    assert len(want64) >= 64
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        stats: list = []
        inc = bpe_learn_incremental(docs, 64, checkpoint_every=1, stats=stats)
        assert inc == want64
        # direct Spark-to-Spark: same head as the full trainer
        assert bpe_learn(docs, 10, checkpoint_every=4) == inc[:10]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    n_words = len(occurrences)
    # O(affected): every round touches at most the words containing
    # the winning pair; late rounds must touch far fewer than all
    assert all(s["affected"] <= n_words for s in stats)
    assert min(s["affected"] for s in stats[-16:]) < n_words // 10


def test_semdedup_giant_cell_compare_groups_bounded(spark):
    """Plant one giant cell (512 identical boilerplate vectors that
    defeat the sign-LSH split, plus distinct fillers) and assert every
    compare group is hard-capped at max_cell_size — and that the dedup
    still drops the identical copies within each block."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.similarity import semdedup

    cap = 64
    dim = 64  # embeddings-table dimensionality (LSH planes index it)
    rows = []
    for i in range(512):  # identical-signature mega-cluster
        rows.append((i, [1.0] * dim))
    for i in range(512, 600):  # distinct fillers with varying signs
        rows.append(
            (i, [float((i + d) % 5) - 2.0 for d in range(dim)])
        )
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semdedup(vecs, n_centroids=1, max_cell_size=cap, debug_buckets=True)
    groups = (
        out.groupBy("cell", "lsub", "blk").count().agg(F.max("count"))
    ).collect()[0][0]
    assert groups <= cap
    ident = out.filter(F.col("vec_id") < 512)
    # identical vectors: exactly one keep per rank block, rest dropped
    keeps = ident.filter("keep").count()
    n_blocks = ident.select("lsub", "blk").distinct().count()
    assert keeps == n_blocks
    assert ident.count() == 512


def test_rank_within_groups_default_not_single_partition(spark):
    df = spark.range(2000).select(
        (F.col("id") % 13).alias("g"), F.col("id").alias("o")
    )
    out = _rank_within_groups(df, "g", "o", "rnk")
    assert out.rdd.getNumPartitions() == _n_eff(spark)
    # rank semantics unchanged: 0-based dense rank inside each group
    row = out.filter((F.col("g") == 3) & (F.col("o") == 3)).collect()[0]
    assert row["rnk"] == 0


def test_served_positions_conjunctive_prefilter(spark):
    """Phrase/proximity serving on a packed index intersects per-term
    docid sets BEFORE the gap-VB decode: only docids containing every
    query term reach unpack_positions, while the disjunctive default
    (snippets) still decodes every per-term row."""
    from types import SimpleNamespace

    from searchengine_spark.operators.indexer import pack_positions
    from searchengine_spark.operators.phrase import _served_positions

    pos = spark.createDataFrame(
        [
            ("a", 1, 4, 1, [0]),
            ("a", 2, 4, 1, [0]),
            ("a", 3, 4, 1, [0]),
            ("b", 2, 4, 1, [1]),
            ("b", 3, 4, 1, [1]),
            ("b", 4, 4, 1, [1]),
        ],
        "term string, docid long, doc_len long, tf int, positions array<int>",
    )
    idx = SimpleNamespace(
        manifest={"flags": {"positions_packed": True}},
        positions_packed=pack_positions(pos),
    )
    conj = _served_positions(idx, ["a", "b"], conjunctive=True).collect()
    assert sorted({r["docid"] for r in conj}) == [2, 3]
    assert len(conj) == 4  # two terms x two intersecting docs
    disj = _served_positions(idx, ["a", "b"]).collect()
    assert len(disj) == 6  # every per-term row decodes
    # decoded payloads are intact through the prefilter join
    got = sorted((r["term"], r["docid"], tuple(r["positions"])) for r in conj)
    assert got == [("a", 2, (0,)), ("a", 3, (0,)), ("b", 2, (1,)), ("b", 3, (1,))]


def test_streaming_positions_serve_phrase(spark, tmp_path):
    """Streamed corpus -> compact_to_dir serves phrase search from a
    positional index identical (per pid) to a batch build over the
    same final corpus, including a pid whose re-ingest in a LATER
    micro-batch supersedes its earlier positions."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import (
        InvertedIndex,
        IndexConfig,
        build_index,
    )
    from searchengine_spark.operators.phrase import phrase_search_indexed
    from searchengine_spark.streaming.incremental import (
        compact_to_dir,
        start_ingest,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(60).cache()
    redo_pid = base.orderBy("pid").first()["pid"]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(base.toPandas()), str(src / "f1.parquet")
    )
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    # batch 2: one superseding re-ingest + one brand-new doc
    pq.write_table(
        pa.table(
            {
                "pid": [redo_pid, "zzznew"],
                "content": ["alpha beta alpha beta", "alpha beta gamma"],
            }
        ),
        str(src / "f2.parquet"),
    )
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)

    compact_to_dir(spark, sidx, str(tmp_path / "out"))
    loaded = InvertedIndex.load(spark, str(tmp_path / "out"))
    assert loaded.manifest["flags"]["positions"] is True
    assert loaded.manifest["flags"]["positions_packed"] is False

    final = base.filter(F.col("pid") != redo_pid).unionByName(
        spark.createDataFrame(
            [(redo_pid, "alpha beta alpha beta"), ("zzznew", "alpha beta gamma")],
            "pid string, content string",
        )
    )
    ref = build_index(
        final,
        str(tmp_path / "batch"),
        IndexConfig(stem_stop=False, compression=False, positions=True),
    )

    def by_pid(idx, terms):
        res = phrase_search_indexed(idx, terms, k=1000)
        return {
            (r["pid"], r["phrase_tf"])
            for r in res.join(
                idx.doc_stats.select("docid", "pid"), "docid"
            ).collect()
        }

    for terms in (["alpha", "beta"], ["spark", "join"]):
        got, want = by_pid(loaded, terms), by_pid(ref, terms)
        assert got == want, terms
    # the superseding re-ingest governs: old content gone, new phrase x2
    assert (redo_pid, 2) in by_pid(loaded, ["alpha", "beta"])


def test_prefilter_cost_switch():
    from searchengine_spark.operators.phrase import (
        PREFILTER_MIN_POSTINGS,
        _decide_prefilter,
    )

    # toy volumes stay on the direct decode path
    assert _decide_prefilter({"a": 10, "b": 20}, ["a", "b"], None) is False
    # web-scale volumes flip to the prefilter
    big = {"a": PREFILTER_MIN_POSTINGS, "b": 1}
    assert _decide_prefilter(big, ["a", "b"], None) is True
    # single-term queries never prefilter (nothing to intersect)
    assert _decide_prefilter({"a": 10**9}, ["a"], None) is False
    # explicit override wins both ways
    assert _decide_prefilter({"a": 1, "b": 1}, ["a", "b"], True) is True
    assert _decide_prefilter(big, ["a", "b"], False) is False


def test_incremental_positions_phrase_parity(spark, tmp_path):
    """O(delta) positional segments: two incremental compactions (the
    second superseding a pid) must serve phrase results identical per
    pid to a batch build over the final corpus, via
    incremental_positions + the incremental frames' lexicon."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.operators.phrase import phrase_search
    from searchengine_spark.streaming.incremental import (
        compact_incremental,
        incremental_positions,
        start_ingest,
    )

    base = e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(50).cache()
    redo_pid = base.orderBy("pid").first()["pid"]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(base.toPandas()), str(src / "f1.parquet")
    )
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    compact_incremental(spark, sidx)  # seg_0

    pq.write_table(
        pa.table(
            {
                "pid": [redo_pid, "zzznew"],
                "content": ["alpha beta alpha beta", "alpha beta gamma"],
            }
        ),
        str(src / "f2.parquet"),
    )
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    frames = compact_incremental(spark, sidx)  # seg_1 + tombstone

    final = base.filter(F.col("pid") != redo_pid).unionByName(
        spark.createDataFrame(
            [(redo_pid, "alpha beta alpha beta"), ("zzznew", "alpha beta gamma")],
            "pid string, content string",
        )
    )
    ref = build_index(
        final,
        str(tmp_path / "batch"),
        IndexConfig(stem_stop=False, compression=False, positions=True),
    )
    pos = incremental_positions(spark, sidx)

    def by_pid(res, doc_stats):
        return {
            (r["pid"], r["phrase_tf"])
            for r in res.join(
                doc_stats.select("docid", "pid"), "docid"
            ).collect()
        }

    for terms in (["alpha", "beta"], ["spark", "join"]):
        got = by_pid(
            phrase_search(pos, terms, k=1000, lexicon=frames.lexicon),
            frames.doc_stats,
        )
        want = by_pid(
            phrase_search(ref.positions, terms, k=1000, lexicon=ref.lexicon),
            ref.doc_stats,
        )
        assert got == want, terms
    assert (redo_pid, 2) in by_pid(
        phrase_search(pos, ["alpha", "beta"], k=1000, lexicon=frames.lexicon),
        frames.doc_stats,
    )


def test_search_with_snippets_topk_restricted(spark, tmp_path):
    """Results-page composition: k hits with snippets, equal to the
    corpus-wide snippet operator restricted to the hit docids, and the
    packed positional scan carries BOTH In(term) and In(docid) filters
    below the Arrow decode."""
    from searchengine_spark.operators.frames import tokenized_docs
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.operators.phrase import (
        _served_positions,
        search_with_snippets,
        snippet_windows,
    )
    from searchengine_spark.operators.query import query_terms

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )
    idx = build_index(
        docs,
        str(tmp_path / "idx"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    text = "spark join fast"
    got = search_with_snippets(idx, docs, text, k=5, width=8).collect()
    assert len(got) == 5
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    terms = query_terms(text, stem_stop=False)
    for r in got:
        assert r["n_matched_terms"] >= 1
        assert any(t in r["snippet"].split() for t in terms), r["snippet"]

    # parity with the corpus-wide operator on the same docids
    hit_ids = {r["docid"] for r in got}
    dt = tokenized_docs(docs, stem_stop=False).select("docid", "tokens")
    full = {
        (r["docid"], r["snippet_start"], r["n_matched_terms"], r["snippet"])
        for r in snippet_windows(
            _served_positions(idx, terms), dt, terms, width=8
        ).collect()
        if r["docid"] in hit_ids
    }
    assert {
        (r["docid"], r["snippet_start"], r["n_matched_terms"], r["snippet"])
        for r in got
    } == full

    # both In() filters sit on the packed scan, below the decode
    plan = _formatted_plan(search_with_snippets(idx, docs, text, k=5, width=8))
    assert "positions_packed" in plan
    low = plan.lower()
    assert low.count("in(term") >= 1 and low.count("in(docid") >= 1, plan[:4000]


def test_stream_flag_mismatch_on_resume(spark, tmp_path):
    """Resuming an ingest with different stem_stop or positions flags
    must refuse (the streaming twin of the batch Flags contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from searchengine_spark.streaming.incremental import start_ingest

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table({"pid": ["a"], "content": ["hello world"]}),
        str(src / "f1.parquet"),
    )
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    with pytest.raises(ValueError, match="flag mismatch"):
        start_ingest(spark, str(src), sidx, stem_stop=False, positions=False)
    with pytest.raises(ValueError, match="flag mismatch"):
        start_ingest(spark, str(src), sidx, stem_stop=True, positions=True)


def test_search_with_snippets_keeps_hit_on_docstore_skew(spark, tmp_path):
    """A top-k hit whose pid is missing from the docs frame (index /
    docstore version skew) must stay on the results page with NULL
    snippet columns, never silently vanish."""
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.operators.phrase import search_with_snippets

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
        F.col("text").alias("content"),
    )
    idx = build_index(
        docs,
        str(tmp_path / "idx"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    full = search_with_snippets(idx, docs, "spark join fast", k=5).collect()
    assert len(full) == 5
    drop_pid = full[0]["pid"]
    skewed = search_with_snippets(
        idx, docs.filter(F.col("pid") != drop_pid), "spark join fast", k=5
    ).collect()
    assert len(skewed) == 5
    gone = [r for r in skewed if r["pid"] == drop_pid]
    assert len(gone) == 1 and gone[0]["snippet"] is None
    kept = {(r["pid"], r["snippet"]) for r in skewed if r["pid"] != drop_pid}
    assert kept == {
        (r["pid"], r["snippet"]) for r in full if r["pid"] != drop_pid
    }


def test_connected_components_local_equals_distributed(spark):
    """The threshold-guarded driver union-find must produce labels
    identical to the distributed min-label/pointer-jump loop on a graph
    with chains, a big component, and singletons."""
    from searchengine_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5, pair 10-11, triangle 20-21-22 (+ redundant edge),
    # self-loop 30-30, singletons 40..44
    edges = spark.createDataFrame(
        [
            (2, 1), (2, 3), (4, 3), (5, 4),
            (11, 10),
            (20, 21), (21, 22), (22, 20),
            (30, 30),
        ],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 20, 21, 22, 30, 40, 41, 42, 43, 44]],
        "doc_id long",
    )
    local = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            nodes, edges, local_threshold=10**9
        ).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            nodes, edges, local_threshold=0
        ).collect()
    }
    assert local == dist
    assert (5, 1) in local and (22, 20) in local and (40, 40) in local


def test_streaming_fields_serve_fielded_search(spark, tmp_path):
    """A streamed code corpus compacted with fields=True serves
    fielded_top_k (BM25F filename boost) identically per pid to a
    batch build with fields=True over the same docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_spark.operators.indexer import (
        IndexConfig,
        InvertedIndex,
        build_index,
    )
    from searchengine_spark.operators.query import fielded_top_k
    from searchengine_spark.streaming.incremental import (
        compact_to_dir,
        start_ingest,
    )

    raw = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).orderBy("doc_id").limit(60)
    docs = raw.select(
        F.concat(
            F.lit("repo"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("/src/"),
            F.element_at(F.split(F.col("text"), " "), 1),
            F.lit(".py@"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
        ).alias("pid"),
        F.col("text").alias("content"),
    ).cache()
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()), str(src / "f1.parquet")
    )
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, fields=True
    ).awaitTermination(180)
    compact_to_dir(spark, sidx, str(tmp_path / "out"))
    loaded = InvertedIndex.load(spark, str(tmp_path / "out"))
    assert loaded.manifest["flags"]["fields"] is True

    ref = build_index(
        docs,
        str(tmp_path / "batch"),
        IndexConfig(stem_stop=False, compression=False, fields=True),
    )
    # the streamed handoff stores the avg-field-len scalar like batch
    # stage 7 does, so a fresh session's first bm25f_top_k reads it
    # instead of recomputing a corpus-wide aggregate
    assert loaded.manifest["stats"]["avg_field_len"] == pytest.approx(
        ref.manifest["stats"]["avg_field_len"]
    )
    q = "spark join fast"
    got = {
        (r["pid"], r["score"])
        for r in fielded_top_k(loaded, q, k=1000, round_decimals=9).collect()
    }
    want = {
        (r["pid"], r["score"])
        for r in fielded_top_k(ref, q, k=1000, round_decimals=9).collect()
    }
    assert got == want and len(got) > 10
    # filename boost actually fires: some doc's path token is a query term
    content_only = {
        (r["pid"], r["score"])
        for r in fielded_top_k(
            loaded, q, k=1000, boost_weight=0.0, round_decimals=9
        ).collect()
    }
    assert got != content_only


def test_cc_ignores_edges_outside_nodes_and_nulls(spark):
    """Edges touching ids absent from `nodes` (or NULL) contribute
    nothing in the distributed loop (its label joins drop them) — the
    fast path must match, or a cluster could be rooted on a non-node
    and lose its keep-representative downstream."""
    from searchengine_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    edges = spark.createDataFrame(
        [(3, 5), (3, 6), (6, 7), (None, 7)],
        "doc_a long, doc_b long",
    )
    for thr in (10**9, 0):  # fast path, distributed path
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(
                nodes, edges, local_threshold=thr
            ).collect()
        }
        # 3 is not a node: (3,5)/(3,6) are ignored, so 5 stays alone
        # and 6-7 form the only cluster
        assert got == {(5, 5), (6, 6), (7, 6)}, (thr, got)
