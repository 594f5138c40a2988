"""Round-5 additions: the streamed-index OPTIMIZE stage (blocks/ with
stored block-max scores + gap-VB packed postings/positions derived from
a streamed/compacted index, no batch rebuild), the incremental segment
store's disk handoff, and supporting fixes."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _write_docs_file(df, path):
    pq.write_table(pa.Table.from_pandas(df.toPandas()), str(path))


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_docstore_point_lookup_contract(spark, tmp_path):
    """write_docstore's layout contract: (1) every parquet file covers
    a tight, NON-OVERLAPPING pid range (the property that makes min/max
    pruning effective for a k-row In(pid) render at any corpus size),
    (2) the render's In filter is pushed to the scan, and (3) a k-pid
    read touches only the row groups whose range contains those pids."""
    import pyarrow.parquet as pq_mod

    import __spark_entry__ as e
    from searchengine_spark.sources.sinks import write_docstore

    docs = e._docs(spark, "/root/testdata/sf0.001")
    store = str(tmp_path / "docstore")
    write_docstore(docs, store, num_partitions=8)

    # (1) sorted, disjoint per-file pid ranges
    import glob

    ranges = []
    for f in glob.glob(f"{store}/*.parquet"):
        md = pq_mod.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "pid"
            )
            ranges.append((col.statistics.min, col.statistics.max))
    ranges.sort()
    assert ranges, "docstore wrote no row groups"
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping pid ranges: {hi1} > {lo2}"

    # (2) pushed In(pid) on the k-row render read
    pids = [r["pid"] for r in docs.orderBy("pid").limit(3).collect()]
    scan = spark.read.parquet(store).filter(F.col("pid").isin(pids))
    plan = _formatted_plan(scan)
    assert "PushedFilters" in plan and "In(pid" in plan, plan

    # (3) with disjoint sorted ranges, only the row groups containing
    # the k pids can match the pushed filter's min/max check
    matching = [
        (lo, hi) for lo, hi in ranges if any(lo <= p <= hi for p in pids)
    ]
    assert len(matching) <= 3
    assert scan.count() == 3


def _topk_by_pid(idx, q, **kw):
    from searchengine_spark.operators.maxscore import maxscore_topk

    return [
        (r["pid"], round(r["score"], 9))
        for r in maxscore_topk(idx, q, k=10, round_decimals=9, **kw).collect()
    ]


def _phrase_by_pid(idx, terms):
    from searchengine_spark.operators.phrase import phrase_search_indexed

    res = phrase_search_indexed(idx, terms, k=1000)
    return {
        (r["pid"], r["phrase_tf"])
        for r in res.join(
            idx.doc_stats.select("docid", "pid"), "docid"
        ).collect()
    }


@pytest.fixture(scope="module")
def optimized_vs_batch(spark, tmp_path_factory):
    """Streamed ingest (2 micro-batches, one superseding re-ingest)
    -> compact_to_dir(optimize=True) next to a compression batch build
    over the same final corpus."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.streaming.incremental import (
        compact_to_dir,
        start_ingest,
    )

    tmp = tmp_path_factory.mktemp("opt")
    base = (
        e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(80).cache()
    )
    redo_pid = base.orderBy("pid").first()["pid"]
    src = tmp / "src"
    src.mkdir()
    _write_docs_file(base, src / "f1.parquet")
    sidx = str(tmp / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    pq.write_table(
        pa.table(
            {
                "pid": [redo_pid, "zzznew"],
                "content": ["alpha beta alpha beta", "alpha beta spark join"],
            }
        ),
        str(src / "f2.parquet"),
    )
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)

    opt = compact_to_dir(spark, sidx, str(tmp / "out"), optimize=True)

    final = base.filter(F.col("pid") != redo_pid).unionByName(
        spark.createDataFrame(
            [
                (redo_pid, "alpha beta alpha beta"),
                ("zzznew", "alpha beta spark join"),
            ],
            "pid string, content string",
        )
    )
    batch = build_index(
        final,
        str(tmp / "batch"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    return opt, batch, tmp


def test_optimize_flags_and_artifacts(optimized_vs_batch):
    opt, batch, _ = optimized_vs_batch
    flags = opt.manifest["flags"]
    assert flags["compression"] is True
    assert flags["positions"] is True
    assert flags["positions_packed"] is True
    # stored block-max structure present, same schema as the batch build
    assert set(opt.blocks.columns) == set(batch.blocks.columns)
    assert "bmax_bm25" in opt.blocks.columns
    assert "num_blocks" in opt.lexicon.columns
    assert "block_id" in opt.postings.columns


def test_optimize_postings_rows_equal_batch(optimized_vs_batch):
    """compact_to_dir assigns dense docids by pid exactly like the batch
    build, so after optimize the FULL postings rows (block ids included)
    and the packed blocks must match the batch compression build."""
    opt, batch, _ = optimized_vs_batch
    cols = ["term", "docid", "tf", "doc_len", "block_id"]
    got = {tuple(r) for r in opt.postings.select(*cols).collect()}
    want = {tuple(r) for r in batch.postings.select(*cols).collect()}
    assert got == want
    pcols = [
        "term", "block_id", "num_postings", "max_docid",
        "docids_vb", "tfs_unary",
    ]
    gotp = {tuple(r) for r in opt.postings_packed.select(*pcols).collect()}
    wantp = {tuple(r) for r in batch.postings_packed.select(*pcols).collect()}
    assert gotp == wantp


def test_optimize_blocks_bmax_equal_batch(optimized_vs_batch):
    opt, batch, _ = optimized_vs_batch
    cols = [
        "term", "block_id", "max_docid", "num_postings",
        "bmax_bm25", "bmax_tfidf",
    ]
    got = {tuple(r) for r in opt.blocks.select(*cols).collect()}
    want = {tuple(r) for r in batch.blocks.select(*cols).collect()}
    assert got == want


def test_optimize_serves_blockmax_maxscore(optimized_vs_batch):
    opt, batch, _ = optimized_vs_batch
    for q in ("alpha beta", "spark join", "the quick data"):
        got = _topk_by_pid(opt, q, block_max=True)
        want = _topk_by_pid(batch, q, block_max=True)
        assert got == want, q
        # and block-max pruning stays rank-identical to exact DAAT
        assert got == _topk_by_pid(opt, q, block_max=False), q


def test_optimize_serves_packed_phrase(optimized_vs_batch):
    opt, batch, _ = optimized_vs_batch
    for terms in (["alpha", "beta"], ["spark", "join"]):
        assert _phrase_by_pid(opt, terms) == _phrase_by_pid(batch, terms)


def test_optimize_idempotent(spark, optimized_vs_batch):
    """Re-running optimize on an already-optimized dir is a cheap no-op
    (every artifact resume-checks), and the index still serves."""
    from searchengine_spark.operators.indexer import optimize_index

    opt, batch, tmp = optimized_vs_batch
    again = optimize_index(spark, str(tmp / "out"))
    assert _topk_by_pid(again, "alpha beta", block_max=True) == _topk_by_pid(
        batch, "alpha beta", block_max=True
    )


def test_bm25f_full_model(spark, tmp_path):
    """True multi-field BM25F: (1) the disk path (stage-7 field
    postings with tf/field_len + manifest avg_field_len) equals the
    in-memory frames path (on-the-fly field postings) row-for-row,
    (2) a path-only match enters the candidate set (the old presence
    boost could never admit it), and (3) a term that IS the filename
    outranks the same term buried in a long path."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
        docs_from_code_table,
    )
    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.query import bm25f_top_k

    code = spark.createDataFrame(
        [
            ("r1", "alpha.py", "c1", "py", "data join merge"),
            ("r1", "deep/nested/path/alpha/util.py", "c2", "py", "data merge"),
            ("r2", "beta.py", "c3", "py", "alpha alpha data"),
            ("r2", "gamma.py", "c4", "py", "data stream"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    docs = docs_from_code_table(code)
    disk = build_index(
        docs,
        str(tmp_path / "fidx"),
        IndexConfig(stem_stop=False, compression=False, fields=True),
    )
    assert disk.manifest["stats"]["avg_field_len"] > 0
    frames = build_index_frames(docs, stem_stop=False)

    got_disk = [
        (r["pid"], r["score"])
        for r in bm25f_top_k(disk, "alpha", k=10, round_decimals=9).collect()
    ]
    got_frames = [
        (r["pid"], r["score"])
        for r in bm25f_top_k(frames, "alpha", k=10, round_decimals=9).collect()
    ]
    assert got_disk == got_frames
    pids = [p for p, _ in got_disk]
    # path-only matches admitted: r1/alpha.py and the nested alpha dir
    # contain 'alpha' only in the path, yet both rank
    assert any(p.startswith("r1/alpha.py@") for p in pids)
    assert any(p.startswith("r1/deep/") for p in pids)
    # filename hit (field_len 3: r1 alpha py) outranks the same term in
    # a long path (field_len 7) — per-field length normalization at work
    short = next(i for i, p in enumerate(pids) if p.startswith("r1/alpha.py@"))
    long_ = next(i for i, p in enumerate(pids) if p.startswith("r1/deep/"))
    assert short < long_


def test_ivf_pq_recall_monotone_in_rerank(spark):
    """IVF-PQ with exact re-rank: recall@1 against the exact
    within-cell search is monotone non-decreasing in the re-rank depth
    and reaches 1.0 once the shortlist covers the cell (the PQ scan
    can then never lose the exact winner — it only orders the
    shortlist)."""
    from searchengine_spark.operators.similarity import (
        ann_ivf_pq_topk,
        ann_ivf_top1,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        r["query_id"]: r["neighbor_id"] for r in ann_ivf_top1(emb).collect()
    }
    assert exact

    def recall(rerank: int) -> float:
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in ann_ivf_pq_topk(emb, k=1, rerank=rerank).collect()
        }
        return sum(got.get(q) == n for q, n in exact.items()) / len(exact)

    r1, r4, r16, rall = recall(1), recall(4), recall(16), recall(10**6)
    assert r1 <= r4 <= r16 <= rall
    assert rall == 1.0
    # sanity floor: i.i.d. gaussian embeddings are the WORST case for
    # PQ (no cluster structure, near-uniform cosines), yet rerank=1
    # recall must still beat the ~1/|cell| ~= 0.03 random baseline by
    # a wide margin (measured 0.228 on this fixture)
    assert r1 > 0.1


def test_incremental_to_dir_optimized(spark, tmp_path):
    """O(delta) segment store -> compact_incremental_to_dir(optimize=True):
    block-max MaxScore and packed phrase serving on STABLE docids, equal
    per pid to a batch compression build over the final corpus."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.streaming.incremental import (
        compact_incremental,
        compact_incremental_to_dir,
        start_ingest,
    )

    base = (
        e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(50).cache()
    )
    redo_pid = base.orderBy("pid").first()["pid"]
    src = tmp_path / "src"
    src.mkdir()
    _write_docs_file(base, src / "f1.parquet")
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    compact_incremental(spark, sidx)  # segment 0
    pq.write_table(
        pa.table(
            {
                "pid": [redo_pid, "zzznew"],
                "content": ["alpha beta alpha beta", "alpha beta spark join"],
            }
        ),
        str(src / "f2.parquet"),
    )
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    opt = compact_incremental_to_dir(
        spark, sidx, str(tmp_path / "out"), optimize=True
    )  # segment 1 folds in here

    final = base.filter(F.col("pid") != redo_pid).unionByName(
        spark.createDataFrame(
            [
                (redo_pid, "alpha beta alpha beta"),
                ("zzznew", "alpha beta spark join"),
            ],
            "pid string, content string",
        )
    )
    batch = build_index(
        final,
        str(tmp_path / "batch"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    assert opt.manifest["flags"]["positions_packed"] is True
    for q in ("alpha beta", "spark join"):
        # docids differ (stable segment ids vs dense rebuild) — compare
        # by pid; scores are docid-independent
        got = sorted(_topk_by_pid(opt, q, block_max=True))
        want = sorted(_topk_by_pid(batch, q, block_max=True))
        assert got == want, q
    for terms in (["alpha", "beta"], ["spark", "join"]):
        assert _phrase_by_pid(opt, terms) == _phrase_by_pid(batch, terms)
    # tombstoned positions are gone from the packed artifact too
    assert (redo_pid, 2) in _phrase_by_pid(opt, ["alpha", "beta"])


def test_driver_memory_parse_spark_semantics():
    """spark.driver.memory follows Spark's byteStringAsMb: a UNITLESS
    value is MiB (parsing '4096' as bytes would collapse every derived
    budget — maxscore fetch, dedup CC edges — to its floor), and the
    two-letter JVM suffixes are accepted."""
    from searchengine_spark.operators.dedup import (
        CC_LOCAL_EDGE_LIMIT,
        _default_cc_edge_budget,
    )
    from searchengine_spark.operators.maxscore import driver_memory_bytes

    class _Conf:
        def __init__(self, v):
            self.v = v

        def get(self, key, default=None):
            return self.v

    class _SC:
        def __init__(self, v):
            self._c = _Conf(v)

        def getConf(self):
            return self._c

    class _Spark:
        def __init__(self, v):
            self.sparkContext = _SC(v)
            self.conf = _Conf(v)

    cases = {
        "4096": 4096 << 20,  # unitless = MiB, NOT bytes
        "1g": 1 << 30,
        "512m": 512 << 20,
        "2gb": 2 << 30,
        "1024kb": 1 << 20,
        "123b": 123,
        "2t": 2 << 40,
    }
    for raw, want in cases.items():
        assert driver_memory_bytes(_Spark(raw)) == want, raw

    # the CC edge budget never drops below the memory-unaware constant,
    # and scales up with driver memory above it
    assert _default_cc_edge_budget(_Spark("64m")) == CC_LOCAL_EDGE_LIMIT
    assert _default_cc_edge_budget(_Spark("8g")) > CC_LOCAL_EDGE_LIMIT


def test_optimize_recovers_from_swap_crash(spark, optimized_vs_batch):
    """A process killed inside _swap_dir — dst renamed aside, tmp not
    yet renamed in — leaves postings/ missing, postings__old/ holding
    the intact pre-swap data, and a leftover postings__opt/ tmp. The
    next optimize_index must rename the old dir back, clear the tmp,
    and serve (docstring crash-safety contract)."""
    import shutil as _sh

    from searchengine_spark.operators.indexer import optimize_index

    opt, _, tmp = optimized_vs_batch
    root = tmp / "out"
    n_before = opt.postings.count()
    _sh.copytree(str(root / "postings"), str(root / "postings__opt"))
    (root / "postings").rename(root / "postings__old")
    healed = optimize_index(spark, str(root))
    assert (root / "postings").exists()
    assert not (root / "postings__old").exists()
    assert not (root / "postings__opt").exists()
    assert "block_id" in healed.postings.columns
    assert healed.postings.count() == n_before


def test_recompaction_invalidates_derived_artifacts(spark, tmp_path):
    """A second compact_to_dir(optimize=True) into the SAME servable
    dir must re-derive blocks/ and the packed artifacts: recompaction
    reassigns docids and shifts every score, so the previous run's
    block-max bounds and packed docid streams are stale even though
    their _SUCCESS markers survive — optimize_index's per-artifact
    resume checks cannot tell a resumed run from a previous corpus, so
    the handoff deletes derived artifacts up front. Also pins the
    DEFERRED path (compact with optimize=False, optimize_index later),
    which is the background-schedule posture the docstrings advertise
    and the only remaining user of optimize_index's own postings
    rewrite."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
        optimize_index,
    )
    from searchengine_spark.streaming.incremental import (
        compact_to_dir,
        start_ingest,
    )

    base = (
        e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(40).cache()
    )
    src = tmp_path / "src"
    src.mkdir()
    _write_docs_file(base, src / "f1.parquet")
    sidx = str(tmp_path / "sidx")
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    out = str(tmp_path / "out")
    compact_to_dir(spark, sidx, out, optimize=True)

    # grow the corpus with a pid that sorts FIRST (every docid shifts,
    # so every stale artifact is maximally wrong), re-ingest, re-compact
    # into the SAME dir
    pq.write_table(
        pa.table(
            {
                "pid": ["aaa_first", "zzz_last"],
                "content": ["alpha beta alpha", "alpha beta spark join"],
            }
        ),
        str(src / "f2.parquet"),
    )
    assert start_ingest(
        spark, str(src), sidx, stem_stop=False, positions=True
    ).awaitTermination(180)
    opt2 = compact_to_dir(spark, sidx, out, optimize=True)

    final = base.unionByName(
        spark.createDataFrame(
            [
                ("aaa_first", "alpha beta alpha"),
                ("zzz_last", "alpha beta spark join"),
            ],
            "pid string, content string",
        )
    )
    batch = build_index(
        final,
        str(tmp_path / "batch"),
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    pcols = ["term", "docid", "tf", "doc_len", "block_id"]
    assert {tuple(r) for r in opt2.postings.select(*pcols).collect()} == {
        tuple(r) for r in batch.postings.select(*pcols).collect()
    }
    bcols = [
        "term", "block_id", "max_docid", "num_postings",
        "bmax_bm25", "bmax_tfidf",
    ]
    assert {tuple(r) for r in opt2.blocks.select(*bcols).collect()} == {
        tuple(r) for r in batch.blocks.select(*bcols).collect()
    }
    for q in ("alpha beta", "spark join"):
        got = _topk_by_pid(opt2, q, block_max=True)
        assert got == _topk_by_pid(batch, q, block_max=True), q
        assert got == _topk_by_pid(opt2, q, block_max=False), q
    assert _phrase_by_pid(opt2, ["alpha", "beta"]) == _phrase_by_pid(
        batch, ["alpha", "beta"]
    )

    # deferred optimize: plain handoff now, optimize_index on a later
    # schedule — optimize_index's own postings/lexicon rewrite path
    out2 = str(tmp_path / "out2")
    compact_to_dir(spark, sidx, out2, optimize=False)
    deferred = optimize_index(spark, out2)
    assert {tuple(r) for r in deferred.postings.select(*pcols).collect()} == {
        tuple(r) for r in batch.postings.select(*pcols).collect()
    }
    assert {tuple(r) for r in deferred.blocks.select(*bcols).collect()} == {
        tuple(r) for r in batch.blocks.select(*bcols).collect()
    }
    assert _topk_by_pid(deferred, "alpha beta", block_max=True) == _topk_by_pid(
        batch, "alpha beta", block_max=True
    )


def test_positional_build_rerun_resumes(spark, tmp_path):
    """An idempotent re-run (and therefore a crash-resume) of a
    positions+fields build must NOT raise "index flags mismatch":
    stages 6-7 persist positions_packed/fields into the manifest as
    they complete, and those are stage-presence records, not the
    semantic resume identity (stem_stop/compression/max_score)."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
    )

    docs = e._docs(spark, "/root/testdata/sf0.001").orderBy("pid").limit(30)
    cfg = IndexConfig(
        stem_stop=False, compression=True, positions=True, fields=True
    )
    idx1 = build_index(docs, str(tmp_path / "idx"), cfg)
    n = idx1.postings.count()
    # same dir, same config: every stage is already complete, so this
    # must be a pure resume — no rebuild, no flags-mismatch ValueError
    idx2 = build_index(docs, str(tmp_path / "idx"), cfg)
    assert idx2.postings.count() == n
    assert idx2.manifest["flags"]["positions_packed"] is True
    assert idx2.manifest["flags"]["fields"] is True
    # a REAL semantic mismatch still raises
    with pytest.raises(ValueError, match="flags mismatch"):
        build_index(
            docs,
            str(tmp_path / "idx"),
            IndexConfig(stem_stop=True, compression=True, positions=True),
        )


def test_pq_indivisible_dim_fails_loudly(spark):
    """A PQ subspace split on an embedding dim not divisible by m must
    raise, not silently drop the trailing dims from the codebooks and
    ADC scores (lossy codes with no error)."""
    from searchengine_spark.operators.similarity import pq_codebooks

    v = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0, 5.0]), (1, [5.0, 4.0, 3.0, 2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="not divisible"):
        pq_codebooks(v, m=2, ks=2).collect()


def test_pq_null_embedding_passes_dim_check(spark):
    """NULL embeddings must NOT trip the PQ dim check: size(NULL) is
    NULL, and a NULL when-condition must fall to the pass-through
    branch, keeping the same null propagation as every other ANN path
    (regression: the adversarial-corpus null row raised)."""
    from searchengine_spark.operators.similarity import (
        ann_ivf_pq_topk,
        pq_codebooks,
    )

    v = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, None), (2, [4.0, 3.0, 2.0, 1.0]),
         (3, [2.0, 2.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # both the codebook path and the full IVF-PQ pipeline survive
    assert pq_codebooks(v, m=2, ks=2).collect() is not None
    rows = ann_ivf_pq_topk(v, k=1, n_centroids=2, m=2, ks=2,
                           rerank=2).collect()
    assert rows is not None


def test_avg_field_len_zero_stat_is_trusted():
    """A manifest-recorded avg_field_len of 0.0 is a valid stat (every
    pid tokenizes to empty) — the manifest branch must take it rather
    than falling through to a doc_stats recompute."""
    from searchengine_spark.operators.query import _avg_field_len

    class _Stub:
        stats = {"avg_field_len": 0.0}

    assert _avg_field_len(_Stub()) == 0.0


def test_bm25f_warm_rows_equal_relational(spark, tmp_path):
    """Warm fielded serving (bm25f_topk_rows: LRU'd content + field
    arrays, union-docid numpy merge, vectorized DAAT accumulation) is
    rank- and score-identical to the relational bm25f_top_k on a
    fields=True disk index — including path-only matches, non-default
    weights/b's, out-of-vocab terms, and empty queries — answers with
    ZERO Spark jobs once warm, and a 1-posting fetch budget delegates
    to the relational plan with the same rows."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        build_index,
        docs_from_code_table,
    )
    from searchengine_spark.operators.query import bm25f_top_k, bm25f_topk_rows

    code = spark.createDataFrame(
        [
            ("r1", "alpha.py", "c1", "py", "data join merge"),
            ("r1", "deep/nested/path/alpha/util.py", "c2", "py", "data merge"),
            ("r2", "beta.py", "c3", "py", "alpha alpha data"),
            ("r2", "gamma.py", "c4", "py", "data stream join"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = build_index(
        docs_from_code_table(code),
        str(tmp_path / "fwidx"),
        IndexConfig(stem_stop=False, compression=False, fields=True),
    )
    cases = [
        ("alpha", {}),                      # path-only matches admitted
        ("data join", {}),
        ("alpha data merge", {"w_path": 3.0, "b_path": 0.4}),
        ("zzz_missing alpha", {}),          # out-of-vocab term skipped
        ("zzz_all_missing", {}),            # fully out-of-vocab
        ("", {}),                           # empty query
    ]
    for text, kw in cases:
        want = [
            (r["docid"], r["pid"], r["score"])
            for r in bm25f_top_k(idx, text, k=10, **kw).collect()
        ]
        got = bm25f_topk_rows(idx, text, k=10, **kw)
        assert [(d, p) for d, p, _ in got] == [(d, p) for d, p, _ in want]
        for (_, _, s1), (_, _, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, rel=1e-12)
        # budget fallback: can never fetch — delegates, same rows
        fb = bm25f_topk_rows(idx, text, k=10, fetch_budget=1, **kw)
        assert [(d, p) for d, p, _ in fb] == [(d, p) for d, p, _ in want]
    # on a WARMED index (lexicon/pid maps + LRU'd arrays — the serving
    # posture) a repeat query runs zero Spark jobs
    idx.warm()
    bm25f_topk_rows(idx, "alpha data merge", k=10, w_path=3.0, b_path=0.4)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    warm = bm25f_topk_rows(idx, "alpha data merge", k=10,
                           w_path=3.0, b_path=0.4)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    assert warm  # and it actually answered


def test_bm25f_warm_rows_on_frames_index(spark):
    """The warm fielded kernel also serves an in-memory frames index
    (no persisted fields stage — the field arrays come through the
    derived field_postings_frame path) with relational parity."""
    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.indexer import docs_from_code_table
    from searchengine_spark.operators.query import bm25f_top_k, bm25f_topk_rows

    code = spark.createDataFrame(
        [
            ("r1", "alpha.py", "c1", "py", "data join merge"),
            ("r2", "beta.py", "c2", "py", "alpha alpha data"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    frames = build_index_frames(docs_from_code_table(code), stem_stop=False)
    want = [
        (r["docid"], r["pid"], r["score"])
        for r in bm25f_top_k(frames, "alpha data", k=10).collect()
    ]
    got = bm25f_topk_rows(frames, "alpha data", k=10)
    assert [(d, p) for d, p, _ in got] == [(d, p) for d, p, _ in want]
    for (_, _, s1), (_, _, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_warm_positional_kernels_equal_relational(spark, tmp_path):
    """Warm phrase/proximity serving (positions LRU + searchsorted
    membership/interval kernels) is rank- and tf-identical to the
    relational phrase_search_indexed / proximity_search_indexed on a
    PACKED positional index — including duplicate query terms, 3-term
    phrases, missing terms, window=0 — answers repeats with zero Spark
    jobs once warm, and a 0-posting budget delegates to the relational
    plan with the same rows."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        InvertedIndex,
        build_index,
    )
    from searchengine_spark.operators.phrase import (
        phrase_search_indexed,
        phrase_topk_rows,
        proximity_search_indexed,
        proximity_topk_rows,
    )
    from tests.test_round3 import _random_docs

    d = str(tmp_path / "pidx")
    build_index(
        _random_docs(spark),
        d,
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    idx = InvertedIndex.load(spark, d)
    assert idx.manifest["flags"]["positions_packed"] is True

    phrases = [
        ["spark", "join"],
        ["hash", "table", "scan"],
        ["merge"],
        ["join", "join"],            # duplicate terms are meaningful
        ["spark", "zzz_missing"],    # missing term short-circuits
    ]
    for terms in phrases:
        want = [
            (r["docid"], r["phrase_tf"])
            for r in phrase_search_indexed(idx, terms, k=10).collect()
        ]
        assert phrase_topk_rows(idx, terms, k=10) == want, terms
        assert phrase_topk_rows(idx, terms, k=10, fetch_budget=0) == want

    for terms, window in [
        (["spark", "join"], 3),
        (["hash", "scan", "merge"], 8),
        (["spark", "join"], 0),
        (["spark", "zzz_missing"], 3),
    ]:
        want = [
            (r["docid"], r["prox_tf"])
            for r in proximity_search_indexed(
                idx, terms, window=window, k=10
            ).collect()
        ]
        got = proximity_topk_rows(idx, terms, window=window, k=10)
        assert got == want, (terms, window)
        assert proximity_topk_rows(
            idx, terms, window=window, k=10, fetch_budget=0
        ) == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty phrase"):
        phrase_topk_rows(idx, [])
    with _pytest.raises(ValueError, match="window"):
        proximity_topk_rows(idx, ["spark"], window=-1)

    # warmed repeats run zero Spark jobs (lexicon memo + positions LRU)
    idx.warm()
    phrase_topk_rows(idx, ["spark", "join"], k=10)
    proximity_topk_rows(idx, ["spark", "join"], window=3, k=10)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    assert phrase_topk_rows(idx, ["spark", "join"], k=10)
    assert proximity_topk_rows(idx, ["spark", "join"], window=3, k=10)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after


# ---- Spark-free property test: the vectorized warm positional kernels
# (flat composite-key membership/interval probes, ragged anchor gather,
# bincount tf) must equal a brute-force per-document scorer under the
# engine's order (tf DESC, docid ASC) on adversarial random corpora:
# duplicate query terms, overlapping occurrences, 1-token docs, docs
# missing terms, window 0, k beyond the hit count.

from hypothesis import given, settings
from hypothesis import strategies as st


class _PosStubIndex:
    """Offline stand-in for an InvertedIndex: a warmed lexicon memo and
    a pre-populated positions LRU — so the kernels run with no Spark."""

    def __init__(self, docs: dict[int, list[str]]):
        import numpy as np

        from searchengine_spark.operators.phrase import _flat_entry

        self.lexicon_map = {}
        from collections import OrderedDict

        self._positions_lru = OrderedDict()
        vocab = sorted({t for toks in docs.values() for t in toks})
        for t in vocab:
            docids, plists = [], []
            for d in sorted(docs):
                pos = [i for i, tok in enumerate(docs[d]) if tok == t]
                if pos:
                    docids.append(d)
                    plists.append(np.asarray(pos, dtype=np.int64))
            self.lexicon_map[t] = {
                "df": len(docids),
                "max_tf": max(len(p) for p in plists),
            }
            self._positions_lru[t] = _flat_entry(
                np.asarray(docids, dtype=np.int64), plists
            )


def _brute_phrase(docs, terms, k):
    hits = []
    for d, toks in docs.items():
        tf = sum(
            1
            for s in range(len(toks))
            if all(
                s + i < len(toks) and toks[s + i] == t
                for i, t in enumerate(terms)
            )
        )
        if tf > 0:
            hits.append((d, tf))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _brute_proximity(docs, terms, window, k):
    uniq = list(dict.fromkeys(terms))
    hits = []
    for d, toks in docs.items():
        pos = {t: [i for i, tok in enumerate(toks) if tok == t] for t in uniq}
        if any(not pos[t] for t in uniq):
            continue
        tf = sum(
            1
            for y in pos[uniq[0]]
            if all(
                any(abs(p - y) <= window for p in pos[t])
                for t in uniq[1:]
            )
        )
        if tf > 0:
            hits.append((d, tf))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


@st.composite
def _positional_case(draw):
    docids = sorted(
        draw(st.sets(st.integers(0, 40), min_size=1, max_size=10))
    )
    docs = {
        d: draw(
            st.lists(
                st.sampled_from(["a", "b", "c", "x"]),
                min_size=1,
                max_size=16,
            )
        )
        for d in docids
    }
    terms = draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3)
    )
    return docs, terms


@settings(max_examples=200, deadline=None)
@given(
    case=_positional_case(),
    window=st.integers(0, 4),
    k=st.integers(1, 6),
)
def test_warm_positional_kernels_equal_bruteforce(case, window, k):
    from searchengine_spark.operators.phrase import (
        phrase_topk_rows,
        proximity_topk_rows,
    )

    docs, terms = case
    idx = _PosStubIndex(docs)
    missing = any(t not in idx.lexicon_map for t in terms)

    want_ph = [] if missing else _brute_phrase(docs, terms, k)
    assert phrase_topk_rows(idx, terms, k=k, fetch_budget=1 << 40) == want_ph

    want_px = [] if missing else _brute_proximity(docs, terms, window, k)
    assert (
        proximity_topk_rows(
            idx, terms, window=window, k=k, fetch_budget=1 << 40
        )
        == want_px
    )


def test_flat_entry_unencodable_delegates():
    """A term whose docids or positions exceed the composite key's
    2^31 bound gets a None LRU entry, and the setup head reports
    "fallback" so the kernels delegate to the distributed plan."""
    import numpy as np

    from searchengine_spark.operators.phrase import (
        _flat_entry,
        _warm_positional_setup,
    )

    big = 1 << 31
    assert _flat_entry(
        np.asarray([1, big], dtype=np.int64),
        [np.asarray([0], dtype=np.int64), np.asarray([0], dtype=np.int64)],
    ) is None
    assert _flat_entry(
        np.asarray([1], dtype=np.int64),
        [np.asarray([big], dtype=np.int64)],
    ) is None
    # in-range entries stay encodable right up to the bound
    ok = _flat_entry(
        np.asarray([big - 1], dtype=np.int64),
        [np.asarray([big - 1], dtype=np.int64)],
    )
    assert ok is not None

    class _Stub:
        lexicon_map = {"t": {"df": 1, "max_tf": 1}}
        from collections import OrderedDict

        _positions_lru = OrderedDict({"t": None})

    assert _warm_positional_setup(_Stub(), ["t"], 1 << 40) == "fallback"


def test_ensure_lru_eviction_never_drops_inflight_terms():
    """At the 1000-entry cap, a query mixing the cache's OLDEST warm
    term with a cold term must not evict that warm term during the
    cold fetch (the read that follows would KeyError); recency is
    refreshed on every hit (true LRU, not FIFO), and an oversized
    in-flight query may exceed the cap rather than evict itself."""
    import pandas as pd

    from searchengine_spark.operators.maxscore import _ensure_lru

    class _Idx:
        pass

    def fetch(to_fetch):
        return pd.DataFrame(
            {"term": to_fetch, "docid": [0] * len(to_fetch)}
        )

    def build(sub):
        return ("entry", sub["term"].iloc[0])

    idx = _Idx()
    # fill to the cap: t0000 is the oldest entry
    _ensure_lru(
        idx, "_postings_lru", [f"t{i:04d}" for i in range(1000)],
        fetch, build,
    )
    assert len(idx._postings_lru) == 1000
    # oldest warm term + one cold term: the insert overflows the cap,
    # but the in-flight warm term survives (t0001 is evicted instead)
    lru = _ensure_lru(idx, "_postings_lru", ["t0000", "cold"], fetch, build)
    assert len(lru) == 1000
    assert "t0000" in lru and "cold" in lru and "t0001" not in lru
    # pure-hit recency refresh: touch t0002, then overflow with two
    # cold terms — t0002 outlives the untouched older t0003/t0004
    _ensure_lru(idx, "_postings_lru", ["t0002"], fetch, build)
    _ensure_lru(idx, "_postings_lru", ["c2", "c3"], fetch, build)
    assert "t0002" in idx._postings_lru
    assert "t0003" not in idx._postings_lru
    assert "t0004" not in idx._postings_lru
    # an oversized in-flight query never evicts its own terms
    big = [f"b{i:05d}" for i in range(1001)]
    lru = _ensure_lru(_Idx(), "_postings_lru", big, fetch, build)
    assert all(t in lru for t in big)


def test_batch_top_k_frame_over_budget_stays_distributed(spark, tmp_path):
    """batch_top_k_frame returns the warm rows uploaded under the
    budget and the UNCOLLECTED relational batch frame over it — same
    rows either way, but the at-scale path is a passthrough DataFrame,
    not a k x |Q| driver round-trip."""
    from pyspark.sql import DataFrame

    from searchengine_spark.operators.frames import build_index_frames
    from searchengine_spark.operators.maxscore import batch_top_k_frame

    docs = spark.createDataFrame(
        [("d1", "spark join fast"), ("d2", "spark merge"), ("d3", "join")],
        "pid string, content string",
    )
    idx = build_index_frames(docs, stem_stop=False)
    queries = {"q1": "spark join", "q2": "merge"}

    def rows(df):
        return sorted(
            (r["qid"], r["docid"], r["pid"], r["score"], r["rank"])
            for r in df.collect()
        )

    warm = batch_top_k_frame(idx, queries, k=5)
    assert isinstance(warm, DataFrame)
    delegated = batch_top_k_frame(idx, queries, k=5, fetch_budget=0)
    assert isinstance(delegated, DataFrame)
    assert rows(warm) == rows(delegated)
    assert rows(warm)  # non-empty


def test_search_with_snippets_rows_equal_relational(spark, tmp_path):
    """The warm results-page composition (search_with_snippets_rows:
    warm MaxScore ranking + LRU-side window selection + ONE k-row
    docstore render job) is row-identical to the relational
    search_with_snippets on a packed positional index — including
    non-default width, out-of-vocab terms, empty queries, a hit whose
    docstore row is missing (NULL snippet columns, rank kept), and the
    budget fallback."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        InvertedIndex,
        build_index,
    )
    from searchengine_spark.operators.phrase import (
        search_with_snippets,
        search_with_snippets_rows,
    )
    from tests.test_round3 import _random_docs

    docs = _random_docs(spark)
    d = str(tmp_path / "sidx")
    build_index(
        docs, d,
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    idx = InvertedIndex.load(spark, d)
    idx.warm()

    def rel(text, dframe, **kw):
        return [
            (
                r["docid"], r["pid"], r["score"], r["snippet_start"],
                r["n_matched_terms"], r["snippet"],
            )
            for r in search_with_snippets(
                idx, dframe, text, k=10, **kw
            ).collect()
        ]

    cases = [
        ("spark join", {}),
        ("hash table scan merge", {"width": 4}),
        ("spark zzz_missing", {}),
        ("zzz_all_missing", {}),
        ("", {}),
    ]
    for text, kw in cases:
        want = rel(text, docs, **kw)
        got = search_with_snippets_rows(idx, docs, text, k=10, **kw)
        assert got == want, (text, kw)
        # budget fallback: can never fetch — delegates, same rows
        assert search_with_snippets_rows(
            idx, docs, text, k=10, fetch_budget=0, **kw
        ) == want

    # docstore skew: drop one hit's docstore row — NULL snippet
    # columns, rank kept (the relational LEFT-join semantics)
    first_hit = search_with_snippets_rows(idx, docs, "spark join", k=10)[0]
    docs_skew = docs.filter(F.col("pid") != first_hit[1])
    want = rel("spark join", docs_skew)
    got = search_with_snippets_rows(idx, docs_skew, "spark join", k=10)
    assert got == want
    assert got[0][1] == first_hit[1] and got[0][3:] == (None, None, None)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="width"):
        search_with_snippets_rows(idx, docs, "spark", width=0)


def test_prf_warm_rows_equal_relational(spark, tmp_path):
    """Warm PRF (prf_topk_rows: warm first pass, driver-side
    docid-ordered expansion weight fold with Spark-compatible HALF_UP
    rounding, warm expanded re-run via the pre-analyzed terms bypass)
    selects the same expansion terms and returns rows identical to the
    relational prf_top_k — including tfidf scoring, fb knobs, OOV and
    empty queries, and the count-guarded budget fallback."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        InvertedIndex,
        build_index,
    )
    from searchengine_spark.operators.query import prf_top_k, prf_topk_rows
    from tests.test_round3 import _random_docs

    d = str(tmp_path / "prfidx")
    build_index(
        _random_docs(spark), d,
        IndexConfig(stem_stop=False, compression=False),
    )
    idx = InvertedIndex.load(spark, d)
    idx.warm()

    cases = [
        ("spark join", {}),
        ("hash table", {"fb_docs": 3, "fb_terms": 5}),
        ("merge", {"scoring": "tfidf"}),
        ("spark join fast", {"round_decimals": 6}),
        ("zzz_missing spark", {}),
        ("zzz_all_missing", {}),
        ("", {}),
    ]
    for text, kw in cases:
        want = [
            (r["docid"], r["pid"], r["score"])
            for r in prf_top_k(idx, text, k=10, **kw).collect()
        ]
        got = prf_topk_rows(idx, text, k=10, **kw)
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want], (
            text, kw,
        )
        for (_, _, s1), (_, _, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, rel=1e-12)
        # budget fallback with a COLD forward cache: the retrieval
        # passes delegate (Σdf guard) and the feedback fetch raises
        # over budget -> whole composition delegates; same rows
        if hasattr(idx, "_fwd_lru"):
            idx._fwd_lru.clear()
        fb = prf_topk_rows(idx, text, k=10, fetch_budget=0, **kw)
        assert [(a, b) for a, b, _ in fb] == [(a, b) for a, b, _ in want]
        # warm forward cache: repeat call costs no new fetch (the LRU
        # already holds the feedback vectors) and stays identical
        prf_topk_rows(idx, text, k=10, **kw)
        again = prf_topk_rows(idx, text, k=10, **kw)
        assert [(a, b) for a, b, _ in again] == [
            (a, b) for a, b, _ in want
        ]


def test_snippets_render_token_lru_zero_job_and_per_frame(spark, tmp_path):
    """The snippets render is served from a pid-keyed token LRU on the
    DOCS frame: a repeat page over the same frame runs ZERO Spark jobs,
    and a different docstore frame keeps its own cache (no stale
    tokens across frames)."""
    from searchengine_spark.operators.indexer import (
        IndexConfig,
        InvertedIndex,
        build_index,
    )
    from searchengine_spark.operators.phrase import search_with_snippets_rows
    from tests.test_round3 import _random_docs

    docs = _random_docs(spark)
    d = str(tmp_path / "tlidx")
    build_index(
        docs, d,
        IndexConfig(stem_stop=False, compression=True, positions=True),
    )
    idx = InvertedIndex.load(spark, d)
    idx.warm()

    first = search_with_snippets_rows(idx, docs, "spark join", k=10)
    assert first
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    again = search_with_snippets_rows(idx, docs, "spark join", k=10)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after  # repeat page: zero Spark jobs
    assert again == first

    # a docstore row with NULL content renders a NULL-snippet row
    # (same LEFT semantics as a missing row) instead of crashing the
    # token builder
    from searchengine_spark.operators.phrase import search_with_snippets

    null_pid = first[0][1]
    docs_null = docs.select(
        "pid",
        F.when(F.col("pid") == null_pid, F.lit(None))
        .otherwise(F.col("content"))
        .alias("content"),
    )
    want_null = [
        (r["docid"], r["pid"], r["score"], r["snippet_start"],
         r["n_matched_terms"], r["snippet"])
        for r in search_with_snippets(
            idx, docs_null, "spark join", k=10
        ).collect()
    ]
    got_null = search_with_snippets_rows(idx, docs_null, "spark join", k=10)
    assert got_null == want_null
    # present-but-NULL-content row: window columns kept (from the
    # index positions), only the rendered snippet is NULL
    assert got_null[0][1] == null_pid
    assert got_null[0][3] is not None and got_null[0][5] is None

    # a DIFFERENT docstore frame (one token prepended, shifting
    # every render window) must not see the first frame's cached tokens
    docs2 = docs.select(
        "pid", F.concat(F.lit("zzzz "), F.col("content")).alias("content")
    )
    page2 = search_with_snippets_rows(idx, docs2, "spark join", k=10)
    assert [r[:3] for r in page2] == [r[:3] for r in first]  # same ranking
    snips1 = [r[5] for r in first if r[5] is not None]
    snips2 = [r[5] for r in page2 if r[5] is not None]
    assert snips1 and snips2 and snips1 != snips2  # rendered from docs2
