"""Round-2 hardening tests: MaxScore scale guard + round-before-cut,
TSV/tar.gz source parity, batched evaluation, block-assignment path
equivalence, MinHash recall, streaming flag propagation."""

from __future__ import annotations

import random
import tarfile

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.frames import build_index_frames
from searchengine_spark.operators.maxscore import maxscore_topk
from searchengine_spark.operators.query import batch_top_k, top_k
from tests.corpus import make_corpus

VOCAB = [
    "merge", "sort", "batch", "spark", "join", "fast", "hash", "table",
    "scan", "window", "agg", "stream", "slow", "query",
]


def _random_docs(spark, n_docs=120, seed=7):
    rng = random.Random(seed)
    rows = [
        (f"{i:012d}", " ".join(rng.choices(VOCAB, k=rng.randint(3, 40))))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "pid string, content string")


@pytest.fixture(scope="module")
def rand_index(spark):
    return build_index_frames(_random_docs(spark), stem_stop=False)


def _rows(df):
    return [(r["docid"], r["pid"], r["score"]) for r in df.collect()]


def test_fetch_budget_forces_relational_fallback(rand_index):
    """A query whose terms' Σdf exceeds the budget must never gather
    posting lists to the driver — it falls back to distributed top_k,
    rank-identical (the VERDICT r1 driver-OOM guard)."""
    q = "merge sort batch spark"  # fat terms: every doc draws from VOCAB
    full = _rows(maxscore_topk(rand_index, q, k=10))
    guarded = _rows(maxscore_topk(rand_index, q, k=10, fetch_budget=1))
    exact = _rows(top_k(rand_index, q, k=10))
    assert guarded == exact
    assert full == exact
    # LRU must stay empty on the fallback path (nothing was fetched)
    idx2 = build_index_frames(
        _random_docs(rand_index.spark, 40, seed=11), stem_stop=False
    )
    maxscore_topk(idx2, q, k=5, fetch_budget=1).collect()
    assert not getattr(idx2, "_postings_lru", {})


@pytest.mark.parametrize("decimals", [2, 3])
def test_round_before_cut_matches_daat(rand_index, decimals):
    """Coarse rounding manufactures k-boundary ties; selection must be
    decided on ROUNDED scores (round-before-limit), matching top_k and
    the SQL oracle semantics (ADVICE r1)."""
    for q in ("spark join", "hash table scan", "merge sort batch spark"):
        ms = _rows(maxscore_topk(rand_index, q, k=10, round_decimals=decimals))
        daat = _rows(top_k(rand_index, q, k=10, round_decimals=decimals))
        assert ms == daat, (q, decimals)


def test_blockmax_identical_to_daat(rand_index):
    """Block-max pruning (BMM) must be rank-identical to exact DAAT on
    randomized corpora — the bounds are provable, so any divergence is
    a bug, not a trade."""
    queries = (
        "spark join",
        "hash table scan",
        "merge sort batch spark",
        "slow query window agg stream",
    )
    for q in queries:
        for k in (3, 10):
            bm = _rows(
                maxscore_topk(rand_index, q, k=k, round_decimals=9,
                              block_max=True)
            )
            daat = _rows(top_k(rand_index, q, k=k, round_decimals=9))
            assert bm == daat, (q, k)
    # df >= 1024 (BLOCK_DF_THRESHOLD) so lists split into real √df
    # blocks and the per-block bailout actually differs from the TUB
    big = build_index_frames(
        _random_docs(rand_index.spark, 1500, seed=31), stem_stop=False
    )
    assert big.lexicon.filter("df >= 1024").count() > 0
    for q in queries:
        for scoring in ("bm25", "tfidf"):
            bm = _rows(maxscore_topk(big, q, k=10, round_decimals=9,
                                     scoring=scoring, block_max=True))
            daat = _rows(top_k(big, q, k=10, round_decimals=9,
                               scoring=scoring))
            assert bm == daat, (q, scoring)


def test_block_bounds_are_true_bounds():
    """Every posting's score must be <= its block's recorded max under
    the searchsorted block lookup."""
    import numpy as np

    from searchengine_spark.operators.maxscore import _block_bounds

    rng = random.Random(5)
    docids = np.array(sorted(rng.sample(range(1, 100000), 4000)), dtype=np.int64)
    scores = np.array([rng.random() for _ in docids])
    bd, bs = _block_bounds(docids, scores)
    for d, s in zip(docids[::37], scores[::37]):
        j = int(np.searchsorted(bd, d))
        assert j < len(bd) and s <= bs[j]
    # a docid past the last block has zero potential
    assert int(np.searchsorted(bd, int(docids[-1]) + 1)) == len(bd)


def test_batch_top_k_equals_per_query(rand_index):
    qs = {
        "qa": "spark join fast",
        "qb": "hash table scan",
        "qc": "slow query nonexistentterm",
    }
    for conj in (False, True):
        got: dict = {}
        for r in batch_top_k(
            rand_index, qs, k=7, conjunctive=conj, round_decimals=9
        ).collect():
            got.setdefault(r["qid"], []).append(
                (r["rank"], r["docid"], r["pid"], r["score"])
            )
        for qid, text in qs.items():
            want = [
                (i + 1, r["docid"], r["pid"], r["score"])
                for i, r in enumerate(
                    top_k(
                        rand_index, text, k=7, conjunctive=conj,
                        round_decimals=9,
                    ).collect()
                )
            ]
            assert sorted(got.get(qid, [])) == want, (conj, qid)


def test_tsv_and_targz_round_trip(spark, tmp_path):
    """The reference's native pid\\ttext format (Spimi.java:251-255)
    through build -> query: tab split, 2nd-tab truncation (Java
    split[1]), non-ASCII strip, blank-line skip."""
    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.sources.corpus import read_corpus, to_engine_docs

    tsv = tmp_path / "collection.tsv"
    tsv.write_text(
        "1\thello spark world café\n"
        "2\tspark join fast\tdropped-after-second-tab\n"
        "\n"
        "3\tmerge sort batch\n"
    )
    tgz = tmp_path / "collection.tar.gz"
    with tarfile.open(tgz, "w:gz") as t:
        t.add(tsv, arcname="collection.tsv")

    expect = [
        ("1", "hello spark world caf"),
        ("2", "spark join fast"),
        ("3", "merge sort batch"),
    ]
    for src in (str(tsv), str(tgz)):
        docs = to_engine_docs(read_corpus(spark, src))
        assert sorted(
            (r["pid"], r["content"]) for r in docs.collect()
        ) == expect, src

    idx = build_index(
        to_engine_docs(read_corpus(spark, str(tsv))),
        str(tmp_path / "idx"),
        IndexConfig(stem_stop=False, compression=False),
    )
    hits = top_k(idx, "spark fast", k=5).collect()
    assert [r["pid"] for r in hits] == ["2", "1"]


def test_blocks_frame_equals_rank_within_groups(spark):
    """The collect_list block assignment (frames.blocks_frame) and the
    two-pass ranked assignment (indexer._rank_within_groups + sqrt law)
    must produce identical block metadata on a randomized corpus
    (VERDICT r1 #10 behavioral pin)."""
    from searchengine_spark.operators.frames import blocks_frame
    from searchengine_spark.operators.indexer import (
        BLOCK_DF_THRESHOLD,
        _rank_within_groups,
        _release_persisted,
    )

    idx = build_index_frames(_random_docs(spark, 200, seed=23), stem_stop=False)
    postings = idx.postings.cache()
    via_collect = {
        (r["term"], r["block_id"], r["max_docid"], r["num_postings"])
        for r in blocks_frame(postings).collect()
    }

    df_per_term = postings.groupBy("term").agg(F.count("*").alias("df"))
    blk = df_per_term.select(
        "term",
        F.when(
            F.col("df") >= BLOCK_DF_THRESHOLD, F.ceil(F.sqrt(F.col("df")))
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("num_blocks"),
        F.ceil(
            F.col("df")
            / F.when(
                F.col("df") >= BLOCK_DF_THRESHOLD,
                F.ceil(F.sqrt(F.col("df"))),
            ).otherwise(F.lit(1))
        )
        .cast("long")
        .alias("max_per_block"),
    )
    ranked = _rank_within_groups(postings, "term", "docid", "posting_rank")
    via_ranked = {
        (r["term"], r["block_id"], r["max_docid"], r["num_postings"])
        for r in (
            ranked.join(blk.select("term", "max_per_block"), "term")
            .withColumn(
                "block_id",
                (F.col("posting_rank") / F.col("max_per_block")).cast("long"),
            )
            .groupBy("term", "block_id")
            .agg(
                F.max("docid").alias("max_docid"),
                F.count("*").alias("num_postings"),
            )
            .collect()
        )
    }
    _release_persisted()
    postings.unpersist()
    assert via_collect == via_ranked


def test_minhash_recall_on_planted_pairs(spark):
    """Recall of the banded candidate stage at the J>=0.8 threshold on
    the sf0.01 planted near-dup pairs, at the oracle configuration
    (k=16/b=4, expected ~0.88) and the production default (k=128/b=32,
    expected 1.0) — the documented P(candidate)=1-(1-J^r)^b curve."""
    from searchengine_spark.operators.dedup import (
        PRODUCTION_MINHASH_BANDS,
        PRODUCTION_MINHASH_K,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        release_caches,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    planted = {
        (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs).collect()
    }
    assert planted, "corpus should contain planted >=0.8 pairs"

    def recall(k, bands):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, k=k, bands=bands).collect()
        }
        return len(got & planted) / len(planted)

    assert recall(PRODUCTION_MINHASH_K, PRODUCTION_MINHASH_BANDS) == 1.0
    assert recall(16, 4) >= 0.7
    release_caches()


def test_sessionize_property_vs_pure_python(spark):
    """Randomized property check: the DataFrame sessionizer must match
    a direct single-threaded reference implementation on arbitrary
    event sets (gap boundaries, duplicate timestamps, interleaved
    users)."""
    import datetime as dt

    from searchengine_spark.operators.sessions import GAP_MINUTES, sessionize

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(400):
        user = rng.randint(1, 12)
        minutes = rng.randint(0, 5000)
        rows.append(
            (eid, base + dt.timedelta(minutes=minutes), user, "e",
             round(rng.random(), 2), "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    # pure-python reference
    per_user: dict = {}
    for eid, ts, user, _, val, _ in rows:
        per_user.setdefault(user, []).append((ts, eid, val))
    want = set()
    gap = dt.timedelta(minutes=GAP_MINUTES)
    for user, evs in per_user.items():
        evs.sort()
        sid, start, last, n, sv = 0, None, None, 0, 0.0
        for ts, _, val in evs:
            if last is None or ts - last > gap:
                if last is not None:
                    want.add((user, sid, start, last, n, round(sv, 6)))
                sid += 1
                start, n, sv = ts, 0, 0.0
            last = ts
            n += 1
            sv += val
        want.add((user, sid, start, last, n, round(sv, 6)))

    got = {
        (r["user_id"], r["session_id"], r["session_start"],
         r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize(df).collect()
    }
    assert got == want, (len(got), len(want), sorted(got ^ want)[:4])


def test_phrase_search_semantics(spark):
    """Exact phrase matching on hand-built docs: counts occurrences,
    honors order, supports duplicate-term phrases ('b b'), returns
    nothing for non-adjacent terms."""
    from searchengine_spark.operators.phrase import (
        phrase_search,
        positions_frame,
    )

    docs = [
        (1, "a b c a b c".split()),       # "a b" twice, "b c" twice
        (2, "b a c".split()),             # has a,b,c but no "a b"
        (3, "b b b".split()),             # "b b" twice (overlapping)
        (4, "c".split()),
    ]
    dt = spark.createDataFrame(
        [(d, len(t), t) for d, t in docs],
        "docid long, doc_len long, tokens array<string>",
    )
    pos = positions_frame(dt)

    def run(terms, k=10):
        return [
            (r["docid"], r["phrase_tf"])
            for r in phrase_search(pos, terms, k=k).collect()
        ]

    assert run(["a", "b"]) == [(1, 2)]
    assert run(["b", "c"]) == [(1, 2)]
    assert run(["a", "b", "c"]) == [(1, 2)]
    assert run(["b", "b"]) == [(3, 2)]       # overlapping occurrences
    assert run(["c", "a"]) == [(1, 1)]       # "c a" at pos 2->3 in doc 1
    assert run(["a", "c"]) == [(2, 1)]       # "a c" only in doc 2
    assert run(["c", "b"]) == []             # never adjacent anywhere
    assert run(["zz", "b"]) == []            # OOV term
    assert [d for d, _ in run(["b"])] == [3, 1, 2]  # tf desc, docid asc


def test_related_docs_tfidf_semantics(spark):
    """Two near-identical docs must be each other's top-1 related doc;
    the max_term_df guard drops ubiquitous (idf~0) terms without
    changing that."""
    from searchengine_spark.operators.related import related_docs_topk

    rows = [
        ("000000000001", "alpha beta gamma delta common"),
        ("000000000002", "alpha beta gamma delta common"),
        ("000000000003", "omega psi chi phi common"),
        ("000000000004", "zeta eta theta iota common"),
    ]
    docs = spark.createDataFrame(rows, "pid string, content string")
    idx = build_index_frames(docs, stem_stop=False)
    for guard in (None, 3):  # 'common' (df=4) dropped when guard=3
        got = {
            r["docid"]: (r["related_docid"], r["cosine"])
            for r in related_docs_topk(
                idx.postings, idx.lexicon, k=1, max_term_df=guard
            ).collect()
        }
        assert got[1][0] == 2 and got[2][0] == 1, (guard, got)
        assert got[1][1] == 1.0  # identical docs -> cosine exactly 1
    # guarded: docs 3/4 share ONLY the dropped term -> no pair at all
    guarded = related_docs_topk(idx.postings, idx.lexicon, k=1, max_term_df=3)
    assert guarded.filter("docid >= 3").count() == 0


def test_max_shingle_df_stop_shingle_guard(spark):
    """The boilerplate-shingle guard (prefix-filtering analog) must
    drop ultra-common shingles before the inverted self-join — the
    skew-killer at scale — while still recalling true near-dups whose
    similarity rests on their non-boilerplate content."""
    from searchengine_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_caches,
        shingles,
    )

    boiler = "license header apache foundation all rights reserved"
    rows = [
        (i, f"{boiler} unique{i} filler{i} words{i} here{i}")
        for i in range(30)
    ]
    dup = f"{boiler} exact same tail of twelve different tokens " \
          "alpha beta gamma delta"
    rows += [(100, dup), (101, dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    heavy = (
        shingles(df)
        .groupBy("shingle")
        .count()
        .filter(F.col("count") > 5)
        .count()
    )
    assert heavy > 0  # the boilerplate really is ultra-common

    guarded = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, max_shingle_df=5).collect()
    }
    release_caches()
    # identical docs survive the guard at jaccard 1.0 (their reduced
    # shingle sets are still identical); no boilerplate-only pair does
    assert guarded == {(100, 101, 1.0)}, guarded


def test_streaming_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation with a 1-hour watermark across
    two micro-batches: a late event arriving after its window passed
    the watermark must be DROPPED (state already finalized/evicted) —
    the bounded-state guarantee a production stream needs."""
    import datetime as dt
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)

    def write_events(path, hours, start_id=0):
        ts = [base + dt.timedelta(hours=h, minutes=10) for h in hours]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        range(start_id, start_id + len(hours)), pa.int64()
                    ),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([1] * len(hours), pa.int64()),
                    "event_type": pa.array(["click"] * len(hours)),
                    "value": pa.array([1.0] * len(hours)),
                    "props": pa.array(["{}"] * len(hours)),
                }
            ),
            str(path),
        )

    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: hours 0..5 -> watermark 5:10 - 1h = 4:10 persisted in the
    # checkpoint; no window can be emitted yet within this run's batch
    write_events(src / "b1.parquet", [0, 0, 1, 2, 3, 4, 5])
    run_once()
    _time.sleep(0.05)
    # run 2 (same checkpoint): one LATE hour-0 event — its window end
    # (1:00) is far below the restored 4:10 watermark, so the row is
    # dropped and the already-finalized window emits WITHOUT it
    write_events(src / "b2.parquet", [0, 6, 7], start_id=100)
    os.utime(src / "b2.parquet", (_time.time() + 10, _time.time() + 10))
    run_once()

    got = {
        (r["ws"] - base).total_seconds() / 3600: r["n"]
        for r in spark.read.parquet(str(sink)).collect()
    }
    # windows 0-3 finalized under the restored watermark; the late
    # hour-0 arrival was dropped (count 2, not 3); hours 6-7 can never
    # have finalized (watermark ends at 6:10 < window-6 end 7:00)
    assert got.get(0.0) == 2, got
    assert {k: got[k] for k in (1.0, 2.0, 3.0)} == {1.0: 1, 2.0: 1, 3.0: 1}, got
    assert 6.0 not in got and 7.0 not in got, got


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over an availableNow
    backlog must equal the batch window/cumsum operator exactly
    (closed sessions emitted once, the open session in its final
    state)."""
    import shutil

    from searchengine_spark.operators.sessions import (
        sessionize,
        sessionize_stream,
    )

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "events.parquet")

    batch = {
        (r["user_id"], r["session_id"], r["session_start"],
         r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize(spark.read.parquet(str(src))).collect()
    }
    stream = {
        (r["user_id"], r["session_id"], r["session_start"],
         r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize_stream(spark, str(src)).collect()
    }
    assert stream == batch and len(batch) > 50


def test_compact_to_dir_servable(spark, tmp_path):
    """Streaming ingest -> compact_to_dir must yield a disk index that
    InvertedIndex.load serves with results identical to the in-memory
    compacted frames."""
    import __spark_entry__ as e
    from searchengine_spark.operators.indexer import InvertedIndex
    from searchengine_spark.streaming.incremental import (
        compact,
        compact_to_dir,
        start_ingest,
    )

    src = str(tmp_path / "src")
    e._docs(spark, "/root/testdata/sf0.001").limit(80).write.parquet(src)
    q = start_ingest(spark, src, str(tmp_path / "sidx"), stem_stop=False)
    q.awaitTermination(120)
    frames = compact(spark, str(tmp_path / "sidx"))
    disk = compact_to_dir(spark, str(tmp_path / "sidx"), str(tmp_path / "out"))

    loaded = InvertedIndex.load(spark, str(tmp_path / "out"))
    assert loaded.manifest["flags"]["stem_stop"] is False
    assert loaded.stats["n_docs"] == frames.stats["n_docs"]
    for text in ("spark join", "merge sort batch"):
        a = _rows(top_k(frames, text, k=5, round_decimals=9))
        b = _rows(top_k(loaded, text, k=5, round_decimals=9))
        c = _rows(top_k(disk, text, k=5, round_decimals=9))
        assert a == b == c, text


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    """State must carry the OPEN session across micro-batches: events
    continuing a session in a later availableNow run extend it (same
    session_id) rather than starting a new one."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_spark.operators.sessions import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)

    def write(path, minute_offsets, start_id):
        ts = [base + dt.timedelta(minutes=m) for m in minute_offsets]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        range(start_id, start_id + len(ts)), pa.int64()
                    ),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([7] * len(ts), pa.int64()),
                    "event_type": pa.array(["click"] * len(ts)),
                    "value": pa.array([1.0] * len(ts)),
                    "props": pa.array(["{}"] * len(ts)),
                }
            ),
            str(path),
        )

    # batch 1: two events 10 min apart -> one open session
    write(src / "b1.parquet", [0, 10], 0)
    df1 = sessionize_stream(spark, str(src))
    s1 = {(r["session_id"], r["n_events"]) for r in df1.collect()}
    assert s1 == {(1, 2)}, s1
    # NOTE: sessionize_stream names its memory sink by source path, so a
    # second run over the same dir resumes nothing (fresh query, fresh
    # state). Simulate the continuation by starting from scratch with
    # both files present but maxFilesPerTrigger=1 — Structured Streaming
    # then delivers two micro-batches through the SAME query/state.
    import time as _time

    write(src / "b2.parquet", [20, 80], 100)  # 20' continues; 80' new
    import os

    os.utime(src / "b2.parquet", (_time.time() + 10, _time.time() + 10))
    from pyspark.sql.streaming.state import GroupStateTimeout

    from searchengine_spark.operators.sessions import (
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        _session_func,
    )

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_func(30),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_2batch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("sess_2batch").collect()
    # keep the LAST emission per (user, session) — the update contract
    last: dict = {}
    for r in rows:
        last[(r["user_id"], r["session_id"])] = (
            r["n_events"], r["sum_value"]
        )
    # session 1 = events at 0,10,20 min (state extended across batches);
    # session 2 = the event at 80 min
    assert last == {(7, 1): (3, 3.0), (7, 2): (1, 1.0)}, (rows, last)


def test_streaming_compact_honors_ingest_stem_stop(spark, tmp_path):
    """compact() must serve queries with the ingest's analysis chain:
    stem_stop=False postings queried with an unstemmed query term that
    a Porter-stemmed chain would mangle ('merges' -> 'merg')."""
    from searchengine_spark.streaming.incremental import compact, start_ingest

    docs = spark.createDataFrame(
        [("d1", "merges merges tables"), ("d2", "spark tables")],
        "pid string, content string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    q = start_ingest(spark, src, str(tmp_path / "idx"), stem_stop=False)
    q.awaitTermination(120)
    idx = compact(spark, str(tmp_path / "idx"))
    assert idx.manifest["flags"]["stem_stop"] is False
    # 'merges' exists only unstemmed; a stem_stop=True query chain would
    # look up 'merg' and find nothing
    hits = top_k(idx, "merges", k=5).collect()
    assert [r["pid"] for r in hits] == ["d1"]
