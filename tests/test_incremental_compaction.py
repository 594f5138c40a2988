"""Incremental streaming compaction: O(delta) per call, exact equality
with the full rebuild.

Covers (VERDICT r2 'Next round' #4):
* append-only batches: compact_incremental == compact (full rebuild),
  bit-exact across doc_stats, postings, and EVERY lexicon column
  including the avgdl-dependent tub_bm25_exact (the skyline partial's
  whole point — avgdl drifts between batches);
* docid stability: already-compacted pids keep their docids;
* re-ingestion: superseded docid tombstoned, pid-keyed results equal
  the full rebuild;
* O(delta) evidence: appended posting rows == delta posting rows, and
  untouched terms' partial rows are CARRIED OVER unchanged (only
  touched terms recompute).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from searchengine_spark.streaming.incremental import (
    batch_postings,
    compact,
    compact_incremental,
)

BATCH0 = [
    ("a01", "red fox jumps high"),
    ("a02", "blue fox runs far far away"),
    ("a03", "green turtle sleeps"),
    ("a04", "red turtle jumps and jumps again"),
]
BATCH1 = [
    ("b01", "purple fox sings"),
    ("b02", "red red red fox fox turtle"),
    ("b03", "quiet owl watches the green field"),
]
BATCH2_RESUBMIT = [
    ("a03", "green turtle now swims in the blue sea"),  # supersedes a03
    ("c01", "new crab walks sideways"),
]


def _write_batch(spark, index_dir: str, batch_id: int, docs) -> None:
    df = spark.createDataFrame(docs, "pid string, content string")
    out = batch_postings(df, stem_stop=False).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    )
    (
        out.write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{index_dir}/stage_stream")
    )


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


LEX_COLS = [
    "term", "df", "max_tf", "bm25_tf", "bm25_dl",
    "idf", "tub_tfidf", "tub_bm25", "tub_bm25_exact",
]


def test_append_only_equals_full_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _write_batch(spark, idx, 0, BATCH0)
    inc0 = compact_incremental(spark, idx)
    ids0 = {r["pid"]: r["docid"] for r in inc0.doc_stats.collect()}

    _write_batch(spark, idx, 1, BATCH1)
    inc1 = compact_incremental(spark, idx)
    full = compact(spark, idx)

    assert _rows(inc1.doc_stats, ["docid", "pid", "doc_len", "content_sha256"]) == _rows(
        full.doc_stats, ["docid", "pid", "doc_len", "content_sha256"]
    )
    assert _rows(inc1.postings, ["term", "docid", "tf", "doc_len"]) == _rows(
        full.postings, ["term", "docid", "tf", "doc_len"]
    )
    # exact (unrounded) equality of every derived lexicon column — the
    # avgdl changed between the two compactions, so this pins the
    # skyline-based recomputation of the exact BM25 bound
    assert _rows(inc1.lexicon, LEX_COLS) == _rows(full.lexicon, LEX_COLS)
    assert inc1.stats["n_docs"] == full.stats["n_docs"]
    assert inc1.stats["total_doc_len"] == full.stats["total_doc_len"]

    # docid stability: batch-0 pids keep their ids after compaction 2
    ids1 = {r["pid"]: r["docid"] for r in inc1.doc_stats.collect()}
    for pid, d in ids0.items():
        assert ids1[pid] == d


def test_reingest_tombstones_and_matches_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _write_batch(spark, idx, 0, BATCH0)
    compact_incremental(spark, idx)
    _write_batch(spark, idx, 1, BATCH1)
    compact_incremental(spark, idx)
    _write_batch(spark, idx, 2, BATCH2_RESUBMIT)
    inc = compact_incremental(spark, idx)
    full = compact(spark, idx)

    # docids differ for the re-ingested pid (stable-id contract: new
    # version, new id; full rebuild renumbers) -> compare pid-keyed
    inc_p = inc.postings.join(inc.doc_stats.select("docid", "pid"), "docid")
    full_p = full.postings.join(full.doc_stats.select("docid", "pid"), "docid")
    assert _rows(inc_p, ["term", "pid", "tf", "doc_len"]) == _rows(
        full_p, ["term", "pid", "tf", "doc_len"]
    )
    assert _rows(inc.doc_stats, ["pid", "doc_len", "content_sha256"]) == _rows(
        full.doc_stats, ["pid", "doc_len", "content_sha256"]
    )
    assert _rows(inc.lexicon, LEX_COLS) == _rows(full.lexicon, LEX_COLS)
    # exactly one live row per pid; a03's OLD docid is gone
    pids = [r["pid"] for r in inc.doc_stats.collect()]
    assert len(pids) == len(set(pids)) == full.stats["n_docs"]
    assert inc.stats["n_docs"] == full.stats["n_docs"]
    assert inc.stats["total_doc_len"] == full.stats["total_doc_len"]


def test_compaction_touches_only_delta(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _write_batch(spark, idx, 0, BATCH0)
    compact_incremental(spark, idx)
    _write_batch(spark, idx, 1, BATCH1)
    compact_incremental(spark, idx)

    root = f"{idx}/inc"
    # appended postings == the delta's postings, not the corpus
    seg1 = spark.read.parquet(f"{root}/postings/seg_1")
    delta_n = batch_postings(
        spark.createDataFrame(BATCH1, "pid string, content string"),
        stem_stop=False,
    ).count()
    assert seg1.count() == delta_n

    # untouched terms' partials are carried over byte-identical
    p0 = spark.read.parquet(f"{root}/partials/seg_0")
    p1 = spark.read.parquet(f"{root}/partials/seg_1")
    delta_terms = {
        r["term"]
        for r in spark.read.parquet(f"{root}/postings/seg_1")
        .select("term").distinct().collect()
    }
    untouched0 = p0.filter(~F.col("term").isin(list(delta_terms)))
    untouched1 = p1.filter(~F.col("term").isin(list(delta_terms)))
    cols = ["term", "df", "max_tf", "best", "skyline"]
    assert untouched0.count() > 0  # the test corpus really has untouched terms
    assert _rows(untouched0, cols) == _rows(untouched1, cols)


def test_idempotent_when_no_new_batches(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _write_batch(spark, idx, 0, BATCH0)
    a = compact_incremental(spark, idx)
    b = compact_incremental(spark, idx)  # no new batch -> serve committed
    assert _rows(a.doc_stats, ["docid", "pid"]) == _rows(b.doc_stats, ["docid", "pid"])
    assert _rows(a.lexicon, LEX_COLS) == _rows(b.lexicon, LEX_COLS)


def test_empty_state_raises(spark, tmp_path):
    idx = str(tmp_path / "empty")
    (tmp_path / "empty").mkdir()
    spark.createDataFrame(
        [], "pid string, content_sha256 string, doc_len long, term string, "
            "tf int, batch_id long"
    ).write.mode("overwrite").parquet(f"{idx}/stage_stream")
    with pytest.raises(ValueError):
        compact_incremental(spark, idx)
